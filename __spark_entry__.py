"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in
``ig_etl_with_user_reports_2024_spark/plans/`` — this module only
re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ig_etl_with_user_reports_2024_spark.plans import QUERIES

# Importing these modules populates the registry.
from ig_etl_with_user_reports_2024_spark.plans import star_cdc  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_layout  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_temporal  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_sampling  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_topk_scalars  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_streaming  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_detectors  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_recall  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_aggregates  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_classifiers  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_multijoin  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_pipeline  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_queries  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_skew  # noqa: F401

# star_manifest composes oracles from already-registered queries — it
# must stay the LAST plans import.
from ig_etl_with_user_reports_2024_spark.plans import star_manifest  # noqa: F401

# The driver runs (and budgets) the FIRST ~50 queries in the order this
# module yields them, so ordering is a correctness-signal resource.
#
# STANDING ROTATION RULE (VERDICT r6 "Next round" #1): each round the
# window is (0) every query whose ORACLE or PLAN is new or changed
# this round, then (a) all remaining slots filled OLDEST-DRIVER-VERDICT
# FIRST (union of CORRECTNESS_r*.json; ties in catalog order). No
# query's latest verdict should ever lag the catalog by more than
# ceil(catalog_size / 50) rounds. Deliberate overflow = the youngest
# verdicts — the strongest standing signals are the cheapest to defer.
# NO-ORACLE EXEMPTION (VERDICT r7 "What's wrong" #3): entries whose
# driver verdict can never change (mm2_frame_sample, a8_approx_distinct,
# ro2_sketch_rollup — `no_oracle` by design, each floored by an rf gate
# and twinned by a hash-checked exact sibling) are EXCLUDED from the
# rotation so their slots go to hash-checkable queries; their rf floors
# are the refreshable signal. The other rows-only-by-design entries
# (ann2_lsh_topk, dd3_minhash_lsh_pairs, dd4_simhash_pairs — engine-
# specific hashes, rf-floored) are likewise outside the hash-checkable
# cohorts (the VERDICT r9 debt arithmetic counts 22 r6-era, not 25).
#
# Round-11 window: (0) the 7 new/changed entries — qc1 (NEW:
# model-based quality scoring, a fastText-style linear classifier
# inference pass with md5-derived portable weights — VERDICT r10 #3),
# txt14 (NEW: corpus-wide PII scrub — email/phone/handle redaction
# counts + scrubbed-text md5, the reference's own X1 patterns —
# VERDICT r10 #4), cm1 (plan+oracle: the hold_out split re-keyed onto
# dd11's CLUSTER id and the dc2 subtree swept against that same split
# — VERDICT r10 #1; drop_contaminated collapses 12 → 1 at sf0.01),
# qc2 (NEW: the rule-vs-model quality A/B — txt8's and qc1's keep
# verdicts joined into one 2x2 integer row, the dd16/ii6 convention),
# cp5 (NEW: the scrubbed release store — cm1's keep set joined with
# txt14's redaction pass, the text artifact a release ships), cp6
# (NEW: per-shard release integrity — order-insensitive md5-prefix-sum
# checksums over cp1's layout ⋈ txt14's scrubbed text), ds3 (NEW:
# quality-curriculum training order — ds1's shuffle stratified into
# qc1 margin tiers via the composite-bucket two-level decomposition),
# cp1/cp2/cp4 (oracle: they nest cm1's rebuilt text — the release
# family moves in lockstep), dc2 (oracle: rebuilt from the shared
# sql_fuzzy_decontaminate builder — semantics identical, construction
# changed, the km1-r10 rule); then (a) oldest-driver-verdict-first:
# ALL 27 remaining r7-era hash-checkable verdicts (VERDICT r10 "Next
# round" #2 — st10/c13/c10 lead as the r10 overflow), followed by the
# 12 oldest r8-era in catalog order (rf12/rf11/dd1/dd8 are the
# boundary overflow). 11 + 27 + 12 = 50 exactly; after this round no
# hash-checkable verdict predates r8 — the r7 rotation debt drains to
# zero one round ahead of the r10 schedule.
_DRIVER_PRIORITY = [
    # (0) new/changed oracle or plan in round 11 — first driver contact
    "qc1_model_quality_score",
    "txt14_pii_scrub",
    "qc2_quality_signal_ab",
    "cp5_scrubbed_release",
    "cp6_shard_integrity",
    "ds3_quality_curriculum",
    "cm1_corpus_manifest",
    "dc2_fuzzy_decontaminate",
    "cp1_curated_corpus",
    "cp2_corpus_datacard",
    "cp4_datacard_diff",
    # (a) oldest driver verdict first: ALL 27 remaining r7-era
    # entries, catalog order within the cohort
    "st10_streaming_upsert",
    "c13_sponsor_detector",
    "c10_personality_insights",
    "rf1_lsh_topk_recall",
    "rf10_ivfpq_recall",
    "rf3_minhash_recall",
    "rf4_simhash_recall",
    "rf6_pq_distortion",
    "rf7_approx_distinct_accuracy",
    "a123_er_formulas",
    "a6_viral_count",
    "a8_distinct_diversity",
    "a9_platform_stats",
    "a12_split_half_trend",
    "a13_class_means_pivot",
    "a14_c6_fake_score",
    "c2_type_tier",
    "c3_pricing_dim",
    "c8_account_type",
    "k1_top6_er",
    "f2_recent_window",
    "txt1_lang_id",
    "txt3_token_counts",
    "txt4_content_fingerprint",
    "mm1_binary_metadata",
    "dd5_embedding_neardup",
    "sq3_matryoshka_truncate",
    # (a cont.) the 12 oldest r8-era verdicts, catalog order
    "cdc1_merge_upsert",
    "cdc2_scd2_intervals",
    "dq1_column_profile",
    "dq2_schema_drift",
    "ad1_rolling_zscore",
    "mm3_frame_select",
    "dc1_decontaminate",
    "k7_top5_preview",
    "st11_rocksdb_dedup",
    "rf2_ivf_topk_recall",
    "rf5_sketch_accuracy",
    "rf9_kmeans_lloyd_floor",
]


def _ordered():
    missing = [n for n in _DRIVER_PRIORITY if n not in QUERIES]
    if missing:  # typo guard — fail loudly, not by silently dropping slots
        raise KeyError(f"_DRIVER_PRIORITY names not in registry: {missing}")
    out = {n: QUERIES[n] for n in _DRIVER_PRIORITY}
    out.update((n, s) for n, s in QUERIES.items() if n not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1: 90-day filter → top-6 per creator →
    avg engagement rate) on /root/testdata/sf0.001."""
    return QUERIES["k1_top6_er"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every hash-checkable query."""
    return {
        name: spec.oracle
        for name, spec in _ordered().items()
        if spec.oracle is not None
    }
