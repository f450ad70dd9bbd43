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
# Round-15 window: (0) the 5 new/changed entries — trn1 (NEW: the
# distributed BPE trainer, VERDICT r14 #2 — training itself is now a
# registered hash-checked operator whose output table is a prefix of
# the shipped dims tables' trajectory), tok6 (NEW: the full 50000-rule
# learned vocabulary through tok5's UDF path against the depth-50000
# recursive-CTE oracle, VERDICT r14 #3), tok4 and tok5 (oracle
# changed: the merge tables were REGENERATED from the 100k-type grown
# corpus so one trajectory reaches 50k rules — the builder-pin test's
# "deliberate change takes a group-0 slot" contract), and ann6 (oracle
# changed: final_assignment=False drops the dead trailing E-step CTEs,
# ADVICE r14); then (a) oldest-driver-verdict-first: 45 of the 46
# remaining r11-era hash-checkable verdicts in catalog order
# (recomputed from the CORRECTNESS_r*.json union this round).
# 5 + 45 = 50 exactly; deliberate overflow = cp5_scrubbed_release
# (the youngest slot of the r11 cohort, catalog order) plus the
# r12-era cohort — they lead r16.
_DRIVER_PRIORITY = [
    # (0) new/changed oracle or plan in round 15 — first driver contact
    "trn1_bpe_train",
    "tok6_full_vocab_token_count",
    "tok4_real_vocab_token_count",
    "tok5_vocab_udf_token_count",
    "ann6_trained_ivf_topk",
    # (a) oldest driver verdict first: 45 of the 46 r11-era entries,
    # catalog order within the cohort
    "cdc2_scd2_intervals",
    "dq1_column_profile",
    "dq2_schema_drift",
    "ad1_rolling_zscore",
    "mm3_frame_select",
    "dc1_decontaminate",
    "dc2_fuzzy_decontaminate",
    "k7_top5_preview",
    "st11_rocksdb_dedup",
    "st10_streaming_upsert",
    "c13_sponsor_detector",
    "c10_personality_insights",
    "rf1_lsh_topk_recall",
    "rf2_ivf_topk_recall",
    "rf10_ivfpq_recall",
    "rf3_minhash_recall",
    "rf4_simhash_recall",
    "rf5_sketch_accuracy",
    "rf6_pq_distortion",
    "rf7_approx_distinct_accuracy",
    "rf9_kmeans_lloyd_floor",
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
    "qc1_model_quality_score",
    "txt14_pii_scrub",
    "txt3_token_counts",
    "txt4_content_fingerprint",
    "mm1_binary_metadata",
    "dd5_embedding_neardup",
    "qc2_quality_signal_ab",
    "sq3_matryoshka_truncate",
    "cm1_corpus_manifest",
    "cp1_curated_corpus",
    "cp2_corpus_datacard",
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
