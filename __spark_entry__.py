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
# Round-13 window: (0) the 8 new/changed entries — dq5 (NEW: the
# release-consumer expectation suite over the six shipped artifacts,
# VERDICT r12 #5), mx6 (NEW: mx2's epoch-budget planning table at
# tok1's subword grain — the last word-grain budget family, VERDICT
# r12 #6), tok4 (NEW: the 500-rule real-scale merge table through the
# measured chunked-barrier fallback plan with a recursive-CTE oracle —
# the r13 knee finding made an operator, VERDICT r12 #4), st13 (NEW:
# dq4's drift as the streaming job an ingest gate deploys, hash-checked
# against dq4's SQL verbatim — the st4/st1 parity convention), ii8
# (NEW: BM25 length-normalized at tok1's subword grain — registered
# because the decision probe showed the grain SWAP reorders rankings,
# 0/5 stable top-10 orders), dq4
# (plan+oracle changed: batch key re-keyed from
# event_id%2 to epoch-second parity of ts so the not-null
# expectations are no longer structurally vacuous — the ADVICE r12
# finding), mx2 (oracle construction refactored onto the shared
# _epoch_budget_sql builder mx6 reuses — text byte-identical, but the
# km1-r10 rule puts changed construction in group 0), and cp6 (the
# ADVICE r12 catch-up: its r12 construction moved onto the shared
# _md5_prefix_checksum helper but it never got a window slot — the
# km1-r10 rule applied one round late); then (a)
# oldest-driver-verdict-first: ALL 35 remaining r9-era hash-checkable
# verdicts (the VERDICT r12 #2 cohort — st6/st12/ro1/st2/st1/st4/
# st7/st3/x8b lead as the r12 displacement overflow), followed by the
# 10 oldest r10-era in catalog order. 5 + 35 + 10 = 50 exactly; after
# this round no hash-checkable verdict predates r10. (8 + 35 + 7 =
# 50 after tok4/st13/ii8 joined group 0 — k2/k3/k4 return to the r14
# cohort.)
_DRIVER_PRIORITY = [
    # (0) new/changed oracle or plan in round 13 — first driver contact
    "dq5_release_expectations",
    "mx6_subword_epoch_budget",
    "tok4_real_vocab_token_count",
    "st13_streaming_expectation_drift",
    "ii8_subword_bm25_topk",
    "dq4_batch_expectation_drift",
    "mx2_epoch_budget",
    "cp6_shard_integrity",
    # (a) oldest driver verdict first: ALL 35 remaining r9-era
    # entries, catalog order within the cohort
    "x8b_json_extract",
    "st3_sessionization",
    "st7_session_window",
    "st4_streaming_tumbling",
    "st1_tumbling_window",
    "st2_sliding_window",
    "st6_streaming_dedup",
    "st12_streaming_band_admission",
    "ro1_hourly_rollup",
    "st8_stream_static_join",
    "st9_stream_stream_join",
    "c12_collab_status",
    "rf8_approx_percentile_accuracy",
    "a4_pricing_summary",
    "j1_work_queue_anti_join",
    "j3_users_posts_join",
    "a7_frequency_map",
    "a5_consistency_score",
    "a11_post_gap_frequency",
    "c1_size_buckets",
    "f3_recent_flag",
    "f4_category_filter",
    "f7_recent20_mixed_window",
    "dd10_keep_list_banded",
    "dd11_staged_keep_list",
    "dd16_banded_pair_eval",
    "dd15_quality_survivor",
    "txt13_source_vocab_overlap",
    "sq1_int8_quantize",
    "ro3_multigrain_rollup",
    "mx1_temperature_mix",
    "sk1_salted_distinct_users",
    "sk2_salted_join_segment",
    "cm2_incremental_admission",
    "cp3_incremental_release",
    # (a cont.) the 7 oldest r10-era verdicts, catalog order (the
    # r10 remainder — k2/k3/k4 first — leads r14's cohort)
    "zo1_zorder_stats",
    "zo2_pruning_effectiveness",
    "aj1_asof_click_purchase",
    "rj1_views_before_purchase",
    "fn1_user_funnel",
    "fn2_conversion_window_funnel",
    "mm4_audio_chunks",
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
