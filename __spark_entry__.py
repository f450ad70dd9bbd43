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
# are the refreshable signal.
#
# Round-9 window: (0) the 17 new/changed entries — dc3 (NEW: semantic
# train/eval decontamination, dd13's cells across sp1's split), cp3
# (NEW: the incremental release — cm2's admitted batch packed as delta
# shards), mx3 (NEW: DSIR-lite importance-ordered mixture), cp4 (NEW:
# the per-source data-card diff nesting cp2+cp3), dd10/dd11/dd15/dd16
# (plan+oracle: the banded path's (num_hashes, bands) tuned (8,4) →
# (16,4) from dd16's measured sweep), cm1 (plan: ONE shared 16-min
# signature feeds both subtrees; oracle: nests the re-tuned dd11),
# cm2/st12 (plan+oracle: admission band stores moved to (16,4) to
# match the batch keep-list banding), cp1/cp2 (oracle: nest cm1),
# mx1 (plan: temperature_mix's order_col decomposition — constant-0
# path, results bit-identical, but the rule counts construction
# changes), rf13 (NEW: dc3's own cross-split capture floor), txt13
# (NEW: per-source-pair vocabulary-overlap matrix), ro3 (NEW:
# GROUPING SETS multi-grain rollup); then (a)
# oldest-driver-verdict-first: ALL 17 r5-era verdicts (the r8
# overflow — sp1-sp3, x10, x8b, st1-st4, st6, st8, st9, ro1, rf8,
# sq1, sk1, sk2) followed by the 16 oldest r6-era (j2/j4/f8 become
# the three-slot overflow as rf13/txt13/ro3 joined group 0).
# 17 + 33 = 50 exactly; after this round no hash-checkable query's
# verdict predates r6 (VERDICT r8 "Next round" #2 satisfied —
# dc2/dq1a/rj2/mm5/st7 and the r6 star_queries rows lead the refresh).
_DRIVER_PRIORITY = [
    # (0) new/changed oracle or plan in round 9 — first driver contact
    "dc3_semantic_decontaminate",
    "rf13_crosssplit_capture_floor",
    "txt13_source_vocab_overlap",
    "ro3_multigrain_rollup",
    "cp3_incremental_release",
    "mx3_surprisal_weighted_mixture",
    "cp4_datacard_diff",
    "dd10_keep_list_banded",
    "dd11_staged_keep_list",
    "dd15_quality_survivor",
    "dd16_banded_pair_eval",
    "cm1_corpus_manifest",
    "cm2_incremental_admission",
    "st12_streaming_band_admission",
    "cp1_curated_corpus",
    "cp2_corpus_datacard",
    "mx1_temperature_mix",
    # (a) oldest driver verdict first: the 17 r5-era entries, catalog
    # order (sq1/st1-st4/st6/st8/st9/x10/x8b/ro1/sk1/sk2/sp1-sp3/rf8)
    "sp1_hash_split",
    "sp2_stratified_sample",
    "sp3_k_per_stratum",
    "x10_c7_argmax_priority",
    "x8b_json_extract",
    "st3_sessionization",
    "st4_streaming_tumbling",
    "st1_tumbling_window",
    "st2_sliding_window",
    "st6_streaming_dedup",
    "ro1_hourly_rollup",
    "st8_stream_static_join",
    "st9_stream_stream_join",
    "rf8_approx_percentile_accuracy",
    "sq1_int8_quantize",
    "sk1_salted_distinct_users",
    "sk2_salted_join_segment",
    # (a cont.) the 16 oldest r6-era verdicts, catalog order
    "dq1a_column_profile_approx",
    "rj2_error_near_purchase",
    "mm5_image_patches",
    "dc2_fuzzy_decontaminate",
    "st7_session_window",
    "c12_collab_status",
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
