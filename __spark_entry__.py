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

# The driver runs (and budgets) the FIRST ~50 queries in the order this
# module yields them, so ordering is a correctness-signal resource
# (VERDICT r2 "Next round" #1/#5). Priority: (a) queries with no driver
# verdict yet or a stale rows-only one, (b) queries new or changed this
# round, (c) r1-green queries the driver hasn't re-run since their
# shared helpers changed. Everything after this list keeps registration
# order (all r2-green, unchanged).
_DRIVER_PRIORITY = [
    # (a) locally-exact but never driver-verified (registered 73-89 in r2)
    "dd6_dup_clusters",
    "sq1_int8_quantize",
    "a15_length_percentiles",
    "txt6_vocab_top50",
    "ro2_sketch_rollup",
    "txt5_rolling_fingerprint",
    # (b) new or materially changed in round 3
    "rf1_lsh_topk_recall",
    "rf2_ivf_topk_recall",
    "rf3_minhash_recall",
    "rf4_simhash_recall",
    "rf5_sketch_accuracy",
    "rf6_pq_distortion",
    "sq2_product_quantize",
    "mm3_frame_select",
    "txt7_repetition_stats",
    "dd7_ngram_contamination",
    "a16_length_histogram",
    "st7_session_window",
    "fn2_conversion_window_funnel",
    "sp1_hash_split",
    "sp2_stratified_sample",
    "rj2_error_near_purchase",
    "a4_pricing_summary",
    "c12_collab_status",
    # (c) r1-green, not driver-re-run in r2 while helpers changed
    "j1_work_queue_anti_join",
    "j3_users_posts_join",
    "a7_frequency_map",
    "a5_consistency_score",
    "a11_post_gap_frequency",
    "c1_size_buckets",
    "f3_recent_flag",
    "f4_category_filter",
    "f7_recent20_mixed_window",
    "f8_stoplist_tokens",
    "j2_first_match_theta_join",
    "j4_a10_keyword_scores",
    "j5_page_merge_dedup",
    "so1_first_occurrence_dedup",
    "f6_null_guard_filter",
    "x3_substring_membership",
    "c9_f9_niche_distribution",
    "mj1_shipping_priority",
    "mj2_region_volume",
    "mj3_large_order_customers",
    "dd1_exact_dedup",
    "dd2_ngram_jaccard_pairs",
    "dd3_minhash_lsh_pairs",
    "dd4_simhash_pairs",
    "ann1_cosine_topk",
    "ann2_lsh_topk",
    "txt1_lang_id",
    "txt2_quality_score",
    "txt3_token_counts",
    "txt4_content_fingerprint",
    "mm1_binary_metadata",
    "dd5_embedding_neardup",
    "ann3_ivf_topk",
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
