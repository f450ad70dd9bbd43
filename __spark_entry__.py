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
# Round-6 rotation (VERDICT r5 "Next round" #2): (0) the 14 queries
# whose ORACLE or PLAN is new/changed in round 6 — the 8 brand-new
# entries (dd10/dd11 banded+staged keep-lists, ann5 IVFPQ + rf10
# floor, st10 streaming upsert, txt9 bigram surprisal, zo2 pruning
# evidence, mm5 image patches), ann3/sq2 (moved from rows-only to
# exact via portable codebook draws), dq1a (gated approx profiler),
# ii3 (log-idf BM25 rank oracle), cm1 (recomposed on dd11 — its
# oracle text changed), dc2 (pair-stage machinery rebuilt); (a) 32 of
# the 33 queries whose latest driver verdict is still r3 (the
# HANDOFF_r06 list minus ro2, whose rf5 floor carries the signal —
# all re-proved `exact` by the local gate, so this is verdict
# freshness, not risk); (b) the 4 dedup/BM25 queries whose modules
# round 6 restructured. Deliberate overflow: everything r4/r5-green
# and untouched this round — the strongest standing signals are the
# cheapest to defer (each displacement is annotated inline below).
_DRIVER_PRIORITY = [
    # (0) new/changed oracles in round 6 — first driver contact
    "dd10_keep_list_banded",
    "dd11_staged_keep_list",
    "ann5_ivfpq_topk",
    "rf10_ivfpq_recall",
    "st10_streaming_upsert",
    "txt9_bigram_surprisal",
    "zo2_pruning_effectiveness",
    "mm5_image_patches",
    "ann3_ivf_topk",
    "sq2_product_quantize",
    "dq1a_column_profile_approx",
    "ii3_bm25_log_idf",
    "cm1_corpus_manifest",
    "dc2_fuzzy_decontaminate",
    # (a) latest driver verdict is round 3 (33 queries)
    "a4_pricing_summary",
    "a5_consistency_score",
    "a7_frequency_map",
    "a11_post_gap_frequency",
    "a15_length_percentiles",
    "a16_length_histogram",
    "c1_size_buckets",
    "c9_f9_niche_distribution",
    "c12_collab_status",
    "f3_recent_flag",
    "f4_category_filter",
    "f6_null_guard_filter",
    "f7_recent20_mixed_window",
    "f8_stoplist_tokens",
    "j1_work_queue_anti_join",
    "j2_first_match_theta_join",
    "j3_users_posts_join",
    "j4_a10_keyword_scores",
    "j5_page_merge_dedup",
    "mj1_shipping_priority",
    "mj2_region_volume",
    "mj3_large_order_customers",
    "so1_first_occurrence_dedup",
    "st7_session_window",
    "rj2_error_near_purchase",
    "txt5_rolling_fingerprint",
    "txt6_vocab_top50",
    "txt7_repetition_stats",
    "x3_substring_membership",
    "dd3_minhash_lsh_pairs",
    "dd4_simhash_pairs",
    "ann2_lsh_topk",
    # (ro2 moved to overflow to pay for mm5's first-contact slot: it is
    # rows-only by design and its HLL accuracy floor rf5 carries the
    # checkable signal; re-proved rows-green by the local gate.)
    # (b) modules changed in round 6
    "dd2_ngram_jaccard_pairs",  # dedup.py: shared shingle/verify restructure
    "dd6_dup_clusters",  # dedup.py consumer via graph CC
    "dd8_dedup_keep_list",  # dedup.py consumer (exact yardstick)
    "ii2_bm25_topk",  # star_pipeline: shared _bm25_topk refactor
    # (km1, ann4, st8, and st9 moved to overflow to pay for the
    # st10/dd11/txt9/zo2 first-contact slots: similarity.py's r6
    # changes are driver-covered by ann3/sq2/ann5/rf10 in tier 0;
    # events.py's watermark param kept its default and st10 exercises
    # the same source block; all four are r5-green, re-proved by the
    # local gate.)
    # dq1/dq2 moved to overflow to pay for ann5/rf10's first-contact
    # slots: profiling.py's r6 change is driver-covered by dq1a (tier
    # 0), and dq1/dq2 are r5-green with the full local gate re-proving
    # them exact this round.
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
