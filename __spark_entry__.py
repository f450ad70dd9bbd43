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
# (VERDICT r3 "Next round" #1: no query's latest driver verdict should
# predate its last source change). Priority: (a) new or changed in
# round 4, (b) r1-era verdicts, (c) r2 greens whose shared modules
# changed in round 3, (d) remaining r2-era verdicts. Overflow past the
# ~50-slot budget (the tail of (d)) is deliberately the weakest
# signals: rows-only entries whose quality already rides an in-budget
# rf floor (mm2→mm3, a8_approx→rf7) and thin variants of in-budget
# queries (x8b of x8, k7 of k5, st4/st6 pytest-covered streaming twins).
# Everything after this list keeps registration order (r3-green,
# unchanged).
_DRIVER_PRIORITY = [
    # (a) new or changed in round 4
    "rf7_approx_distinct_accuracy",  # NEW: a8 scale-path accuracy floor
    "dp1_sequence_packing",  # NEW: concat-and-chop packing offsets
    "ds1_corpus_shuffle",  # NEW: deterministic global shuffle positions
    "mx1_temperature_mix",  # NEW: temperature-weighted training mix
    "sq3_matryoshka_truncate",  # NEW: MRL prefix truncation
    "mm4_audio_chunks",  # NEW: audio chunk-boundary selection
    "fn2_conversion_window_funnel",  # strict lower bound added (ADVICE)
    "dd6_dup_clusters",  # graph.py: decimal fixpoint sum, collect fold
    "sq2_product_quantize",  # pq_codes short-codebook guard (ADVICE)
    "rf6_pq_distortion",
    "dd2_ngram_jaccard_pairs",  # explicit MEMORY_AND_DISK persist
    "rf3_minhash_recall",  # consume dd2's operator
    "rf4_simhash_recall",
    # (b) latest driver verdict is round 1
    "txt1_lang_id",
    "txt2_quality_score",
    "txt3_token_counts",
    "txt4_content_fingerprint",
    "dd5_embedding_neardup",
    "mm1_binary_metadata",
    "ann3_ivf_topk",
    # (c) r2 greens whose modules changed in round 3
    "aj1_asof_click_purchase",  # temporal.py
    "rj1_views_before_purchase",  # temporal.py
    "dc1_decontaminate",  # sampling.py
    "sp3_k_per_stratum",  # sampling.py
    "st5_stateful_sessions",  # bench/session changes
    "a123_er_formulas",  # shared aggregate helpers
    "a6_viral_count",
    "a12_split_half_trend",
    "a13_class_means_pivot",
    "a14_c6_fake_score",
    # (d) remaining r2-era verdicts, weakest signals last
    "k1_top6_er",
    "f2_recent_window",
    "fn1_user_funnel",
    "a8_distinct_diversity",
    "a9_platform_stats",
    "c2_type_tier",
    "c3_pricing_dim",
    "c8_account_type",
    "c10_personality_insights",
    "c13_sponsor_detector",
    "k2_latest6_pivot",
    "k3_top10_tokens",
    "k4_c5_modal_hour",
    "k6_priority_cascade",
    "x1_regex_extract",
    "x2_x4_string_ops",
    "x5_date_parts",
    "x6_c14_age_buckets",
    "x7_bankers_rounding",
    "x8_struct_to_json",
    # ---- ~50-slot budget line; deliberate overflow below ----
    # (x10_c7 is golden-parity + sf0.001-CI covered; ro1/st1/st2/st3's
    # operators are pytest-covered by the streaming parity + sf0.001
    # oracle CI tests; none of their modules changed in r3/r4 — the
    # cheapest drops for the five new r4 queries' slots)
    "x10_c7_argmax_priority",
    "ro1_hourly_rollup",
    "st1_tumbling_window",
    "st2_sliding_window",
    "st3_sessionization",
    "k7_top5_preview",
    "x8b_json_extract",
    "st4_streaming_tumbling",
    "st6_streaming_dedup",
    "mm2_frame_sample",
    "a8_approx_distinct",
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
