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
# module yields them, so ordering is a correctness-signal resource
# (VERDICT r4 "Next round" #1: after round 5, no query's latest driver
# verdict should predate r3). Priority: (0) the 12 queries NEW in round
# 5 (cdc1/cdc2, txt8, ii1, km1, rf8/rf9, zo1, dq1/dq2, pr1, ad1) —
# first driver contact outranks any refresh; (a) the 11 queries whose latest verdict is
# still r2 — round 4's deliberate overflow, next in line; (b) queries
# whose modules round 5 changed (packing.py, sampling.py bucket
# parameterization; dedup.py persist lifecycle; graph.py round-count
# return); (c) r3-era verdicts, refreshed while budget remains.
# Overflow past the ~50-slot budget is deliberately the weakest r3
# signals: rows-only entries whose quality rides an in-budget or
# r4-fresh driver-hashed floor (dd3→rf3, dd4→rf4, ann2→rf1, ro2→rf5),
# thin variants of fresher queries (a16 of a15, f3 of r4-green f2,
# f4/f6 trivial predicates, x3 of r4-green x2_x4, mj2/mj3 of mj1,
# txt6 of r4-green k3), and the 12 tier-(c) entries that paid for the
# new queries' slots (a7, c1, f7, j3, j5, so1, mj1, a5, txt5, a11,
# c9, f8 — see below).
# Everything after this list keeps registration order (r4-green,
# unchanged this round).
_DRIVER_PRIORITY = [
    # (0) NEW in round 5 — first driver contact outranks every refresh.
    # Late-r5 additions (dc2 portable-MinHash decontamination, ii2 BM25,
    # sk1/sk2 salted-shape identities) lead; their 4 slots are paid for
    # by moving the 4 weakest tier-(c) r3 refreshes (c12, j1, j2, j4 —
    # all r3-verified and re-proved exact by the local tri-scale gate)
    # into the deliberate overflow.
    "cm1_corpus_manifest",
    "ann4_portable_lsh_topk",
    "dd9_portable_simhash_pairs",
    "st8_stream_static_join",
    "st9_stream_stream_join",
    "dc2_fuzzy_decontaminate",
    "ii2_bm25_topk",
    "sk1_salted_distinct_users",
    "sk2_salted_join_segment",
    "cdc1_merge_upsert",
    "cdc2_scd2_intervals",
    "txt8_filter_verdict",
    "ii1_inverted_index",
    "km1_kmeans_assign",
    "rf8_approx_percentile_accuracy",
    "rf9_kmeans_lloyd_floor",
    "zo1_zorder_stats",
    "dq1_column_profile",
    "dq2_schema_drift",
    "pr1_pagerank",
    "ad1_rolling_zscore",
    # (a) latest driver verdict is round 2 (VERDICT r4 item #1)
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
    # (b) modules changed in round 5
    "ds1_corpus_shuffle",  # packing.py: prefix_chars parameterized
    "mx1_temperature_mix",  # sampling.py: prefix_chars parameterized
    "dp1_sequence_packing",  # packing.py sibling
    "sp1_hash_split",  # sampling.py sibling
    "sp2_stratified_sample",  # sampling.py sibling
    "sp3_k_per_stratum",  # sampling.py sibling
    "dc1_decontaminate",  # sampling.py sibling
    "dd2_ngram_jaccard_pairs",  # dedup.py: bounded persist lifecycle
    "dd6_dup_clusters",  # graph.py: round-count return (ADVICE)
    "dd8_dedup_keep_list",  # NEW r5: dedup end-product keep-list
    # (c) r3-era verdicts, strongest-signal-first
    "dd1_exact_dedup",
    "dd7_ngram_contamination",
    "rf1_lsh_topk_recall",
    "rf2_ivf_topk_recall",
    "rf5_sketch_accuracy",
    "ann1_cosine_topk",
    "sq1_int8_quantize",
    "mm3_frame_select",
    # ---- ~50-slot budget line; deliberate overflow below ----
    # st7/rj2/txt7/a4/a15/c12/j1/j2/j4: the 9 tier-(c) slots that paid
    # for the late-r5 new queries (cm1/ann4/dd9/st8/st9/dc2/ii2/sk1/
    # sk2) — r3-verified, re-proved exact locally by the tri-scale
    # gate; st7/rj2's semantics are carried in-window by their fresher
    # twins (st5 sessions r4-green, rj1 r4-green).
    "st7_session_window",
    "rj2_error_near_purchase",
    "txt7_repetition_stats",
    "a4_pricing_summary",
    "a15_length_percentiles",
    "c12_collab_status",
    "j1_work_queue_anti_join",
    "j2_first_match_theta_join",
    "j4_a10_keyword_scores",
    # Rows-only entries whose accuracy floors (rf1/rf3/rf4/rf5) are
    # in-budget or r4-fresh, plus thin variants of fresher queries —
    # the cheapest r3-era drops. The 12 slots the round-5-new queries
    # cost came from here: a7 (k3/k4 carry the map semantics), c1
    # (thin classifier), f7, j3, j5, so1, mj1 (thin/structural twins
    # of in-window kin), a5 (its decimal-stddev identity rides the NEW
    # in-window ad1), txt5 (thin twin of r4-green txt4's fingerprint),
    # a11 (thin lag-gap classifier; a12's split-half
    # trend is r4-green), c9 (thin classifier over j4's in-window
    # keyword scores), f8 (stoplist set-difference; j1 carries the
    # anti-join semantics in-window) — all r3-verified and re-proved
    # exact by the local tri-scale gate this round; they lead round 6
    # with the rest.
    "a5_consistency_score",
    "txt5_rolling_fingerprint",
    "a11_post_gap_frequency",
    "c9_f9_niche_distribution",
    "f8_stoplist_tokens",
    "a7_frequency_map",
    "c1_size_buckets",
    "f7_recent20_mixed_window",
    "j3_users_posts_join",
    "j5_page_merge_dedup",
    "so1_first_occurrence_dedup",
    "mj1_shipping_priority",
    "dd3_minhash_lsh_pairs",
    "dd4_simhash_pairs",
    "ann2_lsh_topk",
    "ro2_sketch_rollup",
    "a16_length_histogram",
    "f3_recent_flag",
    "f4_category_filter",
    "f6_null_guard_filter",
    "x3_substring_membership",
    "mj2_region_volume",
    "mj3_large_order_customers",
    "txt6_vocab_top50",
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
