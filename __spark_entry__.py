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
# Round-10 window: (0) the 10 new/changed entries — sp4 (NEW:
# leakage-proof cluster-aware split, hash over dd11's cluster id),
# dc4 (NEW: the split-leakage eval — dc1's contamination count under
# sp1's doc split vs sp4's cluster split, one composed integer row),
# sp5 (NEW: the JOINT-modality split — one CC over dd11's lexical
# star edges ∪ the 2-probe semantic τ-pair edges, so paraphrase
# pairs co-locate too), ds2 (NEW: the epoch-interleaved multi-epoch
# training order — mx2's budgets composed with a per-epoch-seeded
# ds1 shuffle), dp3 (NEW: ds2's stream chopped into L=2048 training
# sequences — the packed multi-epoch dataset), dc3
# (plan+oracle: moved to the 2-probe cell assignment, capture
# 0.28 → 0.70+), rf13 (oracle: floor raised 0.2 → 0.5 on the 2-probe
# pair set), km1 (oracle: rebuilt from the shared _KM_SCORED_SQL
# fragment — semantics identical, but the rule counts construction
# changes), dd13 (oracle: nests km1's rebuilt text), mx3 (oracle:
# sql_temperature_mix's order_expr path now COALESCEs NULL to
# Long.MAX exactly like the Spark side — ADVICE r9); then (a)
# oldest-driver-verdict-first: ALL 22 remaining r6-era hash-checkable
# verdicts (VERDICT r9 "Next round" #4 — j2/j4/f8 the r9 overflow,
# then j5/so1/f6/x3/c9/mj1-mj3/dd2/dd6/a15/a16/txt5-txt7/txt9/sq2/
# ann3/ann5), followed by the 18 oldest r7-era in catalog order.
# 10 + 22 + 18 = 50 exactly; after this round no hash-checkable
# query's verdict predates r7 (c10/c13/st10 are the r7 overflow).
_DRIVER_PRIORITY = [
    # (0) new/changed oracle or plan in round 10 — first driver contact
    "sp4_cluster_split",
    "dc4_split_leakage_eval",
    "sp5_joint_cluster_split",
    "ds2_epoch_order",
    "dp3_epoch_packing",
    "dc3_semantic_decontaminate",
    "rf13_crosssplit_capture_floor",
    "km1_kmeans_assign",
    "dd13_semantic_keep_list",
    "mx3_surprisal_weighted_mixture",
    # (a) oldest driver verdict first: the 22 remaining r6-era
    # entries, catalog order within the cohort
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
    "dd2_ngram_jaccard_pairs",
    "dd6_dup_clusters",
    "txt5_rolling_fingerprint",
    "ann3_ivf_topk",
    "a15_length_percentiles",
    "txt6_vocab_top50",
    "sq2_product_quantize",
    "txt7_repetition_stats",
    "txt9_bigram_surprisal",
    "a16_length_histogram",
    "ann5_ivfpq_topk",
    # (a cont.) the 18 oldest r7-era verdicts, catalog order
    "zo1_zorder_stats",
    "zo2_pruning_effectiveness",
    "aj1_asof_click_purchase",
    "rj1_views_before_purchase",
    "fn1_user_funnel",
    "fn2_conversion_window_funnel",
    "mm4_audio_chunks",
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
    "st5_stateful_sessions",
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
