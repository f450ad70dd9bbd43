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
# Round-14 window: (0) the 7 new/changed entries — tok5 (NEW: the
# 50k-scale tokenizer representative, VERDICT r13 #3 — the 2000-rule
# learned table through the Arrow-batched vocab-grain UDF path,
# hash-checked against the recursive-CTE oracle at depth 2000), ann6
# (NEW: the trained-cells IVF serving path, VERDICT r13 #5 — ann3's
# chain under km2's integer-Lloyd codebook at salt ann3/k=16,
# hash-exact via the composed Lloyd+IVF oracle), rf15 (NEW: ann6's
# recall floor at 0.5 — strictly above the seeded gate regime), cp4
# and cp9 (oracle changed: artifact-boundary CTEs AS MATERIALIZED —
# VERDICT r13 #2, measured cost-neutral, regime insurance), tok4
# (oracle construction: sql_chunked_subword_token_counts gained the
# prefix param + in-function merge-table guards — text byte-identical,
# but the km1-r10 rule puts changed construction in group 0), and km2
# (oracle construction: _km2_sql refactored onto the salt/prefix
# _km2_ctes builder ann6 nests — text byte-identical, same rule);
# then (a) oldest-driver-verdict-first: ALL 42 remaining r10-era
# hash-checkable verdicts in catalog order (k2/k3/k4 lead, exactly as
# the r13 displacement predicted), then the single oldest r11-era in
# catalog order (cdc1). 7 + 42 + 1 = 50 exactly; after this round no
# hash-checkable verdict predates r11.
_DRIVER_PRIORITY = [
    # (0) new/changed oracle or plan in round 14 — first driver contact
    "tok5_vocab_udf_token_count",
    "ann6_trained_ivf_topk",
    "rf15_trained_ivf_recall",
    "cp4_datacard_diff",
    "cp9_takedown_rewrite",
    "tok4_real_vocab_token_count",
    "km2_kmeans_train",
    # (a) oldest driver verdict first: ALL 42 remaining r10-era
    # entries, catalog order within the cohort
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
    "rf13_crosssplit_capture_floor",
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
    "sp4_cluster_split",
    "dc4_split_leakage_eval",
    "sp5_joint_cluster_split",
    "dd13_semantic_keep_list",
    "dc3_semantic_decontaminate",
    "txt5_rolling_fingerprint",
    "ann3_ivf_topk",
    "a15_length_percentiles",
    "txt6_vocab_top50",
    "sq2_product_quantize",
    "txt7_repetition_stats",
    "txt9_bigram_surprisal",
    "km1_kmeans_assign",
    "a16_length_histogram",
    "mx3_surprisal_weighted_mixture",
    "dp3_epoch_packing",
    "ann5_ivfpq_topk",
    # (a cont.) the oldest r11-era verdict, catalog order (the r11
    # cohort — 47 remaining — leads r15's rotation)
    "cdc1_merge_upsert",
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
