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
# Round-12 window: (0) the 8 new/changed entries — cp7 (NEW: the
# scrubbed DELTA text store — cm2's admit set ⋈ txt14, cp5's twin on
# the daily path — VERDICT r11 #1), cp8 (NEW: release-keyed per-shard
# integrity for cp3's delta layout, cp6's twin — VERDICT r11 #1),
# tok1 (NEW: tokenizer-grain subword counts via a portable fixed-merge
# BPE apply — VERDICT r11 #2), km2 (NEW: full Lloyd k-means training
# in scaled-long integer arithmetic — VERDICT r11 #4), rf14 (NEW:
# km2's convergence gate on the exact integer inertia trajectory),
# ds4 (NEW: per-epoch quality curriculum — ds3's tiers composed with
# ds2's epoch interleave, HANDOFF r12's designed idea), ds2/ds3
# (plan: construction refactored onto the shared epoch_membership /
# _ds3_tier builders ds4 reuses — semantics identical, ds2's oracle
# text byte-identical, but the km1-r10 rule puts changed construction
# in group 0), dp4/mx4 (NEW: dp1's packing and mx1's mixture re-run
# at tok1's tokenizer grain — the budget-grain twins VERDICT r11 #2
# asked the round to decide on; built because the answer IS the
# artifact) and tok2 (NEW: the word-vs-subword budget 2×2, the qc2
# convention), and cp9 (NEW: takedown/right-to-erasure propagation —
# the per-(release, shard) before/after rewrite work-list over cp1's
# full ∪ cp3's delta layouts), dq3 (NEW: Deequ-shape expectation
# suite — 11 named constraints over 4 tables, one agg pass per
# table), mm6 (NEW: interleaved multimodal packing — mm5's patch
# grid + tok1's subword counts chopped into L=2048 VLM sequences),
# tok3 (NEW: tok1's vocabulary-memoized 100 TB shape, result-
# identical by shared expression — the sk1/sk2 convention), and mx5
# (NEW: the modality-aware mixture — mx1's budgets metered in mm6's
# combined patch+text grain, one shared cost definition), and dq4
# (NEW: dq3's contract check at dq2's batch grain with the integer
# milli-rate drift alarm); then (a) oldest-driver-verdict-first: ALL
# 26 remaining r8-era hash-checkable verdicts (VERDICT r11 "Next
# round" #3 — rf12/rf11/dd1/dd8 lead as the r11 boundary overflow),
# followed by the 7 oldest r9-era in catalog order. 17 + 26 + 7 = 50
# exactly; after this round no hash-checkable verdict predates r9.
_DRIVER_PRIORITY = [
    # (0) new/changed oracle or plan in round 12 — first driver contact
    "cp7_scrubbed_delta_store",
    "cp8_delta_shard_integrity",
    "tok1_subword_token_count",
    "km2_kmeans_train",
    "rf14_int_lloyd_convergence",
    "ds4_epoch_curriculum",
    "ds2_epoch_order",
    "ds3_quality_curriculum",
    "dp4_subword_packing",
    "mx4_subword_mix",
    "tok2_budget_grain_ab",
    "cp9_takedown_rewrite",
    "dq3_expectation_suite",
    "mm6_interleaved_packing",
    "tok3_memoized_token_count",
    "mx5_multimodal_mix",
    "dq4_batch_expectation_drift",
    # (a) oldest driver verdict first: ALL 26 remaining r8-era
    # entries, catalog order within the cohort
    "rf12_multiprobe_cell_recall",
    "rf11_semdedup_cell_recall",
    "dd1_exact_dedup",
    "dd8_dedup_keep_list",
    "dd12_repeated_span_trim",
    "ann1_cosine_topk",
    "txt2_quality_score",
    "txt11_winnowing_fingerprint",
    "dd14_winnowing_pairs",
    "txt8_filter_verdict",
    "txt10_trigram_surprisal",
    "ii1_inverted_index",
    "dd7_ngram_contamination",
    "dp1_sequence_packing",
    "dp2_sequence_manifest",
    "ds1_corpus_shuffle",
    "mx2_epoch_budget",
    "pr1_pagerank",
    "ii2_bm25_topk",
    "ii3_bm25_log_idf",
    "ii4_prf_rerank",
    "ii5_rrf_fusion",
    "ii6_retrieval_eval",
    "ii7_fusion_eval",
    "ann4_portable_lsh_topk",
    "dd9_portable_simhash_pairs",
    # (a cont.) the 7 oldest r9-era verdicts, catalog order (st6/
    # st12/ro1/st2/st1/st4/st7/st3/x8b displaced by dp4/mx4/tok2/cp9/
    # dq3/mm6/tok3/mx5/dq4 — they lead r13's cohort)
    "dq1a_column_profile_approx",
    "rj2_error_near_purchase",
    "sp1_hash_split",
    "sp2_stratified_sample",
    "sp3_k_per_stratum",
    "mm5_image_patches",
    "x10_c7_argmax_priority",
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
