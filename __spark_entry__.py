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
# Round-8 window: (0) the 24 new/changed entries — cp1 (NEW: the
# curated-corpus end product), ii4 (NEW: PRF hybrid retrieval), ii5
# (NEW: RRF hybrid fusion over ii4), txt10 (NEW: train-only trigram
# surprisal), dp2 (NEW: per-sequence packing manifest), dd13 (NEW:
# SemDeDup semantic keep-list over the embedding column), rf11 (NEW:
# dd13's cell-recall floor), cp2 (NEW: the per-source data card over
# cp1), st11 (NEW: st6's dedup contract on the RocksDB provider),
# st12 (NEW: streaming MinHash-band near-dup admission — the ingest
# dedup gate, signature state as ONE update-mode stateful agg),
# cm2 (NEW: incremental admission of an arriving batch against the
# existing corpus's digest + band stores — cm1's daily-maintenance
# shape), txt11 (NEW: MOSS winnowing fingerprints — window-min k-gram
# selection with the substring-detection guarantee), ii6 (NEW:
# retrieval eval harness — integer hits@k / first-rel-rank against a
# min-tf AND-label proxy; caught the negative-idf pathology and rides
# the Lucene clamp), txt8 (quality
# threshold 45→30, both engines — the old gate kept zero synthetic
# docs), cm1 (plan: skew-safe digest stage; oracle: nests txt8's new
# text), dd8/dd10/dd11 (plan: cluster_size + digest stage de-windowed
# via salted joins), dd12 (plan: the g2 subtree pinned), ii2/ii3
# (oracle re-emitted via the shared _bm25_sql builder), dp1/ds1/mx1
# (oracle re-emitted via the shared rel-parameterized builders); then
# (a) the r5-era verdicts, catalog order. 24 + 26 = 50 exactly —
# the LAST TEN r5-era entries in catalog order (sq1, st1, st2, st3,
# st4, st6, st8, st9, x10, x8b) are the rule's deliberate overflow to
# r9, where they lead the stale cohort (st6's only r8 change is the
# eager flag — result-identical; sq1/st1/st2/st3's displacement pays
# for st12/cm2/txt11/ii6's first contact, per the rule's "new entries
# outrank stale refreshes").
# rf10 (eager flag only), st5/st10 (metrics-capture keying only) and
# dc2 are result- and plan-identical with fresh verdicts — overflow.
#
# Late-round additions to group 0: dd14/dd15/rf12/mx2 (NEW), plus the
# conservative "plan or oracle text touched" set — txt2 (oracle
# re-emitted via the shared sql_quality_score builder), km1/rf9/rf11/
# dd13 (the kmeans_assign scored-cells refactor under them; results
# test-pinned identical, but the rule counts construction changes).
# That grows group 0 to 33 (with ii7_fusion_eval, NEW — the A/B eval
# over the ii4/ii5 chain on the clamped base — and
# dd16_banded_pair_eval, NEW — the dedup family's measured
# recall/precision eval), so the r5-era tail shrinks to 17 and
# rf8/ro1/sk1/sk2/sp1/sp2/sp3 join the deliberate overflow to r9.
_DRIVER_PRIORITY = [
    # (0) new/changed oracle or plan in round 8 — first driver contact
    "dd14_winnowing_pairs",
    "dd15_quality_survivor",
    "rf12_multiprobe_cell_recall",
    "mx2_epoch_budget",
    "ii7_fusion_eval",
    "dd16_banded_pair_eval",
    "txt2_quality_score",
    "km1_kmeans_assign",
    "rf9_kmeans_lloyd_floor",
    "rf11_semdedup_cell_recall",
    "cp1_curated_corpus",
    "ii4_prf_rerank",
    "ii5_rrf_fusion",
    "dp2_sequence_manifest",
    "dd13_semantic_keep_list",
    "cp2_corpus_datacard",
    "st11_rocksdb_dedup",
    "st12_streaming_band_admission",
    "cm2_incremental_admission",
    "txt11_winnowing_fingerprint",
    "ii6_retrieval_eval",
    "txt10_trigram_surprisal",
    "txt8_filter_verdict",
    "cm1_corpus_manifest",
    "dd8_dedup_keep_list",
    "dd10_keep_list_banded",
    "dd11_staged_keep_list",
    "dd12_repeated_span_trim",
    "ii2_bm25_topk",
    "ii3_bm25_log_idf",
    "dp1_sequence_packing",
    "ds1_corpus_shuffle",
    "mx1_temperature_mix",
    # (a) the r5-era verdicts, catalog order (minus the ones moved to
    # group 0 and the exempt no-oracle entries)
    "ad1_rolling_zscore",
    "ann1_cosine_topk",
    "ann4_portable_lsh_topk",
    "cdc1_merge_upsert",
    "cdc2_scd2_intervals",
    "dc1_decontaminate",
    "dd1_exact_dedup",
    "dd7_ngram_contamination",
    "dd9_portable_simhash_pairs",
    "dq1_column_profile",
    "dq2_schema_drift",
    "ii1_inverted_index",
    "k7_top5_preview",
    "mm3_frame_select",
    "pr1_pagerank",
    "rf2_ivf_topk_recall",
    "rf5_sketch_accuracy",
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
