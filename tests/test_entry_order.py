"""Driver-contract registration order: the driver budgets ~50 queries
per round in the order __spark_entry__.queries() yields them, so the
priority block must actually land in the front window."""

from __future__ import annotations

import __spark_entry__ as entry


def test_priority_names_all_registered():
    names = list(entry.queries())
    assert len(names) == len(set(names))
    missing = [n for n in entry._DRIVER_PRIORITY if n not in names]
    assert not missing


def test_stale_and_changed_queries_land_in_driver_window():
    # Round-9 rotation under the STANDING RULE (VERDICT r6 "Next
    # round" #1, stated in __spark_entry__): new/changed first (14 —
    # dc3/cp3/mx3/cp4 NEW + the band-tuning/shared-sig/order_col
    # touched set), then all remaining slots oldest-driver-verdict
    # first: ALL 17 r5-era verdicts + the 19 oldest r6-era. After r9
    # no hash-checkable verdict predates r6 (VERDICT r8 #2).
    # Overflow = r8-green new entries and younger untouched verdicts —
    # asserted OUT so the window isn't silently wasted.
    first50 = list(entry.queries())[:50]
    for name in entry._DRIVER_PRIORITY:
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in (
        # r8-green, untouched this round (the youngest verdicts are
        # the cheapest to defer, per the rule)
        "dd13_semantic_keep_list",
        "dd14_winnowing_pairs",
        "rf11_semdedup_cell_recall",
        "rf12_multiprobe_cell_recall",
        "ii4_prf_rerank",
        "ii5_rrf_fusion",
        "ii6_retrieval_eval",
        "ii7_fusion_eval",
        "txt10_trigram_surprisal",
        "txt11_winnowing_fingerprint",
        "st11_rocksdb_dedup",
        "km1_kmeans_assign",
        "txt2_quality_score",
        "dd8_dedup_keep_list",
        "dd12_repeated_span_trim",
        "mx2_epoch_budget",
        "dp2_sequence_manifest",
        # r6/r7-green, untouched, displaced by the older r6 cohort
        "ann5_ivfpq_topk",
        "ann3_ivf_topk",
        "sq2_product_quantize",
        "txt9_bigram_surprisal",
        "zo1_zorder_stats",
        "zo2_pruning_effectiveness",
        "rf10_ivfpq_recall",
        "st5_stateful_sessions",
        "st10_streaming_upsert",
        # no-oracle exemption: verdicts can never change; their rf
        # floors are the refreshable signal (__spark_entry__ comment)
        "mm2_frame_sample",
        "a8_approx_distinct",
        "ro2_sketch_rollup",
    ):
        assert name not in first50, f"{name} should be deliberate overflow"


def test_oracles_reference_registered_queries():
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs
