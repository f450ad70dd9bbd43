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
    # Round-11 rotation under the STANDING RULE (VERDICT r6 "Next
    # round" #1, stated in __spark_entry__): new/changed first (11 —
    # qc1/txt14/qc2/cp5/cp6/ds3 NEW + cm1's cluster-split re-key +
    # the cp1/cp2/cp4 lockstep recompositions + dc2's builder-rebuilt
    # oracle), then all remaining slots oldest-verdict first: ALL 27
    # remaining r7-era hash-checkable verdicts (VERDICT r10 #2) + the
    # 12 oldest r8-era (rf12/rf11/dd1/dd8 = the boundary overflow).
    # 11 + 27 + 12 = 50; after r11 no hash-checkable verdict predates
    # r8.
    # Overflow = r9/r10-green entries and the youngest r8 verdicts —
    # asserted OUT so the window isn't silently wasted.
    first50 = list(entry.queries())[:50]
    for name in entry._DRIVER_PRIORITY:
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in (
        # r9/r10-green, untouched this round (the youngest verdicts
        # are the cheapest to defer, per the rule)
        "dd10_keep_list_banded",
        "dd11_staged_keep_list",
        "dd15_quality_survivor",
        "dd16_banded_pair_eval",
        "cm2_incremental_admission",
        "cp3_incremental_release",
        "mx1_temperature_mix",
        "txt13_source_vocab_overlap",
        "ro3_multigrain_rollup",
        "sp1_hash_split",
        "st12_streaming_band_admission",
        "sp4_cluster_split",
        "sp5_joint_cluster_split",
        "dc4_split_leakage_eval",
        "ds2_epoch_order",
        "dp3_epoch_packing",
        "dc3_semantic_decontaminate",
        "km1_kmeans_assign",
        "dd13_semantic_keep_list",
        "mx3_surprisal_weighted_mixture",
        # r8-green past the cut (catalog order within the cohort
        # decides it; rf12/rf11/dd1/dd8 are the boundary overflow)
        "rf12_multiprobe_cell_recall",
        "rf11_semdedup_cell_recall",
        "dd1_exact_dedup",
        "dd8_dedup_keep_list",
        "dd12_repeated_span_trim",
        "ann1_cosine_topk",
        "txt2_quality_score",
        "txt11_winnowing_fingerprint",
        "dd14_winnowing_pairs",
        "ii6_retrieval_eval",
        "txt10_trigram_surprisal",
        "mx2_epoch_budget",
        "dp2_sequence_manifest",
        # no-oracle / rows-only exemption: verdicts the rotation can't
        # refresh; their rf floors are the refreshable signal
        "mm2_frame_sample",
        "a8_approx_distinct",
        "ro2_sketch_rollup",
        "ann2_lsh_topk",
        "dd3_minhash_lsh_pairs",
        "dd4_simhash_pairs",
    ):
        assert name not in first50, f"{name} should be deliberate overflow"


def test_oracles_reference_registered_queries():
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs
