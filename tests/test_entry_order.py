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
    # Round-10 rotation under the STANDING RULE (VERDICT r6 "Next
    # round" #1, stated in __spark_entry__): new/changed first (10 —
    # sp4/dc4/sp5/ds2/dp3 NEW + dc3/rf13 multi-probe + km1/dd13/mx3
    # oracle-text changes), then all remaining slots
    # oldest-driver-verdict first: ALL 22 remaining r6-era
    # hash-checkable verdicts (VERDICT r9 #4) + the 18 oldest r7-era.
    # 10 + 22 + 18 = 50; after r10 no hash-checkable verdict predates
    # r7 (c10/c13/st10 are the r7 overflow).
    # Overflow = r8/r9-green entries and the youngest r7 verdicts —
    # asserted OUT so the window isn't silently wasted.
    first50 = list(entry.queries())[:50]
    for name in entry._DRIVER_PRIORITY:
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in (
        # r9-green, untouched this round (the youngest verdicts are
        # the cheapest to defer, per the rule)
        "dd10_keep_list_banded",
        "dd11_staged_keep_list",
        "dd15_quality_survivor",
        "dd16_banded_pair_eval",
        "cm1_corpus_manifest",
        "cm2_incremental_admission",
        "cp1_curated_corpus",
        "cp2_corpus_datacard",
        "cp3_incremental_release",
        "cp4_datacard_diff",
        "mx1_temperature_mix",
        "txt13_source_vocab_overlap",
        "ro3_multigrain_rollup",
        "sp1_hash_split",
        "st12_streaming_band_admission",
        # r8-green, untouched
        "dd14_winnowing_pairs",
        "rf11_semdedup_cell_recall",
        "rf12_multiprobe_cell_recall",
        "ii6_retrieval_eval",
        "txt10_trigram_surprisal",
        "st11_rocksdb_dedup",
        "mx2_epoch_budget",
        "dp2_sequence_manifest",
        # r7-green, displaced by the older cohorts (youngest r7 ties
        # by catalog order)
        "rf10_ivfpq_recall",
        "sq3_matryoshka_truncate",
        "c10_personality_insights",
        "c13_sponsor_detector",
        "st10_streaming_upsert",
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
