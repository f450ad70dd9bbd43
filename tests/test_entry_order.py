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
    # Round-14 rotation under the STANDING RULE (VERDICT r6 "Next
    # round" #1, stated in __spark_entry__): new/changed first (7 —
    # tok5/ann6/rf15 NEW, cp4/cp9 oracles MATERIALIZED, tok4/km2
    # oracle construction refactored byte-identically, the km1-r10
    # rule), then all remaining slots oldest-verdict first: ALL 42
    # remaining r10-era hash-checkable verdicts (VERDICT r13 #1 —
    # k2/k3/k4 lead) + the oldest r11-era in catalog order (cdc1).
    # 7 + 42 + 1 = 50; after r14 no hash-checkable verdict predates
    # r11.
    # Overflow = r11/r12/r13-green entries — asserted OUT so the
    # window isn't silently wasted.
    first50 = list(entry.queries())[:50]
    for name in entry._DRIVER_PRIORITY:
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in (
        # r13-green, untouched this round (the youngest verdicts are
        # the cheapest to defer, per the rule)
        "dq5_release_expectations",
        "mx6_subword_epoch_budget",
        "st13_streaming_expectation_drift",
        "ii8_subword_bm25_topk",
        "dq4_batch_expectation_drift",
        "mx2_epoch_budget",
        "cp6_shard_integrity",
        "st1_tumbling_window",
        "st3_sessionization",
        "a4_pricing_summary",
        "cm2_incremental_admission",
        "cp3_incremental_release",
        # r11/r12-green past the cut (only the oldest r11, cdc1, made
        # the window; the 47-strong r11 cohort leads r15's rotation)
        "cdc2_scd2_intervals",
        "k1_top6_er",
        "cp1_curated_corpus",
        "cm1_corpus_manifest",
        "tok1_subword_token_count",
        "tok3_memoized_token_count",
        "rf14_int_lloyd_convergence",
        "txt14_pii_scrub",
        "qc1_model_quality_score",
        "dp4_subword_packing",
        "mx4_subword_mix",
        "tok2_budget_grain_ab",
        "dq3_expectation_suite",
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
