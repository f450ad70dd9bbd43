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
    # Round-15 rotation under the STANDING RULE (VERDICT r6 "Next
    # round" #1, stated in __spark_entry__): new/changed first (5 —
    # trn1/tok6 NEW, tok4/tok5 oracles changed by the deliberate
    # merge-table regeneration, ann6's oracle changed by
    # final_assignment=False), then all remaining slots oldest-verdict
    # first: 45 of the 46 remaining r11-era hash-checkable verdicts in
    # catalog order (recomputed from the CORRECTNESS_r*.json union).
    # 5 + 45 = 50; deliberate overflow = cp5_scrubbed_release (the
    # youngest r11 slot) + everything r12-green and younger.
    first50 = list(entry.queries())[:50]
    for name in entry._DRIVER_PRIORITY:
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in (
        # r14-green, untouched this round (the youngest verdicts are
        # the cheapest to defer, per the rule)
        "k2_latest6_pivot",
        "k3_top10_tokens",
        "st5_stateful_sessions",
        "j4_a10_keyword_scores",
        "cdc1_merge_upsert",
        "cp4_datacard_diff",
        "cp9_takedown_rewrite",
        "km2_kmeans_train",
        "rf15_trained_ivf_recall",
        # r12/r13-green past the cut
        "dq5_release_expectations",
        "mx6_subword_epoch_budget",
        "st13_streaming_expectation_drift",
        "ii8_subword_bm25_topk",
        "a4_pricing_summary",
        "cm2_incremental_admission",
        "cp3_incremental_release",
        "tok1_subword_token_count",
        "tok3_memoized_token_count",
        "rf14_int_lloyd_convergence",
        "tok2_budget_grain_ab",
        "x10_c7_gender_argmax",
        # the ONE r11-era entry past the cut (catalog-youngest of the
        # 46-strong cohort — it leads r16 with the r12 cohort)
        "cp5_scrubbed_release",
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
