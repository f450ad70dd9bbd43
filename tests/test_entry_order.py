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
    # Round-8 rotation under the STANDING RULE (VERDICT r6 "Next
    # round" #1, stated in __spark_entry__): new/changed first, then
    # all remaining slots oldest-driver-verdict first, with the
    # no-oracle entries exempt (their verdicts can never change). r8:
    # 20 new/changed + 30 r5-era verdicts = exactly 50 (the last six
    # r5-era entries in catalog order, st4/st6/st8/st9/x10/x8b, are
    # the rule's deliberate overflow to r9, where they lead the stale
    # cohort).
    # Other overflow = r6/r7-green and result-identical — asserted
    # OUT so the window isn't silently wasted.
    first50 = list(entry.queries())[:50]
    for name in entry._DRIVER_PRIORITY:
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in (
        # r7-green, untouched or result-identical this round (rf10:
        # eager flag only; st5/st10: metrics-capture keying only)
        "rf10_ivfpq_recall",
        "rf1_lsh_topk_recall",
        "st5_stateful_sessions",
        "st10_streaming_upsert",
        "zo1_zorder_stats",
        "zo2_pruning_effectiveness",
        # r6-green, untouched
        "ann5_ivfpq_topk",
        "ann3_ivf_topk",
        "sq2_product_quantize",
        "dq1a_column_profile_approx",
        "txt9_bigram_surprisal",
        "mm5_image_patches",
        "dc2_fuzzy_decontaminate",
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
