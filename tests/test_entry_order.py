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
    # Round-7 rotation under the STANDING RULE (VERDICT r6 "Next
    # round" #1, stated in __spark_entry__): new/changed first, then
    # all remaining slots oldest-driver-verdict first. r7: 8
    # new/changed + ro2 (r3) + the 41 r4-era verdicts = exactly 50, so
    # after this round no verdict predates r5. Deliberate overflow =
    # r5/r6-green and untouched — asserted OUT so the window isn't
    # silently wasted.
    first50 = list(entry.queries())[:50]
    for name in entry._DRIVER_PRIORITY:
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in (
        # r6-green on first contact or re-contact, untouched-in-plan
        # this round — the youngest verdicts, cheapest to defer
        "dd10_keep_list_banded",
        "ann5_ivfpq_topk",
        "ann3_ivf_topk",
        "sq2_product_quantize",
        "dq1a_column_profile_approx",
        "ii3_bm25_log_idf",
        "txt9_bigram_surprisal",
        "mm5_image_patches",
        # dc2: r7 refactor is pure function extraction (plan-identical,
        # local gate re-proves exact); r6 verdict fresh
        "dc2_fuzzy_decontaminate",
        # r5-green, untouched
        "cdc1_merge_upsert",
        "pr1_pagerank",
        "km1_kmeans_assign",
    ):
        assert name not in first50, f"{name} should be deliberate overflow"


def test_oracles_reference_registered_queries():
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs
