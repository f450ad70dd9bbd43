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
    # Round-6 rotation (VERDICT r5 "Next round" #2): the 7 new/changed
    # oracles lead, then ALL 33 r3-stale queries (so after r6 no
    # query's latest driver verdict predates r4), then the 10 queries
    # whose modules r6 touched. Deliberate overflow = r4/r5-green and
    # untouched — asserted OUT so the window isn't silently wasted.
    first50 = list(entry.queries())[:50]
    for name in entry._DRIVER_PRIORITY:
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in (
        # r5-green on first contact, untouched in r6 — strongest
        # standing signals, cheapest to defer
        "cdc1_merge_upsert",
        "cdc2_scd2_intervals",
        "txt8_filter_verdict",
        "ii1_inverted_index",
        "zo1_zorder_stats",
        "pr1_pagerank",
        "ad1_rolling_zscore",
        "sk1_salted_distinct_users",
        "sk2_salted_join_segment",
        "dd9_portable_simhash_pairs",
        # r4-green, untouched
        "a12_split_half_trend",
        "x10_c7_argmax_priority",
        "ro1_hourly_rollup",
        "k7_top5_preview",
        "mm2_frame_sample",
        "a8_approx_distinct",
    ):
        assert name not in first50, f"{name} should be deliberate overflow"


def test_oracles_reference_registered_queries():
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs
