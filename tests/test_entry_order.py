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
    # Round-12 rotation under the STANDING RULE (VERDICT r6 "Next
    # round" #1, stated in __spark_entry__): new/changed first (17 —
    # cp7/cp8/tok1/km2/rf14/ds4/dp4/mx4/tok2/cp9/dq3/mm6/tok3/mx5/
    # dq4 NEW + ds2/ds3 whose plan construction moved onto the shared
    # epoch_membership/_ds3_tier builders), then all remaining slots
    # oldest-verdict first: ALL 26 remaining r8-era hash-checkable
    # verdicts (VERDICT r11 #3) + the 7 oldest r9-era in catalog
    # order. 17 + 26 + 7 = 50; after r12 no hash-checkable verdict
    # predates r9.
    # Overflow = r10/r11-green entries and the youngest r9 verdicts —
    # asserted OUT so the window isn't silently wasted.
    first50 = list(entry.queries())[:50]
    for name in entry._DRIVER_PRIORITY:
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in (
        # r10/r11-green, untouched this round (the youngest verdicts
        # are the cheapest to defer, per the rule)
        "qc1_model_quality_score",
        "txt14_pii_scrub",
        "qc2_quality_signal_ab",
        "cp5_scrubbed_release",
        "cp6_shard_integrity",
        "cm1_corpus_manifest",
        "dc2_fuzzy_decontaminate",
        "cp1_curated_corpus",
        "cp2_corpus_datacard",
        "cp4_datacard_diff",
        "st10_streaming_upsert",
        "c13_sponsor_detector",
        "rf1_lsh_topk_recall",
        "a123_er_formulas",
        "k1_top6_er",
        "dd10_keep_list_banded",
        "dd11_staged_keep_list",
        "sp4_cluster_split",
        "sp5_joint_cluster_split",
        "dd13_semantic_keep_list",
        "km1_kmeans_assign",
        "dp3_epoch_packing",
        # r9-green past the cut (catalog order within the cohort
        # decides it; the st family's tail + scalar/report rows)
        "c12_collab_status",
        "rf8_approx_percentile_accuracy",
        "a4_pricing_summary",
        "j1_work_queue_anti_join",
        "j3_users_posts_join",
        "a7_frequency_map",
        "a5_consistency_score",
        "a11_post_gap_frequency",
        "c1_size_buckets",
        "f3_recent_flag",
        "f4_category_filter",
        # r9-green displaced by dp4/mx4/tok2/cp9/dq3/mm6/tok3/mx5/
        # dq4 — lead r13's cohort
        "st6_streaming_dedup",
        "st12_streaming_band_admission",
        "ro1_hourly_rollup",
        "st2_sliding_window",
        "st1_tumbling_window",
        "st4_streaming_tumbling",
        "st7_session_window",
        "st3_sessionization",
        "x8b_json_extract",
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
