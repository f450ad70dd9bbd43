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
    # Round-13 rotation under the STANDING RULE (VERDICT r6 "Next
    # round" #1, stated in __spark_entry__): new/changed first (8 —
    # dq5/mx6/tok4/st13/ii8 NEW, dq4 re-keyed, mx2's oracle
    # construction refactored onto the shared _epoch_budget_sql
    # builder, cp6's km1-r10 catch-up from the r12
    # _md5_prefix_checksum lift), then all remaining slots
    # oldest-verdict first: ALL 35 remaining r9-era hash-checkable
    # verdicts (VERDICT r12 #2) + the 7 oldest r10-era in catalog
    # order. 8 + 35 + 7 = 50; after r13 no hash-checkable verdict
    # predates r10.
    # Overflow = r11/r12-green entries and the youngest r10 verdicts —
    # asserted OUT so the window isn't silently wasted.
    first50 = list(entry.queries())[:50]
    for name in entry._DRIVER_PRIORITY:
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in (
        # r11/r12-green, untouched this round (the youngest verdicts
        # are the cheapest to defer, per the rule)
        "cp7_scrubbed_delta_store",
        "cp8_delta_shard_integrity",
        "tok1_subword_token_count",
        "tok3_memoized_token_count",
        "km2_kmeans_train",
        "rf14_int_lloyd_convergence",
        "ds4_epoch_curriculum",
        "dp4_subword_packing",
        "mx4_subword_mix",
        "tok2_budget_grain_ab",
        "cp9_takedown_rewrite",
        "dq3_expectation_suite",
        "mm6_interleaved_packing",
        "mx5_multimodal_mix",
        "qc1_model_quality_score",
        "txt14_pii_scrub",
        "cp5_scrubbed_release",
        "cm1_corpus_manifest",
        "cp1_curated_corpus",
        # r10-green past the cut (catalog order within the cohort
        # decides it — k2/k3/k4 lead r14's cohort)
        "k2_latest6_pivot",
        "k3_top10_tokens",
        "k4_c5_modal_hour",
        "k6_priority_cascade",
        "x1_regex_extract",
        "km1_kmeans_assign",
        "dp3_epoch_packing",
        "sp4_cluster_split",
        "sp5_joint_cluster_split",
        "dd13_semantic_keep_list",
        "st5_stateful_sessions",
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
