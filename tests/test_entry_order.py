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
    # Round-5 rotation (VERDICT r4 "Next round" #1): the 11 queries
    # whose latest driver verdict is still r2 (round 4's deliberate
    # overflow) must lead the ~50-slot window, followed by everything
    # whose modules round 5 changed (packing/sampling bucket
    # parameterization, dedup persist lifecycle, graph round-count).
    # The deliberate overflow — rows-only entries whose accuracy floors
    # are fresh, and thin variants of fresher queries — is asserted OUT
    # so the window isn't silently wasted on weak signals.
    first50 = list(entry.queries())[:50]
    for name in (
        # new late in round 5 — first driver contact
        "cm1_corpus_manifest",
        "ann4_portable_lsh_topk",
        "dd9_portable_simhash_pairs",
        "st8_stream_static_join",
        "st9_stream_stream_join",
        "dc2_fuzzy_decontaminate",
        "ii2_bm25_topk",
        "sk1_salted_distinct_users",
        "sk2_salted_join_segment",
        # new in round 5 — first driver contact
        "cdc1_merge_upsert",
        "cdc2_scd2_intervals",
        "txt8_filter_verdict",
        "ii1_inverted_index",
        "km1_kmeans_assign",
        "rf8_approx_percentile_accuracy",
        "rf9_kmeans_lloyd_floor",
        "zo1_zorder_stats",
        "dq1_column_profile",
        "dq2_schema_drift",
        "pr1_pagerank",
        "ad1_rolling_zscore",
        # the 11 r2-stale queries, next in line this round
        "x10_c7_argmax_priority",
        "ro1_hourly_rollup",
        "st1_tumbling_window",
        "st2_sliding_window",
        "st3_sessionization",
        "k7_top5_preview",
        "x8b_json_extract",
        "st4_streaming_tumbling",
        "st6_streaming_dedup",
        "mm2_frame_sample",
        "a8_approx_distinct",
        # modules changed in round 5
        "ds1_corpus_shuffle",
        "mx1_temperature_mix",
        "dp1_sequence_packing",
        "sp1_hash_split",
        "sp2_stratified_sample",
        "sp3_k_per_stratum",
        "dc1_decontaminate",
        "dd2_ngram_jaccard_pairs",
        "dd6_dup_clusters",
        # new in round 5
        "dd8_dedup_keep_list",
    ):
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in (
        # the 9 tier-(c) slots that paid for the late-r5 new queries
        "st7_session_window",
        "rj2_error_near_purchase",
        "txt7_repetition_stats",
        "a4_pricing_summary",
        "a15_length_percentiles",
        "c12_collab_status",
        "j1_work_queue_anti_join",
        "j2_first_match_theta_join",
        "j4_a10_keyword_scores",
        "dd3_minhash_lsh_pairs",
        "dd4_simhash_pairs",
        "ann2_lsh_topk",
        "ro2_sketch_rollup",
        "a16_length_histogram",
        "f3_recent_flag",
        "txt6_vocab_top50",
        # the 11 tier-(c) slots that paid for the round-5-new queries
        "a7_frequency_map",
        "c1_size_buckets",
        "f7_recent20_mixed_window",
        "j3_users_posts_join",
        "j5_page_merge_dedup",
        "so1_first_occurrence_dedup",
        "mj1_shipping_priority",
        "a5_consistency_score",
        "txt5_rolling_fingerprint",
        "a11_post_gap_frequency",
        "c9_f9_niche_distribution",
        "f8_stoplist_tokens",
    ):
        assert name not in first50, f"{name} should be deliberate overflow"


def test_oracles_reference_registered_queries():
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs
