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
    # Round-4 rotation (VERDICT r3 "Next round" #1): every query whose
    # latest driver verdict predates its last source change must sit in
    # the driver's ~50-slot window. That is (a) everything changed or
    # added in r4, (b) the r1-era verdicts, (c) the r2 greens whose
    # modules changed in r3. The deliberate overflow (k7/x8b/st4/st6/
    # mm2/a8_approx — rows-only or thin twins of in-window queries) is
    # asserted OUT so the window isn't silently wasted on weak signals.
    first50 = list(entry.queries())[:50]
    for name in (
        # changed/added in r4
        "rf7_approx_distinct_accuracy",
        "dp1_sequence_packing",
        "ds1_corpus_shuffle",
        "mx1_temperature_mix",
        "sq3_matryoshka_truncate",
        "mm4_audio_chunks",
        "fn2_conversion_window_funnel",
        "dd6_dup_clusters",
        "sq2_product_quantize",
        "rf6_pq_distortion",
        "dd2_ngram_jaccard_pairs",
        "rf3_minhash_recall",
        "rf4_simhash_recall",
        # r1-era driver verdicts
        "txt1_lang_id",
        "txt2_quality_score",
        "txt3_token_counts",
        "txt4_content_fingerprint",
        "dd5_embedding_neardup",
        "mm1_binary_metadata",
        "ann3_ivf_topk",
        # r2 greens whose modules changed in r3
        "aj1_asof_click_purchase",
        "rj1_views_before_purchase",
        "dc1_decontaminate",
        "sp3_k_per_stratum",
        "st5_stateful_sessions",
        "a123_er_formulas",
        "a6_viral_count",
        "a12_split_half_trend",
        "a13_class_means_pivot",
        "a14_c6_fake_score",
    ):
        assert name in first50, f"{name} fell out of the driver's 50-slot window"
    for name in ("k7_top5_preview", "x8b_json_extract", "mm2_frame_sample"):
        assert name not in first50, f"{name} should be deliberate overflow"


def test_oracles_reference_registered_queries():
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs
