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


def test_unverified_queries_land_in_driver_window():
    first50 = list(entry.queries())[:50]
    for name in (
        "dd6_dup_clusters",
        "sq1_int8_quantize",
        "a15_length_percentiles",
        "txt6_vocab_top50",
        "ro2_sketch_rollup",
        "txt5_rolling_fingerprint",
        "rf1_lsh_topk_recall",
        "rf2_ivf_topk_recall",
        "rf3_minhash_recall",
        "rf4_simhash_recall",
        "rf5_sketch_accuracy",
        "rf6_pq_distortion",
        "sq2_product_quantize",
        "mm3_frame_select",
        "txt7_repetition_stats",
        "dd7_ngram_contamination",
        "a16_length_histogram",
        "st7_session_window",
        "fn2_conversion_window_funnel",
    ):
        assert name in first50, f"{name} fell out of the driver's 50-slot window"


def test_oracles_reference_registered_queries():
    qs = entry.queries()
    for name in entry.oracle_sql():
        assert name in qs
