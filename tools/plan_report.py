"""Generate PLANS.md — formatted physical plans for the key queries, so
the scan-pushdown/broadcast/codegen claims in ARCHITECTURE.md §3 are
readable without running Spark.

    python tools/plan_report.py [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    ("f2_recent_window", "date-range filter → PushedFilters on the scan"),
    ("a4_pricing_summary", "single-pass multi-aggregate → pruned ReadSchema, partial aggs"),
    ("k1_top6_er", "window top-k → one exchange on the creator key + broadcast join"),
    ("j2_first_match_theta_join", "substring theta-join → BroadcastNestedLoopJoin (no cartesian)"),
    ("c3_pricing_dim", "literal dim join → BroadcastHashJoin"),
    ("dd3_minhash_lsh_pairs", "LSH banding → equi-join on (band, bucket)"),
    ("st1_tumbling_window", "event-time window aggregation"),
    ("aj1_asof_click_purchase", "as-of join → union + window, ZERO join nodes"),
    ("rj2_error_near_purchase", "band join → equi-join on (key, bucket), no BNLJ"),
    ("sp1_hash_split", "deterministic hash split → shuffle-free scan expression"),
    ("sp3_k_per_stratum", "k-per-stratum sample → WindowGroupLimit partial top-k"),
    ("sq1_int8_quantize", "int8 quantization → pure array exprs, no exchange"),
    ("ro1_hourly_rollup", "rollup cascade → hourly agg over 5-min partials, one scan"),
    ("dp1_sequence_packing", "global prefix sum → per-bucket windows + broadcast offsets, no data-sized SinglePartition"),
    ("dd8_dedup_keep_list", "dd2 exact pairs → pointer-doubling CC → canonical keep flag + cluster-size window; LSH candidates slot in unchanged at 100 TB"),
    ("ds1_corpus_shuffle", "global row_number → 16^prefix_chars hash-prefix buckets (default 4096) + broadcast counts, no data-sized SinglePartition"),
    ("mx1_temperature_mix", "per-source budget admission → (source, bucket) windows + broadcast integer budgets"),
    ("zo1_zorder_stats", "Z-order key → codegen bit-interleave, scalar span broadcast (BNLJ on a 1-row side), one stats agg"),
    ("dq1_column_profile", "column profiler → ONE scan + one Expand for 6 exact distincts, 1-row unpivot"),
    ("ad1_rolling_zscore", "rolling z-score → three frame-sharing window aggs, ONE user_id exchange"),
    ("dc2_fuzzy_decontaminate", "portable-MinHash LSH banding → band-bucket equi-join, shuffle carries 8×32-char sigs, never text"),
    ("ii2_bm25_topk", "BM25 retrieval → broadcast term-dim prunes the explode BEFORE the tf shuffle"),
    ("sk2_salted_join_segment", "salted join → (key, salt) equi-join, hot key spread over 8 sub-keys"),
    ("ann4_portable_lsh_topk", "portable sign-LSH → one projection pass, (band, bucket) candidate join carries ids only"),
    ("dd9_portable_simhash_pairs", "portable SimHash → integer vote fingerprint, nibble-band equi-join, bit_count(xor) verify"),
    ("cm1_corpus_manifest", "curation manifest → three doc_id-grain joins over the composed dd11/dc2/txt8 plans; shared digest+shingle intermediates (r7)"),
    ("dd12_repeated_span_trim", "repeated-substring trim → per-doc lead() k-gram window, gh-keyed dup join (NULL tail excluded), coverage/island windows sharing one doc exchange"),
    ("dd11_staged_keep_list", "staged dedup keep-list → Window-FREE since r8: digest survivor via groupBy min + salted join, CC labels + cluster sizes via salted joins (mega-cluster safe)"),
    ("ii4_prf_rerank", "PRF hybrid retrieval → candidate join carries (query_id, doc_id, rank); embeddings attach only to candidate rows; bounded 5-vector centroid fold"),
    ("ii5_rrf_fusion", "RRF fusion → pure column map over ii4's candidates + one per-query window, no new join"),
    ("dp2_sequence_manifest", "sequence manifest → dp1 offsets + one bounded explode (Σ n_seqs) + map-side-combined groupBy(seq)"),
    ("dd13_semantic_keep_list", "SemDeDup → broadcast codebook assignment (no shuffle), in-cell pair join, pointer-doubling CC, skew-safe sizes"),
    ("txt10_trigram_surprisal", "held-out trigram LM → train-side count tables (map-side combined), ctx rollups from counts not rescans, eval joins on natural keys, TakeOrderedAndProject top-20"),
    ("cp1_curated_corpus", "curated corpus → cm1 keep set → pinned admitted table → bucketed shuffle/pack decompositions; pos-grain final joins (dense unique key)"),
    ("dd14_winnowing_pairs", "winnowing copy pairs → pinned sel (4 consumers), tiny pinned stop-fp anti-join, fp-keyed self-join carries (doc, hash) only"),
    ("dd15_quality_survivor", "quality-survivor keep-list → Window-free: argmax-struct groupBy(cluster) + salted attach; quality via left join (missing row == NULL)"),
    ("mx2_epoch_budget", "epoch budget plan → one map-side-combined groupBy(source) + broadcast 1-row global; all-BIGINT budget arithmetic"),
    ("ii7_fusion_eval", "fusion A/B eval → pinned clamped top-50 base feeds both modes; labels from the shared pinned tf relation; query-grain metadata joins"),
    ("sp4_cluster_split", "cluster-aware split → dd11's window-free staged keep-list + ONE doc-grain equi-join + pure split projection (r10)"),
    ("ds2_epoch_order", "multi-epoch order → fractional-epoch reservoir per (source, prefix) buckets, bounded epoch explode, per-(epoch, prefix) position windows + broadcast metadata offsets (r10)"),
    ("sp5_joint_cluster_split", "joint-modality split → dd11 star edges ∪ 2-probe τ-pair edges through ONE pointer-doubling CC + split projection (r10)"),
    ("qc1_model_quality_score", "linear-classifier inference → token explode, two codegen md5s per row (no HOF lambda), ONE map-side-combined exchange carrying (doc, int) (r11)"),
    ("txt14_pii_scrub", "PII redaction → ONE codegen Project (3 counts + 3 replaces per row), ZERO exchanges (r11)"),
    ("tok1_subword_token_count", "BPE apply → token explode + ~21 codegen string ops/token (no HOF lambda), ONE map-side-combined exchange of (doc, int) (r12)"),
    ("tok3_memoized_token_count", "memoized tokenize → cascade on the DISTINCT vocab side only, BroadcastHashJoin back (hot words never shuffle) (r12)"),
    ("km2_kmeans_train", "integer Lloyd → assignment = column expr vs codebook literal (no shuffle); M-step = posexplode + map-side-combined groupBy, k×dim metadata rows (r12)"),
    ("tok4_real_vocab_token_count", "500-rule table → chunked-barrier cascade at vocab grain (localCheckpoint per 100 merges; no K-deep expression), broadcast join-back (r13)"),
    ("st13_streaming_expectation_drift", "streaming expectation suite → ONE streaming grouped agg (2-key state), unpivot after agg, metadata drift self-join (r13)"),
    ("mx6_subword_epoch_budget", "subword epoch budgets → tok1 explode+combine feeding ONE groupBy(source) + broadcast 1-row global (r13)"),
    ("tok5_vocab_udf_token_count", "2000-rule UDF tokenize → ONE ArrowEvalPython below the vocab distinct (never on the occurrence stream), BroadcastHashJoin back (r14)"),
    ("ann6_trained_ivf_topk", "trained-cells IVF → km2 training (codebook-literal assignment, k×dim metadata M-step) then ann3's serving shape: one corpus scan for cells, candidates carry probed cells only (r14)"),
    ("tok6_full_vocab_token_count", "50000-rule learned table through tok5's UDF shape — plan identical in structure at 25x the rules: ONE ArrowEvalPython on the vocab distinct, broadcast join-back (r15)"),
    ("trn1_bpe_train", "distributed BPE training → corpus touched ONCE (frequency-weighted vocab groupBy); each greedy iteration is vocab-grain: pair explode + map-side-combined count, 1-row argmax collect, literal-replace re-merge (r15)"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    import __spark_entry__ as entry_mod
    from ig_etl_with_user_reports_2024_spark.session import get_spark

    spark = get_spark("plan_report")
    qs = entry_mod.queries()
    out = [
        "# PLANS — formatted physical plans for the showcase queries",
        "",
        f"Generated by tools/plan_report.py against {args.sf}.",
        "What to look for per ARCHITECTURE.md §3: `PushedFilters` on scans,",
        "pruned `ReadSchema`, `BroadcastExchange`/`BroadcastHashJoin` for",
        "dims, a single `Exchange` per grouping grain.",
        "",
    ]
    for name, why in SHOWCASE:
        df = qs[name](spark, args.sf)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", f"*{why}*", "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
