"""Opt-in scale stress: replicate sf0.1 ×8 (~4.8M lineitem rows) into a
temp dir and run the headline shapes — completion + row-count sanity, the
local stand-in for the 100 TB plan-shape claims.

Skipped unless SPARK_GRAFT_SCALE_TEST=1 (adds ~2-4 min).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_TEST") != "1",
    reason="set SPARK_GRAFT_SCALE_TEST=1 to run the x8 scale stress",
)

REPLICATION = 8


@pytest.fixture(scope="module")
def big_sf(spark):
    # one replicate-and-rekey routine repo-wide (also drives the 32×+
    # probe): tools/scale_probe.build — embeddings are replicated and
    # re-keyed there too, so vec-count assertions below derive counts
    # from the written file, never from the base sf
    from tools.scale_probe import build

    out = build(spark, "/root/testdata/sf0.1", REPLICATION)
    yield out
    shutil.rmtree(out, ignore_errors=True)


def test_headline_queries_complete_at_8x(spark, big_sf):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    li = spark.read.parquet(f"{big_sf}/lineitem.parquet")
    assert li.count() >= 4_000_000

    r = qs["a4_pricing_summary"](spark, big_sf).collect()
    assert len(r) == 6  # same groups, 8x the rows

    top = qs["k1_top6_er"](spark, big_sf)
    assert top.count() > 0

    dd = qs["dd3_minhash_lsh_pairs"](spark, big_sf)
    assert dd.count() > 0

    st = qs["st1_tumbling_window"](spark, big_sf)
    assert st.count() > 0


def test_aggregate_scales_linearly_in_rows(spark, big_sf):
    # the x8 sum must be exactly 8x the base sum (replicated data) —
    # catches silent row loss under the bigger shuffle
    from ig_etl_with_user_reports_2024_spark.functions.exact import lsum

    base = (
        spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .agg(lsum("l_extendedprice").alias("s"))
        .collect()[0]
        .s
    )
    big = (
        spark.read.parquet(f"{big_sf}/lineitem.parquet")
        .agg(lsum("l_extendedprice").alias("s"))
        .collect()[0]
        .s
    )
    assert big == pytest.approx(base * REPLICATION, rel=1e-12)


def test_new_families_complete_at_8x(spark, big_sf):
    # r2 families: temporal joins, sampling, quantization, stateful
    # streaming — completion + sanity at 8x rows
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    assert qs["aj1_asof_click_purchase"](spark, big_sf).count() > 0
    assert qs["rj1_views_before_purchase"](spark, big_sf).count() > 0
    splits = {
        r.split: r.n
        for r in qs["sp1_hash_split"](spark, big_sf)
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(splits) == {"train", "val", "test"}
    n_vecs = spark.read.parquet(f"{big_sf}/embeddings.parquet").count()
    assert qs["sq1_int8_quantize"](spark, big_sf).count() == n_vecs * 64
    assert qs["st5_stateful_sessions"](spark, big_sf).count() > 0


def test_r4_layout_family_completes_at_8x(spark, big_sf):
    # dp1/ds1/mx1: the two-level prefix-sum/row_number decompositions
    # must complete at 8x rows with their invariants intact
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # ds1 emits a position for EVERY document (no text filter — a
    # shuffle order covers empty docs too); compare unfiltered
    n_docs = spark.read.parquet(f"{big_sf}/documents.parquet").count()
    dp = qs["dp1_sequence_packing"](spark, big_sf)
    assert dp.count() > 0
    # offsets are a gapless concatenation: max(start+n_tokens) == sum(n)
    row = dp.agg(
        F.max(F.col("start_off") + F.col("n_tokens")).alias("hi"),
        F.sum("n_tokens").alias("total"),
    ).collect()[0]
    assert row.hi == row.total
    ds = qs["ds1_corpus_shuffle"](spark, big_sf)
    # dense permutation at 8x: n rows, positions 0..n-1
    stats = ds.agg(
        F.count("*").alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("nd"),
    ).collect()[0]
    assert (stats.lo, stats.hi, stats.nd) == (0, stats.n - 1, stats.n)
    assert stats.n == n_docs
    mx = qs["mx1_temperature_mix"](spark, big_sf)
    kept = mx.filter("kept").count()
    assert 0 < kept < mx.count()


def test_cc_and_cascade_complete_at_8x(spark, big_sf):
    # VERDICT r4 #5: the two most shape-dependent plans at 8x —
    # dd6's pointer-doubling connected components (round count grows
    # with component diameter, cost with rows-per-round) and k6's
    # window cascade (per-key top-3 under 8x keys × rows)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    n_docs = spark.read.parquet(f"{big_sf}/documents.parquet").count()
    cc = qs["dd6_dup_clusters"](spark, big_sf)
    stats = cc.agg(
        F.count("*").alias("n"),
        # min-label invariant: every cluster id is <= its member's id
        F.sum(F.when(F.col("cluster_id") > F.col("doc_id"), 1).otherwise(0)).alias(
            "bad"
        ),
        F.countDistinct("cluster_id").alias("n_clusters"),
    ).collect()[0]
    assert stats.n == n_docs  # every doc labeled, none lost in rounds
    assert stats.bad == 0
    assert 0 < stats.n_clusters <= n_docs

    k6 = qs["k6_priority_cascade"](spark, big_sf)
    per_key = k6.groupBy("o_custkey").agg(F.count("*").alias("n"))
    assert per_key.agg(F.max("n")).collect()[0][0] <= 3
    assert k6.filter((F.col("rn") < 1) | (F.col("rn") > 3)).count() == 0
    assert k6.count() > 0


def test_r5_graph_window_layout_complete_at_8x(spark, big_sf):
    # round-5 additions whose cost is most shape-dependent at 8x:
    # pr1 (per-round |E| joins over ~8x edges), ad1 (windowed stats
    # over 8x events per user), zo1 (span broadcast + stats agg over
    # ~39M lineitem rows), dq1 (six exact distincts through one Expand)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    pr = qs["pr1_pagerank"](spark, big_sf)
    stats = pr.agg(
        F.count("*").alias("n"),
        F.min("rank_scaled").alias("lo"),
        F.sum(F.when(F.col("rank_scaled") < 150_000, 1).otherwise(0)).alias(
            "below_floor"
        ),
    ).collect()[0]
    # every node holds at least the undamped base rank; none lost
    assert stats.n > 0 and stats.below_floor == 0 and stats.lo >= 150_000

    ad = qs["ad1_rolling_zscore"](spark, big_sf)
    n_events = spark.read.parquet(f"{big_sf}/events.parquet").count()
    arow = ad.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("is_anomaly"), 1).otherwise(0)).alias("flags"),
        F.sum(F.when(F.col("std_20") < 0, 1).otherwise(0)).alias("neg_std"),
    ).collect()[0]
    assert arow.n == n_events  # windowed projection is row-preserving
    assert 0 < arow.flags < arow.n
    assert arow.neg_std == 0

    zo = qs["zo1_zorder_stats"](spark, big_sf).collect()
    assert 0 < len(zo) <= 256
    assert sum(r.n_rows for r in zo) == spark.read.parquet(
        f"{big_sf}/lineitem.parquet"
    ).count()

    dq = qs["dq1_column_profile"](spark, big_sf).collect()
    assert len(dq) == 6
    orderkey = {r.col_name: r for r in dq}["o_orderkey"]
    assert orderkey.n_distinct == spark.read.parquet(
        f"{big_sf}/orders.parquet"
    ).count()  # re-keyed replicas keep o_orderkey unique at 8x


def test_late_r5_retrieval_and_skew_complete_at_8x(spark, big_sf):
    # dc2 (banded self-join whose candidate volume tracks cross-split
    # similarity density — 8x replicas make every doc an exact dup of 7
    # others, the worst case for band collisions), ii2 (tf shuffle over
    # 8x token hits), sk1/sk2 (salted shapes at 8x fan-in)
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    dc = qs["dc2_fuzzy_decontaminate"](spark, big_sf)
    drows = dc.agg(
        F.count("*").alias("n"),
        F.min("n_eval_matches").alias("lo"),
    ).collect()[0]
    # replicas guarantee collisions: every train doc whose replica
    # lands in eval must surface, each with >= 1 eval match
    assert drows.n > 0 and drows.lo >= 1

    ii = qs["ii2_bm25_topk"](spark, big_sf).collect()
    assert len(ii) == 25  # 5 queries x top-5, independent of corpus size
    by_q = {}
    for r in ii:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        scores = [r.score for r in sorted(rows, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)

    sk1 = {r.event_type: r.n_distinct for r in
           qs["sk1_salted_distinct_users"](spark, big_sf).collect()}
    # the salted two-stage shape stays result-identical to the plain
    # countDistinct at 8x fan-in (the claim the oracle checks at sf0.01)
    unsalted = {
        r.event_type: r.n
        for r in spark.read.parquet(f"{big_sf}/events.parquet")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert sk1 == unsalted

    sk2 = qs["sk2_salted_join_segment"](spark, big_sf).collect()
    n_events = spark.read.parquet(f"{big_sf}/events.parquet").count()
    assert sum(r.n_events for r in sk2) == n_events  # join loses no rows

    # st8 over the DIRECTORY parquet layout (replicas are written as
    # part-file dirs): the streaming source must read them — a glob
    # filter on the directory name silently streamed ZERO rows before
    # the _events_stream layout fix
    st8 = qs["st8_stream_static_join"](spark, big_sf)
    assert st8.count() == n_events


def test_r6_staged_dedup_and_quantized_ann_complete_at_8x(spark, big_sf):
    """dd11 at 8× dup density: every original doc becomes an 8-clique of
    exact dups; the staged plan must collapse them in the digest stage
    (canon count == 1× text-distinct count) and every cluster size must
    be a multiple of 8. ann5 must complete with full top-5 lists."""
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()

    keep = qs["dd11_staged_keep_list"](spark, big_sf)
    rows = keep.collect()
    n_docs = spark.read.parquet(f"{big_sf}/documents.parquet").count()
    assert len(rows) == n_docs  # one manifest row per doc
    kept = [r for r in rows if r.kept]
    # the 8 replicas of every doc share a text → kept is at most the 1×
    # text-distinct count, and every cluster size is a multiple of 8
    assert len(kept) * 8 <= n_docs
    assert all(r.cluster_size % REPLICATION == 0 for r in rows)
    # cluster rep must be the global min doc id of its cluster
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.doc_id)
    assert all(cid == min(ids) for cid, ids in by_cluster.items())

    ann = qs["ann5_ivfpq_topk"](spark, big_sf)
    res = ann.collect()
    assert len(res) == 50  # 10 queries x top-5 at this density
    assert all(1 <= r.rank <= 5 for r in res)

    zo = {r.layout: r for r in qs["zo2_pruning_effectiveness"](spark, big_sf).collect()}
    # replication preserves key SPANS, so pruning ratios must persist
    assert zo["zorder"].buckets_touched < 0.25 * zo["zorder"].n_buckets
    assert zo["linear"].buckets_touched == zo["linear"].n_buckets


def test_r7_span_trim_and_clustered_recall_complete_at_8x(spark, big_sf):
    """dd12 at 8x dup density: every doc has 8 exact copies, so EVERY
    anchored 8-gram is corpus-duplicated — every token of every doc
    with >= 8 tokens must be covered, the trim must empty those docs,
    and per-doc stats must be identical across replicas of the same
    text. rf10 must hold its clustered floor (the r7 sweep's refine
    sizing) and cm1's shared-intermediates composition must still
    cover every doc."""
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()

    dd12 = qs["dd12_repeated_span_trim"](spark, big_sf)
    rows = dd12.collect()
    n_docs = spark.read.parquet(f"{big_sf}/documents.parquet").count()
    assert len(rows) == n_docs  # one row per doc, token-less included
    full = [r for r in rows if r.n_tokens >= 8]
    assert full, "replicated corpus unexpectedly has no 8-token docs"
    # replication duplicates every 8-gram: full coverage, empty trims
    assert all(r.n_dup_tokens == r.n_tokens for r in full)
    assert all(r.n_spans == 1 for r in full)
    assert all(r.clean_digest == "<empty>" for r in full)
    # short docs (< 8 tokens) have no anchors — never covered, even
    # though they too are replicated (the documented k-token floor)
    for r in rows:
        if r.n_tokens < 8:
            assert r.n_dup_tokens == 0 and r.n_spans == 0

    rf10 = qs["rf10_ivfpq_recall"](spark, big_sf).collect()[0]
    assert rf10.meets_floor  # refine sized to cell population (r7 fix)

    cm1 = qs["cm1_corpus_manifest"](spark, big_sf)
    assert cm1.count() == n_docs


def test_r8_curated_corpus_and_retrieval_complete_at_8x(spark, big_sf):
    """cp1 at 8x dup density must still lay out a CONSISTENT training
    stream (dense positions, exact prefix sums) over far fewer docs
    than the corpus (every doc is an 8-clique, so dedup drops >= 7/8
    of the quality-keeps); ii4's re-rank must keep dense per-query
    ranks with the NULL-cos suffix in BM25 order; txt10 must rank 20
    docs with non-degenerate tallies."""
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()

    n_docs = spark.read.parquet(f"{big_sf}/documents.parquet").count()
    cp = sorted(
        qs["cp1_curated_corpus"](spark, big_sf).collect(),
        key=lambda r: r.pos,
    )
    assert cp, "curated corpus empty at 8x"
    assert len(cp) < n_docs / 4  # dedup + mixture really cut
    assert [r.pos for r in cp] == list(range(len(cp)))
    cum = 0
    for r in cp:
        assert r.start_off == cum
        cum += r.n_tokens
        assert r.n_seqs == r.last_seq - r.first_seq + 1

    ii4 = qs["ii4_prf_rerank"](spark, big_sf).collect()
    by_q: dict = {}
    for r in ii4:
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        tail = [r for r in rs if r.prf_cos is None]
        assert rs[len(rs) - len(tail):] == tail

    t10 = qs["txt10_trigram_surprisal"](spark, big_sf).collect()
    assert len(t10) == 20
    assert all(r.n_tri > 0 for r in t10)
    assert all(
        0 <= r.n_bo2 + r.n_bo1 + r.n_oov <= r.n_tri for r in t10
    )

    # dp2: every non-final sequence exactly full at 8x token volume
    dp2 = sorted(
        qs["dp2_sequence_manifest"](spark, big_sf).collect(),
        key=lambda r: r.seq,
    )
    assert [r.seq for r in dp2] == list(range(len(dp2)))
    assert all(r.n_tokens_in_seq == 2048 for r in dp2[:-1])

    # ii5: dense fused ranks over the full candidate set
    ii5 = qs["ii5_rrf_fusion"](spark, big_sf).collect()
    by_q5: dict = {}
    for r in ii5:
        by_q5.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q5.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))

    # dd13 at 8x: every vector has 8 exact replicas (cos = 1.0 within
    # the same cell), so every cluster that merged must have size >= 2
    # and exactly one survivor; coverage stays one row per vector
    dd13 = qs["dd13_semantic_keep_list"](spark, big_sf).collect()
    n_vecs = spark.read.parquet(f"{big_sf}/embeddings.parquet").count()
    assert len(dd13) == n_vecs
    assert any(not r.kept for r in dd13)
    by_c: dict = {}
    for r in dd13:
        by_c.setdefault(r.cluster_id, 0)
        by_c[r.cluster_id] += 1
    assert all(
        r.cluster_size == by_c[r.cluster_id] for r in dd13
    )


def test_cp3_nonfinal_sequences_exact_at_sf01(spark):
    """The NON-VACUOUS form of dp2's packing invariant on the delta
    release (tests/test_curated_corpus.py carries the sf0.01 wiring
    checks, where no chain fills a whole sequence): at sf0.1 cp3's
    admitted batch spans 3 sequences, so the non-final==2048 branch
    actually fires."""
    import __spark_entry__ as entry_mod
    from tests.test_curated_corpus import _seq_token_fill

    rows = entry_mod.queries()["cp3_incremental_release"](
        spark, "/root/testdata/sf0.1"
    ).collect()
    fill = _seq_token_fill(rows)
    last = max(fill)
    assert last >= 1, "delta spans one sequence — non-final check vacuous"
    for s in range(last):
        assert fill[s] == 2048, f"non-final seq {s} holds {fill[s]} tokens"
    assert 0 < fill[last] <= 2048


def test_r10_split_and_epoch_families_at_8x(spark, big_sf):
    """r10 families at 8x sf0.1: sp4 must co-locate every dd11
    cluster (8x replicas make every doc an 8-member exact-dup
    cluster, so EVERY cluster is multi-member — co-location is
    maximally exercised), and ds2's positions must stay one dense
    epoch-major permutation with per-doc epoch counts in
    {full, full+1} at 8x volume."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    sp4 = qs["sp4_cluster_split"](spark, big_sf).collect()
    n_docs = spark.read.parquet(f"{big_sf}/documents.parquet").count()
    assert len(sp4) == n_docs  # one split row per doc survives the join
    by_cluster: dict = {}
    for r in sp4:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    # replicas guarantee multi-member clusters; splits must still mix
    assert len({next(iter(s)) for s in by_cluster.values()}) == 3

    ds2 = qs["ds2_epoch_order"](spark, big_sf).collect()
    poss = sorted(r.pos for r in ds2)
    assert poss == list(range(len(ds2)))
    budgets = {
        r.source: r for r in qs["mx2_epoch_budget"](spark, big_sf).collect()
    }
    per_doc: dict = {}
    for r in ds2:
        per_doc.setdefault((r.source, r.doc), 0)
        per_doc[(r.source, r.doc)] += 1
    for (src, _doc), n in per_doc.items():
        b = budgets[src]
        full = b.capped_tokens // b.source_tokens
        assert n in (full, full + 1)


def test_daily_path_row_bearing_at_8x_fresh_docs(spark):
    """The cm2-at-scale gap closed (VERDICT r12 #1/#3): on a
    clone-replicated dir every arriving doc duplicates the store, cm2
    admits nothing, and the daily path's scale verdicts were 0-row.
    The fresh-docs recipe (tools/scale_probe.build(fresh_docs=True) —
    replica text is a (doc_id, rep)-seeded word PERMUTATION, so
    word-3-gram shingles are destroyed while txt8's quality stats are
    preserved) makes replicas genuinely NEW documents: admission is
    row-bearing, the delta release packs MULTIPLE shards, and dp2's
    fullness invariant holds on the merged release."""
    import shutil

    import __spark_entry__ as entry_mod
    from tests.test_curated_corpus import _seq_token_fill
    from tools.scale_probe import build

    qs = entry_mod.queries()
    # 16x, not the suite's 8x: the mixture releases ~107 docs per
    # replica here, so 8x lands at 854 — just under the 1000-doc shard
    # boundary; 16x gives the multi-shard branch real rows
    big = build(
        spark, "/root/testdata/sf0.1", 2 * REPLICATION,
        tables=["documents"], fresh_docs=True,
    )
    try:
        cm2 = qs["cm2_incremental_admission"](spark, big)
        acts = {r.action: r["count"] for r in cm2.groupBy("action").count().collect()}
        # row-bearing: thousands admitted, near-dup and quality drops
        # both present (the recipe must not sterilize the cascade)
        assert acts.get("admit", 0) > 1000, acts
        assert acts.get("drop_quality", 0) > 0, acts
        assert acts.get("drop_near", 0) > 0, acts

        cp3 = qs["cp3_incremental_release"](spark, big).collect()
        assert len(cp3) > 1000, "mixture admitted too few for multi-shard"
        shards = {r.shard for r in cp3}
        assert len(shards) > 1, "delta release packs one shard — vacuous"
        # shard grain: every non-final shard holds exactly shard_size
        from collections import Counter
        per_shard = Counter(r.shard for r in cp3)
        for s in sorted(shards)[:-1]:
            assert per_shard[s] == 1000, (s, per_shard[s])

        # dp2's fullness invariant on the delta tape at this scale
        fill = _seq_token_fill(cp3)
        last = max(fill)
        assert last >= 1, "delta spans one sequence — vacuous here"
        for s in range(last):
            assert fill[s] == 2048, f"non-final seq {s}: {fill[s]}"
        assert 0 < fill[last] <= 2048

        # the scrubbed delta store covers the admitted set exactly,
        # and cp8's integrity rows recompute from store ∪ layout
        cp7 = qs["cp7_scrubbed_delta_store"](spark, big)
        assert cp7.count() == acts["admit"]
        cp8 = {r.shard: r for r in
               qs["cp8_delta_shard_integrity"](spark, big).collect()}
        assert set(cp8) == shards
        ndocs = {s: per_shard[s] for s in shards}
        for s, r in cp8.items():
            assert r.n_docs == ndocs[s], (s, r.n_docs, ndocs[s])
    finally:
        shutil.rmtree(big, ignore_errors=True)
