"""Diagnostic recall/accuracy numbers behind the rf* floor queries.

The registered rf1–rf5 queries project only (meets_floor, recall_floor)
so the driver can hash-check them against a literal oracle; the actual
measured numbers live here so a recall regression is debuggable (which
component, by how much) and the floors stay honest margins, not
tautologies.
"""

from __future__ import annotations

from ig_etl_with_user_reports_2024_spark.plans import star_recall as rf


def _row(diag_df):
    rows = diag_df.collect()
    assert len(rows) == 1
    return rows[0]


def test_rf1_lsh_recall_meets_floor_with_margin(spark, sf_oracle):
    # r7: rf1 runs on the clustered fixture (floor 0.9, measured 1.0)
    r = _row(rf.rf1_diag(spark, sf_oracle))
    assert r.meets_floor
    assert r.recall >= 0.9
    assert r.n_exact > 0


def test_ann_recall_on_uniform_corpus_stays_loose(spark, sf_oracle):
    """The OLD rf1/rf10 regime, kept visible without gating on it:
    uniform-random vectors are VQ's worst case, so ANN recall there is
    genuinely modest — assert only the loose historical bounds
    (hyperplane-LSH >= 0.5, IVF-PQ+refine >= 0.3) on the raw
    embeddings table."""
    from ig_etl_with_user_reports_2024_spark.operators import similarity as sim
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    queries = emb.filter("vec_id < 10")
    exact = sim.cosine_topk(queries, emb, "vec_id", "embedding", k=5)
    lsh = sim.lsh_topk(queries, emb, "vec_id", "embedding", k=5)
    pq = sim.ivfpq_topk(queries, emb, "vec_id", "embedding", k=5)
    r_lsh = _row(rf._recall_row(exact, lsh, ["q_id", "n_id"], floor=0.5))
    r_pq = _row(rf._recall_row(exact, pq, ["q_id", "n_id"], floor=0.3))
    assert r_lsh.recall >= 0.5 and r_pq.recall >= 0.3


def test_clustered_fixture_is_deterministic_and_clustered(spark, sf_oracle):
    """The fixture contract: same rows under re-evaluation and
    repartitioning (salted-md5 draws, no RNG), one vector per
    embeddings row, 64-d, labels = vec_id mod 16."""
    fx = rf.clustered_embeddings(spark, sf_oracle)
    a = {r.vec_id: (r.label, tuple(r.embedding)) for r in fx.collect()}
    b = {
        r.vec_id: (r.label, tuple(r.embedding))
        for r in rf.clustered_embeddings(spark, sf_oracle)
        .repartition(7)
        .collect()
    }
    assert a == b
    n_emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet").count()
    assert len(a) == n_emb
    for vid, (label, vec) in list(a.items())[:20]:
        assert label == vid % 16
        assert len(vec) == 64
        assert all(-1.5 <= v <= 1.5 for v in vec)


def test_rf2_ivf_recall_meets_floor(spark, sf_oracle):
    r = _row(rf.rf2_diag(spark, sf_oracle))
    assert r.meets_floor
    assert r.recall >= 0.4


def test_rf3_minhash_recall_meets_floor(spark, sf_oracle):
    r = _row(rf.rf3_diag(spark, sf_oracle))
    assert r.meets_floor
    assert r.recall >= 0.8


def test_rf4_simhash_recall_meets_floor(spark, sf_oracle):
    r = _row(rf.rf4_diag(spark, sf_oracle))
    assert r.meets_floor
    assert r.recall >= 0.5


def test_rf5_sketch_accuracy_within_tolerance(spark, sf_oracle):
    r = _row(rf.rf5_diag(spark, sf_oracle))
    assert r.meets_floor
    assert r.max_rel_err <= 0.05


def test_registered_floor_queries_project_only_floor_columns(spark, sf_oracle):
    # the driver hashes these against a literal SELECT — any extra
    # column (or a recall value sneaking back in) would break the oracle
    for q in (
        rf.rf1_lsh_topk_recall,
        rf.rf2_ivf_topk_recall,
        rf.rf3_minhash_recall,
        rf.rf4_simhash_recall,
        rf.rf5_sketch_accuracy,
        rf.rf6_pq_distortion,
        rf.rf7_approx_distinct_accuracy,
    ):
        df = q(spark, sf_oracle)
        assert df.columns == ["meets_floor", "recall_floor"]


def test_rf6_pq_distortion_within_floor(spark, sf_oracle):
    r = _row(rf.rf6_diag(spark, sf_oracle))
    assert r.meets_floor
    assert r.distortion <= 0.85


def test_rf7_approx_distinct_accuracy_within_floor(spark, sf_oracle):
    r = _row(rf.rf7_diag(spark, sf_oracle))
    assert r.meets_floor
    assert r.max_rel_err <= 0.05


def test_rf11_semdedup_cell_recall_diag(spark, sf_oracle):
    """dd13's cell-capture floor holds with headroom, and the diag
    numbers stay in the measured uniform-regime band (0.26-0.38 across
    sf) — a capture collapse (bad assignment) or a silent perfect
    score (gate accidentally comparing the pair set to itself) both
    fail."""
    r = _row(rf.rf11_diag(spark, sf_oracle))
    assert r.meets_floor
    assert 0.2 <= r.recall < 0.9
    assert 0 < r.n_hit < r.n_exact


def test_rf13_crosssplit_capture_diag(spark, sf_oracle):
    """dc3's cross-split capture floor holds with headroom at the
    r10 multi-probe assignment (0.667/0.810/0.696 measured tri-scale
    vs single-probe's 0.278-0.286); a capture collapse back to single
    assignment (< 0.5) and a silent self-comparison both fail. The
    hit set must also be exactly dc3's pair set: every flagged train
    doc appears as an a_id (the pair stage IS the operator's input),
    and the multi-probe flag set strictly SUPERSETS the single-probe
    one (recall-first: probing the runner-up cell only adds pairs)."""
    r = _row(rf.rf13_diag(spark, sf_oracle))
    assert r.meets_floor
    assert 0.5 <= r.recall < 0.9
    assert 0 < r.n_hit < r.n_exact
    import __spark_entry__ as em

    flagged = {
        row.vec_id
        for row in em.queries()["dc3_semantic_decontaminate"](
            spark, sf_oracle
        ).collect()
    }
    from ig_etl_with_user_reports_2024_spark.plans.star_pipeline import (
        semantic_cross_split_multiprobe_pairs,
        semantic_cross_split_pairs,
    )
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    a_ids = {
        row.a_id
        for row in semantic_cross_split_multiprobe_pairs(emb).collect()
    }
    assert flagged == a_ids
    single = {row.a_id for row in semantic_cross_split_pairs(emb).collect()}
    assert single < flagged, "2-probe flag set must strictly supersede 1-probe"
