"""Similarity search over embedding columns (array<float>).

Beyond-reference operator family (BASELINE.json north star): approximate
nearest neighbor over document embeddings.

- ``cosine_topk`` — exact brute force: cross-join queries × corpus, fold
  the dot product with ``aggregate``/``zip_with`` (JVM lambda functions,
  no Python), rank per query. The correctness baseline; O(|Q|·N).
- ``lsh_topk`` — random-hyperplane LSH: bucket by sign-bit bands, search
  only buckets the query lands in. The scale path: with b bands of r
  bits, candidate count tracks bucket occupancy (~N/2^r per band), so
  |Q|·N becomes |Q|·b·N/2^r. Recall measured against brute force in
  tests/test_similarity.py.
- ``ivf_topk`` — IVF-style coarse quantization without training: cells
  from the leading sign bits, probe the query's cell plus neighbors.

All math in double; per-pair dot products fold sequentially
left-to-right, so results are bit-reproducible under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import pin_bounded
from .windows import top_k_per_group


# NOTE (optimization r16, guide §1 "measure first"): the r15 snapshot
# shipped an UNMEASURED 64-dim unrolled codegen fast path here
# (when(size==64, ((0.0+a0*b0)+a1*b1)+…).otherwise(fold)). r16's A/B
# under bench.py's exact contract showed it is a REGRESSION on every
# consumer that fires it — ann1 0.63→0.42s, ann5 2.22→1.14s, dd13
# 6.35→5.48s, dc3 3.70→2.82s, ii4 1.87→1.52s (fold-only minima; 3-take
# mins, same session) — because BOTH branches land in the generated
# code: 64 GetArrayItem+null-check terms per _dot/_norm call site
# double the expression tree, blow the codegen size budget, and the
# interpreted-HOF cost they were meant to remove is smaller than the
# bloat. Reverted to the plain sequential folds (bit-identical results;
# tests/test_similarity.py pins _dot/_norm ≡ fold across widths/NULLs).


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right dot-product fold — deterministic IEEE
    addition order, bit-reproducible under any partitioning."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


# public names for plans that need the guarded pieces (e.g. ii4's
# NULL-safe re-rank wraps the dot/norms in its own CASE) — same folds,
# so cross-engine bit-exactness arguments carry over unchanged
dot = _dot
norm = _norm


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k per query vector.

    The corpus side stays partitioned; the (small) query side is
    broadcast, so the 'cross join' is a broadcast nested loop with no
    shuffle of the corpus — the right baseline plan even at scale when
    |Q| is small. Ranking is one window on the query id.
    """
    # Norms are per-row quantities: compute them once per side before
    # the pair join instead of per pair (same fold, bit-identical; cuts
    # the per-pair HOF work from 3×dim to 1×dim lambda evals).
    # Zero-norm vectors (dead rows, failed encoders) are EXCLUDED: their
    # cosine is 0/0 = NaN, and Spark's nan-safe ordering puts NaN above
    # every number — an all-zero embedding would otherwise rank #1 for
    # every query (review finding). Cosine is undefined for them; out.
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("q_norm"),
    ).filter(F.col("q_norm") > 0)
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        _norm(F.col(vec_col)).alias("n_norm"),
    ).filter(F.col("n_norm") > 0)
    pairs = c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
    scored = pairs.select(
        "q_id",
        "n_id",
        (
            _dot(F.col("q_vec"), F.col("n_vec"))
            / (F.col("q_norm") * F.col("n_norm"))
        ).alias("cos_sim"),
    )
    return top_k_per_group(
        scored, ["q_id"], [F.col("cos_sim").desc(), F.col("n_id").asc()], k=k
    ).select("q_id", "n_id", "cos_sim", F.col("rn").alias("rank"))


def _hyperplane(dim: int, seed: int) -> list[float]:
    import random

    rnd = random.Random(seed)
    return [rnd.gauss(0.0, 1.0) for _ in range(dim)]


def _dots_against(vec: Column, matrix: list[list[float]]) -> Column:
    """All dot products of ``vec`` against a plan-time literal matrix,
    returned as one ``array<double>``.

    The whole matrix rides in as ONE node: ``from_json`` of a literal
    string is foldable, so Catalyst's ConstantFolding collapses it to a
    single array<array<double>> ``Literal`` at optimization time — the
    expression tree is O(1) in the matrix size. The alternatives were
    measured and rejected: per-plane ``CreateArray`` of 64 literals × 48
    planes (and ``F.lit`` of a nested list, which client-side expands to
    exactly that) made plan construction + Catalyst analysis, not row
    evaluation, the dominant cost of lsh/ivf plans. JSON round-trips
    finite doubles exactly (repr shortest-round-trip → nearest-double
    parse), so the projections are bit-identical.
    """
    import json

    payload = json.dumps([[float(w) for w in row] for row in matrix])
    return F.transform(
        F.from_json(F.lit(payload), "array<array<double>>"),
        lambda p: F.aggregate(
            F.zip_with(vec, p, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bands: int = 12,
    bits_per_band: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH ANN: candidates share at least one band
    signature with the query; exact cosine re-ranks candidates.

    Default banding is many-short (12 bands × 4 bits): realistic
    embedding corpora have weak neighbor structure (cos ~0.3 between
    true neighbors), so per-bit sign agreement is modest and long bands
    collapse recall (measured 0.04 with 6×8 vs 0.5+ with 12×4 on the
    synthetic corpus — rf1_lsh_topk_recall tracks this in the catalog).
    Shorter bands trade more candidates (larger buckets) for recall;
    tune bits_per_band up only when neighbors are genuinely close.

    Plan shape at 100 TB: corpus is bucketed once (one narrow
    projection computes every plane projection in a single pass), the
    join is an equi-join on (band, bucket) — shuffle ∝ bucket
    collisions, not N×|Q|.
    """
    flat_planes = [
        _hyperplane(dim, seed=band * 1000 + j)
        for band in range(bands)
        for j in range(bits_per_band)
    ]
    r = bits_per_band

    def with_sides(df: DataFrame, idc: str, vc: str, prefix: str) -> DataFrame:
        # Materialize the 48 projections as ONE array column first —
        # downstream element_at() then reads the computed array instead
        # of re-deriving the transform per reference. Zero-norm vectors
        # are excluded (NaN cosine would rank #1 — see cosine_topk).
        banded = df.select(
            df[idc].alias(f"{prefix}_id"),
            df[vc].alias(f"{prefix}_vec"),
            _norm(F.col(vc)).alias(f"{prefix}_norm"),
            _dots_against(F.col(vc), flat_planes).alias("_dots"),
        ).filter(F.col(f"{prefix}_norm") > 0)
        # bucket id folds the band's sign bits MSB-first (acc*2 + bit):
        # a bijection of the previous LSB-first packing, so bucket
        # equality — and therefore candidates and recall — is unchanged.
        bb = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda bi: F.struct(
                bi.alias("band"),
                F.aggregate(
                    F.sequence(F.lit(0), F.lit(r - 1)),
                    F.lit(0).cast("long"),
                    lambda acc, j: acc * 2
                    + F.when(
                        F.element_at(F.col("_dots"), bi * r + j + 1) > 0, 1
                    )
                    .otherwise(0)
                    .cast("long"),
                ).alias("bucket"),
            ),
        )
        return banded.select(
            f"{prefix}_id", f"{prefix}_vec", f"{prefix}_norm", bb.alias("_bb")
        )

    def band_rows(sides: DataFrame, prefix: str) -> DataFrame:
        # ids-only through the 12-way explode and the candidate join —
        # 64-dim vectors re-join AFTER pair dedup instead of being
        # materialized once per band row (same shape as sign_lsh_topk
        # and minhash_lsh_pairs; review finding)
        return sides.select(
            f"{prefix}_id", F.explode("_bb").alias("bb")
        ).select(f"{prefix}_id", "bb.band", "bb.bucket")

    q_sides = with_sides(queries, id_col, vec_col, "q")
    c_sides = pin_bounded(with_sides(corpus, id_col, vec_col, "n"))
    cand = (
        band_rows(c_sides, "n")
        .join(F.broadcast(band_rows(q_sides, "q")), ["band", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id")
        .dropDuplicates(["q_id", "n_id"])
    )
    scored = (
        cand.join(
            F.broadcast(q_sides.select("q_id", "q_vec", "q_norm")), "q_id"
        )
        .join(c_sides.select("n_id", "n_vec", "n_norm"), "n_id")
        .select(
            "q_id",
            "n_id",
            (
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm"))
            ).alias("cos_sim"),
        )
    )
    return top_k_per_group(
        scored, ["q_id"], [F.col("cos_sim").desc(), F.col("n_id").asc()], k=k
    ).select("q_id", "n_id", "cos_sim", F.col("rn").alias("rank"))


def embedding_neardup_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a_id < b_id, cos >= t).

    The semantic-dedup counterpart of the lexical dedup family: exact
    all-pairs cosine — the oracle-checked baseline. At 100 TB the
    candidate set comes from lsh_topk/ivf_topk buckets and this exact
    scoring runs only on candidates.
    """
    # zero-norm vectors excluded: NaN cosine passes any >= threshold
    # under nan-safe comparison (see cosine_topk)
    a = vectors.select(
        F.col(id_col).alias("a_id"),
        F.col(vec_col).alias("a_vec"),
        _norm(F.col(vec_col)).alias("a_norm"),
    ).filter(F.col("a_norm") > 0)
    b = vectors.select(
        F.col(id_col).alias("b_id"),
        F.col(vec_col).alias("b_vec"),
        _norm(F.col(vec_col)).alias("b_norm"),
    ).filter(F.col("b_norm") > 0)
    pairs = a.join(b, F.col("a_id") < F.col("b_id"))
    scored = pairs.select(
        "a_id",
        "b_id",
        (
            _dot(F.col("a_vec"), F.col("b_vec"))
            / (F.col("a_norm") * F.col("b_norm"))
        ).alias("cos_sim"),
    )
    return scored.filter(F.col("cos_sim") >= threshold)


def pq_codes(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_centroids: int = 16,
    salt: str = "sq2",
) -> DataFrame:
    """Product quantization: slice each vector into ``m`` subvectors and
    assign each slice to the nearest of ``n_centroids`` per-subspace
    centroids — the (m * log2(n_centroids))-bit code every disk-resident
    ANN index (FAISS IVFPQ and kin) stores instead of raw floats
    (64-dim float32 → 8 bytes here, 32x).

    Training-free codebook like :func:`ivf_topk`: a salted-md5-ordered
    draw of ``n_centroids`` corpus vectors, sliced per subspace
    (TakeOrderedAndProject — constant-size collect, cheap at any
    scale). The salted-md5 ordering is ENGINE-PORTABLE (the km1
    recipe: ``md5(salt || ':' || id)`` sorts identically in DuckDB),
    which is what lets sq2 carry an exact oracle instead of a
    rows-only verdict. The codebook rides into the plan as ONE
    from_json literal (see ``_dots_against``); assignment is a pure
    column expression, so encoding is a single scan with no shuffle.

    Returns (id, subspace, code, err2, norm2) — one row per (vector,
    subspace); ``err2``/``norm2`` are the squared reconstruction error
    and squared slice norm that the rf6 distortion floor aggregates.
    """
    import json

    dim_rows = vectors.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    if not dim_rows:
        raise ValueError("pq_codes: empty vectors input")
    dim = dim_rows[0]["d"]
    if dim % m != 0:
        raise ValueError(f"pq_codes: dim {dim} not divisible by m={m}")
    d_sub = dim // m

    draw = [
        [float(x) for x in r[vec_col]]
        for r in vectors.orderBy(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
        )
        .limit(n_centroids)
        .collect()
    ]
    # A corpus smaller than n_centroids yields a short codebook, and the
    # assignment loop below would element_at past its end — an opaque
    # ANSI runtime error deep in the plan (CLAUDE.md's element_at
    # pitfall). Shrink to what was actually drawn instead.
    n_centroids = min(n_centroids, len(draw))
    # codebook[sub][c] = the c-th drawn vector's sub-th slice
    codebook = [
        [v[s * d_sub : (s + 1) * d_sub] for v in draw] for s in range(m)
    ]
    cb = F.from_json(
        F.lit(json.dumps(codebook)), "array<array<array<double>>>"
    )

    def dist2(slice_col: Column, cent: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                slice_col,
                cent,
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def norm2(slice_col: Column) -> Column:
        return F.aggregate(
            F.transform(slice_col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    vec = F.col(vec_col)
    per_sub = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.struct(
            s.cast("int").alias("subspace"),
            # argmin by (dist2, code): array_sort on (err2, code) structs
            F.element_at(
                F.array_sort(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(n_centroids - 1)),
                        lambda c: F.struct(
                            dist2(
                                F.slice(vec, s * d_sub + 1, d_sub),
                                F.element_at(
                                    F.element_at(cb, s + 1), c + 1
                                ),
                            ).alias("err2"),
                            c.cast("int").alias("code"),
                        ),
                    )
                ),
                1,
            ).alias("best"),
            norm2(F.slice(vec, s * d_sub + 1, d_sub)).alias("norm2"),
        ),
    )
    return vectors.select(
        F.col(id_col).alias("id"), F.explode(per_sub).alias("e")
    ).select(
        "id",
        F.col("e.subspace").alias("subspace"),
        F.col("e.best.code").alias("code"),
        F.col("e.best.err2").alias("err2"),
        F.col("e.norm2").alias("norm2"),
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    salt: str = "ann3",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus into cells around sampled
    centroids, search only the query's n_probe nearest cells.

    Training-free centroid selection: a seeded pseudo-random draw of
    corpus vectors becomes the codebook (broadcast; fine for coarse
    quantization). The draw orders by ``md5(salt || ':' || id)`` —
    uniform over the corpus even when the input is sorted/clustered,
    ENGINE-PORTABLE (the km1 recipe — DuckDB sorts the same hex
    strings identically, which is what gives ann3 an exact oracle),
    and the orderBy+limit compiles to TakeOrderedAndProject
    (per-partition top-k, no full sort shuffle), so it stays cheap at
    any scale. Cell assignment and probing are pure column expressions
    — the corpus is scanned once to build the cell index, and each
    query touches ~n_probe/n_cells of the corpus.

    ``centroids`` (optional) swaps in an externally TRAINED codebook
    (e.g. km2's Lloyd output, dequantized) for the seeded draw —
    n_cells is then taken from its length. The registered ann3 entry
    never passes it (verdict continuity, the dd13 note); it exists
    for the trained-cells consequence measurement
    (tools/trained_cells_probe.py, VERDICT r12 #7).
    """
    cent_mat = centroids if centroids is not None else [
        [float(x) for x in r[vec_col]]
        for r in corpus.orderBy(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
        )
        .limit(n_cells)
        .collect()
    ]

    def nearest_cells(dots: Column, n: int) -> Column:
        """Cells ranked by similarity from a materialized dots column
        (codebook is one literal matrix — see _dots_against)."""
        return F.transform(
            F.slice(
                F.array_sort(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(len(cent_mat) - 1)),
                        lambda ci: F.struct(
                            (-F.element_at(dots, ci + 1)).alias("neg_sim"),
                            ci.alias("cell"),
                        ),
                    )
                ),
                1,
                n,
            ),
            lambda s: s["cell"],
        )

    # zero-norm vectors excluded on both sides: NaN cosine would rank
    # #1 under nan-safe ordering (see cosine_topk)
    c_assigned = (
        corpus.select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("n_vec"),
            _norm(F.col(vec_col)).alias("n_norm"),
            _dots_against(F.col(vec_col), cent_mat).alias("_dots"),
        )
        .filter(F.col("n_norm") > 0)
        .select(
            "n_id",
            "n_vec",
            "n_norm",
            F.element_at(nearest_cells(F.col("_dots"), 1), 1).alias("cell"),
        )
    )
    q_assigned = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            _norm(F.col(vec_col)).alias("q_norm"),
            _dots_against(F.col(vec_col), cent_mat).alias("_dots"),
        )
        .filter(F.col("q_norm") > 0)
        .select(
            "q_id",
            "q_vec",
            "q_norm",
            F.explode(nearest_cells(F.col("_dots"), n_probe)).alias("cell"),
        )
    )
    cand = c_assigned.join(F.broadcast(q_assigned), "cell").filter(
        F.col("q_id") != F.col("n_id")
    )
    # no pair dedup needed: each corpus vector sits in exactly ONE cell
    # and a query's probe cells are distinct, so (q, n) matches at most
    # once — the previous dropDuplicates was a full extra shuffle of the
    # scored candidates for no semantic effect (review finding; contrast
    # lsh_topk, where multi-band matches make the dedup necessary)
    scored = cand.select(
        "q_id",
        "n_id",
        (
            _dot(F.col("q_vec"), F.col("n_vec"))
            / (F.col("q_norm") * F.col("n_norm"))
        ).alias("cos_sim"),
    )
    return top_k_per_group(
        scored, ["q_id"], [F.col("cos_sim").desc(), F.col("n_id").asc()], k=k
    ).select("q_id", "n_id", "cos_sim", F.col("rn").alias("rank"))


def matryoshka_truncate(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
) -> DataFrame:
    """Matryoshka truncation: keep the first ``k`` components and
    L2-renormalize — the MRL-embedding storage/serving trick (train one
    wide vector, serve a prefix at a fraction of the bytes; 64→16 dims
    is 4× cheaper ANN at modest recall cost).

    One narrow projection over the scan, no shuffle. The norm is a LEFT
    FOLD of squares (``F.aggregate``), the same evaluation order DuckDB's
    ``list_reduce(list_prepend(0.0, …))`` uses, so the doubles are
    bit-identical cross-engine (the ann1 precedent). Zero-vector
    prefixes renormalize to NULL components (ANSI-safe guard), norm 0.0.

    Returns (id, component, value, norm) — one row per kept component.
    """
    sliced = F.slice(F.col(vec_col), 1, k)
    norm = F.sqrt(
        F.aggregate(
            F.transform(sliced, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    base = vectors.select(
        F.col(id_col).alias("id"), sliced.alias("sl"), norm.alias("norm")
    )
    renormed = F.transform(
        F.col("sl"),
        lambda x: F.when(F.col("norm") > 0, x.cast("double") / F.col("norm")),
    )
    return (
        base.select(
            "id", "norm", F.posexplode(renormed).alias("component", "value")
        )
        .select(
            "id",
            F.col("component").cast("long").alias("component"),
            "value",
            "norm",
        )
    )


def kmeans_assign(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    salt: str = "km1",
) -> DataFrame:
    """One k-means assignment pass with an engine-portable seeded init —
    the E-step that trains a REAL IVF codebook at scale (``ivf_topk``'s
    training-free draw is iteration 0 of exactly this loop; FAISS spends
    its training time in the same assign/update alternation).

    Initial centroids are the ``k`` corpus vectors with the lowest
    salted-md5 of their id (the sampling-family draw — reproducible in
    any engine, unlike ``xxhash64``), ordered by that hash to give the
    cluster ids. The draw is a constant-size TakeOrderedAndProject
    collect; the codebook rides into the plan as one ``from_json``
    literal, so assignment is a pure column expression over the scan —
    NO shuffle, no join: the only 100 TB-viable shape for a pass that
    touches every vector. Distances fold left-to-right per component
    (the ann1/pq precedent), so ``dist2`` is bit-identical cross-engine;
    argmin tie-breaks on the lower cluster id via struct array_sort.

    Returns (id, cluster_id, dist2) — one row per vector. The M-step
    (per-cluster component means) is metadata-sized output but sums
    floats across the corpus, so it is monotonicity-gated (rf9) rather
    than hash-compared; see ``kmeans_update``.
    """
    return _with_assignment(vectors, id_col, vec_col, k, salt).select(
        F.col(id_col).alias("id"), "cluster_id", "dist2"
    )


def kmeans_assign_multi(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    salt: str = "km1",
    probes: int = 2,
) -> DataFrame:
    """MULTI-PROBE assignment: each vector's ``probes`` nearest seeded
    centroids — the IVF/SemDeDup capture knob (FAISS ``nprobe``). A
    coarse partition separates borderline neighbors across a cell
    boundary; probing the runner-up cell recovers most of them at
    ``probes``× membership volume. Same codebook draw, same
    left-to-right fold distances, same struct-sort tie-break as
    :func:`kmeans_assign` (ONE scored-cells definition below), so
    probe_rank=1 rows ARE km1's assignment exactly.

    Returns (id, cluster_id, probe_rank 1..probes, dist2) — ``probes``
    rows per vector, still a pure column expression over the scan (the
    posexplode multiplies rows ``probes``×, it does not shuffle).
    ``probes`` must fit in ``k`` (silent slice-shortening would hand a
    capture/cost model the wrong membership volume — house rule: fail
    loudly, like epoch_budget/temperature_mix validate their knobs); a
    corpus smaller than ``k`` shrinks the codebook (and with it the
    rows per vector) as documented on :func:`kmeans_assign`.
    """
    if not 1 <= int(probes) <= int(k):
        raise ValueError(f"probes must be in [1, k={k}], got {probes}")
    scored = _scored_cells(vectors, id_col, vec_col, k, salt)
    ex = scored.select(
        F.col(id_col),
        F.posexplode(F.slice(F.col("_cells"), 1, probes)).alias("_pr", "_c"),
    )
    return ex.select(
        F.col(id_col).alias("id"),
        F.col("_c.cid").alias("cluster_id"),
        (F.col("_pr") + 1).cast("int").alias("probe_rank"),
        F.col("_c.d2").alias("dist2"),
    )


def _with_assignment(
    vectors: DataFrame, id_col: str, vec_col: str, k: int, salt: str
) -> DataFrame:
    """``vectors`` plus (cluster_id, dist2) — assignment as a pure
    column expression (constant-size codebook collect, no shuffle)."""
    scored = _scored_cells(vectors, id_col, vec_col, k, salt)
    best = F.element_at(F.col("_cells"), 1)
    return scored.withColumns(
        {"cluster_id": best["cid"], "dist2": best["d2"]}
    ).drop("_cells")


def _scored_cells(
    vectors: DataFrame, id_col: str, vec_col: str, k: int, salt: str
) -> DataFrame:
    """``vectors`` plus ``_cells``: the seeded codebook's cells sorted
    by (dist2, cid) — the shared root of single (:func:`kmeans_assign`)
    and multi-probe (:func:`kmeans_assign_multi`) assignment; the
    struct sort gives argmin with the lower-cid tie-break."""
    import json

    hash_col = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    )
    draw = (
        vectors.select(F.col(vec_col).alias("v"), hash_col.alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    if not draw:
        raise ValueError("kmeans_assign: empty vectors input")
    cents = [[float(x) for x in r["v"]] for r in draw]
    k = len(cents)  # corpus smaller than k: shrink (pq_codes precedent)
    cb = F.from_json(F.lit(json.dumps(cents)), "array<array<double>>")

    vec = F.col(vec_col)

    def dist2(cent: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                vec,
                cent,
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    scored = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.struct(
            dist2(F.element_at(cb, i + 1)).alias("d2"),
            i.cast("int").alias("cid"),
        ),
    )
    return vectors.withColumn("_cells", F.array_sort(scored))


def kmeans_update(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    salt: str = "km1",
) -> DataFrame:
    """The k-means M-step: per-cluster component means (the updated
    codebook) from :func:`kmeans_assign`'s assignment.

    The assignment is recomputed inline as a column expression (no join
    with the E-step output — joins would shuffle the corpus twice);
    posexplode the vector once and aggregate (cluster, component) —
    k × dim output rows (metadata-sized) from one shuffle whose rows are
    (cluster_id, component, value) triples. Component means accumulate
    in double (floats summed across the corpus are order-dependent in
    the last ulps), so this output is quality-gated by Lloyd's
    monotonicity (rf9_kmeans_lloyd_floor) instead of hash-compared.
    """
    comp = _with_assignment(vectors, id_col, vec_col, k, salt).select(
        "cluster_id", F.posexplode(F.col(vec_col)).alias("component", "x")
    )
    return comp.groupBy("cluster_id", "component").agg(
        F.avg(F.col("x").cast("double")).alias("mean"),
        F.count("*").alias("n_members"),
    )


def kmeans_lloyd_inertia(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    salt: str = "km1",
) -> DataFrame:
    """One row (j_old, j_new): total within-cluster squared distance
    under the seeded codebook vs under the M-step's updated centroids,
    holding the assignment fixed. Lloyd's lemma says the per-cluster
    mean minimizes within-cluster SSE, so j_new <= j_old up to float
    noise — the invariant rf9_kmeans_lloyd_floor gates on.

    Three scans of the corpus (old inertia / centroid update / new
    inertia) — the update is a barrier, so a production loop would
    persist the assignment; at gate scale the rescans are cheaper than
    the cache churn. The new-centroid join is an explicit broadcast
    (k x dim rows — metadata-sized at any corpus size).
    """
    assigned = _with_assignment(vectors, id_col, vec_col, k, salt)
    j_old = assigned.agg(F.sum("dist2").alias("j_old"))
    cent_new = kmeans_update(vectors, id_col, vec_col, k, salt)
    comp = _with_assignment(vectors, id_col, vec_col, k, salt).select(
        "cluster_id", F.posexplode(F.col(vec_col)).alias("component", "x")
    )
    j_new = comp.join(
        F.broadcast(cent_new.select("cluster_id", "component", "mean")),
        ["cluster_id", "component"],
    ).agg(
        F.sum(
            (F.col("x").cast("double") - F.col("mean"))
            * (F.col("x").cast("double") - F.col("mean"))
        ).alias("j_new")
    )
    return j_old.crossJoin(j_new)


def portable_sign_planes(
    dim: int, n_planes: int, salt: str = "ann4"
) -> list[list[float]]:
    """±1 sign-projection planes derived from md5 — no RNG, so the SAME
    literal matrix can be baked into both the Spark plan and an oracle's
    SQL text (the trick that makes sign-LSH exact-oracle-checkable,
    unlike the Gaussian draws in :func:`_hyperplane`). Sign-random
    projections with ±1 entries are the classic SimHash-style variant
    (Charikar 2002): E[collision] still tracks the angle."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{salt}:{p}:{j}".encode()).hexdigest()[:2], 16)
            < 128
            else -1.0
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def sign_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """Sign-projection LSH ANN top-k with a fully deterministic,
    engine-portable bucket assignment (planes from
    :func:`portable_sign_planes`).

    Per vector: n_planes projections (each a left-to-right fold — the
    same deterministic accumulation as :func:`cosine_topk`), one sign
    bit each, grouped into ``bands`` bucket strings. Candidates come
    from an equi-join on (band, bucket) — shuffle size tracks bucket
    occupancy, never |Q|·N — then the exact cosine re-ranks the
    candidates with per-side precomputed norms (bit-identical to the
    ann1 formula). Projections and bit-strings are computed ONCE per
    vector (queries ⊆ corpus share the pass), and only (id, band,
    bucket) rows enter the candidate join; vectors re-join after pair
    dedup.

    CONTRACT: ``queries`` must be an id-subset of ``corpus`` — the
    index is built from the corpus pass only and query rows are
    resolved by an inner id-join against it, so a query id absent from
    the corpus (or whose corpus vector is zero-norm) is silently
    dropped from the output rather than erroring. Callers with
    external query vectors must union them into ``corpus`` first.
    """
    n_planes = len(planes)
    r = n_planes // bands
    if n_planes % bands:
        raise ValueError(f"{n_planes} planes not divisible by {bands} bands")

    def proj(p: int) -> Column:
        return F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(s) for s in planes[p]]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def band_str(b: int) -> Column:
        return F.concat(
            *[
                F.when(proj(b * r + j) >= 0, F.lit("1")).otherwise(F.lit("0"))
                for j in range(r)
            ]
        )

    # the projection pass (n_planes folds over every vector) feeds four
    # consumers (both candidate-join sides, q_side, n_side) — pin it so
    # it computes once, not once per branch (the docstring's 'ONCE per
    # vector' is this persist, same pattern as dc2's band table)
    sides = pin_bounded(
        corpus.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("nrm"),
            *[band_str(b).alias(f"band{b}") for b in range(bands)],
        # zero-norm vectors out of the index entirely: their cosine is
        # NaN and would rank #1 under nan-safe ordering (see cosine_topk)
        ).filter(F.col("nrm") > 0)
    )
    band_rows = sides.select(
        "vid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("vid", "bb.band", "bb.bucket")
    q_ids = queries.select(F.col(id_col).alias("q_id"))
    qb = band_rows.join(
        F.broadcast(q_ids), band_rows.vid == q_ids.q_id
    ).select("q_id", "band", "bucket")
    cand = (
        qb.join(band_rows.withColumnRenamed("vid", "n_id"), ["band", "bucket"])
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id")
        .dropDuplicates(["q_id", "n_id"])
    )
    q_side = sides.select(
        F.col("vid").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_norm"),
    ).join(F.broadcast(q_ids), "q_id")
    n_side = sides.select(
        F.col("vid").alias("n_id"),
        F.col("vec").alias("n_vec"),
        F.col("nrm").alias("n_norm"),
    )
    scored = (
        cand.join(F.broadcast(q_side), "q_id")
        .join(n_side, "n_id")
        .select(
            "q_id",
            "n_id",
            (
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm"))
            ).alias("cos_sim"),
        )
    )
    return top_k_per_group(
        scored, ["q_id"], [F.col("cos_sim").desc(), F.col("n_id").asc()], k=k
    ).select("q_id", "n_id", "cos_sim", F.col("rn").alias("rank"))


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_centroids: int = 16,
    refine: int = 100,
    cell_salt: str = "ann3",
    pq_salt: str = "sq2",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-PQ ANN with exact refine — the disk-resident serving path
    FAISS calls IVFPQ+refine, composed from this repo's two PORTABLE
    codebooks: ann3's coarse cells (salted-md5 draw, ``cell_salt``)
    pick which ~n_probe/n_cells of the corpus to touch, sq2's
    product-quantization codes (``pq_salt``) give every candidate an
    m-byte approximate distance (ADC: sum over subspaces of
    ||q_slice − centroid[code]||², folded in subspace order), and only
    the top-``refine`` ADC candidates per query are re-ranked with the
    exact cosine.

    The scale property this plan encodes: the candidate join carries
    (id, cell, m small ints) — never vectors — so at 100 TB the raw
    embedding column is read exactly twice per query: the ``refine``
    winners' vectors for the re-rank, and the query's own. Codebooks
    ride as two from_json literals; cell assignment, codes, and ADC
    are pure column expressions.

    Engine-portable end to end (both draws are salted-md5 orders,
    every distance a sequential left fold), so cells, codes, ADC
    ranking, the refine cut, and the final rank are exact-oracle-
    checkable. CONTRACT (as :func:`sign_lsh_topk`): ``queries`` must
    be an id-subset of ``corpus``; zero-norm vectors are excluded from
    both index and queries.

    Returns (q_id, n_id, cos_sim, rank).
    """
    import json

    def _draw(salt: str, limit: int) -> list[list[float]]:
        return [
            [float(x) for x in r[vec_col]]
            for r in corpus.orderBy(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
            )
            .limit(limit)
            .collect()
        ]

    # optional externally-trained COARSE codebook (ivf_topk's knob —
    # the PQ sub-codebooks keep their own draw: km2 trains the coarse
    # partitioner, not the per-subspace quantizers)
    cent_mat = centroids if centroids is not None else _draw(
        cell_salt, n_cells
    )
    if not cent_mat:
        raise ValueError("ivfpq_topk: empty corpus")
    n_cells = len(cent_mat)
    dim = len(cent_mat[0])
    if dim % m != 0:
        raise ValueError(f"ivfpq_topk: dim {dim} not divisible by m={m}")
    d_sub = dim // m
    pq_draw = _draw(pq_salt, n_centroids)
    n_centroids = len(pq_draw)
    codebook = [
        [v[s * d_sub : (s + 1) * d_sub] for v in pq_draw] for s in range(m)
    ]
    cb = F.from_json(
        F.lit(json.dumps(codebook)), "array<array<array<double>>>"
    )

    def dist2(slice_col: Column, cent: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                slice_col,
                cent,
                lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def nearest_cells(dots: Column, n: int) -> Column:
        return F.transform(
            F.slice(
                F.array_sort(
                    F.transform(
                        F.sequence(F.lit(0), F.lit(n_cells - 1)),
                        lambda ci: F.struct(
                            (-F.element_at(dots, ci + 1)).alias("neg_sim"),
                            ci.alias("cell"),
                        ),
                    )
                ),
                1,
                n,
            ),
            lambda s: s["cell"],
        )

    vec = F.col("vec")
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.element_at(
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_centroids - 1)),
                    lambda c: F.struct(
                        dist2(
                            F.slice(vec, s * d_sub + 1, d_sub),
                            F.element_at(F.element_at(cb, s + 1), c + 1),
                        ).alias("err2"),
                        c.cast("int").alias("code"),
                    ),
                )
            ),
            1,
        )["code"],
    )
    # one pinned pass computes norm, cell, codes, and probe dots for
    # every vector (queries ⊆ corpus share it, sign_lsh pattern)
    base = pin_bounded(
        corpus.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("nrm"),
            _dots_against(F.col(vec_col), cent_mat).alias("_dots"),
        )
        .filter(F.col("nrm") > 0)
        .select(
            "vid",
            "vec",
            "nrm",
            "_dots",
            F.element_at(nearest_cells(F.col("_dots"), 1), 1).alias("cell"),
            codes.alias("codes"),
        )
    )
    q_ids = queries.select(F.col(id_col).alias("q_id"))
    q_side = (
        base.join(F.broadcast(q_ids), base.vid == q_ids.q_id)
        .select(
            "q_id",
            F.col("vec").alias("q_vec"),
            F.col("nrm").alias("q_norm"),
            F.explode(nearest_cells(F.col("_dots"), n_probe)).alias("cell"),
        )
    )
    n_side = base.select(
        F.col("vid").alias("n_id"), "cell", "codes"
    )
    q_vec = F.col("q_vec")
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + dist2(
            F.slice(q_vec, s * d_sub + 1, d_sub),
            F.element_at(
                F.element_at(cb, s + 1),
                F.element_at(F.col("codes"), s + 1) + 1,
            ),
        ),
    )
    cand = (
        n_side.join(F.broadcast(q_side), "cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", adc.alias("adc"))
    )
    shortlist = top_k_per_group(
        cand, ["q_id"], [F.col("adc").asc(), F.col("n_id").asc()], k=refine
    ).select("q_id", "n_id")
    q_exact = base.select(
        F.col("vid").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("nrm").alias("q_norm"),
    ).join(F.broadcast(q_ids), "q_id")
    n_exact = base.select(
        F.col("vid").alias("n_id"),
        F.col("vec").alias("n_vec"),
        F.col("nrm").alias("n_norm"),
    )
    rescored = (
        shortlist.join(F.broadcast(q_exact), "q_id")
        .join(n_exact, "n_id")
        .select(
            "q_id",
            "n_id",
            (
                _dot(F.col("q_vec"), F.col("n_vec"))
                / (F.col("q_norm") * F.col("n_norm"))
            ).alias("cos_sim"),
        )
    )
    return top_k_per_group(
        rescored, ["q_id"], [F.col("cos_sim").desc(), F.col("n_id").asc()], k=k
    ).select("q_id", "n_id", "cos_sim", F.col("rn").alias("rank"))


# ---------------------------------------------------------------------------
# km2 — FULL Lloyd iterations in scaled-long integer arithmetic.
# ---------------------------------------------------------------------------

KM2_SCALE = 10_000  # 1e-4 component resolution (see kmeans_lloyd_codebooks)


def _int_vectors(
    vectors: DataFrame, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    """(id, xv): the embedding quantized to scaled longs —
    floor(component × scale). float32 → double widening is exact and
    the double multiply is IEEE-correctly-rounded identically in Spark,
    DuckDB, and Python, so the quantization is bit-portable."""
    xi = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale).cast("long"),
    )
    return vectors.select(F.col(id_col).alias("id"), xi.alias("xv"))


def _int_assignment(base: DataFrame, cb: list[tuple[int, list[int]]]) -> DataFrame:
    """(id, cluster_id, dist2) — argmin of the integer squared L2
    against a literal codebook (same from_json-literal / struct-sort
    shape as :func:`_scored_cells`, in BIGINT)."""
    import json

    mat = F.from_json(
        F.lit(json.dumps([c for _, c in cb])), "array<array<bigint>>"
    )
    cids = F.from_json(
        F.lit(json.dumps([cid for cid, _ in cb])), "array<int>"
    )

    def dist2(cent):
        return F.aggregate(
            F.zip_with(F.col("xv"), cent, lambda x, c: (x - c) * (x - c)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = F.transform(
        F.sequence(F.lit(0), F.lit(len(cb) - 1)),
        lambda i: F.struct(
            dist2(F.element_at(mat, i + 1)).alias("d2"),
            F.element_at(cids, i + 1).alias("cid"),
        ),
    )
    best = F.element_at(F.array_sort(scored), 1)
    return base.select(
        "id",
        "xv",
        best["cid"].alias("cluster_id"),
        best["d2"].alias("dist2"),
    )


def kmeans_lloyd_codebooks(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    salt: str = "km1",
    iters: int = 2,
    scale: int = KM2_SCALE,
) -> list[list[tuple[int, list[int]]]]:
    """The TRAINING loop km1 was missing (VERDICT r11 #4: the codebooks
    dd13/dc3/ann3/ann5/sq2 consume were never actually trained): run
    ``iters`` full Lloyd iterations — E-step assignment, M-step
    centroid update — in SCALED-LONG integer arithmetic, and return
    every codebook [c0, c1, …, c_iters] as (cid, component-vector)
    lists. c0 is km1's seeded draw (same salt, the k lowest-md5
    vectors, cid = hash rank) quantized to ints, so iteration 0 IS
    km1's E-step in the integer domain.

    INTEGER ARITHMETIC is what makes a trained codebook oracle-able
    (the pr1 fixed-iteration precedent): the M-step mean is the
    truncating division SUM(x) div COUNT(*) — Spark ``div`` and DuckDB
    ``//`` both truncate toward zero (verified, including negatives) —
    and the E-step distance is an exact BIGINT fold, so every
    assignment and every updated centroid is bit-identical on any
    engine and any partitioning. Quantization at ``scale`` = 1e-4
    component resolution; with unit-scale embeddings, per-vector d2 ≤
    dim × (2·scale)² ≈ 2.6e10 and the corpus inertia stays under
    BIGINT up to ~10^8 vectors (use a smaller scale beyond — the knob
    trades resolution for headroom; ANSI throws rather than wraps).

    Scale shape per iteration: the assignment is a pure column
    expression against the constant-size codebook literal (no shuffle
    — km1's only-viable-shape argument), and the update is ONE
    posexplode + map-side-combined groupBy(cluster, component)
    producing k × dim metadata rows, collected to seed the next
    literal (the dd6/CC per-round-collect precedent; a production loop
    would persist the assignment instead of rescanning — the
    kmeans_lloyd_inertia trade, documented there). Empty clusters drop
    from the codebook (standard Lloyd; k shrinks).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    base = _int_vectors(vectors, id_col, vec_col, int(scale))
    h = F.md5(F.concat(F.lit(salt + ":"), F.col("id").cast("string")))
    draw = base.select("id", "xv", h.alias("h")).orderBy("h").limit(k).collect()
    if not draw:
        raise ValueError("kmeans_lloyd_codebooks: empty vectors input")
    books = [[(i, [int(x) for x in r["xv"]]) for i, r in enumerate(draw)]]
    for _ in range(int(iters)):
        asg = _int_assignment(base, books[-1])
        upd = (
            asg.select(
                "cluster_id", F.posexplode(F.col("xv")).alias("d", "x")
            )
            .groupBy("cluster_id", "d")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .select("cluster_id", "d", F.expr("s div n").alias("c"))
            .collect()
        )
        by_cid: dict[int, dict[int, int]] = {}
        for r in upd:
            by_cid.setdefault(r["cluster_id"], {})[r["d"]] = int(r["c"])
        books.append(
            [
                (cid, [comps[d] for d in range(len(comps))])
                for cid, comps in sorted(by_cid.items())
            ]
        )
    return books


def kmeans_lloyd_train(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    salt: str = "km1",
    iters: int = 2,
    scale: int = KM2_SCALE,
) -> DataFrame:
    """km2's public face: the FINAL assignment (id, cluster_id, dist2)
    under the ``iters``-times-updated integer codebook — the trained
    cells a SemDeDup / IVF / PQ consumer would read instead of km1's
    seeded ones. All-BIGINT output, hash-exact (see
    :func:`kmeans_lloyd_codebooks` for the arithmetic and scale
    story)."""
    books = kmeans_lloyd_codebooks(
        vectors, id_col, vec_col, k=k, salt=salt, iters=iters, scale=scale
    )
    base = _int_vectors(vectors, id_col, vec_col, int(scale))
    return _int_assignment(base, books[-1]).select(
        "id", "cluster_id", F.col("dist2").cast("bigint").alias("dist2")
    )


def kmeans_lloyd_trajectory(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    salt: str = "km1",
    iters: int = 2,
    scale: int = KM2_SCALE,
) -> DataFrame:
    """One row (j0, j1, …, j_iters): the EXACT integer corpus inertia
    under each of km2's codebooks — Lloyd's convergence trajectory as
    bit-exact BIGINTs (what rf9 could only gate with a float tolerance,
    the integer domain states exactly). Each j is one 1-row aggregate
    over the assignment column expression; the rows cross-join (the
    dd16 scalar-counter convention). Strict non-increase is gated by
    rf14 with the floor-rounding allowance documented there."""
    books = kmeans_lloyd_codebooks(
        vectors, id_col, vec_col, k=k, salt=salt, iters=iters, scale=scale
    )
    base = _int_vectors(vectors, id_col, vec_col, int(scale))
    out = None
    for r, cb in enumerate(books):
        j = _int_assignment(base, cb).agg(
            F.sum("dist2").cast("bigint").alias(f"j{r}")
        )
        out = j if out is None else out.crossJoin(j)
    return out
