"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): exact dedup,
word-shingle Jaccard near-dup, MinHash+LSH, and SimHash — all expressed
as DataFrame plans that scale:

- exact: hash-groupBy (one shuffle on a 128-bit digest, no wide-row
  comparison);
- n-gram Jaccard: shingle explode → self-join on shingle → pair
  intersection counts. Exact but quadratic in the worst case — the
  correctness baseline for the approximate methods;
- MinHash+LSH: per-doc signature (k univariate min-hashes) → band
  buckets → candidates only within buckets → verify. The 100 TB path:
  the self-join is on (band, bucket-hash), so work scales with true
  near-duplicate density, not n²;
- SimHash: 64-bit weighted bit-vote fingerprint; near-dups have small
  Hamming distance, candidates via band-of-bits buckets.

All helpers are pure column expressions (no Python UDFs): hashing uses
``xxhash64``, folds use ``aggregate`` over arrays — JVM-side throughout.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def normalized_words(text: Column) -> Column:
    """Lowercased whitespace tokens — the canonical text for dedup."""
    return F.filter(
        F.split(F.trim(F.lower(text)), r"\s+"), lambda t: t != F.lit("")
    )


def word_shingles(words: Column, n: int = 3) -> Column:
    """Distinct word n-grams joined with spaces.

    ``transform(sequence(1, size-n+1), i -> words[i] .. words[i+n-1])`` —
    the same construction is expressible in DuckDB for the oracle.
    """
    def shingle_at(i: Column) -> Column:
        pieces = [F.element_at(words, i + j) for j in range(n)]
        return F.concat_ws(" ", *pieces)

    # guard: Spark sequence(1, 0) counts DOWN ([1,0]) instead of returning
    # empty like DuckDB generate_series — short docs need the explicit case
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    return F.when(
        F.size(words) >= n, F.array_distinct(F.transform(idx, shingle_at))
    ).otherwise(F.array().cast("array<string>"))


def exact_dedup(
    df: DataFrame, text_col: str, order_cols: list[str], id_cols: list[str] | None = None
) -> DataFrame:
    """Exact dedup: md5 digest groupBy, first occurrence (order_cols) wins.

    At 100 TB the shuffle carries (digest, order, ids) only — never the
    document body; the digest is computed scan-side. Collision rate of a
    128-bit digest at 10^12 docs is ~10^-13 — acceptable for dedup.
    """
    from .windows import top_k_per_group

    digest = F.md5(F.col(text_col).cast("binary")).alias("content_digest")
    keep = (id_cols or []) + order_cols
    hashed = df.select(digest, *keep)
    return top_k_per_group(
        hashed,
        ["content_digest"],
        [F.col(c).asc() for c in order_cols],
        k=1,
    ).drop("rn")


# shingle caches pinned by recent shingle_pairs_jaccard calls, FIFO-
# capped: harnesses that CONSTRUCT several plans before executing them
# (each construction pins one handle) keep their caches live up to the
# cap, and the leak stays bounded either way. Same contract as
# plans/creator_report._PERSISTED_HANDLES: single-threaded callers —
# releasing a still-pending plan's cache can only cause recomputation,
# never wrong results.
_PERSISTED_HANDLES: list[DataFrame] = []
# 8, not 4: cp1's composition legitimately holds five pins live at
# once (cm1's tagged + sh_canon, dc2's band/split table, cp1's adm +
# ordered) — at 4 the FIFO evicted cm1's tagged BEFORE execution, so
# its remaining consumers silently recomputed the digest stage (r8
# review finding; toy-scale timing is warmup-noise-dominated either
# way, but at 100 TB an extra documents scan per consumer is real).
# Still a hard bound on the session-lifetime cache leak.
_MAX_PINNED = 8

# Eager localCheckpoint handles (optimization r16, VERDICT r15 #3/#9):
# unlike the lazy FIFO above, an eager checkpoint's lineage is TRUNCATED
# — evicting a still-referenced handle would make its consumers FAIL,
# not recompute — so the bound here is per-QUERY release, not FIFO
# eviction: harnesses call release_eager_pins() after each query's
# result is fully materialized (bench.py per timed line, oracle_check
# per compared entry). Concurrent live handles within one query are
# bounded by composition depth (cp9, the deepest chain, holds ~14: cm1's
# 5 + cm2's 2 + the layout-chain and dc2/band pins + CC's final labels).
# A harness that never calls release degrades to the pre-r16 behavior —
# blocks freed when the RDD is GC'd — never to wrong results.
_EAGER_HANDLES: list[DataFrame] = []


def _unpersist_local_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint'ed DataFrame's stored blocks NOW (the
    analyzed plan of a checkpoint result is a LogicalRDD wrapping the
    materialized RDD). Best-effort: a failure here only delays the free
    to RDD garbage collection."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — cleanup must never fail a query
        pass


def release_eager_pins() -> None:
    """Release every eager checkpoint pinned since the last call.

    Callers must guarantee no pending plan still reads the handles
    (i.e. the query's result has been fully materialized/collected) —
    a localCheckpoint cannot be recomputed after its blocks are freed.
    """
    while _EAGER_HANDLES:
        _unpersist_local_checkpoint(_EAGER_HANDLES.pop())


def pin_bounded(df: DataFrame, eager: bool = False) -> DataFrame:
    """Pin a shared intermediate that feeds multiple consumers
    (shingle tables, MinHash band tables, tf relations).

    ``eager=False`` (default): MEMORY_AND_DISK-persist under the
    FIFO-capped registry above. Lazy — safe at CONSTRUCTION time of
    non-eager catalog queries, where no job may run before the bench
    clock starts. Single-threaded contract as documented on
    _PERSISTED_HANDLES.

    ``eager=True``: materialize NOW via ``localCheckpoint(eager=True)``
    — only callable from eager-flagged queries (their clock covers
    construction). Measured motivation (optimization r15, guide §5):
    a lazy persist whose first consumers are CONCURRENT AQE query
    stages (broadcast futures, multi-leaf self-joins) recomputes the
    subtree once per cold cache leaf — dd11's pinned shingle explode
    executed 12× inside the CC round-0 action. An eager checkpoint
    makes every later reference a stored-block scan. Handles are
    tracked in _EAGER_HANDLES for per-query release (see
    :func:`release_eager_pins`); absent a release call, blocks are
    freed when the RDD is garbage-collected. The 100 TB analog is the
    checkpointed shared table the docstrings already name."""
    if eager:
        ck = df.localCheckpoint(eager=True)
        _EAGER_HANDLES.append(ck)
        return ck
    while len(_PERSISTED_HANDLES) >= _MAX_PINNED:
        _PERSISTED_HANDLES.pop(0).unpersist()
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED_HANDLES.append(df)
    return df


def keep_list_with_sizes(
    members: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    n_salts: int = 8,
) -> DataFrame:
    """(id, cluster) membership → the dedup end-product columns
    (id, cluster, kept, cluster_size) with a SKEW-SAFE size computation.

    The obvious form — ``count(*) over (partition by cluster_id)`` —
    colocates every member of a cluster on one task; on the corpus
    shape dedup exists for (one document duplicated millions of times)
    that window partition IS the pathology. Here instead:

    1. ``groupBy(cluster).count()`` — map-side partial aggregation
       means the hot cluster contributes ONE row per input partition
       to the shuffle, so counting a 10^7-member cluster is free;
    2. the count joins back via :func:`skew.salted_join` (counts side
       replicated ``n_salts``×, members sharded by a deterministic
       hash of their own id), so the hot cluster's member rows spread
       across ``n_salts`` tasks instead of melting one. The counts
       table is cluster-grain — broadcastable on toy data but NOT at
       10^12 docs (≈ one row per distinct text), hence the salted
       shuffle join rather than a broadcast hint.

    Result-identical to the window form (inner join: every cluster_id
    in ``members`` exists in its own count table by construction);
    probed at 640k copies of ONE document in tools/scale_probe.py
    (SCALE_r08.md), results bit-identical to the window plan.
    """
    from .skew import salted_join

    counts = members.select(cluster_col).groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return salted_join(
        members.select(id_col, cluster_col),
        counts,
        on=cluster_col,
        n_salts=n_salts,
        salt_by=[id_col],
    ).select(
        id_col,
        cluster_col,
        (F.col(id_col) == F.col(cluster_col)).alias("kept"),
        "cluster_size",
    )


def quality_survivor_keep_list(
    members: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    quality_col: str = "quality_score",
    n_salts: int = 8,
) -> DataFrame:
    """(id, cluster) membership + per-doc quality → the keep-list where
    the survivor per cluster is the HIGHEST-quality member (tie: lowest
    id) instead of dd8/dd10/dd11's lowest-id rule. This is the
    production survivor policy: when near-duplicates differ (truncated
    copy vs full article, boilerplate-wrapped vs clean), dedup should
    keep the best copy, not the one that happened to arrive first.

    Total order: the ranking key is ``(quality IS NOT NULL DESC,
    quality DESC, id ASC)`` — NULL-quality docs rank last REGARDLESS
    of the score's range (an explicit is-null flag, not a sentinel
    value a z-score-shaped metric could undercut), members with no
    quality row at all behave exactly like NULL quality (left join),
    and the id tie-break totalizes equal scores (exact twins share a
    score by construction), so the survivor is engine-portable.

    Plan shape, skew discipline identical to :func:`keep_list_with_sizes`:

    - quality attach is a unique-key id-grain join (both sides one row
      per doc — no hot key even on a mega-dup corpus);
    - survivor + size come from ONE map-side-combined
      ``groupBy(cluster)`` — argmax as ``max(struct(quality, -id))``,
      so the hot cluster contributes one row per input partition;
    - the cluster-grain result joins back via :func:`skew.salted_join`
      (NOT broadcast: cluster-grain ≈ one row per distinct text, far
      beyond driver memory at 10^12 docs).

    Output: (id, cluster, survivor_id, kept, cluster_size).
    """
    from .skew import salted_join

    scored = members.select(id_col, cluster_col).join(
        quality.select(id_col, F.col(quality_col).alias("_q")),
        id_col,
        "left",  # a member missing a quality row == NULL quality;
        # an inner join here would silently drop it from BOTH the
        # argmax and cluster_size (and from the output entirely when a
        # whole cluster lacks rows)
    )
    best = (
        scored.groupBy(cluster_col)
        .agg(
            F.max(
                F.struct(
                    F.col("_q").isNotNull().alias("nn"),
                    F.coalesce(F.col("_q"), F.lit(0.0)).alias("q"),
                    (-F.col(id_col)).alias("nid"),
                )
            ).alias("b"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .select(
            cluster_col,
            (-F.col("b.nid")).alias("survivor_id"),
            "cluster_size",
        )
    )
    return salted_join(
        members.select(id_col, cluster_col),
        best,
        on=cluster_col,
        n_salts=n_salts,
        salt_by=[id_col],
    ).select(
        id_col,
        cluster_col,
        "survivor_id",
        (F.col(id_col) == F.col("survivor_id")).alias("kept"),
        "cluster_size",
    )


def shingle_pairs_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    eager_pins: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (a_id < b_id, sim >= t).

    Plan: explode distinct shingles → self-equi-join on the shingle
    (this is the only shuffle; Catalyst hash-partitions on the shingle
    string) → count intersections per pair → join per-doc shingle counts
    → Jaccard = |∩| / (|A|+|B|-|∩|).

    Exact and oracle-checkable; at 100 TB use minhash_lsh (below) to
    bound the candidate set, then verify candidates with this formula.

    The exploded shingle table is persisted for the three consumers in
    this plan; the cache registry is FIFO-capped at ``_MAX_PINNED``
    calls, so batch-constructed plans keep their caches while the
    session-lifetime leak stays bounded (previously every call leaked
    one cached table forever).
    """
    # join/aggregate on the 64-bit shingle hash, not the string — smaller
    # shuffle rows and long-vs-long comparisons; collision odds at 10^9
    # distinct shingles are ~1e-2 per full corpus and affect one count by
    # one, acceptable for dedup (document if used for billing-grade stats).
    # The tokenization is materialized as a column BEFORE the shingle
    # transform: inlining it into the lambda makes every element_at
    # re-run the regex split (observed 5× slowdown).
    sh = (
        df.select(
            F.col(id_col).alias("doc"),
            normalized_words(F.col(text_col)).alias("words"),
        )
        .select("doc", F.explode(word_shingles(F.col("words"), n)).alias("shingle"))
        .filter(F.col("shingle") != "")
        .select("doc", F.xxhash64("shingle").alias("sh"))
        # consumed by three plans (sizes + both join sides): materialize
        # the tokenize→shingle→hash work once instead of three times.
        # Explicit MEMORY_AND_DISK (serialized blocks): .cache() would
        # also spill (its default is MEMORY_AND_DISK_DESER), but the
        # exploded shingle table is ~n_shingles× the input and this
        # operator is the exact BASELINE / candidate-verify stage that
        # may see large inputs at 100 TB — serialized storage roughly
        # halves the cached footprint of these narrow (long, long) rows
        # at trivial CPU cost, and naming the level makes the policy
        # visible instead of implicit.
    )
    sh = pin_bounded(sh, eager=eager_pins)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_shingles"))
    # (a document-frequency prefilter — drop shingles seen in one doc —
    # pays off on real corpora with long-tail vocabularies; on this
    # dense synthetic vocabulary it added two shuffles for zero dropped
    # rows, so it stays out of the default plan)
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("a_id"), F.col("b.doc").alias("b_id"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("a_id"), F.col("n_shingles").alias("a_size"))
    sb = sizes.select(F.col("doc").alias("b_id"), F.col("n_shingles").alias("b_size"))
    jac = (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            (
                F.col("n_common")
                / (F.col("a_size") + F.col("b_size") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold)


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature: array of k min-over-shingles hashes.

    One explode + one groupBy(doc) computing k ``min`` aggregates — a
    single shuffle keyed on the doc id, signature size is k*8 bytes
    regardless of document length (the property that makes this the
    100 TB dedup path).

    Each draw is ``xxhash64(i, base_hash)`` — the string is hashed once
    (the base), then k cheap long-input hashes give k INDEPENDENT
    permutations. The previous affine scheme (``a*x + b mod M61`` with
    a < 2^20, x < 2^40) never wrapped the modulus, so min commuted with
    the transform and every component shared one argmin shingle: the 32
    'permutations' were a single permutation, est_jaccard was always
    exactly 0 or 1, and the banding S-curve degenerated to
    P(candidate)=s. Caught by review, verified empirically (all 32
    components reconstructed the same base argmin).
    """
    sh = (
        df.select(
            F.col(id_col).alias("doc"),
            normalized_words(F.col(text_col)).alias("words"),
        )
        .select("doc", F.explode(word_shingles(F.col("words"), n)).alias("shingle"))
        .filter(F.col("shingle") != "")
        .select("doc", F.xxhash64("shingle").alias("x"))
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("x"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("doc").agg(*aggs)
    return sig.select(
        "doc", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding: candidate pairs from shared band-buckets,
    verified with estimated Jaccard (signature agreement rate).

    rows = bands, r = num_hashes/bands; P(candidate) ≈ 1-(1-s^r)^b — with
    32 hashes / 8 bands (r=4) the S-curve crosses 0.5 near s≈0.55.
    The band bucket is hash(band_id, sig slice), so the candidate join is
    an equi-join on (band, bucket): shuffle size tracks duplicate density.
    """
    r = num_hashes // bands
    # pin under the FIFO-capped registry: a bare .cache() here leaked one
    # signature table per call for the session lifetime (review finding)
    sig = pin_bounded(minhash_signatures(df, id_col, text_col, num_hashes, n))
    # the candidate join carries only (doc, band, bucket) — the 32-hash
    # signature arrays rejoin once AFTER pair dedup, not once per band
    band_rows = sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ":",
                                F.lit(bi),
                                *[
                                    F.element_at(F.col("signature"), bi * r + j + 1)
                                    for j in range(r)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("a_id"), F.col("b.doc").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )
    sa = sig.select(F.col("doc").alias("a_id"), F.col("signature").alias("sig_a"))
    sb = sig.select(F.col("doc").alias("b_id"), F.col("signature").alias("sig_b"))
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.lit(float(num_hashes))
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .select("a_id", "b_id", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= verify_threshold)
    )


SIMHASH_BITS = 63  # stay within signed-long range (1<<63 overflows)


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """63-bit SimHash fingerprint: weighted bit votes over token hashes.

    Implemented as an array fold per document (no explode): for each bit
    position, sum +1/-1 votes across tokens; the fingerprint packs the
    vote signs. Bit positions are unrolled Python-side (shift amounts
    must be literals for ``shiftright``); the per-token work is one
    ``zip_with`` — a narrow projection, no shuffle at all.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(normalized_words(F.col(text_col))).alias("w"),
    ).select("doc", F.xxhash64("w").alias("th"))
    # one hash aggregate with 63 conditional sums — whole-stage codegen'd,
    # far faster than a per-token array fold (the shuffle key is the doc id)
    vote_aggs = [
        F.sum(
            F.when(
                F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    votes = toks.groupBy("doc").agg(*vote_aggs)
    fingerprint = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        fingerprint = fingerprint + F.when(
            F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc", fingerprint.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8
) -> DataFrame:
    """SimHash near-dup pairs via 4-band blocking (any 16-bit band equal →
    candidate; Hamming <= max_hamming verified with bit_count).

    A pair within Hamming distance 3 shares at least one of 4 bands
    (pigeonhole); wider distances trade recall for the candidate bound.
    """
    sig = simhash64(df, id_col, text_col)
    bands = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bc"),
    ).select("doc", "simhash", "bc.band", "bc.chunk")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("a_id"),
            F.col("b.doc").alias("b_id"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("a_id", "b_id", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def sql_words(text_expr: str = "text") -> str:
    """DuckDB fragment matching :func:`normalized_words` — THE canonical
    tokenizer text; every oracle that tokenizes must use this fragment
    (or the module-level constants built from it) so a tokenizer tweak
    can never desynchronize Spark from the oracles."""
    return (
        f"list_filter(string_split_regex(lower(trim({text_expr})), '\\s+'), "
        "w -> w <> '')"
    )


def sql_shingles(ws_expr: str = "ws", n: int = 3) -> str:
    """DuckDB fragment matching :func:`word_shingles` over a words-list
    column."""
    parts = " || ' ' || ".join(f"{ws_expr}[i+{j}]" if j else f"{ws_expr}[i]" for j in range(n))
    return (
        "list_distinct(list_transform(generate_series(1, "
        f"greatest(len({ws_expr}) - {n - 1}, 0)), i -> {parts}))"
    )


def _spread_narrow_input(df: DataFrame) -> DataFrame:
    """Degenerate-layout guard for md5-heavy passes: a single-file local
    corpus arrives as 1 input split, serializing the per-shingle k-md5
    signature work on one core. A real 100 TB corpus has thousands of
    splits and skips this; only inputs narrower than the session's
    parallelism pay the one corpus-sized round-robin redistribution
    (no key skew by construction)."""
    defpar = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < defpar:
        return df.repartition(defpar)
    return df


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(doc, shingle) — DISTINCT non-empty word-n-grams, exploded. The
    shared input of the portable MinHash signature pass and the
    candidate-verify stage (one tokenize+shingle per doc, not one per
    consumer). The tokenization is materialized as a column BEFORE the
    shingle transform (the shingle_pairs_jaccard 5x rule)."""
    return (
        df.select(
            F.col(id_col).alias("doc"),
            normalized_words(F.col(text_col)).alias("words"),
        )
        .select("doc", F.explode(word_shingles(F.col("words"), n)).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


def minhash_signature_aggs(num_hashes: int = 16) -> list[Column]:
    """The k portable min-hash aggregate expressions over a
    (doc, shingle) exploded table: ``min(md5(i || ':' || shingle))``
    per hash index, aliased ``m0..m{k-1}``. Factored out of the batch
    band builder so the STREAMING signature maintenance (st12) can run
    the identical fold as an update-mode stateful aggregation — min is
    commutative and idempotent, so the incremental fold converges to
    the batch signature under any micro-batching and under
    at-least-once re-delivery. md5 stays inside whole-stage codegen (a
    higher-order ``transform`` form was tried and measured 3.5x
    SLOWER: HOF lambda bodies are interpreted per element)."""
    return [
        F.min(
            F.md5(F.encode(F.concat(F.lit(f"{i}:"), F.col("shingle")), "UTF-8"))
        ).alias(f"m{i}")
        for i in range(num_hashes)
    ]


def bands_from_signatures(
    sig: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """(doc, band, bucket) from a (doc, m0..m{k-1}) signature table —
    the constant bands-per-doc explode shared by the batch band builder
    and st12's post-stream admission join."""
    if num_hashes % bands:
        raise ValueError(f"num_hashes={num_hashes} not divisible by bands={bands}")
    r = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            F.md5(
                F.encode(
                    F.concat_ws(
                        "|", *[F.col(f"m{bi * r + j}") for j in range(r)]
                    ),
                    "UTF-8",
                )
            ).alias("bucket"),
        )
        for bi in range(bands)
    ]
    return sig.select(
        "doc", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_signature_table(sh: DataFrame, num_hashes: int = 16) -> DataFrame:
    """(doc, m0..m{k-1}) portable-MinHash signature table over an
    exploded-shingle table — ONE groupBy(doc) with k map-side-combined
    mins. Hash index i is keyed independently (``md5(i || ':' || s)``),
    so a k-hash signature's first j columns ARE the j-hash signature:
    a composition like cm1 computes ONE 16-min table and derives both
    its (16,4) dedup bands and its (8,4) decontamination bands from it
    (:func:`bands_from_signatures` reads only the columns it needs).
    The caller owns pinning/checkpointing when the table feeds more
    than one consumer."""
    return sh.groupBy("doc").agg(*minhash_signature_aggs(num_hashes))


def _minhash_bands_from_exploded(
    sh: DataFrame, num_hashes: int, bands: int, sig: DataFrame | None = None
) -> DataFrame:
    """(doc, band, bucket) from an :func:`_exploded_shingles` table: one
    groupBy(doc) with k min-aggregates (map-side combined — see
    :func:`minhash_signature_aggs`), then a constant bands-per-doc
    explode (:func:`bands_from_signatures`). ``sig`` — a precomputed
    :func:`minhash_signature_table` with at least ``num_hashes`` min
    columns — skips the groupBy so a shared (ideally pinned) signature
    pass can feed several band grains."""
    if num_hashes % bands:
        raise ValueError(f"num_hashes={num_hashes} not divisible by bands={bands}")
    if sig is None:
        sig = minhash_signature_table(sh, num_hashes)
    return bands_from_signatures(sig, num_hashes, bands)


def exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Public entry to the (doc, shingle) exploded table — narrow-input
    spread included — for callers that build SHARED shingle tables fed
    to :func:`portable_minhash_pairs_from_shingles` /
    :func:`portable_minhash_bands_from_shingles` (cm1's composition).
    The caller owns pinning/checkpointing.

    Streaming inputs skip the narrow-input spread: ``.rdd`` is
    unsupported on a streaming plan, and a file stream's parallelism
    comes from its source splits per micro-batch anyway (st12)."""
    if df.isStreaming:
        return _exploded_shingles(df, id_col, text_col, n)
    return _exploded_shingles(_spread_narrow_input(df), id_col, text_col, n)


def portable_minhash_bands_from_shingles(
    sh: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """:func:`portable_minhash_bands` over a caller-supplied exploded
    shingle table (see :func:`exploded_shingles`): (doc, band, bucket)."""
    return _minhash_bands_from_exploded(sh, num_hashes, bands)


def portable_minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """MinHash band buckets computed ONLY from md5 — bit-reproducible in
    any engine with an md5() builtin (the one hash Spark and DuckDB both
    expose over strings), so LSH-banded joins built on top are exact-
    oracle-checkable, unlike the xxhash64 paths above.

    hash_i(shingle) = md5(i || ':' || shingle) compared as lowercase-hex
    strings (ASCII-lexicographic == unsigned-numeric order for fixed-
    width hex, identical in Spark and DuckDB), so
    ``sig_i = min_over_shingles(hash_i)`` needs no engine-specific
    integer hash. Band bucket = md5 of the '|'-joined r signature mins.

    Since r10 the WHOLE band-builder family (this, the from-shingles /
    from-signatures forms, the signature aggs, and the SQL twin)
    defaults to the tuned production (16, 4) r=4 banding, matching the
    candidate/verify stages (ADVICE r9: the old split defaults let a
    default band table silently mismatch a default verify stage).
    Recall-first consumers (dc2) pass (8, 4) explicitly on BOTH
    engines — that choice is deliberate and test-pinned, not a default.

    Same scale shape as :func:`minhash_signatures`: one shingle explode,
    one groupBy(doc) with k min-aggregates (map-side combine — the
    shuffle carries (doc, k × 32-char mins), never the text), then a
    constant 4-rows-per-doc band explode. Costs k md5 calls per shingle
    vs one xxhash64 + k affine transforms — the price of portability;
    use the xxhash64 path when oracle parity isn't needed.

    Returns (doc, band, bucket) rows ready for an equi-join.
    """
    return _minhash_bands_from_exploded(
        _exploded_shingles(_spread_narrow_input(df), id_col, text_col, n),
        num_hashes,
        bands,
    )


def sql_portable_minhash_bands(
    table: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
) -> str:
    """DuckDB CTE body matching :func:`portable_minhash_bands` (3-word
    shingles): yields (doc, band, bucket) rows. Keep in lockstep with the
    Spark builder above — the md5 inputs must match byte-for-byte."""
    r = num_hashes // bands
    words = sql_words(text_expr)
    shingles = sql_shingles("ws")
    mins = ", ".join(
        f"min(md5('{i}:' || s)) AS m{i}" for i in range(num_hashes)
    )
    band_rows = " UNION ALL ".join(
        "SELECT doc, {b} AS band, md5({parts}) AS bucket FROM sig".format(
            b=bi,
            parts=" || '|' || ".join(f"m{bi * r + j}" for j in range(r)),
        )
        for bi in range(bands)
    )
    return f"""
    ws AS (SELECT {id_expr} AS doc, {words} AS ws FROM {table}),
    sh AS (SELECT doc, unnest({shingles}) AS s FROM ws),
    sig AS (SELECT doc, {mins} FROM sh WHERE s <> '' GROUP BY doc),
    bands AS ({band_rows})
    """


def portable_minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
    eager_pins: bool = False,
) -> DataFrame:
    """Near-dup pairs the way a 100 TB pipeline actually produces them:
    LSH-banded CANDIDATES (from :func:`portable_minhash_bands`) verified
    by exact n-gram Jaccard computed ONLY on the candidate pairs — never
    an all-pairs shingle self-join. md5-only hashing keeps the whole
    plan engine-portable, so unlike the xxhash64 dd3 path the banded
    join is exact-oracle-checkable end-to-end
    (:func:`sql_portable_minhash_pairs` is the lockstep DuckDB twin).

    Defaults (16 hashes, 4 bands → r=4 rows/band) are TUNED, not
    guessed — the dd16 instrument's r9 sweep at sf0.1
    (tools/band_tuning.py, table in SCALE_r09.md): (8,4)'s r=2 S-curve
    crosses ~0.5 and floods the verify stage with sub-threshold
    collisions (verify_precision 0.31 — 69% of candidate spend was
    noise); (16,4)'s r=4 crosses ~(1/4)^(1/4)≈0.71, and on the actual
    near-exact dup distribution holds pair_recall 1.0 at
    verify_precision 1.0 with 3.2× fewer candidates, at equal wall
    (the 2× md5 signature cost is repaid by the verify-stage cut).
    The documented trade: borderline pairs (jaccard≈0.3, above the
    0.2 verify threshold but far below the S-curve crossing) drop
    from 0.33 capture to ~0 — the exact yardstick (dd2/dd8) remains
    the threshold-faithful path, and the recall-first consumers
    (dc2's decontamination sweep) deliberately stay on r=2 banding.

    Scale shape: ONE pinned exploded-shingle table feeds both the
    signature pass (groupBy(doc) with k map-side-combined mins — the
    shuffle carries 16×32-char mins per doc) and the verify stage, so
    the corpus is tokenized once (the 100 TB equivalent is a
    checkpointed shingle table shared by both). The band table
    self-joins on (band, bucket) — candidate volume tracks true
    duplicate density, not |corpus|² — and verification mirrors the
    oracle's own join-count shape: candidate pairs pick up their
    a-side shingles by id (an inherent semi-join prune: only candidate
    docs' shingles flow), match b-side shingles on (id, shingle), and
    the per-pair count + per-doc sizes give |∩| / |∪| >= threshold.
    All codegen — no higher-order functions in the hot path. Semantics
    equal :func:`shingle_pairs_jaccard` restricted to banded
    candidates: a true near-dup pair that collides in no band is
    missed — that recall trade IS the LSH contract (recall floors in
    plans/star_recall.py quantify it for the xxhash64 twin).

    Returns (a_id, b_id, jaccard) with a_id < b_id.
    """
    src = _spread_narrow_input(df.select(F.col(id_col), F.col(text_col)))
    sh = pin_bounded(
        _exploded_shingles(src, id_col, text_col, n), eager=eager_pins
    )
    return portable_minhash_pairs_from_shingles(
        sh,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        eager_pins=eager_pins,
    )


def portable_minhash_pairs_from_shingles(
    sh: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    sig: DataFrame | None = None,
    eager_pins: bool = False,
) -> DataFrame:
    """:func:`portable_minhash_pairs`'s band/verify stages over a
    CALLER-SUPPLIED exploded-shingle table ``sh`` (doc, shingle) — the
    shape :func:`_exploded_shingles` produces. The caller owns pinning
    (``sh`` is read by the signature pass, the per-doc sizes, and the
    verify join — pass it through :func:`pin_bounded`, or a checkpoint
    at 100 TB). This split exists so a composition like cm1 can
    tokenize+shingle the corpus ONCE and thread the same table through
    its dedup and decontamination subtrees instead of each re-deriving
    it (VERDICT r6 "Next round" #3). ``sig`` — an optional precomputed
    :func:`minhash_signature_table` — additionally shares the k-min
    signature pass itself (cm1 derives its dedup AND decontamination
    bands from ONE pinned 16-min table). ``eager_pins`` (only from
    eager-flagged queries — see :func:`pin_bounded`) pins the band
    table before its self-join so the k-min signature pass runs once,
    not once per join branch per edge-union direction."""
    cand = band_candidates(
        sh, num_hashes, bands, sig=sig, eager_pins=eager_pins
    )
    return verify_candidates(sh, cand, threshold)


def band_candidates(
    sh: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    sig: DataFrame | None = None,
    eager_pins: bool = False,
) -> DataFrame:
    """The PRE-verify LSH candidate set (a_id < b_id, distinct): band
    table self-joined on (band, bucket). Factored out of
    :func:`portable_minhash_pairs_from_shingles` so dd16's eval can
    count the candidate volume the verify stage pays for.

    The band table is referenced by BOTH self-join sides (and the CC
    consumer's edge union doubles the whole subtree again), so with
    ``eager_pins`` it is checkpointed before the join — the signature
    groupBy executes once instead of up to 4× (optimization r15,
    measured on dd11's stage profile: four duplicate signature-pass
    jobs)."""
    bandtab = _minhash_bands_from_exploded(sh, num_hashes, bands, sig=sig)
    if eager_pins:
        bandtab = pin_bounded(bandtab, eager=True)
    a, b = bandtab.alias("a"), bandtab.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("a_id"), F.col("b.doc").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )


def verify_candidates(
    sh: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    """Candidate-restricted exact Jaccard verification — the second
    half of :func:`portable_minhash_pairs_from_shingles`."""
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(
            sh.select(F.col("doc").alias("a_id"), "shingle"), "a_id"
        )
        .join(
            sh.select(F.col("doc").alias("b_id"), "shingle"),
            ["b_id", "shingle"],
        )
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        # candidates exist only for docs with >= 1 shingle, so the
        # union size is >= 1 — the ANSI-mode division cannot hit zero
        F.col("a_size") + F.col("b_size") - F.col("n_common")
    )
    return (
        inter.join(
            sizes.select(F.col("doc").alias("a_id"), F.col("n_sh").alias("a_size")),
            "a_id",
        )
        .join(
            sizes.select(F.col("doc").alias("b_id"), F.col("n_sh").alias("b_size")),
            "b_id",
        )
        .select("a_id", "b_id", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def sql_portable_minhash_pairs(
    table: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
) -> str:
    """DuckDB CTE body matching :func:`portable_minhash_pairs` (ends at
    a ``pairs(a_id, b_id)`` CTE; jaccard is folded into the filter).
    Reuses :func:`sql_portable_minhash_bands`'s ``sh`` CTE for the
    verify stage so the shingle construction has ONE definition. The
    intersection count equals Spark's ``array_intersect`` size because
    ``sh`` unnests the DISTINCT shingle list."""
    body = sql_portable_minhash_bands(table, id_expr, text_expr, num_hashes, bands)
    return f"""{body},
    cand AS (
        SELECT DISTINCT a.doc AS a_id, b.doc AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    ),
    ssz AS (SELECT doc, COUNT(*) AS n FROM sh WHERE s <> '' GROUP BY doc),
    inter AS (
        SELECT c.a_id, c.b_id, COUNT(*) AS n_common
        FROM cand c
        JOIN sh x ON x.doc = c.a_id AND x.s <> ''
        JOIN sh y ON y.doc = c.b_id AND y.s = x.s
        GROUP BY c.a_id, c.b_id
    ),
    pairs AS (
        SELECT i.a_id, i.b_id
        FROM inter i
        JOIN ssz sa ON sa.doc = i.a_id
        JOIN ssz sb ON sb.doc = i.b_id
        WHERE i.n_common / (sa.n + sb.n - i.n_common) >= {threshold}
    )
    """


def banded_pair_eval(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """ONE-row EVALUATION of the banded near-dup path against the exact
    yardstick — the dedup family's ii6: where rf3/rf4 assert a recall
    floor for the rows-only xxhash twins, this measures the md5-portable
    production path in driver-hash-checked integers. Columns:

    - ``n_exact_pairs``: all Jaccard >= t pairs (dd2's definition,
      computed from the SAME pinned shingle table — the quadratic
      yardstick, gate scale only);
    - ``n_band_candidates``: pre-verify LSH candidate volume — what the
      banding SPENDS (the verify stage's join input);
    - ``n_verified_pairs``: candidates surviving exact verification —
      what the pipeline DELIVERS (a subset of exact by construction:
      same Jaccard predicate over the same shingles);
    - ``n_missed_pairs`` = exact − verified: true pairs colliding in no
      band, the LSH recall trade as a count;
    - ``pair_recall`` = verified/exact, ``verify_precision`` =
      verified/candidates (how much of the candidate spend was real) —
      both NULL-guarded for empty denominators (ANSI mode).

    ONE tokenize feeds all three relations (the pinned ``sh`` — the
    ii6 discipline); the candidate table is pinned because both the
    count and the verify stage consume it. Scale note: only the
    n_exact side is quadratic; a 100 TB deployment runs this eval on a
    SAMPLE to tune (num_hashes, bands) before the full run — the
    operator is sample-grain by design, like every eval harness here.
    """
    src = _spread_narrow_input(df.select(F.col(id_col), F.col(text_col)))
    sh = pin_bounded(_exploded_shingles(src, id_col, text_col, n))
    cand = pin_bounded(band_candidates(sh, num_hashes, bands))
    verified = verify_candidates(sh, cand, threshold)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    einter = (
        sh.select(F.col("doc").alias("a_id"), "shingle")
        .join(sh.select(F.col("doc").alias("b_id"), "shingle"), "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("a_size") + F.col("b_size") - F.col("n_common")
    )
    exact = (
        einter.join(
            sizes.select(F.col("doc").alias("a_id"), F.col("n_sh").alias("a_size")),
            "a_id",
        )
        .join(
            sizes.select(F.col("doc").alias("b_id"), F.col("n_sh").alias("b_size")),
            "b_id",
        )
        .filter(jac >= threshold)
        .select("a_id", "b_id")
    )
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_band_candidates"))
    nv = verified.agg(F.count(F.lit(1)).alias("n_verified_pairs"))
    return (
        ne.crossJoin(nc)
        .crossJoin(nv)
        .select(
            "n_exact_pairs",
            "n_band_candidates",
            "n_verified_pairs",
            (F.col("n_exact_pairs") - F.col("n_verified_pairs")).alias(
                "n_missed_pairs"
            ),
            F.when(
                F.col("n_exact_pairs") > 0,
                F.col("n_verified_pairs").cast("double")
                / F.col("n_exact_pairs"),
            ).alias("pair_recall"),
            F.when(
                F.col("n_band_candidates") > 0,
                F.col("n_verified_pairs").cast("double")
                / F.col("n_band_candidates"),
            ).alias("verify_precision"),
        )
    )


def portable_simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs computed ONLY from md5 + integer
    arithmetic — the dd4 analog of :func:`portable_minhash_bands`:
    engine-portable, so the banded Hamming join is exact-oracle-
    checkable (dd4's 64-bit xxhash64 fingerprints are not).

    Per (doc, word, count) row, bit i of md5(word)'s leading ``bits``
    bits votes count·(+1/-1) into the doc's i-th accumulator;
    fingerprint bit i = (vote sum >= 0). All-integer, so there is no
    float to diverge. Banding: ``bands`` equal slices of the fingerprint,
    candidate equi-join on (band, slice value), then an exact
    bit_count(xor) Hamming filter. Scale shape mirrors
    simhash_near_pairs: one (doc, word)-grain count (map-side combine),
    one groupBy(doc) with `bits` conditional sums, constant
    bands-per-doc explode, id-only candidate join.

    Returns (a_id, b_id, hamming) with a_id < b_id.
    """
    r = bits // bands
    if bits % bands:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    if bits % 4 or not 0 < bits <= 60:
        # md5 is consumed in whole hex nibbles (bits//4 chars), and the
        # fingerprint must fit a signed bigint with room for 1 << (bits-1):
        # bits=64 would overflow conv()'s bigint cast and the literal.
        raise ValueError(f"bits={bits} must be a multiple of 4 in (0, 60]")
    wc = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(normalized_words(F.col(text_col))).alias("w"),
        )
        .groupBy("doc", "w")
        .agg(F.count("*").alias("c"))
        .withColumn(
            "hv", F.conv(F.substring(F.md5(F.encode(F.col("w"), "UTF-8")), 1, bits // 4), 16, 10).cast("bigint")
        )
    )
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("hv"), i).bitwiseAND(F.lit(1)) == 1,
                F.col("c"),
            ).otherwise(-F.col("c"))
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    fp = (
        wc.groupBy("doc")
        .agg(*votes)
        .select(
            "doc",
            sum(
                (F.when(F.col(f"v{i}") >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
                for i in range(bits)
            ).cast("bigint").alias("fp"),
        )
    )
    band_rows = fp.select(
        "doc",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("fp"), b * r)
                        .bitwiseAND(F.lit((1 << r) - 1))
                        .alias("bval"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "fp", "bb.band", "bb.bval")
    a, b = band_rows.alias("a"), band_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("a_id"),
            F.col("b.doc").alias("b_id"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).cast("int")
    return cand.select("a_id", "b_id", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def sql_portable_simhash_pairs(
    table: str,
    id_expr: str = "doc_id",
    text_expr: str = "text",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> str:
    """DuckDB query matching :func:`portable_simhash_pairs`. Keep in
    lockstep — the md5 nibble extraction and vote signs must match."""
    if bits % bands:
        raise ValueError(f"bits={bits} not divisible by bands={bands}")
    if bits % 4 or not 0 < bits <= 60:
        raise ValueError(f"bits={bits} must be a multiple of 4 in (0, 60]")
    r = bits // bands
    nib = bits // 4
    words = sql_words(text_expr)
    votes = ", ".join(
        f"SUM(CASE WHEN (hv >> {i}) & 1 = 1 THEN c ELSE -c END) AS v{i}"
        for i in range(bits)
    )
    fp_expr = " + ".join(
        f"(CASE WHEN v{i} >= 0 THEN {1 << i} ELSE 0 END)" for i in range(bits)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc, fp, {b} AS band, (fp >> {b * r}) & {(1 << r) - 1} AS bval "
        "FROM fp"
        for b in range(bands)
    )
    return f"""
    WITH tok AS (
        SELECT {id_expr} AS doc, unnest({words}) AS w FROM {table}
    ), wc AS (
        SELECT doc, w, COUNT(*) AS c,
               CAST('0x' || substring(md5(w), 1, {nib}) AS BIGINT) AS hv
        FROM tok GROUP BY doc, w
    ), v AS (
        SELECT doc, {votes} FROM wc GROUP BY doc
    ), fp AS (
        SELECT doc, CAST({fp_expr} AS BIGINT) AS fp FROM v
    ), bands AS ({band_rows})
    SELECT DISTINCT a.doc AS a_id, b.doc AS b_id,
           CAST(bit_count(xor(a.fp, b.fp)) AS INT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bval = b.bval AND a.doc < b.doc
    WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
    """


def repeated_span_profile(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Repeated-substring dedup (the deduplicate-text-datasets pass,
    Lee et al. 2021 "Deduplicating Training Data Makes Language Models
    Better"): find every maximal run of tokens covered by a word
    k-gram that occurs >= 2 times ANYWHERE in the corpus — within the
    same document or across documents — and report, per document, the
    span accounting plus the digest of the TRIMMED text (the tokens
    outside every repeated span, in order).

    Anchored k-gram construction instead of a suffix array: a repeated
    span of length >= k tokens is exactly a maximal interval covered
    by duplicated k-gram anchors (every k-gram inside a repeat is
    itself repeated), so anchoring + interval union finds the same
    >= k-token spans a suffix array would, with only hash joins and
    per-document windows. The trade: a suffix array also finds the
    true maximal EXTENT below k granularity and never glues two
    distinct repeats separated by < k fresh tokens; anchoring
    resolution is the k-gram — the standard scale trade (distributed
    suffix-array construction needs specialized global sorts; this is
    three keyed exchanges of narrow rows).

    Plan shape: posexplode to (doc, pos, word) — arrival order is an
    explicit position column, never partition order — then ONE
    per-doc window builds the k-gram at each anchor via lead()
    (codegen concat + one md5 per anchor; no HOF lambdas), a
    map-side-combined groupBy(gram-hash) counts occurrences, dup
    anchors join back on (doc, pos) (the gh join deliberately takes
    only NOT-NULL anchors so the k-1 gram-less tail positions of
    every doc — all NULL — never pile into one hash partition), and
    per-doc coverage/island windows + the final rollup share one
    hash partitioning on doc. The trimmed-text digest rides
    an explicit position sort (collect_list of (pos, word) structs →
    array_sort), so it is identical under any partitioning.

    Returns one row per INPUT doc (token-less docs included):
    (doc_id, n_tokens, n_dup_tokens, n_spans, clean_digest) where
    clean_digest = md5 of the space-joined surviving tokens, or
    '<empty>' when nothing survives (or the doc had no tokens).
    """
    w = Window.partitionBy("doc").orderBy("pos")
    tok = (
        df.select(
            F.col(id_col).alias("doc"),
            normalized_words(F.col(text_col)).alias("ws"),
        )
        .select("doc", F.posexplode("ws").alias("p0", "word"))
        .select("doc", (F.col("p0") + F.lit(1)).alias("pos"), "word")
    )
    gram_parts: list = [F.col("word")]
    for j in range(1, k):
        gram_parts += [F.lit(" "), F.lead("word", j).over(w)]
    # F.concat propagates NULL: the last k-1 positions of each doc have
    # no full k-gram and get gh = NULL (never counted, never anchors).
    # Pinned: this subtree (posexplode + per-doc lead window + one md5
    # per anchor) is the plan's most expensive stage and fans out to
    # THREE consumers (dup counts, the anchor join, flagged) — without
    # the pin it recomputes per consumer, against the module's
    # shared-intermediate convention (ADVICE r7).
    g2 = pin_bounded(
        tok.withColumn("gh", F.md5(F.encode(F.concat(*gram_parts), "UTF-8")))
    )
    dup = (
        g2.filter(F.col("gh").isNotNull())
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("gh")
    )
    dup_anchors = (
        g2.filter(F.col("gh").isNotNull())
        .join(dup, "gh")
        .select("doc", "pos", F.lit(1).alias("isdup"))
    )
    flagged = (
        g2.select("doc", "pos", "word")
        .join(dup_anchors, ["doc", "pos"], "left")
        .withColumn("isdup", F.coalesce(F.col("isdup"), F.lit(0)))
    )
    cov = flagged.withColumn(
        "covered", F.max("isdup").over(w.rowsBetween(-(k - 1), 0))
    )
    spans = cov.withColumn(
        "span_start",
        F.when(
            (F.col("covered") == 1)
            & (F.coalesce(F.lag("covered").over(w), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    )
    surviving = F.array_sort(
        F.collect_list(
            F.when(F.col("covered") == 0, F.struct("pos", "word"))
        )
    )
    # the transform lambda is a per-element struct-field read on a
    # per-doc array — not a hashing/regex hot path (the md5 runs once
    # per doc on the joined string, outside the lambda)
    joined = F.array_join(
        F.transform(surviving, lambda s: s["word"]), " "
    )
    per = spans.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("covered").alias("n_dup_tokens"),
        F.sum("span_start").alias("n_spans"),
        F.when(F.size(surviving) == 0, F.lit("<empty>"))
        .otherwise(F.md5(F.encode(joined, "UTF-8")))
        .alias("clean_digest"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per.withColumnRenamed("doc", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_dup_tokens", F.lit(0)).alias("n_dup_tokens"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("clean_digest", F.lit("<empty>")).alias(
                "clean_digest"
            ),
        )
    )


def sql_repeated_span_profile(
    table: str, id_expr: str = "doc_id", text_expr: str = "text", k: int = 8
) -> str:
    """DuckDB twin of :func:`repeated_span_profile` — keep in lockstep
    (same tokenizer fragment, same '<empty>' sentinel, same k)."""
    words = sql_words(text_expr)
    gram = " || ' ' || ".join(
        ["word"] + [f"lead(word, {j}) OVER w" for j in range(1, k)]
    )
    return f"""
    WITH ws12 AS (
        SELECT {id_expr} AS doc, {words} AS ws FROM {table}
    ), tok12 AS (
        SELECT doc, unnest(ws) AS word,
               unnest(generate_series(1, len(ws))) AS pos
        FROM ws12
    ), g12 AS (
        SELECT doc, pos, word, md5({gram}) AS gh
        FROM tok12 WINDOW w AS (PARTITION BY doc ORDER BY pos)
    ), dup12 AS (
        SELECT gh FROM g12 WHERE gh IS NOT NULL
        GROUP BY gh HAVING COUNT(*) >= 2
    ), fl12 AS (
        SELECT g.doc, g.pos, g.word,
               CASE WHEN d.gh IS NULL THEN 0 ELSE 1 END AS isdup
        FROM g12 g LEFT JOIN dup12 d ON g.gh = d.gh
    ), cv12 AS (
        SELECT doc, pos, word,
               max(isdup) OVER (
                   PARTITION BY doc ORDER BY pos
                   ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW
               ) AS covered
        FROM fl12
    ), sp12 AS (
        SELECT doc, pos, word, covered,
               CASE WHEN covered = 1 AND coalesce(lag(covered) OVER (
                        PARTITION BY doc ORDER BY pos), 0) = 0
                    THEN 1 ELSE 0 END AS span_start
        FROM cv12
    ), per12 AS (
        SELECT doc,
               COUNT(*) AS n_tokens,
               CAST(SUM(covered) AS BIGINT) AS n_dup_tokens,
               CAST(SUM(span_start) AS BIGINT) AS n_spans,
               coalesce(md5(string_agg(
                   CASE WHEN covered = 0 THEN word END, ' ' ORDER BY pos
               )), '<empty>') AS clean_digest
        FROM sp12 GROUP BY doc
    )
    SELECT d.{id_expr} AS doc_id,
           coalesce(p.n_tokens, 0) AS n_tokens,
           coalesce(p.n_dup_tokens, 0) AS n_dup_tokens,
           coalesce(p.n_spans, 0) AS n_spans,
           coalesce(p.clean_digest, '<empty>') AS clean_digest
    FROM {table} d LEFT JOIN per12 p ON d.{id_expr} = p.doc
    """
