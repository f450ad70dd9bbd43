"""Deterministic-sampling queries over the documents table (training-mix
construction; see operators/sampling.py for the portability argument).

All three are hash-checked bit-exact against DuckDB running the SAME
salted-md5 decision function — the whole point of hash sampling is that
an independent engine picks the identical rows.

mm2 additionally registers the multimodal frame-sampling plan (decode is
the disclosed Python-side stub, so it carries the driver's rows-only
check — the sampled frame indices are still deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import sql_portable_minhash_bands
from ..operators.multimodal import (
    decode_media_batch,
    frame_sample_plan,
    with_media_columns,
)
from ..operators.sampling import (
    hash_split,
    hex_threshold,
    k_per_stratum,
    sql_hash_bucket,
    sql_hash_split,
    stratified_sample,
)
from ..sources.readers import load_table
from .registry import query

_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.125}


@query(
    "sp1_hash_split",
    f"""
    SELECT doc_id, source,
           {sql_hash_split('doc_id')} AS split
    FROM documents
    """,
)
def sp1_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) by salted-md5
    range — stable under repartitioning, re-runs, and engines. Pure
    projection: no shuffle, no UDF."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return hash_split(docs, key="doc_id").select("doc_id", "source", "split")


@query(
    "sp2_stratified_sample",
    f"""
    SELECT doc_id, source
    FROM documents
    WHERE ({' OR '.join(
        f"(source = '{s}')" if r >= 1.0 else
        f"(source = '{s}' AND {sql_hash_bucket('doc_id', 'strat')} < "
        f"'{hex_threshold(r)}')"
        for s, r in _RATES.items()
    )})
    """,
)
def sp2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted training mix: per-source deterministic Bernoulli rates
    (src0 100%, src1 50%, src2 25%, src3 12.5%; others drop). A filter
    over the scan — membership never needs a shuffle or a join."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_sample(docs, key="doc_id", stratum="source", rates=_RATES)


@query(
    "sp3_k_per_stratum",
    """
    SELECT doc_id, source, sample_rank
    FROM (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('ksample:' || CAST(doc_id AS VARCHAR)) ASC,
                            doc_id ASC
               ) AS INT) AS sample_rank
        FROM documents
    )
    WHERE sample_rank <= 10
    """,
)
def sp3_k_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10-row uniform sample per source: rank by salted
    md5 (doc_id total-order tie-break). One per-source shuffle; Spark 4
    executes the rank-filter as WindowGroupLimit, so each partition
    ships at most k rows per stratum into the exchange."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return k_per_stratum(docs, key="doc_id", stratum="source", k=10).select(
        "doc_id", "source", F.col("sample_rank").cast("int").alias("sample_rank")
    )


@query("mm2_frame_sample", None)
def mm2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling end-to-end: binary payload + metadata →
    Arrow-batched decode (deterministic stub; real decoders are not in
    this container) → every-30th-frame explode. The decode runs in
    Python (mapInPandas), so this carries the rows-only check; frame
    indices are deterministic given the payload bytes."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    media = with_media_columns(docs, "doc_id", "payload")
    decoded = decode_media_batch(media, fake=True)
    return frame_sample_plan(decoded, every_n=30)


@query(
    "mm3_frame_select",
    """
    SELECT doc_id,
           CAST(unnest(generate_series(0, greatest(n_frames - 1, 0), 30))
                AS INT) AS frame_idx
    FROM (
        SELECT doc_id,
               CAST(CAST('0x' || substring(md5(text), 1, 6) AS BIGINT)
                    % 240 + 1 AS INT) AS n_frames
        FROM documents
    )
    """,
)
def mm3_frame_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-checkable half of the multimodal family (VERDICT r2 #6):
    mm2's frame-index selection — uniform every-30th sampling over a
    per-item frame count — through the SAME ``frame_sample_plan`` code
    path, but with ``n_frames`` derived from an md5 prefix of the
    payload text (1 + prefix % 240, the stub decoder's range) so DuckDB
    reproduces it bit-exactly. Only the decode itself remains Python-side
    and rows-only (mm2)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.encode(F.col("text"), "UTF-8")), 1, 6), 16, 10
    ).cast("bigint")
    decoded = docs.select(
        "doc_id", (h % 240 + 1).cast("int").alias("n_frames")
    )
    return frame_sample_plan(decoded, every_n=30)


# decontamination fingerprint: md5 of the first 8 normalized words — a
# prefix-overlap heuristic (exact digests never fire on a near-dup-only
# corpus; real decontamination uses n-gram/prefix overlap exactly so)
_PREFIX_FP_SQL = (
    "md5(array_to_string(list_filter(string_split_regex(lower(trim(text)), "
    "'\\s+'), w -> w <> '')[1:8], ' '))"
)


@query(
    "dc1_decontaminate",
    f"""
    WITH split AS (
        SELECT doc_id, {_PREFIX_FP_SQL} AS digest,
               {sql_hash_split('doc_id')} AS split
        FROM documents
    ),
    eval_digests AS (
        SELECT DISTINCT digest FROM split WHERE split <> 'train'
    )
    SELECT s.doc_id, s.digest
    FROM split s JOIN eval_digests e ON s.digest = e.digest
    WHERE s.split = 'train'
    """,
)
def dc1_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: training docs whose content
    fingerprint (md5 of the first 8 normalized words — prefix overlap)
    also appears in the val/test split: leaked eval data the training
    mix must drop. One digest equi-join — the shuffle carries
    (digest, id) only, never the body; swapping in stronger n-gram or
    MinHash fingerprints keeps the same shape at 100 TB. Composes sp1's
    deterministic split with the dedup-family fingerprints."""
    from ..operators.dedup import normalized_words

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.array_join(F.slice(normalized_words(F.col("text")), 1, 8), " ")
        ).alias("digest"),
    )
    split = hash_split(docs, key="doc_id")
    eval_digests = (
        split.filter(F.col("split") != "train").select("digest").distinct()
    )
    return (
        split.filter(F.col("split") == "train")
        .join(eval_digests, "digest")
        .select("doc_id", "digest")
    )


@query(
    "mm5_image_patches",
    """
    WITH meta AS (
        SELECT doc_id,
               CAST('0x' || substring(md5(text), 1, 6) AS BIGINT)
                   % 448 + 64 AS height,
               CAST('0x' || substring(md5(text), 7, 6) AS BIGINT)
                   % 448 + 64 AS width
        FROM documents
    ), rows_t AS (
        SELECT doc_id, height, width,
               unnest(generate_series(0, (height - 1) // 32)) AS pr
        FROM meta
    ), cells AS (
        SELECT doc_id, height, width, pr,
               unnest(generate_series(0, (width - 1) // 32)) AS pc
        FROM rows_t
    )
    SELECT doc_id,
           CAST(pr AS INT) AS patch_row, CAST(pc AS INT) AS patch_col,
           CAST(pr * 32 AS BIGINT) AS y0, CAST(pc * 32 AS BIGINT) AS x0,
           CAST(LEAST((pr + 1) * 32, height) AS BIGINT) AS y1,
           CAST(LEAST((pc + 1) * 32, width) AS BIGINT) AS x1
    FROM cells
    """,
)
def mm5_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image third of the multimodal selection trio (mm3 video
    frames, mm4 audio chunks, mm5 image patches): a NaViT-style
    native-resolution 32×32 patch grid over per-image (height, width)
    metadata — the patchification a vision encoder runs before
    embedding — through the real ``image_patch_plan`` operator, with
    the metadata derived from md5 prefixes (H, W ∈ [64, 512)) so DuckDB
    reproduces every tile boundary bit-exactly. Edge tiles clip to the
    image bounds (y1/x1 exclusive: each pixel in exactly one patch);
    as with mm2/mm3/mm4, only the pixel decode is the stubbed Python
    boundary — every (doc, tile) the pipeline would feed it is
    hash-checked."""
    from ..operators.multimodal import image_patch_plan

    from ..operators.multimodal import md5_image_meta

    docs = load_table(spark, sf_dir, "documents")
    height, width = md5_image_meta("text")
    decoded = docs.select("doc_id", height, width)
    return image_patch_plan(decoded, patch=32)


@query(
    "mm4_audio_chunks",
    """
    WITH meta AS (
        SELECT doc_id,
               list_value(8000, 16000, 22050, 44100)[
                   CAST(CAST('0x' || substring(md5(text), 1, 6) AS BIGINT)
                        % 4 + 1 AS INT)] AS sample_rate,
               CAST('0x' || substring(md5(text), 7, 6) AS BIGINT) AS h2
        FROM documents
    ), sized AS (
        SELECT doc_id, sample_rate,
               h2 % (sample_rate * 30) + sample_rate AS n_samples
        FROM meta
    )
    SELECT doc_id,
           CAST(start_sample // (sample_rate * 4) AS INT) AS chunk_idx,
           CAST(start_sample AS BIGINT) AS start_sample,
           CAST(LEAST(start_sample + sample_rate * 5, n_samples) AS BIGINT)
               AS end_sample
    FROM (
        SELECT doc_id, sample_rate, n_samples,
               unnest(generate_series(0, CAST(n_samples - 1 AS BIGINT),
                                      CAST(sample_rate * 4 AS BIGINT)))
                   AS start_sample
        FROM sized
    )
    """,
)
def mm4_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio analog of mm3: overlapping 5 s chunk boundaries with a
    4 s hop over per-item (sample_rate, n_samples) metadata — the ASR /
    audio-embedding windowing pass — through the real
    ``audio_chunk_plan`` operator, with the metadata derived from md5
    prefixes (rate ∈ {8000,16000,22050,44100}, duration in [1 s, 31 s):
    ``n_samples = h2 % (rate*30) + rate``) so
    DuckDB reproduces the selection bit-exactly. As with mm2/mm3, only
    the byte-level decode is the stubbed Python boundary; every sample
    index the pipeline would feed it is hash-checked."""
    from ..operators.multimodal import audio_chunk_plan

    docs = load_table(spark, sf_dir, "documents")
    h1 = F.conv(F.substring(F.md5(F.col("text")), 1, 6), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5(F.col("text")), 7, 6), 16, 10).cast("bigint")
    rate = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(22050), F.lit(44100)),
        (h1 % 4 + 1).cast("int"),
    ).cast("long")
    decoded = docs.select(
        "doc_id",
        rate.alias("sample_rate"),
        (h2 % (rate * 30) + rate).alias("n_samples"),
    )
    return audio_chunk_plan(decoded, chunk_seconds=5, hop_seconds=4)


def sql_fuzzy_decontaminate(split_rel: str) -> str:
    """dc2's decontamination SQL with the (doc, split) relation
    injectable — ONE builder for the registered dc2 oracle below
    (sp1's doc-hash split) and cm1's cluster-split subtree
    (star_manifest), mirroring :func:`fuzzy_decontaminate_plan`'s
    ``split`` parameter so the Spark plan and its SQL twin move
    together (a split re-key must not need two sites).

    Bands stay (8,4) EXPLICITLY, not via the builder default (review
    finding): dc2's recall-first r=2 banding is a deliberate choice —
    a future default change must not silently move this entry (its
    plan and oracle would move in LOCKSTEP, so no gate would fire
    while the borderline capture the dc2 docstring promises is lost)."""
    return f"""
    WITH {sql_portable_minhash_bands("documents", "doc_id", "text", 8, 4)},
    sp AS ({split_rel}),
    tagged AS (
        SELECT b.doc, b.band, b.bucket, sp.split
        FROM bands b JOIN sp ON b.doc = sp.doc
    )
    SELECT t.doc AS doc_id,
           COUNT(DISTINCT e.doc) AS n_eval_matches,
           MIN(e.doc) AS first_eval_match
    FROM tagged t
    JOIN tagged e ON t.band = e.band AND t.bucket = e.bucket
    WHERE t.split = 'train' AND e.split <> 'train'
    GROUP BY t.doc
    """


@query(
    "dc2_fuzzy_decontaminate",
    sql_fuzzy_decontaminate(
        f"SELECT doc_id AS doc, {sql_hash_split('doc_id')} AS split"
        " FROM documents"
    ),
)
def dc2_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY train/eval decontamination — dc1's exact-fingerprint join
    upgraded to MinHash-LSH banding, the GPT-3/PaLM-style near-match
    sweep (a paraphrased or lightly-edited eval doc still collides in a
    band). Uses the md5-only portable MinHash
    (operators/dedup.portable_minhash_bands: 8 hashes, 4 bands x 2
    rows), so unlike the xxhash64 dd3 path this LSH join is
    hash-checked against the DuckDB oracle end-to-end — the first
    exact-oracle verdict for the banded-join family, not just a recall
    floor. dc2 DELIBERATELY stays on (8,4) r=2 banding after the r9
    tuning moved the verified dedup path to (16,4) r=4: a
    decontamination sweep is recall-first (a false collision holds out
    one train doc — cheap; a missed paraphrase is eval leakage), and
    the r9 sweep measured r=2 capturing 0.33 of borderline
    jaccard≈0.3 pairs where r=4 captures ~0 (SCALE_r09.md). Scale shape: shingle explode -> one groupBy(doc) with 8
    map-side-combined mins (shuffle carries 8 x 32-char hex per doc,
    never text), constant 4-rows-per-doc band table, candidate
    equi-join on (band, bucket) whose size tracks cross-split
    similarity density, then a (train-doc)-grain rollup. Returns each
    contaminated TRAIN doc with how many eval/val docs it collides
    with and the first such doc id."""
    docs = load_table(spark, sf_dir, "documents")
    return fuzzy_decontaminate_plan(spark, docs)


def fuzzy_decontaminate_plan(
    spark: SparkSession,
    docs: DataFrame,
    bands: DataFrame | None = None,
    split: DataFrame | None = None,
    eager_pins: bool = False,
) -> DataFrame:
    """dc2's plan over an arbitrary documents DataFrame. ``bands`` —
    a (doc, band, bucket) table semantically equal to
    ``portable_minhash_bands(docs, 'doc_id', 'text', 8, 4)`` — is
    injectable so cm1 can derive the signature table ONCE (over
    digest-distinct texts, re-keyed per doc) and share it with its
    dd11 subtree; standalone dc2 builds its own. NOTE the explicit
    (8, 4): dc2's recall-first banding is deliberate, and since r10
    the band builders DEFAULT to the tuned (16, 4) — an injected
    default-banded table would silently mismatch this plan's oracle.

    ``split`` — a (doc, split) table — is injectable since r11 so the
    decontamination sweep runs against the SAME split its caller
    curates on: cm1 passes its cluster-grain split (VERDICT r10 #1 —
    sweeping doc-split contamination while holding out whole clusters
    would flag pairs the split already co-locates); standalone dc2
    keeps sp1's doc-hash split (its registered oracle is unchanged)."""
    from ..operators.dedup import pin_bounded, portable_minhash_bands

    if bands is None:
        # (8,4) explicitly — see the oracle binding's comment
        bands = portable_minhash_bands(
            docs, "doc_id", "text", num_hashes=8, bands=4
        )
    if split is None:
        split = hash_split(docs.select("doc_id"), key="doc_id").select(
            F.col("doc_id").alias("doc"), "split"
        )
    # both sides of the candidate self-join read the same (doc, band,
    # bucket, split) table; pinning it makes the 8-md5-per-shingle
    # signature stage compute ONCE, not once per join branch (the 100 TB
    # equivalent is a checkpointed signature table)
    tagged = pin_bounded(bands.join(split, "doc"), eager=eager_pins)
    t = tagged.filter(F.col("split") == "train").alias("t")
    e = tagged.filter(F.col("split") != "train").alias("e")
    return (
        t.join(
            e,
            (F.col("t.band") == F.col("e.band"))
            & (F.col("t.bucket") == F.col("e.bucket")),
        )
        .groupBy(F.col("t.doc").alias("doc_id"))
        .agg(
            F.count_distinct(F.col("e.doc")).alias("n_eval_matches"),
            F.min(F.col("e.doc")).alias("first_eval_match"),
        )
    )
