"""Multimodal-column operators: opaque binary payloads + typed metadata.

Beyond-reference family (BASELINE.json north star). The design for
100 TB multimodal pipelines:

- media travels as an opaque ``binary`` column with a typed metadata
  struct alongside (mime, byte length, content digest) — Spark never
  interprets the bytes except inside explicit decode operators;
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` operators so the heavy per-item Python/C work is
  amortized over columnar batches and parallelized by partition;
- this container has no image/audio libraries, so the actual decoders
  are STUBS: ``decode_media_batch`` raises ``NotImplementedError`` unless
  ``fake=True``, in which case a deterministic hash-based decoder stands
  in. The Spark-side plumbing — schema, batching, partitioning, UDF
  signatures — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, content_digest string"
)

DECODED_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, width int, height int, "
    "n_frames int, sample_rate int, n_samples bigint"
)


def with_media_columns(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Attach the typed metadata struct for an opaque binary payload.

    Metadata is computed JVM-side (length/digest are codegen'd), so a
    scan that only needs metadata never ships payload bytes to Python.
    """
    payload = F.col(payload_col)
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.md5(payload).alias("content_digest"),
        ).alias("media_meta"),
    )


def _fake_decode(doc_id: int, payload: bytes) -> tuple[int, int, int, int, int]:
    """Deterministic stand-in decoder: dimensions derived from content
    bytes so tests are stable and partition-independent."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0x7FFFFFFF
    width = 64 + (h % 1920)
    height = 64 + ((h >> 8) % 1080)
    n_frames = 1 + ((h >> 16) % 240)
    sample_rate = 8000 + ((h >> 4) % 40000)
    # 1-31 s of audio at the drawn rate — the column audio_chunk_plan
    # consumes; the decode must emit it for the documented decode->chunk
    # chaining to resolve (review finding: DECODED_SCHEMA previously
    # ended at sample_rate, so the composition raised UNRESOLVED_COLUMN)
    n_samples = (h % (sample_rate * 30)) + sample_rate
    return width, height, n_frames, sample_rate, n_samples


def decode_media_batch(
    df: DataFrame, fake: bool = False, batch_label: str = "decode"
) -> DataFrame:
    """Decode operator over (doc_id, payload, media_meta) rows.

    Runs as ``mapInPandas``: each Arrow batch of payloads is decoded in
    one Python call — the shape a real libjpeg/ffmpeg decode would use.
    ``fake=False`` raises NotImplementedError (no media libs in this
    container); ``fake=True`` uses the deterministic stand-in.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires image/audio libraries not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stand-in decoder"
                )
            dims = [
                _fake_decode(i, bytes(p)) for i, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["media_meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["media_meta"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    "sample_rate": [d[3] for d in dims],
                    "n_samples": [d[4] for d in dims],
                }
            )

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample_plan(decoded: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index.

    ``sequence`` + ``explode`` JVM-side — the expensive decode already
    happened once per item; sampling is pure plan logic. Items with no
    frames (n_frames <= 0 or NULL — audio-only media from a real
    decoder) yield NO rows: without the filter, greatest(n-1, 0) made
    them emit a phantom frame_idx=0 (review finding; audio_chunk_plan
    already guarded the same case).
    """
    return decoded.filter(F.col("n_frames") > 0).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )


def audio_chunk_plan(
    decoded: DataFrame, chunk_seconds: int = 5, hop_seconds: int = 4
) -> DataFrame:
    """Overlapping audio chunk boundaries from (sample_rate, n_samples)
    metadata: chunks start every ``hop_seconds`` while inside the clip
    and run ``chunk_seconds`` (clipped at the end), the standard ASR /
    audio-embedding windowing (1 s overlap at the defaults).

    Pure plan logic like :func:`frame_sample_plan` — ``sequence`` +
    ``posexplode`` JVM-side over metadata the (stubbed) decode emitted
    once per item; no payload bytes move. Returns
    (doc_id, chunk_idx, start_sample, end_sample).
    """
    chunk = (F.col("sample_rate") * chunk_seconds).cast("long")
    hop = (F.col("sample_rate") * hop_seconds).cast("long")
    starts = F.sequence(
        F.lit(0).cast("long"), (F.col("n_samples") - 1).cast("long"), hop
    )
    return (
        # zero-length clips yield no chunks (and ANSI sequence bounds
        # reject a 0→-1 range) — filter them out before the explode
        decoded.filter(F.col("n_samples") > 0)
        .select(
            "doc_id",
            "n_samples",
            chunk.alias("_chunk"),
            F.posexplode(starts).alias("chunk_idx", "start_sample"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            "start_sample",
            F.least(
                F.col("start_sample") + F.col("_chunk"), F.col("n_samples")
            ).alias("end_sample"),
        )
    )


def image_patch_plan(decoded: DataFrame, patch: int = 16) -> DataFrame:
    """Native-resolution ViT patch grid (NaViT/Pix2Struct-style) from
    per-image (height, width) metadata: one output row per ``patch`` ×
    ``patch`` tile, row-major, edge tiles clipped to the image bounds —
    the patchification pass a vision encoder runs before embedding,
    with the pixel decode remaining the stubbed boundary (mm2).

    Pure plan logic like :func:`frame_sample_plan`: two nested
    ``sequence`` + ``explode`` steps JVM-side over metadata only; no
    payload bytes move. Degenerate images (height or width <= 0) yield
    NO rows (the frame/audio-plan guard). Returns
    (doc_id, patch_row, patch_col, y0, x0, y1, x1) with y1/x1
    EXCLUSIVE, so every pixel belongs to exactly one patch.
    """
    rows = F.sequence(F.lit(0), F.expr(f"(height - 1) div {patch}"))
    cols = F.sequence(F.lit(0), F.expr(f"(width - 1) div {patch}"))
    return (
        decoded.filter((F.col("height") > 0) & (F.col("width") > 0))
        .select(
            "doc_id",
            "height",
            "width",
            F.explode(rows).alias("patch_row"),
        )
        .select(
            "doc_id",
            "height",
            "width",
            "patch_row",
            F.explode(cols).alias("patch_col"),
        )
        .select(
            "doc_id",
            F.col("patch_row").cast("int").alias("patch_row"),
            F.col("patch_col").cast("int").alias("patch_col"),
            (F.col("patch_row") * patch).cast("long").alias("y0"),
            (F.col("patch_col") * patch).cast("long").alias("x0"),
            F.least(
                (F.col("patch_row") + 1) * patch, F.col("height")
            ).cast("long").alias("y1"),
            F.least(
                (F.col("patch_col") + 1) * patch, F.col("width")
            ).cast("long").alias("x1"),
        )
    )


def md5_image_meta(text_col: str = "text") -> tuple[Column, Column]:
    """The gate-scale stand-in image metadata — (height, width) derived
    from two md5 prefixes of the payload column, H, W ∈ [64, 512) —
    stated ONCE for every consumer (mm5's per-tile grid and mm6's
    interleaved packer must agree tile-for-tile; review finding: the
    exprs were restated in four places guarded only by a lockstep
    test). The SQL twins necessarily restate this as text in their
    oracles; the per-entry hash gate plus the mm5↔mm6 lockstep test
    catch any twin drift."""
    h1 = F.conv(
        F.substring(F.md5(F.col(text_col)), 1, 6), 16, 10
    ).cast("bigint")
    h2 = F.conv(
        F.substring(F.md5(F.col(text_col)), 7, 6), 16, 10
    ).cast("bigint")
    return (h1 % 448 + 64).alias("height"), (h2 % 448 + 64).alias("width")
