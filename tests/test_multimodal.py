"""Multimodal plumbing tests: binary columns, metadata, the stubbed
mapInPandas decode, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ig_etl_with_user_reports_2024_spark.operators import multimodal as mm


def _payloads(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG fake image bytes"), (2, b"RIFF fake wav bytes" * 10)],
        "doc_id bigint, payload binary",
    )
    return mm.with_media_columns(df, "doc_id", "payload")


def test_media_metadata_jvm_side(spark):
    rows = {r.doc_id: r for r in _payloads(spark).collect()}
    assert rows[1].media_meta.n_bytes == len(b"\x89PNG fake image bytes")
    assert len(rows[1].media_meta.content_digest) == 32
    assert rows[2].media_meta.n_bytes == 19 * 10


def test_decode_stub_raises_without_fake(spark):
    with pytest.raises(Exception) as exc:
        mm.decode_media_batch(_payloads(spark), fake=False).collect()
    assert "NotImplementedError" in str(exc.value) or "real media decoding" in str(
        exc.value
    )


def test_fake_decode_deterministic(spark):
    a = {r.doc_id: (r.width, r.height, r.n_frames) for r in mm.decode_media_batch(_payloads(spark), fake=True).collect()}
    b = {r.doc_id: (r.width, r.height, r.n_frames) for r in mm.decode_media_batch(_payloads(spark).repartition(5), fake=True).collect()}
    assert a == b  # partition-independent
    assert all(w >= 64 and h >= 64 for (w, h, _) in a.values())


def test_frame_sample_plan(spark):
    decoded = mm.decode_media_batch(_payloads(spark), fake=True)
    frames = mm.frame_sample_plan(decoded, every_n=30)
    per_doc = (
        frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    )
    meta = {r.doc_id: r.n_frames for r in decoded.collect()}
    for r in per_doc:
        expected = (meta[r.doc_id] - 1) // 30 + 1
        assert r.n == expected


def test_audio_chunk_plan_boundaries(spark):
    from ig_etl_with_user_reports_2024_spark.operators.multimodal import (
        audio_chunk_plan,
    )

    decoded = spark.createDataFrame(
        [
            (1, 16000, 16000 * 10),      # 10s @ 16k: starts 0,4,8s
            (2, 8000, 8000 * 3),         # 3s @ 8k: one full-ish chunk
            (3, 8000, 8000),             # exactly 1s: single truncated chunk
        ],
        "doc_id bigint, sample_rate bigint, n_samples bigint",
    )
    out = audio_chunk_plan(decoded, chunk_seconds=5, hop_seconds=4)
    rows = {(r.doc_id, r.chunk_idx): (r.start_sample, r.end_sample) for r in out.collect()}
    assert rows[(1, 0)] == (0, 16000 * 5)
    assert rows[(1, 1)] == (16000 * 4, 16000 * 9)
    assert rows[(1, 2)] == (16000 * 8, 16000 * 10)  # tail clipped
    assert (1, 3) not in rows  # start 12s < 10s duration fails → no chunk
    assert rows[(2, 0)] == (0, 8000 * 3)
    assert rows[(3, 0)] == (0, 8000)
    # every chunk is non-empty and inside the clip
    for (_, _), (s, e) in rows.items():
        assert 0 <= s < e


def test_audio_chunk_plan_zero_length_clip_yields_no_chunks(spark):
    from ig_etl_with_user_reports_2024_spark.operators.multimodal import (
        audio_chunk_plan,
    )

    decoded = spark.createDataFrame(
        [(1, 16000, 0), (2, 16000, 16000)],
        "doc_id bigint, sample_rate bigint, n_samples bigint",
    )
    out = audio_chunk_plan(decoded).collect()
    assert {r.doc_id for r in out} == {2}


def test_decode_chains_into_audio_chunks(spark):
    # the documented decode -> chunk composition must RESOLVE: the fake
    # decode now emits n_samples (review finding: DECODED_SCHEMA ended
    # at sample_rate, so this raised UNRESOLVED_COLUMN)
    decoded = mm.decode_media_batch(_payloads(spark), fake=True)
    chunks = mm.audio_chunk_plan(decoded)
    rows = chunks.collect()
    assert len(rows) > 0
    meta = {r.doc_id: (r.sample_rate, r.n_samples) for r in decoded.collect()}
    for r in rows:
        rate, n = meta[r.doc_id]
        assert 0 <= r.start_sample < n
        assert r.end_sample <= n


def test_frame_sample_plan_skips_frameless_items(spark):
    # n_frames = 0 (audio-only media from a real decoder) must yield NO
    # sampled frames, not a phantom frame_idx=0
    decoded = spark.createDataFrame(
        [(1, 61), (2, 0), (3, None)],
        "doc_id bigint, n_frames int",
    )
    got = {
        r.doc_id: r.frame_idx
        for r in mm.frame_sample_plan(decoded, every_n=30).collect()
    }
    assert 2 not in got and 3 not in got
    assert 1 in got
