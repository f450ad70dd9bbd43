"""Streaming-surface tests: readStream parity with batch, session
windows, watermarked append mode."""

from __future__ import annotations

from pyspark.sql import functions as F

from ig_etl_with_user_reports_2024_spark.sources.readers import load_table
from ig_etl_with_user_reports_2024_spark.streaming.events import (
    session_agg,
    streaming_tumbling_counts,
    tumbling_window_agg,
)


def test_streaming_equals_batch_tumbling(spark, sf_smoke):
    batch = tumbling_window_agg(load_table(spark, sf_smoke, "events"))
    stream = streaming_tumbling_counts(spark, f"{sf_smoke}/events.parquet")
    b = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in batch.collect()
    }
    s = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in stream.collect()
    }
    assert b == s


def test_session_window_streaming_matches_batch_session_count(spark, sf_smoke):
    events = load_table(spark, sf_smoke, "events")
    batch_sessions = session_agg(events, gap_minutes=30).count()
    # streaming-native form: session_window on the same data (batch
    # execution of the same expression — session_window works in both)
    sw = (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n"))
        .count()
    )
    assert sw == batch_sessions


def test_watermarked_append_stream_runs(spark, sf_smoke):
    # append-mode with watermark: the canonical late-data pipeline shape
    schema = spark.read.parquet(f"{sf_smoke}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_smoke)
    )
    ts_type = dict(stream.dtypes)["ts"]
    if ts_type == "bigint":
        # raw int64 nanos (pre-r4 driver testdata under the legacy conf)
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_type == "timestamp_ntz":
        # micros NTZ (r4+ driver testdata): watermark requires TIMESTAMP
        # (LTZ) — UTC session makes the instant identical
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_append_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode emits only watermark-closed windows; all but the final
    # window must be present
    n = spark.table("wm_append_test").count()
    assert n > 0


def test_stateful_sessionize_state_carries_across_batches(spark, sf_smoke, tmp_path):
    """Split events into two time-ordered files → two micro-batches; the
    open session at the batch-1 boundary must merge with batch-2 events
    (state carryover), and the emitted closed-session set must be
    identical to the single-batch run."""
    from ig_etl_with_user_reports_2024_spark.streaming.stateful import (
        stateful_sessionize_stream,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # ts arrives as raw int64 nanos (pre-r4 testdata) or micros NTZ
    # (r4+); split on a numeric image of ts so both encodings work
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        tsn = F.col("ts")
    else:
        tsn = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = ev.withColumn("_tsn", tsn)
    cut = ev.selectExpr("percentile_cont(0.5) WITHIN GROUP (ORDER BY _tsn) AS m")
    mid = cut.collect()[0].m
    d = tmp_path / "split"
    d.mkdir()
    (ev.filter(F.col("_tsn") <= mid).drop("_tsn")
        .coalesce(1).write.parquet(str(d / "a_first")))
    (ev.filter(F.col("_tsn") > mid).drop("_tsn")
        .coalesce(1).write.parquet(str(d / "b_second")))
    # flatten: one parquet file per half, lexicographic = time order
    import glob as _glob
    import shutil

    for sub in ("a_first", "b_second"):
        [part] = _glob.glob(str(d / sub / "part-*.parquet"))
        shutil.move(part, str(d / f"{sub}.parquet"))
        shutil.rmtree(str(d / sub))

    def rows(df):
        return {
            (r.user_id, r.session_id, r.session_start, r.session_end,
             r.n_events, r.total_value)
            for r in df.collect()
        }

    two_batch = rows(
        stateful_sessionize_stream(
            spark, str(d / "a_first.parquet"), glob="*.parquet",
            max_files_per_trigger=1,
        )
    )
    one_batch = rows(
        stateful_sessionize_stream(spark, f"{sf_smoke}/events.parquet")
    )
    assert two_batch == one_batch and len(one_batch) > 0


def test_stateful_sessionizer_null_value_contributes_zero(spark, tmp_path):
    # a NULL value row must count as an event but add 0 to the total —
    # the batch SUM/COUNT(*) semantics. Before the NaN mask,
    # np.rint(NaN).astype(int64) injected INT64_MIN into the total.
    import datetime as dt

    from ig_etl_with_user_reports_2024_spark.streaming.stateful import (
        stateful_sessionize_stream,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base, 1, "click", 2.50, "{}"),
        (2, base + dt.timedelta(minutes=1), 1, "click", None, "{}"),
        (3, base + dt.timedelta(minutes=2), 1, "click", 1.25, "{}"),
        # a second session far later closes the first one so it emits
        (4, base + dt.timedelta(hours=5), 1, "click", 9.0, "{}"),
    ]
    d = tmp_path / "nullval"
    d.mkdir()
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    out = stateful_sessionize_stream(
        spark, str(d / "events.parquet"), gap_minutes=30
    ).collect()
    [first] = [r for r in out if r.n_events == 3]
    assert first.total_value == 3.75  # 2.50 + 0 + 1.25 (exact cents math)


def test_stateful_sessionize_directory_layout_with_glob(spark, tmp_path):
    # a directory dataset + explicit glob must watch the DIRECTORY, not
    # its parent (which would stream sibling tables' part files)
    import datetime as dt

    from ig_etl_with_user_reports_2024_spark.streaming.stateful import (
        stateful_sessionize_stream,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    d = tmp_path / "dirglob"
    d.mkdir()
    spark.createDataFrame(
        [(1, base, 1, "click", 1.0, "{}"),
         (2, base + dt.timedelta(hours=5), 1, "click", 2.0, "{}")],
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    ).write.parquet(str(d / "events.parquet"))
    # a sibling dataset whose part files the old parent-watch would match
    spark.createDataFrame([(99,)], "x bigint").write.parquet(
        str(d / "other.parquet")
    )
    out = stateful_sessionize_stream(
        spark, str(d / "events.parquet"), gap_minutes=30, glob="*.parquet"
    ).collect()
    assert len(out) >= 1
    assert all(r.user_id == 1 for r in out)


def test_st11_rocksdb_matches_st6_and_restores_conf(spark, sf_oracle):
    """The RocksDB-provider dedup must produce the identical surviving
    key set as the default provider over the same input, and the
    provider conf must be restored after the run (it is scoped to the
    one query, not the session)."""
    import __spark_entry__ as em

    key = "spark.sql.streaming.stateStore.providerClass"
    before = spark.conf.get(key, None)
    qs = em.queries()
    st6 = {tuple(r) for r in qs["st6_streaming_dedup"](spark, sf_oracle).collect()}
    st11 = {tuple(r) for r in qs["st11_rocksdb_dedup"](spark, sf_oracle).collect()}
    assert st11 == st6
    assert spark.conf.get(key, None) == before


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def test_st12_streaming_admission_semantics(spark, tmp_path):
    """Greedy band-first-owner admission: exact twins collapse to the
    lowest doc_id; distinct texts stay admitted; shingle-less and
    NULL-text docs are admitted with owned_bands = 0."""
    from ig_etl_with_user_reports_2024_spark.streaming.events import (
        streaming_minhash_admission,
    )

    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different words composed for another document here"
    rows = [
        (1, a),
        (2, a),            # exact twin of 1 -> rejected
        (3, b),
        (4, "too short"),  # < 3 words: no shingles -> admitted, 0 bands
        (5, None),         # NULL text -> admitted, 0 bands
    ]
    d = str(tmp_path / "docs")
    _write_docs(spark, d, rows)
    out = {r.doc: (r.admitted, r.owned_bands) for r in
           streaming_minhash_admission(spark, d).collect()}
    assert out[1] == (True, 4)
    assert out[2] == (False, 0)   # loses every band to doc 1
    assert out[3] == (True, 4)
    assert out[4] == (True, 0)
    assert out[5] == (True, 0)


def test_st12_state_carries_across_micro_batches(spark, tmp_path):
    """The signature fold must converge to the same admission set when
    the stream is chopped into per-file micro-batches (state carries
    across batches; min-fold is order-insensitive)."""
    from ig_etl_with_user_reports_2024_spark.streaming import events as ev

    a = "one shared duplicate text that is certainly long enough to shingle"
    d = str(tmp_path / "docs")
    # two files -> two micro-batches under maxFilesPerTrigger=1; the
    # twin of doc 1 arrives in the SECOND batch
    _write_docs(spark, d + "/f1", [(1, a), (3, "some unrelated filler text here")])
    _write_docs(spark, d + "/f2", [(2, a)])
    import shutil, os
    merged = str(tmp_path / "merged")
    os.makedirs(merged)
    for i, src in enumerate([d + "/f1", d + "/f2"]):
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src, f), os.path.join(merged, f"part-{i}.parquet"))
    old = dict(ev.STREAM_OPTIONS)
    ev.STREAM_OPTIONS["maxFilesPerTrigger"] = "1"
    try:
        out = {r.doc: r.admitted for r in
               ev.streaming_minhash_admission(spark, merged).collect()}
    finally:
        ev.STREAM_OPTIONS.clear()
        ev.STREAM_OPTIONS.update(old)
    assert out == {1: True, 2: False, 3: True}
