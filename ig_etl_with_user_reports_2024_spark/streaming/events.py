"""Structured Streaming surface over the events table.

The reference has no true streaming — its closest artifact is the
incremental work-queue (SURVEY.md §2.10) — so this module is
beyond-reference (BASELINE.json north star): event-time tumbling and
sliding windows, session windows, and a real ``readStream`` pipeline.

Batch and streaming share the same aggregation expressions: Spark's
``window()``/``session_window()`` functions evaluate identically under
``spark.read`` and ``spark.readStream``, so the batch forms are the
DuckDB-oracle-checkable contract and the streaming form is verified to
produce the same rows (tests/test_streaming.py).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import lsum


def tumbling_window_agg(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Event-time tumbling window: count + exact sum(value) per
    (window, event_type). Windows align to the epoch, matching DuckDB's
    ``time_bucket``."""
    w = F.window("ts", width)
    return (
        events.groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), lsum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Sliding event-time windows (each event lands in width/slide
    windows); count + exact sum per window."""
    w = F.window("ts", width, slide)
    return (
        events.groupBy(w.alias("win"))
        .agg(F.count("*").alias("n_events"), lsum("value").alias("total_value"))
        .select(F.col("win.start").alias("window_start"), "n_events", "total_value")
    )


def session_agg(
    events: DataFrame, gap_minutes: int = 30, user_col: str = "user_id"
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. lag + running conditional sum
    — the classic two-window plan, one shuffle on the user key.

    The streaming twin is ``session_window(ts, gap)`` (see
    streaming_session_counts in tests); this batch form is the
    oracle-checkable contract.
    """
    order = Window.partitionBy(user_col).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_s = gap_minutes * 60
    prev_ts = F.lag(F.col("ts")).over(order)
    new_session = F.when(
        prev_ts.isNull()
        | (
            F.col("ts").cast("timestamp").cast("double")
            - prev_ts.cast("timestamp").cast("double")
            > gap_s
        ),
        1,
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sess = events.select(
        user_col, "ts", "event_id", "value", new_session.alias("is_new")
    ).withColumn("session_id", F.sum("is_new").over(running))
    return with_sess.groupBy(user_col, "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        lsum("value").alias("total_value"),
    )


_SINK_NAMES: list[str] = []
_MAX_SINKS = 8

# Observational: the final micro-batch's state-store metrics
# (stateOperators: numRowsTotal / memoryUsedBytes / …) keyed by the
# run's FULL unique sink name, so scale probes can report state GROWTH
# vs stream growth without re-instrumenting every query
# (VERDICT r6 "Next round" #5). AvailableNow runs are finished before
# the capture reads recentProgress — no race with a live query.
# FIFO-capped alongside _SINK_NAMES so bench loops don't accumulate
# every past run's metrics (insertion-ordered dict → oldest first).
LAST_STATE_METRICS: dict[str, list] = {}
_MAX_STATE_METRICS = 2 * _MAX_SINKS


def _run_to_memory_sink(
    spark: SparkSession,
    df: DataFrame,
    prefix: str,
    output_mode: str,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Start an AvailableNow memory-sink query and return the result.

    CONTRACT: consume (collect/convert) the returned DataFrame BEFORE
    starting more streaming runs. It is a lazy view over a FIFO-capped
    in-memory sink table: after ``_MAX_SINKS`` further runs the backing
    temp view is dropped and any still-held handle fails with
    TABLE_OR_VIEW_NOT_FOUND on its next action. All in-repo callers
    collect immediately; hold a `.localCheckpoint()` copy if you need
    the result to outlive the cap.

    Streaming state parallelism = shuffle partitions at stream start,
    and every state partition costs a store instance per micro-batch —
    size it to the aggregation KEY SPACE, not the session's scan width
    (at test scale, 32 stores over ~10k keys measured 3.5x pure
    overhead). Raise with key cardinality at 100 TB.
    """
    # each run registers an in-memory table holding the full result;
    # FIFO-cap them (same bounded single-threaded contract as
    # operators/dedup.pin_bounded) so bench loops / scale sweeps don't
    # accumulate every past result set in driver memory. Handles older
    # than the cap become invalid — callers here collect immediately.
    name = prefix + next(tempfile._get_candidate_names())
    while len(_SINK_NAMES) >= _MAX_SINKS:
        spark.catalog.dropTempView(_SINK_NAMES.pop(0))
    _SINK_NAMES.append(name)
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # keyed by the FULL unique sink name (counter-suffixed), never
        # the rstrip'd prefix: two queries sharing a prefix family, or
        # concurrent runs in one session, must not overwrite each
        # other's metrics — the state probe's identity-based change
        # detection depends on each run landing under a fresh key
        # (ADVICE r7).
        try:
            progs = [
                p for p in q.recentProgress if p and p.get("stateOperators")
            ]
            LAST_STATE_METRICS[name] = (
                progs[-1]["stateOperators"] if progs else []
            )
        except Exception:  # noqa: BLE001 — metrics capture is best-effort
            LAST_STATE_METRICS[name] = []
        while len(LAST_STATE_METRICS) > _MAX_STATE_METRICS:
            LAST_STATE_METRICS.pop(next(iter(LAST_STATE_METRICS)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    return spark.table(name)


def streaming_tumbling_counts(
    spark: SparkSession, events_path: str, width: str = "5 minutes"
) -> DataFrame:
    """The REAL streaming path: readStream over the events parquet →
    tumbling-window aggregation → memory sink, run to completion with
    Trigger.AvailableNow semantics (complete output mode so every window
    is emitted at end-of-stream).

    Returns the materialized result — identical rows to
    ``tumbling_window_agg`` on the same data, which is how the driver's
    oracle can check a streaming query with plain SQL.
    """
    agg = tumbling_window_agg(_events_stream(spark, events_path), width)
    return _run_to_memory_sink(spark, agg, "tumbling_", "complete")


def streaming_dedup_keys(
    spark: SparkSession, events_path: str, width: str = "5 minutes"
) -> DataFrame:
    """Streaming exactly-once dedup: ``withWatermark`` +
    ``dropDuplicates`` on (user_id, event_type, window-bucket) over
    readStream, run to completion with AvailableNow.

    Only the dedup KEYS are emitted — which carried row survives a
    streaming dedup is arrival-order-dependent, the surviving key set is
    not, so the key set is the oracle-checkable contract (plain
    SELECT DISTINCT). The watermark bounds the dedup state: keys older
    than the watermark age out instead of accumulating forever — the
    property that keeps this runnable on an unbounded 100 TB stream.
    """
    stream = _events_stream(spark, events_path)
    # epoch-aligned bucket as a plain TIMESTAMP column: the watermark
    # must ride an event-time column that is itself part of the dedup
    # key, or the dedup state never ages out
    um = F.unix_micros(F.col("ts").cast("timestamp"))
    # derive the bucket arithmetic from the parameter (an assert would
    # vanish under python -O and silently dedup on the wrong width)
    n, unit = width.split()
    width_us = int(n) * {"minutes": 60, "minute": 60, "seconds": 1,
                         "second": 1, "hours": 3600, "hour": 3600}[unit] * 1_000_000
    deduped = (
        stream.withColumn(
            "window_start", F.timestamp_micros(um - F.pmod(um, F.lit(width_us)))
        )
        .withWatermark("window_start", "30 minutes")
        .dropDuplicates(["user_id", "event_type", "window_start"])
        .select(
            "user_id",
            "event_type",
            F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        )
    )
    return _run_to_memory_sink(spark, deduped, "dedup_", "append")


# Extra file-source options applied by _events_stream — empty in
# normal operation. Probes set e.g. {"maxFilesPerTrigger": "1"} so an
# AvailableNow run processes chunk files as SEPARATE micro-batches and
# the watermark actually advances between them (one big batch never
# purges state mid-run, so purge behavior would be unobservable).
STREAM_OPTIONS: dict[str, str] = {}


def _events_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """readStream over the events parquet — the shared source block of
    the streaming family, handling BOTH layouts: a single file (the
    driver's testdata: watch the parent dir, glob-filter to the one
    file) and a directory of part files (any real written dataset:
    watch the directory itself — a glob filter on the directory NAME
    would match no part file and silently stream zero rows, the bug the
    8× replicated layout exposed)."""
    import os

    # legacy nanos events.parquet needs this BEFORE the schema probe;
    # harmless for micros layouts — callers no longer each set it
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_df = spark.read.parquet(events_path)
    if os.path.isdir(events_path):
        reader = spark.readStream.schema(batch_df.schema)
        for k, v in STREAM_OPTIONS.items():
            reader = reader.option(k, v)
        stream = reader.parquet(events_path)
    else:
        reader = spark.readStream.schema(batch_df.schema).option(
            "pathGlobFilter", os.path.basename(events_path)
        )
        for k, v in STREAM_OPTIONS.items():
            reader = reader.option(k, v)
        stream = reader.parquet(os.path.dirname(events_path))
    # ts normalization only applies to event-shaped sources; st12
    # streams the documents table through the same helper (no ts).
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return stream


def streaming_static_join(
    spark: SparkSession, events_path: str, customer_path: str
) -> DataFrame:
    """Stream-static join: the event stream enriched with the customer
    dim — the canonical streaming-ETL enrichment step. The static side
    is a plain batch DataFrame re-read per micro-batch (and broadcast
    by AQE when small); the join is STATELESS, so output mode is append
    and no watermark is needed — state cost stays zero no matter how
    long the stream runs. Result rows equal the batch join bit-for-bit
    (the driver's oracle is the plain JOIN SQL)."""
    stream = _events_stream(spark, events_path)
    dim = spark.read.parquet(customer_path).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = stream.join(dim, "user_id").select(
        "event_id", "user_id", "c_mktsegment", "value"
    )
    return _run_to_memory_sink(
        spark, joined, "stjoin_", "append", state_partitions=None
    )


def streaming_interval_join(
    spark: SparkSession,
    events_path: str,
    window_minutes: int = 10,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval self-join: each purchase matched to the
    same user's clicks in the preceding ``window_minutes`` — the
    streaming form of the rj/aj temporal-join family (attribution at
    ingest time).

    Both sides carry a 1-hour watermark and the join predicate bounds
    purchase time to [click, click + window], so Spark can PURGE
    matched/expired state instead of buffering both streams forever —
    the requirement for running this on an unbounded feed. Inner joins
    emit eagerly on match, so AvailableNow materializes the complete
    result; rows equal the batch inequality join (the oracle).

    ASSUMPTION for the batch-parity claim: event time may arrive out
    of order by at most ``watermark_delay`` across micro-batches. A
    directory source whose part files disorder event time by MORE than
    the delay (e.g. per-day files replayed out of order) would purge
    state early and silently drop click/purchase pairs relative to the
    batch oracle — raise ``watermark_delay`` toward the source's
    cross-file event-time span in that layout (state cost grows with
    the delay; batch-parity tests in tests/test_streaming.py pin the
    default against the single-file testdata)."""
    stream = _events_stream(spark, events_path)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").cast("timestamp").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark_delay)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark_delay)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts "
            f"AND p_ts <= c_ts + interval {window_minutes} minutes"
        ),
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")
    return _run_to_memory_sink(spark, joined, "ssjoin_", "append")


def streaming_last_writer_wins(
    spark: SparkSession, events_path: str
) -> DataFrame:
    """Streaming UPSERT VIEW: the current row per user maintained from
    the event stream — cdc1's last-writer-wins reduction
    (operators/cdc.py) re-expressed as streaming materialized-view
    maintenance, the streaming×warehouse cross the CDC family was
    missing.

    One ``max(struct(ts, event_id, ...))`` aggregate per key: struct
    ordering compares ts first, then event_id, then event_type, then
    value — a TOTAL order, so even a duplicate-event replay (two rows
    sharing (user_id, ts, event_id)) has one deterministic winner
    under any arrival order, which is what makes the
    AvailableNow complete-mode emission equal the batch argmax oracle
    bit-for-bit. State = ONE small struct per live key (bounded by key
    cardinality, never by stream length — no watermark needed because
    the aggregate itself is the retention policy). At 100 TB the same
    aggregate runs in update mode with the sink applying cdc1's MERGE
    per micro-batch instead of complete-mode re-emission.
    """
    stream = _events_stream(spark, events_path)
    agg = stream.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("last")
    )
    out = agg.select(
        "user_id",
        F.col("last.ts").alias("last_ts"),
        F.col("last.event_id").alias("last_event_id"),
        F.col("last.event_type").alias("last_type"),
        F.col("last.value").alias("last_value"),
    )
    return _run_to_memory_sink(spark, out, "lww_", "complete")


def streaming_minhash_admission(
    spark: SparkSession,
    docs_path: str,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Streaming NEAR-DUP ADMISSION over a document stream: the
    portable-MinHash signature store maintained as an update-mode
    stateful aggregation, then greedy band-first-owner admission —
    the online analogue of the dd10/dd11 keep-lists, for the ingest
    path where documents arrive continuously and each must be admitted
    or rejected without re-clustering the corpus.

    Pipeline: readStream(docs) → stateless shingle explode → ONE
    streaming ``groupBy(doc).agg(min(md5(i:shingle)) …)``
    (operators/dedup.minhash_signature_aggs — min is commutative and
    idempotent, so the per-doc signature state converges to the batch
    signature under any micro-batching AND under at-least-once event
    re-delivery: a replayed document folds to the same mins). The sink
    then takes one batch pass: signatures → band buckets
    (dedup.bands_from_signatures), each (band, bucket) is owned by its
    LOWEST doc_id, and a doc is admitted iff it owns ALL of its bands.

    Admission semantics — deliberately band-grain, not cluster-grain:
    a doc that loses ANY band to a lower id is rejected, and a
    rejected doc's bands still block later docs. This greedy form is
    order-insensitive (min over the whole stream), so it is exactly
    SQL-expressible and hash-checkable, unlike the CC-closure the
    batch keep-lists compute; the two agree on exact twins and on
    well-separated near-dup clusters and diverge only on chains that
    CC would merge transitively (documented, not hidden). Shingle-less
    docs (< 3 words or NULL text) emit no signature and are admitted
    with owned_bands = 0.

    Defaults follow the r9 band tuning (operators/dedup.
    portable_minhash_pairs docstring): (16,4) r=4 — the band store this
    gate maintains must be the SAME banding the batch keep-list (dd11)
    runs, and an UNVERIFIED gate needs r=4's "collision ⇒ likely ≥0.5
    jaccard" (r=2's sub-threshold collisions would false-drop unique
    docs). The price is disclosed: signature state doubles, 8→16 mins
    (512 bytes/doc of hex).

    Scale shape: state = one k×32-char signature per DISTINCT document
    key — this IS the persistent dedup signature store, bounded by
    corpus size, not stream length; at 100 TB it rides the RocksDB
    provider (st11's contract) so the store lives on disk with
    incremental checkpoints. The post-stream admission is one
    map-side-combined groupBy(band, bucket) min + one metadata-width
    band-grain join — candidate volume tracks true duplicate density.

    Returns (doc, admitted, owned_bands), one row per document.
    """
    from ..operators import dedup as dd

    stream = _events_stream(spark, docs_path).select("doc_id", "text")
    sh = dd.exploded_shingles(stream, "doc_id", "text")
    sig = sh.groupBy("doc").agg(*dd.minhash_signature_aggs(num_hashes))
    sink = _run_to_memory_sink(spark, sig, "bandadm_", "update")
    # Final state per doc: fold min across any re-emissions (a doc that
    # spanned micro-batches emits one update row per batch; the last is
    # the complete signature and min-of-all equals it).
    final = sink.groupBy("doc").agg(
        *[F.min(f"m{i}").alias(f"m{i}") for i in range(num_hashes)]
    )
    band_rows = dd.bands_from_signatures(final, num_hashes, bands)
    first = band_rows.groupBy("band", "bucket").agg(
        F.min("doc").alias("owner")
    )
    own = (
        band_rows.join(first, ["band", "bucket"])
        .groupBy("doc")
        .agg(
            F.bool_and(F.col("owner") == F.col("doc")).alias("adm"),
            F.sum(
                F.when(F.col("owner") == F.col("doc"), 1).otherwise(0)
            ).alias("owned"),
        )
    )
    docs = spark.read.parquet(docs_path).select(F.col("doc_id").alias("doc"))
    return docs.join(own, "doc", "left").select(
        "doc",
        F.coalesce(F.col("adm"), F.lit(True)).alias("admitted"),
        F.coalesce(F.col("owned"), F.lit(0)).cast("bigint").alias("owned_bands"),
    )


def streaming_expectation_profile(
    spark: SparkSession,
    events_path: str,
    batch_expr: str,
    expectations: list,
) -> DataFrame:
    """st13's streaming half: readStream over the events parquet →
    dq4's per-batch expectation suite as ONE streaming grouped
    aggregation (profiling.expectation_counts' group_by compiles the
    whole suite into a single agg over groupBy(batch) — two state rows
    total, the cheapest stateful query in the family) → memory sink
    under AvailableNow, complete mode. The struct-array unpivot rides
    AFTER the aggregation (project + generate on the aggregated rows —
    streaming-legal in complete mode, no second aggregation).

    Returns the materialized (batch, table_name, expectation, n_rows,
    n_violations, passed) profile — identical rows to the batch
    expectation_counts on the same data, which is what lets st13's
    drift output hash-check against dq4's registered SQL (the st4/st1
    stream-batch parity convention). State shape at 100 TB: the store
    holds |batches| × |suite| counters — metadata, regardless of
    event volume; a production gate runs the same plan in update mode
    per micro-batch."""
    from ..operators.profiling import expectation_counts

    stream = _events_stream(spark, events_path).withColumn(
        "batch", F.expr(batch_expr)
    )
    prof = expectation_counts(stream, "events", expectations, group_by="batch")
    # 2-row aggregate → 2 state partitions is already generous
    return _run_to_memory_sink(
        spark, prof, "expectprof_", "complete", state_partitions=2
    )
