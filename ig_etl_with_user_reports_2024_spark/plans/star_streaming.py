"""Streaming-surface queries over the events table (SURVEY.md §2.10 +
beyond-reference Structured Streaming coverage).

The batch window/session aggregations are the oracle-checkable
contracts; st4 runs the genuine ``readStream`` pipeline and is checked
against the SAME SQL oracle (complete-mode end-of-stream results equal
the batch aggregation).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import sql_lsum
from ..sources.readers import load_table
from ..streaming.events import (
    session_agg,
    sliding_window_agg,
    streaming_tumbling_counts,
    tumbling_window_agg,
)
from .registry import query

_TUMBLING_ORACLE = f"""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_lsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
"""


# st3/st4 are registered FIRST: they had no driver verdict in round 1
# (budget exhausted mid-module) — registration order is the driver's run
# order, so the not-yet-verified queries must come before the green ones.


@query(
    "st3_sessionization",
    f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessions AS (
        SELECT user_id, ts, value,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           {sql_lsum('value')} AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def st3_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap (lag + running sum);
    the streaming twin (session_window) is exercised in tests."""
    return session_agg(load_table(spark, sf_dir, "events"), gap_minutes=30)


@query(
    "st5_stateful_sessions",
    f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessions AS (
        SELECT user_id, ts, value,
               CAST(SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM flagged
    ), agg AS (
        SELECT user_id, session_id,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               {sql_lsum('value')} AS total_value
        FROM sessions
        GROUP BY user_id, session_id
    )
    SELECT * FROM agg
    QUALIFY session_id < MAX(session_id) OVER (PARTITION BY user_id)
    """,
    eager=True,  # readStream → awaitTermination at construction
)
def st5_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming: sessionization via
    ``applyInPandasWithState`` (readStream → per-user open-session state
    → append-mode emission at session close). Emission-at-close makes
    the end-of-stream output batch-split-invariant — every session but
    each user's last — so this STATEFUL STREAMING query is hash-checked
    against plain SQL (st3's session CTE + a QUALIFY)."""
    from ..streaming.stateful import stateful_sessionize_stream

    return stateful_sessionize_stream(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        gap_minutes=30,
        # sized to the testdata key space (150 users); see the sizing
        # note in streaming/stateful.py
        state_partitions=8,
    )


@query(
    "st7_session_window",
    f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           {sql_lsum('value')} AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def st7_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-NATIVE sessionization: ``F.session_window(ts, gap)`` — the
    same operator Structured Streaming uses for streaming session aggs,
    here hash-checked in batch against the window-algebra formulation.
    One semantic edge vs st3: session_window's end bound is EXCLUSIVE
    (an event exactly gap after the last does NOT merge), so the oracle
    breaks sessions at ``gap >= 1800`` where st3 uses ``> 1800``; the
    emitted session_end is last_event + gap, per the operator's
    contract. Having both st3 (portable window algebra) and st7 (native
    operator) documents the boundary choice instead of hiding it."""
    from ..functions.exact import lsum

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            lsum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query("st4_streaming_tumbling", _TUMBLING_ORACLE, eager=True)
def st4_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The genuine readStream pipeline (parquet source → window agg →
    memory sink, AvailableNow): hash-checked against the SAME SQL oracle
    as st1, proving streaming/batch result parity."""
    return streaming_tumbling_counts(
        spark, os.path.join(sf_dir, "events.parquet")
    )


@query("st1_tumbling_window", _TUMBLING_ORACLE)
def st1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute event-time windows (count + exact sum).

    Spark ``window()`` aligns to the epoch exactly like DuckDB
    ``time_bucket``; the same expression runs unchanged under
    readStream (st4).
    """
    return tumbling_window_agg(load_table(spark, sf_dir, "events"))


@query(
    "st2_sliding_window",
    f"""
    WITH starts AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS b, ts, value
        FROM events
    ), expanded AS (
        SELECT b AS window_start, ts, value FROM starts
        UNION ALL
        SELECT b - INTERVAL '5 minutes' AS window_start, ts, value FROM starts
    )
    SELECT window_start, COUNT(*) AS n_events, {sql_lsum('value')} AS total_value
    FROM expanded
    GROUP BY window_start
    """,
)
def st2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min wide, 5 min slide) — each event lands in
    exactly two windows; the oracle expands the two containing starts."""
    return sliding_window_agg(load_table(spark, sf_dir, "events"))


_ST6_SQL = """
    SELECT DISTINCT user_id, event_type,
           time_bucket(INTERVAL '5 minutes', ts) AS window_start
    FROM events
    """


@query(
    "st6_streaming_dedup",
    _ST6_SQL,
    eager=True,  # awaitTermination at construction (eager-flag sweep, r8)
)
def st6_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: watermark + dropDuplicates on
    (user, type, 5-min window) under readStream — the surviving key set
    equals batch SELECT DISTINCT (hash-checked); the watermark is what
    bounds dedup state on an unbounded stream."""
    from ..streaming.events import streaming_dedup_keys

    return streaming_dedup_keys(spark, os.path.join(sf_dir, "events.parquet"))


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@query(
    "st11_rocksdb_dedup",
    _ST6_SQL,
    eager=True,  # awaitTermination at construction
)
def st11_rocksdb_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st6's exactly-once dedup contract executed on the ROCKSDB
    state-store provider — the documented 100 TB production default
    (state off-heap/on-disk with incremental checkpoints, so state
    size is bounded by disk, not executor heap). SCALE_r08.md's probe
    demonstrated the provider works in this harness; this entry makes
    it DRIVER-VISIBLE: the same batch-DISTINCT oracle hash-checks the
    surviving key set, so a provider-level state corruption (lost or
    duplicated dedup keys) flips a verdict every round instead of
    living only in a probe table.

    The provider conf is read at STREAM START, so setting it around
    the AvailableNow run (and restoring after awaitTermination — the
    run completes inside the call) scopes it to this query; st6 keeps
    the default HDFSBacked provider, making the pair a standing
    A/B of the two state backends over identical input."""
    from ..streaming.events import streaming_dedup_keys

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, _ROCKSDB_PROVIDER)
    try:
        return streaming_dedup_keys(
            spark, os.path.join(sf_dir, "events.parquet")
        )
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def _st12_sql() -> str:
    """Oracle for st12: greedy band-first-owner admission over the
    SAME md5-only band construction the registered dd/dc oracles use
    (operators/dedup.sql_portable_minhash_bands — byte-for-byte
    lockstep with the Spark builder), so the streaming signature fold
    is checked against a plain batch SQL derivation."""
    from ..operators.dedup import sql_portable_minhash_bands

    return f"""
    WITH {sql_portable_minhash_bands("documents", "doc_id", "text", 16, 4)},
    first AS (
        SELECT band, bucket, MIN(doc) AS owner
        FROM bands GROUP BY band, bucket
    ),
    own AS (
        SELECT b.doc,
               BOOL_AND(f.owner = b.doc) AS adm,
               SUM(CASE WHEN f.owner = b.doc THEN 1 ELSE 0 END) AS owned
        FROM bands b
        JOIN first f ON b.band = f.band AND b.bucket = f.bucket
        GROUP BY b.doc
    )
    SELECT d.doc_id AS doc,
           COALESCE(o.adm, TRUE) AS admitted,
           CAST(COALESCE(o.owned, 0) AS BIGINT) AS owned_bands
    FROM documents d LEFT JOIN own o ON d.doc_id = o.doc
    """


@query(
    "st12_streaming_band_admission",
    _st12_sql(),
    eager=True,  # awaitTermination at construction
)
def st12_streaming_band_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup ADMISSION: the MinHash signature store
    maintained as ONE update-mode stateful aggregation over a document
    stream, then greedy band-first-owner admission — the ingest-path
    dedup gate (each arriving doc admitted/rejected without
    re-clustering the corpus). Full semantics, the idempotent-fold
    argument, the deliberate band-grain-vs-CC divergence, and the
    RocksDB state-store scale story live on
    streaming/events.streaming_minhash_admission. Hash-checked: the
    admission set equals the batch SQL derivation because min-folds
    are order-insensitive over the whole stream."""
    from ..streaming.events import streaming_minhash_admission

    return streaming_minhash_admission(
        spark, os.path.join(sf_dir, "documents.parquet")
    )


@query(
    "ro1_hourly_rollup",
    f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_lsum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ro1_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup cascade: the hourly aggregate is re-aggregated FROM the
    5-minute partials, never from the raw events — the continuous-
    aggregate pattern that makes multi-resolution dashboards O(partials)
    instead of O(events) at 100 TB. Exactness survives because the
    partials carry scaled-long CENTS (integer domain); re-summing the
    divided doubles would drift. Hash-checked against the DIRECT hourly
    aggregation over raw events — proving partial-reaggregation parity."""
    events = load_table(spark, sf_dir, "events")
    partials = events.groupBy(
        F.window("ts", "5 minutes").alias("win"), "event_type"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.rint(F.col("value") * 100).cast("long")).alias("cents"),
    )
    return partials.groupBy(
        F.date_trunc("hour", F.col("win.start")).alias("hour_start"),
        F.col("event_type"),
    ).agg(
        F.sum("n").alias("n_events"),
        (F.sum("cents") / 100.0).alias("total_value"),
    )


@query(
    "st8_stream_static_join",
    """
    SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    eager=True,
)
def st8_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join under real readStream: events ⋈
    customer dim, append mode, ZERO streaming state (the join is
    stateless — the property that makes dim enrichment free on an
    unbounded stream). Hash-checked against the plain batch JOIN —
    streaming/batch parity for the join operator, as st4 proves it for
    window aggregation."""
    from ..streaming.events import streaming_static_join

    return streaming_static_join(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(sf_dir, "customer.parquet"),
    )


@query(
    "st10_streaming_upsert",
    """
    SELECT user_id, ts AS last_ts, event_id AS last_event_id,
           event_type AS last_type, value AS last_value
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id
            ORDER BY ts DESC, event_id DESC, event_type DESC, value DESC
        ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    eager=True,
)
def st10_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming upsert view under real readStream: the current
    last-writer-wins row per user (latest ts, highest event_id on
    ties) — cdc1's reduction as continuous materialized-view
    maintenance, state bounded by key cardinality. Hash-checked
    against the batch argmax — streaming/batch parity for the upsert
    operator, as st4 proves it for windows and st8 for joins.

    Both sides are TOTAL orders: the streaming side's
    ``max(struct(ts, event_id, event_type, value))`` breaks exact
    (ts, event_id) ties on event_type then value, and the oracle's
    row_number ORDER BY lists the same four keys — so a duplicate-
    event replay (two rows sharing (user_id, ts, event_id)) picks the
    same winner in both engines instead of a nondeterministic one."""
    from ..streaming.events import streaming_last_writer_wins

    return streaming_last_writer_wins(
        spark, os.path.join(sf_dir, "events.parquet")
    )


@query(
    "st9_stream_stream_join",
    """
    WITH c AS (
        SELECT event_id AS click_id, user_id, ts FROM events
        WHERE event_type = 'click'
    ), p AS (
        SELECT event_id AS purchase_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.click_id, p.purchase_id
    FROM c JOIN p ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '10 minutes'
    """,
    eager=True,
)
def st9_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval self-join (clicks ⋈ purchases within 10
    minutes per user) with watermarked, range-bounded state on BOTH
    sides — the attribution join of the rj/aj temporal family run as a
    genuine two-stream join. Hash-checked against the batch inequality
    join: every (click, purchase) pair the batch plan finds, the
    streaming plan emits, and the watermark+range bound is what lets
    state age out on an unbounded feed."""
    from ..streaming.events import streaming_interval_join

    return streaming_interval_join(
        spark, os.path.join(sf_dir, "events.parquet")
    )


def _st13_oracle() -> str:
    """st13 hash-checks against dq4's registered SQL VERBATIM — the
    st4/st1 stream-batch parity convention: the entry's value is the
    streaming plan, the result is dq4's."""
    from .registry import QUERIES

    return QUERIES["dq4_batch_expectation_drift"].oracle


@query(
    "st13_streaming_expectation_drift",
    None,  # rebound below from dq4's registered oracle (import order:
    # star_layout registers dq4 before this module loads)
    eager=True,  # awaitTermination at construction
)
def st13_streaming_expectation_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dq4's ingest-gate alarm as the STREAMING job a 100 TB pipeline
    actually deploys (the dq arc's last surface: dq3 validates the
    corpus, dq4 the batch, dq5 the release — st13 is dq4 running where
    ingest happens): readStream over the events parquet → the
    IDENTICAL expectation suite over the IDENTICAL nearest-second
    batch key (both shared from star_layout — DQ4_BATCH_EXPR /
    dq4_expectation_preds, one definition each) compiled into ONE
    streaming grouped aggregation under AvailableNow → memory sink →
    the shared profiling.batch_drift tail (dq4's own). Hash-checked
    against dq4's registered SQL verbatim, proving stream/batch
    result parity for the whole contract-validation path (the st4/st1
    convention).

    State shape: the streaming store holds |batches| × |suite|
    counters — metadata regardless of event volume (the cheapest
    stateful query in the family; state_partitions=2 because the key
    space is 2). A production gate runs the same plan in update mode
    and pages on drift_alarm per micro-batch."""
    from ..streaming.events import streaming_expectation_profile
    from .star_layout import (
        _DQ4_ALARM_MILLI,
        DQ4_BATCH_EXPR,
        dq4_expectation_preds,
    )
    from ..operators import profiling

    prof = streaming_expectation_profile(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        DQ4_BATCH_EXPR,
        dq4_expectation_preds(),
    )
    # the drift tail self-joins the profile; a memory-sink view reuses
    # the same expression IDs on both join sides (INTERNAL_ERROR:
    # conflicting references) — break lineage first. |batches|×|suite|
    # rows: metadata.
    return profiling.batch_drift(prof.localCheckpoint(), _DQ4_ALARM_MILLI)


def _bind_st13_oracle() -> None:
    # importing star_layout (not just reading QUERIES) keeps THIS
    # module importable standalone — without it, dq4 is only
    # registered when __spark_entry__'s import order ran first
    # (review finding r13)
    from . import star_layout  # noqa: F401
    from .registry import QUERIES

    QUERIES["st13_streaming_expectation_drift"].oracle = _st13_oracle()


_bind_st13_oracle()
