"""Custom stateful streaming operator: sessionization via
``applyInPandasWithState`` (SURVEY.md §2.10 / Structured Streaming
north star).

``session_window`` covers the built-in case; this is the pattern for
session semantics the built-in can't express (custom gap logic,
per-session exact accumulators, session numbering). State per user:
the one open session (start/end micros, event count, exact value cents,
1-based session number). Each micro-batch merges its rows in event-time
order, EMITS every session it closes, and keeps the open one in state.

Emission-at-close makes the end-of-stream output invariant to how the
stream was micro-batched (as long as batches arrive in event-time order
per user, which AvailableNow over one file trivially satisfies): every
session except each user's final one is emitted exactly once. That
invariant is what lets a *stateful streaming* query carry a plain SQL
oracle — sessions with ``session_id < max(session_id) per user``.

Exactness: value accumulates as ``rint(value*100)`` int64 cents (the
same scaled-long path as functions/exact.lsum), so the emitted
``total_value`` is bit-identical to the batch aggregation under any
partitioning or batch split.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("session_start", TimestampNTZType()),
        StructField("session_end", TimestampNTZType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
        StructField("cents", LongType()),
        StructField("sid", LongType()),
    ]
)


def _session_fn(gap_us: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows: list[pd.DataFrame] = [
            pdf[["ts_ns", "value"]] for pdf in pdfs if len(pdf)
        ]
        if not rows:
            return
        batch = pd.concat(rows, ignore_index=True)
        us = (batch["ts_ns"].to_numpy(np.int64) // 1000).astype(np.int64)
        # null value -> 0 cents, row still counted and still extends the
        # session: mirrors the batch twin (SUM null-skips, COUNT(*)
        # doesn't). Without the mask, np.rint(NaN).astype(int64) is
        # INT64_MIN and one null row corrupts the total by ~9.2e16
        # (review finding).
        vals = batch["value"].to_numpy(np.float64)
        cents = np.where(
            np.isnan(vals), 0, np.rint(vals * 100)
        ).astype(np.int64)
        order = np.argsort(us, kind="stable")
        us, cents = us[order], cents[order]

        if state.exists:
            start_us, end_us, n, csum, sid = state.get
        else:
            start_us = end_us = n = csum = 0
            sid = 0  # no open session yet

        closed: list[tuple[int, int, int, int, int]] = []
        for t, c in zip(us.tolist(), cents.tolist()):
            if sid == 0:
                sid, start_us, end_us, n, csum = 1, t, t, 1, c
            elif t - end_us > gap_us:
                closed.append((sid, start_us, end_us, n, csum))
                sid, start_us, end_us, n, csum = sid + 1, t, t, 1, c
            else:
                end_us, n, csum = t, n + 1, csum + c
        state.update((start_us, end_us, n, csum, sid))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": np.int64(user_id),
                    "session_id": [s[0] for s in closed],
                    "session_start": pd.to_datetime(
                        [s[1] for s in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [s[2] for s in closed], unit="us"
                    ),
                    "n_events": [s[3] for s in closed],
                    "total_value": [s[4] / 100.0 for s in closed],
                }
            )

    return fn


def stateful_sessionize_stream(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 30,
    max_files_per_trigger: int | None = None,
    glob: str | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run the stateful sessionizer over a readStream of the events
    parquet (AvailableNow → memory sink) and return the emitted (closed)
    sessions.

    The nanos ``ts`` stays a raw int64 through the whole stream — the
    pandas worker does the ns→µs truncation (integer div, same as the
    batch reader) and timestamps are rebuilt only in the emitted output.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isdir(events_path):
        # directory-of-part-files layout: stream the directory itself
        # (watching the PARENT with a glob would match other tables'
        # part files — review finding); an explicit glob filters WITHIN
        # the dataset directory
        stream_path = events_path
        if glob is not None:
            reader = reader.option("pathGlobFilter", glob)
    else:
        # single-file layout: the file source watches a directory, so
        # glob-filter down to the one table file inside the sf dir
        reader = reader.option(
            "pathGlobFilter", glob or os.path.basename(events_path)
        )
        stream_path = os.path.dirname(events_path)
    if max_files_per_trigger is not None:
        # with AvailableNow this splits the run into one micro-batch per
        # file (state-carryover exercised across batches); file order is
        # the source's lexicographic listing, so time-ordered file names
        # keep per-user event-time order
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(stream_path)
    if dict(stream.dtypes)["ts"] == "bigint":
        # raw int64 nanos (the driver testdata under the legacy conf)
        ts_ns = F.col("ts")
    else:
        # already a timestamp (e.g. re-written fixtures): micros → nanos
        ts_ns = F.unix_micros(F.col("ts").cast("timestamp")) * 1000
    sessions = (
        stream.select(
            "user_id", ts_ns.cast("long").alias("ts_ns"), "value"
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes * 60 * 1_000_000),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    # shared AvailableNow memory-sink runner (events.py) — the previous
    # verbatim copy of that block here had already started drifting
    # (review finding); state-partition sizing rationale lives there
    from .events import _run_to_memory_sink

    return _run_to_memory_sink(
        spark, sessions, "sessions_", "append", state_partitions
    )
