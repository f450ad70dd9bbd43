"""Streaming state probe under an ADVANCING watermark (VERDICT r7
"Next round" #4).

SCALE_r07's table measured st9's state as linear in stream length —
but that harness replicates events at CONSTANT ts, so the watermark
never advances and nothing can purge: the documented worst case, not
the steady state. This probe replays the stream the way a real feed
arrives: replica k is shifted ``k × (span + 2 h)`` into the future and
written as its own chunk file (ascending mtime), and the file source
runs with ``maxFilesPerTrigger=1`` so every chunk is a separate
micro-batch whose completion advances the watermark past the previous
chunk. State must then PLATEAU at window × arrival-rate (±1 chunk of
watermark lag) instead of growing with replica count, and out_rows
must equal rep × the 1x join count (chunks are > 10 min apart, so no
cross-chunk click/purchase pair can match).

    python tools/streaming_advance_probe.py --reps 8,32
    python tools/streaming_advance_probe.py --reps 32 --rocksdb

--rocksdb runs the same probe on the RocksDB state-store provider
(the documented 100 TB production default) to demonstrate it actually
works in this harness, not just in a docstring.

Prints one JSON line per (rep, query) for SCALE_r08.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def build_advancing(spark, src: str, rep: int) -> str:
    """Replicate events with per-replica time shifts into chunk files.

    Each replica's event_ids are re-keyed (scale_probe convention) and
    its timestamps shifted by ``k × (span + 2 h)`` — 2 h > the 1 h
    watermark delay, so once the watermark passes a chunk nothing in it
    can still match. Chunks are written APPEND one at a time: the file
    source processes files oldest-mtime-first, so event time advances
    monotonically across micro-batches."""
    from pyspark.sql import functions as F

    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    out = tempfile.mkdtemp(prefix=f"adv{rep}_")
    ev = load_table(spark, src, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_s = int((hi - lo).total_seconds()) + 7200
    for k in range(rep):
        chunk = ev.withColumn(
            "event_id", F.col("event_id") + F.lit(k * 1_000_000_000)
        ).withColumn(
            "ts", F.col("ts") + F.expr(f"INTERVAL {k * span_s} SECONDS")
        )
        chunk.coalesce(1).write.mode("append").parquet(
            f"{out}/events.parquet"
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", default="8,32")
    ap.add_argument("--rocksdb", action="store_true")
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or ["st9_stream_stream_join"]

    import __spark_entry__  # noqa: F401 — populate the registry
    from ig_etl_with_user_reports_2024_spark.plans import QUERIES as SPECS
    from ig_etl_with_user_reports_2024_spark.session import get_spark
    from ig_etl_with_user_reports_2024_spark.streaming import events as ev

    spark = get_spark("advance-probe")
    if args.rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB
        )
    ev.STREAM_OPTIONS["maxFilesPerTrigger"] = "1"
    try:
        for rep in [int(r) for r in args.reps.split(",")]:
            d = build_advancing(spark, args.sf, rep)
            try:
                for name in names:
                    before = dict(ev.LAST_STATE_METRICS)
                    n_out = SPECS[name].fn(spark, d).count()
                    new = {
                        k: v
                        for k, v in ev.LAST_STATE_METRICS.items()
                        if before.get(k) is not v
                    }
                    for sink, ops in new.items() or {None: []}.items():
                        for op in ops or [{}]:
                            print(json.dumps({
                                "query": name,
                                "rep": rep,
                                "provider": "rocksdb" if args.rocksdb
                                else "hdfs",
                                "operator": op.get("operatorName"),
                                "state_rows": op.get("numRowsTotal"),
                                "state_bytes": op.get("memoryUsedBytes"),
                                "out_rows": n_out,
                            }))
            finally:
                shutil.rmtree(d, ignore_errors=True)
    finally:
        ev.STREAM_OPTIONS.pop("maxFilesPerTrigger", None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
