"""Streaming state-store size probe (VERDICT r6 "Next round" #5).

The stateful streaming family's scale claims are of the form "state is
bounded by key cardinality / window count, not stream length". This
tool MEASURES that: it runs the stateful catalog queries at 1x / Nx
replicated events (tools/scale_probe.build re-keys event_id but keeps
user_id and ts, so stream length grows Nx while the key space stays
fixed — exactly the claimed bound's test), then prints the final
micro-batch's state-store metrics captured by
streaming.events.LAST_STATE_METRICS (numRowsTotal, memoryUsedBytes per
stateful operator).

    python tools/streaming_state_probe.py --reps 1,8,32

Results are recorded in SCALE_r{N}.md. Note for production: these runs
use the default HDFSBackedStateStoreProvider (in-JVM-heap maps +
checkpoint files); at 100 TB key spaces the RocksDB provider
(spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider)
is the deployment default so state lives off-heap/on-disk with
incremental checkpoints — the numRowsTotal bounds measured here are
provider-independent.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "st5_stateful_sessions",
    "st6_streaming_dedup",
    "st9_stream_stream_join",
    "st10_streaming_upsert",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", default="1,8,32")
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or QUERIES

    from ig_etl_with_user_reports_2024_spark.session import get_spark
    from ig_etl_with_user_reports_2024_spark.plans import QUERIES as SPECS
    import __spark_entry__  # noqa: F401 — populate the registry
    from ig_etl_with_user_reports_2024_spark.streaming import events as ev

    spark = get_spark("state-probe")
    import tools.scale_probe as sp

    for rep in [int(r) for r in args.reps.split(",")]:
        if rep == 1:
            d, cleanup = args.sf, None
        else:
            d = sp.build(spark, args.sf, rep, tables=["events"])
            cleanup = d
        for name in names:
            before = dict(ev.LAST_STATE_METRICS)
            df = SPECS[name].fn(spark, d)
            n_out = df.count()
            new = {
                k: v
                for k, v in ev.LAST_STATE_METRICS.items()
                if before.get(k) is not v
            }
            emitted = 0
            for prefix, ops in new.items():
                for op in ops:
                    emitted += 1
                    print(json.dumps({
                        "query": name,
                        "rep": rep,
                        "sink": prefix,
                        "operator": op.get("operatorName"),
                        "state_rows": op.get("numRowsTotal"),
                        "state_bytes": op.get("memoryUsedBytes"),
                        "out_rows": n_out,
                    }))
            if not emitted:
                # no metrics captured (stateless query, or the capture's
                # best-effort except stored an EMPTY list — which still
                # updates the prefix key, so `new` alone can't be the
                # emptiness test): always emit one null record so the
                # query never silently vanishes from the probe output
                print(json.dumps({"query": name, "rep": rep, "sink": None,
                                  "operator": None, "state_rows": None,
                                  "state_bytes": None, "out_rows": n_out}))
        if cleanup:
            shutil.rmtree(cleanup, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
