"""Steady-state flagship profile (VERDICT r8 "Next round" #1, part 2).

One fresh JVM: bench.py's 60-replica warm pass, then N consecutive
timed materializations of the 600-replica report. The later repeats are
the steady-state number a long-lived deployment sees; repeat-to-repeat
spread is the within-JVM variance that isolated single shots can't show.

Usage: python tools/flagship_steady.py [N=5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    from ig_etl_with_user_reports_2024_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("flagship-steady")
    try:
        replicated = bench._replicated_report(spark)
        if replicated is None:
            print(json.dumps({"error": "reference fixture absent"}))
            return
        load_before = bench._loadavg()
        replicated(60).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(n):
            df = replicated(600)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        print(
            json.dumps(
                {
                    "metric": "creator_report_full_steady",
                    "runs": runs,
                    "unit": "sec",
                    "load_before": load_before,
                    "load_after": bench._loadavg(),
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
