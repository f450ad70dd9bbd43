"""Isolated flagship measurement (VERDICT r8 "Next round" #1).

Runs ONLY creator_report_full — bench.py's exact warm/measure contract
(warm at 60 replicas, measure one materialization at 600) — in a fresh
JVM, so the number is free of the 82-query suite's JVM churn (codegen
cache pressure, GC debt, Python worker pool growth). Prints one JSON
line with the wall seconds and the bracketing load stamps.

Usage: python tools/flagship_isolated.py   (run 3x, each a new process)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import bench
    from ig_etl_with_user_reports_2024_spark.session import get_spark

    spark = get_spark("flagship-isolated")
    load_before = bench._loadavg()
    t = bench._creator_report_full(spark)
    load_after = bench._loadavg()
    print(
        json.dumps(
            {
                "metric": "creator_report_full_isolated",
                "value": None if t is None else round(t, 3),
                "unit": "sec",
                "load_before": load_before,
                "load_after": load_after,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
