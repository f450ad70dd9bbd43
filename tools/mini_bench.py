"""Per-query A/B mini-bench — bench.py's exact timing contract (same
session configs, same interleaved sf0.001 compile-warm, same eager-flag
clock placement, same noop sink, same per-query eager-pin release) over
a named subset, N takes each, reporting every take plus the min.

    python tools/mini_bench.py cm2_incremental_admission dc3_semantic_decontaminate --takes=3

Use the MIN of >=3 takes on a quiet machine as the floor (the repo's
BENCH_NOTES convention); single takes on this host swing +-20% from
co-tenant noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    warm_dir = "/root/testdata/sf0.001"
    takes = 3
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        if a.startswith("--takes="):
            takes = int(a.split("=", 1)[1])

    import __spark_entry__ as entry_mod
    from ig_etl_with_user_reports_2024_spark.operators.dedup import (
        release_eager_pins,
    )
    from ig_etl_with_user_reports_2024_spark.plans import QUERIES as SPECS
    from ig_etl_with_user_reports_2024_spark.session import get_spark

    spark = get_spark("mini_bench")
    qs = entry_mod.queries()

    # bench.py's global warms: footers/codegen infra + the Arrow pool
    qs["k7_top5_preview"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(1000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, dict] = {}
    for name in names:
        rec = {"takes": []}
        for _ in range(takes):
            if os.path.isdir(warm_dir):
                try:
                    qs[name](spark, warm_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception:  # noqa: BLE001
                    pass
                release_eager_pins()
            eager = SPECS[name].eager
            t0 = time.time() if eager else 0.0
            df = qs[name](spark, sf_dir)
            if not eager:
                t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            rec["takes"].append(round(time.time() - t0, 3))
            release_eager_pins()
        rec["min"] = min(rec["takes"])
        out[name] = rec
        print(f"{name}: min={rec['min']}  takes={rec['takes']}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "load": list(os.getloadavg()), **out}))


if __name__ == "__main__":
    main()
