"""Degenerate mega-cluster probe for the dedup keep-lists (VERDICT r7
"Next round" #5): ONE document duplicated ``--copies`` times (default
640k — the 128×-sweep volume concentrated into a single cluster).

Under the old ``count(*) over (partition by cluster_id)`` plan every
copy lands in ONE window task; under keep_list_with_sizes the count is
map-side-combined and the join back is salted, so the cluster's rows
spread across ``n_salts`` tasks. The probe asserts BOTH correctness
(every row: cluster_id = min doc_id, kept only there, cluster_size =
copies — the bit-identical answer the window form gives) and the
spread (result rows for the one cluster occupy > 1 output partition).

    python tools/megacluster_probe.py --copies 640000

Prints one JSON line for SCALE_r08.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=640_000)
    ap.add_argument("--name", default="dd11_staged_keep_list")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from ig_etl_with_user_reports_2024_spark.session import get_spark

    spark = get_spark("megacluster_probe")
    # Simulate the 100 TB regime where none of the cluster-grain tables
    # (digest mins, CC labels, cluster counts) is broadcastable and AQE
    # cannot paper over the hot key by coalescing: force every salted
    # join to actually run as a shuffle join so the spread the salts
    # buy is visible in the result partitioning.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    load_before = list(os.getloadavg())
    text = (
        "the quick brown fox jumps over the lazy dog and keeps going "
        "until the corpus is nothing but this one sentence repeated"
    )
    out = tempfile.mkdtemp(prefix="megacluster_")
    try:
        if args.name == "quality_survivor_keep_list":
            # dd15's OWN stages (argmax-struct groupBy + salted attach)
            # probed directly on a synthetic one-cluster membership —
            # the catalog entry can't ride the parquet path here
            # because, unlike dd11, it has no digest stage: a 640k-copy
            # single-text corpus makes its banded pair stage
            # clique-quadratic BY DESIGN (CLAUDE.md: real corpora run
            # dd1/dd11 first). Equal quality everywhere → tie-break →
            # survivor is doc 0, same assertions as the catalog names.
            from ig_etl_with_user_reports_2024_spark.operators.dedup import (
                quality_survivor_keep_list,
            )

            members = spark.range(args.copies).select(
                F.col("id").alias("doc_id"), F.lit(0).alias("cluster_id")
            )
            quality = spark.range(args.copies).select(
                F.col("id").alias("doc_id"),
                F.lit(50.0).alias("quality_score"),
            )
            t0 = time.time()
            res = quality_survivor_keep_list(members, quality)
        else:
            (
                spark.range(args.copies)
                .select(
                    F.col("id").alias("doc_id"),
                    F.lit("probe").alias("source"),
                    F.lit(text).alias("text"),
                )
                .write.mode("overwrite")
                .parquet(f"{out}/documents.parquet")
            )
            t0 = time.time()
            res = entry_mod.queries()[args.name](spark, out)
        bad = res.filter(
            (F.col("cluster_id") != 0)
            | (F.col("cluster_size") != args.copies)
            | (F.col("kept") != (F.col("doc_id") == 0))
        ).count()
        n = res.count()
        secs = round(time.time() - t0, 2)
        # spread: the single cluster's result rows must NOT sit in one
        # output partition (the window plan puts them in exactly one)
        parts = (
            res.select(F.spark_partition_id().alias("p"))
            .agg(F.count_distinct("p").alias("np"))
            .collect()[0]["np"]
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)
    print(
        json.dumps(
            {
                "name": args.name,
                "copies": args.copies,
                "rows": n,
                "bad_rows": bad,
                "result_partitions": int(parts),
                "secs": secs,
                "load_before": load_before,
            }
        )
    )
    # the probe IS the gate: a reintroduced hot-cluster window
    # (parts == 1) or a wrong keep-list must fail the exit code, not
    # just print a number someone has to read
    assert n == args.copies, f"expected {args.copies} rows, got {n}"
    assert bad == 0, f"{bad} rows with wrong cluster/kept/size"
    assert parts > 1, "mega-cluster result sits in ONE partition"
    return 0


if __name__ == "__main__":
    sys.exit(main())
