"""Measure the trained-cells consequence for the ANN consumers
(VERDICT r12 "Next round" #7): km2's Lloyd training exists, but
ann3/ann5 (and their rf2/rf10 floors) still run km1-style SEEDED
coarse cells. dd13's consequence was measured in r12 (capture
0.38→0.27 / 0.32→0.41 / 0.26→0.30); this script measures whether the
rf2/rf10 recall floors move when the coarse codebook is km2's trained
one instead of the seeded draw.

rf6 is deliberately NOT probed: it gates PQ reconstruction distortion
— the per-subspace product-quantizer codebooks, a different training
loop entirely (k-means per subspace slice). km2 trains the COARSE
partitioner; swapping it cannot change sq2's codes or rf6's
distortion by construction, so there is nothing to measure there.

Prints one JSON line per (sf, metric): seeded vs trained recall at
identical k/n_probe/refine, plus the exact-oracle size.

Usage: python tools/trained_cells_probe.py [--sfs 0.001,0.01,0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def recall(exact, approx) -> tuple[int, int, float]:
    e = exact.select("q_id", "n_id")
    a = approx.select("q_id", "n_id")
    n_exact = e.count()
    n_hit = e.join(a, ["q_id", "n_id"]).count()
    return n_exact, n_hit, round(n_hit / n_exact, 4) if n_exact else 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfs", default="0.001,0.01,0.1")
    args = ap.parse_args()

    from ig_etl_with_user_reports_2024_spark.operators import (
        similarity as sim,
    )
    from ig_etl_with_user_reports_2024_spark.plans.star_recall import (
        clustered_embeddings,
    )
    from ig_etl_with_user_reports_2024_spark.session import get_spark
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    spark = get_spark("trained_cells_probe")
    for sf in args.sfs.split(","):
        sf_dir = f"/root/testdata/sf{sf}"

        def trained(corpus) -> list[list[float]]:
            books = sim.kmeans_lloyd_codebooks(
                corpus, "vec_id", "embedding", k=16, salt="ann3", iters=2
            )
            return [
                [c / float(sim.KM2_SCALE) for c in comps]
                for _, comps in books[-1]
            ]

        # rf2's setting: raw embeddings corpus, IVF 16 cells / 4 probes
        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < 10)
        exact = sim.cosine_topk(q, emb, "vec_id", "embedding", k=5)
        for name, cents in (("seeded", None), ("trained", trained(emb))):
            approx = sim.ivf_topk(
                q, emb, "vec_id", "embedding", k=5, centroids=cents
            )
            n_e, n_h, r = recall(exact, approx)
            print(
                json.dumps(
                    {"sf": sf, "floor": "rf2", "cells": name,
                     "k_cells": 16 if cents is None else len(cents),
                     "n_exact": n_e, "n_hit": n_h, "recall": r}
                ),
                flush=True,
            )

        # rf10's setting: clustered fixture, IVFPQ + refine (rf10's
        # corpus-sized shortlist rule)
        cemb = clustered_embeddings(spark, sf_dir)
        n_vecs = load_table(spark, sf_dir, "embeddings").count()
        qc = cemb.filter(F.col("vec_id") < 10)
        exactc = sim.cosine_topk(qc, cemb, "vec_id", "embedding", k=5)
        for name, cents in (("seeded", None), ("trained", trained(cemb))):
            approx = sim.ivfpq_topk(
                qc, cemb, "vec_id", "embedding", k=5,
                refine=max(100, (2 * n_vecs) // 16), centroids=cents,
            )
            n_e, n_h, r = recall(exactc, approx)
            print(
                json.dumps(
                    {"sf": sf, "floor": "rf10", "cells": name,
                     "k_cells": 16 if cents is None else len(cents),
                     "n_exact": n_e, "n_hit": n_h, "recall": r}
                ),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
