"""(num_hashes, bands) tuning sweep for the banded dedup path
(VERDICT r8 "Next round" #3 — act on dd16's verify_precision 0.31).

For each setting this records, at $SPARK_GRAFT_SF_DIR (default sf0.1):

- dd16's counts (exact pairs / candidates / verified / recall /
  verify_precision) — what the banding spends vs delivers. The
  quadratic exact yardstick is setting-INDEPENDENT, so it is computed
  ONCE per corpus from one pinned shingle table and reused across all
  settings (review finding: the first cut re-ran dd2's all-pairs join
  5×);
- wall seconds for ONE materialization of the production banded chain
  (portable_minhash_pairs: signature + band join + verify), warmed once
  at sf0.001 first — more hashes cost num_hashes md5 calls per shingle
  map-side, so precision gains must be priced against signature cost;
- the borderline-corpus recall (the constructed jaccard≈0.3 corpus from
  tests/test_dedup.py::test_banded_pair_eval_counts_and_missed_pairs) —
  the branch sf data can't reach (driver dups are high-Jaccard).

Prints one JSON line per setting; paste the table into SCALE_r09.md.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SETTINGS = [(8, 4), (16, 8), (8, 2), (16, 4), (32, 8)]
THRESHOLD = 0.2


def _borderline_df(spark):
    rnd = random.Random(23)
    vocab = [f"w{i}" for i in range(400)]

    def rtext(k):
        return " ".join(rnd.choice(vocab) for _ in range(k))

    rows = []
    for i in range(12):
        shared = rtext(20)
        rows.append((2 * i, shared + " " + rtext(20)))
        rows.append((2 * i + 1, rtext(20) + " " + shared))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _sweep_counts(dd, docs):
    """Per-setting (candidates, verified) counts plus the ONE exact
    yardstick count, all from a single pinned shingle table."""
    sh = dd.pin_bounded(
        dd.exploded_shingles(docs.select("doc_id", "text"), "doc_id", "text")
    )
    n_exact = dd.shingle_pairs_jaccard(
        docs, "doc_id", "text", n=3, threshold=THRESHOLD
    ).count()
    out = {}
    for nh, b in SETTINGS:
        cand = dd.pin_bounded(dd.band_candidates(sh, nh, b))
        n_cand = cand.count()
        n_ver = dd.verify_candidates(sh, cand, THRESHOLD).count()
        out[(nh, b)] = (n_cand, n_ver)
    return n_exact, out


def main() -> None:
    from ig_etl_with_user_reports_2024_spark.operators import dedup as dd
    from ig_etl_with_user_reports_2024_spark.session import get_spark
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark("band-tuning")
    try:
        docs = load_table(spark, sf_dir, "documents")
        border = _borderline_df(spark)
        sf_exact, sf_counts = _sweep_counts(dd, docs)
        bd_exact, bd_counts = _sweep_counts(dd, border)

        for nh, b in SETTINGS:
            if os.path.isdir(warm_dir):  # compile-warm the chain's plan
                dd.portable_minhash_pairs(
                    load_table(spark, warm_dir, "documents"),
                    "doc_id", "text", num_hashes=nh, bands=b,
                ).write.format("noop").mode("overwrite").save()
            chain = dd.portable_minhash_pairs(
                docs, "doc_id", "text", num_hashes=nh, bands=b
            )
            t0 = time.time()
            chain.write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 3)
            n_cand, n_ver = sf_counts[(nh, b)]
            bn_cand, bn_ver = bd_counts[(nh, b)]
            print(
                json.dumps(
                    {
                        "num_hashes": nh,
                        "bands": b,
                        "rows_per_band": nh // b,
                        "sf": {
                            "n_exact_pairs": sf_exact,
                            "n_band_candidates": n_cand,
                            "n_verified_pairs": n_ver,
                            "pair_recall": n_ver / sf_exact if sf_exact else None,
                            "verify_precision": n_ver / n_cand if n_cand else None,
                        },
                        "chain_wall_sec": wall,
                        "borderline": {
                            "n_exact_pairs": bd_exact,
                            "n_band_candidates": bn_cand,
                            "n_verified_pairs": bn_ver,
                            "pair_recall": bn_ver / bd_exact if bd_exact else None,
                        },
                    }
                ),
                flush=True,
            )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
