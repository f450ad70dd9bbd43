"""(num_hashes, bands) tuning sweep for the banded dedup path
(VERDICT r8 "Next round" #3 — act on dd16's verify_precision 0.31).

For each setting this records, at $SPARK_GRAFT_SF_DIR (default sf0.1):

- dd16's one-row eval (exact pairs / candidates / verified / recall /
  verify_precision) — what the banding spends vs delivers;
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


def main() -> None:
    from ig_etl_with_user_reports_2024_spark.operators import dedup as dd
    from ig_etl_with_user_reports_2024_spark.session import get_spark
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm_dir = "/root/testdata/sf0.001"
    spark = get_spark("band-tuning")
    docs = load_table(spark, sf_dir, "documents")
    border = _borderline_df(spark)

    for nh, b in SETTINGS:
        [ev] = dd.banded_pair_eval(docs, "doc_id", "text", nh, b).collect()
        if os.path.isdir(warm_dir):  # compile-warm the chain's plan shape
            dd.portable_minhash_pairs(
                load_table(spark, warm_dir, "documents"),
                "doc_id",
                "text",
                num_hashes=nh,
                bands=b,
            ).write.format("noop").mode("overwrite").save()
        chain = dd.portable_minhash_pairs(
            docs, "doc_id", "text", num_hashes=nh, bands=b
        )
        t0 = time.time()
        chain.write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 3)
        [bd] = dd.banded_pair_eval(border, "doc_id", "text", nh, b).collect()
        print(
            json.dumps(
                {
                    "num_hashes": nh,
                    "bands": b,
                    "rows_per_band": nh // b,
                    "sf": {
                        "n_exact_pairs": ev.n_exact_pairs,
                        "n_band_candidates": ev.n_band_candidates,
                        "n_verified_pairs": ev.n_verified_pairs,
                        "pair_recall": ev.pair_recall,
                        "verify_precision": ev.verify_precision,
                    },
                    "chain_wall_sec": wall,
                    "borderline": {
                        "n_exact_pairs": bd.n_exact_pairs,
                        "n_band_candidates": bd.n_band_candidates,
                        "n_verified_pairs": bd.n_verified_pairs,
                        "pair_recall": bd.pair_recall,
                    },
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
