"""One-off N× replication probe for the most shape-dependent plans.

The per-round 8× stress (tests/test_scale.py) asserts completion and
invariants; this tool pushes further (32×+) on demand and prints
wall-times, for recording in SCALE_r{N}.md:

    python tools/scale_probe.py --rep 32 dd3_minhash_lsh_pairs dd6_dup_clusters

Replicates the base tables a query reads into a temp dir (re-keying id
columns so replicas stay distinct), runs each named catalog query
end-to-end (count() to force execution), and prints one JSON line:
{"rep": N, "rows": {...}, "secs": {...}, "load_before": [...]}.

CAVEAT: count() lets Catalyst PRUNE expensive output-only projections
(e.g. dd12's per-doc collect_list + md5 trim digest — measured ~10x
under-report at 32x). For plans whose cost lives in projected columns,
probe with a noop write instead (SCALE_r07.md §3 shows the pattern).
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

REKEY = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
PLAIN = ("customer", "part", "supplier", "nation", "region")


def _fresh_doc_text(text, doc_id, rep):
    """A replica-seeded WORD PERMUTATION of ``text`` — the new-doc
    replication recipe (VERDICT r12 "Next round" #3): a clone-replicated
    documents dir makes every arriving doc an exact/near dup of the
    store, so cm2 admits nothing and the daily path (cp3/cp7/cp8) gets
    0-row scale verdicts. Permuting each replica's words by a
    (doc_id, rep)-seeded hash destroys essentially every word-3-gram
    shingle (dedup.word_shingles' grain) while preserving the word
    MULTISET — so txt8's quality stats (token counts, stopword ratios,
    length) are unchanged and the replica is a genuinely NEW document
    to both the digest store (different md5) and the band store
    (disjoint shingles), not a quality-filter casualty. Deterministic:
    sort key is md5(doc_id:rep:pos) with pos as tiebreak, so the same
    dir rebuilds bit-identically for the Spark-vs-DuckDB exactness
    sweep. Docs with <2 words permute to themselves (those replicas
    stay clones — disclosed, a handful of rows)."""
    arr = F.filter(
        F.split(F.trim(text), r"\s+"), lambda t: t != F.lit("")
    )
    idx = F.sequence(F.lit(1), F.size(arr))
    keyed = F.transform(
        idx,
        lambda i: F.struct(
            F.md5(
                F.concat_ws(
                    ":", doc_id.cast("string"), rep.cast("string"),
                    i.cast("string"),
                )
            ).alias("h"),
            i.alias("i"),
        ),
    )
    perm = F.array_join(
        F.transform(
            F.array_sort(keyed), lambda s: F.element_at(arr, s["i"])
        ),
        " ",
    )
    # <2 words (INCLUDING empty/whitespace-only text): keep the
    # original — there is nothing to permute, and ANSI would throw on
    # sequence(1, 0)'s descending [1, 0] feeding element_at (review
    # finding r13; the CLAUDE.md possibly-empty-array rule)
    return F.when(F.size(arr) < 2, text).otherwise(perm)


def build(
    spark,
    src: str,
    rep: int,
    tables: list[str] | None = None,
    fresh_docs: bool = False,
) -> str:
    """Replicate the base tables into a temp dir. ``tables`` restricts
    which tables are replicated/copied (default: all) — a 128× probe of
    a documents-only plan need not write 128× lineitem. Replication is
    a crossJoin with spark.range(rep): O(1) plan size, where the old
    rep-branch unionByName built a plan that at rep=128 crashed the
    optimizer/codegen before the first row was written.

    ``fresh_docs=True`` additionally re-keys each documents replica's
    TEXT (replica 0 keeps the original corpus verbatim — it is the
    store) via :func:`_fresh_doc_text`, and recomputes n_chars from
    the rewritten text so the n_chars==length(text) contract holds on
    the built dir. Use for daily-path (cm2/cp3/cp7/cp8) scale probes,
    where clone replicas would be rejected wholesale at admission."""
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    out = tempfile.mkdtemp(prefix=f"sfx{rep}_")
    reps = F.broadcast(
        spark.range(rep).select(F.col("id").alias("_rep"))
    )
    for t, keycol in REKEY.items():
        if tables is not None and t not in tables:
            continue
        df = load_table(spark, src, t)
        big = df.crossJoin(reps)
        if fresh_docs and t == "documents":
            fresh = _fresh_doc_text(
                F.col("text"), F.col("doc_id"), F.col("_rep")
            )
            big = big.withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(fresh),
            ).withColumn(
                "n_chars",
                F.when(
                    F.col("_rep") == 0, F.col("n_chars")
                ).otherwise(F.length("text").cast("bigint")),
            )
        big = (
            big.withColumn(
                keycol,
                F.col(keycol) + F.col("_rep").cast("long") * 1_000_000_000,
            )
            .drop("_rep")
        )
        big.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in PLAIN:
        if tables is not None and t not in tables:
            continue
        load_table(spark, src, t).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of tables to replicate (default all)",
    )
    ap.add_argument(
        "--fresh-docs",
        action="store_true",
        help="re-key each documents replica's text via a seeded word "
        "permutation (new-doc recipe for daily-path probes)",
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from ig_etl_with_user_reports_2024_spark.session import get_spark

    spark = get_spark("scale_probe")
    load_before = list(os.getloadavg())
    tables = args.tables.split(",") if args.tables else None
    big = build(
        spark, args.sf, args.rep, tables=tables, fresh_docs=args.fresh_docs
    )
    qs = entry_mod.queries()
    rows: dict[str, int] = {}
    secs: dict[str, float] = {}
    try:
        for name in args.names:
            t0 = time.time()
            rows[name] = qs[name](spark, big).count()
            secs[name] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(big, ignore_errors=True)
    print(
        json.dumps(
            {
                "rep": args.rep,
                "rows": rows,
                "secs": secs,
                "load_before": load_before,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
