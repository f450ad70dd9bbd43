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


def _permuted_texts(big):
    """Replica-seeded WORD PERMUTATIONS of ``text`` — the new-doc
    replication recipe (VERDICT r12 "Next round" #3): a clone-replicated
    documents dir makes every arriving doc an exact/near dup of the
    store, so cm2 admits nothing and the daily path (cp3/cp7/cp8) gets
    0-row scale verdicts. Permuting each replica's words by a
    (doc_id, rep)-seeded hash destroys essentially every word-3-gram
    shingle (dedup.word_shingles' grain) while preserving the word
    MULTISET — so txt8's quality stats (token counts, stopword ratios,
    length) are unchanged and the replica is a genuinely NEW document
    to both the digest store (different md5) and the band store
    (disjoint shingles), not a quality-filter casualty.

    Takes the replicated frame (doc_id, _rep, text, ...) and returns
    (doc_id, _rep, _perm, _nw): the permuted text and its word count
    (docs with zero words yield NO row — the caller's left join + <2
    guard keeps those replicas as clones, disclosed, a handful of
    rows). Shape is the codegen explode+groupBy form (ADVICE r13 — the
    old per-element F.md5 inside an F.transform lambda ran interpreted,
    the CLAUDE.md r6 HOF rule, paid per word of every replica at
    --rep 128): posexplode → one codegen md5 projection →
    groupBy(doc_id, _rep) with array_sort(collect_list(...)). The
    permutation is BIT-IDENTICAL to the old HOF form (verified on
    rebuild): the hash input keeps the 1-based position string, and the
    sort struct's leading (h, i) fields are unique per element, so the
    appended word field can never be consulted by the sort —
    collect_list's nondeterministic order is fully normalized."""
    words = big.select(
        "doc_id",
        "_rep",
        F.posexplode(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("pos", "w"),
    )
    h = F.md5(
        F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.col("_rep").cast("string"),
            (F.col("pos") + 1).cast("string"),
        )
    )
    return (
        words.select(
            "doc_id",
            "_rep",
            F.struct(
                h.alias("h"),
                (F.col("pos") + 1).alias("i"),
                F.col("w").alias("w"),
            ).alias("kw"),
        )
        .groupBy("doc_id", "_rep")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("kw")), lambda s: s["w"]
                ),
                " ",
            ).alias("_perm"),
            F.count("*").alias("_nw"),
        )
    )


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
    store) via :func:`_permuted_texts`, and recomputes n_chars from
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
            # PRECONDITION (r14 review finding): the permutation
            # aggregates at (doc_id, _rep) grain, so a source dir with
            # duplicate doc_ids would silently merge the duplicates'
            # words into one permuted string on every copy — assert
            # uniqueness loudly instead (one metadata-cheap pass on
            # the base table; all driver testdata dirs satisfy it)
            n, nd = df.select(
                F.count("doc_id"), F.count_distinct("doc_id")
            ).first()
            assert n == nd, (
                f"fresh_docs requires unique doc_id ({n} rows, "
                f"{nd} distinct) — permutation grain would merge dups"
            )
            # left join: zero-word docs have no permutation row (and
            # sequence(1,0)-style empties never arise — the old ANSI
            # trap is structurally gone in the explode form); <2 words
            # keeps the original, as before. Replica 0 always keeps
            # its text, so its permutation is never computed (r14
            # review finding — the filter drops a third of the
            # permutation work at rep=3, discarded before)
            keep = (
                (F.col("_rep") == 0)
                | F.col("_nw").isNull()
                | (F.col("_nw") < 2)
            )
            perm_src = big.filter(F.col("_rep") != 0)
            big = (
                big.join(
                    _permuted_texts(perm_src), ["doc_id", "_rep"], "left"
                )
                .withColumn(
                    "text",
                    F.when(keep, F.col("text")).otherwise(F.col("_perm")),
                )
                .withColumn(
                    "n_chars",
                    F.when(
                        F.col("_rep") == 0, F.col("n_chars")
                    ).otherwise(F.length("text").cast("bigint")),
                )
                .drop("_perm", "_nw")
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
