"""Storage-layout operators: Z-order clustering keys and range layout.

At 100 TB the dominant cost of most scans is how much irrelevant data
the files force you to read. Single-column sort keys give min/max
row-group pruning on ONE predicate column; multi-dimensional predicates
(``part = X AND supp = Y``) need a key that keeps rows close in EVERY
dimension at once. The standard answer (Delta OPTIMIZE ZORDER BY,
Iceberg's z-ordered rewrites) is a space-filling curve: interleave the
bits of the dimension columns so nearby (part, supp) pairs land on
nearby key values, then range-partition + sort files by that key. A
min/max index over the z-key then prunes on any subset of the
dimensions.

Everything here is pure integer column arithmetic (shift/and/or) — it
runs inside whole-stage codegen, adds no shuffle of its own, and is
bit-identical in any engine, which is what makes the catalog query
(plans/star_layout.py zo1) hash-checkable against DuckDB.

Beyond-reference scale operator; the reference's closest analog is its
single-key CSV sort (jsontocsv_enhanced.py writes rows in dict order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one LONG.

    Bit ``i`` of column ``j`` lands at position ``i * len(cols) + j``,
    so the first column owns the even positions for two columns. Values
    are masked to ``bits`` bits first — the curve is defined on the
    masked domain, exactly like a production z-order that fixes the
    per-column bit budget up front. ``len(cols) * bits`` must be ≤ 63
    to stay inside a signed 64-bit key.

    The expression is a balanced OR-tree of ``((c >> i) & 1) << pos``
    terms — constant-folded per row by codegen, no UDF, no shuffle.
    """
    ncols = len(cols)
    if ncols * bits > 63:
        raise ValueError(f"{ncols} cols x {bits} bits exceeds a 63-bit key")
    terms: list[Column] = []
    for j, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(col, i).bitwiseAND(F.lit(1)), i * ncols + j
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The identical interleave as ANSI SQL text (DuckDB oracle side).

    Same bit-position convention as :func:`zorder_key`; ``|``/``&``/
    ``<<``/``>>`` on BIGINT evaluate identically in Spark and DuckDB,
    so the two expressions are bit-exact twins.
    """
    ncols = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) << {i * ncols + j})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def layout_by_zorder(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    num_files: int = 64,
    key_col: str = "_zkey",
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the z-key, sort
    within each partition.

    This is the write-side half of z-ordering: each output file covers
    one contiguous z-range, so every file's min/max footer prunes on
    every dimension in ``cols``. ``repartitionByRange`` samples range
    boundaries (one pass), then the per-partition sort is local — the
    only full shuffle is the range exchange itself, which any layout
    rewrite needs. The helper keeps the key column so writers can drop
    or keep it; tests assert the physical plan carries a single
    ``rangepartitioning`` exchange over the key.
    """
    keyed = df.withColumn(key_col, zorder_key(cols, bits))
    return keyed.repartitionByRange(num_files, F.col(key_col)).sortWithinPartitions(
        key_col
    )
