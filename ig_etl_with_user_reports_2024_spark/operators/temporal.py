"""Temporal joins Spark lacks as built-ins: as-of join, point-in-window
aggregation, and a bucketed range (interval) join.

Beyond-reference operators (BASELINE.json north star: a training-data
pipeline joining event streams to labels/features needs these). Spark has
no ASOF JOIN; the naive formulation is a theta join (broadcast nested
loop, O(n·m) per key) that dies at scale. Each operator here is a
composition of existing DataFrame ops chosen for its shuffle shape:

- :func:`asof_join` — union both sides, one hash shuffle on the key, one
  in-partition sort, ``last(ignorenulls)`` over a running frame. No join
  node at all: cost is that of a single window aggregation, skew bounded
  by per-key row counts. This is the classic "merge as union" plan used
  by time-series engines.
- :func:`in_window_agg` — aggregate right-stream rows inside a trailing
  event-time window of each left row via a RANGE frame over an integer
  microsecond key: again one shuffle, no join, no pair explosion.
- :func:`bucketed_range_join` — when the *pairs* themselves are the
  output, equi-join on (key, coarse time bucket) with the left side
  exploded to the covering buckets, then the exact predicate as a
  post-filter. Shuffle work tracks pair density (rows per bucket), never
  |L|×|R|; the classic band-join discretization.

DuckDB expresses all three natively (ASOF JOIN / inequality joins),
which makes every operator hash-checkable against the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MICROS = {"second": 1_000_000, "minute": 60_000_000, "hour": 3_600_000_000}


def event_micros(ts_col: str | Column = "ts") -> Column:
    """Integer epoch microseconds of a timestamp/TIMESTAMP_NTZ column.

    Integer, not ``cast("double")``: double seconds lose sub-microsecond
    exactness near .5 µs boundaries; the session runs in UTC so the
    NTZ→TZ cast is the identity mapping.
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    prefix: str = "asof_",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row picks the right row with the
    greatest ``ts_col`` at-or-before its own, per ``on`` key (DuckDB
    ``ASOF LEFT JOIN`` semantics; ties on equal ts match).

    ``tiebreak_col``: when several RIGHT rows share the winning ts, the
    one with the GREATEST value of this right-side column wins —
    declared, engine- and partition-order-independent. Without it the
    winner among equal-ts right rows is whichever the sort happened to
    place last (fine when (key, ts) is unique on the right, exactly the
    nondeterminism an 8× replicated corpus exposed — every replica
    shares its original's timestamp). Pass it whenever right-side ts
    ties are possible.

    Plan: tag sides, align schemas (right's carried columns packed into
    ONE nullable struct), union, then ``last(_rpack, ignorenulls=True)``
    over (key) ordered by (ts, side) with right-before-left at equal ts.
    The struct pack matters twice: a single window expression instead of
    one per column, and a right row whose *field* is NULL still matches
    (per-column ``last(ignorenulls)`` would wrongly skip to an older row).

    Left rows with no prior right row get a NULL struct → NULL fields,
    i.e. LEFT join semantics.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys + [ts_col]]

    pack = F.struct(
        F.col(ts_col).alias(ts_col),
        *[F.col(c).alias(c) for c in right_cols],
    )
    null_pack = F.lit(None).cast(
        right.select(pack.alias("p")).schema["p"].dataType
    )

    if tiebreak_col is not None and tiebreak_col not in right.columns:
        raise ValueError(f"tiebreak_col {tiebreak_col!r} not in right columns")
    # keep the tiebreak's NATURAL type: a cast to long would crash under
    # ANSI for string tiebreaks and coarsen timestamps to whole seconds
    # (re-introducing the tie nondeterminism the column exists to remove)
    tb_type = (
        right.schema[tiebreak_col].dataType if tiebreak_col is not None else "long"
    )
    tb_right = (
        F.col(tiebreak_col) if tiebreak_col is not None else F.lit(None).cast("long")
    )
    lhs = (
        left.withColumn("_side", F.lit(1))
        .withColumn("_rpack", null_pack)
        .withColumn("_tb", F.lit(None).cast(tb_type))
    )
    rhs = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        pack.alias("_rpack"),
        tb_right.alias("_tb"),
    )
    # align: add left-only columns as NULLs on the right side
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    unioned = lhs.unionByName(rhs.select(lhs.columns))

    # at equal ts: right rows sort before left (_side), and among tied
    # right rows the greatest _tb sorts LAST, so last(ignorenulls) picks
    # it (asc_nulls_first keeps the no-tiebreak case byte-compatible)
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_side").asc(),
            F.col("_tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = unioned.withColumn("_m", F.last("_rpack", ignorenulls=True).over(w))
    out = picked.filter(F.col("_side") == 1)
    for c in [ts_col] + right_cols:
        out = out.withColumn(prefix + c, F.col("_m")[c])
    return out.drop("_side", "_rpack", "_m", "_tb")


def in_window_agg(
    events: DataFrame,
    on: str,
    ts_col: str,
    aggs: dict[str, Column],
    window_micros: int,
) -> DataFrame:
    """Trailing-window aggregation: for every row, evaluate ``aggs`` over
    the rows of the same ``on`` key with ts in ``[ts - window, ts)``.

    RANGE frame over the integer microsecond key — one shuffle on the
    key, no self-join. Callers mix row types (e.g. purchases + views) in
    ``events`` and make each agg conditional on the row type; the frame
    excludes the current instant (half-open window).
    """
    w = (
        Window.partitionBy(on)
        .orderBy(event_micros(ts_col))
        .rangeBetween(-window_micros, -1)
    )
    # one select, not per-agg withColumn: identical specs then land in a
    # single Window operator (one pass over the sorted partition)
    return events.select(
        "*", *[expr.over(w).alias(name) for name, expr in aggs.items()]
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    band_micros: int,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs of the same ``on`` key with
    ``|left.ts - right.ts| <= band``, as an equi-join.

    Each right row lands in exactly one bucket of width ``band``; each
    left row probes its own bucket ±1 (which cover every timestamp
    within the band), so no pair is produced twice and none is missed.
    The exact band predicate is the post-join filter.
    """
    lm, rm = F.col("_lm"), F.col("_rm")

    def bucket(m: Column) -> Column:
        # bucket label = start-of-band micros (m - m % band). No
        # division at all, so the computation genuinely never leaves
        # the long domain — Spark's `/` on longs is double division,
        # exact only below 2^53, so it is deliberately avoided here.
        # Adjacent buckets differ by band_micros, not 1.
        return (m - m % band_micros).cast("long")

    lhs = left.select(
        F.col(on),
        *[F.col(c).alias(left_prefix + c) for c in left.columns if c != on],
        event_micros(ts_col).alias("_lm"),
    ).withColumn(
        "_bucket",
        F.explode(
            F.array(
                bucket(lm) - band_micros, bucket(lm), bucket(lm) + band_micros
            )
        ),
    )
    rhs = right.select(
        F.col(on),
        *[F.col(c).alias(right_prefix + c) for c in right.columns if c != on],
        event_micros(ts_col).alias("_rm"),
        bucket(event_micros(ts_col)).alias("_bucket"),
    )
    return (
        lhs.join(rhs, [on, "_bucket"])
        .filter(F.abs(lm - rm) <= band_micros)
        .drop("_bucket", "_lm", "_rm")
    )
