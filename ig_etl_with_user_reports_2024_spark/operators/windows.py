"""Window / analytic operators (SURVEY.md §2.5-2.6: K1-K6, A11, A12).

All are single-shuffle window functions partitioned by the group key —
the reference's per-creator Python loops become one hash-partition pass.
Every ordering carries an explicit final tie-break column so results are
deterministic under any partitioning (SURVEY.md Q9/Q10: the reference
relies on Python sort stability / list arrival order).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """K1/K2/K3 — keep the top-k rows per group under a total order.

    Reference: sort-desc-then-slice loops (analyze_insta_enhanced.py:
    1535-1541 top-6 by interaction score; :514-531 latest-6; :1608-1609
    top-10 hashtags). One window shuffle; at scale this is the standard
    rank-and-filter plan and AQE handles group skew.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def lag_gap_days(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    tiebreak: str,
    gap_col: str = "gap_days",
) -> DataFrame:
    """A11 — days between consecutive rows per group (newest→older lag).

    Reference computes mean days between posts by iterating the
    newest-first list (analyze_insta_enhanced.py:465-473). Here: lag over
    a descending time window; gap = (ts - next_older_ts) in days.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak).asc()
    )
    prev = F.lag(F.col(ts_col), -1).over(w)  # the next-older row
    # cast("timestamp") first: TIMESTAMP_NTZ has no direct numeric cast
    to_epoch = lambda c: c.cast("timestamp").cast("double")  # noqa: E731
    return df.withColumn(gap_col, (to_epoch(F.col(ts_col)) - to_epoch(prev)) / 86400.0)


def split_half_trend(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_cols: Sequence[Column],
    min_rows: int = 10,
    tolerance: float = 0.15,
) -> DataFrame:
    """A12 — split each group's rows (in the given order) into two halves,
    compare mean(value): recent > older*(1+tol) → 'Growing', < *(1-tol) →
    'Declining', else 'Stable'; groups with < min_rows → 'Insufficient Data'.

    Reference: analyze_insta_enhanced.py:501-511 — halves are list order,
    i.e. newest-first arrival order (SURVEY.md Q7); callers pass that order
    explicitly. Uses ntile(2) over one window + conditional aggregation —
    a single shuffle on the group key.
    """
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    halves = df.withColumn("_half", F.ntile(2).over(w))
    agg = halves.groupBy(group_col).agg(
        F.count("*").alias("_n"),
        F.avg(F.when(F.col("_half") == 1, F.col(value_col))).alias("_recent_mean"),
        F.avg(F.when(F.col("_half") == 2, F.col(value_col))).alias("_older_mean"),
    )
    trend = (
        F.when(F.col("_n") < min_rows, F.lit("Insufficient Data"))
        .when(F.col("_recent_mean") > F.col("_older_mean") * (1 + tolerance), "Growing")
        .when(F.col("_recent_mean") < F.col("_older_mean") * (1 - tolerance), "Declining")
        .otherwise("Stable")
    )
    return agg.select(group_col, trend.alias("trend"))
