"""Skew-mitigation operators: salted equi-join and salted two-stage
distinct-count.

At 100 TB a handful of hot keys (the viral creator, the empty-string
platform, the null-ish default) can put one shuffle partition hours
behind the rest. AQE's skew-join split handles sort-merge joins after
the fact; these operators PRE-shard hot keys so the plan never builds
the hot partition at all, and they work for the shapes AQE doesn't
cover (aggregation hot keys, broadcast-ineligible mid-size dims).

Both are result-identical to their unsalted forms (asserted in
tests/test_skew.py): salting only re-routes rows, the final combine
puts them back.

Salts are DETERMINISTIC (xxhash64 of the row's own columns, mod n) —
`rand()`-based salting re-shards on retry, which breaks task-retry
idempotence and any oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n: int) -> Column:
    # row-content hash → stable under retries and repartitioning; mod in
    # the positive domain (pmod) so the salt is always 0..n-1
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)).cast("int")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    salt_by: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the LEFT side's hot keys are sharded across
    ``n_salts`` sub-keys and the RIGHT side is replicated n× to meet
    them: the join key becomes (on, salt), so one hot key spreads over
    n partitions instead of melting one.

    Use when the right side is too big to broadcast but small enough
    that n× replication is cheap (the classic mid-size dim). ``salt_by``
    defaults to every non-key left column — any deterministic row
    content works, it only needs to spread.

    Only left-preserving joins are result-identical to the unsalted
    join: the right side is replicated n_salts times, so right/full
    outer would emit every unmatched right row once PER REPLICA
    (n_salts null-padded duplicates). Rejected up front.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join how={how!r} is not result-identical to the "
            f"unsalted join (right side is replicated {n_salts}x; "
            f"unmatched right rows would duplicate). Allowed: inner/left/"
            f"semi/anti variants."
        )
    keys = [on] if isinstance(on, str) else list(on)
    salt_src = salt_by or [c for c in left.columns if c not in keys]
    if not salt_src:  # degenerate: key-only left — nothing to spread by
        salt_src = keys
    lhs = left.withColumn("_salt", _salt(salt_src, n_salts))
    rhs = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return lhs.join(rhs, keys + ["_salt"], how).drop("_salt")


def salted_count_distinct(
    df: DataFrame, group_col: str, value_col: str, n_salts: int = 16
) -> DataFrame:
    """``groupBy(k).agg(countDistinct(v))`` with a hot-key-proof shape:
    stage 1 dedups (k, salt(v), v) shards, stage 2 sums shard counts.

    A plain distinct-count shuffles every (k, v) pair into k's single
    partition; salting by the VALUE keeps dedup exact (equal values get
    equal salts, so no value is counted twice) while sharding the hot
    key's fan-in n ways. Returns (group_col, n_distinct).
    """
    shards = (
        df.select(
            group_col,
            F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts)).alias("_salt"),
            F.col(value_col).alias("_v"),
        )
        .groupBy(group_col, "_salt")
        .agg(F.count_distinct("_v").alias("_n"))
    )
    return shards.groupBy(group_col).agg(
        F.sum("_n").cast("bigint").alias("n_distinct")
    )
