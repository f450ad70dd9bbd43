"""Skew-mitigation strategies as driver-verified catalog entries.

operators/skew.py's salted shapes were pytest-only (result-parity + plan
tests); these two queries put them in front of the DuckDB oracle so the
driver hash-checks that salting is result-IDENTICAL to the unsalted
semantics, not just shaped right. The oracles are deliberately the plain
unsalted SQL — that equivalence is the whole claim.

Reference parity: the reference's per-creator rollups
(analyze_insta_enhanced.py) never face skew at 5.4k creators; these are
the 100 TB insurance for the same aggregations when one hot key (a viral
creator, a bot-heavy event type) would otherwise melt a single reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import lsum, sql_lsum
from ..operators.skew import salted_count_distinct, salted_join
from ..sources.readers import load_table
from .registry import query


@query(
    "sk1_salted_distinct_users",
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
    FROM events GROUP BY event_type
    """,
)
def sk1_salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type through the SALTED two-stage shape
    (operators/skew.salted_count_distinct, 16 value-salts): stage 1
    dedups (type, salt(user), user) shards, stage 2 sums shard counts.

    The oracle is the plain ``COUNT(DISTINCT ...)`` — salting by the
    VALUE keeps dedup exact (equal users get equal salts) while a hot
    event type's fan-in spreads over 16 reducers instead of one. With 5
    event types, the unsalted plan at 100 TB puts ~20% of all events
    through each of 5 reducers; the salted plan is what survives.
    tests/test_skew.py holds the plan-shape guarantees; this entry puts
    the result identity in front of the driver."""
    events = load_table(spark, sf_dir, "events")
    return salted_count_distinct(events, "event_type", "user_id", n_salts=16)


@query(
    "sk2_salted_join_segment",
    f"""
    SELECT c.c_mktsegment, COUNT(*) AS n_events,
           {sql_lsum('e.value')} AS total_value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def sk2_salted_join_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events⋈customer revenue per market segment, with the join routed
    through operators/skew.salted_join (8 salts): the hot user's events
    split across 8 sub-keys and the customer dim is replicated 8× to
    meet them — the classic mid-size-dim skew fix when the dim is too
    big to broadcast. The oracle is the plain unsalted join+rollup;
    the exact money sum rides the scaled-long path
    (functions/exact.lsum) so the hash comparison is bit-exact under
    any partitioning."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = salted_join(events, dim, on="user_id", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_events"),
        lsum("value").alias("total_value"),
    )
