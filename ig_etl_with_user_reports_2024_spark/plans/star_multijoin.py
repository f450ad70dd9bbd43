"""Multi-join analytical shapes over the full star schema — the classic
OLAP patterns a user of a general engine expects beyond the reference's
own two-table workload: selective fact-dim joins with aggregation,
join-reordering-friendly five-way stars, and having-style post-filters.

mj3 is deliberately written through the SQL API (``spark.sql`` over
registered views) — same Catalyst plan as the DataFrame form, proving
the engine's second query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import lsum, sql_lsum
from ..sources.readers import load_table, register_views
from .registry import query

# ---------------------------------------------------------------------------
# MJ1 — shipping-priority shape (selective 3-way join + ranked aggregate).
# ---------------------------------------------------------------------------


@query(
    "mj1_shipping_priority",
    f"""
    SELECT l_orderkey,
           {sql_lsum('l_extendedprice')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 20
    """,
)
def mj1_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective customer→orders→lineitem join with top-20 revenue ranking.

    Both filters sit on scan columns (pushdown), the customer side
    shrinks to one segment before joining, and the LIMIT rides a
    TakeOrdered — the canonical 'find the hot orders' plan.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(lsum("l_extendedprice").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# MJ2 — local-supplier-volume shape (5-way star + region filter).
# ---------------------------------------------------------------------------


@query(
    "mj2_region_volume",
    f"""
    SELECT n_name, {sql_lsum('l_extendedprice')} AS revenue,
           COUNT(*) AS n_items
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN supplier ON s_nationkey = n_nationkey
    JOIN lineitem ON l_suppkey = s_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def mj2_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way star join: tiny dims (region→nation→supplier) broadcast
    down onto the lineitem fact, orders filter pushed to its scan —
    Catalyst's join reordering keeps the fact table from shuffling twice.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .join(supplier, supplier.s_nationkey == nation.n_nationkey)
        .join(li, li.l_suppkey == supplier.s_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy("n_name")
        .agg(lsum("l_extendedprice").alias("revenue"), F.count("*").alias("n_items"))
    )


# ---------------------------------------------------------------------------
# MJ3 — large-order customers via the SQL API (HAVING + semi-join shape).
# ---------------------------------------------------------------------------

_MJ3_SQL = f"""
    SELECT c_custkey, c_name,
           COUNT(*) AS n_big_orders,
           {sql_lsum('o_totalprice')} AS big_order_value
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    GROUP BY c_custkey, c_name
    HAVING COUNT(*) >= 2
"""


@query("mj3_large_order_customers", _MJ3_SQL)
def mj3_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING-filtered join aggregate, written through the SQL API
    (``spark.sql`` over registered temp views) — identical Catalyst plan
    to the DataFrame form; the engine's second query surface.
    """
    register_views(spark, sf_dir)
    spark_sql = f"""
        SELECT c_custkey, c_name,
               COUNT(*) AS n_big_orders,
               -- rint before the cast: Spark's ANSI double->bigint TRUNCATES
               -- (DuckDB's rounds), so 12344.9999 would lose a cent
               CAST(SUM(CAST(rint(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS big_order_value
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        WHERE o_totalprice > 400000
        GROUP BY c_custkey, c_name
        HAVING COUNT(*) >= 2
    """
    return spark.sql(spark_sql)
