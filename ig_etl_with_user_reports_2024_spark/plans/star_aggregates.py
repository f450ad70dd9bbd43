"""SURVEY.md §2.4 aggregation operators on the star schema.

Per-creator (customer-grain) aggregates: the reference computes each of
these with its own full pass over the in-memory post list; here each is a
single hash aggregate / window, and several could share one groupBy (the
creator-report plan in plans/creator_report.py does exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dsum, sql_dec_to_double, sql_dsum
from ..sources.readers import load_table
from .registry import query

# ---------------------------------------------------------------------------
# A1/A2/A3 — the three coexisting ER formulas (Q5), as one projection.
# ---------------------------------------------------------------------------


@query(
    "a123_er_formulas",
    """
    SELECT o_orderkey,
           (o_totalprice + 2 * (o_orderkey % 97)) / GREATEST(c_acctbal, 1.0)
               * 100 AS er_engagement,
           (o_totalprice + 5 * (o_orderkey % 97)) / GREATEST(c_acctbal, 1.0)
               * 100 AS er_interaction,
           (o_totalprice + 1 * (o_orderkey % 97)) / GREATEST(c_acctbal, 1.0)
               * 100 AS er_plain
    FROM orders JOIN customer ON c_custkey = o_custkey
    """,
)
def a123_er_formulas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A3 — per-post ER under all three comment weights (2x/5x/1x).

    Reference: analyze_insta_enhanced.py:433 (2x), :1519-1523 (5x),
    :523/:277/:451 (1x) — SURVEY.md Q5. likes=o_totalprice,
    comments=o_orderkey%97, followers=c_acctbal (guarded). Row-level
    double arithmetic is bit-exact across engines; only SUMs need the
    decimal treatment.
    """
    from ..functions.engagement import engagement_rate

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey)
    likes = F.col("o_totalprice")
    comments = (F.col("o_orderkey") % 97).cast("double")
    followers = F.col("c_acctbal")
    return j.select(
        "o_orderkey",
        engagement_rate(likes, comments, followers, 2).alias("er_engagement"),
        engagement_rate(likes, comments, followers, 5).alias("er_interaction"),
        engagement_rate(likes, comments, followers, 1).alias("er_plain"),
    )


# ---------------------------------------------------------------------------
# A6 — viral-post count: posts scoring > 2× the creator's mean.
# ---------------------------------------------------------------------------


@query(
    "a6_viral_count",
    f"""
    WITH with_avg AS (
        SELECT o_custkey, o_totalprice,
               {sql_dec_to_double("SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey)")}
                   / COUNT(*) OVER (PARTITION BY o_custkey) AS mean_price
        FROM orders
    )
    SELECT o_custkey,
           CAST(SUM(CASE WHEN o_totalprice > 2 * mean_price THEN 1 ELSE 0 END)
               AS BIGINT) AS viral_count,
           COUNT(*) AS n_posts
    FROM with_avg
    GROUP BY o_custkey
    """,
)
def a6_viral_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — count posts with score > 2× the per-creator mean.

    Reference: analyze_insta_enhanced.py:461-462. One whole-partition
    window for the exact mean (decimal sum / count), then a conditional
    count — a single shuffle on the creator key, no self-join.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    mean_price = (
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
        / F.count("*").over(w)
    )
    return (
        orders.select("o_custkey", "o_totalprice", mean_price.alias("mean_price"))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(F.col("o_totalprice") > 2 * F.col("mean_price"), 1).otherwise(0)
            ).alias("viral_count"),
            F.count("*").alias("n_posts"),
        )
    )


# ---------------------------------------------------------------------------
# A8 — distinct counts + capped diversity score.
# ---------------------------------------------------------------------------


@query(
    "a8_distinct_diversity",
    """
    SELECT o_custkey,
           COUNT(DISTINCT o_orderpriority) AS n_distinct,
           LEAST(100, COUNT(DISTINCT o_orderpriority) * 5) AS diversity_score
    FROM orders
    GROUP BY o_custkey
    """,
)
def a8_distinct_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — ``travel_frequency = |set(locations)|``, diversity
    ``min(100, n*5)``.

    Reference: analyze_insta_enhanced.py:192-193. Exact countDistinct
    here (hash-comparable); at 100 TB the engine swaps in
    ``approx_count_distinct`` — see a8_approx_distinct (rows-only check).
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_distinct"),
        F.least(F.lit(100), F.countDistinct("o_orderpriority") * 5).alias(
            "diversity_score"
        ),
    )


@query("a8_approx_distinct", None)  # rows-only: HLL sketches are engine-specific
def a8_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 (scale path) — approx_count_distinct(HLL++) per customer.

    The 100 TB form of a8: one pass, fixed memory per group, no distinct
    shuffle explosion. No SQL oracle (sketches differ per engine);
    tests/test_operators.py bounds its error vs the exact count.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.approx_count_distinct("o_orderpriority", 0.02).alias("approx_distinct")
    )


# ---------------------------------------------------------------------------
# A9 — global conditional counts (platform stats).
# ---------------------------------------------------------------------------


@query(
    "a9_platform_stats",
    """
    SELECT CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_building,
           CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_machinery,
           CAST(SUM(CASE WHEN c_mktsegment IN ('BUILDING','MACHINERY') THEN 1 ELSE 0 END)
               AS BIGINT) AS n_multi,
           COUNT(*) AS n_total
    FROM customer
    """,
)
def a9_platform_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 — creators-with-tiktok/-youtube/-linktree style indicator counts.

    Reference: jsontocsv_enhanced.py:328-339. ``sum(when(...))`` global
    aggregate — one partial-agg pass, single output row.
    """
    cust = load_table(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment")
    return cust.agg(
        F.sum(F.when(seg == "BUILDING", 1).otherwise(0)).alias("n_building"),
        F.sum(F.when(seg == "MACHINERY", 1).otherwise(0)).alias("n_machinery"),
        F.sum(F.when(seg.isin("BUILDING", "MACHINERY"), 1).otherwise(0)).alias(
            "n_multi"
        ),
        F.count("*").alias("n_total"),
    )


# ---------------------------------------------------------------------------
# A12 — split-half trend (Growing / Declining / Stable).
# ---------------------------------------------------------------------------


@query(
    "a12_split_half_trend",
    f"""
    WITH halves AS (
        SELECT o_custkey, o_totalprice,
               ntile(2) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey ASC
               ) AS half
        FROM orders
    ), agg AS (
        SELECT o_custkey,
               COUNT(*) AS n_posts,
               {sql_dec_to_double("SUM(CASE WHEN half = 1 THEN CAST(o_totalprice AS DECIMAL(18,2)) END)")}
                   / COUNT(CASE WHEN half = 1 THEN 1 END) AS recent_mean,
               {sql_dec_to_double("SUM(CASE WHEN half = 2 THEN CAST(o_totalprice AS DECIMAL(18,2)) END)")}
                   / COUNT(CASE WHEN half = 2 THEN 1 END) AS older_mean
        FROM halves
        GROUP BY o_custkey
    )
    SELECT o_custkey, n_posts, recent_mean, older_mean,
           CASE WHEN n_posts < 10 THEN 'Insufficient Data'
                WHEN recent_mean > older_mean * 1.15 THEN 'Growing'
                WHEN recent_mean < older_mean * 0.85 THEN 'Declining'
                ELSE 'Stable' END AS trend
    FROM agg
    """,
)
def a12_split_half_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 — mean(recent half) vs mean(older half) ±15% → trend label.

    Reference: analyze_insta_enhanced.py:501-511; halves follow the
    newest-first arrival order (Q7), encoded as an explicit (date desc,
    key) order. ntile(2) puts the extra row in the first (recent) tile in
    both engines. Means are exact decimal-sum/count.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").asc()
    )
    halves = orders.select(
        "o_custkey", "o_totalprice", F.ntile(2).over(w).alias("half")
    )

    def half_mean(h: int):
        s = F.sum(
            F.when(F.col("half") == h, F.col("o_totalprice")).cast("decimal(18,2)")
        ).cast("double")
        n = F.count(F.when(F.col("half") == h, 1))
        return s / n

    agg = halves.groupBy("o_custkey").agg(
        F.count("*").alias("n_posts"),
        half_mean(1).alias("recent_mean"),
        half_mean(2).alias("older_mean"),
    )
    trend = (
        F.when(F.col("n_posts") < 10, "Insufficient Data")
        .when(F.col("recent_mean") > F.col("older_mean") * 1.15, "Growing")
        .when(F.col("recent_mean") < F.col("older_mean") * 0.85, "Declining")
        .otherwise("Stable")
    )
    return agg.select(
        "o_custkey", "n_posts", "recent_mean", "older_mean", trend.alias("trend")
    )


# ---------------------------------------------------------------------------
# A13 — class-conditional means + ratio (sponsored vs organic).
# ---------------------------------------------------------------------------


@query(
    "a13_class_means_pivot",
    f"""
    SELECT o_custkey,
           {sql_dec_to_double("SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END)")}
               / COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS avg_sponsored,
           {sql_dec_to_double("SUM(CASE WHEN o_orderstatus <> 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END)")}
               / COUNT(CASE WHEN o_orderstatus <> 'F' THEN 1 END) AS avg_organic
    FROM orders
    GROUP BY o_custkey
    """,
)
def a13_class_means_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 — mean engagement for sponsored vs organic posts, pivoted wide.

    Reference: analyze_insta_enhanced.py:643-657 (sponsored_engagement /
    organic_engagement means). Conditional aggregation instead of
    groupBy+pivot: one pass, no second shuffle. NULL when a class is
    empty, matching the reference's None.
    """
    orders = load_table(spark, sf_dir, "orders")
    is_sponsored = F.col("o_orderstatus") == "F"

    def class_mean(cond):
        s = F.sum(F.when(cond, F.col("o_totalprice")).cast("decimal(18,2)")).cast(
            "double"
        )
        return s / F.count(F.when(cond, 1))

    return orders.groupBy("o_custkey").agg(
        class_mean(is_sponsored).alias("avg_sponsored"),
        class_mean(~is_sponsored).alias("avg_organic"),
    )


# ---------------------------------------------------------------------------
# A14 + C6 — indicator-point score summation + quality bucket.
# ---------------------------------------------------------------------------


@query(
    "a14_c6_fake_score",
    f"""
    WITH m AS (
        SELECT o_custkey,
               {sql_dsum('o_totalprice')} / COUNT(*) AS avg_price,
               COUNT(*) AS n_orders,
               COUNT(DISTINCT o_orderpriority) AS n_prio,
               MAX(o_totalprice) AS max_price,
               MIN(o_totalprice) AS min_price
        FROM orders
        GROUP BY o_custkey
    )
    SELECT o_custkey,
           (CASE WHEN avg_price < 30000 THEN 30 ELSE 0 END
            + CASE WHEN n_orders > 10 AND n_prio < 3 THEN 25 ELSE 0 END
            + CASE WHEN max_price > 2 * min_price THEN 20 ELSE 0 END) AS fake_score,
           100 - (CASE WHEN avg_price < 30000 THEN 30 ELSE 0 END
            + CASE WHEN n_orders > 10 AND n_prio < 3 THEN 25 ELSE 0 END
            + CASE WHEN max_price > 2 * min_price THEN 20 ELSE 0 END)
               AS authenticity_score,
           CASE WHEN (CASE WHEN avg_price < 30000 THEN 30 ELSE 0 END
            + CASE WHEN n_orders > 10 AND n_prio < 3 THEN 25 ELSE 0 END
            + CASE WHEN max_price > 2 * min_price THEN 20 ELSE 0 END) > 50
                THEN 'Poor'
                WHEN (CASE WHEN avg_price < 30000 THEN 30 ELSE 0 END
            + CASE WHEN n_orders > 10 AND n_prio < 3 THEN 25 ELSE 0 END
            + CASE WHEN max_price > 2 * min_price THEN 20 ELSE 0 END) > 25
                THEN 'Moderate'
                ELSE 'Good' END AS engagement_quality
    FROM m
    """,
)
def a14_c6_fake_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 + C11 + C6 — fake-follower indicator points (30/25/20) summed,
    authenticity = 100 - score, quality bucket (>50 Poor / >25 Moderate /
    Good).

    Reference: indicators analyze_insta_enhanced.py:283-298, buckets
    :300-305. Two-level select: metrics aggregate once, indicator CASEs
    are pure projection on the aggregated row.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy("o_custkey").agg(
        (dsum("o_totalprice") / F.count("*")).alias("avg_price"),
        F.count("*").alias("n_orders"),
        F.countDistinct("o_orderpriority").alias("n_prio"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )
    score = (
        F.when(F.col("avg_price") < 30000, 30).otherwise(0)
        + F.when((F.col("n_orders") > 10) & (F.col("n_prio") < 3), 25).otherwise(0)
        + F.when(F.col("max_price") > 2 * F.col("min_price"), 20).otherwise(0)
    )
    quality = (
        F.when(score > 50, "Poor").when(score > 25, "Moderate").otherwise("Good")
    )
    return m.select(
        "o_custkey",
        score.alias("fake_score"),
        (100 - score).alias("authenticity_score"),
        quality.alias("engagement_quality"),
    )
