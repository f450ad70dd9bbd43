"""SURVEY.md §2.9 CASE/bucketing classifiers — the reference's signature
operator family — mapped onto customer/part attributes.

All classifiers are pure Catalyst CASE WHEN chains plus broadcast joins
against literal dimension tables; zero UDFs, full whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.local_dim import local_dim

from ..operators.windows import top_k_per_group
from ..sources.readers import load_table
from .registry import query

# ---------------------------------------------------------------------------
# C2 — creator type + tier with the <1k demotion rule.
# ---------------------------------------------------------------------------

_TIER_SQL = """
        CASE WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE') THEN
                  CASE WHEN c_acctbal >= 1000 THEN 'UGC Experienced'
                       ELSE 'UGC Beginner' END
             WHEN c_acctbal < 1000 THEN 'UGC Beginner'
             WHEN c_acctbal < 3000 THEN 'Influencer 1K-10K'
             WHEN c_acctbal < 6000 THEN 'Influencer 10K-50K'
             WHEN c_acctbal < 9000 THEN 'Influencer 50K-500K'
             ELSE 'Influencer 500K-1M+' END
"""


@query(
    "c2_type_tier",
    f"""
    SELECT c_custkey,
           {_TIER_SQL} AS tier,
           CASE WHEN {_TIER_SQL} LIKE 'UGC%' THEN 'UGC Creator'
                ELSE 'Influencer' END AS creator_type
    FROM customer
    """,
)
def c2_type_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — UGC-vs-Influencer type + experience tier, including the
    reference's demotion rule (an 'Influencer' under the 1k floor becomes
    'UGC Beginner').

    Reference: analyze_insta_enhanced.py:837-960 — UGC keyword hit in
    name/bio (:856-870, segment-membership analog here), tier bands
    :872-892, demotion :874-876.
    """
    cust = load_table(spark, sf_dir, "customer")
    is_ugc = F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    bal = F.col("c_acctbal")
    tier = (
        F.when(
            is_ugc,
            F.when(bal >= 1000, "UGC Experienced").otherwise("UGC Beginner"),
        )
        .when(bal < 1000, "UGC Beginner")
        .when(bal < 3000, "Influencer 1K-10K")
        .when(bal < 6000, "Influencer 10K-50K")
        .when(bal < 9000, "Influencer 50K-500K")
        .otherwise("Influencer 500K-1M+")
    )
    return cust.select(
        "c_custkey",
        tier.alias("tier"),
        F.when(tier.startswith("UGC"), "UGC Creator")
        .otherwise("Influencer")
        .alias("creator_type"),
    )


# ---------------------------------------------------------------------------
# C3 — the literal pricing dimension table, broadcast-joined by tier.
# The reference hard-codes this table as nested if/else
# (analyze_insta_enhanced.py:894-954); here it is data, not code.
# ---------------------------------------------------------------------------

_PRICING_DIM = [
    # (tier, base_price, roi, impressions)
    ("UGC Beginner", 100.0, "2-3x", "1K-5K"),
    ("UGC Experienced", 300.0, "3-5x", "5K-20K"),
    ("Influencer 1K-10K", 150.0, "2-4x", "2K-10K"),
    ("Influencer 10K-50K", 500.0, "3-5x", "10K-50K"),
    ("Influencer 50K-500K", 2500.0, "4-6x", "50K-500K"),
    ("Influencer 500K-1M+", 4000.0, "5-8x", "500K-2M"),
]
_PRICING_DIM_SQL = "(VALUES " + ", ".join(
    f"('{t}', {b}, '{r}', '{i}')" for t, b, r, i in _PRICING_DIM
) + ") pd(tier, base_price, roi, impressions)"


@query(
    "c3_pricing_dim",
    f"""
    WITH tiers AS (
        SELECT c_custkey, {_TIER_SQL} AS tier FROM customer
    )
    SELECT c_custkey, tiers.tier, CAST(base_price AS DOUBLE) AS base_price,
           roi, impressions,
           -- VALUES literals are DECIMAL in DuckDB; cast to DOUBLE so the
           -- multiplication matches Spark's double arithmetic bit-for-bit
           CAST(base_price AS DOUBLE) * 0.4 AS price_15s,
           CAST(base_price AS DOUBLE) * 0.6 AS price_30s,
           CAST(base_price AS DOUBLE) * 1.0 AS price_60s,
           CAST(base_price AS DOUBLE) * 1.333 AS price_90s,
           CAST(base_price AS DOUBLE) * 2.0 AS price_3min
    FROM tiers JOIN {_PRICING_DIM_SQL} ON tiers.tier = pd.tier
    """,
)
def c3_pricing_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 — per-(type,tier) pricing: ROI range, impressions, and the 5
    video-length price points base × {0.4, 0.6, 1, 1.333, 2}.

    Reference: analyze_insta_enhanced.py:894-954 — a literal dimension
    table written as code; re-expressed as a 6-row broadcast dim so the
    join is a hash lookup and the table is maintainable data.
    """
    cust = c2_type_tier(spark, sf_dir)
    dim = local_dim(
        spark,
        _PRICING_DIM,
        "tier string, base_price double, roi string, impressions string",
    )
    base = F.col("base_price")
    return cust.join(F.broadcast(dim), "tier").select(
        "c_custkey",
        "tier",
        "base_price",
        "roi",
        "impressions",
        (base * 0.4).alias("price_15s"),
        (base * 0.6).alias("price_30s"),
        (base * 1.0).alias("price_60s"),
        (base * 1.333).alias("price_90s"),
        (base * 2.0).alias("price_3min"),
    )


# ---------------------------------------------------------------------------
# C8 — account-type boolean cascade (brand / creator / personal).
# ---------------------------------------------------------------------------


@query(
    "c8_account_type",
    """
    SELECT c_custkey,
           CASE WHEN c_mktsegment = 'MACHINERY' OR c_acctbal < 0 THEN 'brand'
                WHEN c_nationkey < 5 AND c_acctbal > 5000 THEN 'creator'
                ELSE 'personal' END AS account_type
    FROM customer
    """,
)
def c8_account_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 — brand/creator/personal cascade from profile signals.

    Reference: analyze_insta_enhanced.py:1814-1852 — brand keywords in
    category+bio or is_business → brand; shop-words in external_url →
    brand; verified & >50k → creator; default personal. Signal columns
    re-mapped to segment/balance/nation flags; the cascade shape (ordered
    CASE, first hit wins) is the operator.
    """
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(
            (F.col("c_mktsegment") == "MACHINERY") | (F.col("c_acctbal") < 0),
            "brand",
        )
        .when((F.col("c_nationkey") < 5) & (F.col("c_acctbal") > 5000), "creator")
        .otherwise("personal")
        .alias("account_type"),
    )


# ---------------------------------------------------------------------------
# C9 + F9 — niche scoring: weighted keyword scores → distribution % →
# >=2% threshold filter → confidence → overall argmax.
# ---------------------------------------------------------------------------

from .star_queries import _J4_DIM, _J4_DIM_SQL  # noqa: E402  (shared keyword dim)


@query(
    "c9_f9_niche_distribution",
    f"""
    WITH toks AS (
        SELECT p_partkey, unnest(string_split(lower(p_name), ' ')) AS token,
               2.0 AS weight
        FROM part
        UNION ALL
        SELECT p_partkey, unnest(string_split(lower(p_type), ' ')) AS token,
               1.0 AS weight
        FROM part
    ), scores AS (
        SELECT p_partkey, kd.category, SUM(weight) AS score
        FROM toks JOIN {_J4_DIM_SQL} ON toks.token = kd.kw
        GROUP BY p_partkey, kd.category
    ), windowed AS (
        SELECT p_partkey, category, score,
               score / SUM(score) OVER (PARTITION BY p_partkey) * 100
                   AS share_pct,
               score / MAX(score) OVER (PARTITION BY p_partkey) * 100
                   AS confidence,
               row_number() OVER (
                   PARTITION BY p_partkey ORDER BY score DESC, category ASC
               ) AS rnk
        FROM scores
    )
    SELECT p_partkey, category, score, share_pct, confidence,
           rnk = 1 AS is_primary_niche
    FROM windowed
    WHERE share_pct >= 2.0
    """,
)
def c9_f9_niche_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 + F9 + A10 — the niche classifier: weighted multi-source keyword
    scores per category, share-of-total distribution, >=2% threshold
    (F9), confidence = score/max*100, and the overall argmax with the
    declaration-order tie-break (Q9 → category name here).

    Reference: analyze_insta_enhanced.py:962-1112 — keyword table
    :965-986, weighted scoring :1036-1062, distribution + 2% filter
    :1066-1069, confidence :1075-1080, argmax :1072-1073. Scores are
    multiples of 0.5 (exact binary), so window sums are
    order-independent without the decimal detour.
    """
    part = load_table(spark, sf_dir, "part")
    dim = local_dim(spark, _J4_DIM, "category string, kw string")
    # one scan: both token sources explode from a single combined array
    # (weight carried in the struct) instead of a two-branch union
    combined = F.concat(
        F.transform(
            F.split(F.lower("p_name"), " "),
            lambda t: F.struct(t.alias("token"), F.lit(2.0).alias("weight")),
        ),
        F.transform(
            F.split(F.lower("p_type"), " "),
            lambda t: F.struct(t.alias("token"), F.lit(1.0).alias("weight")),
        ),
    )
    toks = part.select("p_partkey", F.explode(combined).alias("tw")).select(
        "p_partkey", F.col("tw.token").alias("token"), F.col("tw.weight").alias("weight")
    )
    scores = (
        toks.join(F.broadcast(dim), F.col("token") == F.col("kw"))
        .groupBy("p_partkey", "category")
        .agg(F.sum("weight").alias("score"))
    )
    w = Window.partitionBy("p_partkey")
    wrank = Window.partitionBy("p_partkey").orderBy(
        F.col("score").desc(), F.col("category").asc()
    )
    windowed = scores.select(
        "p_partkey",
        "category",
        "score",
        (F.col("score") / F.sum("score").over(w) * 100).alias("share_pct"),
        (F.col("score") / F.max("score").over(w) * 100).alias("confidence"),
        F.row_number().over(wrank).alias("rnk"),
    )
    return windowed.filter(F.col("share_pct") >= 2.0).select(
        "p_partkey",
        "category",
        "score",
        "share_pct",
        "confidence",
        (F.col("rnk") == 1).alias("is_primary_niche"),
    )
