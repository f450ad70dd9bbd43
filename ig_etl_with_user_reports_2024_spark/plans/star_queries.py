"""SURVEY.md §2 operator inventory mapped onto the driver's star schema.

Each ``@query`` pairs an idiomatic-Spark plan with an ANSI-SQL oracle
(DuckDB) over the same parquet. The mapping (FIXTURES.md §B): creators →
``customer``, posts → ``orders``/``lineitem``, date windows →
``o_orderdate``/``events.ts``, broadcast dims → ``nation``/literal dims.

Plans are written scale-first: range predicates and projections sit
directly on the scan (parquet pushdown), per-key work is one shuffle
(groupBy or window on the key), small dims go through ``F.broadcast``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.local_dim import local_dim

from ..config import AS_OF_ORDERS, AS_OF_ORDERS_SQL, RECENT_DAYS
from ..functions import datetime_utils as dtu
from ..functions.exact import (
    davg,
    dsum,
    lsum,
    sql_davg,
    sql_dec_to_double,
    sql_dstddev_samp,
    sql_dsum,
    sql_lsum,
)
from ..operators.windows import lag_gap_days, top_k_per_group
from ..sources.readers import load_table
from .registry import query

# ---------------------------------------------------------------------------
# A4 — the single-pass multi-aggregate (TPC-H Q1 shape). The reference's
# avg/sum engagement metrics (analyze_insta_enhanced.py:444-452) done as one
# hash aggregate instead of ~10 list re-scans.
# ---------------------------------------------------------------------------


# Exact decimal operands: cast the RAW columns, multiply in the decimal
# domain (see functions/exact.py rule 1). ext<1e8 → (10,2); disc/tax<10 →
# (3,2); products stay well under precision 38 in both engines.
_EXT = "CAST(l_extendedprice AS DECIMAL(10,2))"
_ONE_MINUS_DISC = "(CAST('1.00' AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
_ONE_PLUS_TAX = "(CAST('1.00' AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))"


@query(
    "a4_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_lsum('l_quantity')} AS sum_qty,
           {sql_lsum('l_extendedprice')} AS sum_base_price,
           CAST(CAST(SUM({_EXT} * {_ONE_MINUS_DISC}) AS VARCHAR) AS DOUBLE)
               AS sum_disc_price,
           CAST(CAST(SUM({_EXT} * {_ONE_MINUS_DISC} * {_ONE_PLUS_TAX}) AS VARCHAR)
               AS DOUBLE) AS sum_charge,
           ({sql_lsum('l_quantity')} / COUNT(l_quantity)) AS avg_qty,
           ({sql_lsum('l_extendedprice')} / COUNT(l_extendedprice)) AS avg_price,
           ({sql_lsum('l_discount', 4)} / COUNT(l_discount)) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a4_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 avg/sum metrics as one hash aggregate.

    Reference: analyze_insta_enhanced.py:444-452 (avg_likes/avg_comments/
    totals) — re-expressed as the classic pricing-summary shape. Filter is
    on the scan (parquet min/max pushdown); Spark computes partial
    aggregates map-side, so the shuffle carries one row per
    (flag, status, partition) — this is the plan that survives 100 TB.

    Perf note (r3 profile of the r2 "regression"): warm execution is
    ~1.2s at sf0.1, of which the two decimal-product sums are ~0.7s; the
    r2 bench number (3.4s) was first-query cold cost (JIT + lineitem
    footer), now covered by bench.py's compile-warm pass. A scaled-long
    variant of the product sums measured 4x faster and bit-identical
    HERE, but was rejected as the registered plan: charge needs 10^-6
    scaling, whose 2^63 bound (~4e7 rows per group) fails at the 100 TB
    target, while the decimal(38) accumulator is unconditionally safe —
    the exactness-at-scale tax is deliberate (functions/exact.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    ext = F.col("l_extendedprice").cast("decimal(10,2)")
    one = F.lit("1.00").cast("decimal(3,2)")
    disc_price = ext * (one - F.col("l_discount").cast("decimal(3,2)"))
    charge = disc_price * (one + F.col("l_tax").cast("decimal(3,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            lsum("l_quantity").alias("sum_qty"),
            lsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (lsum("l_quantity") / F.count("l_quantity")).alias("avg_qty"),
            (lsum("l_extendedprice") / F.count("l_extendedprice")).alias("avg_price"),
            (lsum("l_discount", 4) / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# K1 + A2 + F2 — the flagship: top-6 posts by interaction score within the
# 90-day window, averaged into the headline engagement rate.
# ---------------------------------------------------------------------------


@query(
    "k1_top6_er",
    f"""
    WITH recent AS (
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        WHERE o_orderdate >= {AS_OF_ORDERS_SQL} - INTERVAL 90 DAY
          AND o_orderdate < {AS_OF_ORDERS_SQL}
    ), ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey ASC
               ) AS rn
        FROM recent
    )
    SELECT c_custkey,
           {sql_lsum('o_totalprice')} / COUNT(*) * 100.0
               / GREATEST(c_acctbal, 1.0) AS avg_top6_er,
           COUNT(*) AS n_top
    FROM ranked JOIN customer ON c_custkey = o_custkey
    WHERE rn <= 6
    GROUP BY c_custkey, c_acctbal
    """,
)
def k1_top6_er(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY.md §7.1): 90-day filter → per-creator top-6 by
    score → avg ER, creators=customer / posts=orders.

    Reference: filter analyze_insta_enhanced.py:1502-1514, interaction
    score :1519-1523, top-6 slice + avg :1535-1541. One window shuffle on
    the creator key, then the customer join (broadcast-able when the
    ranked side is the big one); the date range prunes the scan.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    recent = orders.filter(
        dtu.within_days_ts(F.col("o_orderdate"), AS_OF_ORDERS, RECENT_DAYS)
    ).select("o_custkey", "o_orderkey", "o_totalprice")
    top = top_k_per_group(
        recent,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=6,
    )
    # ER denominator (the creator's follower analog) is constant per group:
    # factor it out and divide the exact numerator sum once — summing
    # per-row double ratios is partition-order-dependent (exact.py rule 2).
    avg_er = (
        lsum("o_totalprice")
        / F.count("*")
        * 100.0
        / F.greatest(F.col("c_acctbal"), F.lit(1.0))
    )
    return (
        top.join(cust, top.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            avg_er.alias("avg_top6_er"),
            F.count("*").alias("n_top"),
        )
        .drop("c_acctbal")
    )


# ---------------------------------------------------------------------------
# F2 — parameterized date-range filter (90-day window, pinned as_of).
# ---------------------------------------------------------------------------


@query(
    "f2_recent_window",
    f"""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderdate >= {AS_OF_ORDERS_SQL} - INTERVAL 90 DAY
      AND o_orderdate < {AS_OF_ORDERS_SQL}
    """,
)
def f2_recent_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2 — the 90-days-before-as_of row filter.

    Reference: analyze_insta_enhanced.py:72-90 (parameterized, dead) and
    :1502-1514 (90-day, live), with wall-clock now() replaced by pinned
    as_of (Q8). The predicate is a closed range on the scan column →
    parquet row-group pruning at scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        dtu.within_days_ts(F.col("o_orderdate"), AS_OF_ORDERS, RECENT_DAYS)
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


# ---------------------------------------------------------------------------
# J1 — the scraper's work-queue anti-join.
# ---------------------------------------------------------------------------


@query(
    "j1_work_queue_anti_join",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j1_work_queue_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 — urls-not-yet-done anti-join (customers with no orders).

    Reference: insta_scraper_enhanced.py:497-509 (input minus inputdone).
    ``left_anti`` lets Catalyst pick broadcast-anti when the done side is
    small; no driver-side set like the reference builds.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# J3 — users ⋈ posts equi-join.
# ---------------------------------------------------------------------------


@query(
    "j3_users_posts_join",
    """
    SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
    FROM customer JOIN orders ON o_custkey = c_custkey
    """,
)
def j3_users_posts_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 — pair each creator profile with their posts.

    Reference: implicit same-directory pairing at
    analyze_insta_enhanced.py:1713-1714. Inner equi-join on the creator
    key — sort-merge at scale, broadcast if the profile side fits.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return cust.join(orders, cust.c_custkey == orders.o_custkey).select(
        "c_custkey", "c_mktsegment", "o_orderkey", "o_totalprice"
    )


# ---------------------------------------------------------------------------
# A7 — frequency maps (count-by) as groupBy.
# ---------------------------------------------------------------------------


@query(
    "a7_frequency_map",
    """
    SELECT user_id, event_type, COUNT(*) AS cnt
    FROM events
    GROUP BY user_id, event_type
    """,
)
def a7_frequency_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — Counter-style frequency map (per user × event type).

    Reference: Counter over locations/hours/hashtags
    (analyze_insta_enhanced.py:189,222,1592-1602). groupBy-count with
    map-side partial aggregation; the map lives as rows, not a dict.
    """
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# A5 — stddev-based consistency score.
# ---------------------------------------------------------------------------


@query(
    "a5_consistency_score",
    f"""
    SELECT o_custkey,
           GREATEST(0.0, 100.0 -
               {sql_dstddev_samp('o_totalprice', 2)}
               / GREATEST({sql_davg('o_totalprice')}, 0.1) * 100.0
           ) AS consistency,
           COUNT(*) AS n_posts
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 2
    """,
)
def a5_consistency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — ``max(0, 100 - stdev/max(mean, 0.1)*100)`` per creator.

    Reference: analyze_insta_enhanced.py:455-458 (statistics.stdev =
    sample stddev, needs >=2 posts). Stddev is computed from exact
    decimal sums (functions/exact.py) so the score is identical under any
    partitioning — see dstddev_samp docstring.
    """
    from ..functions.exact import dstddev_samp

    orders = load_table(spark, sf_dir, "orders")
    consistency = F.greatest(
        F.lit(0.0),
        F.lit(100.0)
        - dstddev_samp("o_totalprice", 2)
        / F.greatest(davg("o_totalprice"), F.lit(0.1))
        * 100.0,
    )
    return (
        orders.groupBy("o_custkey")
        .agg(
            consistency.alias("consistency"),
            F.count("*").alias("n_posts"),
        )
        .filter(F.col("n_posts") >= 2)
    )


# ---------------------------------------------------------------------------
# A11 + C4 — mean inter-post gap → posting-frequency bucket.
# ---------------------------------------------------------------------------

_C4_CASE_SQL = """
        CASE WHEN avg_gap_days IS NULL THEN 'Unknown'
             WHEN avg_gap_days < 0.5 THEN 'Multiple times daily'
             WHEN avg_gap_days < 1 THEN 'Daily'
             WHEN avg_gap_days < 2 THEN 'Every other day'
             WHEN avg_gap_days < 7 THEN 'Weekly'
             WHEN avg_gap_days < 14 THEN 'Bi-weekly'
             ELSE 'Monthly or less' END
"""


@query(
    "a11_post_gap_frequency",
    f"""
    WITH gaps AS (
        SELECT o_custkey,
               (epoch(o_orderdate) -
                epoch(LEAD(o_orderdate) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey ASC))) / 86400.0
                   AS gap_days
        FROM orders
    ), per_user AS (
        SELECT o_custkey,
               {sql_davg('gap_days', 6)} AS avg_gap_days,
               COUNT(gap_days) AS n_gaps
        FROM gaps
        GROUP BY o_custkey
    )
    SELECT o_custkey, avg_gap_days, n_gaps,
           {_C4_CASE_SQL} AS post_frequency
    FROM per_user
    """,
)
def a11_post_gap_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 + C4 — avg days between consecutive posts, bucketed.

    Reference: gap mean analyze_insta_enhanced.py:465-473; buckets
    :472-485. lag window over (creator, time desc) — one shuffle; the
    bucket CASE is pure codegen.
    """
    orders = load_table(spark, sf_dir, "orders")
    gaps = lag_gap_days(
        orders.select("o_custkey", "o_orderkey", "o_orderdate"),
        group_col="o_custkey",
        ts_col="o_orderdate",
        tiebreak="o_orderkey",
    )
    per_user = gaps.groupBy("o_custkey").agg(
        davg("gap_days", 6).alias("avg_gap_days"),
        F.count("gap_days").alias("n_gaps"),
    )
    bucket = (
        F.when(F.col("avg_gap_days").isNull(), "Unknown")
        .when(F.col("avg_gap_days") < 0.5, "Multiple times daily")
        .when(F.col("avg_gap_days") < 1, "Daily")
        .when(F.col("avg_gap_days") < 2, "Every other day")
        .when(F.col("avg_gap_days") < 7, "Weekly")
        .when(F.col("avg_gap_days") < 14, "Bi-weekly")
        .otherwise("Monthly or less")
    )
    return per_user.select(
        "o_custkey", "avg_gap_days", "n_gaps", bucket.alias("post_frequency")
    )


# ---------------------------------------------------------------------------
# C1 — creator-size CASE classifier.
# ---------------------------------------------------------------------------


@query(
    "c1_size_buckets",
    """
    SELECT CASE WHEN c_acctbal <= 0 THEN 'Unknown'
                WHEN c_acctbal < 1000 THEN 'Nano'
                WHEN c_acctbal < 3000 THEN 'Micro'
                WHEN c_acctbal < 6000 THEN 'Mid-Tier'
                WHEN c_acctbal < 9000 THEN 'Macro'
                ELSE 'Mega' END AS size_bucket,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer
    GROUP BY 1
    """,
)
def c1_size_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 — follower-count size classifier as a CASE chain.

    Reference: analyze_insta_enhanced.py:1655-1678 (Nano<5k, Micro<50k,
    Mid-Tier<500k, Macro<1M, Mega; 0→Unknown), band edges re-scaled to the
    acctbal domain. Pure whole-stage-codegen CASE + hash agg.
    """
    cust = load_table(spark, sf_dir, "customer")
    bucket = (
        F.when(F.col("c_acctbal") <= 0, "Unknown")
        .when(F.col("c_acctbal") < 1000, "Nano")
        .when(F.col("c_acctbal") < 3000, "Micro")
        .when(F.col("c_acctbal") < 6000, "Mid-Tier")
        .when(F.col("c_acctbal") < 9000, "Macro")
        .otherwise("Mega")
    )
    return (
        cust.select(bucket.alias("size_bucket"), "c_acctbal")
        .groupBy("size_bucket")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# F3 — 300-day recency flag (boolean column, not a filter).
# ---------------------------------------------------------------------------


@query(
    "f3_recent_flag",
    f"""
    SELECT o_orderkey, o_custkey,
           o_orderdate > {AS_OF_ORDERS_SQL} - INTERVAL 300 DAY AS is_recent
    FROM orders
    """,
)
def f3_recent_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — per-collaboration 'is_recent' boolean (300-day window).

    Reference: analyze_insta_enhanced.py:1280-1307. A projected predicate,
    not a filter — downstream classifiers consume it.
    """
    import datetime as dt

    orders = load_table(spark, sf_dir, "orders")
    cutoff = AS_OF_ORDERS - dt.timedelta(days=300)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_orderdate") > F.lit(cutoff)).alias("is_recent"),
    )


# ---------------------------------------------------------------------------
# F4/F5 — categorical predicate filter (clips-only passes).
# ---------------------------------------------------------------------------


@query(
    "f4_category_filter",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
)
def f4_category_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 — ``product_type == 'clips'`` equality filter (returnflag analog).

    Reference: analyze_insta_enhanced.py:1149,1173,1203,1229 — four
    separate passes in the reference; a single pushed-down predicate here
    (shows up as PushedFilters in the scan at scale).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# F7 + Q6 — the fake-follower mixed window: numerator over the 20 most
# recent rows, denominator over ALL rows (bug-for-bug faithful).
# ---------------------------------------------------------------------------


@query(
    "f7_recent20_mixed_window",
    f"""
    WITH ranked AS (
        SELECT o_custkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    )
    SELECT o_custkey,
           {sql_dec_to_double("SUM(CASE WHEN rn <= 20 THEN CAST(o_totalprice AS DECIMAL(18,2)) END)")}
               AS recent20_sum,
           COUNT(*) AS n_all,
           {sql_dec_to_double("SUM(CASE WHEN rn <= 20 THEN CAST(o_totalprice AS DECIMAL(18,2)) END)")}
               / COUNT(*) AS mixed_rate
    FROM ranked
    GROUP BY o_custkey
    """,
)
def f7_recent20_mixed_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 + Q6 — sum over the 20 most-recent posts divided by the count of
    ALL posts.

    Reference: analyze_insta_enhanced.py:267-277 slices ``edges[:20]`` for
    likes/comments but divides by ``len(edges)`` — a real quirk (SURVEY.md
    Q6), reproduced faithfully so the compat path hash-matches.
    """
    orders = load_table(spark, sf_dir, "orders")
    ranked = top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").asc()],
        k=1 << 62,  # rank only; the filter is in the aggregate
    )
    recent_sum = F.sum(
        F.when(F.col("rn") <= 20, F.col("o_totalprice")).cast("decimal(18,2)")
    ).cast("double")
    return ranked.groupBy("o_custkey").agg(
        recent_sum.alias("recent20_sum"),
        F.count("*").alias("n_all"),
        (recent_sum / F.count("*")).alias("mixed_rate"),
    )


# ---------------------------------------------------------------------------
# F8 — stoplist + length filter on exploded tokens.
# ---------------------------------------------------------------------------

_STOPLIST = (
    "the and for you your with this that are was will have has had can "
    "could would should about just like what when where who how"
).split()
_STOPLIST_SQL = ", ".join(f"'{w}'" for w in _STOPLIST)


@query(
    "f8_stoplist_tokens",
    f"""
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    )
    SELECT token, COUNT(*) AS cnt
    FROM toks
    WHERE length(token) >= 3 AND token NOT IN ({_STOPLIST_SQL})
    GROUP BY token
    """,
)
def f8_stoplist_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — mention stoplist/length filter on exploded tokens.

    Reference: analyze_insta_enhanced.py:1314,1416,1600 (drop mentions
    len<3 or in a 26-word stoplist). Explode → filter → count; the filter
    runs before the shuffle so only surviving tokens move.
    """
    from ..functions.text import word_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(word_tokens(F.col("text"))).alias("token"))
    return (
        toks.filter((F.length("token") >= 3) & ~F.col("token").isin(_STOPLIST))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# J2 — substring theta-join against a broadcast dim, first match wins.
# ---------------------------------------------------------------------------

_J2_KEYWORDS = [
    ("small", 1), ("red", 2), ("blue", 3), ("hot", 4), ("big", 5),
    ("green", 6), ("widget", 7), ("gear", 8),
]
_J2_DIM_SQL = "(VALUES " + ", ".join(f"('{k}', {o})" for k, o in _J2_KEYWORDS) + ") dim(kw, ord)"


@query(
    "j2_first_match_theta_join",
    f"""
    SELECT p.p_partkey, min_by(dim.kw, dim.ord) AS matched_kw
    FROM part p LEFT JOIN {_J2_DIM_SQL}
      ON p.p_name LIKE '%' || dim.kw || '%'
    GROUP BY p.p_partkey
    """,
)
def j2_first_match_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 — substring theta-join vs a small dim; FIRST match (dim order) wins.

    Reference: analyze_insta_enhanced.py:199-218 — nested loop over the
    cities list with ``break`` on first hit; dim-file order is the
    tie-break (Q10). Here: broadcast theta-join + ``min_by`` on the
    declaration-order column — same semantics, one pass, no driver loop.
    """
    part = load_table(spark, sf_dir, "part")
    dim = local_dim(spark, _J2_KEYWORDS, "kw string, ord int")
    joined = part.join(
        F.broadcast(dim), F.col("p_name").contains(F.col("kw")), "left"
    )
    return joined.groupBy("p_partkey").agg(
        F.min_by("kw", "ord").alias("matched_kw")
    )


# ---------------------------------------------------------------------------
# J4 + A10 — keyword-dim token join with per-source weights.
# ---------------------------------------------------------------------------

_J4_DIM = [
    ("size", "small"), ("size", "big"), ("size", "large"), ("size", "mini"),
    ("color", "red"), ("color", "blue"), ("color", "green"), ("color", "hot"),
    ("mech", "widget"), ("mech", "gear"), ("mech", "bolt"), ("mech", "gizmo"),
    ("grade", "economy"), ("grade", "standard"), ("grade", "promo"),
]
_J4_DIM_SQL = "(VALUES " + ", ".join(f"('{c}', '{k}')" for c, k in _J4_DIM) + ") kd(category, kw)"


@query(
    "j4_a10_keyword_scores",
    f"""
    WITH toks AS (
        SELECT p_partkey, unnest(string_split(lower(p_name), ' ')) AS token,
               2.0 AS weight
        FROM part
        UNION ALL
        SELECT p_partkey, unnest(string_split(lower(p_type), ' ')) AS token,
               1.0 AS weight
        FROM part
    )
    SELECT p_partkey, kd.category, SUM(weight) AS score, COUNT(*) AS hits
    FROM toks JOIN {_J4_DIM_SQL} ON toks.token = kd.kw
    GROUP BY p_partkey, kd.category
    """,
)
def j4_a10_keyword_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 + A10 — token-vs-keyword-dim join with source weights
    (username 2.0 / bio 1.5 / name 1.0 in the reference), summed per
    (entity, category).

    Reference: membership loops analyze_insta_enhanced.py:1026 and the
    weighted sums :1036-1062. Explode both token sources with their
    weight, broadcast-join the keyword dim, one groupBy. Weights are
    exact binary fractions, so the double sum is order-independent.
    """
    part = load_table(spark, sf_dir, "part")
    dim = local_dim(spark, _J4_DIM, "category string, kw string")
    # one scan: both token sources explode from a single combined array
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
    return (
        toks
        .join(F.broadcast(dim), F.col("token") == F.col("kw"))
        .groupBy("p_partkey", "category")
        .agg(F.sum("weight").alias("score"), F.count("*").alias("hits"))
    )


# ---------------------------------------------------------------------------
# J5 / SO1 — paginated-merge dedup, first occurrence wins.
# ---------------------------------------------------------------------------


@query(
    "j5_page_merge_dedup",
    """
    WITH pages AS (
        SELECT o_orderkey, o_totalprice, 1 AS page FROM orders
        UNION ALL
        SELECT o_orderkey, o_totalprice * 2, 2 AS page
        FROM orders WHERE o_orderkey % 5 = 0
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY o_orderkey ORDER BY page ASC
        ) AS rn
        FROM pages
    )
    SELECT o_orderkey, o_totalprice, page FROM ranked WHERE rn = 1
    """,
)
def j5_page_merge_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — merge paginated fetches, skipping ids already seen
    (first-occurrence wins).

    Reference: insta_scraper_enhanced.py:299-322 — nested-loop merge of
    GraphQL pages keyed on node.id. Spark: union + row_number over the
    arrival-order column (page) — dropDuplicates alone would not
    guarantee WHICH duplicate survives (Q10).
    """
    orders = load_table(spark, sf_dir, "orders")
    p1 = orders.select(
        "o_orderkey", "o_totalprice", F.lit(1).alias("page")
    )
    p2 = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .select("o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice"),
                F.lit(2).alias("page"))
    )
    merged = top_k_per_group(
        p1.unionAll(p2), ["o_orderkey"], [F.col("page").asc()], k=1
    )
    return merged.select("o_orderkey", "o_totalprice", "page")


@query(
    "so1_first_occurrence_dedup",
    """
    WITH ranked AS (
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
               row_number() OVER (
                   PARTITION BY l_orderkey
                   ORDER BY l_linenumber ASC, l_partkey ASC, l_suppkey ASC
               ) AS rn
        FROM lineitem
    )
    SELECT l_orderkey, l_partkey, l_linenumber FROM ranked WHERE rn = 1
    """,
)
def so1_first_occurrence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1 — first-occurrence dedup with an explicit arrival-order column.

    Reference: seen-set loops (analyze_insta_enhanced.py:179-185,
    1316-1323). ``dropDuplicates`` is nondeterministic about the survivor;
    a row_number over the position column is the Q10-faithful form.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # (orderkey, linenumber) is NOT unique in this data — extend the order
    # to a total one or the surviving row is partition-dependent (Q10).
    first = top_k_per_group(
        li.select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"),
        ["l_orderkey"],
        [F.col("l_linenumber").asc(), F.col("l_partkey").asc(), F.col("l_suppkey").asc()],
        k=1,
    )
    return first.select("l_orderkey", "l_partkey", "l_linenumber")


# ---------------------------------------------------------------------------
# F6 — private/empty-profile null-guarded filter.
# ---------------------------------------------------------------------------


@query(
    "f6_null_guard_filter",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT COALESCE(c_acctbal < 0, TRUE)
    """,
)
def f6_null_guard_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — drop private/no-data profiles: ``NOT coalesce(flag, true)``
    treats missing as excluded.

    Reference: insta_scraper_enhanced.py:144-151,326-331 (skip private or
    empty profiles). The null-as-true coalesce is the exact tolerant-
    schema semantic (§1.3).
    """
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(
        ~F.coalesce(F.col("c_acctbal") < 0, F.lit(True))
    ).select("c_custkey", "c_name", "c_acctbal")


# ---------------------------------------------------------------------------
# X3 — substring-membership predicates (keyword-in-bio tests).
# ---------------------------------------------------------------------------


@query(
    "x3_substring_membership",
    """
    SELECT p_partkey,
           contains(lower(p_name), 'red') OR contains(lower(p_name), 'blue')
               AS has_color_kw,
           lower(p_type) LIKE '%econo%' AS is_economy_like,
           regexp_matches(lower(p_name), '^(small|large) ') AS size_prefixed
    FROM part
    """,
)
def x3_substring_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — keyword-in-text membership: contains / LIKE / rlike.

    Reference: bio keyword tests analyze_insta_enhanced.py:565,589-592,
    857,866; platform-in-url :812-833; pattern match :148-158. All
    codegen'd string predicates — the J4 token join is the word-accurate
    variant when substring false-positives matter.
    """
    part = load_table(spark, sf_dir, "part")
    name_l = F.lower("p_name")
    return part.select(
        "p_partkey",
        (name_l.contains("red") | name_l.contains("blue")).alias("has_color_kw"),
        F.lower("p_type").like("%econo%").alias("is_economy_like"),
        name_l.rlike("^(small|large) ").alias("size_prefixed"),
    )
