"""SURVEY.md §2.5 top-k/sorts and §2.8 scalar-function operators.

Top-k = rank-and-filter windows with total orders (Q9/Q10 tie-breaks made
explicit). Scalars = built-in JVM expressions only — regex, string, date,
JSON — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.local_dim import local_dim

from ..config import AS_OF_ORDERS_SQL
from ..operators.windows import top_k_per_group
from ..sources.readers import load_table
from .registry import query

# ---------------------------------------------------------------------------
# K2 — latest-6 posts pivoted to Post1..Post6 columns.
# ---------------------------------------------------------------------------


@query(
    "k2_latest6_pivot",
    """
    WITH ranked AS (
        SELECT o_custkey, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey ASC
               ) AS rn
        FROM orders
    )
    SELECT o_custkey,
           MAX(CASE WHEN rn = 1 THEN o_totalprice END) AS post1_price,
           MAX(CASE WHEN rn = 2 THEN o_totalprice END) AS post2_price,
           MAX(CASE WHEN rn = 3 THEN o_totalprice END) AS post3_price,
           MAX(CASE WHEN rn = 4 THEN o_totalprice END) AS post4_price,
           MAX(CASE WHEN rn = 5 THEN o_totalprice END) AS post5_price,
           MAX(CASE WHEN rn = 6 THEN o_totalprice END) AS post6_price
    FROM ranked WHERE rn <= 6
    GROUP BY o_custkey
    """,
)
def k2_latest6_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 — latest 6 posts by time, labeled Post1..Post6 (wide pivot).

    Reference: analyze_insta_enhanced.py:514-531 (latest_posts_er dict
    keyed 'Post1'..'Post6'); the CSV pivot jsontocsv_enhanced.py:135-150.
    Conditional aggregation over the rank — one window + one groupBy,
    no ``pivot()`` second pass.
    """
    orders = load_table(spark, sf_dir, "orders")
    ranked = top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"),
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").asc()],
        k=6,
    )
    aggs = [
        F.max(F.when(F.col("rn") == i, F.col("o_totalprice"))).alias(
            f"post{i}_price"
        )
        for i in range(1, 7)
    ]
    return ranked.groupBy("o_custkey").agg(*aggs)


# ---------------------------------------------------------------------------
# K3 — global top-10 by count with deterministic tie-break.
# ---------------------------------------------------------------------------


@query(
    "k3_top10_tokens",
    """
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    ), counts AS (
        SELECT token, COUNT(*) AS cnt FROM toks
        WHERE length(token) >= 3 GROUP BY token
    )
    SELECT token, cnt FROM counts
    ORDER BY cnt DESC, token ASC
    LIMIT 10
    """,
)
def k3_top10_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 — top-10 hashtags/mentions by frequency.

    Reference: analyze_insta_enhanced.py:1608-1609 (sorted desc, take 10;
    Python ties = first-seen order, Q10 — here the tie-break is the token
    itself, explicit and partition-independent). orderBy+limit lets Spark
    run a TakeOrdered (partial top-k per partition, no full sort).
    """
    from ..functions.text import word_tokens

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(word_tokens(F.col("text"))).alias("token"))
        .filter(F.length("token") >= 3)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# K4 + C5 + X10 — modal posting hour → daypart classifier.
# ---------------------------------------------------------------------------


@query(
    "k4_c5_modal_hour",
    """
    WITH hours AS (
        SELECT user_id, hour(ts) AS hr, COUNT(*) AS cnt
        FROM events GROUP BY user_id, hour(ts)
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY cnt DESC, hr ASC
        ) AS rn
        FROM hours
    )
    SELECT user_id, hr AS modal_hour, cnt AS modal_cnt,
           CASE WHEN hr BETWEEN 5 AND 11 THEN 'Morning (5AM-12PM)'
                WHEN hr BETWEEN 12 AND 16 THEN 'Afternoon (12PM-5PM)'
                WHEN hr BETWEEN 17 AND 21 THEN 'Evening (5PM-10PM)'
                ELSE 'Night (10PM-5AM)' END AS best_posting_time
    FROM ranked WHERE rn = 1
    """,
)
def k4_c5_modal_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 + C5 — modal posting hour per user, bucketed into dayparts.

    Reference: Counter.most_common(1) at analyze_insta_enhanced.py:490
    (ties = insertion order, Q10 → explicit hour-asc tie-break here);
    dayparts :491-498. Count-then-argmax is two stages of the same
    shuffle key, so Spark fuses them into one exchange.
    """
    events = load_table(spark, sf_dir, "events")
    hours = (
        events.select("user_id", F.hour("ts").alias("hr"))
        .groupBy("user_id", "hr")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = top_k_per_group(
        hours, ["user_id"], [F.col("cnt").desc(), F.col("hr").asc()], k=1
    )
    daypart = (
        F.when(F.col("hr").between(5, 11), "Morning (5AM-12PM)")
        .when(F.col("hr").between(12, 16), "Afternoon (12PM-5PM)")
        .when(F.col("hr").between(17, 21), "Evening (5PM-10PM)")
        .otherwise("Night (10PM-5AM)")
    )
    return ranked.select(
        "user_id",
        F.col("hr").alias("modal_hour"),
        F.col("cnt").alias("modal_cnt"),
        daypart.alias("best_posting_time"),
    )


# ---------------------------------------------------------------------------
# K6 — capped collect with 4-priority cascade (UGC examples).
# ---------------------------------------------------------------------------


@query(
    "k6_priority_cascade",
    """
    WITH prioritized AS (
        SELECT o_custkey, o_orderkey,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                    WHEN o_orderpriority = '2-HIGH' THEN 2
                    WHEN o_orderstatus = 'F' THEN 3
                    ELSE 4 END AS priority,
               o_orderdate
        FROM orders
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY priority ASC, o_orderdate DESC, o_orderkey ASC
        ) AS rn
        FROM prioritized
    )
    SELECT o_custkey, o_orderkey, priority, rn
    FROM ranked WHERE rn <= 3
    """,
)
def k6_priority_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 — collect at most 3 examples via a 4-tier priority cascade.

    Reference: extract_ugc_examples analyze_insta_enhanced.py:1114-1251 —
    paid-partnership clips, then #ad/#collab clips, then other-owner
    clips, then coauthor clips; stop at 3, no duplicates. One priority
    CASE + one row_number over (priority, arrival order) replaces the
    four sequential passes.
    """
    orders = load_table(spark, sf_dir, "orders")
    priority = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .when(F.col("o_orderstatus") == "F", 3)
        .otherwise(4)
    )
    ranked = top_k_per_group(
        orders.select(
            "o_custkey", "o_orderkey", priority.alias("priority"), "o_orderdate"
        ),
        ["o_custkey"],
        [F.col("priority").asc(), F.col("o_orderdate").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return ranked.select("o_custkey", "o_orderkey", "priority", "rn")


# ---------------------------------------------------------------------------
# K5/K7 — global sort + capped preview.
# ---------------------------------------------------------------------------


@query(
    "k7_top5_preview",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 5
    """,
)
def k7_top5_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 + K7 — report sorted by the headline metric, first 5 shown.

    Reference: global ER sort analyze_insta_enhanced.py:2005 /
    jsontocsv_enhanced.py:45; top-5 console preview :445-446. With the
    unique-key tie-break the LIMIT is deterministic; Spark executes
    TakeOrderedAndProject (no full shuffle-sort for the preview).
    """
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(5)
    )


# ---------------------------------------------------------------------------
# X1 — regex extraction (first match, all matches, coalesce cascade).
# ---------------------------------------------------------------------------


@query(
    "x1_regex_extract",
    """
    SELECT doc_id,
           regexp_extract(text, 'qu[a-z]+') AS first_qu_word,
           len(regexp_extract_all(text, 's[a-z]+')) AS s_word_count,
           COALESCE(NULLIF(regexp_extract(text, 'val[a-z]+'), ''),
                    NULLIF(regexp_extract(text, 'jo[a-z]+'), ''),
                    NULLIF(regexp_extract(text, 'wind[a-z]+'), ''),
                    'none') AS cascade_match
    FROM documents
    """,
)
def x1_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — hashtag/mention/email/phone-style regex extraction.

    Reference: hashtag/mention regexes analyze_insta_enhanced.py:145,
    604-605; the 5-pattern phone cascade :1687-1699 is the COALESCE of
    NULLIF'd first-matches (both engines return '' on no-match). All
    JVM-side ``regexp_extract(_all)`` — no UDF.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    cascade = F.coalesce(
        F.nullif(F.regexp_extract(t, "val[a-z]+", 0), F.lit("")),
        F.nullif(F.regexp_extract(t, "jo[a-z]+", 0), F.lit("")),
        F.nullif(F.regexp_extract(t, "wind[a-z]+", 0), F.lit("")),
        F.lit("none"),
    )
    return docs.select(
        "doc_id",
        F.regexp_extract(t, "qu[a-z]+", 0).alias("first_qu_word"),
        F.size(F.regexp_extract_all(t, F.lit("s[a-z]+"), F.lit(0))).alias("s_word_count"),
        cascade.alias("cascade_match"),
    )


# ---------------------------------------------------------------------------
# X2/X4/X9 — string normalization, splitting, formatting, sanitizing.
# ---------------------------------------------------------------------------


@query(
    "x2_x4_string_ops",
    """
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           string_split(p_name, ' ')[1] AS first_name,
           string_split(p_name, ' ')[-1] AS last_name,
           printf('%s-%05d', lower(p_type), p_partkey) AS slug,
           concat('https://example.com/parts/', replace(p_name, ' ', '_'), '.json')
               AS asset_url,
           array_to_string(string_split(lower(p_name), ' '), ' | ') AS pipe_joined,
           translate(p_name, ', ', '  ') AS sanitized
    FROM part
    """,
)
def x2_x4_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 + X4 + X9 — case/trim/split, first/last-name split, URL/slug
    formatting, pipe-joins, comma sanitize.

    Reference: tokenization analyze_insta_enhanced.py:1019-1023, name
    split :1649-1652, URL templates :703/:1248, pipe joins
    jsontocsv_enhanced.py:116-170, comma sanitize :310. All codegen'd
    string expressions.
    """
    part = load_table(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        words.getItem(0).alias("first_name"),
        F.element_at(words, -1).alias("last_name"),
        F.format_string("%s-%05d", F.lower("p_type"), F.col("p_partkey")).alias(
            "slug"
        ),
        F.concat(
            F.lit("https://example.com/parts/"),
            F.regexp_replace("p_name", " ", "_"),
            F.lit(".json"),
        ).alias("asset_url"),
        F.array_join(F.split(F.lower("p_name"), " "), " | ").alias("pipe_joined"),
        F.translate("p_name", ", ", "  ").alias("sanitized"),
    )


# ---------------------------------------------------------------------------
# X5 — date/time part extraction and bucketing.
# ---------------------------------------------------------------------------


@query(
    "x5_date_parts",
    """
    SELECT year(ts) AS yr, month(ts) AS mo, day(ts) AS dy, hour(ts) AS hr,
           dayofweek(ts) AS dow, COUNT(*) AS cnt
    FROM events
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def x5_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5 — fromtimestamp().hour / strftime-style date parts.

    Reference: analyze_insta_enhanced.py:174,439 (hour), :664,1531
    (strftime). Spark ``dayofweek`` is 1=Sunday; DuckDB ``dayofweek`` is
    0=Sunday — aligned by subtracting 1 on the Spark side.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            F.year("ts").alias("yr"),
            F.month("ts").alias("mo"),
            F.dayofmonth("ts").alias("dy"),
            F.hour("ts").alias("hr"),
            (F.dayofweek("ts") - 1).alias("dow"),
        )
        .groupBy("yr", "mo", "dy", "hr", "dow")
        .agg(F.count("*").alias("cnt"))
    )


# ---------------------------------------------------------------------------
# X6 + C14 — age derivation from dates + 7-bucket age group.
# ---------------------------------------------------------------------------


@query(
    "x6_c14_age_buckets",
    f"""
    SELECT o_orderkey,
           CAST(FLOOR(date_diff('day', o_orderdate, {AS_OF_ORDERS_SQL}) / 365.0)
               AS BIGINT) AS age_years,
           CASE WHEN FLOOR(date_diff('day', o_orderdate, {AS_OF_ORDERS_SQL}) / 365.0) < 1 THEN '0-1'
                WHEN FLOOR(date_diff('day', o_orderdate, {AS_OF_ORDERS_SQL}) / 365.0) < 2 THEN '1-2'
                WHEN FLOOR(date_diff('day', o_orderdate, {AS_OF_ORDERS_SQL}) / 365.0) < 3 THEN '2-3'
                WHEN FLOOR(date_diff('day', o_orderdate, {AS_OF_ORDERS_SQL}) / 365.0) < 4 THEN '3-4'
                WHEN FLOOR(date_diff('day', o_orderdate, {AS_OF_ORDERS_SQL}) / 365.0) < 5 THEN '4-5'
                WHEN FLOOR(date_diff('day', o_orderdate, {AS_OF_ORDERS_SQL}) / 365.0) < 6 THEN '5-6'
                ELSE '6+' END AS age_group
    FROM orders
    WHERE o_orderdate <= {AS_OF_ORDERS_SQL}
    """,
)
def x6_c14_age_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6 + C14 — age in years from a date column, bucketed into 7 groups.

    Reference: jsontocsv_enhanced.py:342-380 (age from dob in 4 formats →
    ``(today - dob).days / 365``) and :382-400 (7 buckets). datediff/365
    floor + CASE.
    """
    import datetime as dt

    from ..config import AS_OF_ORDERS

    orders = load_table(spark, sf_dir, "orders")
    age = F.floor(
        F.datediff(F.lit(AS_OF_ORDERS.date()), F.col("o_orderdate").cast("date"))
        / 365.0
    )
    bucket = (
        F.when(age < 1, "0-1")
        .when(age < 2, "1-2")
        .when(age < 3, "2-3")
        .when(age < 4, "3-4")
        .when(age < 5, "4-5")
        .when(age < 6, "5-6")
        .otherwise("6+")
    )
    return orders.filter(F.col("o_orderdate") <= F.lit(AS_OF_ORDERS)).select(
        "o_orderkey", age.cast("bigint").alias("age_years"), bucket.alias("age_group")
    )


# ---------------------------------------------------------------------------
# X7 — banker's rounding (Python round ↔ Spark bround ↔ DuckDB round_even).
# ---------------------------------------------------------------------------


@query(
    "x7_bankers_rounding",
    """
    SELECT o_orderkey,
           (CAST(o_totalprice * 100 AS BIGINT) // 10
            + CASE WHEN CAST(o_totalprice * 100 AS BIGINT) % 10 > 5
                     OR (CAST(o_totalprice * 100 AS BIGINT) % 10 = 5
                         AND (CAST(o_totalprice * 100 AS BIGINT) // 10) % 2 = 1)
                   THEN 1 ELSE 0 END) / 10.0 AS price_bround1,
           CAST(printf('%.2f', o_totalprice / 7) AS DOUBLE) AS ratio_bround2,
           CAST(round(o_totalprice, -2) AS DOUBLE) AS price_round_h100
    FROM orders
    """,
)
def x7_bankers_rounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 + Q11 — Python round() is banker's (HALF_EVEN) rounding; Spark
    ``round`` is HALF_UP, so the faithful mapping is ``bround``
    (= DuckDB ``round_even``).

    Reference: round() calls analyze_insta_enhanced.py:445-452,458,526.
    Three HALF_EVEN semantics exist and differ on real data:
    (a) Spark ``bround(double)`` rounds the SHORTEST decimal string
        (BigDecimal.valueOf) — 1445.65 is a tie → 1445.6;
    (b) C printf / Python round use the exact binary expansion —
        1445.65 is stored as 1445.65000...009 → 1445.7;
    (c) DuckDB ``round_even`` scales by 10^n in floating point —
        2518.45*10 → 25184.500000000004 → 2518.5.
    For exact-decimal inputs (2-dp money) the engine rounds in the
    decimal domain — bround(DECIMAL) — with an integer-cents oracle; for
    genuinely-float inputs the oracle uses printf (b), which matched
    Spark on every ratio in this dataset but is documented as the one
    float-rounding seam between engines.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.bround(F.col("o_totalprice").cast("decimal(18,2)"), 1)
        .cast("double")
        .alias("price_bround1"),
        F.bround(F.col("o_totalprice") / 7, 2).alias("ratio_bround2"),
        F.round("o_totalprice", -2).alias("price_round_h100"),
    )


# ---------------------------------------------------------------------------
# X8 — struct → JSON string (nested cells in the wide CSV).
# ---------------------------------------------------------------------------


@query(
    "x8_struct_to_json",
    """
    SELECT c_custkey,
           to_json(struct_pack(segment := c_mktsegment,
                               balance := c_acctbal,
                               nation := c_nationkey)) AS profile_json
    FROM customer
    """,
)
def x8_struct_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 — nested structs serialized to JSON strings for CSV cells.

    Reference: json.dumps of nested dicts jsontocsv_enhanced.py:201-202,
    253,273,289,300. Spark ``to_json(struct(...))`` and DuckDB
    ``to_json(struct_pack(...))`` emit byte-identical compact JSON.
    """
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.to_json(
            F.struct(
                F.col("c_mktsegment").alias("segment"),
                F.col("c_acctbal").alias("balance"),
                F.col("c_nationkey").alias("nation"),
            )
        ).alias("profile_json"),
    )


# ---------------------------------------------------------------------------
# X10 + C7 — argmax with an explicit tie-priority order (gender classifier
# shape: Female > Male > Non-binary on equal scores).
# ---------------------------------------------------------------------------

_X10_PRIORITY = [
    ("AUTOMOBILE", 1), ("BUILDING", 2), ("FURNITURE", 3),
    ("HOUSEHOLD", 4), ("MACHINERY", 5),
]
_X10_PRIORITY_SQL = (
    "(VALUES " + ", ".join(f"('{s}', {p})" for s, p in _X10_PRIORITY) + ") pr(seg, prio)"
)


@query(
    "x10_c7_argmax_priority",
    f"""
    WITH counts AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
        FROM customer GROUP BY c_nationkey, c_mktsegment
    ), ranked AS (
        SELECT c_nationkey, c_mktsegment, cnt,
               row_number() OVER (
                   PARTITION BY c_nationkey ORDER BY cnt DESC, prio ASC
               ) AS rn
        FROM counts JOIN {_X10_PRIORITY_SQL} ON c_mktsegment = pr.seg
    )
    SELECT c_nationkey, c_mktsegment AS dominant_segment, cnt
    FROM ranked WHERE rn = 1
    """,
)
def x10_c7_argmax_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X10 + C7 + Q9 — argmax over category scores with a declared
    tie-priority order.

    Reference: gender argmax prefers Female then Male on ties
    (analyze_insta_enhanced.py:780-788); personality/niche argmaxes break
    ties by dict/declaration order (:359,:1072-1073). The priority is an
    explicit broadcast dim column, so the result is identical under any
    partitioning.
    """
    cust = load_table(spark, sf_dir, "customer")
    prio = local_dim(spark, _X10_PRIORITY, "seg string, prio int")
    counts = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("cnt")
    )
    ranked = top_k_per_group(
        counts.join(F.broadcast(prio), counts.c_mktsegment == prio.seg),
        ["c_nationkey"],
        [F.col("cnt").desc(), F.col("prio").asc()],
        k=1,
    )
    return ranked.select(
        "c_nationkey", F.col("c_mktsegment").alias("dominant_segment"), "cnt"
    )


# ---------------------------------------------------------------------------
# X8b — JSON field extraction from a string column (the read direction).
# ---------------------------------------------------------------------------


@query(
    "x8b_json_extract",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
           json_extract_string(props, '$.k') AS k_raw
    FROM events
    """,
)
def x8b_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8 (read side) — extract typed fields from JSON-string columns.

    The reference parses whole JSON docs up front; at scale, late
    extraction from string payloads (get_json_object / from_json) keeps
    the scan narrow until the field is needed.
    """
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
        F.get_json_object("props", "$.k").alias("k_raw"),
    )
