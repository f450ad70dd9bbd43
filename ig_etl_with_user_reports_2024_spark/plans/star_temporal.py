"""Temporal-join queries over the events table (beyond-reference
north-star operators; see operators/temporal.py for the plan shapes).

A training-data pipeline at 100 TB constantly joins event streams to the
nearest label/feature in time — Spark has no ASOF/range join built-in,
so these register the scale-safe compositions as oracle-checked
contracts (DuckDB has native ASOF / inequality joins to check against).

``event_id`` columns carried across the as-of match are coalesced to -1
on BOTH engines: a nullable int surfaces as float64 in pandas on either
side of the driver's hash, and the null signal already rides the
matched timestamp column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import sql_lsum
from ..operators.temporal import (
    MICROS,
    asof_join,
    bucketed_range_join,
    in_window_agg,
)
from ..sources.readers import load_table
from .registry import query


def _events(spark: SparkSession, sf_dir: str, *types: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    if types:
        ev = ev.filter(F.col("event_type").isin(*types))
    return ev


@query(
    "aj1_asof_click_purchase",
    # NOT DuckDB's native ASOF JOIN: with several clicks tied on the
    # winning ts, ASOF's pick is engine-internal (as is any un-tie-broken
    # window) — an 8× replicated corpus, where every replica shares its
    # original's timestamp, exposed exactly that. The oracle declares
    # the same tie-break the Spark plan uses: greatest click event_id.
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT event_id, user_id, ts, click_ts, click_event_id, click_value
    FROM (
        SELECT p.event_id, p.user_id, p.ts,
               c.ts AS click_ts,
               COALESCE(c.event_id, -1) AS click_event_id,
               c.value AS click_value,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC NULLS LAST, c.event_id DESC NULLS LAST
               ) AS rn
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id AND c.ts <= p.ts
    ) WHERE rn = 1
    """,
)
def aj1_asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase picks the user's latest click
    at-or-before it; ties on equal click ts go to the greatest click
    event_id (declared — see asof_join's tiebreak_col). Plan: union +
    one window pass (operators/temporal.asof_join) — one shuffle on
    user_id, no join node, no pair explosion; the oracle is the
    equivalent windowed LEFT JOIN with the same declared tie-break."""
    purchases = _events(spark, sf_dir, "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = _events(spark, sf_dir, "click").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        purchases, clicks, on="user_id", ts_col="ts",
        right_cols=["event_id", "value"], prefix="click_",
        tiebreak_col="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "click_ts",
        F.coalesce("click_event_id", F.lit(-1)).alias("click_event_id"),
        F.col("click_value"),
    )


@query(
    "rj1_views_before_purchase",
    f"""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         v AS (SELECT * FROM events WHERE event_type = 'view')
    SELECT p.event_id, p.user_id, p.ts,
           COUNT(v.event_id) AS n_views,
           {sql_lsum('v.value')} AS view_value
    FROM p LEFT JOIN v
      ON v.user_id = p.user_id
     AND v.ts >= p.ts - INTERVAL '1 hour' AND v.ts < p.ts
    GROUP BY p.event_id, p.user_id, p.ts
    """,
)
def rj1_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window aggregation: views (count + exact sum) in the hour
    before each purchase, per user. Plan: one RANGE frame over integer
    micros (operators/temporal.in_window_agg) — one shuffle, no
    self-join; the oracle is the equivalent DuckDB inequality join."""
    ev = _events(spark, sf_dir, "purchase", "view")
    is_view = F.col("event_type") == "view"
    out = in_window_agg(
        ev,
        on="user_id",
        ts_col="ts",
        aggs={
            "n_views": F.sum(F.when(is_view, 1).otherwise(0)),
            "view_value": F.sum(
                F.when(is_view, F.rint(F.col("value") * 100).cast("long"))
            ),
        },
        window_micros=MICROS["hour"],
    )
    return (
        out.filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce(F.col("n_views"), F.lit(0)).cast("long").alias("n_views"),
            (F.col("view_value") / 100.0).alias("view_value"),
        )
    )


@query(
    "rj2_error_near_purchase",
    """
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         e AS (SELECT * FROM events WHERE event_type = 'error')
    SELECT p.user_id,
           p.event_id AS l_event_id, p.ts AS l_ts,
           e.event_id AS r_event_id, e.ts AS r_ts
    FROM p JOIN e
      ON p.user_id = e.user_id
     AND e.ts BETWEEN p.ts - INTERVAL '5 minutes'
                  AND p.ts + INTERVAL '5 minutes'
    """,
)
def rj2_error_near_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band join listing (purchase, error) pairs within ±5 minutes per
    user. Plan: equi-join on (user_id, 5-minute bucket) with the left
    side exploded to the 3 covering buckets + exact band post-filter
    (operators/temporal.bucketed_range_join) — shuffle tracks pair
    density, never |L|×|R|; vs DuckDB's native inequality join."""
    purchases = _events(spark, sf_dir, "purchase").select(
        "user_id", "event_id", "ts"
    )
    errors = _events(spark, sf_dir, "error").select("user_id", "event_id", "ts")
    return bucketed_range_join(
        purchases,
        errors,
        on="user_id",
        ts_col="ts",
        band_micros=5 * MICROS["minute"],
    ).select("user_id", "l_event_id", "l_ts", "r_event_id", "r_ts")


@query(
    "fn1_user_funnel",
    # NOT a list_reduce fold: DuckDB 1.0's list_reduce+lambda returns
    # wrong stages for some groups when evaluated over many rows (correct
    # in isolation — verified; the ordered list itself is right). The
    # stage machine is equivalent to the earliest-view → earliest-later-
    # click → earliest-later-purchase chain because (user_id, ts) is
    # unique, so "later in sequence" == "later in ts".
    """
    WITH e AS (
        SELECT user_id, ts, event_type FROM events
        WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
    ), v AS (
        SELECT user_id, MIN(ts) AS t1 FROM e
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t2 FROM e
        JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t3 FROM e
        JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT u.user_id,
           CASE WHEN p.t3 IS NOT NULL THEN 3
                WHEN c.t2 IS NOT NULL THEN 2
                WHEN v.t1 IS NOT NULL THEN 1
                ELSE 0 END AS funnel_stage
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
)
def fn1_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-pattern (funnel) matching: how far each user progressed
    through view → click → purchase IN ORDER on day one. The event
    sequence folds through a stage machine (array_sort + aggregate) —
    subsequence semantics no join/window can express directly; one
    shuffle on user_id, fold is a per-group array expression. DuckDB
    runs the identical fold via list_reduce (string-typed accumulator:
    its reduce cannot change element type)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp")
    )
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    types = F.transform(F.col("seq"), lambda x: x["event_type"])
    stage = F.aggregate(
        types,
        F.lit("0"),
        lambda stage, t: F.when((stage == "0") & (t == "view"), "1")
        .when((stage == "1") & (t == "click"), "2")
        .when((stage == "2") & (t == "purchase"), "3")
        .otherwise(stage),
    )
    return seq.select("user_id", stage.cast("int").alias("funnel_stage"))


@query(
    "fn2_conversion_window_funnel",
    # relational chain, not list_reduce (the fn1 DuckDB miscompile note
    # applies here too): earliest view → earliest qualifying click in
    # (t1, t1+1h] → earliest qualifying purchase in (t2, t2+24h].
    # Equivalent to the fold because (user_id, ts) is unique, so "later
    # in sequence" == "later in ts" and MIN picks the fold's anchor.
    """
    WITH e AS (
        SELECT user_id, ts, event_type FROM events
    ), v AS (
        SELECT user_id, MIN(ts) AS t1 FROM e
        WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS t2 FROM e
        JOIN v ON e.user_id = v.user_id
              AND e.ts > v.t1 AND e.ts <= v.t1 + INTERVAL '1 hour'
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t3 FROM e
        JOIN c ON e.user_id = c.user_id
              AND e.ts > c.t2 AND e.ts <= c.t2 + INTERVAL '24 hours'
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT u.user_id,
           CASE WHEN p.t3 IS NOT NULL THEN 3
                WHEN c.t2 IS NOT NULL THEN 2
                WHEN v.t1 IS NOT NULL THEN 1
                ELSE 0 END AS funnel_stage
    FROM (SELECT DISTINCT user_id FROM e) u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
)
def fn2_conversion_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-BOUNDED funnel: view → click within 1 hour → purchase within
    24 hours of that click — fn1's ordered-pattern match with per-stage
    conversion windows, the standard product-analytics funnel contract.
    One shuffle on user_id; the sorted event sequence folds through a
    (stage, anchor_ts) struct accumulator, so the deadline travels WITH
    the state — no join or window can carry a data-dependent deadline
    like this in one pass. Oracle is the equivalent earliest-qualifying
    relational chain (see fn1's DuckDB list_reduce note)."""
    ev = load_table(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    seq = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    acc0 = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast(ts_type).alias("anchor")
    )

    def step(acc, x):
        t, ts = x["event_type"], x["ts"]
        advance = lambda s: F.struct(  # noqa: E731
            F.lit(s).alias("stage"), ts.alias("anchor")
        )
        return (
            F.when((acc["stage"] == 0) & (t == "view"), advance(1))
            # strict lower bound matches the oracle's e.ts > anchor: a
            # click/purchase tying the anchor's timestamp must NOT count.
            # (user_id, ts) is unique in generated data, so this is a
            # no-op there — it makes the fold match the window bounds
            # unconditionally, not just on tie-free inputs.
            .when(
                (acc["stage"] == 1)
                & (t == "click")
                & (ts > acc["anchor"])
                & (ts <= acc["anchor"] + F.expr("INTERVAL 1 HOUR")),
                advance(2),
            )
            .when(
                (acc["stage"] == 2)
                & (t == "purchase")
                & (ts > acc["anchor"])
                & (ts <= acc["anchor"] + F.expr("INTERVAL 24 HOURS")),
                advance(3),
            )
            .otherwise(acc)
        )

    stage = F.aggregate(F.col("seq"), acc0, step).getField("stage")
    return seq.select("user_id", stage.alias("funnel_stage"))


# ---------------------------------------------------------------------------
# AD1 — rolling z-score anomaly flags (trailing 20-event window).
# ---------------------------------------------------------------------------


@query(
    "ad1_rolling_zscore",
    """
    WITH w AS (
        SELECT event_id, user_id, ts, value,
               COUNT(value) OVER fr AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER fr AS DOUBLE)
                   AS s,
               CAST(SUM(CAST(value AS DECIMAL(18,2))
                        * CAST(value AS DECIMAL(18,2))) OVER fr AS DOUBLE)
                   AS sq
        FROM events
        WINDOW fr AS (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW
        )
    ), z AS (
        SELECT event_id, user_id, ts, value,
               s / n AS mean_20,
               CASE WHEN n >= 2 THEN
                   SQRT(GREATEST(0.0, (sq - (s * s) / n) / (n - 1)))
               END AS std_20
        FROM w
    )
    SELECT event_id, user_id, ts, value, mean_20, std_20,
           COALESCE(ABS(value - mean_20) > 2 * std_20, FALSE) AS is_anomaly
    FROM z
    """,
)
def ad1_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly detection: per user, flag events whose value
    sits more than 2 sample standard deviations from the trailing
    20-event mean — the streaming-metrics outlier gate, expressed as
    one batch window (the st2 sliding-window family's per-row cousin).

    Exactness is the whole game here: a windowed SUM of raw doubles
    accumulates in frame order and diverges between engines, so both
    sums ride DECIMAL(18,2) (events.value is 2-dp money-like — the
    cast is exact) and stddev comes from the same decimal-sum identity
    as functions/exact.dstddev_samp, with the n>=2 guard INSIDE a CASE
    so no engine ever evaluates the n-1=0 division (Spark 4 ANSI).
    The frame is ROWS over the deterministic total order (ts,
    event_id) — a RANGE frame over timestamps would hinge on
    sub-second epoch conversions agreeing across engines; ROWS over a
    unique key cannot drift. Single Exchange on user_id; all three
    window aggregates share one frame and one sort.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    vd = F.col("value").cast("decimal(18,2)")
    n = F.count("value").over(fr)
    s = F.sum(vd).over(fr).cast("double")
    sq = F.sum(vd * vd).over(fr).cast("double")
    mean = s / n
    std = F.when(
        n >= 2, F.sqrt(F.greatest(F.lit(0.0), (sq - (s * s) / n) / (n - 1)))
    )
    z = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        mean.alias("mean_20"),
        std.alias("std_20"),
    )
    return z.withColumn(
        "is_anomaly",
        F.coalesce(
            F.abs(F.col("value") - F.col("mean_20")) > 2 * F.col("std_20"),
            F.lit(False),
        ),
    )
