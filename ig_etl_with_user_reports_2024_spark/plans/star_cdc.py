"""Changelog/CDC catalog queries over the driver testdata.

Beyond-reference warehouse operators (the incremental family next to
operators/workqueue.py — reference insta_scraper_enhanced.py:474-509
is the queue-commit special case of the same "apply what arrived"
problem). ``events`` plays the keyed changelog: ``user_id`` is the key,
``(ts, event_id)`` the total version order, ``event_type = 'error'``
the delete marker, ``value`` the payload. ``customer`` plays the base
snapshot being merged into; keys below 10 exist only in the changelog,
so every MERGE branch (update / delete / insert / untouched) is
exercised at every scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cdc
from ..sources.readers import load_table
from .registry import query

_BASE_MIN_KEY = 10


@query(
    "cdc1_merge_upsert",
    f"""
    WITH ranked AS (
        SELECT user_id, value, ts, event_id,
               (event_type = 'error') AS is_delete,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_ops
        FROM events
    ), delta AS (
        SELECT user_id, is_delete, value, ts AS updated_at, n_ops
        FROM ranked WHERE rn = 1
    ), base AS (
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_custkey >= {_BASE_MIN_KEY}
    )
    SELECT COALESCE(b.c_custkey, d.user_id) AS key,
           CASE WHEN d.user_id IS NOT NULL THEN d.value
                ELSE b.c_acctbal END AS value,
           CASE WHEN d.user_id IS NULL THEN 'unchanged'
                WHEN b.c_custkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS change_type,
           d.updated_at AS updated_at,
           CAST(COALESCE(d.n_ops, 0) AS BIGINT) AS n_ops
    FROM base b FULL OUTER JOIN delta d ON b.c_custkey = d.user_id
    WHERE d.is_delete IS NULL OR NOT d.is_delete
    """,
)
def cdc1_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a pure DataFrame plan: fold the events
    changelog (last writer per user_id wins; 'error' = delete) into the
    customer base snapshot. Matched upserts update, matched deletes drop
    the row, unmatched upserts insert, untouched base rows pass through
    as 'unchanged'. The changelog reduces to key grain in one
    struct-argmax aggregation (shuffle carries one row per touched key),
    then one key join against the base — AQE broadcasts the reduced
    delta when it fits, which is the common shape at 100 TB (small daily
    delta vs huge snapshot)."""
    events = load_table(spark, sf_dir, "events")
    base = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") >= _BASE_MIN_KEY)
        .select("c_custkey", "c_acctbal")
    )
    delta = cdc.latest_ops(
        events,
        key="user_id",
        ts_col="ts",
        tiebreak="event_id",
        op_col=(F.col("event_type") == "error"),
        value_col="value",
    )
    return cdc.merge_upsert(
        base, delta, key="c_custkey", base_value="c_acctbal", delta_key="user_id"
    )


@query(
    "cdc2_scd2_intervals",
    """
    WITH closed AS (
        SELECT user_id, value, ts, event_id, event_type,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS valid_to
        FROM events
    ), vers AS (
        SELECT * FROM closed WHERE event_type <> 'error'
    )
    SELECT user_id,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS version_n,
           value,
           ts AS valid_from,
           valid_to,
           (valid_to IS NULL) AS is_current
    FROM vers
    """,
)
def cdc2_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history: each upsert opens a validity interval
    [valid_from, valid_to) closed by the NEXT op on the same key —
    deletes close the prior version without opening one, so a key whose
    last op is a delete has no current row. Single Exchange: ``lead``
    (over all ops) and version numbering (over surviving upserts) share
    the per-key partition spec."""
    events = load_table(spark, sf_dir, "events")
    return cdc.scd2_intervals(
        events,
        key="user_id",
        ts_col="ts",
        tiebreak="event_id",
        op_is_delete=(F.col("event_type") == "error"),
        value_col="value",
    )
