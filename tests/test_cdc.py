"""CDC operators: MERGE branch coverage and SCD2 interval invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ig_etl_with_user_reports_2024_spark.operators import cdc


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def _changelog(spark):
    # key 1: upsert then delete (→ dropped)
    # key 2: two upserts (→ updated, last wins)
    # key 3: delete only (→ delete-of-absent or matched-delete)
    # key 9: upsert on a key absent from base (→ inserted)
    rows = [
        (1, 1, _ts(1), "set", 10.0),
        (2, 1, _ts(2), "del", 0.0),
        (3, 2, _ts(1), "set", 20.0),
        (4, 2, _ts(3), "set", 25.0),
        (5, 3, _ts(1), "del", 0.0),
        (6, 9, _ts(5), "set", 90.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, key long, ts timestamp, op string, value double"
    )


def _base(spark):
    return spark.createDataFrame(
        [(1, 100.0), (2, 200.0), (3, 300.0), (4, 400.0)],
        "key long, base_value double",
    )


def test_merge_upsert_all_branches(spark):
    delta = cdc.latest_ops(
        _changelog(spark),
        key="key",
        ts_col="ts",
        tiebreak="event_id",
        op_col=(F.col("op") == "del"),
        value_col="value",
    )
    out = cdc.merge_upsert(_base(spark), delta, key="key", base_value="base_value")
    got = {r["key"]: r.asDict() for r in out.collect()}
    # key 1: last op delete → gone;  key 3: delete-only → gone
    assert set(got) == {2, 4, 9}
    assert got[2]["change_type"] == "updated" and got[2]["value"] == 25.0
    assert got[2]["n_ops"] == 2
    assert got[4]["change_type"] == "unchanged" and got[4]["value"] == 400.0
    assert got[4]["n_ops"] == 0 and got[4]["updated_at"] is None
    assert got[9]["change_type"] == "inserted" and got[9]["value"] == 90.0


def test_merge_upsert_last_writer_tiebreak_on_event_id(spark):
    # same timestamp: the higher event_id must win
    rows = [(1, 7, _ts(1), "set", 1.0), (2, 7, _ts(1), "set", 2.0)]
    log = spark.createDataFrame(
        rows, "event_id long, key long, ts timestamp, op string, value double"
    )
    delta = cdc.latest_ops(
        log, "key", "ts", "event_id", F.col("op") == "del", "value"
    )
    assert delta.collect()[0]["value"] == 2.0


def test_scd2_intervals_invariants(spark):
    out = cdc.scd2_intervals(
        _changelog(spark),
        key="key",
        ts_col="ts",
        tiebreak="event_id",
        op_is_delete=(F.col("op") == "del"),
        value_col="value",
    ).collect()
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r["key"], []).append(r)
    # key 3 was delete-only → no versions at all
    assert set(by_key) == {1, 2, 9}
    # key 1: one version closed by its delete → NOT current
    (v1,) = by_key[1]
    assert v1["valid_to"] == _ts(2) and not v1["is_current"]
    # key 2: versions abut exactly (valid_to == next valid_from),
    # version numbers are 1..n, exactly one current
    vs = sorted(by_key[2], key=lambda r: r["version_n"])
    assert [v["version_n"] for v in vs] == [1, 2]
    assert vs[0]["valid_to"] == vs[1]["valid_from"]
    assert [v["is_current"] for v in vs] == [False, True]
    assert vs[1]["value"] == 25.0
    # key 9: single open version
    (v9,) = by_key[9]
    assert v9["is_current"] and v9["valid_to"] is None


def test_scd2_matches_merge_current_state(spark):
    """The SCD2 current rows must agree with the MERGE snapshot on every
    key the changelog touched (two expressions of one contract)."""
    log = _changelog(spark)
    delta = cdc.latest_ops(
        log, "key", "ts", "event_id", F.col("op") == "del", "value"
    )
    snap = cdc.merge_upsert(_base(spark), delta, key="key", base_value="base_value")
    touched_live = {
        r["key"]: r["value"]
        for r in snap.filter(F.col("change_type") != "unchanged").collect()
    }
    current = {
        r["key"]: r["value"]
        for r in cdc.scd2_intervals(
            log, "key", "ts", "event_id", F.col("op") == "del", "value"
        )
        .filter("is_current")
        .collect()
    }
    assert current == touched_live
