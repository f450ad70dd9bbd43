"""Temporal-operator tests: as-of join tie/null/no-match semantics,
trailing-window aggregation boundaries, bucketed range-join band edges."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ig_etl_with_user_reports_2024_spark.operators.temporal import (
    MICROS,
    asof_join,
    bucketed_range_join,
    in_window_agg,
)


def _ts(minute: int, second: int = 0, micro: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, second, micro)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


LEFT_SCHEMA = "k bigint, ts timestamp, l_val string"
RIGHT_SCHEMA = "k bigint, ts timestamp, r_val string"


def test_asof_picks_latest_at_or_before(spark):
    left = _df(spark, [(1, _ts(10), "a"), (1, _ts(30), "b")], LEFT_SCHEMA)
    right = _df(
        spark,
        [(1, _ts(5), "r5"), (1, _ts(9), "r9"), (1, _ts(20), "r20")],
        RIGHT_SCHEMA,
    )
    out = {
        r.l_val: (r.asof_r_val, r.asof_ts)
        for r in asof_join(left, right, on="k").collect()
    }
    assert out["a"] == ("r9", _ts(9))  # r20 is in the future
    assert out["b"] == ("r20", _ts(20))


def test_asof_equal_ts_matches_and_no_match_is_null(spark):
    left = _df(spark, [(1, _ts(5), "eq"), (2, _ts(5), "lonely")], LEFT_SCHEMA)
    right = _df(spark, [(1, _ts(5), "same-instant")], RIGHT_SCHEMA)
    out = {r.l_val: r.asof_r_val for r in asof_join(left, right, on="k").collect()}
    assert out["eq"] == "same-instant"  # ties match (DuckDB ts >= semantics)
    assert out["lonely"] is None  # LEFT semantics: key 2 has no right rows


def test_asof_null_right_field_still_matches(spark):
    # the matched row's NULL field must come through as NULL, not fall
    # back to an older non-null row (struct pack, not per-column last)
    left = _df(spark, [(1, _ts(10), "x")], LEFT_SCHEMA)
    right = _df(
        spark, [(1, _ts(1), "old"), (1, _ts(9), None)], RIGHT_SCHEMA
    )
    [row] = asof_join(left, right, on="k").collect()
    assert row.asof_ts == _ts(9) and row.asof_r_val is None


def test_in_window_agg_half_open_boundaries(spark):
    # window [ts-60s, ts): row at exactly ts-60s is IN, row at ts is OUT
    ev = _df(
        spark,
        [
            (1, _ts(10, 0), "x", 1.0),
            (1, _ts(11, 0), "x", 10.0),
            (1, _ts(11, 0, 1), "probe", 0.0),  # 1µs past the minute
            (1, _ts(12, 0, 1), "probe2", 0.0),
        ],
        "k bigint, ts timestamp, tag string, v double",
    )
    out = in_window_agg(
        ev,
        on="k",
        ts_col="ts",
        aggs={"s": F.sum(F.when(F.col("tag") == "x", F.col("v")))},
        window_micros=MICROS["minute"],
    )
    got = {r.tag: r.s for r in out.collect()}
    # probe at 11:00.000001 sees [10:00.000001, 11:00.000000]: only the 10.0 row
    assert got["probe"] == 10.0
    # probe2 at 12:00.000001 sees (11:00.000001, 12:00.000000]: nothing
    assert got["probe2"] is None


def test_bucketed_range_join_band_edges(spark):
    band = MICROS["minute"]
    left = _df(spark, [(1, _ts(10), "L")], LEFT_SCHEMA)
    right = _df(
        spark,
        [
            (1, _ts(9, 0, 0), "edge-lo"),   # exactly -band: IN
            (1, _ts(11, 0, 0), "edge-hi"),  # exactly +band: IN
            (1, _ts(8, 59, 999999), "out-lo"),
            (1, _ts(11, 0, 1), "out-hi"),
            (2, _ts(10), "other-key"),
        ],
        RIGHT_SCHEMA,
    )
    out = bucketed_range_join(
        left, right, on="k", ts_col="ts", band_micros=band
    )
    got = sorted(r.r_r_val for r in out.collect())
    assert got == ["edge-hi", "edge-lo"]


def test_bucketed_range_join_no_duplicate_pairs(spark):
    # right row in the same bucket as left must appear exactly once even
    # though the left side probes 3 buckets
    band = MICROS["minute"]
    left = _df(spark, [(1, _ts(10, 30), "L")], LEFT_SCHEMA)
    right = _df(spark, [(1, _ts(10, 31), "R")], RIGHT_SCHEMA)
    out = bucketed_range_join(left, right, on="k", ts_col="ts", band_micros=band)
    assert out.count() == 1


# --- property-based: asof_join vs a brute-force reference -----------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _events = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # key
            st.integers(min_value=0, max_value=10_000), # ts offset seconds
        ),
        min_size=0,
        max_size=25,
    )

    @settings(
        max_examples=30,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(lefts=_events, rights=_events)
    def test_asof_matches_bruteforce(spark, lefts, rights):
        base = dt.datetime(2024, 1, 1)
        lrows = [
            (k, base + dt.timedelta(seconds=s), f"l{i}")
            for i, (k, s) in enumerate(lefts)
        ]
        rrows = [
            (k, base + dt.timedelta(seconds=s), f"r{i}")
            for i, (k, s) in enumerate(rights)
        ]
        # dedupe right (key, ts) — as-of over duplicate instants is
        # nondeterministic in any engine; keep the max r_val like a
        # real feed would keep the last write
        best = {}
        for k, ts, v in rrows:
            if (k, ts) not in best or v > best[(k, ts)]:
                best[(k, ts)] = v
        rrows = [(k, ts, v) for (k, ts), v in best.items()]

        left = spark.createDataFrame(
            lrows or [(None, None, None)], LEFT_SCHEMA
        ).filter("k IS NOT NULL")
        right = spark.createDataFrame(
            rrows or [(None, None, None)], RIGHT_SCHEMA
        ).filter("k IS NOT NULL")

        got = {
            (r.k, r.ts, r.l_val): (r.asof_ts, r.asof_r_val)
            for r in asof_join(left, right, on="k").collect()
        }

        want = {}
        for k, ts, v in lrows:
            cands = [(rts, rv) for rk, rts, rv in rrows if rk == k and rts <= ts]
            want[(k, ts, v)] = max(cands) if cands else (None, None)
        assert got == want


def test_asof_join_tiebreak_is_declared(spark):
    # several right rows tied on the winning ts: the greatest
    # tiebreak_col value must win, regardless of input order
    from ig_etl_with_user_reports_2024_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100)], "k bigint, ts bigint"
    )
    for right_rows in ([(1, 100, 7), (1, 100, 9), (1, 100, 8)],
                       [(1, 100, 9), (1, 100, 8), (1, 100, 7)]):
        right = spark.createDataFrame(
            right_rows, "k bigint, ts bigint, rid bigint"
        ).repartition(3)
        [row] = asof_join(
            left, right, on="k", right_cols=["rid"], tiebreak_col="rid"
        ).collect()
        assert row.asof_rid == 9
