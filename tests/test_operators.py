"""Unit tests for the generic operators on tiny inline fixtures
(SURVEY.md §5 strategy: classifier boundaries, tie cases, Q9/Q10
arrival-order semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_top_k_per_group_deterministic_ties(spark):
    from ig_etl_with_user_reports_2024_spark.operators.windows import top_k_per_group

    df = spark.createDataFrame(
        [("u", 10, 1), ("u", 10, 2), ("u", 9, 3), ("v", 5, 4)],
        "user string, score int, pos int",
    )
    out = top_k_per_group(
        df, ["user"], [F.col("score").desc(), F.col("pos").asc()], k=2
    ).collect()
    u_rows = [(r.score, r.pos, r.rn) for r in out if r.user == "u"]
    # tie on score=10 broken by pos (arrival order) — Q10 semantics:
    # pos=1 ranks first, pos=2 second; score=9 misses the top-2
    assert sorted(u_rows) == [(10, 1, 1), (10, 2, 2)]


def test_lag_gap_days(spark):
    from ig_etl_with_user_reports_2024_spark.operators.windows import lag_gap_days

    df = spark.createDataFrame(
        [("u", "2024-01-10", 1), ("u", "2024-01-07", 2), ("u", "2024-01-01", 3)],
        "user string, d string, k int",
    ).select("user", F.col("d").cast("timestamp").alias("ts"), "k")
    out = {r.k: r.gap_days for r in lag_gap_days(df, "user", "ts", "k").collect()}
    assert out[1] == 3.0  # newest minus next-older
    assert out[2] == 6.0
    assert out[3] is None  # oldest has no predecessor


def test_split_half_trend_labels(spark):
    from ig_etl_with_user_reports_2024_spark.operators.windows import split_half_trend

    rows = [("g", i, 100.0 if i < 5 else 10.0) for i in range(10)]
    rows += [("s", i, 50.0) for i in range(10)]
    rows += [("tiny", i, 50.0) for i in range(3)]
    df = spark.createDataFrame(rows, "user string, pos int, likes double")
    out = {
        r.user: r.trend
        for r in split_half_trend(
            df, "user", "likes", [F.col("pos").asc()], min_rows=10
        ).collect()
    }
    # first half (pos 0..4, the 'recent' half in arrival order) is 100s
    assert out["g"] == "Growing"
    assert out["s"] == "Stable"
    assert out["tiny"] == "Insufficient Data"


def test_exact_decimal_stddev_matches_python(spark):
    import statistics

    from ig_etl_with_user_reports_2024_spark.functions.exact import dstddev_samp

    vals = [10.25, 20.5, 30.75, 41.0, 0.25]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.agg(dstddev_samp("x", 2).alias("sd")).collect()[0].sd
    assert abs(got - statistics.stdev(vals)) < 1e-9


def test_approx_distinct_within_bound(spark, sf_oracle):
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    exact = {
        r.o_custkey: r.n_distinct
        for r in qs["a8_distinct_diversity"](spark, sf_oracle).collect()
    }
    approx = {
        r.o_custkey: r.approx_distinct
        for r in qs["a8_approx_distinct"](spark, sf_oracle).collect()
    }
    assert set(exact) == set(approx)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(1, 0.1 * n)


def test_work_queue_commit_idempotent(spark, tmp_path):
    import csv

    from ig_etl_with_user_reports_2024_spark.operators import workqueue as wq

    input_path = str(tmp_path / "input.csv")
    done_path = str(tmp_path / "inputdone.csv")
    urls = [f"https://example.com/u{i}/" for i in range(10)]
    with open(input_path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["url"])
        for u in urls:
            w.writerow([u])

    processed = spark.createDataFrame(
        [(u,) for u in urls[:4]] + [("https://example.com/u0",)], "url string"
    )  # includes a trailing-slash variant duplicate
    wq.commit_batch(spark, input_path, done_path, processed)
    done1 = open(done_path).read()
    remaining1 = open(input_path).read()
    assert len(done1.strip().splitlines()) == 1 + 4  # header + 4 normalized urls
    assert len(remaining1.strip().splitlines()) == 1 + 6
    # idempotent: re-committing the same batch converges to the same state
    wq.commit_batch(spark, input_path, done_path, processed)
    assert open(done_path).read() == done1
    assert open(input_path).read() == remaining1
    # the pending set = input ∖ done (J1)
    inputs = spark.read.option("header", True).schema("url string").csv(input_path)
    done = spark.read.option("header", True).schema("url string").csv(done_path)
    assert wq.pending_urls(inputs, done).count() == 6
