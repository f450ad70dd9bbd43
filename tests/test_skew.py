"""Skew-operator tests: salted forms must be result-identical to the
plain forms, and the salt must actually shard the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from ig_etl_with_user_reports_2024_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)


def test_salted_join_equals_plain_join(spark, sf_oracle):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_oracle}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = (
        li.join(orders, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_partkey").alias("s"))
    )
    salted = (
        salted_join(li, orders, on="l_orderkey", n_salts=4)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_partkey").alias("s"))
    )
    assert {tuple(r) for r in plain.collect()} == {
        tuple(r) for r in salted.collect()
    }


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "k bigint, payload string"
    )
    right = spark.createDataFrame([(1, "dim1")], "k bigint, dim string")
    out = salted_join(left, right, on="k", n_salts=3, how="left").collect()
    got = {(r.payload, r.dim) for r in out}
    assert got == {("a", "dim1"), ("b", "dim1"), ("c", None)}


def test_salted_join_spreads_hot_key(spark):
    # one key, many rows: the salted key must take >1 distinct value
    hot = spark.range(1000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame([(7, "d")], "k bigint, dim string")
    lhs = salted_join(hot, dim, on="k", n_salts=8)
    assert lhs.count() == 1000
    n_salts_used = (
        hot.withColumn(
            "s", F.pmod(F.xxhash64("payload"), F.lit(8))
        ).select("s").distinct().count()
    )
    assert n_salts_used > 1


def test_salted_count_distinct_exact(spark, sf_oracle):
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
    plain = {
        (r.l_returnflag, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    salted = {
        (r.l_returnflag, r.n_distinct)
        for r in salted_count_distinct(
            li, "l_returnflag", "l_partkey", n_salts=16
        ).collect()
    }
    assert plain == salted


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_oracle):
    # The 100 TB shuffle-reduction lever for selective fact⋈dim joins
    # that are too big to broadcast: Catalyst's runtime bloom filter
    # builds a filter from the selective side and injects might_contain
    # on the fact scan, so non-qualifying fact rows die BEFORE the join
    # exchange. Local testdata sits under the production size thresholds
    # (creationSideThreshold 10MB), so the test widens them to prove the
    # injection fires — at real scale the defaults qualify on their own.
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffle join
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = spark.read.parquet(f"{sf_oracle}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet")
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), "bloom filter not injected"
        # the injected filter must sit on the FACT (lineitem) branch
        fact_branch = [
            ln for ln in plan.splitlines() if "might_contain" in ln.lower()
        ]
        assert any("l_orderkey" in ln for ln in fact_branch)
        # and the join still returns the right answer
        rows = j.collect()
        assert len(rows) == 1 and rows[0].n > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
