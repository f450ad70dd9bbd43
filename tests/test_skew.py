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
