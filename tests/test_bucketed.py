"""Bucketed co-located join: the write-time-shuffle strategy must yield
an exchange-free join plan and identical results."""

from __future__ import annotations

from pyspark.sql import functions as F

from ig_etl_with_user_reports_2024_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)


def test_bucketed_join_is_exchange_free_and_exact(spark, sf_oracle):
    orders = spark.read.parquet(f"{sf_oracle}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        n_buckets=8,
    )

    bo, bl = read_bucketed(spark, "b_orders"), read_bucketed(spark, "b_lineitem")
    # force the merge join (broadcast would also skip the exchange, but
    # the claim under test is bucket co-location, not dim broadcast)
    joined = bo.hint("merge").join(bl, "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan

    got = joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    want = (
        orders.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}

    # groupBy on the bucket key also rides the co-location: no exchange
    agg_plan = (
        bo.groupBy("o_orderkey")
        .agg(F.sum("o_totalprice").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in agg_plan, agg_plan

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partitioned_write_prunes_on_read(spark, sf_oracle, tmp_path):
    """partitionBy layout: a filter on the partition column must prune at
    the file-listing level (PartitionFilters), not post-scan."""
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    out = str(tmp_path / "docs_by_source")
    docs.write.mode("overwrite").partitionBy("source").parquet(out)

    back = spark.read.parquet(out).filter(F.col("source") == "src3")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the predicate must land in PartitionFilters (listing-time pruning),
    # not as a post-scan data Filter
    scan_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert scan_lines and any("src3" in l for l in scan_lines), plan
    assert "PushedFilters: [IsNotNull(source), EqualTo(source,src3)]" not in plan
    assert back.count() == docs.filter(F.col("source") == "src3").count()
