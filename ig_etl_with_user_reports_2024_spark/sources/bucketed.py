"""Bucketed-table sink/source: the co-located join strategy.

At 100 TB the fact⋈fact join (orders⋈lineitem, events⋈labels) is the
dominant shuffle. Writing both sides bucketed by the join key with the
same bucket count moves that shuffle to WRITE time, once — every later
join/aggregation on the key reads co-located buckets and skips the
exchange entirely (and with ``sortBy`` the sort too).

This is the Spark-native analog of the reference's single-process
"everything is already local" luxury, and the strategy test
(tests/test_bucketed.py) asserts the plan evidence: a sort-merge join
of two bucketed tables with ZERO Exchange nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed parquet
    table. ``n_buckets`` should match across every table that will join
    on ``bucket_col`` — equal bucketing on both sides is what makes the
    join exchange-free."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata rides the catalog, so
    plain ``spark.table`` keeps the co-location property)."""
    return spark.table(table)
