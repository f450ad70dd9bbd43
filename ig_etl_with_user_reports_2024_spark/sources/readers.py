"""Source readers.

Covers SURVEY.md §2.1 S1-S3 re-expressed for Spark:
- parquet star-schema scans (the driver testdata),
- CSV scan with explicit schema (reference S1: input.csv work queue),
- whole-document JSON scan with explicit StructType (reference S2:
  userInfo.json / postInfo.json; PERMISSIVE + _corrupt_record reproduces
  the reference's ``{}``-on-parse-error behavior,
  analyze_insta_enhanced.py:63-70),
- directory scan via glob + input_file_name (reference S3,
  analyze_insta_enhanced.py:1943-1953).

All readers take explicit schemas — at 100 TB, schema inference is a full
extra pass over the data and kills column pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one star-schema parquet table.

    Plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown,
    column pruning, and partition pruning on the scan.

    ``events.parquet`` historically carried nanosecond timestamps, which
    the vectorized parquet reader rejects; we read them as raw int64
    nanos and rebuild a microsecond TIMESTAMP_NTZ (integer ``div`` —
    double math would lose precision above 2^53 ns). DuckDB truncates
    nanos→micros the same way. Driver testdata regenerated in round 4
    stores micros NTZ natively — the LongType check below makes both
    encodings land on the identical ts column, and the legacy conf is a
    no-op for micros files.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(prefix + t)


def read_url_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1 — the scraper's 1-column url work-queue CSV.

    Reference: insta_scraper_enhanced.py:474-509 (pandas read_csv of
    input.csv / inputdone.csv).
    """
    return spark.read.option("header", True).schema("url string").csv(path)


def read_json_docs(
    spark: SparkSession, glob_path: str, schema, with_source_file: bool = True
) -> DataFrame:
    """S2+S3 — whole-file JSON documents, one row per file.

    Reference: analyze_insta_enhanced.py:63-70 (json.load with {} on error)
    and the directory enumeration at :1943-1953. ``multiLine`` parses each
    file as a single document; PERMISSIVE mode nulls out corrupt docs
    instead of failing the job, matching the reference's tolerance.
    ``input_file_name`` carries the creator key that the reference encodes
    in the directory name.
    """
    reader = (
        spark.read.option("multiLine", True)
        .option("mode", "PERMISSIVE")
        .schema(schema)
    )
    df = reader.json(glob_path)
    if with_source_file:
        df = df.withColumn("_source_file", F.input_file_name())
    return df
