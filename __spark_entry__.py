"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in
``ig_etl_with_user_reports_2024_spark/plans/`` — this module only
re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ig_etl_with_user_reports_2024_spark.plans import QUERIES

# Importing these modules populates the registry. ORDER MATTERS: the
# driver runs (and budgets) queries in registration order, so modules
# whose queries still lack a driver verdict register FIRST (round 1
# stopped after 50 of 65 — see VERDICT.md "What's missing" #1).
from ig_etl_with_user_reports_2024_spark.plans import star_temporal  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_sampling  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_topk_scalars  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_streaming  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_detectors  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_recall  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_aggregates  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_classifiers  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_multijoin  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_pipeline  # noqa: F401
from ig_etl_with_user_reports_2024_spark.plans import star_queries  # noqa: F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1: 90-day filter → top-6 per creator →
    avg engagement rate) on /root/testdata/sf0.001."""
    return QUERIES["k1_top6_er"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for every hash-checkable query."""
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
