"""Query registry — the driver-facing catalog of implemented operators.

Each entry maps one operator row from SURVEY.md §2 onto the driver's
star-schema testdata, with an equivalent ANSI-SQL oracle that DuckDB runs
on the same parquet files. Registration happens at import time via the
``@query`` decorator; ``__spark_entry__.py`` just re-exports the dict.

Oracle-matching rules used throughout (see tools/oracle_check.py):
- every computed column is aliased identically in Spark and SQL;
- money sums go through DECIMAL(18,2) accumulation then a final cast to
  DOUBLE, so the result is bit-exact regardless of partition/order
  (float summation order is the one true source of Spark-vs-DuckDB
  divergence);
- every window/top-k has a deterministic total order (unique key as the
  final tie-break) — the reference relies on Python sort stability /
  insertion order (SURVEY.md Q9/Q10), which maps to explicit position
  columns here.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str
    # True when fn executes work at CONSTRUCTION time (streaming
    # awaitTermination, iterative algorithms with per-round actions) —
    # timing harnesses must start the clock before calling fn, and
    # bench.py reads this flag instead of guessing by name.
    eager: bool = False


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, eager: bool = False):
    """Register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", eager=eager
        )
        return fn

    return deco
