"""Changelog / CDC operators: MERGE-style upsert and SCD2 history.

The reference's incremental surface is the work-queue commit
(insta_scraper_enhanced.py:474-509 — done-list append + anti-join,
operators/workqueue.py here). At warehouse scale the same "apply what
arrived since the last run" problem is a *keyed changelog*: a stream of
per-key upsert/delete operations that must be folded into a base
snapshot (Delta/Iceberg ``MERGE INTO`` semantics) or unrolled into a
slowly-changing-dimension history (SCD type 2). Both are expressed here
as pure DataFrame plans — no table format required, so they run on any
parquet lake.

Scale notes (100 TB):
- ``latest_ops`` reduces the changelog to key grain with ONE hash
  aggregation (struct-argmax, map-side partial combine) — the shuffle
  carries one row per touched key, never the full changelog.
- ``merge_upsert`` then joins base ⋈ delta on the key. The delta side
  is typically orders of magnitude smaller than the base; with AQE on,
  Spark picks a broadcast join when the reduced delta fits, otherwise
  both sides hash-partition on the key (the same partitioning a
  bucketed base table would make shuffle-free — see sources/bucketed.py).
- ``scd2_intervals`` is one window partitioning per key: ``lead(ts)``
  closes each version, a second window function over the SAME partition
  spec numbers versions — Spark plans both inside one Exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_ops(
    changelog: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    op_col: Column,
    value_col: str,
) -> DataFrame:
    """Reduce a changelog to its last-writer-wins state per key.

    Returns one row per key: (key, is_delete, value, updated_at, n_ops).
    The winner is the op with the greatest (ts, tiebreak) — ``tiebreak``
    must make the order total (a unique event id). Implemented as a
    struct-argmax aggregation, not a window: one shuffle at key grain
    with map-side combine, which is the cheapest possible reduction of
    a 100 TB changelog.
    """
    last = F.max(
        F.struct(F.col(ts_col), F.col(tiebreak), op_col.alias("is_delete"),
                 F.col(value_col).alias("value"))
    ).alias("last")
    return (
        changelog.groupBy(key)
        .agg(last, F.count("*").alias("n_ops"))
        .select(
            key,
            F.col("last.is_delete").alias("is_delete"),
            F.col("last.value").alias("value"),
            F.col(f"last.{ts_col}").alias("updated_at"),
            "n_ops",
        )
    )


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    key: str,
    base_value: str,
    delta_key: str | None = None,
) -> DataFrame:
    """MERGE the key-grain ``delta`` (from :func:`latest_ops`) into
    ``base``: matched upsert → updated, matched delete → row dropped,
    unmatched delta upsert → inserted, untouched base → unchanged
    (unmatched deletes vanish, delete-of-absent-key is a no-op).

    Returns (key, value, change_type, updated_at, n_ops) — the new
    snapshot plus per-row provenance.
    """
    d = delta.withColumnRenamed(delta_key or key, "_dk")
    joined = base.join(d, F.col(key) == F.col("_dk"), "full_outer")
    touched = F.col("_dk").isNotNull()
    return (
        joined.filter(~touched | ~F.col("is_delete"))
        .select(
            F.coalesce(F.col(key), F.col("_dk")).alias("key"),
            # select by MATCH, not by value nullness: coalesce(value,
            # base) silently kept the old base value when the winning
            # upsert wrote NULL — a lost write (review finding). An
            # upsert's value wins whenever the key was touched, NULL
            # included, matching MERGE last-writer-wins.
            F.when(touched, F.col("value"))
            .otherwise(F.col(base_value))
            .alias("value"),
            F.when(~touched, F.lit("unchanged"))
            .when(F.col(key).isNull(), F.lit("inserted"))
            .otherwise(F.lit("updated"))
            .alias("change_type"),
            F.col("updated_at"),
            F.coalesce(F.col("n_ops"), F.lit(0).cast("long")).alias("n_ops"),
        )
    )


def scd2_intervals(
    changelog: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    op_is_delete: Column,
    value_col: str,
) -> DataFrame:
    """Unroll a keyed changelog into SCD type-2 validity intervals.

    Every upsert opens a version valid from its own timestamp until the
    NEXT operation on the same key (upsert or delete — a delete closes
    the last version without opening a new one). The final open version
    has ``valid_to`` NULL and ``is_current`` true.

    Both window functions share one partition spec (key, ordered by
    (ts, tiebreak)), so the plan has a single Exchange; ``lead`` must
    see deletes, so it runs before the delete filter, while version
    numbering runs after (deletes hold no version number).
    """
    w_all = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    closed = changelog.withColumn("valid_to", F.lead(ts_col).over(w_all))
    vers = closed.filter(~op_is_delete)
    w_up = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    return vers.select(
        key,
        F.row_number().over(w_up).alias("version_n"),
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )
