"""Single-pass column profiling — the data-quality entry gate.

Before a 100 TB corpus goes anywhere near training, every ingest batch
gets profiled: per-column null counts, cardinalities, and value ranges
feed schema-drift alerts and partition-pruning stats. The operator
computes ALL per-column stats in ONE aggregation pass (one scan, one
partial-agg shuffle of a single row per partition), then unpivots the
1-row result into a long (column, stats) table driver-side — the
unpivot touches one row, so it is metadata work, not data work.

The distinct counts use exact ``count(distinct)`` so the catalog query
(plans/star_layout.py dq1) stays hash-checkable; Spark plans the
multi-column distinct via a single-scan Expand (rows x #profiled
columns into the partial aggregate). At 100 TB swap in
``approx_count_distinct`` — the HLL twin whose accuracy is
driver-gated by rf7 (plans/star_recall.py).

Beyond-reference operator: the reference trusts its scraped dicts and
has no profiling stage (analyze_insta_enhanced.py consumes userInfo
fields unchecked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    numeric: list[str],
    strings: list[str],
    timestamps: list[str],
    group_by: str | None = None,
) -> DataFrame:
    """Profile the given columns in one aggregation pass.

    Returns one row per profiled column:
    (col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str, min_ts, max_ts) — min/max land in the slot matching the column's
    type family (numerics cast to DOUBLE: exact for BIGINT keys and raw
    doubles alike), the other slots are typed NULLs.

    With ``group_by`` the profile is computed per group in the SAME
    single pass (one row per group before the unpivot, ``group_by``
    carried as the leading output column) — the drift-detection shape:
    profile yesterday's batch and today's without scanning twice.
    """
    ordered = numeric + strings + timestamps
    ts_type = df.schema[timestamps[0]].dataType if timestamps else "timestamp"
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in ordered:
        aggs.append(F.count(F.col(c)).alias(f"{c}__cnt"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__nd"))
    for c in numeric:
        aggs.append(F.min(F.col(c)).cast("double").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"{c}__max"))
    for c in strings + timestamps:
        aggs.append(F.min(F.col(c)).alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).alias(f"{c}__max"))
    row = df.groupBy(group_by).agg(*aggs) if group_by else df.agg(*aggs)

    null_num = F.lit(None).cast("double")
    null_str = F.lit(None).cast("string")
    null_ts = F.lit(None).cast(ts_type)
    structs = []
    for c in ordered:
        is_num, is_str = c in numeric, c in strings
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"{c}__cnt")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                (F.col(f"{c}__min") if is_num else null_num).alias("min_num"),
                (F.col(f"{c}__max") if is_num else null_num).alias("max_num"),
                (F.col(f"{c}__min") if is_str else null_str).alias("min_str"),
                (F.col(f"{c}__max") if is_str else null_str).alias("max_str"),
                (
                    null_ts if (is_num or is_str) else F.col(f"{c}__min")
                ).alias("min_ts"),
                (
                    null_ts if (is_num or is_str) else F.col(f"{c}__max")
                ).alias("max_ts"),
            )
        )
    head = [F.col(group_by)] if group_by else []
    return row.select(
        *head, F.explode(F.array(*structs)).alias("p")
    ).select(*head, "p.*")
