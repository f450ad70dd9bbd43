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


def profile_columns_approx_gated(
    df: DataFrame,
    numeric: list[str],
    strings: list[str],
    timestamps: list[str],
    rsd: float = 0.02,
    tol: float = 0.05,
) -> DataFrame:
    """The 100 TB profiler: :func:`profile_columns` with cardinality via
    ``approx_count_distinct`` (HLL++, rsd ``rsd``) instead of the exact
    multi-column distinct — the swap the dq1 docstring promises at
    scale, where the exact path's Expand multiplies the shuffle by the
    profiled-column count and per-partition distinct state by key
    cardinality, while one HLL register set per column is O(kB).

    Because the estimate itself is engine-specific, the output carries
    ``nd_ok`` — relative error of the estimate vs the exact distinct
    <= ``tol`` — in the cardinality slot instead of the raw estimate
    (the rf7 gate pattern), which keeps the catalog entry
    driver-hashable: every other field is exact and hash-compared, and
    a sketch regression flips ``nd_ok`` to false. The exact distinct
    exists purely as the gate and runs as its own pass (see the inline
    note on why the sketch must NOT share the multi-distinct
    aggregation); a production deployment drops the gate pass entirely
    and trusts the estimate at the certified tolerance — one scan.

    Returns one row per profiled column:
    (col_name, n_rows, n_nulls, nd_ok, min_num, max_num, min_str,
    max_str, min_ts, max_ts).
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
    # The HLL aggregates run in their OWN pass, cross-joined as a 1-row
    # broadcast: mixing approx_count_distinct into the multi-column
    # DISTINCT aggregation drags the HLL buffers through the Expand
    # rewrite, measured 63s vs ~4s split at sf0.1 (30x) — the Expand
    # replicates every row per distinct group and the sketch updates
    # ride the replicated stream. Two scans only exist in GATE mode;
    # production drops the exact side and is back to one scan.
    approx_aggs = [
        F.approx_count_distinct(F.col(c), rsd).alias(f"{c}__nda")
        for c in ordered
    ]
    row = df.agg(*aggs).crossJoin(F.broadcast(df.agg(*approx_aggs)))

    def nd_ok(c: str) -> F.Column:
        exact, approx = F.col(f"{c}__nd"), F.col(f"{c}__nda")
        # ANSI guard (rf5/rf7 pattern): an all-NULL column has exact=0 —
        # ok iff the sketch agrees
        return F.when(
            exact > 0, F.abs(approx - exact) / exact <= tol
        ).otherwise(approx == 0)

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
                nd_ok(c).alias("nd_ok"),
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
    return row.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def expectation_counts(
    df: DataFrame,
    table: str,
    violations: list,
    unique: list[str] = (),
    group_by: str | None = None,
) -> DataFrame:
    """Declarative EXPECTATION VALIDATION (the Deequ / Great
    Expectations shape, Schelter et al. 2018 "Automating Large-Scale
    Data Quality Verification": a suite of named constraints compiles
    into ONE aggregation pass per table, not one scan per check):
    ``violations`` is [(expectation_name, is_violation boolean
    Column)] — the caller states each predicate NULL-SAFE (a NULL
    verdict is a violation, stated explicitly with isNull()/coalesce
    so Spark and the SQL twin agree) — and ``unique`` adds uniqueness
    expectations (violations = non-null occurrences beyond the first:
    count(c) - count(distinct c); NULLs belong to a not_null
    expectation, not here). Exact distincts ride the dq1 Expand
    (never mixed with sketch aggs — the r6 rule); at 100 TB swap
    approx_count_distinct under an rf7-style gate exactly as dq1a
    does.

    Returns one row per expectation:
    (table_name, expectation, n_rows, n_violations, passed) — all
    BIGINT + BOOLEAN, hash-exact. The unpivot explodes a 1-row
    aggregate, metadata work (profile_columns' convention)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in violations:
        aggs.append(F.sum(cond.cast("long")).alias(f"{name}__v"))
    for c in unique:
        aggs.append(F.count(F.col(c)).alias(f"{c}__cnt"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__nd"))
    # with group_by the suite runs per group in the SAME single pass
    # (profile_columns' convention — the per-ingest-batch shape dq4
    # validates on); the group column leads the output
    row = df.groupBy(group_by).agg(*aggs) if group_by else df.agg(*aggs)
    structs = []
    for name, _ in violations:
        structs.append(
            F.struct(
                F.lit(table).alias("table_name"),
                F.lit(name).alias("expectation"),
                F.col("_n").cast("bigint").alias("n_rows"),
                F.coalesce(F.col(f"{name}__v"), F.lit(0))
                .cast("bigint")
                .alias("n_violations"),
            )
        )
    for c in unique:
        structs.append(
            F.struct(
                F.lit(table).alias("table_name"),
                F.lit(f"{c}_unique").alias("expectation"),
                F.col("_n").cast("bigint").alias("n_rows"),
                (F.col(f"{c}__cnt") - F.col(f"{c}__nd"))
                .cast("bigint")
                .alias("n_violations"),
            )
        )
    head = [F.col(group_by)] if group_by else []
    return (
        row.select(*head, F.explode(F.array(*structs)).alias("p"))
        .select(*head, "p.*")
        .withColumn("passed", F.col("n_violations") == 0)
    )


def referential_orphans(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    table: str,
    expectation: str,
) -> DataFrame:
    """The referential-integrity expectation (orders.o_custkey ∈
    customer.c_custkey): one row in expectation_counts' schema with
    n_violations = child rows whose key has no parent (NULL keys are
    orphans — a reference that names nothing). LEFT JOIN against the
    distinct parent keys + one 1-row aggregate; the parent side is a
    key column only, so at dim scale it broadcasts and at fact scale
    it is one equi-join shuffle of narrow rows — either way the check
    never carries payload columns."""
    hit = parent.select(F.col(parent_key).alias("_pk")).distinct()
    j = child.select(F.col(child_key).alias("_ck")).join(
        hit, F.col("_ck") == F.col("_pk"), "left"
    )
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("_pk").isNull().cast("long"))
        .cast("bigint")
        .alias("n_violations"),
    ).select(
        F.lit(table).alias("table_name"),
        F.lit(expectation).alias("expectation"),
        "n_rows",
        F.coalesce(F.col("n_violations"), F.lit(0).cast("bigint")).alias(
            "n_violations"
        ),
        (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).alias("passed"),
    )


def batch_drift(
    prof: DataFrame, alarm_milli: int, batch_col: str = "batch"
) -> DataFrame:
    """dq4's drift tail as ONE definition (shared by the batch entry
    and st13's streaming twin — the _layout_chain convention): given a
    per-batch expectation profile (``batch_col`` ∈ {0, 1}, expectation,
    n_rows, n_violations), emit the batch-vs-batch integer milli-rates
    and the > ``alarm_milli`` per-mille drift alarm. All-integer
    (floor-division milli), metadata-sized self-join."""
    a = prof.filter(F.col(batch_col) == 0).select(
        "expectation",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_violations").alias("n_violations_a"),
    )
    b = prof.filter(F.col(batch_col) == 1).select(
        "expectation",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_violations").alias("n_violations_b"),
    )
    j = a.join(b, "expectation")
    rate_a = F.expr("(1000 * n_violations_a) div n_rows_a")
    rate_b = F.expr("(1000 * n_violations_b) div n_rows_b")
    return j.select(
        "expectation",
        "n_rows_a",
        "n_rows_b",
        "n_violations_a",
        "n_violations_b",
        rate_a.cast("bigint").alias("rate_milli_a"),
        rate_b.cast("bigint").alias("rate_milli_b"),
        (F.abs(rate_b - rate_a) > alarm_milli).alias("drift_alarm"),
    )
