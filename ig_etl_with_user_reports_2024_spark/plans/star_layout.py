"""Storage-layout and data-quality catalog queries.

Beyond-reference scale operators: zo1 checks the Z-order clustering key
(operators/layout.py) by measuring per-z-range locality on lineitem;
dq1 is the single-pass column profiler (operators/profiling.py) over
orders. Both are pure integer/builtin expression plans, hash-exact
against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import layout, profiling
from ..sources.readers import load_table
from .registry import query

_ZBITS = 16
_ZBUCKETS = 256
_ZCOLS = ["l_partkey", "l_suppkey"]


@query(
    "zo1_zorder_stats",
    f"""
    WITH keyed AS (
        SELECT l_partkey, l_suppkey,
               {layout.zorder_sql(_ZCOLS, _ZBITS)} AS zkey
        FROM lineitem
    ), span AS (
        SELECT MIN(zkey) AS zmin, MAX(zkey) AS zmax FROM keyed
    )
    SELECT ((k.zkey - s.zmin) * {_ZBUCKETS})
               // greatest(s.zmax - s.zmin + 1, 1) AS z_bucket,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS part_lo, MAX(l_partkey) AS part_hi,
           MIN(l_suppkey) AS supp_lo, MAX(l_suppkey) AS supp_hi,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM keyed k CROSS JOIN span s
    GROUP BY 1
    """,
)
def zo1_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout statistics: interleave (l_partkey, l_suppkey)
    into a 32-bit curve key, cut the OBSERVED key range into 256
    equal-width z-ranges (one file's worth each in a real rewrite),
    and report per-range row counts and per-dimension min/max spans —
    exactly the footer stats a z-ordered file would expose for
    multi-dimension pruning.

    The bucket rule is integer floor division over the observed span
    (``greatest(span, 1)``-guarded identically in both engines, so a
    degenerate single-valued key column maps every row to bucket 0
    instead of tripping ANSI-mode division checks),
    so it adapts to any scale factor with no sampled boundaries (a
    production rewrite would use ``layout.layout_by_zorder``'s
    repartitionByRange — sampling is fine for layout, not for an
    oracle). One scan computes the key (codegen, no shuffle), the span
    is a scalar agg broadcast back via cross join, and the stats are
    one hash aggregation — two scans total, one shuffle of 256-ish
    groups. Beyond-reference; closest analog is the reference's
    single-key dict-order CSV write (jsontocsv_enhanced.py:214-233).
    """
    li = load_table(spark, sf_dir, "lineitem").select(*_ZCOLS)
    keyed = li.withColumn("zkey", layout.zorder_key(_ZCOLS, _ZBITS))
    span = keyed.agg(
        F.min("zkey").alias("zmin"), F.max("zkey").alias("zmax")
    )
    return (
        keyed.crossJoin(F.broadcast(span))
        .withColumn(
            "z_bucket",
            F.expr(
                f"((zkey - zmin) * {_ZBUCKETS})"
                " div greatest(zmax - zmin + 1, 1L)"
            ),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_partkey").alias("part_lo"),
            F.max("l_partkey").alias("part_hi"),
            F.min("l_suppkey").alias("supp_lo"),
            F.max("l_suppkey").alias("supp_hi"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )


@query(
    "zo2_pruning_effectiveness",
    f"""
    WITH keyed AS (
        SELECT l_orderkey, l_partkey, l_suppkey,
               {layout.zorder_sql(_ZCOLS, _ZBITS)} AS zkey
        FROM lineitem
    ), span AS (
        SELECT MIN(zkey) AS zmin, MAX(zkey) AS zmax,
               MIN(l_orderkey) AS omin, MAX(l_orderkey) AS omax,
               MIN(l_partkey) AS pmin, MAX(l_partkey) AS pmax,
               MIN(l_suppkey) AS smin, MAX(l_suppkey) AS smax
        FROM keyed
    ), bounds AS (
        SELECT *,
               pmin + ((pmax - pmin) * 45) // 100 AS plo,
               pmin + ((pmax - pmin) * 55) // 100 AS phi,
               smin + ((smax - smin) * 45) // 100 AS slo,
               smin + ((smax - smin) * 55) // 100 AS shi
        FROM span
    ), tagged AS (
        SELECT 'zorder' AS layout,
               ((k.zkey - b.zmin) * {_ZBUCKETS})
                   // greatest(b.zmax - b.zmin + 1, 1) AS bucket,
               k.l_partkey, k.l_suppkey
        FROM keyed k CROSS JOIN bounds b
        UNION ALL
        SELECT 'linear' AS layout,
               ((k.l_orderkey - b.omin) * {_ZBUCKETS})
                   // greatest(b.omax - b.omin + 1, 1) AS bucket,
               k.l_partkey, k.l_suppkey
        FROM keyed k CROSS JOIN bounds b
    ), bstats AS (
        SELECT layout, bucket, COUNT(*) AS n_rows,
               MIN(l_partkey) AS part_lo, MAX(l_partkey) AS part_hi,
               MIN(l_suppkey) AS supp_lo, MAX(l_suppkey) AS supp_hi
        FROM tagged GROUP BY layout, bucket
    )
    SELECT s.layout,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN NOT (s.part_hi < b.plo OR s.part_lo > b.phi
                                   OR s.supp_hi < b.slo OR s.supp_lo > b.shi)
                    THEN 1 ELSE 0 END) AS BIGINT) AS buckets_touched,
           CAST(SUM(CASE WHEN NOT (s.part_hi < b.plo OR s.part_lo > b.phi
                                   OR s.supp_hi < b.slo OR s.supp_lo > b.shi)
                    THEN s.n_rows ELSE 0 END) AS BIGINT) AS rows_touched,
           CAST(SUM(s.n_rows) AS BIGINT) AS rows_total
    FROM bstats s CROSS JOIN bounds b
    GROUP BY s.layout
    """,
)
def zo2_pruning_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zo1's VALUE made measurable: for the same 256-bucket budget,
    how many buckets (files) does a 2-dimensional predicate — the
    middle 10% of BOTH l_partkey and l_suppkey — touch under the
    Z-order layout vs the natural insert order (bucketed by
    l_orderkey)? A bucket is "touched" exactly when its per-dimension
    min/max footer spans overlap the predicate box — the file-skipping
    rule every lakehouse reader applies. Under the linear layout both
    dimensions are uncorrelated with the bucket key, so EVERY bucket's
    span covers the predicate (0% skipped — measured 256/256 touched
    at sf0.01); the Z-order layout localizes both dimensions at once,
    skipping ~90% of buckets (6/54 touched, 13% of rows — asserted in
    tests/test_layout.py). All-integer arithmetic
    (spans, floor-division buckets, percentile bounds) → hash-exact;
    both bucket divisors carry the same ``greatest(span, 1)`` guard as
    zo1 (single-valued key column → everything in bucket 0, no
    ANSI-mode error).
    One scan feeds both bucketings via a kind-tagged union, the spans
    are one broadcast scalar row, and the final rollup is 512 groups."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    keyed = li.withColumn("zkey", layout.zorder_key(_ZCOLS, _ZBITS))
    bounds = keyed.agg(
        F.min("zkey").alias("zmin"), F.max("zkey").alias("zmax"),
        F.min("l_orderkey").alias("omin"), F.max("l_orderkey").alias("omax"),
        F.min("l_partkey").alias("pmin"), F.max("l_partkey").alias("pmax"),
        F.min("l_suppkey").alias("smin"), F.max("l_suppkey").alias("smax"),
    ).select(
        "*",
        F.expr("pmin + ((pmax - pmin) * 45) div 100").alias("plo"),
        F.expr("pmin + ((pmax - pmin) * 55) div 100").alias("phi"),
        F.expr("smin + ((smax - smin) * 45) div 100").alias("slo"),
        F.expr("smin + ((smax - smin) * 55) div 100").alias("shi"),
    )
    with_b = keyed.crossJoin(F.broadcast(bounds))
    tagged = with_b.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(
                        f"((zkey - zmin) * {_ZBUCKETS})"
                        " div greatest(zmax - zmin + 1, 1L)"
                    ).alias("bucket"),
                ),
                F.struct(
                    F.lit("linear").alias("layout"),
                    F.expr(
                        f"((l_orderkey - omin) * {_ZBUCKETS})"
                        " div greatest(omax - omin + 1, 1L)"
                    ).alias("bucket"),
                ),
            )
        ).alias("lb"),
        "l_partkey",
        "l_suppkey",
    ).select("lb.layout", "lb.bucket", "l_partkey", "l_suppkey")
    bstats = tagged.groupBy("layout", "bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_partkey").alias("part_lo"),
        F.max("l_partkey").alias("part_hi"),
        F.min("l_suppkey").alias("supp_lo"),
        F.max("l_suppkey").alias("supp_hi"),
    )
    touched = ~(
        (F.col("part_hi") < F.col("plo"))
        | (F.col("part_lo") > F.col("phi"))
        | (F.col("supp_hi") < F.col("slo"))
        | (F.col("supp_lo") > F.col("shi"))
    )
    return (
        bstats.crossJoin(F.broadcast(bounds))
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.when(touched, 1).otherwise(0)).alias("buckets_touched"),
            F.sum(F.when(touched, F.col("n_rows")).otherwise(0)).alias(
                "rows_touched"
            ),
            F.sum("n_rows").alias("rows_total"),
        )
    )


def _profile_col_sql(
    c: str, kind: str
) -> str:
    min_num = f"CAST(MIN({c}) AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
    max_num = f"CAST(MAX({c}) AS DOUBLE)" if kind == "num" else "CAST(NULL AS DOUBLE)"
    min_str = f"MIN({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"
    max_str = f"MAX({c})" if kind == "str" else "CAST(NULL AS VARCHAR)"
    min_ts = f"MIN({c})" if kind == "ts" else "CAST(NULL AS TIMESTAMP)"
    max_ts = f"MAX({c})" if kind == "ts" else "CAST(NULL AS TIMESTAMP)"
    return f"""
    SELECT '{c}' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {min_num} AS min_num, {max_num} AS max_num,
           {min_str} AS min_str, {max_str} AS max_str,
           {min_ts} AS min_ts, {max_ts} AS max_ts
    FROM orders"""


_DQ1_NUM = ["o_orderkey", "o_custkey", "o_totalprice"]
_DQ1_STR = ["o_orderstatus", "o_orderpriority"]
_DQ1_TS = ["o_orderdate"]


@query(
    "dq1_column_profile",
    " UNION ALL ".join(
        [_profile_col_sql(c, "num") for c in _DQ1_NUM]
        + [_profile_col_sql(c, "str") for c in _DQ1_STR]
        + [_profile_col_sql(c, "ts") for c in _DQ1_TS]
    ),
)
def dq1_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the orders table: per-column null count,
    exact cardinality, and typed min/max — the ingest-gate stats a
    training pipeline records per batch for schema-drift detection.

    One aggregation pass over the table (operators/profiling.py): the
    oracle is written as 6 UNION ALL scans for SQL clarity, the Spark
    plan is a single scan whose multi-column distinct goes through one
    Expand — at 100 TB the exact distinct swaps for the rf7-gated HLL.
    """
    orders = load_table(spark, sf_dir, "orders")
    return profiling.profile_columns(
        orders, numeric=_DQ1_NUM, strings=_DQ1_STR, timestamps=_DQ1_TS
    )


def _profile_col_approx_sql(c: str, kind: str) -> str:
    """dq1a oracle per-column row: dq1's exact fields with TRUE in the
    nd_ok slot (the estimate is engine-side; the gate bool is what is
    hash-compared)."""
    row = _profile_col_sql(c, kind)
    return row.replace(
        f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct",
        "CAST(1 AS BOOLEAN) AS nd_ok",
    )


@query(
    "dq1a_column_profile_approx",
    " UNION ALL ".join(
        [_profile_col_approx_sql(c, "num") for c in _DQ1_NUM]
        + [_profile_col_approx_sql(c, "str") for c in _DQ1_STR]
        + [_profile_col_approx_sql(c, "ts") for c in _DQ1_TS]
    ),
)
def dq1a_column_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dq1's 100 TB variant: the same single-pass orders profile with
    cardinality via approx_count_distinct (HLL++, rsd 0.02) under an
    rf7-style accuracy gate — nd_ok = estimate within 5% of the exact
    distinct (measured max error 2.3% across sf0.001/0.01/0.1; the
    exact count rides in the same pass purely as the gate). Every
    non-cardinality field stays exact and hash-compared, so a sketch
    or profile regression fails the driver verdict either way. dq1
    remains the exact baseline entry."""
    orders = load_table(spark, sf_dir, "orders")
    return profiling.profile_columns_approx_gated(
        orders, numeric=_DQ1_NUM, strings=_DQ1_STR, timestamps=_DQ1_TS
    )


_DQ2_COLS = ["user_id", "value", "event_type", "props"]
_DQ2_PROFILE_SQL = " UNION ALL ".join(
    f"""
    SELECT batch, '{c}' AS col_name,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT({c}) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM base GROUP BY batch"""
    for c in _DQ2_COLS
)


@query(
    "dq2_schema_drift",
    f"""
    WITH base AS (
        SELECT *, event_id % 2 AS batch FROM events
    ), p AS (
        {_DQ2_PROFILE_SQL}
    )
    SELECT a.col_name,
           a.n_rows AS n_rows_a, b.n_rows AS n_rows_b,
           a.n_nulls AS n_nulls_a, b.n_nulls AS n_nulls_b,
           a.n_distinct AS nd_a, b.n_distinct AS nd_b,
           CAST(a.n_nulls AS DOUBLE) / a.n_rows AS null_rate_a,
           CAST(b.n_nulls AS DOUBLE) / b.n_rows AS null_rate_b,
           CASE WHEN a.n_distinct > 0
                THEN CAST(b.n_distinct AS DOUBLE) / a.n_distinct
           END AS card_ratio,
           COALESCE(
               ABS(CAST(b.n_nulls AS DOUBLE) / b.n_rows
                   - CAST(a.n_nulls AS DOUBLE) / a.n_rows) > 0.01
               OR CAST(b.n_distinct AS DOUBLE) / a.n_distinct < 0.5
               OR CAST(b.n_distinct AS DOUBLE) / a.n_distinct > 2.0,
               TRUE) AS drift_flag
    FROM p a JOIN p b
      ON a.col_name = b.col_name AND a.batch = 0 AND b.batch = 1
    """,
)
def dq2_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema/distribution drift between two ingest batches: profile
    both halves of the events changelog (batch = event_id % 2 stands in
    for yesterday/today) in ONE grouped pass, then flag columns whose
    null rate moved more than 1 point or whose cardinality halved or
    doubled — the ingest-gate alarm that catches a broken upstream
    field before it poisons a training run.

    The per-batch profile reuses operators/profiling.profile_columns
    with ``group_by``: one scan, one Expand for the exact distincts,
    one 2-row aggregate — the batch-vs-batch join touches 8 metadata
    rows. Rates are compared as doubles derived from integer counts
    with identical expressions on both engines (no float accumulation
    anywhere); an undefined ratio (empty baseline) conservatively
    flags drift. At 100 TB each batch profile would come from its own
    incremental scan at ingest; the drift join is unchanged.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "batch", F.col("event_id") % 2
    )
    prof = profiling.profile_columns(
        ev,
        numeric=["user_id", "value"],
        strings=["event_type", "props"],
        timestamps=[],
        group_by="batch",
    )
    a = prof.filter(F.col("batch") == 0).select(
        "col_name",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_nulls").alias("n_nulls_a"),
        F.col("n_distinct").alias("nd_a"),
    )
    b = prof.filter(F.col("batch") == 1).select(
        "col_name",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_nulls").alias("n_nulls_b"),
        F.col("n_distinct").alias("nd_b"),
    )
    j = a.join(b, "col_name")
    null_rate_a = F.col("n_nulls_a").cast("double") / F.col("n_rows_a")
    null_rate_b = F.col("n_nulls_b").cast("double") / F.col("n_rows_b")
    ratio = F.when(
        F.col("nd_a") > 0, F.col("nd_b").cast("double") / F.col("nd_a")
    )
    return j.select(
        "col_name",
        "n_rows_a",
        "n_rows_b",
        "n_nulls_a",
        "n_nulls_b",
        "nd_a",
        "nd_b",
        null_rate_a.alias("null_rate_a"),
        null_rate_b.alias("null_rate_b"),
        ratio.alias("card_ratio"),
        F.coalesce(
            (F.abs(null_rate_b - null_rate_a) > 0.01)
            | (F.col("nd_b").cast("double") / F.col("nd_a") < 0.5)
            | (F.col("nd_b").cast("double") / F.col("nd_a") > 2.0),
            F.lit(True),
        ).alias("drift_flag"),
    )


# ---------------------------------------------------------------------------
# DQ3 — expectation-suite validation: dq1 profiles, dq2 compares
# batches; dq3 is the CONTRACT check a pipeline gates ingest on — a
# declarative suite of named constraints with violation counts (the
# Deequ / Great Expectations shape; operators/profiling.py).
# ---------------------------------------------------------------------------


def _dq3_row(
    table: str, name: str, viol_sql: str, n_rows_sql: str = "COUNT(*)"
) -> str:
    # COALESCE matches the Spark side's empty-table convention (review
    # finding: expectation_counts coalesces SUM-over-nothing to 0 /
    # passed=true, so the twin must state the same instead of NULL)
    v = f"CAST(COALESCE({viol_sql}, 0) AS BIGINT)"
    return f"""
    SELECT '{table}' AS table_name, '{name}' AS expectation,
           CAST({n_rows_sql} AS BIGINT) AS n_rows,
           {v} AS n_violations,
           {v} = 0 AS passed
    FROM {table}"""


_DQ3_ORACLE = " UNION ALL ".join(
    [
        _dq3_row(
            "orders", "o_orderkey_not_null",
            "SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)",
        ),
        _dq3_row(
            "orders", "o_orderkey_unique",
            "COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)",
        ),
        _dq3_row(
            "orders", "o_orderstatus_in_set",
            "SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')"
            " OR o_orderstatus IS NULL THEN 1 ELSE 0 END)",
        ),
        _dq3_row(
            "orders", "o_totalprice_positive",
            "SUM(CASE WHEN NOT (o_totalprice > 0)"
            " OR o_totalprice IS NULL THEN 1 ELSE 0 END)",
        ),
        """
    SELECT 'orders' AS table_name,
           'o_custkey_in_customer' AS expectation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN c._pk IS NULL THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_violations,
           CAST(COALESCE(SUM(CASE WHEN c._pk IS NULL THEN 1 ELSE 0 END), 0)
               AS BIGINT) = 0 AS passed
    FROM orders o
    LEFT JOIN (SELECT DISTINCT c_custkey AS _pk FROM customer) c
      ON o.o_custkey = c._pk""",
        """
    SELECT 'lineitem' AS table_name,
           'l_orderkey_in_orders' AS expectation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE(SUM(CASE WHEN o._pk IS NULL THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS n_violations,
           CAST(COALESCE(SUM(CASE WHEN o._pk IS NULL THEN 1 ELSE 0 END), 0)
               AS BIGINT) = 0 AS passed
    FROM lineitem l
    LEFT JOIN (SELECT DISTINCT o_orderkey AS _pk FROM orders) o
      ON l.l_orderkey = o._pk""",
        _dq3_row(
            "lineitem", "l_quantity_le_40",
            "SUM(CASE WHEN NOT (l_quantity <= 40)"
            " OR l_quantity IS NULL THEN 1 ELSE 0 END)",
        ),
        _dq3_row(
            "events", "event_id_unique",
            "COUNT(event_id) - COUNT(DISTINCT event_id)",
        ),
        _dq3_row(
            "documents", "n_chars_matches_text",
            "SUM(CASE WHEN n_chars IS DISTINCT FROM length(text)"
            " THEN 1 ELSE 0 END)",
        ),
        _dq3_row(
            "documents", "n_chars_le_480",
            "SUM(CASE WHEN NOT (n_chars <= 480)"
            " OR n_chars IS NULL THEN 1 ELSE 0 END)",
        ),
        _dq3_row(
            "documents", "lang_in_whitelist",
            "SUM(CASE WHEN lang NOT IN ('en', 'de', 'fr', 'es')"
            " OR lang IS NULL THEN 1 ELSE 0 END)",
        ),
    ]
)


@query("dq3_expectation_suite", _DQ3_ORACLE)
def dq3_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTATION-SUITE validation (Deequ / Great Expectations,
    Schelter et al. 2018 — dq1 records stats, dq2 compares batches;
    dq3 is the declarative CONTRACT an ingest gate enforces): eleven
    named constraints over four tables — not-null, uniqueness,
    value-set, positivity, two referential-integrity checks
    (orders→customer, lineitem→orders), a derived-column consistency
    check (documents.n_chars must equal length(text)), and three
    distribution expectations whose thresholds deliberately straddle
    the corpus (the txt8 rule: l_quantity ≤ 40 fails ~20% of rows,
    n_chars ≤ 480 and the 4-language whitelist fail real documents at
    every sf — a suite that only ever passes pins nothing about the
    violation-counting path). One row per expectation:
    (table_name, expectation, n_rows, n_violations, passed), all
    BIGINT + BOOLEAN, hash-exact.

    Plan shape: per-table predicate expectations compile into ONE
    aggregation pass per table (operators/profiling.expectation_counts
    — the Deequ insight; violation predicates are stated NULL-safe so
    both engines agree), uniqueness rides the same pass via the dq1
    Expand, and each referential check is one LEFT JOIN against the
    distinct parent keys carrying no payload columns (broadcast at
    dim scale, narrow-row shuffle at fact scale —
    profiling.referential_orphans). Union of 1-row/row-per-check
    aggregates — metadata-sized output."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    documents = load_table(spark, sf_dir, "documents")
    parts = [
        profiling.expectation_counts(
            orders,
            "orders",
            [
                ("o_orderkey_not_null", F.col("o_orderkey").isNull()),
                (
                    "o_orderstatus_in_set",
                    ~F.col("o_orderstatus").isin("O", "F", "P")
                    | F.col("o_orderstatus").isNull(),
                ),
                (
                    "o_totalprice_positive",
                    ~(F.col("o_totalprice") > 0)
                    | F.col("o_totalprice").isNull(),
                ),
            ],
            unique=["o_orderkey"],
        ),
        profiling.referential_orphans(
            orders, "o_custkey", customer, "c_custkey",
            "orders", "o_custkey_in_customer",
        ),
        profiling.referential_orphans(
            lineitem, "l_orderkey", orders, "o_orderkey",
            "lineitem", "l_orderkey_in_orders",
        ),
        profiling.expectation_counts(
            lineitem,
            "lineitem",
            [
                (
                    "l_quantity_le_40",
                    ~(F.col("l_quantity") <= 40)
                    | F.col("l_quantity").isNull(),
                ),
            ],
        ),
        profiling.expectation_counts(
            events, "events", [], unique=["event_id"]
        ),
        profiling.expectation_counts(
            documents,
            "documents",
            [
                (
                    "n_chars_matches_text",
                    ~F.col("n_chars").eqNullSafe(F.length("text")),
                ),
                (
                    "n_chars_le_480",
                    ~(F.col("n_chars") <= 480) | F.col("n_chars").isNull(),
                ),
                (
                    "lang_in_whitelist",
                    ~F.col("lang").isin("en", "de", "fr", "es")
                    | F.col("lang").isNull(),
                ),
            ],
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# DQ4 — per-batch expectation deltas: dq3's contract check at dq2's
# batch grain, with the violation-rate drift alarm an ingest gate
# actually pages on.
# ---------------------------------------------------------------------------

_DQ4_EXPECTATIONS = [
    (
        "event_id_not_null",
        "SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)",
    ),
    (
        "user_id_not_null",
        "SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)",
    ),
    (
        "event_type_in_set",
        "SUM(CASE WHEN event_type NOT IN"
        " ('click', 'signup', 'error', 'view', 'purchase')"
        " OR event_type IS NULL THEN 1 ELSE 0 END)",
    ),
    (
        "value_le_100",
        "SUM(CASE WHEN NOT (value <= 100)"
        " OR value IS NULL THEN 1 ELSE 0 END)",
    ),
]

# dq4's batch key and predicate suite as ONE definition each — shared
# with st13's streaming twin (star_streaming), which must profile the
# IDENTICAL suite over the identical batch key or the result-identity
# oracle is meaningless.
DQ4_BATCH_EXPR = (
    "((unix_micros(cast(ts AS timestamp)) + 500000) div 1000000) % 2"
)


def dq4_expectation_preds() -> list:
    return [
        ("event_id_not_null", F.col("event_id").isNull()),
        ("user_id_not_null", F.col("user_id").isNull()),
        (
            "event_type_in_set",
            ~F.col("event_type").isin(
                "click", "signup", "error", "view", "purchase"
            )
            | F.col("event_type").isNull(),
        ),
        (
            "value_le_100",
            ~(F.col("value") <= 100) | F.col("value").isNull(),
        ),
    ]


# milli-rate drift threshold: |rate_b - rate_a| > 5 per-mille. The
# straddling value_le_100 expectation alarms at sf0.001/0.01 (the two
# nearest-second-parity halves differ by 18 / 7 per-mille — measured)
# and NOT at sf0.1 (50k-row batches converge to a 4 per-mille gap) —
# exactly the sampling behavior a per-batch alarm should show; the
# zero-violation expectations never alarm. Both branches occur at the
# sf0.01 gate.
#
# The batch key is the parity of the event's NEAREST epoch second —
# deliberately INDEPENDENT of every column the suite null-checks
# (r12 shipped batch = event_id % 2, which silently dropped NULL
# event_ids into batch NULL before the 0/1 join, making
# event_id_not_null structurally unable to fire — the ADVICE r12
# finding). Stated in PURE INTEGER arithmetic over epoch
# microseconds — (us + 500000) floor-div 1000000 — because the float
# second boundary is an engine trap: DuckDB's CAST(epoch(ts) AS
# BIGINT) rounds while Spark's unix_timestamp truncates, and the two
# keys disagree on every row past the half-second (caught by the
# gate on first contact). unix_micros (Spark; the parquet column is
# TIMESTAMP_NTZ, cast to LTZ under the UTC session tz first) and
# epoch_us (DuckDB) are both exact BIGINTs and div/// truncate
# identically on the positive domain. THE POSITIVE DOMAIN IS ENFORCED,
# not assumed (ADVICE r13): Spark `div` truncates toward zero while
# DuckDB `//` floors, so a pre-1970 ts would silently diverge the
# batch key cross-engine — tests/test_layout.py pins ts >= epoch 0 on
# every testdata scale; a corpus that ever carries pre-1970 events
# must switch both sides to floor semantics first.
_DQ4_ALARM_MILLI = 5

_DQ4_PROFILE_SQL = " UNION ALL ".join(
    f"""
    SELECT batch, '{name}' AS expectation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COALESCE({viol}, 0) AS BIGINT) AS n_violations
    FROM base GROUP BY batch"""
    for name, viol in _DQ4_EXPECTATIONS
)


@query(
    "dq4_batch_expectation_drift",
    f"""
    WITH base AS (
        SELECT *, ((epoch_us(ts) + 500000) // 1000000) % 2 AS batch
        FROM events
    ), p AS (
        {_DQ4_PROFILE_SQL}
    )
    SELECT a.expectation,
           a.n_rows AS n_rows_a, b.n_rows AS n_rows_b,
           a.n_violations AS n_violations_a,
           b.n_violations AS n_violations_b,
           CAST((1000 * a.n_violations) // a.n_rows AS BIGINT)
               AS rate_milli_a,
           CAST((1000 * b.n_violations) // b.n_rows AS BIGINT)
               AS rate_milli_b,
           ABS((1000 * b.n_violations) // b.n_rows
               - (1000 * a.n_violations) // a.n_rows)
               > {_DQ4_ALARM_MILLI} AS drift_alarm
    FROM p a JOIN p b
      ON a.expectation = b.expectation AND a.batch = 0 AND b.batch = 1
    """,
)
def dq4_batch_expectation_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-BATCH expectation deltas (dq3 × dq2 — the alarm a 100 TB
    ingest actually pages on: not "is the corpus clean" but "did THIS
    batch's violation rates move"): dq3's contract check run per
    ingest batch (batch = nearest-epoch-second parity of ts stands in
    for yesterday/today — time-keyed like a real ingest, and
    independent of every null-checked column so no expectation is
    structurally vacuous; dq2's event_id parity would silently
    exclude NULL event_ids from both batches — the ADVICE r12
    finding; all-integer over epoch micros, see the threshold comment
    for the float-boundary engine trap) in ONE grouped aggregation
    pass
    (expectation_counts' group_by — the suite never scans twice),
    then batch-vs-batch integer milli-rates with a drift alarm at
    > {_DQ4_ALARM_MILLI} per-mille. All-integer rates (floor-division
    milli — no float rate arithmetic anywhere), BOOLEAN alarm,
    hash-exact.

    The suite straddles deliberately (the txt8/dq3 rule):
    value_le_100 fails ~13% of each batch so its rate delta is live
    sampling noise — it alarms at sf0.001/0.01 and legitimately NOT
    at sf0.1 where 50k-row batches converge (threshold comment
    above); the not-null/value-set expectations hold and never alarm.
    Both verdict branches occur at the sf0.01 gate.

    Scale shape: one scan + one grouped aggregate (2×|suite| metadata
    rows), then a |suite|-row self-join — at 100 TB each batch's
    profile row comes from its own incremental ingest scan and the
    drift join is a metadata pass (dq2's statement, expectation-
    grain)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "batch", F.expr(DQ4_BATCH_EXPR)
    )
    prof = profiling.expectation_counts(
        ev, "events", dq4_expectation_preds(), group_by="batch"
    )
    return profiling.batch_drift(prof, _DQ4_ALARM_MILLI)
