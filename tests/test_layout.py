"""Z-order key, range layout, and column-profiling operator tests:
bit-interleave parity with a Python reference, physical-plan shape of
the write-side layout, single-pass profiler correctness."""

from __future__ import annotations

import calendar

from pyspark.sql import functions as F

from ig_etl_with_user_reports_2024_spark.operators.graph import pagerank
from ig_etl_with_user_reports_2024_spark.operators.layout import (
    layout_by_zorder,
    zorder_key,
    zorder_sql,
)
from ig_etl_with_user_reports_2024_spark.operators.profiling import (
    profile_columns,
)


def _py_zorder(vals: list[int], bits: int) -> int:
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


def test_zorder_key_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (1999, 99), (65535, 65535)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zorder_key(["a", "b"], 16)).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_zorder([a, b], 16), (a, b)


def test_zorder_locality_beats_lexicographic(spark):
    # The point of the curve: on a 32x32 grid, consecutive z-keys span
    # small (a, b) boxes. Cut the 1024 cells into 16 contiguous z-runs
    # of 64 and check every run's bounding box is the expected 16x16
    # quadtree cell — under a lexicographic (a*32+b) order the same
    # cut yields runs spanning the full 0-31 b-range.
    cells = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(cells, "a bigint, b bigint")
    runs = (
        df.withColumn("z", zorder_key(["a", "b"], 5))
        .withColumn("run", F.expr("z div 64"))
        .groupBy("run")
        .agg(
            (F.max("a") - F.min("a")).alias("aspan"),
            (F.max("b") - F.min("b")).alias("bspan"),
        )
        .collect()
    )
    assert len(runs) == 16
    for r in runs:
        assert r.aspan == 7 and r.bspan == 7, r


def test_zorder_sql_text_matches_column_expr(spark):
    df = spark.createDataFrame(
        [(i * 37 % 2048, i * 91 % 128) for i in range(200)],
        "a bigint, b bigint",
    )
    df.createOrReplaceTempView("zz")
    via_sql = spark.sql(
        f"SELECT a, b, {zorder_sql(['a', 'b'], 12)} AS z FROM zz"
    )
    via_col = df.withColumn("z", zorder_key(["a", "b"], 12))
    assert via_sql.exceptAll(via_col).count() == 0
    assert via_col.exceptAll(via_sql).count() == 0


def test_zorder_key_width_guard():
    try:
        zorder_key(["a", "b"], 32)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("2 cols x 32 bits must not fit a long key")


def test_layout_by_zorder_plan_is_one_range_exchange(spark, sf_smoke):
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    li = load_table(spark, sf_smoke, "lineitem")
    out = layout_by_zorder(li, ["l_partkey", "l_suppkey"], bits=16, num_files=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # the local sort must not introduce a second exchange
    assert plan.lower().count("exchange") == 1


def test_profile_columns_counts(spark):
    rows = [
        (1, "x", 10.0),
        (2, "y", None),
        (2, None, 3.5),
        (None, "x", 3.5),
    ]
    df = spark.createDataFrame(rows, "k bigint, s string, v double")
    prof = {
        r.col_name: r
        for r in profile_columns(
            df, numeric=["k", "v"], strings=["s"], timestamps=[]
        ).collect()
    }
    assert prof["k"].n_nulls == 1 and prof["k"].n_distinct == 2
    assert prof["k"].min_num == 1.0 and prof["k"].max_num == 2.0
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert prof["s"].min_str == "x" and prof["s"].max_str == "y"
    assert prof["v"].n_nulls == 1 and prof["v"].n_distinct == 2
    assert prof["v"].min_num == 3.5 and prof["v"].max_num == 10.0
    # type-family slots not applicable to a column stay NULL
    assert prof["k"].min_str is None and prof["v"].max_str is None
    assert prof["s"].min_num is None


def test_profile_columns_grouped_single_pass(spark):
    rows = [
        (0, 1, "x"),
        (0, None, "y"),
        (1, 3, None),
        (1, 4, "z"),
        (1, 4, "z"),
    ]
    df = spark.createDataFrame(rows, "batch int, k bigint, s string")
    prof = profile_columns(
        df, numeric=["k"], strings=["s"], timestamps=[], group_by="batch"
    )
    got = {(r.batch, r.col_name): r for r in prof.collect()}
    assert got[(0, "k")].n_rows == 2 and got[(0, "k")].n_nulls == 1
    assert got[(1, "k")].n_distinct == 2 and got[(1, "k")].max_num == 4.0
    assert got[(1, "s")].n_nulls == 1 and got[(1, "s")].n_distinct == 1
    # grouped profile stays ONE scan of the input (AQE plan text repeats
    # the tree as "initial plan" — count inside the final plan only)
    plan = prof._jdf.queryExecution().executedPlan().toString().lower()
    final = plan.split("== initial plan ==")[0]
    assert final.count("scan existingrdd") <= 1


def _brute_pagerank(edges: list[tuple[int, int]], iters: int) -> dict[int, int]:
    nodes = sorted({n for e in edges for n in e})
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        contrib: dict[int, int] = {}
        for s, d in edges:
            contrib[d] = contrib.get(d, 0) + rank[s] // outdeg[s]
        rank = {n: 150_000 + (85 * contrib.get(n, 0)) // 100 for n in nodes}
    return rank


def test_pagerank_matches_integer_brute_force(spark):
    edges = [
        (1, 2), (2, 1), (2, 3), (3, 1), (3, 4), (4, 3), (1, 4), (4, 1),
        (5, 1),  # 5 has out-edges but no in-edges: floor rank
    ]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r.id: r.rank_scaled for r in pagerank(df, iterations=3).collect()
    }
    assert got == _brute_pagerank(edges, 3)
    # no-inbound node holds the undamped base rank exactly
    assert got[5] == 150_000


def test_pagerank_is_partitioning_invariant(spark):
    edges = [(i, (i * 7 + 3) % 50) for i in range(200)] + [
        ((i * 13) % 50, i % 40) for i in range(200)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df1 = spark.createDataFrame(edges, "src bigint, dst bigint")
    df64 = df1.repartition(64)
    r1 = {r.id: r.rank_scaled for r in pagerank(df1, 3).collect()}
    r64 = {r.id: r.rank_scaled for r in pagerank(df64, 3).collect()}
    assert r1 == r64
    # duplicate edges are legal input (parallel edges add weight);
    # brute force sees the same multiset
    assert r1 == _brute_pagerank(edges, 3)


def test_zo2_zorder_prunes_linear_does_not(spark, sf_oracle):
    """The pruning claim behind zo2: under the 2-D middle-10% predicate
    the z-ordered layout must skip most buckets while the insert-order
    layout skips none (both dims uncorrelated with l_orderkey)."""
    from ig_etl_with_user_reports_2024_spark.plans.star_layout import (
        zo2_pruning_effectiveness,
    )

    rows = {r.layout: r for r in zo2_pruning_effectiveness(spark, sf_oracle).collect()}
    lin, zo = rows["linear"], rows["zorder"]
    assert lin.buckets_touched == lin.n_buckets  # no skipping at all
    assert zo.buckets_touched <= 0.25 * zo.n_buckets  # >= 75% skipped
    assert zo.rows_touched <= 0.25 * zo.rows_total
    # both layouts cover the same corpus
    assert lin.rows_total == zo.rows_total


def test_dq3_suite_recompute_and_both_branches(spark, sf_oracle):
    """dq3's contract: every cell recomputed from the raw tables in
    Python (duckdb-free, engine-third-opinion), the suite exercises
    BOTH branches (the txt8 rule — a suite that only passes pins
    nothing about violation counting), and the failing set is exactly
    the three deliberately-straddling distribution expectations —
    uniqueness/referential/consistency must genuinely hold on the
    corpus, not vacuously."""
    import __spark_entry__ as em

    qs = em.queries()
    out = {(r.table_name, r.expectation): r
           for r in qs["dq3_expectation_suite"](spark, sf_oracle).collect()}
    assert len(out) == 11
    assert all(r.passed == (r.n_violations == 0) for r in out.values())
    failing = {k for k, r in out.items() if not r.passed}
    assert failing == {
        ("lineitem", "l_quantity_le_40"),
        ("documents", "n_chars_le_480"),
        ("documents", "lang_in_whitelist"),
    }

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").collect()
    li = spark.read.parquet(f"{sf_oracle}/lineitem.parquet") \
        .select("l_orderkey", "l_quantity").collect()
    orders = spark.read.parquet(f"{sf_oracle}/orders.parquet") \
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice").collect()
    cust = {r.c_custkey for r in spark.read.parquet(
        f"{sf_oracle}/customer.parquet").select("c_custkey").collect()}

    r = out[("lineitem", "l_quantity_le_40")]
    assert r.n_rows == len(li)
    assert r.n_violations == sum(
        1 for x in li if x.l_quantity is None or not x.l_quantity <= 40)
    r = out[("documents", "n_chars_le_480")]
    assert r.n_violations == sum(
        1 for d in docs if d.n_chars is None or not d.n_chars <= 480)
    r = out[("documents", "lang_in_whitelist")]
    assert r.n_violations == sum(
        1 for d in docs if d.lang not in ("en", "de", "fr", "es"))
    r = out[("documents", "n_chars_matches_text")]
    # IS DISTINCT FROM semantics (review finding): a NULL on exactly
    # one side is a violation, NULL on both sides is not
    assert r.n_violations == sum(
        1 for d in docs
        if (d.n_chars is None) != (d.text is None)
        or (d.n_chars is not None and d.n_chars != len(d.text)))
    r = out[("orders", "o_orderkey_unique")]
    keys = [o.o_orderkey for o in orders if o.o_orderkey is not None]
    assert r.n_violations == len(keys) - len(set(keys))
    r = out[("orders", "o_custkey_in_customer")]
    assert r.n_rows == len(orders)
    assert r.n_violations == sum(
        1 for o in orders if o.o_custkey not in cust)
    ok = {o.o_orderkey for o in orders}
    r = out[("lineitem", "l_orderkey_in_orders")]
    assert r.n_violations == sum(1 for x in li if x.l_orderkey not in ok)


def test_dq3_violation_branch_counts_dirty_rows(spark):
    """The violation-counting path on genuinely dirty data (the gate
    corpus is clean on the pass-branch expectations): a constructed
    table with NULL keys, duplicate keys, and orphan references must
    produce the exact violation counts — including the NULL-verdict-
    is-a-violation convention every predicate states explicitly."""
    from pyspark.sql import functions as F

    from ig_etl_with_user_reports_2024_spark.operators.profiling import (
        expectation_counts,
        referential_orphans,
    )

    rows = [(1, 10.0), (2, -5.0), (2, None), (None, 3.0), (4, 0.0)]
    df = spark.createDataFrame(rows, "k bigint, v double")
    out = {r.expectation: r for r in expectation_counts(
        df, "t",
        [
            ("k_not_null", F.col("k").isNull()),
            ("v_positive", ~(F.col("v") > 0) | F.col("v").isNull()),
        ],
        unique=["k"],
    ).collect()}
    assert out["k_not_null"].n_violations == 1
    assert out["v_positive"].n_violations == 3   # -5, NULL, 0
    assert out["k_unique"].n_violations == 1     # the second k=2
    assert all(r.n_rows == 5 for r in out.values())
    assert not out["v_positive"].passed and not out["k_unique"].passed

    parent = spark.createDataFrame([(1,), (2,)], "pk bigint")
    r = referential_orphans(df, "k", parent, "pk", "t", "k_in_parent") \
        .collect()[0]
    assert (r.n_rows, r.n_violations, r.passed) == (5, 2, False)  # NULL + 4


def test_dq4_batch_recompute_and_alarm_branches(spark, sf_oracle):
    """dq4's contract: every cell recomputed from the raw events rows
    in pure Python (per-batch counts, floor-division milli-rates, the
    alarm inequality), and BOTH alarm branches occur at the gate scale
    — value_le_100's sampling noise between the two random halves
    trips the 5-per-mille threshold while the clean expectations never
    do (the straddle rule; at sf0.1 the batches legitimately converge
    — disclosed in the entry)."""
    import __spark_entry__ as em

    qs = em.queries()
    out = {r.expectation: r
           for r in qs["dq4_batch_expectation_drift"](spark, sf_oracle).collect()}
    assert len(out) == 4
    ev = spark.read.parquet(f"{sf_oracle}/events.parquet").select(
        "event_id", "user_id", "event_type", "value", "ts").collect()
    types = {"click", "signup", "error", "view", "purchase"}
    exp = {}
    for name, pred in [
        ("event_id_not_null", lambda e: e.event_id is None),
        ("user_id_not_null", lambda e: e.user_id is None),
        ("event_type_in_set", lambda e: e.event_type not in types),
        ("value_le_100",
         lambda e: e.value is None or not e.value <= 100),
    ]:
        cells = {0: [0, 0], 1: [0, 0]}
        for e in ev:
            # batch key = nearest-epoch-second parity of ts
            # (independent of every null-checked column — the ADVICE
            # r12 fix); driver TZ and session TZ are both UTC, so the
            # collected naive datetime's timegm IS the epoch second
            # Spark/DuckDB compute, and the integer micro arithmetic
            # matches the entry's (us + 500000) // 1000000 exactly.
            us = calendar.timegm(e.ts.timetuple()) * 1_000_000 \
                + e.ts.microsecond
            b = ((us + 500_000) // 1_000_000) % 2
            cells[b][0] += 1
            cells[b][1] += pred(e)
        exp[name] = cells
    for name, cells in exp.items():
        r = out[name]
        (na, va), (nb, vb) = cells[0], cells[1]
        ra, rb = 1000 * va // na, 1000 * vb // nb
        assert [r.n_rows_a, r.n_rows_b, r.n_violations_a,
                r.n_violations_b, r.rate_milli_a, r.rate_milli_b,
                r.drift_alarm] == [na, nb, va, vb, ra, rb,
                                   abs(rb - ra) > 5], name
    assert out["value_le_100"].drift_alarm, "straddle never alarmed"
    assert not any(out[n].drift_alarm for n in out
                   if n != "value_le_100"), "clean expectation alarmed"


def test_dq4_batch_key_positive_domain_enforced(spark):
    """The dq4/st13 batch key's truncate-vs-floor agreement (Spark
    `div` truncates toward zero, DuckDB `//` floors) holds only for
    non-negative epoch micros — enforce the domain on every testdata
    scale instead of assuming it (ADVICE r13). A pre-1970 events ts
    would need both sides moved to floor semantics first."""
    from pyspark.sql import functions as F

    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    for sf in ("0.001", "0.01", "0.1"):
        ev = load_table(spark, f"/root/testdata/sf{sf}", "events")
        m = ev.agg(
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("lo")
        ).collect()[0]
        assert m.lo is not None and m.lo >= 0, (sf, m.lo)
