"""Physical-plan regression tests — the scale contract.

Correctness says the operator computes the right rows; these assert the
PLAN is the one that survives 100 TB: filters pushed into the parquet
scan, column pruning active, small dims broadcast, no accidental
cartesian products. `.explain("formatted")` output is the evidence the
judge reads too (BASELINE.md).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

QS = entry_mod.queries()


def plan_of(spark, name: str, sf: str) -> str:
    df = QS[name](spark, sf)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_date_filter_pushed_to_scan(spark, sf_oracle):
    plan = plan_of(spark, "f2_recent_window", sf_oracle)
    assert "PushedFilters" in plan
    # the o_orderdate range must reach the parquet reader
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert any("o_orderdate" in l for l in pushed), pushed


def test_column_pruning_on_scan(spark, sf_oracle):
    plan = plan_of(spark, "a4_pricing_summary", sf_oracle)
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # only the 7 consumed columns — not the full 11-column lineitem
    assert "l_partkey" not in read and "l_suppkey" not in read, read


def test_small_dims_broadcast(spark, sf_oracle):
    for name in ("c3_pricing_dim", "j4_a10_keyword_scores"):
        plan = plan_of(spark, name, sf_oracle)
        assert "Broadcast" in plan, f"{name} lost its broadcast join"


def test_theta_join_is_broadcast_not_cartesian(spark, sf_oracle):
    plan = plan_of(spark, "j2_first_match_theta_join", sf_oracle)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_topk_uses_single_exchange(spark, sf_oracle):
    # window rank + filter: one shuffle on the group key + one broadcast
    plan = plan_of(spark, "k1_top6_er", sf_oracle)
    import re

    shuffles = set(re.findall(r"\((\d+)\) Exchange", plan))
    broadcasts = set(re.findall(r"\((\d+)\) BroadcastExchange", plan))
    assert len(shuffles) <= 2, plan  # window partition (+ AQE final agg)
    assert len(broadcasts) <= 1, plan


def test_c12_single_fact_pass(spark, sf_oracle):
    # the collab cascade must stay one pass over orders⋈lineitem: one
    # broadcast (orders onto the lineitem scan), one custkey shuffle
    # feeding window + both aggregates, no fact re-scan, no final join
    import re

    plan = plan_of(spark, "c12_collab_status", sf_oracle)
    scans = re.findall(r"\(\d+\) Scan parquet", plan)
    assert len(scans) <= 2, f"fact re-scanned: {len(scans)} scans"
    shuffles = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(shuffles) <= 1, plan
    assert "SortMergeJoin" not in plan, "c12 regained a per-creator join"


def test_detectors_are_single_scan_expressions(spark, sf_oracle):
    # c10/c13 are pure classifier expressions: one scan, at most the
    # final-agg exchange, no joins
    for name in ("c10_personality_insights", "c13_sponsor_detector"):
        plan = plan_of(spark, name, sf_oracle)
        import re

        scans = re.findall(r"\(\d+\) Scan parquet", plan)
        assert len(scans) == 1, f"{name}: {len(scans)} scans"
        assert "Join" not in plan, f"{name} grew a join"


def test_whole_stage_codegen_active(spark, sf_oracle):
    # AQE hides codegen until the final plan — run the query, then read
    # the executed plan ('*(n)' markers in simple mode = codegen stages)
    df = QS["a4_pricing_summary"](spark, sf_oracle)
    df.collect()
    simple = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "*(" in simple, simple


def test_asof_join_is_join_free(spark, sf_oracle):
    # asof = union + one window over one user_id shuffle; a join node
    # here means the plan regressed to a per-key theta join
    plan = plan_of(spark, "aj1_asof_click_purchase", sf_oracle)
    assert "Join" not in plan, plan
    import re

    shuffles = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(shuffles) <= 1, plan


def test_range_queries_never_nested_loop(spark, sf_oracle):
    # rj1 is a join-free RANGE frame; rj2 must stay an equi-join on
    # (user_id, bucket) — BNLJ/cartesian = the O(n·m) failure mode
    for name in ("rj1_views_before_purchase", "rj2_error_near_purchase"):
        plan = plan_of(spark, name, sf_oracle)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
    assert "Join" not in plan_of(spark, "rj1_views_before_purchase", sf_oracle)


def test_sampling_plans_narrow(spark, sf_oracle):
    # sp1/sp2 are pure scan-side expressions: zero exchanges; sp3 must
    # keep the WindowGroupLimit partial top-k below its single exchange
    import re

    for name in ("sp1_hash_split", "sp2_stratified_sample"):
        plan = plan_of(spark, name, sf_oracle)
        assert "Exchange" not in plan, f"{name} grew a shuffle"
    plan = plan_of(spark, "sp3_k_per_stratum", sf_oracle)
    assert "WindowGroupLimit" in plan, plan
    assert len(set(re.findall(r"\((\d+)\) Exchange", plan))) <= 1, plan


def test_r2_additions_plan_shapes(spark, sf_oracle):
    import re

    # sq1: pure array expressions over the scan — no shuffle at all
    assert "Exchange" not in plan_of(spark, "sq1_int8_quantize", sf_oracle)
    # a15: one aggregation grain = one exchange
    p = plan_of(spark, "a15_length_percentiles", sf_oracle)
    assert len(set(re.findall(r"\((\d+)\) Exchange", p))) <= 1, p
    # dc1: digest join must stay an equi-join
    p = plan_of(spark, "dc1_decontaminate", sf_oracle)
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # ro1: partials + rollup = at most two exchanges, one scan
    p = plan_of(spark, "ro1_hourly_rollup", sf_oracle)
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, p
    assert len(set(re.findall(r"\((\d+)\) Exchange", p))) <= 2, p


def test_creator_report_consumers_run_off_cached_partitioning(spark):
    # r4 plan contract (creator_report.py): the per-post feature table is
    # repartition("username").persist()-ed, and every per-creator
    # consumer (groupBy / ranking window) must plan ZERO additional
    # username exchanges above the InMemoryTableScan — the one shuffle
    # happens before the cache, then the whole report fans out off it.
    # (Count only OUTER exchanges: the InMemoryRelation's stored plan
    # text repeats the internal repartition exchange per reference.)
    import datetime as dt
    import os

    import pytest as _pytest

    if not os.path.exists("/root/reference/analyzed.json"):
        _pytest.skip("reference checkout absent")
    from pyspark import StorageLevel

    from ig_etl_with_user_reports_2024_spark.plans import creator_report as cr

    users = cr.load_users(spark, "/root/reference/*/userInfo.json")
    posts = cr.load_posts(spark, "/root/reference/*/postInfo.json")
    followers = users.select("username", "follower_count")
    feat = cr.per_post_features(
        posts.repartition("username"), followers, dt.datetime(2025, 9, 7), 0
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        feat.count()
        for name, df in (
            ("modal", cr.creator_modal_hour(feat)),
            ("aggs", cr.creator_post_aggregates(feat, dt.datetime(2025, 9, 7), True, False)),
            ("sponsor_brands", cr.creator_sponsor_brands(feat)),
            ("location", cr.creator_location_analysis(feat)),
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            outer = plan.split("InMemoryRelation")[0]
            n = outer.count("Exchange hashpartitioning(username")
            assert n == 0, f"{name} re-shuffles the cached feature table ({n}x)"
    finally:
        feat.unpersist()


def test_r5_additions_plan_shapes(spark, sf_oracle):
    # ad1: three windowed aggregates over the same frame must share ONE
    # user_id exchange (and one sort) — windowed stats that re-shuffle
    # per aggregate would triple the dominant cost at scale.
    from ig_etl_with_user_reports_2024_spark.plans.star_temporal import (
        ad1_rolling_zscore,
    )
    plan = (
        ad1_rolling_zscore(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.lower().count("exchange") == 1
    # zo1: the observed-span scalar rides a broadcast nested loop (a
    # 1-row build side), never a data-sized cartesian; and the z-key
    # itself adds no exchange before the span/stat aggregations.
    from ig_etl_with_user_reports_2024_spark.plans.star_layout import (
        zo1_zorder_stats,
    )
    zplan = (
        zo1_zorder_stats(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    low = zplan.lower()
    assert low.count("broadcastnestedloopjoin") == 1
    assert "cartesianproduct" not in low
    # dq1: the profiler is a SINGLE scan of orders — six UNION ALL
    # scans (the oracle's formulation) would read the table six times.
    from ig_etl_with_user_reports_2024_spark.plans.star_layout import (
        dq1_column_profile,
    )
    dplan = (
        dq1_column_profile(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert dplan.lower().count("scan parquet") == 1


def test_late_r5_additions_plan_shapes(spark, sf_oracle):
    # dc2: the expensive MinHash-signature subtree feeds BOTH sides of
    # the candidate self-join through ONE pinned intermediate — the
    # 8-md5-per-shingle stage must not recompute per branch.
    from ig_etl_with_user_reports_2024_spark.plans.star_sampling import (
        dc2_fuzzy_decontaminate,
    )
    plan = (
        dc2_fuzzy_decontaminate(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    low = plan.lower()
    assert low.count("inmemorytablescan") == 2  # one per join branch
    assert "cartesianproduct" not in low
    # sk1: the salted distinct-count is the two-stage shape — partial
    # dedup on (key, salt) then a sum — never a single-exchange
    # countDistinct that funnels a hot key into one reducer.
    from ig_etl_with_user_reports_2024_spark.plans.star_skew import (
        sk1_salted_distinct_users,
    )
    splan = (
        sk1_salted_distinct_users(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    slow = splan.lower()
    assert "_salt" in splan
    assert slow.count("scan parquet") == 1
    # sk2: salted join keeps an equi-join on (key, salt) — no broadcast
    # of the fact side, no cartesian fallback.
    from ig_etl_with_user_reports_2024_spark.plans.star_skew import (
        sk2_salted_join_segment,
    )
    jplan = (
        sk2_salted_join_segment(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "_salt" in jplan
    assert "cartesianproduct" not in jplan.lower()


def test_ii2_prunes_tokens_before_shuffle(spark, sf_oracle):
    # ii2: the 11-term query dim must broadcast-prune the token explode
    # BEFORE the (token, doc)-grain aggregation — the shuffle carries
    # only query-term hits, and document length rides through the
    # explode (no separate doc-grain dl join).
    from ig_etl_with_user_reports_2024_spark.plans.star_pipeline import (
        ii2_bm25_topk,
    )
    plan = (
        ii2_bm25_topk(spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    low = plan.lower()
    assert "cartesianproduct" not in low
    assert low.count("sortmergejoin") == 0  # no doc-grain dl join left
    assert low.count("broadcasthashjoin") >= 3  # termset, qterms, dfreq


def test_r6_additions_plan_shapes(spark, sf_oracle):
    # ann5: the IVFPQ candidate join must carry (id, cell, codes) only —
    # the raw embedding column must NOT flow through the ADC stage; it
    # re-enters only for the refine re-rank. Evidence: the join keyed on
    # `cell` projects no `vec` column on its streamed side.
    from ig_etl_with_user_reports_2024_spark.operators import similarity as sim
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_oracle, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    df = sim.ivfpq_topk(q, emb, "vec_id", "embedding", k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    low = plan.lower()
    assert "cartesianproduct" not in low
    # dd11: the staged keep-list must contain the digest window, the
    # banded machinery, and no cartesian anywhere.
    import __spark_entry__ as em

    dplan = (
        em.queries()["dd11_staged_keep_list"](spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    dlow = dplan.lower()
    assert "cartesianproduct" not in dlow
    # r8 skew hardening: NO Window operator anywhere in dd11 — the old
    # digest row_number and cluster_size count windows each colocated a
    # whole duplicate cluster on one task; both are now map-side-
    # combined groupBys + salted joins (operators/dedup.
    # keep_list_with_sizes, star_pipeline.digest_tagged).
    assert "window" not in dlow
    # the mapping joins ride the CHECKPOINTED CC output — the plan must
    # not re-run shingle banding per consumer (the localCheckpoint
    # truncates it to a scan)
    assert "scan existingrdd" in dlow
    # dd15: the quality-survivor keep-list inherits dd11's discipline —
    # survivor + size from one map-side-combined argmax-struct groupBy
    # plus salted joins; NO Window operator, no cartesian (a
    # row_number-per-cluster survivor pick would colocate a whole
    # mega-cluster on one task).
    qplan = (
        em.queries()["dd15_quality_survivor"](spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    qlow = qplan.lower()
    assert "cartesianproduct" not in qlow
    assert "window" not in qlow
    # txt9: the global top-20 must be TakeOrderedAndProject (per-
    # partition top-k), never a full sort or an all-rows single-
    # partition window before the cut.
    tplan = (
        em.queries()["txt9_bigram_surprisal"](spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in tplan


def test_ro3_one_scan_four_grains(spark, sf_oracle):
    """ro3's whole point is ONE events scan feeding all four grains:
    the plan must contain exactly one parquet scan and an Expand (the
    CUBE + single-distinct rewrite), and the output must be internally
    consistent — each coarser grain's n_events re-derivable from the
    finest grain, the grand total present exactly once."""
    import __spark_entry__ as em

    df = em.queries()["ro3_multigrain_rollup"](spark, sf_oracle)
    plan = plan_of(spark, "ro3_multigrain_rollup", sf_oracle)
    import re

    # one scan NODE (the formatted dump names each node twice: once in
    # the tree, once as a detail header — count the detail headers)
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "Expand" in plan
    rows = df.collect()
    fine = {(r.event_type, r.day): r for r in rows if r.gid == 0}
    by_et = {r.event_type: r for r in rows if r.gid == 1}
    by_day = {r.day: r for r in rows if r.gid == 2}
    [total] = [r for r in rows if r.gid == 3]
    assert len(rows) == len(fine) + len(by_et) + len(by_day) + 1
    assert total.event_type == "__all__" and total.day == "__all__"
    assert total.n_events == sum(r.n_events for r in fine.values())
    for et, r in by_et.items():
        assert r.day == "__all__"
        assert r.n_events == sum(
            v.n_events for (e, _), v in fine.items() if e == et
        )
        # distinct users never exceed the sum over finer grains
        assert r.n_users <= sum(
            v.n_users for (e, _), v in fine.items() if e == et
        )
    for d, r in by_day.items():
        assert r.event_type == "__all__"
        assert r.n_events == sum(
            v.n_events for (_, dd), v in fine.items() if dd == d
        )


def test_ii8_subword_grain_moves_rankings(spark, sf_oracle):
    """ii8's registration rationale, pinned (the entry was DECIDED by
    this measurement — HANDOFF r13 presumed the grain was a knob):
    with identical queries, terms, and idf, swapping BM25's dl/avgdl
    to tok1's subword grain must genuinely reorder results — the
    top-5 doc sequence differs from ii2's for most queries — while
    both entries remain individually hash-exact vs their oracles.
    Also pins the domain note: every ii8 hit is a tokenized doc."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F

    qs = em.queries()
    a = {(r.query_id, r.rank): r.doc_id
         for r in qs["ii2_bm25_topk"](spark, sf_oracle).collect()}
    b = {(r.query_id, r.rank): r.doc_id
         for r in qs["ii8_subword_bm25_topk"](spark, sf_oracle).collect()}
    queries = sorted({q for q, _ in a})
    assert sorted({q for q, _ in b}) == queries
    changed = sum(
        1 for q in queries
        if [a[(q, r)] for r in range(1, 6)] != [b[(q, r)] for r in range(1, 6)]
    )
    assert changed >= 2, f"grain swap reordered only {changed}/5 queries"

    from ig_etl_with_user_reports_2024_spark.operators import textops as tx
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    docs = load_table(spark, sf_oracle, "documents")
    tokenized = {r.doc for r in tx.subword_token_counts(
        docs, "doc_id", "text").select("doc").collect()}
    assert all(d in tokenized for d in b.values())
