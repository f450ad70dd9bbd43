"""Sampling-operator tests: rate accuracy, the full-rate regression,
and the core guarantee — identical selections under any partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from ig_etl_with_user_reports_2024_spark.operators.sampling import (
    hash_split,
    k_per_stratum,
    stratified_sample,
)


def _docs(spark, sf_oracle):
    return spark.read.parquet(f"{sf_oracle}/documents.parquet").select(
        "doc_id", "source"
    )


def test_hash_split_fractions_and_coverage(spark, sf_oracle):
    out = hash_split(_docs(spark, sf_oracle), key="doc_id")
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == 500 and set(counts) == {"train", "val", "test"}
    # 10% ± binomial noise on 500 draws
    assert 25 <= counts["val"] <= 80 and 25 <= counts["test"] <= 80
    assert counts["train"] > 350


def test_hash_split_stable_under_repartition(spark, sf_oracle):
    docs = _docs(spark, sf_oracle)
    a = {(r.doc_id, r.split) for r in hash_split(docs, key="doc_id").collect()}
    b = {
        (r.doc_id, r.split)
        for r in hash_split(
            docs.repartition(17, "source"), key="doc_id"
        ).collect()
    }
    assert a == b


def test_stratified_full_rate_keeps_every_row(spark, sf_oracle):
    # regression: rate 1.0 once formatted to 5-hex '10000' and silently
    # kept ~1/16 of the stratum
    docs = _docs(spark, sf_oracle)
    out = stratified_sample(docs, key="doc_id", stratum="source", rates={"src0": 1.0})
    assert out.count() == docs.filter(F.col("source") == "src0").count()


def test_stratified_rates_independent_salts(spark, sf_oracle):
    docs = _docs(spark, sf_oracle)
    half = stratified_sample(
        docs, key="doc_id", stratum="source", rates={s: 0.5 for s in ("src0", "src1", "src2", "src3")}
    ).count()
    # 4 strata × 25 docs × 0.5 → ~50, binomial noise
    assert 30 <= half <= 70


def test_k_per_stratum_deterministic_and_exact_k(spark, sf_oracle):
    docs = _docs(spark, sf_oracle)
    a = {(r.doc_id, r.sample_rank) for r in k_per_stratum(docs, "doc_id", "source", k=5).collect()}
    shuffled = docs.orderBy(F.reverse(F.col("doc_id").cast("string"))).repartition(13)
    b = {(r.doc_id, r.sample_rank) for r in k_per_stratum(shuffled, "doc_id", "source", k=5).collect()}
    assert a == b
    assert len(a) == 5 * 20  # 20 sources × k


def test_sq1_zero_vector_quantizes_to_zero(spark):
    # ANSI mode would throw on 0/0 — the scale==0 guard must hold
    from ig_etl_with_user_reports_2024_spark.plans.star_pipeline import (
        sq1_int8_quantize,
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="sq1zero_")
    spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0], 0), (2, [3.0, -4.0, 0.0], 0)],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    out = {(r.vec_id, r.i): (r.q, r.scale) for r in sq1_int8_quantize(spark, d).collect()}
    assert out[(1, 1)] == (0, 0.0) and out[(1, 3)] == (0, 0.0)
    assert out[(2, 2)] == (-127, 4.0)  # max-|e| component hits the rail


def test_sketch_rollup_accuracy(spark, sf_oracle):
    from ig_etl_with_user_reports_2024_spark.plans.star_pipeline import (
        ro2_sketch_rollup,
    )

    rows = {r.source: (r.n_estimate, r.n_exact) for r in ro2_sketch_rollup(spark, sf_oracle).collect()}
    assert "__all__" in rows and len(rows) == 21  # 20 sources + merged
    for src, (est, exact) in rows.items():
        assert abs(est - exact) <= max(2, 0.05 * exact), (src, est, exact)


def test_temperature_mix_budgets_and_upsampling(spark):
    # three sources with very different sizes: the α=0.5 mix must keep a
    # HIGHER fraction of the small source than of the big one, admit
    # lowest-hash-first, and stop within one doc of each integer budget
    import math

    from ig_etl_with_user_reports_2024_spark.operators.sampling import (
        temperature_mix,
    )

    rows = []
    sizes = {"big": 3000, "mid": 600, "small": 60}
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            i += 1
            rows.append((i, s, (i % 7) + 1))
    df = spark.createDataFrame(rows, "doc bigint, source string, n_tokens bigint")
    out = temperature_mix(df, "doc", "source", "n_tokens").collect()

    tot = {s: 0 for s in sizes}
    kept = {s: 0 for s in sizes}
    for r in out:
        tot[r.source] += r.n_tokens
        if r.kept:
            kept[r.source] += r.n_tokens
    total = sum(tot.values())
    isq = {s: math.isqrt(t) for s, t in tot.items()}
    denom = sum(isq.values())
    for s in sizes:
        budget = (total // (2 * denom)) * isq[s] + (
            (total % (2 * denom)) * isq[s]
        ) // (2 * denom)
        # budget can exceed what the source has (capped by supply)
        expect_fill = min(budget, tot[s])
        assert kept[s] <= budget
        # filled to within one max-size doc of the target
        assert expect_fill - kept[s] <= 7, (s, kept[s], expect_fill)
    frac = {s: kept[s] / tot[s] for s in sizes}
    assert frac["small"] > frac["mid"] > frac["big"]


def test_temperature_mix_plan_shape(spark):
    from pyspark.sql import functions as F

    from ig_etl_with_user_reports_2024_spark.operators.sampling import (
        temperature_mix,
    )

    df = spark.range(1, 20_000).select(
        F.col("id").alias("doc"),
        (F.col("id") % 3).cast("string").alias("source"),
        (F.col("id") % 9 + 1).alias("n_tokens"),
    )
    plan = (
        temperature_mix(df, "doc", "source", "n_tokens")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # doc-grain cumsum must ride (source, bucket) partitioning; only
    # metadata-sized side tables may hit SinglePartition
    assert "Exchange hashpartitioning(_s" in plan, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan


# --- property-based: temperature_mix vs a brute-force reference -----------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _corpus = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2_000),  # doc id
            st.integers(min_value=0, max_value=2),      # source idx
            st.integers(min_value=0, max_value=30),     # n_tokens
        ),
        min_size=0,
        max_size=40,
        unique_by=lambda t: t[0],
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(corpus=_corpus)
    def test_temperature_mix_matches_bruteforce(spark, corpus):
        import hashlib
        import math

        from ig_etl_with_user_reports_2024_spark.operators.sampling import (
            temperature_mix,
        )

        rows = [(d, f"s{s}", n) for d, s, n in corpus]
        df = spark.createDataFrame(
            rows or [(0, "s0", 0)], "doc bigint, source string, n_tokens bigint"
        ).limit(len(rows))
        got = {
            r.doc: r.kept
            for r in temperature_mix(df, "doc", "source", "n_tokens").collect()
        }
        nz = [(d, s, n) for d, s, n in rows if n > 0]
        tot = {}
        for _, s, n in nz:
            tot[s] = tot.get(s, 0) + n
        total = sum(tot.values())
        denom = sum(math.isqrt(t) for t in tot.values())
        expect = {}
        for s, t_s in tot.items():
            isq = math.isqrt(t_s)
            m = 2 * denom
            budget = (total // m) * isq + ((total % m) * isq) // m
            docs_s = sorted(
                ((d, n) for d, src, n in nz if src == s),
                key=lambda dn: (
                    hashlib.md5(f"mix:{dn[0]}".encode()).hexdigest(), dn[0]
                ),
            )
            cum = 0
            for d, n in docs_s:
                cum += n
                expect[d] = cum <= budget
        assert got == expect


def test_temperature_mix_prefix_length_invariance(spark):
    # VERDICT r4: per-source cumsum bucket count is a parameter; kept
    # decisions must be invariant to it
    from pyspark.sql import functions as F

    from ig_etl_with_user_reports_2024_spark.operators.sampling import (
        temperature_mix,
    )

    df = spark.range(1, 3_000).select(
        F.col("id").alias("doc"),
        (F.col("id") % 4).cast("string").alias("source"),
        (F.col("id") % 37 + 1).alias("n_tokens"),
    )
    base = {
        r.doc: r.kept
        for r in temperature_mix(df, "doc", "source", "n_tokens",
                                 prefix_chars=1).collect()
    }
    for pc in (2, 3):
        got = {
            r.doc: r.kept
            for r in temperature_mix(df, "doc", "source", "n_tokens",
                                     prefix_chars=pc).collect()
        }
        assert got == base, f"prefix_chars={pc} diverged"
    import pytest

    with pytest.raises(ValueError, match="prefix_chars"):
        temperature_mix(df, "doc", "source", "n_tokens", prefix_chars=9)


def test_epoch_budget_arithmetic_and_cap(spark):
    """mx2's integer plan on a constructed skewed corpus: a tiny source
    gets sqrt-boosted past the cap (capped=True, epochs_milli pinned at
    max_epochs*1000), a huge one stays under; budgets follow the exact
    floor-div decomposition; zero-token sources drop."""
    import math

    from ig_etl_with_user_reports_2024_spark.operators.sampling import (
        epoch_budget,
    )

    rows = [("tiny", 100), ("big", 10000), ("zero", 0)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    out = {r.source: r for r in
           epoch_budget(df, "source", "n_tokens",
                        budget_mult=3, max_epochs=3).collect()}
    assert set(out) == {"tiny", "big"}
    total = 10100
    isq = {"tiny": math.isqrt(100), "big": math.isqrt(10000)}
    denom = sum(isq.values())
    for s, t in (("tiny", 100), ("big", 10000)):
        budget = ((total * 3) // denom) * isq[s] \
            + (((total * 3) % denom) * isq[s]) // denom
        assert out[s].budget_tokens == budget, s
        capped_tokens = min(budget, 3 * t)
        assert out[s].capped_tokens == capped_tokens
        assert out[s].epochs_milli == capped_tokens * 1000 // t
        assert out[s].capped == (budget > capped_tokens)
    # the sqrt boost pushes the tiny source over 3 epochs; big stays under
    assert out["tiny"].capped and out["tiny"].epochs_milli == 3000
    assert not out["big"].capped and out["big"].epochs_milli < 3000


def test_mx3_importance_reorder_is_real_and_budget_faithful(spark, sf_oracle):
    """mx3 must actually REORDER admission (the txt8 non-vacuity rule:
    its admitted set differs from mx1's at sf0.01 — the bucket moves
    real docs across the budget boundary), prefer target-like docs
    (admitted mean qb <= rejected mean qb per source), and stay
    budget-faithful: same per-source reservoir semantics as mx1, so
    admitted token totals match mx1's to within one boundary doc."""
    import __spark_entry__ as em

    qs = em.queries()
    mx1 = {r.doc: r for r in qs["mx1_temperature_mix"](spark, sf_oracle).collect()}
    mx3 = {r.doc: r for r in
           qs["mx3_surprisal_weighted_mixture"](spark, sf_oracle).collect()}
    assert set(mx1) == set(mx3)          # same n_tokens>0 universe
    a1 = {d for d, r in mx1.items() if r.kept}
    a3 = {d for d, r in mx3.items() if r.kept}
    assert a3 != a1, "importance order admitted exactly mx1's set — vacuous"
    by_src: dict = {}
    for d, r in mx3.items():
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        adm = [r for r in rows if r.kept]
        rej = [r for r in rows if not r.kept]
        if adm and rej:
            mean = lambda xs: sum(x.qb for x in xs) / len(xs)  # noqa: E731
            assert mean(adm) <= mean(rej), f"{src}: admitted less target-like"
        t1 = sum(mx1[r.doc].n_tokens for r in rows if mx1[r.doc].kept)
        t3 = sum(r.n_tokens for r in adm)
        slack = max((r.n_tokens for r in rows), default=0)
        assert abs(t3 - t1) <= slack, f"{src}: budget drift beyond one doc"


def test_sp4_cluster_split_colocates_and_decontaminates(spark, sf_oracle):
    """sp4's contract (VERDICT r9 "Next round" #1), all four pins:
    (1) non-vacuity — at sf0.01 at least one multi-member dd11
    cluster straddles sp1's doc-hash split; (2) co-location — under
    sp4 every cluster's members share one split; (3) sp1-equivalence
    on singletons — same salt, so a doc that IS its own cluster gets
    sp1's exact assignment; (4) the companion measurement — dc1's
    exact-contamination hit count under sp4's split drops vs sp1's
    (to 0 on this corpus: every dc1 prefix-twin pair here is also a
    dd11 near-dup pair, so cluster-splitting co-locates them; in
    general sp4 eliminates exactly the leakage the dedup family can
    SEE, which is why dc1-dc3 stay registered as the residual
    mop-up)."""
    import __spark_entry__ as em
    from ig_etl_with_user_reports_2024_spark.operators.dedup import (
        normalized_words,
    )

    qs = em.queries()
    sp4 = {r.doc_id: r for r in qs["sp4_cluster_split"](spark, sf_oracle).collect()}
    sp1 = {r.doc_id: r.split for r in qs["sp1_hash_split"](spark, sf_oracle).collect()}
    assert set(sp4) == set(sp1)  # every doc still has exactly one split row

    clusters: dict = {}
    for r in sp4.values():
        clusters.setdefault(r.cluster_id, []).append(r)
    multi = {c: rs for c, rs in clusters.items() if len(rs) >= 2}
    assert multi, "no multi-member clusters at sf0.01 — vacuous fixture"
    straddle = [
        c for c, rs in multi.items()
        if len({sp1[r.doc_id] for r in rs}) > 1
    ]
    assert straddle, "no cluster straddles sp1 — co-location pin is vacuous"
    for c, rs in clusters.items():
        assert len({r.split for r in rs}) == 1, f"cluster {c} split under sp4"
    for c, rs in clusters.items():
        if len(rs) == 1 and rs[0].doc_id == c:
            assert rs[0].split == sp1[c], "singleton diverged from sp1"

    # companion measurement: dc1's digest join with each split source
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").select(
        "doc_id",
        F.md5(
            F.array_join(F.slice(normalized_words(F.col("text")), 1, 8), " ")
        ).alias("digest"),
    )

    def dc1_hits(split_map: dict) -> int:
        rows = docs.collect()
        eval_digests = {
            r.digest for r in rows if split_map[r.doc_id] != "train"
        }
        return sum(
            1
            for r in rows
            if split_map[r.doc_id] == "train" and r.digest in eval_digests
        )

    hits_sp1 = dc1_hits(sp1)
    hits_sp4 = dc1_hits({d: r.split for d, r in sp4.items()})
    assert hits_sp1 > 0, "no dc1 contamination under sp1 — vacuous measurement"
    assert hits_sp4 == 0, f"sp4 left {hits_sp4} exact-prefix leaks"


def test_ds2_epoch_order_invariants(spark, sf_oracle):
    """ds2's contract (VERDICT r9 "Next round" #3): every doc appears
    exactly full or full+1 times where full = capped_tokens div
    source_tokens from mx2's budget; per-source emitted tokens equal
    capped_tokens to within one boundary doc (deterministic-reservoir
    semantics on the fractional epoch); positions are one dense
    epoch-major global permutation; and consecutive epochs replay the
    source in DIFFERENT orders (the per-epoch seed is real, not a
    copy)."""
    import __spark_entry__ as em

    qs = em.queries()
    rows = qs["ds2_epoch_order"](spark, sf_oracle).collect()
    budgets = {
        r.source: r for r in qs["mx2_epoch_budget"](spark, sf_oracle).collect()
    }
    assert rows

    # dense epoch-major permutation
    poss = sorted(r.pos for r in rows)
    assert poss == list(range(len(rows)))
    by_epoch: dict = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    epochs = sorted(by_epoch)
    assert epochs == list(range(len(epochs)))
    for e in epochs[:-1]:
        assert max(r.pos for r in by_epoch[e]) < min(
            r.pos for r in by_epoch[e + 1]
        ), f"epoch {e} not position-contiguous before epoch {e + 1}"

    # per-doc repetition counts and per-source token fidelity
    per_doc: dict = {}
    per_src_tokens: dict = {}
    per_src_maxdoc: dict = {}
    for r in rows:
        per_doc.setdefault((r.source, r.doc), []).append(r)
        per_src_tokens[r.source] = per_src_tokens.get(r.source, 0) + r.n_tokens
        per_src_maxdoc[r.source] = max(per_src_maxdoc.get(r.source, 0), r.n_tokens)
    frac_fired = 0
    for (src, doc), rs in per_doc.items():
        b = budgets[src]
        full = b.capped_tokens // b.source_tokens
        assert sorted(r.epoch for r in rs) == list(range(len(rs)))
        assert len(rs) in (full, full + 1), (src, doc, len(rs), full)
        if len(rs) == full + 1:
            frac_fired += 1
    assert frac_fired > 0, "fractional epoch admitted nothing — vacuous"
    for src, tot in per_src_tokens.items():
        b = budgets[src]
        assert b.capped_tokens - per_src_maxdoc[src] <= tot <= b.capped_tokens, (
            src, tot, b.capped_tokens
        )

    # epochs 0 and 1 are different orders of the same full-epoch docs
    o0 = [r.doc for r in sorted(by_epoch[0], key=lambda r: r.pos)]
    o1 = [r.doc for r in sorted(by_epoch[1], key=lambda r: r.pos)]
    assert set(o0) == set(o1), "epochs 0/1 should hold every doc (full >= 1)"
    assert o0 != o1, "epoch 1 replayed epoch 0's order — seed not applied"


def test_ds2_epoch_interleave_plan_shape(spark):
    """epoch_interleave's scale contract (the packing.py pattern): the
    doc-grain windows ride (source|epoch, hash-prefix) partitions;
    only the metadata-sized bucket-offset tables may cross a
    SinglePartition exchange; offsets come back via broadcast joins."""
    from ig_etl_with_user_reports_2024_spark.operators.sampling import (
        epoch_budget,
        epoch_interleave,
    )

    df = spark.range(1, 5_000).select(
        F.col("id").alias("doc"),
        F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias("source"),
        (F.col("id") % 50 + 1).alias("n_tokens"),
    )
    budgets = epoch_budget(df, "source", "n_tokens")
    out = epoch_interleave(
        df, key="doc", stratum="source", tokens_col="n_tokens", budgets=budgets
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every SinglePartition exchange here is metadata-sized: the
    # (epoch, prefix) bucket-offset window (<= epochs x 4096 rows) and
    # epoch_budget's 1-row global agg over the pinned source-grain
    # table (which prints twice because the position row_number and
    # its bucket counts share the member subtree)
    assert plan.count("Exchange SinglePartition") <= 3, plan
    assert "Exchange hashpartitioning(_s" in plan, plan
    assert "Exchange hashpartitioning(_e" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_sp5_joint_split_colocates_both_modalities(spark, sf_oracle):
    """sp5's contract: (1) every dd11 lexical cluster still co-locates
    (sp4's guarantee is preserved under the coarser partition);
    (2) every 2-probe same-cell cosine>=0.40 pair co-locates (the
    semantic guarantee sp4 lacks — probed: 8 such pairs straddle sp4
    at sf0.01, 0 straddle sp5); (3) non-vacuity — sp5 moves real docs
    vs sp4; (4) a doc that is a singleton in BOTH structures keeps
    sp1's bit-exact assignment (same salt)."""
    import __spark_entry__ as em
    from ig_etl_with_user_reports_2024_spark.plans.star_pipeline import (
        semantic_multiprobe_pairs,
    )
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    qs = em.queries()
    sp5 = {r.doc_id: r for r in qs["sp5_joint_cluster_split"](spark, sf_oracle).collect()}
    sp4 = {r.doc_id: r for r in qs["sp4_cluster_split"](spark, sf_oracle).collect()}
    sp1 = {r.doc_id: r.split for r in qs["sp1_hash_split"](spark, sf_oracle).collect()}
    assert set(sp5) == set(sp1) == set(sp4)

    # (1) lexical clusters (sp4's cluster_id) still co-locate under sp5
    lex: dict = {}
    for d, r in sp4.items():
        lex.setdefault(r.cluster_id, set()).add(sp5[d].split)
    assert all(len(s) == 1 for s in lex.values())

    # (2) semantic 2-probe pairs co-locate under sp5, and some straddle sp4
    emb = load_table(spark, sf_oracle, "embeddings")
    pairs = semantic_multiprobe_pairs(emb, tau=0.40, probes=2).collect()
    assert pairs, "no semantic pairs at sf0.01 — vacuous fixture"
    straddle_sp4 = [
        p for p in pairs if sp4[p.a_id].split != sp4[p.b_id].split
    ]
    assert straddle_sp4, "no pair straddles sp4 — semantic pin is vacuous"
    for p in pairs:
        assert sp5[p.a_id].split == sp5[p.b_id].split, (p.a_id, p.b_id)

    # (3) the joint split actually differs from sp4
    assert any(sp5[d].split != sp4[d].split for d in sp5)

    # (4) joint singletons keep sp1's assignment
    joint: dict = {}
    for d, r in sp5.items():
        joint.setdefault(r.cluster_id, []).append(d)
    n_single = 0
    for c, members in joint.items():
        if len(members) == 1 and members[0] == c:
            assert sp5[c].split == sp1[c], "joint singleton diverged from sp1"
            n_single += 1
    assert n_single > 0


def test_sp5_vec_id_is_doc_id(spark, sf_oracle):
    """sp5's ID-SPACE ASSUMPTION (ADVICE r10 #2), pinned: the joint
    graph unions dd11's doc_id edges with the semantic edges' vec_ids,
    and both engines label clusters over the merged set as ONE id
    space. That is sound only while ``embeddings.vec_id`` IS a
    ``documents.doc_id``. If this assertion ever fails (embeddings
    moved to their own id space), sp5 needs a vec_id→doc_id mapping
    join on BOTH engines before the edge union — see the sp5
    docstring."""
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    docs = {r.doc_id for r in load_table(spark, sf_oracle, "documents").select("doc_id").collect()}
    vecs = {r.vec_id for r in load_table(spark, sf_oracle, "embeddings").select("vec_id").collect()}
    assert vecs <= docs, "embeddings.vec_id left the documents.doc_id space"


def test_dp3_epoch_packing_invariants(spark, sf_oracle):
    """dp3's tape contract: offsets are contiguous in pos order (each
    appearance starts where the previous ended — one continuous token
    tape across epoch boundaries), every non-final sequence holds
    exactly 2048 tokens (dp2's invariant over the multi-epoch stream,
    non-vacuous: the sf0.01 tape spans > 1 sequence), and the row set
    is exactly ds2's stream."""
    import __spark_entry__ as em

    qs = em.queries()
    rows = sorted(
        qs["dp3_epoch_packing"](spark, sf_oracle).collect(),
        key=lambda r: r.pos,
    )
    ds2 = {(r.doc, r.epoch, r.pos) for r in qs["ds2_epoch_order"](spark, sf_oracle).collect()}
    assert {(r.doc, r.epoch, r.pos) for r in rows} == ds2

    off = 0
    for r in rows:
        assert r.start_off == off, (r.pos, r.start_off, off)
        assert r.first_seq == r.start_off // 2048
        assert r.last_seq == (r.start_off + r.n_tokens - 1) // 2048
        assert r.n_seqs == r.last_seq - r.first_seq + 1
        off += r.n_tokens
    total = off
    n_seqs = (total + 2047) // 2048
    assert n_seqs > 1, "tape spans one sequence — non-final check vacuous"
    # non-final fullness follows from contiguity; assert the boundary
    # bookkeeping agrees with it at the tape ends
    assert rows[-1].last_seq == n_seqs - 1


def test_ds3_curriculum_is_tiered_block_permutation_of_ds1(spark, sf_oracle):
    """ds3's contract: (1) positions are a dense permutation of qc1's
    domain; (2) tiers occupy CONTIGUOUS position blocks in tier order
    (the curriculum property); (3) within a tier the relative order
    equals ds1's seed-42 shuffle (same hash — the curriculum is a
    block permutation of the baseline, not a new order); (4)
    non-vacuity: the global order differs from ds1's, and all four
    tiers are occupied (the fixed 220/165/110 thresholds straddle the
    corpus — the txt8 rule)."""
    import __spark_entry__ as em

    qs = em.queries()
    ds3 = {r.doc: r for r in qs["ds3_quality_curriculum"](spark, sf_oracle).collect()}
    ds1 = {r.doc: r.pos for r in qs["ds1_corpus_shuffle"](spark, sf_oracle).collect()}

    # (1) dense permutation over qc1's domain
    qc1_docs = {r.doc for r in qs["qc1_model_quality_score"](spark, sf_oracle).collect()}
    assert set(ds3) == qc1_docs
    assert sorted(r.pos for r in ds3.values()) == list(range(len(ds3)))

    # (2) contiguous tier blocks in tier order
    by_tier: dict = {}
    for r in ds3.values():
        by_tier.setdefault(r.tier, []).append(r.pos)
    assert set(by_tier) == {0, 1, 2, 3}  # (4) all tiers occupied
    hi = -1
    for t in sorted(by_tier):
        ps = sorted(by_tier[t])
        assert ps[0] == hi + 1 and ps[-1] - ps[0] == len(ps) - 1, t
        hi = ps[-1]

    # (3) within-tier relative order == ds1's
    for t, _ in by_tier.items():
        members = [d for d, r in ds3.items() if r.tier == t]
        by_ds3 = sorted(members, key=lambda d: ds3[d].pos)
        by_ds1 = sorted(members, key=lambda d: ds1[d])
        assert by_ds3 == by_ds1, t

    # (4) the global order is NOT ds1's: tier assignment is
    # uncorrelated with the shuffle hash, so some tier-0 doc must sit
    # AFTER some tier-3 doc in ds1's order while ds3 trains all of
    # tier 0 first — i.e. the tier blocks interleave under ds1
    t0 = [d for d, r in ds3.items() if r.tier == 0]
    t3 = [d for d, r in ds3.items() if r.tier == 3]
    assert max(ds1[d] for d in t0) > min(ds1[d] for d in t3)


def test_ds4_is_a_per_epoch_block_permutation_of_ds2(spark, sf_oracle):
    """ds4's invariants (the ds3 pins lifted to the epoch domain):
    (a) membership — its (doc, epoch) appearance set equals ds2's
    exactly, so every ds2 budget invariant (per-doc counts full or
    full+1, budget-to-one-boundary-doc) transfers; (b) positions are
    dense 0..N-1 and epoch-major (each epoch a contiguous block, in
    epoch order); (c) within an epoch the tiers form contiguous blocks
    in tier order — the per-epoch curriculum restart; (d) within every
    (epoch, tier) block the relative doc order equals ds2's within
    that epoch — each epoch's curriculum is a BLOCK PERMUTATION of
    that epoch's ds2 shuffle; and (e) non-vacuity: the global order
    actually differs from ds2's (tiers interleave under the plain
    shuffle)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    ds2 = qs["ds2_epoch_order"](spark, sf_oracle).collect()
    ds4 = qs["ds4_epoch_curriculum"](spark, sf_oracle).collect()
    # (a) same appearances
    assert {(r.doc, r.epoch) for r in ds2} == {(r.doc, r.epoch) for r in ds4}
    # (b) dense, epoch-major
    ds4s = sorted(ds4, key=lambda r: r.pos)
    assert [r.pos for r in ds4s] == list(range(len(ds4s)))
    assert [r.epoch for r in ds4s] == sorted(r.epoch for r in ds4s)
    # (c) contiguous tier blocks inside each epoch
    for e in {r.epoch for r in ds4s}:
        tiers = [r.tier for r in ds4s if r.epoch == e]
        assert tiers == sorted(tiers), f"epoch {e}: tiers not contiguous"
        assert len(set(tiers)) > 1, f"epoch {e}: single tier — vacuous"
    # (d) within-(epoch, tier) relative order == ds2's within-epoch order
    ds2_rank = {(r.doc, r.epoch): r.pos for r in ds2}
    for e in {r.epoch for r in ds4s}:
        for t in {r.tier for r in ds4s if r.epoch == e}:
            block = [r for r in ds4s if r.epoch == e and r.tier == t]
            ranks = [ds2_rank[(r.doc, r.epoch)] for r in block]
            assert ranks == sorted(ranks), (e, t)
    # (e) the curriculum is not the identity permutation
    assert [(r.doc, r.epoch) for r in ds4s] != [
        (r.doc, r.epoch) for r in sorted(ds2, key=lambda r: r.pos)
    ]


def test_mx4_grain_swap_real_and_budget_faithful(spark, sf_oracle):
    """mx4's contract: (1) same n_tokens>0 universe as mx1 (every
    tokenized doc has >= 1 subword token, so the grain swap cannot
    shrink the domain); (2) its metric column IS tok1's subword count
    per doc; (3) non-vacuity — the keep set differs from mx1's at
    sf0.01 (the grain moves real docs across the budget boundary);
    (4) budget-faithful in ITS OWN grain: per source, kept subword
    tokens <= a Python-recomputed floor(sqrt) budget, and the first
    rejected doc in admission order would overflow it (the reservoir
    fills exactly)."""
    import hashlib
    import math

    import __spark_entry__ as em

    qs = em.queries()
    mx1 = {r.doc: r for r in qs["mx1_temperature_mix"](spark, sf_oracle).collect()}
    mx4 = {r.doc: r for r in qs["mx4_subword_mix"](spark, sf_oracle).collect()}
    tok = {r.doc: r.n_subword_tokens
           for r in qs["tok1_subword_token_count"](spark, sf_oracle).collect()}
    assert set(mx1) == set(mx4)
    assert all(mx4[d].n_tokens == tok[d] for d in mx4)
    assert {d for d, r in mx4.items() if r.kept} != \
        {d for d, r in mx1.items() if r.kept}, "grain swap vacuous"
    by_src: dict = {}
    for d, r in mx4.items():
        by_src.setdefault(r.source, []).append(r)
    isq = {s: math.isqrt(sum(r.n_tokens for r in rows))
           for s, rows in by_src.items()}
    total = sum(sum(r.n_tokens for r in rows) for rows in by_src.values())
    denom = sum(isq.values())
    for s, rows in by_src.items():
        budget = (total // (2 * denom)) * isq[s] \
            + ((total % (2 * denom)) * isq[s]) // (2 * denom)
        order = sorted(
            rows,
            key=lambda r: (
                hashlib.md5(f"mix:{r.doc}".encode()).hexdigest(), r.doc
            ),
        )
        cum, kept = 0, []
        for r in order:
            cum += r.n_tokens
            kept.append(cum <= budget)
        assert kept == [r.kept for r in order], f"{s}: admission mismatch"


def test_tok2_cells_match_component_recompute(spark, sf_oracle):
    """tok2's 2x2 must equal a recompute from mx1's and mx4's own
    outputs (the qc2 convention), and BOTH off-diagonals must be
    non-empty at sf0.01 — otherwise the grain A/B certifies nothing
    (measured 2 / 2 at registration)."""
    import __spark_entry__ as em

    qs = em.queries()
    mx1 = {r.doc: r for r in qs["mx1_temperature_mix"](spark, sf_oracle).collect()}
    mx4 = {r.doc: r for r in qs["mx4_subword_mix"](spark, sf_oracle).collect()}
    row = qs["tok2_budget_grain_ab"](spark, sf_oracle).collect()[0]
    assert row.n_docs == len(mx1) == len(mx4)
    cells = dict(n_both_keep=0, n_both_drop=0,
                 n_word_only_keep=0, n_subword_only_keep=0)
    kw = ks = 0
    for d, w in mx1.items():
        s = mx4[d]
        if w.kept and s.kept:
            cells["n_both_keep"] += 1
        elif not w.kept and not s.kept:
            cells["n_both_drop"] += 1
        elif w.kept:
            cells["n_word_only_keep"] += 1
        else:
            cells["n_subword_only_keep"] += 1
        kw += w.n_tokens if w.kept else 0
        ks += s.n_tokens if s.kept else 0
    for k, v in cells.items():
        assert getattr(row, k) == v, k
    assert row.kept_word_tokens == kw and row.kept_subword_tokens == ks
    assert row.n_word_only_keep > 0 and row.n_subword_only_keep > 0, \
        "an off-diagonal is empty — the A/B is vacuous on this corpus"


def test_mm6_patch_text_split_and_full_domain(spark, sf_oracle):
    """mm6's contract: (1) LOCKSTEP with mm5 — n_patch_tokens equals
    the SIZE of mm5's exploded patch grid per doc (mm6 restates mm5's
    md5 metadata exprs; this pin is what keeps them from drifting);
    (2) n_text_tokens equals tok1's subword count (0 where tok1 has
    no row); (3) the domain is every PAYLOAD-BEARING document (all
    500 here — NULL-text docs would drop in both engines, the
    documented convention; unlike dp1/dp4 a doc whose text tokenizes
    to nothing still trains its image); (4) the layout equals a
    pure-Python concat-and-chop over the combined costs."""
    import __spark_entry__ as em

    qs = em.queries()
    mm6 = {r.doc: r for r in
           qs["mm6_interleaved_packing"](spark, sf_oracle).collect()}
    grid: dict = {}
    for r in qs["mm5_image_patches"](spark, sf_oracle).collect():
        grid[r.doc_id] = grid.get(r.doc_id, 0) + 1
    tok = {r.doc: r.n_subword_tokens
           for r in qs["tok1_subword_token_count"](spark, sf_oracle).collect()}
    docs_df = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    n_payload = docs_df.filter("text IS NOT NULL").count()
    assert len(mm6) == n_payload, "a payload-bearing document dropped"
    for d, r in mm6.items():
        assert r.n_patch_tokens == grid[d], d
        assert r.n_text_tokens == tok.get(d, 0), d
        assert r.n_tokens == r.n_patch_tokens + r.n_text_tokens
    cum, L = 0, 2048
    for d in sorted(mm6):
        r = mm6[d]
        start = cum
        cum += r.n_tokens
        assert (r.start_off, r.first_seq, r.last_seq) == (
            start, start // L, (cum - 1) // L), d


def test_mx5_multimodal_grain_and_budget_faithful(spark, sf_oracle):
    """mx5's contract: (1) its metric IS mm6's combined cost per doc
    (one construction — this pin catches any de-coupling of the
    mixture from the packer); (2) the domain is every payload-bearing
    doc (mm6's convention — image-only docs participate); (3)
    non-vacuity — the keep set differs from BOTH mx1's word grain and
    mx4's subword grain at sf0.01 (probed 5/6 and 6/7 flips at
    registration); (4) budget-faithful in its own grain: per-source
    admission equals a full Python recompute of the floor(sqrt)
    reservoir, mx4's test convention."""
    import hashlib
    import math

    import __spark_entry__ as em

    qs = em.queries()
    mx5 = {r.doc: r for r in qs["mx5_multimodal_mix"](spark, sf_oracle).collect()}
    mm6 = {r.doc: r for r in
           qs["mm6_interleaved_packing"](spark, sf_oracle).collect()}
    assert set(mx5) == set(mm6)
    assert all(mx5[d].n_tokens == mm6[d].n_tokens for d in mx5)
    k5 = {d for d, r in mx5.items() if r.kept}
    for other in ("mx1_temperature_mix", "mx4_subword_mix"):
        ko = {r.doc for r in qs[other](spark, sf_oracle).collect() if r.kept}
        assert k5 != ko, f"grain swap vacuous vs {other}"
    by_src: dict = {}
    for d, r in mx5.items():
        by_src.setdefault(r.source, []).append(r)
    isq = {s: math.isqrt(sum(r.n_tokens for r in rows))
           for s, rows in by_src.items()}
    total = sum(sum(r.n_tokens for r in rows) for rows in by_src.values())
    denom = sum(isq.values())
    for s, rows in by_src.items():
        budget = (total // (2 * denom)) * isq[s] \
            + ((total % (2 * denom)) * isq[s]) // (2 * denom)
        order = sorted(
            rows,
            key=lambda r: (
                hashlib.md5(f"mix:{r.doc}".encode()).hexdigest(), r.doc
            ),
        )
        cum, kept = 0, []
        for r in order:
            cum += r.n_tokens
            kept.append(cum <= budget)
        assert kept == [r.kept for r in order], f"{s}: admission mismatch"
