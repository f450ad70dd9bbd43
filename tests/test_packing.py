"""pack_offsets unit tests: known-value packing math, bucket-width
invariance (the two-level prefix sum must be bit-identical to the
single-window semantics for ANY bucketing), and edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from ig_etl_with_user_reports_2024_spark.operators.packing import pack_offsets


def _rows(df):
    return {
        r.doc: (r.n_tokens, r.start_off, r.first_seq, r.last_seq, r.n_seqs)
        for r in df.collect()
    }


def test_known_values_l10(spark):
    # tokens [4,5,3,10,2] → cum [4,9,12,22,24]; L=10
    data = [(1, 4), (2, 5), (3, 3), (4, 10), (5, 2)]
    df = spark.createDataFrame(data, "doc bigint, n_tokens bigint")
    got = _rows(pack_offsets(df, "doc", "n_tokens", seq_len=10, bucket_width=2))
    assert got == {
        1: (4, 0, 0, 0, 1),
        2: (5, 4, 0, 0, 1),
        3: (3, 9, 0, 1, 2),   # straddles the seq-0/seq-1 boundary
        4: (10, 12, 1, 2, 2),  # exactly L tokens, offset 12 → spans 1..2
        5: (2, 22, 2, 2, 1),
    }


def test_bucket_width_invariance(spark):
    # the decomposed prefix sum must equal the global one for any width
    data = [(i, (i * 37) % 11 + 1) for i in range(1, 200)]
    df = spark.createDataFrame(data, "doc bigint, n_tokens bigint")
    base = _rows(pack_offsets(df, "doc", "n_tokens", seq_len=64, bucket_width=1))
    for w in (3, 16, 1000):
        assert (
            _rows(pack_offsets(df, "doc", "n_tokens", seq_len=64, bucket_width=w))
            == base
        ), f"bucket_width={w} diverged"


def test_empty_docs_dropped_and_gaps_ok(spark):
    # zero-token docs vanish; sparse/gappy ids still pack densely
    data = [(10, 5), (11, 0), (5000, 7), (99999, 1)]
    df = spark.createDataFrame(data, "doc bigint, n_tokens bigint")
    got = _rows(pack_offsets(df, "doc", "n_tokens", seq_len=4, bucket_width=256))
    assert set(got) == {10, 5000, 99999}
    assert got[10] == (5, 0, 0, 1, 2)
    assert got[5000] == (7, 5, 1, 2, 2)
    assert got[99999] == (1, 12, 3, 3, 1)


def test_plan_has_no_data_sized_single_partition_exchange(spark):
    # the scale contract: the doc-grain running sum rides a window
    # PARTITIONED by the range bucket; only the metadata-sized
    # bucket-offset table may pass through a SinglePartition exchange,
    # and it must come back via a broadcast join
    df = spark.range(1, 10_000).select(
        F.col("id").alias("doc"), (F.col("id") % 50 + 1).alias("n_tokens")
    )
    out = pack_offsets(df, "doc", "n_tokens", seq_len=128, bucket_width=256)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "Exchange hashpartitioning(_b" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_shuffle_positions_match_global_row_number(spark):
    # the hash-prefix-bucket decomposition must equal the single global
    # row_number over (md5, id) — verified directly against a collected
    # global sort here (small n), and against DuckDB's row_number in the
    # ds1 oracle
    from ig_etl_with_user_reports_2024_spark.operators.packing import (
        shuffle_positions,
    )

    df = spark.range(1, 500).select(F.col("id").alias("doc"))
    got = {
        r.doc: (r.pos, r.shard)
        for r in shuffle_positions(df, "doc", seed=42, shard_size=100).collect()
    }
    import hashlib

    expect_order = sorted(
        range(1, 500),
        key=lambda i: (hashlib.md5(f"42|{i}".encode()).hexdigest(), i),
    )
    for pos, doc in enumerate(expect_order):
        assert got[doc] == (pos, pos // 100), (doc, pos, got[doc])
    # positions are a dense permutation
    assert sorted(p for p, _ in got.values()) == list(range(499))


def test_shuffle_positions_plan_shape(spark):
    from ig_etl_with_user_reports_2024_spark.operators.packing import (
        shuffle_positions,
    )

    df = spark.range(1, 10_000).select(F.col("id").alias("doc"))
    out = shuffle_positions(df, "doc")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "Exchange hashpartitioning(_hb" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


# --- property-based: packing invariants vs a brute-force reference --------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _docs = st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5_000),   # doc id (non-neg)
            st.integers(min_value=0, max_value=50),      # n_tokens (0 drops)
        ),
        min_size=0,
        max_size=40,
        unique_by=lambda t: t[0],
    )

    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=_docs, seq_len=st.integers(min_value=1, max_value=64),
           width=st.integers(min_value=1, max_value=512))
    def test_pack_offsets_matches_bruteforce(spark, docs, seq_len, width):
        df = spark.createDataFrame(
            docs or [(0, 0)], "doc bigint, n_tokens bigint"
        )
        got = {
            r.doc: (r.start_off, r.first_seq, r.last_seq, r.n_seqs)
            for r in pack_offsets(
                df, "doc", "n_tokens", seq_len=seq_len, bucket_width=width
            ).collect()
        }
        # brute force: one sequential pass in id order
        cum = 0
        expect = {}
        for doc, n in sorted(d for d in docs if d[1] > 0):
            start = cum
            cum += n
            expect[doc] = (
                start, start // seq_len, (cum - 1) // seq_len,
                (cum - 1) // seq_len - start // seq_len + 1,
            )
        assert got == expect

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(ids=st.lists(st.integers(min_value=0, max_value=10_000),
                        min_size=0, max_size=40, unique=True),
           shard=st.integers(min_value=1, max_value=20))
    def test_shuffle_positions_matches_bruteforce(spark, ids, shard):
        import hashlib

        from ig_etl_with_user_reports_2024_spark.operators.packing import (
            shuffle_positions,
        )

        df = spark.createDataFrame(
            [(i,) for i in ids] or [(0,)], "doc bigint"
        ).limit(len(ids))
        got = {
            r.doc: (r.pos, r.shard)
            for r in shuffle_positions(df, "doc", seed=7, shard_size=shard)
            .collect()
        }
        order = sorted(
            ids, key=lambda i: (hashlib.md5(f"7|{i}".encode()).hexdigest(), i)
        )
        assert got == {
            doc: (p, p // shard) for p, doc in enumerate(order)
        }


def test_shuffle_positions_prefix_length_invariance(spark):
    # VERDICT r4: the bucket count must be a parameter, and the result
    # must be invariant to it (bucket order extends hash order for any
    # prefix length)
    from ig_etl_with_user_reports_2024_spark.operators.packing import (
        shuffle_positions,
    )

    df = spark.range(1, 2_000).select(F.col("id").alias("doc"))
    base = {
        r.doc: (r.pos, r.shard)
        for r in shuffle_positions(df, "doc", seed=9, shard_size=64,
                                   prefix_chars=1).collect()
    }
    for pc in (2, 3, 4):
        got = {
            r.doc: (r.pos, r.shard)
            for r in shuffle_positions(df, "doc", seed=9, shard_size=64,
                                       prefix_chars=pc).collect()
        }
        assert got == base, f"prefix_chars={pc} diverged"


def test_shuffle_positions_plan_tracks_prefix_chars(spark):
    # the knob must reach the physical plan: the bucket column is
    # substring(_h, 1, prefix_chars), so window parallelism scales as
    # 16^prefix_chars instead of a fixed 256
    from ig_etl_with_user_reports_2024_spark.operators.packing import (
        shuffle_positions,
    )

    import re

    df = spark.range(1, 10_000).select(F.col("id").alias("doc"))
    for pc in (2, 4):
        plan = (
            shuffle_positions(df, "doc", prefix_chars=pc)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert re.search(rf"substring\(_h#\d+, 1, {pc}\)", plan), plan
        assert "Exchange hashpartitioning(_hb" in plan, plan
    import pytest

    with pytest.raises(ValueError, match="prefix_chars"):
        shuffle_positions(df, "doc", prefix_chars=0)
    with pytest.raises(ValueError, match="prefix_chars"):
        shuffle_positions(df, "doc", prefix_chars=6)


def test_tiered_shuffle_positions_reference_and_plan(spark):
    """tiered_shuffle_positions == the global row_number over
    (tier, md5, id), verified against a Python-sorted reference; the
    composite (tier, hash-prefix) bucketing must leave NO data-sized
    SinglePartition exchange (the per-bucket windows hash-partition on
    (_t, _hb) even when one tier holds most rows) and the offset table
    joins back broadcast."""
    import hashlib

    from ig_etl_with_user_reports_2024_spark.operators.packing import (
        tiered_shuffle_positions,
    )

    # deliberately skewed tiers: 80% of docs in tier 0
    df = spark.range(1, 500).select(
        F.col("id").alias("doc"),
        F.when(F.col("id") % 5 < 4, 0).otherwise(F.col("id") % 5).alias("tier"),
    )
    got = {
        r.doc: (r.tier, r.pos, r.shard)
        for r in tiered_shuffle_positions(df, "doc", "tier", seed=42, shard_size=100).collect()
    }
    expect_order = sorted(
        range(1, 500),
        key=lambda i: (
            0 if i % 5 < 4 else i % 5,
            hashlib.md5(f"42|{i}".encode()).hexdigest(),
            i,
        ),
    )
    for pos, doc in enumerate(expect_order):
        t = 0 if doc % 5 < 4 else doc % 5
        assert got[doc] == (t, pos, pos // 100), (doc, got[doc], pos)

    big = spark.range(1, 10_000).select(
        F.col("id").alias("doc"), (F.col("id") % 3).alias("tier")
    )
    plan = tiered_shuffle_positions(big, "doc", "tier")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "Exchange hashpartitioning(_t" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_epoch_tiered_positions_reference_and_plan(spark):
    """epoch_tiered_positions == the global row_number over (epoch,
    tier, md5(epoch|id), id), verified against a Python-sorted
    reference (epochs reseed the hash exactly like ds2); the THREE-part
    composite (epoch, tier, hash-prefix) bucketing must leave NO
    data-sized SinglePartition exchange even when one tier dominates,
    and the offset table joins back broadcast. Carry-through contract:
    input columns survive."""
    import hashlib

    from ig_etl_with_user_reports_2024_spark.operators.packing import (
        epoch_tiered_positions,
    )

    # skewed tiers (80% tier 0), 2 epochs, an extra carried column
    df = spark.range(1, 400).select(
        F.col("id").alias("doc"),
        F.when(F.col("id") % 5 < 4, 0).otherwise(1).alias("tier"),
        (F.col("id") * 10).alias("payload"),
    ).crossJoin(spark.range(0, 2).select(F.col("id").alias("epoch")))
    out = epoch_tiered_positions(df, "doc", "epoch", "tier")
    got = {(r.doc, r.epoch): (r.tier, r.payload, r.pos) for r in out.collect()}
    expect_order = sorted(
        [(d, e) for d in range(1, 400) for e in (0, 1)],
        key=lambda de: (
            de[1],
            0 if de[0] % 5 < 4 else 1,
            hashlib.md5(f"{de[1]}|{de[0]}".encode()).hexdigest(),
            de[0],
        ),
    )
    for pos, (d, e) in enumerate(expect_order):
        t = 0 if d % 5 < 4 else 1
        assert got[(d, e)] == (t, d * 10, pos), ((d, e), got[(d, e)], pos)

    big = spark.range(1, 10_000).select(
        F.col("id").alias("doc"),
        (F.col("id") % 3).alias("tier"),
    ).crossJoin(spark.range(0, 3).select(F.col("id").alias("epoch")))
    plan = (
        epoch_tiered_positions(big, "doc", "epoch", "tier")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert "Exchange hashpartitioning(_e" in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_dp4_subword_grain_recompute_and_nonvacuity(spark, sf_oracle):
    """dp4's layout must equal a pure-Python concat-and-chop over
    tok1's subword counts (the mx3/dp1 recompute convention), and the
    grain swap must be REAL (the txt8 non-vacuity rule): the corpus
    needs more L=2048 sequences at subword grain than dp1 built at
    word grain, and doc offsets actually move."""
    import __spark_entry__ as em

    qs = em.queries()
    tok = {r.doc: r.n_subword_tokens
           for r in qs["tok1_subword_token_count"](spark, sf_oracle).collect()}
    got = {r.doc: (r.n_tokens, r.start_off, r.first_seq, r.last_seq, r.n_seqs)
           for r in qs["dp4_subword_packing"](spark, sf_oracle).collect()}
    assert set(got) == {d for d, n in tok.items() if n > 0}
    cum, L = 0, 2048
    for d in sorted(tok):
        n = tok[d]
        if n <= 0:
            continue
        start = cum
        cum += n
        first, last = start // L, (cum - 1) // L
        assert got[d] == (n, start, first, last, last - first + 1), d
    dp1 = {r.doc: (r.first_seq, r.last_seq)
           for r in qs["dp1_sequence_packing"](spark, sf_oracle).collect()}
    # got values are (n_tokens, start_off, first_seq, LAST_SEQ, n_seqs):
    # compare sequence indices to sequence indices (review finding —
    # start_off vs last_seq was vacuously true)
    assert max(r[3] for r in got.values()) > max(r[1] for r in dp1.values()), \
        "subword grain did not add sequences — vacuous"
    moved = sum(1 for d in got if d in dp1 and got[d][2] != dp1[d][0])
    assert moved > 0, "no doc changed first_seq — vacuous"
