"""cp1_curated_corpus contract tests beyond the oracle net: the packed
layout must be a consistent training stream (dense positions, exact
token prefix sums, seq indices derived from them), every corpus doc
must be a manifest 'keep', and the quality gate feeding it must be
non-vacuous (the pre-r8 threshold kept ZERO synthetic docs, which made
the whole chain an empty — and therefore meaningless — hash match)."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod


def test_txt8_keeps_both_verdicts(spark, sf_oracle):
    t = entry_mod.queries()["txt8_filter_verdict"](spark, sf_oracle)
    by = {r.keep: r.n for r in t.groupBy("keep").agg(F.count("*").alias("n")).collect()}
    assert by.get(True, 0) > 0, "quality gate keeps nothing — cp1 is vacuous"
    assert by.get(False, 0) > 0


def test_cp1_is_a_consistent_training_stream(spark, sf_oracle):
    rows = sorted(
        entry_mod.queries()["cp1_curated_corpus"](spark, sf_oracle).collect(),
        key=lambda r: r.pos,
    )
    assert rows, "curated corpus is empty"
    # dense permutation: pos = 0..n-1, shard = pos // 1000
    assert [r.pos for r in rows] == list(range(len(rows)))
    assert all(r.shard == r.pos // 1000 for r in rows)
    # exact prefix sums in shuffle order, and seq indices derived from them
    cum = 0
    for r in rows:
        assert r.n_tokens > 0
        assert r.start_off == cum
        cum += r.n_tokens
        assert r.first_seq == r.start_off // 2048
        assert r.last_seq == (cum - 1) // 2048
        assert r.n_seqs == r.last_seq - r.first_seq + 1 >= 1
    # provenance: every admitted doc is a manifest 'keep'
    keeps = {
        r.doc_id
        for r in entry_mod.queries()["cm1_corpus_manifest"](spark, sf_oracle)
        .filter(F.col("action") == "keep")
        .collect()
    }
    assert {r.doc for r in rows} <= keeps
    # the mixture is a real cut: not every keep survives the budget
    assert len(rows) < len(keeps)


def test_cp2_datacard_sums_to_cp1(spark, sf_oracle):
    """The data card must be an exact rollup of the corpus it
    describes: per-source doc/token totals and position ranges match
    cp1's rows, and the global position range is the full 0..n-1."""
    cp1 = entry_mod.queries()["cp1_curated_corpus"](spark, sf_oracle).collect()
    cp2 = {r.source: r for r in
           entry_mod.queries()["cp2_corpus_datacard"](spark, sf_oracle).collect()}
    by_src: dict = {}
    for r in cp1:
        by_src.setdefault(r.source, []).append(r)
    assert set(cp2) == set(by_src)
    for src, rows in by_src.items():
        card = cp2[src]
        assert card.n_docs == len(rows)
        assert card.n_tokens == sum(r.n_tokens for r in rows)
        assert card.n_seq_slots == sum(r.n_seqs for r in rows)
        assert card.n_shards == len({r.shard for r in rows})
        assert card.first_pos == min(r.pos for r in rows)
        assert card.last_pos == max(r.pos for r in rows)
    assert min(c.first_pos for c in cp2.values()) == 0
    assert max(c.last_pos for c in cp2.values()) == len(cp1) - 1


def _seq_token_fill(rows, L=2048):
    """Per-sequence token fill from doc-grain packing rows (dp2's
    interval-clipping arithmetic, recomputed independently here)."""
    fill: dict = {}
    for r in rows:
        for s in range(r.first_seq, r.last_seq + 1):
            t = min(r.start_off + r.n_tokens, (s + 1) * L) - max(
                r.start_off, s * L
            )
            fill[s] = fill.get(s, 0) + t
    return fill


def test_cp3_delta_release_and_merged_invariant(spark, sf_oracle):
    """cp3 is a consistent training stream over cm2's admitted batch
    (cp1's stream contract in the delta namespace), every packed doc
    is a cm2 'admit', and on the MERGED release (cp1 ∪ cp3, keyed by
    the release column) dp2's packing invariant holds: within each
    release namespace every non-final sequence holds exactly 2048
    tokens. The delta side has no non-final sequence at sf0.01 (2
    admitted docs); the non-vacuous delta-side check runs at sf0.1 in
    tests/test_scale.py."""
    cp3 = sorted(
        entry_mod.queries()["cp3_incremental_release"](spark, sf_oracle)
        .collect(),
        key=lambda r: r.pos,
    )
    assert cp3, "delta release is empty — vacuous"
    assert all(r.release == "delta" for r in cp3)
    assert [r.pos for r in cp3] == list(range(len(cp3)))
    cum = 0
    for r in cp3:
        assert r.n_tokens > 0
        assert r.start_off == cum
        cum += r.n_tokens
        assert r.first_seq == r.start_off // 2048
        assert r.last_seq == (cum - 1) // 2048
    admits = {
        r.doc_id
        for r in entry_mod.queries()["cm2_incremental_admission"](
            spark, sf_oracle
        )
        .filter(F.col("action") == "admit")
        .collect()
    }
    assert {r.doc for r in cp3} <= admits
    # merged invariant, per release namespace. At sf0.01 neither chain
    # fills a whole 2048-token sequence (16 + 2 admitted docs), so the
    # non-final==2048 branch cannot fire here — the NON-VACUOUS form of
    # this check runs at sf0.1 in tests/test_scale.py, where cp3 alone
    # spans 3 sequences. Here we assert the arithmetic that IS
    # reachable: fills are interval-exact and never overflow.
    cp1 = entry_mod.queries()["cp1_curated_corpus"](spark, sf_oracle).collect()
    for rows in (cp1, cp3):
        fill = _seq_token_fill(rows)
        assert sum(fill.values()) == sum(r.n_tokens for r in rows)
        assert set(fill) == set(range(max(fill) + 1))  # no seq gaps
        last = max(fill)
        for s, t in fill.items():
            if s < last:
                assert t == 2048, f"non-final seq {s} holds {t} tokens"
            else:
                assert 0 < t <= 2048


def test_cp4_diff_is_an_exact_rollup_of_both_releases(spark, sf_oracle):
    """cp4's per-source rows must be exact rollups of the releases it
    diffs (cp2's card on the before side, cp3's delta on the added
    side), cover every source either release touches, and satisfy the
    before+added=after arithmetic row-by-row."""
    cp2 = {r.source: r for r in
           entry_mod.queries()["cp2_corpus_datacard"](spark, sf_oracle).collect()}
    cp3 = entry_mod.queries()["cp3_incremental_release"](spark, sf_oracle).collect()
    diff = {r.source: r for r in
            entry_mod.queries()["cp4_datacard_diff"](spark, sf_oracle).collect()}
    assert diff, "empty diff — vacuous"
    added: dict = {}
    for r in cp3:
        a = added.setdefault(r.source, [0, 0])
        a[0] += 1
        a[1] += r.n_tokens
    assert set(diff) == set(cp2) | set(added)
    assert any(r.docs_added > 0 for r in diff.values()), "no batch growth"
    for src, r in diff.items():
        b = cp2.get(src)
        assert r.docs_before == (b.n_docs if b else 0)
        assert r.tokens_before == (b.n_tokens if b else 0)
        assert r.docs_added == added.get(src, [0, 0])[0]
        assert r.tokens_added == added.get(src, [0, 0])[1]
        assert r.docs_after == r.docs_before + r.docs_added
        assert r.tokens_after == r.tokens_before + r.tokens_added
