"""Text-analysis operator tests on constructed corpora."""

from __future__ import annotations

from ig_etl_with_user_reports_2024_spark.operators import textops as tx


def test_lang_id_predicts_constructed_languages(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog in a house is that for you"),
            (2, "der hund und die katze ist nicht mit ein"),
            (3, "el perro la casa de que y en un es"),
            (4, "xyzzy plugh qwerty"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc: r.predicted_lang for r in tx.lang_id(df, "doc_id", "text").collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "unknown"


def test_lang_id_tie_breaks_by_declared_priority(spark):
    # 'la'+'de' hit both es and fr lists equally → priority order (es=3 < fr=4)
    df = spark.createDataFrame([(1, "la de")], "doc_id bigint, text string")
    out = tx.lang_id(df, "doc_id", "text").collect()[0]
    assert out.predicted_lang == "es"


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! x2")], "doc_id bigint, text string")
    r = tx.token_counts(df, "doc_id", "text").collect()[0]
    assert r.ws_tokens == 3
    # hello , world ! x 2 → 6 BPE-ish tokens
    assert r.bpe_tokens == 6


def test_quality_score_ranges(spark):
    df = spark.createDataFrame(
        [
            (1, "the and of to in is that for a with " * 10),  # stopword-rich
            (2, "!!!! ???? ;;;; ::::"),  # punctuation garbage
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc: r.quality_score for r in tx.quality_score(df, "doc_id", "text").collect()}
    assert out[1] > 60
    assert out[2] < 20
    assert all(0 <= v <= 100 for v in out.values())


def test_fingerprints_ordering_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "gamma beta alpha"),  # same bag of words, different order
            (3, "alpha beta delta"),
        ],
        "doc_id bigint, text string",
    )
    content = {r.doc: r.fingerprint for r in tx.content_fingerprint(df, "doc_id", "text").collect()}
    rolling = {
        r.doc: r.rolling_fingerprint
        for r in tx.rolling_hash_fingerprint(df, "doc_id", "text").collect()
    }
    assert content[1] == content[2]  # order-insensitive
    assert content[1] != content[3]
    assert rolling[1] != rolling[2]  # order-sensitive


def test_hashtag_regex_is_unicode_aware(spark):
    # the reference's Python \w is Unicode; Java \w is ASCII unless (?U)
    from pyspark.sql import functions as F

    from ig_etl_with_user_reports_2024_spark.functions.text import (
        extract_hashtags,
    )

    df = spark.createDataFrame(
        [(1, "love it #café #日本 #plain")], "id bigint, caption string"
    )
    [r] = df.select(extract_hashtags(F.col("caption")).alias("h")).collect()
    assert r.h == ["café", "日本", "plain"]


def test_ii3_bm25_scores_match_duckdb_within_tolerance(spark, sf_oracle):
    """ii3's driver oracle checks ranks only (ln is libm-dependent);
    this pins the SCORES cross-engine at 1e-9 relative tolerance, so a
    formula drift (wrong k1/b, missing avgdl, swapped idf) cannot hide
    behind an accidentally-preserved ranking."""
    from tools.oracle_check import duck_connect

    from ig_etl_with_user_reports_2024_spark.plans.star_pipeline import (
        _bm25_topk,
    )

    sp = {
        (r.query_id, r.doc_id): r.score
        for r in _bm25_topk(spark, sf_oracle, log_idf=True).collect()
    }
    con = duck_connect(sf_oracle)
    try:
        from ig_etl_with_user_reports_2024_spark.plans.registry import QUERIES

        oracle = QUERIES["ii3_bm25_log_idf"].oracle
        # reuse the registered oracle's CTE chain, surface the score
        body = oracle[: oracle.rindex("SELECT query_id, doc_id,")]
        rows = con.execute(
            body
            + """SELECT query_id, doc_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, doc_id
               ) AS INT) AS r
            FROM agg QUALIFY r <= 5"""
        ).fetchall()
    finally:
        con.close()
    du = {(q, d): sc for q, d, sc, _ in rows}
    assert set(sp) == set(du)
    for key, s_val in sp.items():
        assert abs(s_val - du[key]) <= 1e-9 * max(abs(s_val), abs(du[key])), (
            key,
            s_val,
            du[key],
        )


def test_ii4_rerank_moves_and_orders(spark, sf_oracle):
    """ii4's PRF re-rank must be a real permutation of the BM25 order
    (a centroid that never moves anything means the feedback vector is
    degenerate or the cosine is constant), with dense per-query ranks
    and NULL prf_cos rows at the bottom in BM25 order."""
    import __spark_entry__ as em

    rows = em.queries()["ii4_prf_rerank"](spark, sf_oracle).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    moved = 0
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        # NULLs (no embedding / zero norm) are a suffix, in BM25 order
        tail = [r for r in rs if r.prf_cos is None]
        assert rs[len(rs) - len(tail):] == tail
        assert [r.bm25_rank for r in tail] == sorted(r.bm25_rank for r in tail)
        moved += sum(1 for r in rs if r.rank != r.bm25_rank)
    assert moved > 0


def test_txt10_backoff_fires_and_scores_match_duckdb(spark, sf_oracle):
    """txt10's driver oracle checks ranks + integer backoff tallies;
    this pins (a) that the train-only counts make stupid backoff REAL
    (a self-scored corpus never backs off — the whole point of the
    split, HANDOFF_r08) and (b) the ln-based scores cross-engine at
    1e-9 relative tolerance."""
    from tools.oracle_check import duck_connect

    from ig_etl_with_user_reports_2024_spark.plans.star_pipeline import (
        _TXT10_SCORES_SQL,
        _trigram_surprisal_scores,
    )

    rows = _trigram_surprisal_scores(spark, sf_oracle).collect()
    assert rows
    assert sum(r.n_bo2 + r.n_bo1 + r.n_oov for r in rows) > 0
    sp = {r.doc_id: r.ms for r in rows}
    con = duck_connect(sf_oracle)
    try:
        du = dict(
            con.execute(
                _TXT10_SCORES_SQL + "SELECT doc_id, ms FROM agg"
            ).fetchall()
        )
    finally:
        con.close()
    assert set(sp) == set(du)
    for key, s_val in sp.items():
        assert abs(s_val - du[key]) <= 1e-9 * max(abs(s_val), abs(du[key])), (
            key,
            s_val,
            du[key],
        )


def test_ii5_fusion_contract(spark, sf_oracle):
    """RRF must (a) keep dense per-query ranks, (b) reproduce each
    term exactly (1/(60+r) from the two input ranks), and (c) actually
    fuse — some doc must outrank its BM25 position because its cosine
    rank pulled it up, and vector-less docs must survive on the
    lexical term alone."""
    import __spark_entry__ as em

    rows = em.queries()["ii5_rrf_fusion"](spark, sf_oracle).collect()
    assert rows
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        expect = 1.0 / (60 + r.bm25_rank) + (
            1.0 / (60 + r.cos_rank) if r.cos_rank is not None else 0.0
        )
        assert r.rrf_score == expect
    moved = 0
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        moved += sum(1 for r in rs if r.rank != r.bm25_rank)
    assert moved > 0


def test_dp2_sequences_are_exactly_full(spark, sf_oracle):
    """Every training sequence except the last must hold exactly 2048
    tokens (the packing-writer integrity check dp2 exists for), seqs
    must be dense 0..max, and doc ranges must be non-overlapping in
    packing order across boundaries (seq s+1 starts at s's last doc —
    the straddler — or any later doc id; ids need not be dense)."""
    import __spark_entry__ as em

    rows = sorted(
        em.queries()["dp2_sequence_manifest"](spark, sf_oracle).collect(),
        key=lambda r: r.seq,
    )
    assert rows
    assert [r.seq for r in rows] == list(range(len(rows)))
    for r in rows[:-1]:
        assert r.n_tokens_in_seq == 2048, r
    assert 0 < rows[-1].n_tokens_in_seq <= 2048
    for a, b in zip(rows, rows[1:]):
        assert b.first_doc >= a.last_doc


def test_txt9_surprisal_scores_match_duckdb_within_tolerance(spark, sf_oracle):
    """txt9's driver oracle checks ranks only (ln is libm-dependent);
    this pins the per-doc mean surprisal cross-engine at 1e-9 relative
    tolerance, so a count/denominator/fold drift cannot hide behind an
    accidentally-preserved ranking."""
    from tools.oracle_check import duck_connect

    from ig_etl_with_user_reports_2024_spark.plans.star_pipeline import (
        _bigram_surprisal_scores,
    )
    from ig_etl_with_user_reports_2024_spark.plans.registry import QUERIES

    sp = {
        r.doc_id: r.ms
        for r in _bigram_surprisal_scores(spark, sf_oracle).collect()
    }
    oracle = QUERIES["txt9_bigram_surprisal"].oracle
    body = oracle[: oracle.rindex("SELECT doc_id, rank FROM (")]
    con = duck_connect(sf_oracle)
    try:
        rows = con.execute(body + "SELECT doc_id, ms FROM agg").fetchall()
    finally:
        con.close()
    du = dict(rows)
    assert set(sp) == set(du)
    assert len(sp) > 100  # docs with >= 2 words — the bulk of the corpus
    for doc, v in sp.items():
        assert abs(v - du[doc]) <= 1e-9 * max(abs(v), abs(du[doc]), 1e-30), (
            doc, v, du[doc],
        )


def test_winnowing_guarantee_and_density(spark):
    """The paper's detection guarantee: two documents sharing a run of
    >= w + k - 1 words (here 8) must share at least one fingerprint;
    disjoint texts share none; and selection density lands near the
    expected 2/(w+1) on random-ish text."""
    import hashlib
    import random

    rnd = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    shared = " ".join(rnd.choice(vocab) for _ in range(8))  # w + k - 1
    a = " ".join(rnd.choice(vocab) for _ in range(40)) + " " + shared
    b = shared + " " + " ".join(rnd.choice(vocab) for _ in range(40))
    c = " ".join(rnd.choice(vocab) for _ in range(60))
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id bigint, text string"
    )
    # recover the selected SETS (not just the digest) by re-deriving
    # the same plan pieces: assert via pairwise digest inequality plus
    # an explicit shared-fp check through a self-join on fp values
    out = tx.winnowing_fingerprints(df, "doc_id", "text")
    rows = {r.doc: r for r in out.collect()}
    assert rows[1].n_fps > 0 and rows[2].n_fps > 0
    # expected density ~ 2/(w+1) = 1/3; allow generous slack
    for d in (1, 2, 3):
        dens = rows[d].n_fps / rows[d].n_windows
        assert 0.1 < dens < 0.75, (d, dens)
    # guarantee: docs 1 and 2 share a fingerprint; doc 3 shares none
    # (vocab draw makes an accidental 4-gram collision implausible),
    # checked against a pure-python reference of the same construction
    def fps(text, k=4, w=5):
        ws = text.lower().split()
        gh = [hashlib.md5(" ".join(ws[i:i + k]).encode()).hexdigest()
              for i in range(len(ws) - k + 1)]
        return {min(gh[i:i + w]) for i in range(len(gh) - w + 1)}

    assert fps(a) & fps(b), "shared 8-word run must share a fingerprint"
    assert not (fps(a) & fps(c))
    # and the Spark digests agree with the pure-python reference sets
    for d, t in ((1, a), (2, b), (3, c)):
        ref = hashlib.md5("|".join(sorted(fps(t))).encode()).hexdigest()
        assert rows[d].fp_digest == ref
        assert rows[d].n_fps == len(fps(t))


def _py_winnow_fps(text, k=4, w=5):
    import hashlib

    ws = text.lower().split()
    gh = [hashlib.md5(" ".join(ws[i:i + k]).encode()).hexdigest()
          for i in range(len(ws) - k + 1)]
    return {min(gh[i:i + w]) for i in range(len(gh) - w + 1)}


def _py_winnow_pairs(texts, k=4, w=5, min_shared=2, max_fp_df=1000):
    """Pure-python reference of operators/textops.winnowing_pairs."""
    from collections import Counter

    fps = {d: _py_winnow_fps(t, k, w) for d, t in texts.items()}
    df = Counter(f for s in fps.values() for f in s)
    kept = {d: {f for f in s if df[f] <= max_fp_df} for d, s in fps.items()}
    ids = sorted(texts)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sh = len(kept[a] & kept[b])
            if sh >= min_shared:
                out[(a, b)] = (
                    sh, len(fps[a]), len(fps[b]),
                    sh / min(len(fps[a]), len(fps[b])),
                )
    return out


def test_winnowing_pairs_reference_and_stop_fingerprint_cap(spark):
    """dd14's mechanics on a constructed corpus, checked exactly against
    a pure-python reference: (1) a planted 16-word shared run surfaces
    that pair (a 16-word run contains 9 fully-interior windows and one
    gram hash can be the min of at most w of them, so >= 2 shared fps
    — clears min_shared=2); (2) the MOSS stop-fingerprint cap drops
    boilerplate shared by more docs than max_fp_df, which the synthetic
    corpus can never reach (max fp df there is 3) — so the mechanism is
    pinned here instead (txt8 vacuity rule); (3) n_fps_a/b stay PRE-cap
    (txt11's n_fps) and containment = shared/min."""
    import random

    rnd = random.Random(11)
    vocab = [f"w{i}" for i in range(500)]

    def rtext(n):
        return " ".join(rnd.choice(vocab) for _ in range(n))

    run = rtext(16)          # the copied passage: >= 2 shared fps
    boiler = rtext(16)       # boilerplate shared by 8 docs
    texts = {
        1: rtext(40) + " " + run,
        2: run + " " + rtext(40),
    }
    for d in range(3, 11):
        texts[d] = rtext(10) + " " + boiler + " " + rtext(10)
    df = spark.createDataFrame(
        sorted(texts.items()), "doc_id bigint, text string"
    )

    for cap in (1000, 5):
        ref = _py_winnow_pairs(texts, max_fp_df=cap)
        got = {
            (r.a_id, r.b_id): (
                r.shared_fps, r.n_fps_a, r.n_fps_b, r.containment
            )
            for r in tx.winnowing_pairs(
                df, "doc_id", "text", min_shared=2, max_fp_df=cap
            ).collect()
        }
        assert set(got) == set(ref), (cap, set(got) ^ set(ref))
        for pair, (sh, na, nb, cont) in ref.items():
            gsh, gna, gnb, gcont = got[pair]
            assert (gsh, gna, gnb) == (sh, na, nb), (cap, pair)
            assert abs(gcont - cont) < 1e-12
            assert 0.0 < gcont <= 1.0
    # the planted copy pair always survives; the boilerplate fps have
    # df=8 > 5, so under cap=5 every boilerplate-only pair vanishes
    uncapped = _py_winnow_pairs(texts, max_fp_df=1000)
    capped = _py_winnow_pairs(texts, max_fp_df=5)
    assert (1, 2) in uncapped and (1, 2) in capped
    boiler_pairs = {p for p in uncapped if p[0] >= 3}
    assert len(boiler_pairs) == 28  # C(8,2): boilerplate collides all
    assert not any(p[0] >= 3 for p in capped)


def test_ii6_metrics_match_python_reference(spark, sf_oracle):
    """ii6's integer metrics re-derived with a pure-python reference:
    labels = docs containing every query term >= min_tf times; metrics
    recomputed from the same BM25 ranking the entry consumes."""
    import collections

    import __spark_entry__ as em
    from ig_etl_with_user_reports_2024_spark.plans.star_pipeline import (
        _BM25_QUERIES,
        _II6_MIN_TF,
        _bm25_topk,
    )
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    out = {r.query_id: r for r in
           em.queries()["ii6_retrieval_eval"](spark, sf_oracle).collect()}
    docs = load_table(spark, sf_oracle, "documents").select("doc_id", "text").collect()
    tf = {
        d.doc_id: collections.Counter((d.text or "").lower().split())
        for d in docs
    }
    bm = _bm25_topk(spark, sf_oracle, log_idf=True, k=10, lucene=True).collect()
    ranking = collections.defaultdict(list)
    for r in sorted(bm, key=lambda r: (r.query_id, r.rank)):
        ranking[r.query_id].append(r.doc_id)
    hit_any = 0
    for qid, terms in _BM25_QUERIES:
        rel = {d for d, c in tf.items()
               if all(c[t] >= _II6_MIN_TF for t in terms)}
        ranked = ranking.get(qid, [])
        row = out[qid]
        assert row.n_rel == len(rel)
        assert row.hits_at_5 == sum(1 for d in ranked[:5] if d in rel)
        assert row.hits_at_10 == sum(1 for d in ranked if d in rel)
        first = next((i + 1 for i, d in enumerate(ranked) if d in rel), None)
        assert row.first_rel_rank == first
        # internal consistency of the integer metric surface
        assert 0 <= row.hits_at_5 <= 5 and row.hits_at_5 <= row.hits_at_10 <= 10
        if row.hits_at_10:
            assert row.first_rel_rank is not None
            hit_any += 1
    assert hit_any >= 3, "label set must be non-vacuous for most queries"
    # the negative-idf pathology ii6 documents: the UNCLAMPED ln idf
    # ranks high-tf (relevant) docs last on this df > N/2 corpus —
    # zero hits everywhere. If this ever starts hitting, the corpus
    # changed shape and ii6's docstring claim needs re-measuring.
    raw = _bm25_topk(spark, sf_oracle, log_idf=True, k=10).collect()
    raw_ranking = collections.defaultdict(set)
    for r in raw:
        raw_ranking[r.query_id].add(r.doc_id)
    for qid, terms in _BM25_QUERIES:
        rel = {d for d, c in tf.items()
               if all(c[t] >= _II6_MIN_TF for t in terms)}
        assert not (raw_ranking[qid] & rel)


def test_ii7_fusion_eval_contract(spark, sf_oracle):
    """ii7's A/B: the lexical mode must equal ii6's output row-for-row
    (same ranking, same labels, same metric path), every query appears
    in both modes, and the fusion mode is NON-degenerate (the first cut
    fused over the raw-ln base and scored zero everywhere — the
    clamped-base wiring this pins recovers real hits)."""
    import __spark_entry__ as em

    qs = em.queries()
    ii6 = {r.query_id: (r.n_rel, r.hits_at_5, r.hits_at_10, r.first_rel_rank)
           for r in qs["ii6_retrieval_eval"](spark, sf_oracle).collect()}
    out = qs["ii7_fusion_eval"](spark, sf_oracle).collect()
    lex = {r.query_id: (r.n_rel, r.hits_at_5, r.hits_at_10, r.first_rel_rank)
           for r in out if r.mode == "lexical"}
    fus = {r.query_id: (r.n_rel, r.hits_at_5, r.hits_at_10, r.first_rel_rank)
           for r in out if r.mode == "fusion"}
    assert lex == ii6
    assert set(fus) == set(lex)
    assert sum(v[2] for v in fus.values()) > 0  # non-degenerate fusion
    # labels are mode-independent by construction
    for q in lex:
        assert fus[q][0] == lex[q][0]


def test_txt13_vocab_overlap_constructed_and_bounds(spark, sf_oracle):
    """txt13 verified two ways: (a) a constructed two-source corpus
    with a known shared vocabulary half gives vocab_jaccard exactly
    1/3 (|A|=|B|=4, |A∩B|=2 → 2/6); (b) on the driver corpus every
    pair row satisfies the set-algebra bounds and the full 20-choose-2
    matrix is present (non-vacuous: every pair of synthetic sources
    shares some vocabulary)."""
    import __spark_entry__ as em
    from ig_etl_with_user_reports_2024_spark.plans.star_pipeline import (
        txt13_source_vocab_overlap,
    )

    df = spark.createDataFrame(
        [
            (1, "s1", "alpha beta gamma delta"),
            (2, "s2", "gamma delta epsilon zeta"),
        ],
        "doc_id bigint, source string, text string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        [r] = txt13_source_vocab_overlap(spark, d).collect()
    assert (r.src_a, r.src_b) == ("s1", "s2")
    assert (r.n_vocab_a, r.n_vocab_b, r.n_inter, r.n_union) == (4, 4, 2, 6)
    assert r.vocab_jaccard == 2 / 6

    rows = em.queries()["txt13_source_vocab_overlap"](spark, sf_oracle).collect()
    assert len(rows) == 20 * 19 // 2
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 < r.n_inter <= min(r.n_vocab_a, r.n_vocab_b)
        assert r.n_union == r.n_vocab_a + r.n_vocab_b - r.n_inter
        assert r.vocab_jaccard == r.n_inter / r.n_union


def test_qc1_linear_scorer_contract_and_nonvacuity(spark, sf_oracle):
    """qc1's contract: (1) margin really is the sum of the per-token
    bucket weights (recomputed in Python over the same md5 arithmetic
    for a handful of docs); (2) keep == (margin >= 0); (3) non-vacuity
    vs the rule-based family (the mx3 precedent) — qc1's score ORDER
    disagrees with txt2's quality_score on real doc pairs, and its
    keep set differs from txt8's verdict in BOTH directions (a learned
    scorer that reproduced the hand rules would be a vacuous
    registration); (4) the parameter vector is genuinely bounded: at
    most 256 distinct per-token weights in play."""
    import hashlib

    import __spark_entry__ as em

    qs = em.queries()
    qc1 = {r.doc: r for r in qs["qc1_model_quality_score"](spark, sf_oracle).collect()}
    assert qc1, "empty qc1 output"

    # (1)+(2) recompute a sample bit-exactly in Python
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").limit(20).collect()
    checked = 0
    weights_seen = set()
    for d in docs:
        words = [w for w in (d.text or "").lower().strip().split() if w]
        if not words:
            assert d.doc_id not in qc1  # token-less docs have no row
            continue
        margin = 0
        for w in words:
            b = int(hashlib.md5(f"qc1:{w}".encode()).hexdigest()[:6], 16) % 256
            wt = int(hashlib.md5(f"qc1w:{b}".encode()).hexdigest()[:6], 16) % 2001 - 1000
            margin += wt
            weights_seen.add(wt)
        row = qc1[d.doc_id]
        assert (row.n_tokens, row.margin, row.keep) == (
            len(words), margin, margin >= 0,
        )
        checked += 1
    assert checked >= 10

    # (4) bounded parameter table
    assert len(weights_seen) <= 256

    # (3) non-vacuity vs txt2 (order) and txt8 (keep set)
    txt2 = {r.doc: r.quality_score for r in qs["txt2_quality_score"](spark, sf_oracle).collect()}
    common = sorted(set(qc1) & set(txt2))
    inversions = 0
    for a, b in zip(common, common[1:]):
        if (qc1[a].margin - qc1[b].margin) * (txt2[a] - txt2[b]) < 0:
            inversions += 1
    assert inversions >= 50, f"qc1 order shadows txt2 ({inversions} inversions)"
    txt8 = {r.doc_id: r.keep for r in qs["txt8_filter_verdict"](spark, sf_oracle).collect()}
    qc1_not_txt8 = sum(1 for d in qc1 if d in txt8 and qc1[d].keep and not txt8[d])
    txt8_not_qc1 = sum(1 for d in qc1 if d in txt8 and not qc1[d].keep and txt8[d])
    # measured 403 / 1 at sf0.01: txt8's rule verdict keeps few docs, so
    # the txt8-keeps-but-qc1-drops side is structurally thin — require
    # both directions non-empty, and the disagreement material overall
    assert qc1_not_txt8 >= 1 and txt8_not_qc1 >= 1, (qc1_not_txt8, txt8_not_qc1)
    assert qc1_not_txt8 + txt8_not_qc1 >= 50


def test_txt14_pii_scrub_fixture_three_engines(spark):
    """txt14's semantics on a constructed fixture with KNOWN PII
    placements (VERDICT r10 #4 — the driver's sf0.01 corpus contains
    zero PII, so its hash-green verdict only proves the no-op path;
    this fixture is where the redaction itself is verified). Pins:
    per-class counts per doc; the email-before-handle scrub order
    (doc 40's '@b.co' domain tail must NOT count as a handle); the
    NULL-text and no-PII paths; and THREE-engine agreement — Spark,
    the DuckDB oracle over the same parquet, and a Python `re`
    recompute of the scrubbed md5s (Java, RE2, and CPython regex all
    leftmost-first on these patterns)."""
    import hashlib
    import re
    import tempfile

    import duckdb

    from ig_etl_with_user_reports_2024_spark.operators.textops import (
        PII_EMAIL_RE,
        PII_HANDLE_RE,
        PII_PHONE_RE,
        pii_scrub,
        sql_pii_scrub,
    )

    rows = [
        (10, "write john.doe@example.com today"),
        (20, "call +12345678901 now"),
        (30, "ping @alice_b and @bob.c please"),
        (40, "mail a@b.co or c@d.org call +12345678901 ping @eve"),
        (50, None),
        (60, "no pii here at all"),
    ]
    expected = {
        10: (1, 0, 0),
        20: (0, 1, 0),
        30: (0, 0, 2),
        40: (2, 1, 1),  # 1 handle, not 3: emails scrub before handles
        50: (0, 0, 0),
        60: (0, 0, 0),
    }
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc: r for r in pii_scrub(df, "doc_id", "text").collect()}
    assert set(got) == set(expected)
    for d, (e, p, h) in expected.items():
        assert (got[d].n_emails, got[d].n_phones, got[d].n_handles) == (e, p, h), d

    # python-re recompute of the scrubbed md5 (reference semantics)
    for d, text in rows:
        t = text or ""
        t = re.sub(PII_EMAIL_RE, "<EMAIL>", t)
        t = re.sub(PII_PHONE_RE, "<PHONE>", t)
        t = re.sub(PII_HANDLE_RE, "<USER>", t)
        assert got[d].scrubbed_md5 == hashlib.md5(t.encode()).hexdigest(), d
    assert got[60].scrubbed_md5 == hashlib.md5(b"no pii here at all").hexdigest()

    # DuckDB twin over the same parquet
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp}/documents.parquet/*.parquet')"
        )
        duck = {
            r[0]: r
            for r in con.execute(sql_pii_scrub("documents")).fetchall()
        }
    for d in expected:
        g = got[d]
        assert duck[d] == (d, g.n_emails, g.n_phones, g.n_handles, g.scrubbed_md5), d


def test_qc2_cells_match_component_recompute(spark, sf_oracle):
    """qc2's 2×2 cells must equal a direct recompute from its two
    component entries' outputs (same session, same data), the cells
    must partition n_docs, and both off-diagonals must be non-empty
    (the A/B is measuring a real disagreement, not a tautology)."""
    import __spark_entry__ as em

    qs = em.queries()
    [row] = qs["qc2_quality_signal_ab"](spark, sf_oracle).collect()
    t8 = {r.doc_id: r.keep for r in qs["txt8_filter_verdict"](spark, sf_oracle).collect()}
    m = {r.doc: r.keep for r in qs["qc1_model_quality_score"](spark, sf_oracle).collect()}
    assert set(t8) == set(m)
    cells = {
        "n_both_keep": sum(1 for d in t8 if t8[d] and m[d]),
        "n_both_drop": sum(1 for d in t8 if not t8[d] and not m[d]),
        "n_rule_only_keep": sum(1 for d in t8 if t8[d] and not m[d]),
        "n_model_only_keep": sum(1 for d in t8 if not t8[d] and m[d]),
    }
    for k, v in cells.items():
        assert getattr(row, k) == v, k
    assert row.n_docs == len(t8) == sum(cells.values())
    assert cells["n_rule_only_keep"] >= 1 and cells["n_model_only_keep"] >= 1


def test_qc1_broadcast_weight_table_matches_inline(spark, sf_oracle):
    """qc1's 100-TB shape, proven not just claimed: scoring with the
    materialized 256-row parameter table (md5_weight_table — what a
    TRAINED model would load) broadcast-joined on the feature index
    reproduces the inline-expression scores bit-exactly, and the plan
    really broadcasts (BroadcastHashJoin over the weight dim, no
    shuffle of the token side on the join key)."""
    from ig_etl_with_user_reports_2024_spark.operators.textops import (
        linear_quality_score,
        md5_weight_table,
    )

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    inline = {
        tuple(r)
        for r in linear_quality_score(docs, "doc_id", "text").collect()
    }
    dim = md5_weight_table(spark)
    assert dim.count() == 256
    joined_df = linear_quality_score(docs, "doc_id", "text", weights=dim)
    plan = joined_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert {tuple(r) for r in joined_df.collect()} == inline


# ---------------------------------------------------------------------------
# tok1 — deterministic BPE apply (subword token counts)
# ---------------------------------------------------------------------------


def test_subword_tokenize_fixture_three_engines(spark):
    """tok1's merge semantics on a constructed word set covering the
    hazards the two-space encoding exists for — cascades ('the',
    'and' -> 1 token; 'anding' -> [and, ing]), leftmost-first
    non-overlap ('ananan' -> [an, an, an]; 'thethe' -> [the, the]),
    rule-order interaction ('math' -> [m, a, th]: (t,h) outranks
    (a,t)) — identical in Spark, DuckDB, and the pure-Python
    reference."""
    import duckdb

    words = [
        "the", "and", "anding", "ananan", "thethe", "math", "a",
        "table", "sort", "fast", "value", "queue", "xyzzy", "thinner",
        "x2y,z!", "ingesting",
    ]
    expect = {w: tx.subword_tokenize_py(w) for w in words}
    # hand-checked anchors (not just recompute-vs-recompute)
    assert expect["the"] == 1 and expect["and"] == 1
    assert expect["anding"] == 2      # [and, ing]
    assert expect["ananan"] == 3      # leftmost non-overlap
    assert expect["thethe"] == 2
    assert expect["math"] == 3        # [m, a, th]

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id bigint, text string"
    )
    got = {
        words[r.doc]: r.n_subword_tokens
        for r in tx.subword_token_counts(df, "doc_id", "text").collect()
    }
    assert got == expect

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{w.replace(chr(39), '')}')" for i, w in enumerate(words))
        + ") t(doc_id, text)"
    )
    duck = {
        words[d]: n
        for d, _, n in con.execute(tx.sql_subword_token_counts()).fetchall()
    }
    assert duck == expect


def test_subword_counts_match_python_recompute(spark, sf_smoke):
    """tok1 over the real sf0.001 corpus equals a pure-Python recompute
    word by word (the txt11 convention)."""
    from collections import defaultdict

    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    out = {
        r.doc: (r.n_words, r.n_subword_tokens)
        for r in tx.subword_token_counts(docs, "doc_id", "text").collect()
    }
    expect: dict = defaultdict(lambda: [0, 0])
    memo: dict = {}
    for r in docs.select("doc_id", "text").collect():
        ws = (r.text or "").lower().split()
        for w in ws:
            if w not in memo:
                memo[w] = tx.subword_tokenize_py(w)
            expect[r.doc_id][0] += 1
            expect[r.doc_id][1] += memo[w]
    assert out == {d: tuple(v) for d, v in expect.items() if v[0] > 0}


def test_subword_counts_are_not_the_regex_counts(spark, sf_oracle):
    """Non-vacuity (the VERDICT r11 #2 done-criterion): tok1's subword
    counts differ from BOTH of txt3's regex approximations on a large
    share of the gate corpus, and the merge rules demonstrably fire —
    the subword count is strictly below the per-word character total
    (what a no-merge tokenizer would emit) on every doc where a merge
    applies."""
    from pyspark.sql import functions as F

    from ig_etl_with_user_reports_2024_spark.operators.dedup import (
        normalized_words,
    )
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    docs = load_table(spark, sf_oracle, "documents")
    sub = tx.subword_token_counts(docs, "doc_id", "text")
    reg = tx.token_counts(docs, "doc_id", "text")
    chars = docs.select(
        F.col("doc_id").alias("doc"),
        F.aggregate(
            F.transform(normalized_words(F.col("text")), F.length),
            F.lit(0),
            lambda a, x: a + x,
        ).cast("bigint").alias("n_word_chars"),
    )
    j = sub.join(reg, "doc").join(chars, "doc").collect()
    assert len(j) == 500
    diff_ws = sum(1 for r in j if r.n_subword_tokens != r.ws_tokens)
    diff_bpe = sum(1 for r in j if r.n_subword_tokens != r.bpe_tokens)
    fired = sum(1 for r in j if r.n_subword_tokens < r.n_word_chars)
    assert diff_ws > 400 and diff_bpe > 400, (diff_ws, diff_bpe)
    assert fired > 400, fired
    # subword count bounded by [n_words, n_word_chars] per doc
    for r in j:
        assert r.n_words <= r.n_subword_tokens <= r.n_word_chars


def test_tok3_memoized_equals_tok1_and_plan_shape(spark, sf_oracle):
    """tok3's whole value is the PLAN (its oracle is tok1's SQL — the
    sk1/sk2 result-identity convention), so pin both halves: (1)
    row-for-row equality with tok1 at sf0.01; (2) the plan broadcasts
    the vocabulary back onto the token stream (BroadcastHashJoin — the
    skew-free shape: hot words never shuffle) and runs the ~21-op
    merge cascade on the DISTINCT side only — the cascade's replace
    chain must appear exactly once in the physical plan, below the
    vocab aggregate, not once per occurrence stream."""
    import __spark_entry__ as em

    qs = em.queries()
    t1 = {r.doc: (r.n_words, r.n_subword_tokens)
          for r in qs["tok1_subword_token_count"](spark, sf_oracle).collect()}
    t3 = {r.doc: (r.n_words, r.n_subword_tokens)
          for r in qs["tok3_memoized_token_count"](spark, sf_oracle).collect()}
    assert t3 == t1

    plan = (
        qs["tok3_memoized_token_count"](spark, sf_oracle)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 1, plan
    # the vocab is a real distinct on the word key...
    assert "Exchange hashpartitioning(w#" in plan, plan
    # ...and the cascade output (n_sub) is produced BY the vocab-grain
    # aggregate (the memoization), not projected on the token stream
    # (expression bodies are elided in executedPlan strings, so pin
    # the structure: the w-keyed HashAggregate emits n_sub)
    vocab_aggs = [ln for ln in plan.split("\n")
                  if "HashAggregate(keys=[w#" in ln and "n_sub" in ln]
    assert vocab_aggs, plan


def test_tok4_chunked_real_vocab_recompute_and_nonvacuity(spark, sf_oracle):
    """tok4's contract: the 500-rule chunked-barrier apply is
    bit-identical to a pure-Python recompute of the same ordered
    literal replaces (the txt11 convention), genuinely differs from
    tok1's 20-rule counts (different learned vocabulary), and the DEEP
    rules fire — truncating the table at 100 changes counts, so the
    entry cannot silently degrade into a short-table twin. Also pins
    the chunk-boundary semantics: chunk sizes 100 and 37 (rules
    split mid-cascade) give identical results."""
    import __spark_entry__ as em
    from ig_etl_with_user_reports_2024_spark.dims import BPE_MERGES_500
    from ig_etl_with_user_reports_2024_spark.operators import textops as tx
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    qs = em.queries()
    t4 = {r.doc: (r.n_words, r.n_subword_tokens)
          for r in qs["tok4_real_vocab_token_count"](spark, sf_oracle).collect()}
    t1 = {r.doc: (r.n_words, r.n_subword_tokens)
          for r in qs["tok1_subword_token_count"](spark, sf_oracle).collect()}
    assert set(t4) == set(t1)
    n_diff = sum(1 for k in t4 if t4[k][1] != t1[k][1])
    assert n_diff > len(t4) // 2, f"only {n_diff} docs differ from tok1"

    docs = load_table(spark, sf_oracle, "documents")
    rows = docs.select("doc_id", "text").collect()
    import re as _re
    memo: dict = {}
    for r in rows[:100]:
        ws = [w for w in _re.split(r"\s+", (r.text or "").strip().lower())
              if w]
        if not ws:
            assert r.doc_id not in t4
            continue
        n = 0
        for w in ws:
            if w not in memo:
                memo[w] = tx.chunked_subword_tokenize_py(w, BPE_MERGES_500)
            n += memo[w]
        assert t4[r.doc_id] == (len(ws), n), r.doc_id

    # deep rules fire: the K=100 prefix gives different counts
    t4_100 = {
        r.doc: r.n_subword_tokens
        for r in tx.chunked_subword_token_counts(
            docs, "doc_id", "text", BPE_MERGES_500[:100]
        ).collect()
    }
    assert any(t4_100[k] != t4[k][1] for k in t4), "rules 101-500 never fire"

    # chunk boundary invariance (barrier placement must be semantics-free)
    t4_37 = {
        r.doc: (r.n_words, r.n_subword_tokens)
        for r in tx.chunked_subword_token_counts(
            docs, "doc_id", "text", BPE_MERGES_500, chunk=37
        ).collect()
    }
    assert t4_37 == t4


def test_tok5_udf_vocab_path_identity_and_nonvacuity(spark, sf_oracle):
    """tok5's contract: the Arrow-batched UDF vocab-grain apply of the
    2000-rule table is (a) bit-identical to the pure-built-in
    chunked-barrier path on the SAME table (the two fallbacks of
    SCALE_r13 §5 agree in-engine, not only on the probe corpus), (b)
    pinned against the pure-Python recompute (trivially — the UDF body
    IS chunked_subword_tokenize_py — but asserted through the full
    explode/join/agg plan), and (c) non-vacuous against tok4: rules
    501–2000 fire on the driver vocabulary, so the K=2000 entry cannot
    silently degrade into a 500-rule twin. Also guards the merge-table
    input checks ADVICE r13 asked for."""
    import re as _re

    import pytest

    import __spark_entry__ as em
    from ig_etl_with_user_reports_2024_spark.dims_bpe import BPE_MERGES_2000
    from ig_etl_with_user_reports_2024_spark.operators import textops as tx
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    qs = em.queries()
    t5 = {r.doc: (r.n_words, r.n_subword_tokens)
          for r in qs["tok5_vocab_udf_token_count"](spark, sf_oracle).collect()}
    t4 = {r.doc: (r.n_words, r.n_subword_tokens)
          for r in qs["tok4_real_vocab_token_count"](spark, sf_oracle).collect()}
    assert set(t5) == set(t4)
    assert all(t5[k][0] == t4[k][0] for k in t5)  # n_words independent of K
    n_diff = sum(1 for k in t5 if t5[k][1] != t4[k][1])
    assert n_diff > len(t5) // 2, f"only {n_diff} docs differ from tok4"

    docs = load_table(spark, sf_oracle, "documents")
    # (a) UDF path == chunked-barrier path on the same 2000-rule table
    t5_chunked = {
        r.doc: (r.n_words, r.n_subword_tokens)
        for r in tx.chunked_subword_token_counts(
            docs, "doc_id", "text", BPE_MERGES_2000
        ).collect()
    }
    assert t5_chunked == t5

    # (b) recompute pin through the full plan
    memo: dict = {}
    for r in docs.select("doc_id", "text").collect()[:100]:
        ws = [w for w in _re.split(r"\s+", (r.text or "").strip().lower())
              if w]
        if not ws:
            assert r.doc_id not in t5
            continue
        n = 0
        for w in ws:
            if w not in memo:
                memo[w] = tx.chunked_subword_tokenize_py(w, BPE_MERGES_2000)
            n += memo[w]
        assert t5[r.doc_id] == (len(ws), n), r.doc_id

    # merge-table guards fire for ANY caller, not only the shipped
    # literals (ADVICE r13); explicit ValueError so the guard survives
    # `python -O` (ADVICE r14)
    for bad in ([], [("a", "b c")], [("a'", "b")]):
        with pytest.raises(ValueError):
            tx.udf_subword_token_counts(docs, "doc_id", "text", bad)
        with pytest.raises(ValueError):
            tx.sql_chunked_subword_token_counts(bad)

    # plan shape (tok3's pins, plus the declared Python surface stays
    # on the VOCAB side): one BroadcastHashJoin back onto the token
    # stream, a real distinct on w, and exactly one Arrow-batched
    # python eval — below the vocab distinct, never on the occurrence
    # stream
    plan = (
        tx.udf_subword_token_counts(docs, "doc_id", "text", BPE_MERGES_2000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "Exchange hashpartitioning(w#" in plan, plan
    assert plan.count("ArrowEvalPython") == 1, plan
    # the python eval consumes the distinct vocab aggregate's output
    assert "HashAggregate(keys=[w#" in plan, plan


# trn1 — distributed BPE training (VERDICT r14 #2)


def test_trn1_trajectory_matches_python_trainer(spark, sf_smoke):
    """The cluster trainer reproduces the GENERATOR's trajectory
    bit-identically on the same corpus: trn1's learned table equals
    tok_knee_probe.learn_merges (the function that produced the
    shipped dims/dims_bpe tables) over the identical frequency-
    weighted vocabulary — training is no longer a 'generated offline'
    family. Prefix-closure makes the equality exact rule-by-rule."""
    from collections import Counter

    from tools.tok_knee_probe import learn_merges

    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    got = [
        (r.i, r.a, r.b)
        for r in sorted(
            tx.bpe_train_merges(docs, "text", 48).collect()
        )
    ]
    wf: Counter = Counter()
    for r in docs.select("text").collect():
        wf.update((r.text or "").lower().split())
    expect = [
        (i, a, b) for i, (a, b) in enumerate(learn_merges(dict(wf), 48))
    ]
    assert got == expect


def test_trn1_tiebreak_is_load_bearing(spark, sf_oracle):
    """Non-vacuity for the registered entry's hash verdict: on the
    sf0.01 gate corpus the greedy argmax hits COUNT TIES (29 of 48
    iterations at registration time), and flipping the tie-break from
    max-(a,b) to min-(a,b) changes the learned table — so the driver's
    hash check pins the argmax semantics, not just pair counting."""
    from collections import Counter

    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    docs = load_table(spark, sf_oracle, "documents")
    wf: Counter = Counter()
    for r in docs.select("text").collect():
        wf.update((r.text or "").lower().split())

    def learn(word_freq, k, tie_max):
        vocab = {tuple(w): c for w, c in word_freq.items() if w}
        merges, ties = [], 0
        for _ in range(k):
            pairs: Counter = Counter()
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] += c
            if not pairs:
                break
            mx = max(pairs.values())
            cand = [p for p, c in pairs.items() if c == mx]
            ties += len(cand) > 1
            best = max(cand) if tie_max else min(cand)
            merges.append(best)
            a, b = best
            nv: dict = {}
            for syms, c in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == a
                        and syms[i + 1] == b
                    ):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                t = tuple(out)
                nv[t] = nv.get(t, 0) + c
            vocab = nv
        return merges, ties

    m_max, ties = learn(wf, 48, True)
    m_min, _ = learn(wf, 48, False)
    assert ties >= 10, f"only {ties} tied iterations — tie-break unexercised"
    assert m_max != m_min, "tie-break flip changes nothing — check vacuous"


def test_trn1_trained_table_feeds_apply_paths(spark, sf_smoke):
    """Composition contract: trn1's output IS tok5's input — the
    learned table passes the merge-table guard (symbols can never
    contain quotes/spaces: words are whitespace-split) and, applied
    through the registered UDF apply path on the training corpus,
    the learned rules demonstrably fire (subword count strictly below
    the character count wherever a merge applies)."""
    from pyspark.sql import functions as F

    from ig_etl_with_user_reports_2024_spark.operators.dedup import (
        normalized_words,
    )
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    learned = [
        (r.a, r.b)
        for r in sorted(
            tx.bpe_train_merges(docs, "text", 48).collect()
        )
    ]
    assert len(learned) == 48
    tx._check_merge_table(learned)  # tok4/tok5's guard accepts it
    sub = tx.udf_subword_token_counts(docs, "doc_id", "text", learned)
    chars = docs.select(
        F.col("doc_id").alias("doc"),
        F.aggregate(
            F.transform(normalized_words(F.col("text")), F.length),
            F.lit(0),
            lambda a, x: a + x,
        ).cast("bigint").alias("n_word_chars"),
    )
    j = sub.join(chars, "doc").collect()
    assert j, "no docs"
    fired = sum(1 for r in j if r.n_subword_tokens < r.n_word_chars)
    assert fired == len(j), f"learned rules fired on {fired}/{len(j)} docs"
    for r in j:
        assert r.n_words <= r.n_subword_tokens <= r.n_word_chars


# trn2 — incremental distributed BPE training (the learn_merges_fast
# algorithm as DataFrame state)


def test_trn2_trajectory_identical_to_trn1_past_exhaustion(
    spark, sf_smoke
):
    """The INCREMENTAL trainer (standing pair-count state + affected-
    words-only deltas) reproduces the full-recount trainer's
    trajectory bit-identically THROUGH pair exhaustion: at K=120 the
    smoke corpus exhausts at 89 learnable merges and both trainers
    stop there with identical tables — exercising the delta
    arithmetic (count decrements, zero-row deletion, re-created
    pairs) and the empty-state stop, and transitively pinning trn2 to
    the pure-Python generators via trn1's own trajectory test."""
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    docs = load_table(spark, sf_smoke, "documents")
    full = sorted(
        (r.i, r.a, r.b)
        for r in tx.bpe_train_merges(docs, "text", 120).collect()
    )
    inc = sorted(
        (r.i, r.a, r.b)
        for r in tx.bpe_train_merges_incremental(
            docs, "text", 120
        ).collect()
    )
    assert len(full) == 89, "corpus no longer exhausts at 89 — re-probe"
    assert inc == full


def test_trn2_extension_window_has_ties(sf_oracle):
    """Non-vacuity for trn2's K=64 registration (trn1 covers rules
    1-48; trn2's verdict extends to 49-64): the EXTENSION window must
    itself contain count-tied iterations, or the longer trajectory
    adds no tie-break information over trn1's. At registration: 39/64
    tied iterations, 10 inside 49-64."""
    from collections import Counter

    import duckdb

    con = duckdb.connect()
    try:
        rows = con.execute(
            "SELECT text FROM read_parquet(?)",
            [f"{sf_oracle}/documents.parquet"],
        ).fetchall()
    finally:
        con.close()
    wf: Counter = Counter()
    for (t,) in rows:
        wf.update((t or "").lower().split())
    vocab = {tuple(w): c for w, c in wf.items() if w}
    tie_iters = []
    for it in range(64):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        mx = max(pairs.values())
        cand = [p for p, c in pairs.items() if c == mx]
        if len(cand) > 1:
            tie_iters.append(it)
        a, b = max(cand)
        nv: dict = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            nv[t] = nv.get(t, 0) + c
        vocab = nv
    ext = [t for t in tie_iters if t >= 48]
    assert len(ext) >= 3, (
        f"only {len(ext)} tied iterations in the 49-64 extension — "
        "trn2's longer trajectory no longer adds tie-break coverage"
    )


def test_fast_trainer_trajectory_identical_to_naive():
    """tools.tok_knee_probe.learn_merges_fast (the incremental
    pair-count trainer that makes the 50k-rule table generable — the
    naive recount is O(K·corpus)) is TRAJECTORY-IDENTICAL to
    learn_merges, including max-(a,b) lexical tie-breaks and
    exhaustion: asserted on a synth-corpus slice past exhaustion
    (stale-heap and count-deletion paths both exercised) and pinned
    at full K=2000 scale by dims_bpe.BPE_MERGES_2000_MD5, which the
    fast trainer reproduces bit-exactly (verified at introduction:
    4.7s fast vs 123s naive)."""
    from tools.tok_knee_probe import learn_merges, learn_merges_fast, synth_word

    words = [synth_word(i) for i in range(1500)]
    wf = {w: max(1, 1500 // (r + 1)) for r, w in enumerate(words)}
    naive = learn_merges(dict(wf), 10_000)  # exhausts well below 10k
    fast = learn_merges_fast(dict(wf), 10_000)
    assert len(naive) < 10_000, "corpus did not exhaust — weak test"
    assert fast == naive


def test_tok6_full_table_nonvacuity_and_recompute(spark, sf_oracle):
    """tok6's contract: the 50000-rule table through tok5's registered
    UDF path (a) genuinely differs from tok5's K=2000 counts at doc
    grain (rules past 2000 fire — 'stream' at rule 2109, 'customer' at
    11655, both top-frequency types), (b) is pinned against the
    pure-Python recompute through the full plan, and (c) cannot
    silently degrade into a 2000-rule twin (truncating at 2000
    changes counts). The chunked-barrier cross-path identity tok5
    asserts is NOT repeated at K=50k — 500 sequential barriers is the
    shape SCALE_r14 §7 measured OUT; the shared-contract evidence is
    tok5's (a) plus the deterministic per-word body being literally
    chunked_subword_tokenize_py at every K."""
    import re as _re

    import __spark_entry__ as em
    from ig_etl_with_user_reports_2024_spark.dims_bpe50k import (
        BPE_MERGES_50000,
    )
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    qs = em.queries()
    t6 = {r.doc: (r.n_words, r.n_subword_tokens)
          for r in qs["tok6_full_vocab_token_count"](spark, sf_oracle).collect()}
    t5 = {r.doc: (r.n_words, r.n_subword_tokens)
          for r in qs["tok5_vocab_udf_token_count"](spark, sf_oracle).collect()}
    assert set(t6) == set(t5)
    assert all(t6[k][0] == t5[k][0] for k in t6)  # n_words independent of K
    n_diff = sum(1 for k in t6 if t6[k][1] != t5[k][1])
    assert n_diff > len(t6) // 2, f"only {n_diff} docs differ from tok5"

    # recompute pin through the full plan (memoized — 31 vocab types)
    docs = load_table(spark, sf_oracle, "documents")
    memo: dict = {}
    for r in docs.select("doc_id", "text").collect()[:100]:
        ws = [w for w in _re.split(r"\s+", (r.text or "").strip().lower())
              if w]
        if not ws:
            assert r.doc_id not in t6
            continue
        n = 0
        for w in ws:
            if w not in memo:
                memo[w] = tx.chunked_subword_tokenize_py(w, BPE_MERGES_50000)
            n += memo[w]
        assert t6[r.doc_id] == (len(ws), n), r.doc_id

    # truncation detectability: the 2000-prefix is NOT this table on
    # the driver vocabulary (pure-Python — no second cluster pass)
    kinds = sorted(memo)
    short = {w: tx.chunked_subword_tokenize_py(w, BPE_MERGES_50000[:2000])
             for w in kinds}
    assert any(short[w] != memo[w] for w in kinds), "rules 2001+ never fire"


def test_ranked_apply_equals_ordered_contract(spark, sf_oracle):
    """The production rank-priority apply (apply="ranked" — GPT-2's
    K-independent per-word loop) computes EXACTLY the registered
    ordered-replace contract on the shipped trajectory: equality is a
    table property (prefix-closed training + pairwise-distinct created
    strings, both held by the shipped tables; 0 mismatches over all
    19,998 probe+driver types at K=50000, 296x faster single-threaded
    — SCALE_r15 §7), asserted here over the driver vocabulary plus a
    probe-vocab sample at full K=50000, and through the full Spark
    plan against the registered tok6 entry."""
    import __spark_entry__ as em
    from tools.tok_knee_probe import synth_word

    from ig_etl_with_user_reports_2024_spark.dims_bpe50k import (
        BPE_MERGES_50000,
    )
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    ranks = {p: i for i, p in enumerate(BPE_MERGES_50000)}
    dv = ["join", "hash", "customer", "stream", "window", "a", "the",
          "dup", "query", "vector"]
    sample = sorted(set(synth_word(i) for i in range(150)) | set(dv))
    for w in sample:
        assert tx.ranked_subword_tokenize_py(
            w, ranks
        ) == tx.chunked_subword_tokenize_py(w, BPE_MERGES_50000), w

    docs = load_table(spark, sf_oracle, "documents")
    got = {
        r.doc: (r.n_words, r.n_subword_tokens)
        for r in tx.udf_subword_token_counts(
            docs, "doc_id", "text", BPE_MERGES_50000, apply="ranked"
        ).collect()
    }
    want = {
        r.doc: (r.n_words, r.n_subword_tokens)
        for r in em.queries()["tok6_full_vocab_token_count"](
            spark, sf_oracle
        ).collect()
    }
    assert got == want

    import pytest

    with pytest.raises(ValueError):
        tx.udf_subword_token_counts(
            docs, "doc_id", "text", BPE_MERGES_50000, apply="priority"
        )

    # the equivalence-property guard fires loudly on tables where
    # rank-priority apply genuinely diverges from the ordered contract
    # (enforced, not just documented — r15 second review pass)
    with pytest.raises(ValueError, match="not the created string"):
        tx._check_ranked_equivalence_properties([("a", "bc")])
    with pytest.raises(ValueError, match="re-creates"):
        tx._check_ranked_equivalence_properties(
            [("b", "c"), ("a", "b"), ("a", "bc"), ("ab", "c")]
        )
    tx._check_ranked_equivalence_properties(BPE_MERGES_50000)  # shipped: ok
