"""Dedup-operator tests: exact dedup survivors, MinHash-LSH recall vs
the exact Jaccard baseline, SimHash invariances."""

from __future__ import annotations

from pyspark.sql import functions as F

from ig_etl_with_user_reports_2024_spark.operators import dedup as dd

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog again and again tonight"),  # near dup
    (4, "completely different content about spark sql engines and shuffles"),
    (5, "short"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_exact_dedup_keeps_first(spark):
    out = dd.exact_dedup(_docs(spark), "text", order_cols=["doc_id"]).collect()
    kept = sorted(r.doc_id for r in out)
    assert kept == [1, 3, 4, 5]  # doc 2 deduped, first occurrence (1) kept


def test_shingle_pairs_jaccard_exact(spark):
    pairs = {
        (r.a_id, r.b_id): r.jaccard
        for r in dd.shingle_pairs_jaccard(
            _docs(spark), "doc_id", "text", n=3, threshold=0.3
        ).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical docs
    assert 0.5 < pairs[(1, 3)] < 1.0  # near-dup
    assert (1, 4) not in pairs


def test_minhash_lsh_recall_vs_exact(spark, sf_oracle):
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    exact = {
        (r.a_id, r.b_id)
        for r in dd.shingle_pairs_jaccard(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    approx = {
        (r.a_id, r.b_id)
        for r in dd.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=32, bands=8, verify_threshold=0.3
        ).collect()
    }
    if exact:
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, f"minhash recall {recall:.2f} on {len(exact)} pairs"


def test_simhash_identical_docs_same_fingerprint(spark):
    sig = {r.doc: r.simhash for r in dd.simhash64(_docs(spark), "doc_id", "text").collect()}
    assert sig[1] == sig[2]
    # near-dup has small hamming distance, unrelated doc a large one
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sig[1], sig[3]) < ham(sig[1], sig[4])


def test_simhash_near_pairs_contains_duplicates(spark):
    pairs = {
        (r.a_id, r.b_id)
        for r in dd.simhash_near_pairs(
            _docs(spark), "doc_id", "text", max_hamming=10
        ).collect()
    }
    assert (1, 2) in pairs


def test_shingle_cache_lifecycle_bounded_and_correct(spark):
    # the shingle persist registry is FIFO-capped (ADVICE r4): results
    # stay correct across successive calls and the number of pinned
    # handles never exceeds the cap
    from ig_etl_with_user_reports_2024_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w v")],
        "doc_id bigint, text string",
    )
    first = dedup.shingle_pairs_jaccard(df, "doc_id", "text", n=3, threshold=0.5)
    got1 = {(r.a_id, r.b_id) for r in first.collect()}
    assert got1 == {(1, 2)}
    second = dedup.shingle_pairs_jaccard(df, "doc_id", "text", n=3, threshold=0.5)
    assert {(r.a_id, r.b_id) for r in second.collect()} == {(1, 2)}
    assert len(dedup._PERSISTED_HANDLES) <= dedup._MAX_PINNED
    for _ in range(dedup._MAX_PINNED + 2):
        dedup.shingle_pairs_jaccard(df, "doc_id", "text", n=3, threshold=0.5)
    assert len(dedup._PERSISTED_HANDLES) <= dedup._MAX_PINNED
    # the first result still computes after its cache was released
    assert {(r.a_id, r.b_id) for r in first.collect()} == got1


def test_portable_minhash_identical_docs_share_all_bands(spark):
    bands = dd.portable_minhash_bands(_docs(spark), "doc_id", "text")
    rows = bands.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc, {})[r.band] = r.bucket
    # identical docs (1, 2) agree on every band bucket
    assert by_doc[1] == by_doc[2]
    # each doc emits exactly `bands` rows, band ids 0..3
    assert sorted(by_doc[1]) == [0, 1, 2, 3]
    # unrelated docs don't collide on all four bands
    assert by_doc[1] != by_doc[4]


def test_portable_minhash_rejects_bad_band_split(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dd.portable_minhash_bands(_docs(spark), "doc_id", "text", num_hashes=8, bands=3)


def test_portable_minhash_matches_duckdb_fragment(spark):
    # the md5-portability claim, asserted directly: the Spark operator
    # and the SQL fragment emit identical (doc, band, bucket) sets
    import duckdb

    sp = {
        (r.doc, r.band, r.bucket)
        for r in dd.portable_minhash_bands(_docs(spark), "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") AS v(doc_id, text)"
    )
    frag = dd.sql_portable_minhash_bands("docs")
    du = {
        (r[0], r[1], r[2])
        for r in con.execute(f"WITH {frag} SELECT doc, band, bucket FROM bands").fetchall()
    }
    assert sp == du


def test_portable_simhash_identical_docs_zero_hamming(spark):
    pairs = {
        (r.a_id, r.b_id): r.hamming
        for r in dd.portable_simhash_pairs(_docs(spark), "doc_id", "text").collect()
    }
    assert pairs.get((1, 2)) == 0  # identical docs: same fingerprint


def test_portable_simhash_matches_duckdb_query(spark):
    import duckdb

    sp = {
        (r.a_id, r.b_id, r.hamming)
        for r in dd.portable_simhash_pairs(_docs(spark), "doc_id", "text").collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") AS v(doc_id, text)"
    )
    du = {
        tuple(r)
        for r in con.execute(dd.sql_portable_simhash_pairs("docs")).fetchall()
    }
    assert sp == du


def test_portable_minhash_pairs_verified_subset(spark, sf_oracle):
    """dd10's pair stage: every banded-verified pair must also appear in
    the exact all-pairs baseline with the same jaccard (candidate
    restriction can only DROP pairs, never add or rescore), and every
    emitted jaccard respects the threshold."""
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    exact = {
        (r.a_id, r.b_id): r.jaccard
        for r in dd.shingle_pairs_jaccard(
            docs, "doc_id", "text", n=3, threshold=0.2
        ).collect()
    }
    banded = {
        (r.a_id, r.b_id): r.jaccard
        for r in dd.portable_minhash_pairs(
            docs, "doc_id", "text", threshold=0.2
        ).collect()
    }
    assert banded, "banded pair stage found no pairs on the dup-bearing testdata"
    for pair, jac in banded.items():
        assert jac >= 0.2
        assert pair in exact
        assert abs(exact[pair] - jac) < 1e-12
    # 8-hash / 4-band LSH at threshold 0.2 should catch the bulk of the
    # true pairs on this corpus — a recall collapse means broken banding
    assert len(banded) >= 0.6 * len(exact)


def test_dd11_staged_equals_dd10_direct(spark, sf_oracle):
    """The staging claim, scoped as dd11's docstring states it: on docs
    with >= 1 shingle (>= 3 normalized words) dd11 produces EXACTLY
    dd10's keep-list — exact twins share every MinHash signature, so
    collapsing them first changes cost, never semantics. Shingle-less
    docs are excluded here because there dd11 deliberately merges
    exact twins dd10's LSH cannot see (pinned by
    test_dd11_supersets_dd10_on_shingleless_twins below)."""
    from ig_etl_with_user_reports_2024_spark.plans.registry import QUERIES
    import ig_etl_with_user_reports_2024_spark.plans.star_pipeline  # noqa: F401

    shingled = {
        r.doc_id
        for r in spark.read.parquet(f"{sf_oracle}/documents.parquet")
        .select("doc_id", dd.normalized_words(F.col("text")).alias("ws"))
        .filter(F.size("ws") >= 3)
        .collect()
    }
    assert shingled, "testdata corpus unexpectedly has no shingled docs"
    a = {
        tuple(r)
        for r in QUERIES["dd10_keep_list_banded"].fn(spark, sf_oracle).collect()
        if r.doc_id in shingled
    }
    b = {
        tuple(r)
        for r in QUERIES["dd11_staged_keep_list"].fn(spark, sf_oracle).collect()
        if r.doc_id in shingled
    }
    assert a == b


def test_dd13_semantic_keep_list_contract(spark, sf_oracle):
    """dd13 must be non-vacuous on the driver corpus (the calibrated
    τ=0.40 yields real merges — the txt8 lesson), cover every vector
    with exactly one row, pick cluster minima as survivors, and report
    consistent cluster sizes."""
    import __spark_entry__ as em

    qs = em.queries()
    rows = qs["dd13_semantic_keep_list"](spark, sf_oracle).collect()
    n_vecs = qs["km1_kmeans_assign"](spark, sf_oracle).count()
    assert len(rows) == n_vecs
    assert any(not r.kept for r in rows), "no semantic merges — vacuous τ"
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m.vec_id for m in members)
        assert all(m.cluster_size == len(members) for m in members)
        assert sum(1 for m in members if m.kept) == 1
        assert next(m for m in members if m.kept).vec_id == cid


def test_dc3_semantic_decontaminate_contract(spark, sf_oracle):
    """dc3's flags verified against an INDEPENDENT numpy derivation:
    every flagged vec is train-split, its first_eval_match is a
    non-train vector at true cosine >= 0.40 (recomputed outside
    Spark), the flag set is a subset of the exact all-pairs
    cross-split τ-pairs (cell capture can only miss, never invent),
    and the gate is non-vacuous on the driver corpus (txt8 rule)."""
    import numpy as np

    import __spark_entry__ as em
    from ig_etl_with_user_reports_2024_spark.operators.sampling import (
        hash_split,
    )
    from ig_etl_with_user_reports_2024_spark.sources.readers import load_table

    flagged = {
        r.vec_id: r
        for r in em.queries()["dc3_semantic_decontaminate"](
            spark, sf_oracle
        ).collect()
    }
    assert flagged, "no semantic contamination flagged — vacuous gate"
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_oracle, "embeddings").collect()
    }
    splits = {
        r.vec_id: r.split
        for r in hash_split(
            load_table(spark, sf_oracle, "embeddings").select("vec_id"),
            key="vec_id",
        ).collect()
    }

    def cos(a, b):
        na, nb = np.linalg.norm(emb[a]), np.linalg.norm(emb[b])
        return float(emb[a] @ emb[b] / (na * nb)) if na and nb else -1.0

    exact_cross = {
        t
        for t in emb
        if splits[t] == "train"
        and any(splits[e] != "train" and cos(t, e) >= 0.40 for e in emb)
    }
    for vid, r in flagged.items():
        assert splits[vid] == "train"
        assert splits[r.first_eval_match] != "train"
        assert cos(vid, r.first_eval_match) >= 0.40
        assert r.n_eval_matches >= 1
    assert set(flagged) <= exact_cross


def test_dd11_supersets_dd10_on_shingleless_twins(spark, tmp_path):
    """ADVICE r6 (medium): short exact-duplicate texts (< 3 words → zero
    shingles) never band-collide, so dd10 leaves each as a singleton;
    dd11's digest stage merges them — the documented intended
    semantics. Also pins the NULL-text contract (ADVICE r6 low): a
    NULL text digests to '<null>', so the doc still gets a keep-list
    row instead of vanishing through the digest equi-join, and two
    NULL-text docs are exact twins of each other."""
    from ig_etl_with_user_reports_2024_spark.plans.registry import QUERIES
    import ig_etl_with_user_reports_2024_spark.plans.star_pipeline  # noqa: F401

    rows = [
        (1, "hi there", "en", "web", 8),
        (2, "hi there", "en", "web", 8),  # shingle-less exact twin of 1
        (3, None, None, "web", 0),  # NULL text
        (4, None, None, "web", 0),  # NULL-text twin of 3
        (5, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
        (6, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{sf}/documents.parquet")

    dd10 = {
        r.doc_id: (r.cluster_id, r.kept, r.cluster_size)
        for r in QUERIES["dd10_keep_list_banded"].fn(spark, sf).collect()
    }
    dd11 = {
        r.doc_id: (r.cluster_id, r.kept, r.cluster_size)
        for r in QUERIES["dd11_staged_keep_list"].fn(spark, sf).collect()
    }
    # every doc — including the NULL-text ones — has a row in BOTH
    assert set(dd10) == set(dd11) == {1, 2, 3, 4, 5, 6}
    # dd10: shingle-less docs are invisible to LSH → all singletons
    for i in (1, 2, 3, 4):
        assert dd10[i] == (i, True, 1)
    # dd11: digest stage merges the short twins and the NULL twins
    assert dd11[1] == (1, True, 2)
    assert dd11[2] == (1, False, 2)
    assert dd11[3] == (3, True, 2)
    assert dd11[4] == (3, False, 2)
    # shingled exact twins merge identically in both pipelines
    assert dd10[5] == dd11[5] == (5, True, 2)
    assert dd10[6] == dd11[6] == (5, False, 2)


def test_dd12_repeated_span_semantics(spark, tmp_path):
    """dd12 on a corpus with known repeats: cross-doc shared prefix,
    within-doc phrase repeat, a unique doc, and an empty doc — span
    accounting and trimmed-text digests computed by hand."""
    import hashlib

    from ig_etl_with_user_reports_2024_spark.plans.registry import QUERIES
    import ig_etl_with_user_reports_2024_spark.plans.star_pipeline  # noqa: F401

    phrase = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, phrase + " iota kappa", "en", "web", 0),
        (2, phrase + " lambda mu", "en", "web", 0),
        (3, "totally unique words here nothing repeats at all whatsoever indeed", "en", "web", 0),
        (4, "", "en", "web", 0),  # token-less
        (5, phrase.replace("alpha", "pone") + " " + phrase.replace("alpha", "pone"), "en", "web", 0),  # 16 tokens, 8-phrase twice
        (6, None, None, "web", 0),  # NULL text -> same contract as empty
    ]
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{sf}/documents.parquet")

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    out = {
        r.doc_id: (r.n_tokens, r.n_dup_tokens, r.n_spans, r.clean_digest)
        for r in QUERIES["dd12_repeated_span_trim"].fn(spark, sf).collect()
    }
    # docs 1/2 share exactly one 8-gram (their common prefix): the
    # anchor at pos 1 covers tokens 1-8, the 2-token tails survive
    assert out[1] == (10, 8, 1, md5("iota kappa"))
    assert out[2] == (10, 8, 1, md5("lambda mu"))
    # unique doc: nothing trimmed, digest = full normalized text
    assert out[3] == (10, 0, 0, md5(rows[2][1]))
    # empty and NULL text -> no tokens, sentinel digest, row still present
    assert out[4] == (0, 0, 0, "<empty>")
    assert out[6] == (0, 0, 0, "<empty>")
    # within-doc repeat: anchors at pos 1 and 9 (identical 8-grams)
    # cover all 16 tokens as ONE merged span, nothing survives
    assert out[5] == (16, 16, 1, "<empty>")


# --- property-based: dd12 operator vs a pure-Python reference -------------

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:

    def _span_reference(corpus: dict[int, list[str]], k: int):
        """Pure-Python reference of the anchored-k-gram semantics:
        anchor = k-gram occurring >= 2 times corpus-wide; token q of a
        doc is covered iff some dup anchor starts in [q-k+1, q]."""
        import hashlib
        from collections import Counter

        grams = Counter()
        for ws in corpus.values():
            for i in range(len(ws) - k + 1):
                grams[tuple(ws[i : i + k])] += 1
        out = {}
        for doc, ws in corpus.items():
            n = len(ws)
            anchor = [
                i < n - k + 1 and grams[tuple(ws[i : i + k])] >= 2
                for i in range(n)
            ]
            covered = [
                any(anchor[max(0, q - k + 1) : q + 1]) for q in range(n)
            ]
            spans = sum(
                1
                for q in range(n)
                if covered[q] and (q == 0 or not covered[q - 1])
            )
            clean = " ".join(w for q, w in enumerate(ws) if not covered[q])
            digest = (
                hashlib.md5(clean.encode()).hexdigest() if clean else "<empty>"
            )
            out[doc] = (n, sum(covered), spans, digest)
        return out

    # small vocab + short docs force frequent cross- and within-doc
    # repeats, the regime where the window/island logic can break
    _corpus = st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]),
            min_size=0,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    )

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=_corpus, k=st.integers(min_value=2, max_value=4))
    def test_dd12_operator_matches_reference(spark, docs, k):
        corpus = {i + 1: ws for i, ws in enumerate(docs)}
        df = spark.createDataFrame(
            [(i, " ".join(ws)) for i, ws in corpus.items()],
            "doc_id bigint, text string",
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_dup_tokens, r.n_spans, r.clean_digest)
            for r in dd.repeated_span_profile(df, "doc_id", "text", k=k).collect()
        }
        assert got == _span_reference(corpus, k)


def test_quality_survivor_keep_list_rule(spark):
    """dd15's survivor policy on constructed clusters: highest quality
    wins, score ties break to the lowest id, NULL quality ranks last
    (below any real score), singletons keep themselves, sizes exact."""
    members = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6), (7, 6), (10, 10)],
        "doc_id bigint, cluster_id bigint",
    )
    quality = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 7.0), (4, 3.0), (5, 3.0),
         (6, None), (7, 0.0), (10, 1.0)],
        "doc_id bigint, quality_score double",
    )
    out = {r.doc_id: r for r in
           dd.quality_survivor_keep_list(members, quality).collect()}
    assert len(out) == 8
    expect = {1: 2, 2: 2, 3: 2,      # highest quality, not lowest id
              4: 4, 5: 4,            # tie -> lowest id
              6: 7, 7: 7,            # NULL ranks below 0.0
              10: 10}                # singleton
    for d, surv in expect.items():
        assert out[d].survivor_id == surv, (d, out[d])
        assert out[d].kept == (d == surv)
    assert {d: out[d].cluster_size for d in out} == {
        1: 3, 2: 3, 3: 3, 4: 2, 5: 2, 6: 2, 7: 2, 10: 1
    }


def test_quality_survivor_missing_rows_and_range(spark):
    """Review findings pinned: (a) members with NO quality row behave
    exactly like NULL quality (left join) — they stay in the output
    and in cluster_size; (b) NULL ranks below ANY score, including
    scores < -1 (is-null flag, not a sentinel)."""
    members = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)],
        "doc_id bigint, cluster_id bigint",
    )
    # doc 2 has NO row; doc 3 scores -5 (below the old -1 sentinel),
    # doc 4 is NULL
    quality = spark.createDataFrame(
        [(1, -9.0), (3, -5.0), (4, None)],
        "doc_id bigint, quality_score double",
    )
    out = {r.doc_id: r for r in
           dd.quality_survivor_keep_list(members, quality).collect()}
    assert set(out) == {1, 2, 3, 4}          # nobody silently dropped
    assert out[1].survivor_id == 1            # -9.0 beats missing-row
    assert out[2].survivor_id == 1
    assert out[1].cluster_size == 2 and out[2].cluster_size == 2
    assert out[3].survivor_id == 3            # -5.0 beats NULL
    assert out[4].survivor_id == 3


def test_banded_pair_eval_counts_and_missed_pairs(spark):
    """dd16's mechanics where the driver corpus can't reach them: the
    synthetic near-dups are all high-Jaccard (exact twins collide in
    every band), so n_missed is 0 at every sf. Borderline pairs
    (jaccard ~0.3 -> per-band collision ~0.1, miss-all-4 ~0.67) make
    the LSH recall trade REAL here; we assert the accounting identity,
    the verified-subset invariant, and that both branches fire."""
    import random

    rnd = random.Random(23)
    vocab = [f"w{i}" for i in range(400)]

    def rtext(k):
        return " ".join(rnd.choice(vocab) for _ in range(k))

    rows = []
    for i in range(12):
        shared = rtext(20)
        rows.append((2 * i, shared + " " + rtext(20)))
        rows.append((2 * i + 1, rtext(20) + " " + shared))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # r=2 banding (the pre-r9 default, dc2's recall-first shape): the
    # partial-capture branch fires — some borderline pairs collide,
    # some don't — so every accounting identity is exercised non-
    # trivially.
    [r] = dd.banded_pair_eval(df, "doc_id", "text", 8, 4).collect()
    assert r.n_verified_pairs <= r.n_exact_pairs
    assert r.n_missed_pairs == r.n_exact_pairs - r.n_verified_pairs
    assert r.n_verified_pairs <= r.n_band_candidates
    assert r.n_exact_pairs > 0
    assert r.n_missed_pairs > 0          # the LSH trade, measured
    assert r.n_verified_pairs > 0        # ...and partial capture is real
    assert r.pair_recall == r.n_verified_pairs / r.n_exact_pairs
    if r.n_band_candidates:
        assert r.verify_precision == (
            r.n_verified_pairs / r.n_band_candidates
        )
    # r9-tuned default (16,4) r=4: the S-curve crossing moves to ~0.71,
    # so jaccard≈0.3 borderline pairs all but vanish from the candidate
    # set — the documented trade the tuning table records. Exact side
    # is setting-independent.
    [t] = dd.banded_pair_eval(df, "doc_id", "text").collect()
    assert t.n_exact_pairs == r.n_exact_pairs
    assert t.n_band_candidates < r.n_band_candidates
    assert t.n_missed_pairs == t.n_exact_pairs - t.n_verified_pairs
