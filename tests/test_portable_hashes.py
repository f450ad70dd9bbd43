"""Third-implementation cross-checks for the portable (md5-only) hash
operators: the DuckDB oracle already agrees with Spark (driver gate);
these tests agree a PURE-PYTHON reference with Spark too, so a bug that
somehow landed symmetrically in both SQL dialects would still be caught.
Property-based where input shape matters (hypothesis), golden-style for
the BM25 formula."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ig_etl_with_user_reports_2024_spark.operators import dedup as dd

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _py_words(text: str) -> list[str]:
    return [w for w in text.strip().lower().split() if w]


def _py_shingles(words: list[str], n: int = 3) -> list[str]:
    if len(words) < n:
        return []
    seen, out = set(), []
    for i in range(len(words) - n + 1):
        sh = " ".join(words[i : i + n])
        if sh not in seen:
            seen.add(sh)
            out.append(sh)
    return out


def _py_minhash_bands(text: str, num_hashes: int = 16, bands: int = 4):
    shingles = _py_shingles(_py_words(text))
    if not shingles:
        return {}
    r = num_hashes // bands
    mins = [min(_md5(f"{i}:{sh}") for sh in shingles) for i in range(num_hashes)]
    return {
        b: _md5("|".join(mins[b * r : (b + 1) * r])) for b in range(bands)
    }


def _py_simhash_fp(text: str, bits: int = 32) -> int | None:
    words = _py_words(text)
    if not words:
        return None
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    votes = [0] * bits
    for w, c in counts.items():
        hv = int(_md5(w)[: bits // 4], 16)
        for i in range(bits):
            votes[i] += c if (hv >> i) & 1 == 1 else -c
    return sum((1 << i) for i in range(bits) if votes[i] >= 0)


_WORD = st.sampled_from(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
) if _HAS_HYPOTHESIS else None


if _HAS_HYPOTHESIS:
    _texts = st.lists(
        st.lists(_WORD, min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    )

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=_texts)
    def test_portable_minhash_matches_python(spark, texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id bigint, text string"
        )
        got: dict[int, dict[int, str]] = {}
        for r in dd.portable_minhash_bands(df, "doc_id", "text").collect():
            got.setdefault(r.doc, {})[r.band] = r.bucket
        expect = {
            i: _py_minhash_bands(t)
            for i, t in enumerate(texts)
            if _py_minhash_bands(t)
        }
        assert got == expect

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=_texts)
    def test_portable_simhash_matches_python(spark, texts):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id bigint, text string"
        )
        got = {
            (r.a_id, r.b_id): r.hamming
            for r in dd.portable_simhash_pairs(
                df, "doc_id", "text", max_hamming=32
            ).collect()
        }
        # brute force: fingerprints, nibble-band candidates, Hamming
        fps = {
            i: fp
            for i, t in enumerate(texts)
            if (fp := _py_simhash_fp(t)) is not None
        }
        expect = {}
        ids = sorted(fps)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                share = any(
                    (fps[a] >> (8 * band)) & 255 == (fps[b] >> (8 * band)) & 255
                    for band in range(4)
                )
                if share:
                    expect[(a, b)] = bin(fps[a] ^ fps[b]).count("1")
        assert got == expect


def test_bm25_matches_python_reference(spark, sf_smoke):
    # third implementation of the exact double arithmetic (Python floats
    # are IEEE doubles; op order mirrored from the plan)
    from ig_etl_with_user_reports_2024_spark.plans.star_pipeline import (
        _BM25_QUERIES,
        ii2_bm25_topk,
    )

    docs = {
        r.doc_id: _py_words(r.text)
        for r in spark.read.parquet(f"{sf_smoke}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    n_docs = len(docs)
    total_len = sum(len(ws) for ws in docs.values())
    avgdl = float(total_len) / n_docs
    tf: dict[tuple[str, int], int] = {}
    terms = {t for _, ts in _BM25_QUERIES for t in ts}
    for d, ws in docs.items():
        for w in ws:
            if w in terms:
                tf[(w, d)] = tf.get((w, d), 0) + 1
    df_ = {t: sum(1 for (w, _) in tf if w == t) for t in terms}
    expect = {}
    for qid, qterms in _BM25_QUERIES:
        scores: dict[int, float] = {}
        for d in docs:
            per_term = []
            for t in sorted(qterms):
                if (t, d) not in tf:
                    continue
                f = tf[(t, d)]
                dl = len(docs[d])
                idf = (n_docs - df_[t] + 0.5) / (df_[t] + 0.5)
                tfn = (float(f) * 2.2) / (
                    f + 1.2 * (0.25 + 0.75 * (float(dl) / avgdl))
                )
                per_term.append(idf * tfn)
            if per_term:
                s = 0.0
                for v in per_term:
                    s += v
                scores[d] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        for rank, (d, s) in enumerate(top, start=1):
            expect[(qid, d)] = (rank, s)
    got = {
        (r.query_id, r.doc_id): (r.rank, r.score)
        for r in ii2_bm25_topk(spark, sf_smoke).collect()
    }
    assert got == expect  # ranks AND bit-exact double scores
