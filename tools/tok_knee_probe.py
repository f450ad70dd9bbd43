"""Probe tok1's real-vocab claim: where does the chained-replace BPE
cascade break as the merge table grows toward a real tokenizer's size?

tok1 ships a 20-rule merge table and its docstring asserts a real
tokenizer's top-K merges are a drop-in; VERDICT r12 "Next round" #4
asks for the measurement instead of the assertion — at K≈50k rules the
cascade is a K-deep nested Replace expression tree, and codegen /
analysis limits are unprobed.

The driver testdata's documents use a ~31-type vocabulary (BPE
training exhausts after ~89 merges), so the probe builds its own
REALISTIC corpus (the r12 tok3 Zipf-corpus precedent, upgraded with
word-internal structure): a 20k-type vocabulary of 2–4 syllable words
(CV-pattern syllables — the character statistics BPE merges actually
bite on), Zipf-ranked frequencies, deterministic md5-driven sampling.
BPE merges are learned from that frequency table with the standard
greedy trainer (Sennrich et al. 2016), then for each K the SAME
two-space-encoded cascade subword_count_col builds (parameterized
merge list) runs in tok3's vocab-grain shape AND tok1's
occurrence-grain shape, recording expression build wall, plan wall,
execution wall, and whether the final plan still whole-stage-codegens
(the ``*(n)`` stage markers).

Prints one JSON line per (K, shape) for SCALE_r13.md.

Usage:
    python tools/tok_knee_probe.py --ks 20,100,500,1000,2000 \
        [--vocab 20000] [--docs 20000] [--words-per-doc 100]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

_ONSETS = ["b", "d", "f", "g", "k", "l", "m", "n", "p", "r", "s", "t",
           "v", "z", "st", "tr", "ch", "sh", "th", "pl"]
_VOWELS = ["a", "e", "i", "o", "u", "ai", "ea", "ou"]
_CODAS = ["", "", "n", "r", "s", "t", "l", "nd", "st", "ng"]


def synth_word(i: int) -> str:
    """Deterministic 2–4 syllable word for vocab index ``i`` — enough
    character structure (shared onsets/vowels/codas) that learned BPE
    merges generalize across the vocabulary like they do on text."""
    h = hashlib.md5(f"w:{i}".encode()).hexdigest()
    n_syl = 2 + int(h[0], 16) % 3
    out = []
    for s in range(n_syl):
        a, b, c = (int(h[1 + 3 * s : 4 + 3 * s][j], 16) for j in range(3))
        out.append(
            _ONSETS[a % len(_ONSETS)]
            + _VOWELS[b % len(_VOWELS)]
            + _CODAS[c % len(_CODAS)]
        )
    return "".join(out)


def learn_merges(word_freq: dict[str, int], k: int) -> list[tuple[str, str]]:
    """Plain BPE training over a word-frequency table: repeatedly merge
    the most frequent adjacent symbol pair (ties lexical — makes the
    learned table deterministic for a given corpus)."""
    vocab = {tuple(w): c for w, c in word_freq.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def _revkey(s: str) -> bytes:
    """Order-REVERSING injection on strings: byte-complemented UTF-8
    plus a 0xFF sentinel, so min-heap order on _revkey equals MAX
    lexicographic order on the original (UTF-8 bytewise order equals
    code-point order; complemented bytes of NUL-free input are <= 254,
    so the sentinel settles the a-is-a-prefix-of-b case the complement
    alone gets backwards). A U+0000 in the input would complement to
    0xFF and collide with the sentinel, breaking the injection for
    prefix-tied symbols (r15 review finding) — guard loudly; symbols
    here come from whitespace-split text and the ASCII synth corpus,
    so the guard is a tripwire, not a path."""
    if "\x00" in s:
        raise ValueError("_revkey cannot encode symbols containing U+0000")
    return bytes(255 - c for c in s.encode()) + b"\xff"


def learn_merges_fast(
    word_freq: dict[str, int], k: int
) -> list[tuple[str, str]]:
    """TRAJECTORY-IDENTICAL fast path for :func:`learn_merges` (the
    standard incremental BPE trainer: maintain global pair counts and a
    pair->words index, and on each merge re-derive pair deltas only for
    the words that contain the winning pair — Sennrich's subword-nmt
    optimization). The argmax rides a lazy max-heap keyed
    (-count, _revkey(a), _revkey(b)) so ties break by MAX (a, b)
    exactly like learn_merges' max(...) over (count, pair); stale heap
    entries are skipped against the ground-truth counts. Identity with
    the naive trainer is pinned at K=2000 on the shipped corpus via
    dims_bpe.BPE_MERGES_2000_MD5 (tests/test_dims.py)."""
    import heapq
    from collections import defaultdict

    syms_by_w: list[list[str]] = []
    freqs: list[int] = []
    for w, c in word_freq.items():
        if w:
            syms_by_w.append(list(w))
            freqs.append(c)

    counts: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, syms in enumerate(syms_by_w):
        f = freqs[wi]
        for p in zip(syms, syms[1:]):
            counts[p] += f
            where[p].add(wi)

    heap: list[tuple[int, bytes, bytes, str, str]] = [
        (-c, _revkey(a), _revkey(b), a, b) for (a, b), c in counts.items()
    ]
    heapq.heapify(heap)

    def push(p: tuple[str, str]) -> None:
        heapq.heappush(
            heap, (-counts[p], _revkey(p[0]), _revkey(p[1]), p[0], p[1])
        )

    merges: list[tuple[str, str]] = []
    while len(merges) < k:
        best = None
        while heap:
            negc, _, _, a, b = heap[0]
            if -negc > 0 and counts.get((a, b), 0) == -negc:
                best = (a, b)
                break
            heapq.heappop(heap)
        if best is None:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for wi in sorted(where.get(best, ())):
            syms = syms_by_w[wi]
            f = freqs[wi]
            old = _pair_multiset(syms)
            # leftmost-first non-overlapping merge — learn_merges' loop
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms_by_w[wi] = out
            new = _pair_multiset(out)
            for p in set(old) | set(new):
                d = new.get(p, 0) - old.get(p, 0)
                if not d:
                    continue
                counts[p] += d * f
                if counts[p] <= 0:
                    del counts[p]
                    where[p].discard(wi)
                else:
                    push(p)
                if p in new:
                    where[p].add(wi)
                elif p in where:
                    where[p].discard(wi)
        where.pop(best, None)
    return merges


def _pair_multiset(syms: list[str]) -> dict[tuple[str, str], int]:
    from collections import Counter

    return dict(Counter(zip(syms, syms[1:])))


def cascade_count_col(word_col: str, merges: list[tuple[str, str]]):
    """subword_count_col with a parameterized merge list — the same
    two-space encoding and replace cascade (one construction here, the
    shipped 20-rule one in operators/textops.py; the probe's point is
    the LIST LENGTH, not a different algorithm)."""
    s = F.concat(
        F.lit("  "), F.regexp_replace(F.col(word_col), "(.)", "$1  ")
    )
    for a, b in merges:
        s = F.replace(s, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
    return (
        F.shiftright(
            F.length(s) - F.length(F.replace(s, F.lit(" "), F.lit(""))), 1
        )
        - 1
    ).cast("long")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="20,100,500,1000,2000")
    ap.add_argument("--vocab", type=int, default=20_000)
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--words-per-doc", type=int, default=100)
    args = ap.parse_args()

    from ig_etl_with_user_reports_2024_spark.session import get_spark

    spark = get_spark("tok_knee_probe")
    ks = [int(x) for x in args.ks.split(",")]
    V = args.vocab

    # Zipf word-frequency table (freq ∝ 1/rank) over the synthetic
    # vocabulary — the trainer's input, driver-side (vocab-sized)
    words = [synth_word(i) for i in range(V)]
    word_freq = {w: max(1, V // (r + 1)) for r, w in enumerate(words)}
    t0 = time.time()
    merges = learn_merges(word_freq, max(ks))
    train_s = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "trained_merges": len(merges),
                "train_secs": train_s,
                "vocab_types": len(set(words)),
                "first10": ["".join(m) for m in merges[:10]],
            }
        ),
        flush=True,
    )

    # Zipf token stream in Spark: doc = id div words_per_doc, rank =
    # floor(V^u) - 1 (log-uniform ≈ Zipf-1), word via broadcast vocab
    n_tokens = args.docs * args.words_per_doc
    vocab_df = F.broadcast(
        spark.createDataFrame(
            [(r, w) for r, w in enumerate(words)], "rank long, w string"
        )
    )
    base = spark.range(n_tokens).select(
        (F.col("id") / args.words_per_doc).cast("long").alias("doc"),
        F.least(
            F.lit(V - 1),
            (
                F.pow(
                    F.lit(float(V)),
                    F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                           16, 10).cast("double")
                    / F.lit(float(16**8)),
                )
                - 1
            ).cast("long"),
        ).alias("rank"),
    )
    toks = base.join(vocab_df, "rank").select("doc", "w")
    toks.persist().count()  # pin the stream so every K times only the cascade

    def doc_total(per_word_counts) -> tuple[int, str]:
        """(Σ subwords, final plan) for the tok3 join-back shape given a
        (w, n_sub) vocab-grain frame."""
        agg = (
            toks.join(F.broadcast(per_word_counts), "w")
            .groupBy("doc")
            .agg(F.sum("n_sub").alias("n_subword_tokens"))
            .agg(F.sum("n_subword_tokens"))
        )
        total = agg.collect()[0][0]
        return total, agg._jdf.queryExecution().executedPlan().toString()

    vocab_only = toks.select("w").distinct()

    for k in ks:
        mk = merges[:k]
        for shape in ("vocab", "occurrence"):
            t0 = time.time()
            try:
                cnt = cascade_count_col("w", mk).alias("n_sub")
                if shape == "vocab":
                    total, plan = doc_total(vocab_only.select("w", cnt))
                else:
                    agg = (
                        toks.select("doc", cnt)
                        .groupBy("doc")
                        .agg(F.sum("n_sub").alias("n_subword_tokens"))
                        .agg(F.sum("n_subword_tokens"))
                    )
                    total = agg.collect()[0][0]
                    plan = agg._jdf.queryExecution().executedPlan().toString()
                t_run = time.time()
                print(
                    json.dumps(
                        {
                            "k": k,
                            "shape": shape,
                            "secs": round(t_run - t0, 2),
                            "total_subwords": total,
                            "wholestage_codegen": bool(
                                re.search(r"\*\(\d+\)", plan)
                            ),
                        }
                    ),
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 — the knee IS the finding
                print(
                    json.dumps(
                        {"k": k, "shape": shape,
                         "error": type(e).__name__,
                         "msg": str(e).split("\n")[0][:120]}
                    ),
                    flush=True,
                )

        # fallback A — CHUNKED cascade at vocab grain with a
        # localCheckpoint barrier per chunk: each chunk is a shallow
        # (~chunk-deep) expression, the barrier stops Catalyst's
        # CollapseProject from re-nesting the full K-deep tree, and the
        # materialized intermediate is VOCAB-sized (tok3's point: the
        # corpus never pays K). Inline (not via
        # textops.chunked_subword_token_counts, which is the CANONICAL
        # form tok4 registers) because the probe works from an
        # already-exploded token frame; a semantics change must edit
        # the operator and this block together — the operator's
        # chunk-invariance test is the drift guard
        t0 = time.time()
        enc = F.concat(
            F.lit("  "), F.regexp_replace(F.col("w"), "(.)", "$1  ")
        )
        cur = vocab_only.select("w", enc.alias("s"))
        chunk = 100
        for lo in range(0, len(mk), chunk):
            s = F.col("s")
            for a, b in mk[lo : lo + chunk]:
                s = F.replace(s, F.lit(f" {a}  {b} "), F.lit(f" {a}{b} "))
            cur = cur.select("w", s.alias("s")).localCheckpoint(eager=False)
        n_sub = (
            F.shiftright(
                F.length("s")
                - F.length(F.replace(F.col("s"), F.lit(" "), F.lit(""))),
                1,
            )
            - 1
        ).cast("long")
        total_a, plan_a = doc_total(cur.select("w", n_sub.alias("n_sub")))
        t_a = round(time.time() - t0, 2)

        # fallback B — Arrow-batched pandas UDF applying the merge list
        # in Python, at vocab grain only (the corpus side stays JVM):
        # the pragmatic production answer for a 50k-rule table
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        mk_local = list(mk)
        from ig_etl_with_user_reports_2024_spark.operators.textops import (
            chunked_subword_tokenize_py,
        )

        def _one(w: str) -> int:
            # the SHIPPED recompute (textops), not a local twin — the
            # probe must measure the same semantics tok4 registers
            # (review finding r13)
            return chunked_subword_tokenize_py(w, mk_local)

        # lambda form: the module-level `from __future__ import
        # annotations` turns hints into strings pandas_udf can't parse
        py_count = pandas_udf(lambda ws: ws.map(_one), "long")

        t0 = time.time()
        total_b, _ = doc_total(
            vocab_only.select("w", py_count(F.col("w")).alias("n_sub"))
        )
        t_b = round(time.time() - t0, 2)
        print(
            json.dumps(
                {
                    "k": k,
                    "fallbacks": {
                        "chunked_barrier_vocab": {
                            "secs": t_a, "total_subwords": total_a},
                        "pandas_udf_vocab": {
                            "secs": t_b, "total_subwords": total_b},
                    },
                    "agree": total_a == total_b,
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
