"""Text-analysis operators for training-data pipelines.

Beyond-reference family (BASELINE.json north star): language ID, quality
scoring, token counting, document fingerprinting — all pure column
expressions over the ``documents`` table shape (doc_id, text, ...).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import normalized_words

# n-gram-heuristic language ID: tiny per-language stopword lists with a
# declared priority order for ties (SURVEY.md Q9 pattern).
LANG_STOPWORDS: list[tuple[str, int, list[str]]] = [
    ("en", 1, ["the", "and", "of", "to", "in", "is", "that", "for", "a", "with"]),
    ("de", 2, ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"]),
    ("es", 3, ["el", "la", "de", "que", "y", "en", "un", "es", "los", "por"]),
    ("fr", 4, ["le", "la", "de", "et", "les", "des", "un", "est", "en", "que"]),
    ("zh", 5, ["de5", "shi4", "bu4", "le5", "zai4", "ren2", "you3", "wo3"]),
]

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

PUNCT_RE = r"[.,!?;:]"


def lang_dim(spark: SparkSession) -> DataFrame:
    rows = [
        (lang, prio, word)
        for lang, prio, words in LANG_STOPWORDS
        for word in words
    ]
    return spark.createDataFrame(rows, "lang string, prio int, word string")


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Predict language by stopword-hit argmax (ties → declared priority;
    zero hits → 'unknown').

    explode tokens → broadcast-join the stopword dim → count hits per
    (doc, lang) → argmax. One shuffle on the doc id.
    """
    from .windows import top_k_per_group

    spark = df.sparkSession
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(normalized_words(F.col(text_col))).alias("word"),
    )
    hits = (
        toks.join(F.broadcast(lang_dim(spark)), "word")
        .groupBy("doc", "lang", "prio")
        .agg(F.count("*").alias("hits"))
    )
    best = top_k_per_group(
        hits, ["doc"], [F.col("hits").desc(), F.col("prio").asc()], k=1
    ).select("doc", F.col("lang").alias("predicted_lang"), "hits")
    ids = df.select(F.col(id_col).alias("doc"))
    return ids.join(best, "doc", "left").select(
        "doc",
        F.coalesce(F.col("predicted_lang"), F.lit("unknown")).alias("predicted_lang"),
        F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring feature columns (length / punctuation / stopword /
    word-shape ratios) — the heuristics used to filter web-scale corpora.
    """
    words = normalized_words(text)
    n_chars = F.length(text)
    n_words = F.size(words)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), F.lit(0)))
    all_stop = [w for _, _, ws in LANG_STOPWORDS for w in ws]
    n_stop = F.size(F.filter(words, lambda w: w.isin(*all_stop)))
    mean_word_len = F.when(
        n_words > 0,
        F.aggregate(
            F.transform(words, lambda w: F.length(w).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n_words,
    )
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars),
        "stopword_ratio": F.when(n_words > 0, n_stop.cast("double") / n_words),
        "mean_word_len": mean_word_len,
    }


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """0-100 quality score: capped length credit + stopword credit -
    punctuation penalty - degenerate-word-length penalty.

    Mirrors the reference's additive capped scoring style
    (analyze_insta_enhanced.py:364-383) applied to corpus QA.
    """
    feats = quality_features(F.col(text_col))
    length_credit = F.least(F.lit(40.0), feats["n_words"].cast("double") / 2)
    stop_credit = F.least(
        F.lit(30.0), F.coalesce(feats["stopword_ratio"], F.lit(0.0)) * 100
    )
    punct_penalty = F.least(
        F.lit(20.0), F.coalesce(feats["punct_ratio"], F.lit(0.0)) * 200
    )
    shape_penalty = F.when(
        F.coalesce(feats["mean_word_len"], F.lit(0.0)) > 12, F.lit(20.0)
    ).otherwise(F.lit(0.0))
    score = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(100.0), length_credit + stop_credit - punct_penalty - shape_penalty
        ),
    )
    return df.select(
        F.col(id_col).alias("doc"),
        feats["n_chars"].alias("n_chars"),
        feats["n_words"].alias("n_words"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["mean_word_len"].alias("mean_word_len"),
        score.alias("quality_score"),
    )


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count (the quick
    'how many LLM tokens is this corpus' estimator)."""
    t = F.lower(F.col(text_col))
    return df.select(
        F.col(id_col).alias("doc"),
        F.size(normalized_words(F.col(text_col))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), F.lit(0))).alias(
            "bpe_tokens"
        ),
    )


def content_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set — equal fingerprints ⇔ same bag-of-words support.

    Expressible identically in DuckDB (md5/list_sort/list_distinct), so
    it is oracle-checked; the rolling-hash variant below is Spark-only.
    """
    words = normalized_words(F.col(text_col))
    canon = F.array_join(F.array_sort(F.array_distinct(words)), " ")
    return df.select(
        F.col(id_col).alias("doc"), F.md5(canon.cast("binary")).alias("fingerprint")
    )


def rolling_hash_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-SENSITIVE polynomial rolling hash over the word sequence:
    h = fold(h*131 + word_hash) mod p, p = 1e9+7.

    Detects reordered-content near-misses that the bag-of-words
    fingerprint conflates. Pure array fold — no shuffle, no UDF. The
    per-word hash is the first 15 hex digits of md5 (60 bits) rather
    than xxhash64 so an independent engine computes the identical
    fingerprint (DuckDB: ``CAST('0x'||substring(md5(w),1,15) AS
    BIGINT)``) — that portability is what upgrades this from a
    rows-only check to a bit-exact oracle. The modulus keeps
    acc < p so acc*131 + word_hash stays far below 2^63 (ANSI mode
    raises on long overflow).
    """
    p = 1_000_000_007
    words = normalized_words(F.col(text_col))
    word_hash = lambda w: F.pmod(  # noqa: E731
        F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long"), F.lit(p)
    )
    h = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: F.pmod(acc * 131 + word_hash(w), F.lit(p)),
    )
    return df.select(F.col(id_col).alias("doc"), h.alias("rolling_fingerprint"))


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 4, w: int = 5
) -> DataFrame:
    """WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``k``-gram, then
    keep the MINIMUM hash of each sliding window of ``w`` consecutive
    k-gram hashes. The selected set is a position-robust fingerprint:
    any shared substring of at least ``w + k - 1`` words between two
    documents is GUARANTEED to contribute at least one common
    fingerprint (the paper's detection guarantee), while the expected
    density of selected hashes is only ``2 / (w + 1)`` — the principled
    way to subsample shingles for copy detection, where plain MinHash
    gives whole-document similarity, not substring containment.

    Selection is by window-min VALUE (every distinct window minimum is
    kept), so the fingerprint set is tie-order-independent and the
    identical construction runs in DuckDB — the tie-breaking refinement
    the paper adds (rightmost minimum per window) only affects which
    POSITION is recorded, not the value set this operator emits.

    Plan shape: one posexplode, the k-gram via ``lead`` over a per-doc
    position window (dd12's pattern — per-doc frames are bounded by
    document length, never corpus size; md5 stays in whole-stage
    codegen, not HOF lambdas), one more per-doc frame for the window
    min, then a map-side-combined groupBy(doc) fold of the distinct
    mins. Shuffle carries (doc, 32-char hash) rows at selected-gram
    grain (~2/(w+1) of k-gram grain), never text.

    Output, one row per input document: (doc, n_grams, n_windows,
    n_fps, fp_digest) where fp_digest = md5 of the '|'-joined sorted
    distinct selected hashes (NULL when the doc is too short to fill
    one window — n_grams/n_windows still report the true counts).
    """
    from pyspark.sql.window import Window

    nw = F.coalesce(F.size(normalized_words(F.col(text_col))), F.lit(0))
    base = df.select(
        F.col(id_col).alias("doc"),
        nw.alias("nw"),
        normalized_words(F.col(text_col)).alias("ws"),
    )
    # counts derive from word count alone — no dependence on the explode
    counts = base.select(
        "doc",
        F.greatest(F.col("nw") - (k - 1), F.lit(0)).cast("bigint").alias("n_grams"),
        F.greatest(F.col("nw") - (k - 1) - (w - 1), F.lit(0))
        .cast("bigint")
        .alias("n_windows"),
    )
    wp = base.select(
        "doc", "nw", F.posexplode("ws").alias("p", "w0")
    )
    order = Window.partitionBy("doc").orderBy("p")
    gram = F.concat_ws(
        " ", F.col("w0"), *[F.lead("w0", j).over(order) for j in range(1, k)]
    )
    grams = (
        wp.select("doc", "nw", "p", F.md5(F.encode(gram, "UTF-8")).alias("gh"))
        # 0-based: k-gram starting at p is complete iff p <= nw - k
        .filter(F.col("p") <= F.col("nw") - k)
    )
    winmin = F.min("gh").over(order.rowsBetween(0, w - 1))
    sel = (
        grams.select("doc", "nw", "p", winmin.alias("fp"))
        # full windows only: window starting at p spans p .. p + w - 1
        .filter(F.col("p") <= F.col("nw") - k - (w - 1))
        .select("doc", "fp")
        .distinct()
    )
    agg = sel.groupBy("doc").agg(
        F.count("*").cast("bigint").alias("n_fps"),
        F.md5(
            F.encode(
                F.concat_ws("|", F.array_sort(F.collect_set("fp"))), "UTF-8"
            )
        ).alias("fp_digest"),
    )
    return (
        counts.join(agg, "doc", "left")
        .select(
            "doc",
            "n_grams",
            "n_windows",
            F.coalesce(F.col("n_fps"), F.lit(0)).alias("n_fps"),
            "fp_digest",
        )
    )
