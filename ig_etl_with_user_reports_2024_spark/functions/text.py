"""Text extraction / tokenization column expressions (SURVEY.md §2.8 X1-X3).

Everything is built-in ``pyspark.sql.functions`` regex/string ops —
JVM-side and codegen-friendly; no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# X1 — reference regexes (analyze_insta_enhanced.py:145,604-605,1591,1597).
# (?U): the reference's Python \w is Unicode-aware; Java regex \w is
# ASCII-only by default, which would truncate '#café' to 'caf' (review
# finding). MENTION_RE keeps its explicit ASCII class — that IS the
# reference's own pattern.
HASHTAG_RE = r"(?U)#(\w+)"
MENTION_RE = r"@([A-Za-z0-9._]+)"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"

# F8 — 26-word mention stoplist (analyze_insta_enhanced.py:1314 family).
MENTION_STOPWORDS = [
    "the", "and", "for", "you", "your", "with", "this", "that", "are",
    "was", "will", "have", "has", "had", "can", "could", "would", "should",
    "about", "just", "like", "what", "when", "where", "who", "how",
]


def extract_hashtags(caption: Column) -> Column:
    """All ``#tag`` captures, lowercased (analyze_insta_enhanced.py:1591)."""
    return F.transform(
        F.regexp_extract_all(caption, F.lit(HASHTAG_RE), F.lit(1)), lambda x: F.lower(x)
    )


def extract_mentions(caption: Column) -> Column:
    """All ``@name`` captures, lowercased (analyze_insta_enhanced.py:1597)."""
    return F.transform(
        F.regexp_extract_all(caption, F.lit(MENTION_RE), F.lit(1)), lambda x: F.lower(x)
    )


def username_tokens(username: Column) -> Column:
    """Username tokenization: strip '_', replace '_'/'.' with spaces, split,
    keep tokens of length > 1 (analyze_insta_enhanced.py:1017-1020)."""
    cleaned = F.regexp_replace(F.lower(username), r"[_.]+", " ")
    return F.filter(F.split(F.trim(cleaned), r"\s+"), lambda t: F.length(t) > 1)


def bio_tokens(bio: Column) -> Column:
    """Bio tokenization: commas/newlines → spaces, whitespace split
    (analyze_insta_enhanced.py:1023)."""
    cleaned = F.regexp_replace(F.lower(bio), r"[,\n]+", " ")
    return F.filter(F.split(F.trim(cleaned), r"\s+"), lambda t: t != F.lit(""))


def word_tokens(text: Column) -> Column:
    """Generic whitespace word split used by the beyond-reference text ops."""
    return F.filter(F.split(F.trim(F.lower(text)), r"\s+"), lambda t: t != F.lit(""))
