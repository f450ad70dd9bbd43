"""Deterministic sampling operators for training-data pipelines.

Beyond-reference family (BASELINE.json north star). Sampling for a
100 TB training mix must be REPRODUCIBLE — re-running the pipeline (or
running it in another engine) must pick the same rows — so nothing here
uses ``rand()``: membership is a pure function of a salted md5 of the
row key. md5 hex is lowercase in both Spark and DuckDB and compares
bytewise under both engines' default collations, so a hex-prefix
threshold is an engine-portable Bernoulli draw:

    P(substr(md5(salt||key),1,4) < t) == int(t,16) / 16^4

Every operator is a narrow expression over the scan (sp1/sp2 are
filters — no shuffle at all; sp3 is one per-stratum shuffle that Spark 4
executes as WindowGroupLimit, i.e. partial top-k before the exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, salt: str, hex_digits: int = 4) -> Column:
    """The salted md5 hex prefix that drives every sampling decision.

    Different salts give independent draws from the same key (split
    assignment vs subsampling vs shuffling must not correlate).
    """
    return F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, hex_digits)


def sql_hash_bucket(key_expr: str, salt: str, hex_digits: int = 4) -> str:
    """DuckDB fragment matching :func:`hash_bucket`."""
    return f"substring(md5('{salt}:' || CAST({key_expr} AS VARCHAR)), 1, {hex_digits})"


def hex_threshold(frac: float) -> str:
    """The 4-hex-digit threshold string for ``P(bucket < t) == frac``.

    ``round(frac * 65536) == 65536`` (frac exactly 1.0, or within ~8e-6
    of it) would format to the FIVE-char ``'10000'``, which sorts BELOW
    most 4-char prefixes ('10000' < '1234…') and silently keeps ~1/16 of
    rows. Any overflowed threshold means keep-all, and ``'g'`` sorts
    after every hex digit, so ``bucket < 'g'`` is always true — the
    single comparison stays correct at both extremes.
    """
    n = round(frac * 65536)
    return "g" if n >= 65536 else format(n, "04x")


def hash_split(
    df: DataFrame,
    key: str,
    salt: str = "split",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """Assign train/val/test deterministically by hash range.

    Fractions quantize to 1/65536 granularity (4 hex digits); the split
    is stable under any repartitioning, insertion order, or engine.
    """
    b = hash_bucket(F.col(key), salt)
    val_hi = hex_threshold(val_frac)
    test_hi = hex_threshold(val_frac + test_frac)
    return df.withColumn(
        "split",
        F.when(b < val_hi, "val")
        .when(b < test_hi, "test")
        .otherwise("train"),
    )


def sql_hash_split(
    key_expr: str, salt: str = "split", val_frac: float = 0.1, test_frac: float = 0.1
) -> str:
    """DuckDB CASE fragment matching :func:`hash_split`'s ``split``."""
    b = sql_hash_bucket(key_expr, salt)
    val_hi = hex_threshold(val_frac)
    test_hi = hex_threshold(val_frac + test_frac)
    return (
        f"CASE WHEN {b} < '{val_hi}' THEN 'val' "
        f"WHEN {b} < '{test_hi}' THEN 'test' ELSE 'train' END"
    )


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float], salt: str = "strat"
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample (a weighted training
    mix: each source keeps its own fraction). Unlisted strata drop."""
    b = hash_bucket(F.col(key), salt)
    cond = None
    for s, rate in rates.items():
        this = F.col(stratum) == s
        if rate < 1.0:
            # hex_threshold handles rates that round up to 65536
            # (within ~8e-6 of 1.0) by returning the keep-all sentinel
            this = this & (b < hex_threshold(rate))
        cond = this if cond is None else (cond | this)
    return df.filter(cond)


def k_per_stratum(
    df: DataFrame, key: str, stratum: str, k: int, salt: str = "ksample"
) -> DataFrame:
    """Deterministic k-row uniform sample per stratum: rank by the
    salted hash (full md5 then key as total-order tie-break) and keep
    the first k. Equivalent to a seeded reservoir sample but stable
    under any partitioning; Spark 4 runs the rank-filter as
    WindowGroupLimit (per-partition top-k before the shuffle)."""
    w = Window.partitionBy(stratum).orderBy(
        F.md5(F.concat(F.lit(salt + ":"), F.col(key).cast("string"))).asc(),
        F.col(key).asc(),
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
