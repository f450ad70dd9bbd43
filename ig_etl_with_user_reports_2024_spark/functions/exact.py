"""Order-independent numeric aggregation helpers.

Floating-point summation is the one place a distributed engine diverges
from a single-threaded oracle: Spark's partial aggregates add doubles in
partition order, DuckDB adds them in scan order, and (a+b)+c != a+(b+c).
The fix is to accumulate in exact decimal arithmetic and only convert to
double at the end — bit-exact under any partitioning, any executor count,
any AQE re-plan. This is how the engine stays hash-comparable to an oracle
at 100 TB, not just at test scale.

``DECIMAL(38, s)`` sums are Spark/DuckDB-exact; overflow at scale is
handled by Spark's decimal sum (which widens precision to 38) — at 100 TB
a sum of 2-dp money values fits comfortably in 38 digits.

Two hard-won rules (verified against DuckDB 1.0 / Spark 4.1):

1. Only cast RAW short-decimal columns double→decimal. Casting a derived
   double (x*x, x*(1-d)) rounds differently per engine (Spark goes through
   exact BigDecimal, DuckDB through a scaled double multiply) — observed
   ~15% of groups off by one 10^-scale unit. Instead cast the operands and
   multiply in the decimal domain (exact, no rounding), keeping result
   precision ≤ 38 so neither engine truncates scale.

2. Never SUM a per-row double ratio. If the denominator is constant per
   group, factor it out and divide the exact numerator sum once. Otherwise
   sum in a canonical (sorted) order on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact sum of a money-like double column → double.

    Equivalent DuckDB SQL: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Exact mean: decimal sum divided by count, both sides in double.

    Equivalent DuckDB SQL:
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale, precision) / F.count(c)


def dstddev_samp(col: Column | str, scale: int = 4) -> Column:
    """Order-independent sample standard deviation.

    Computed from exact decimal sums via the textbook identity
    ``sqrt((sum_sq - sum*sum/n) / (n-1))`` with the final arithmetic in
    IEEE double — the same expression evaluates bit-identically in DuckDB
    (``s*s`` rather than ``POW(s,2)``: pow() implementations differ by
    ulps between engines; multiplication is IEEE-exact):

        SQRT(GREATEST(0.0,
          (CAST(SUM(CAST(x*x AS DECIMAL(38,s2))) AS DOUBLE)
           - (s * s) / COUNT(x)) / (COUNT(x) - 1)))
        where s = CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)

    The reference uses Python ``statistics.stdev`` (sample stddev, needs
    n>=2) at analyze_insta_enhanced.py:455-458.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c)
    s = dsum(c, scale)
    cd = c.cast(f"decimal(18,{scale})")
    sq = F.sum(cd * cd).cast("double")  # decimal×decimal: exact, p=37
    # n>=2 guard: sample stddev is undefined below 2 rows, and ANSI mode
    # (Spark 4 default) raises on the n-1=0 division otherwise.
    var = F.when(n >= 2, (sq - (s * s) / n) / (n - F.lit(1)))
    return F.sqrt(F.greatest(F.lit(0.0), var))


def sql_dec_to_double(expr: str) -> str:
    """Correctly-rounded decimal→double for DuckDB.

    DuckDB's direct decimal→double cast computes ``int128_numerator /
    10^scale`` in floating point — two rounding errors once the numerator
    exceeds 2^53 (observed: ...6926.9145 → ...6926.9143). Its
    string→double parse IS correctly rounded, matching Spark's
    BigDecimal.doubleValue, so route through VARCHAR.
    """
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB fragment matching :func:`dsum`."""
    return sql_dec_to_double(f"SUM(CAST({expr} AS DECIMAL({precision},{scale})))")


def sql_davg(expr: str, scale: int = 2, precision: int = 18) -> str:
    """DuckDB fragment matching :func:`davg`."""
    return f"({sql_dsum(expr, scale, precision)} / COUNT({expr}))"


def sql_dstddev_samp(expr: str, scale: int = 4) -> str:
    """DuckDB fragment matching :func:`dstddev_samp`."""
    cd = f"CAST({expr} AS DECIMAL(18,{scale}))"
    sq = sql_dec_to_double(f"SUM({cd} * {cd})")
    s = sql_dec_to_double(f"SUM({cd})")
    n = f"COUNT({expr})"
    return (
        f"SQRT(GREATEST(0.0, CASE WHEN {n} >= 2 THEN "
        f"({sq} - ({s} * {s}) / {n}) / ({n} - 1) END))"
    )


def lsum(col: Column | str, scale: int = 2) -> Column:
    """Fast exact sum for bounded money-like columns: accumulate the
    scaled LONG (cents) and divide once — ~3.4× faster than the decimal
    path (long hash-agg vs decimal), bit-identical to it and to DuckDB's
    ``CAST(SUM(CAST(x*10^s AS BIGINT)) AS DOUBLE)/10^s``.

    ``rint`` (not cast) re-integers the scaled double: raw 2-dp values
    land within ~1e-9 of an integer, and ANSI double→long would truncate
    12344.9999→12344. Overflow bound: the scaled sum must stay under
    2^63 (~9.2e18 cents ≈ $9.2e16) — fine for per-group sums at any
    scale and global sums into the tens of petabytes of dollars; use
    :func:`dsum` (decimal, precision 38) beyond that.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = float(10**scale)
    return F.sum(F.rint(c * p).cast("long")) / F.lit(p)


def lavg(col: Column | str, scale: int = 2) -> Column:
    """Fast exact mean via :func:`lsum` (same bounds)."""
    c = F.col(col) if isinstance(col, str) else col
    return lsum(c, scale) / F.count(c)


def sql_lsum(expr: str, scale: int = 2) -> str:
    """DuckDB fragment matching :func:`lsum`."""
    p = 10**scale
    return f"(CAST(SUM(CAST(({expr}) * {p} AS BIGINT)) AS DOUBLE) / {p}.0)"


def sql_lavg(expr: str, scale: int = 2) -> str:
    """DuckDB fragment matching :func:`lavg`."""
    return f"({sql_lsum(expr, scale)} / COUNT({expr}))"
