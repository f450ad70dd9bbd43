"""CPython-exact rounding (compat mode).

Three JVM rounding semantics were measured against CPython's
``round(x, n)`` (which rounds the EXACT binary value, via David Gay's
dtoa) — none match it:

- ``bround``: HALF_EVEN on the SHORTEST decimal repr → 0.685 → 0.68
  (Python: 0.69, because 0.685 is stored as 0.68500000000000005);
- ``format_string('%.nf')``: HALF_UP on the shortest repr;
- ``rint(x*10^n)/10^n``: the scaled product can land exactly on a .5
  double, flipping ~1% of decimal-ish values.

The engine's default contract is therefore ``bround`` (deterministic,
JVM-fast, sane); pipelines that must hash-match CPython-produced golden
files (tests/test_golden_reference.py) switch on ``python_rounding``,
which routes the handful of rounded columns through this Arrow-batched
pandas UDF. Object-level ``round`` per value — the slow path, used at
creator grain only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_CACHE: dict[int, object] = {}


def py_round(col: Column, n: int) -> Column:
    """CPython ``round(x, n)`` as a vectorized UDF (None-safe)."""
    if n not in _CACHE:

        def make(scale: int):
            @F.pandas_udf("double")
            def _round(s: pd.Series) -> pd.Series:
                return pd.Series(
                    [None if v is None or pd.isna(v) else round(v, scale) for v in s],
                    dtype="float64",
                )

            return _round

        _CACHE[n] = make(n)
    return _CACHE[n](col)


def rounder(python_rounding: bool):
    """Return the rounding function for the chosen compat mode."""
    return py_round if python_rounding else F.bround
