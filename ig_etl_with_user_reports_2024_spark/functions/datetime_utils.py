"""Date/time column helpers (SURVEY.md §2.8 X5, Q8).

The reference converts unix epochs with ``datetime.fromtimestamp`` and
windows everything off wall-clock ``now()``; here every window takes an
explicit ``as_of`` so plans are deterministic and partition-prunable.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import DAY_SECONDS


def epoch_to_ts(epoch: Column) -> Column:
    """Unix seconds → timestamp (analyze_insta_enhanced.py:173,438,1306)."""
    return F.timestamp_seconds(epoch)


def post_hour(epoch: Column) -> Column:
    """Posting hour-of-day (analyze_insta_enhanced.py:174,439)."""
    return F.hour(F.timestamp_seconds(epoch))


def within_days_epoch(epoch: Column, as_of: dt.datetime, days: int) -> Column:
    """``taken_at >= as_of - days`` on epoch-seconds columns — the F1/F2/F3
    window predicate (analyze_insta_enhanced.py:80,1502,1282) with a pinned
    as_of. A plain range predicate → parquet min/max pushdown at scale.

    A naive ``as_of`` is interpreted as UTC (matching the UTC-pinned
    session and ``within_days_ts``): ``datetime.timestamp()`` on a naive
    value uses the OS timezone, which made the cutoff machine-dependent
    (review finding)."""
    if as_of.tzinfo is None:
        as_of = as_of.replace(tzinfo=dt.timezone.utc)
    cutoff = int(as_of.timestamp()) - days * DAY_SECONDS
    return epoch >= F.lit(cutoff)


def within_days_ts(ts: Column, as_of: dt.datetime, days: int) -> Column:
    """Same window predicate for native timestamp columns."""
    return (ts >= F.lit(as_of - dt.timedelta(days=days))) & (ts < F.lit(as_of))
