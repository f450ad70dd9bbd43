"""Engagement-rate column expressions.

The reference keeps three ER formulas alive at once (SURVEY.md §2.4
A1-A3, Q5); they differ only in the comment weight. All are plain column
arithmetic — JVM-side, whole-stage-codegen'd, no UDF.

Reference:
- A1 'engagement score'  (likes + 2*comments)/followers*100  analyze_insta_enhanced.py:433
- A2 'interaction score' (likes + 5*comments)/followers*100  analyze_insta_enhanced.py:1519-1523
- A3 plain               (likes +   comments)/followers*100  analyze_insta_enhanced.py:523,277,451
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def interaction_score(likes: Column, comments: Column, weight: int = 5) -> Column:
    """Raw score ``likes + w*comments`` (analyze_insta_enhanced.py:1519)."""
    return likes + F.lit(weight) * comments


def engagement_rate(
    likes: Column, comments: Column, followers: Column, weight: int
) -> Column:
    """``(likes + w*comments) / followers * 100`` with the reference's
    divide-by-zero guard style (max(followers, 1), cf. the max(mean, 0.1)
    guard at analyze_insta_enhanced.py:457)."""
    return (likes + F.lit(weight) * comments) / F.greatest(followers, F.lit(1)) * 100
