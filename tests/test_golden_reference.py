"""Golden end-to-end parity check (SURVEY.md §5.3): run the Spark
pipeline over the reference's own 9 checked-in creator directories with
``as_of`` pinned to the golden run timestamp and diff wall-clock-stable
fields against /root/reference/analyzed.json.

Skipped automatically when the reference checkout is absent.

Known, accepted divergences (documented, not asserted):
- ``best_posting_time`` / hour histograms: the reference converts epochs
  with datetime.fromtimestamp in the RUN MACHINE's local timezone; this
  engine is pinned to UTC (Q8).
- 90-day-window quantities can flip for posts within hours of the
  cutoff (the golden run's exact second is only known to ±1s).
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

REF = "/root/reference"
# analyzed.json analysis_date is the run machine's wall clock; the hour
# histograms reveal the machine ran at UTC+5:45 (Asia/Kathmandu)
GOLDEN_TZ_OFFSET_MIN = 345
GOLDEN_AS_OF = dt.datetime(2025, 9, 7, 4, 26, 50) - dt.timedelta(
    minutes=GOLDEN_TZ_OFFSET_MIN
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF}/analyzed.json"), reason="reference checkout absent"
)


@pytest.fixture(scope="module")
def golden():
    with open(f"{REF}/analyzed.json") as fh:
        return {c["username"]: c for c in json.load(fh)["creators"]}


@pytest.fixture(scope="module")
def report_rows(spark):
    from ig_etl_with_user_reports_2024_spark.plans import creator_report as cr

    users = cr.load_users(spark, f"{REF}/*/userInfo.json")
    posts = cr.load_posts(spark, f"{REF}/*/postInfo.json")
    df = cr.creator_report(
        spark,
        users,
        posts,
        as_of=GOLDEN_AS_OF,
        python_rounding=True,
        tz_offset_min=GOLDEN_TZ_OFFSET_MIN,
    )
    return {r["username"]: r.asDict(recursive=True) for r in df.collect()}


def _overlap(golden, report_rows):
    return sorted(set(golden) & set(report_rows))


def test_all_checked_in_creators_analyzed(report_rows, golden):
    names = _overlap(golden, report_rows)
    assert len(names) >= 8, f"only {names} overlap"


def test_identity_and_classifiers(report_rows, golden):
    for u in _overlap(golden, report_rows):
        g, r = golden[u], report_rows[u]
        assert r["follower_count"] == g["follower_count"], u
        assert r["creator_size"] == g["creator_size"], u
        assert r["tier"] == g["tier"], u
        assert r["creator_type"] == g["creator_type"], u
        assert r["gender"] == g["gender"], u
        assert r["first_name"] == g["first_name"], u
        assert r["last_name"] == g["last_name"], u
        assert r["email"] == g["email"], u
        assert r["phone_number"] == g["phone_number"], u
        assert r["ig_account_type"] == g["ig_account_type"], u
        assert r["collaboration_status"] == g["collaboration_status"], u


def test_engagement_metrics(report_rows, golden):
    for u in _overlap(golden, report_rows):
        g, r = golden[u], report_rows[u]
        em = g["engagement_metrics"]
        assert r["n_posts"] == em["total_posts_analyzed"], u
        assert r["avg_likes"] == em["avg_likes"], u
        assert r["avg_comments"] == em["avg_comments"], u
        assert r["avg_shares"] == em["avg_shares"], u
        assert r["avg_engagement_per_post"] == em.get("avg_engagement_per_post"), u
        assert r["engagement_rate"] == pytest.approx(em["engagement_rate"]), u
        if "consistency_score" in em:
            assert r["consistency_score"] == pytest.approx(
                em["consistency_score"]
            ), u
        assert r["viral_posts_count"] == em.get("viral_posts_count", 0), u
        if em.get("post_frequency"):
            assert r["post_frequency"] == em["post_frequency"], u
        if em.get("engagement_trend") and r["engagement_trend"]:
            assert r["engagement_trend"] == em["engagement_trend"], u
        # latest-6 (not window-dependent)
        got = {f"Post{i}": r[f"post{i}_er"] for i in range(1, 7) if r[f"post{i}_er"] is not None}
        assert got == pytest.approx(em.get("latest_posts_er", {})), u
        assert r["avg_latest_posts_er"] == pytest.approx(
            em.get("avg_latest_posts_er", 0)
        ), u


def test_topk_window_metrics(report_rows, golden):
    for u in _overlap(golden, report_rows):
        g, r = golden[u], report_rows[u]
        assert r["average_engagement_rate"] == pytest.approx(
            g["average_engagement_rate"]
        ), u
        assert r["total_posts_last_3_months"] == g["total_posts_last_3_months"], u
        assert (r["hashtags_last_90_days"] or {}) == g["hashtags_last_90_days"], u
        assert (r["mentions_last_90_days"] or {}) == g["mentions_last_90_days"], u


def test_fake_follower_and_pricing(report_rows, golden):
    for u in _overlap(golden, report_rows):
        g, r = golden[u], report_rows[u]
        ff = g["fake_follower_analysis"]
        assert r["fake_follower_score"] == ff["fake_follower_score"], u
        assert r["authenticity_score"] == ff["authenticity_score"], u
        assert r["engagement_quality"] == ff["engagement_quality"], u
        pm = g["creator_pricing_metrics"]
        for k in (
            "time_15_seconds",
            "time_30_seconds",
            "time_60_seconds",
            "time_1_to_5_minutes",
            "time_greater_than_5_minutes",
        ):
            assert r[k] == pm[k], (u, k)
        assert r["estimated_roi"] == pm["estimated_roi"], u
        assert r["impressions_visibility"] == pm["impressions_visibility"], u


def test_niche_and_social_links(report_rows, golden):
    for u in _overlap(golden, report_rows):
        g, r = golden[u], report_rows[u]
        nd = g["niche_data"]
        assert r["overall_niche"] == nd["overall_niche"], u
        got_dist = r["niche_distribution"] or {}
        assert got_dist == pytest.approx(nd["distribution"]), u
        sl = g["social_links"]
        assert r["social_links"]["tiktok"] == sl["tiktok"], u
        assert r["social_links"]["youtube"] == sl["youtube"], u
        assert r["social_links"]["linktree"] == sl["linktree"], u


def test_personality_and_insights(report_rows, golden):
    for u in _overlap(golden, report_rows):
        g, r = golden[u], report_rows[u]
        assert r["personality_traits"] == g["personality_traits"], u
        assert r["profile_insights"] == g["profile_insights"], u


def test_partnership_data(report_rows, golden):
    for u in _overlap(golden, report_rows):
        g, r = golden[u], report_rows[u]
        pd_ = g["partnership_data"]
        assert r["has_paid_partnerships"] == pd_["has_paid_partnerships"], u
        assert r["total_sponsored_posts"] == pd_["total_sponsored_posts"], u
        assert (r["sponsor_frequency"] or {}) == pd_["sponsor_frequency"], u
        assert set(r["brand_mentions"] or []) == set(pd_["brand_mentions"]), u
        assert r["avg_sponsored_engagement"] == pytest.approx(
            pd_["avg_sponsored_engagement"]
        ), u
        assert r["avg_organic_engagement"] == pytest.approx(
            pd_["avg_organic_engagement"]
        ), u
        got_cmp = r["engagement_comparison"] or {}
        assert got_cmp == (pd_["engagement_comparison"] or {}), u
        assert r["collaboration_score"] == pd_["collaboration_score"], u


def test_collaborations_exact(report_rows, golden):
    for u in _overlap(golden, report_rows):
        g, r = golden[u], report_rows[u]
        assert r["total_collaborations"] == g["total_collaborations"], u
        assert r["recent_collaborations"] == g["recent_collaborations"], u
        got = r["all_collaborations"] or []
        assert got == g["top_collaboration"], u
        assert r["ugc_examples"] == g["ugc_examples"], u


def test_top6_posts_list(report_rows, golden):
    for u in _overlap(golden, report_rows):
        g, r = golden[u], report_rows[u]
        got, want = r["top_6_posts"] or [], g["top_6_posts"]
        assert len(got) == len(want), u
        for a, b in zip(got, want):
            for k in ("interaction_score", "likes", "comments", "post_code"):
                assert a[k] == b[k], (u, k)
            assert a["engagement_rate"] == pytest.approx(b["engagement_rate"]), u
            assert a["taken_at"] == b["taken_at"], u


def test_location_analysis(report_rows, golden):
    for u in _overlap(golden, report_rows):
        g, r = golden[u], report_rows[u]
        la = g["location_analysis"]
        assert (r["location_tags"] or []) == la["location_tags"], u
        assert (r["most_visited_locations"] or []) == la["most_visited_locations"], u
        assert (r["travel_frequency"] or 0) == la["travel_frequency"], u
        assert (r["location_diversity_score"] or 0) == la["location_diversity_score"], u
        assert set(r["location_hashtags"] or []) == set(la["location_hashtags"]), u
        assert (r["matched_us_cities"] or []) == la["matched_us_cities"], u
        got_pattern = {int(k): v for k, v in (r["posting_timezone_pattern"] or {}).items()}
        want_pattern = {int(k): v for k, v in la["posting_timezone_pattern"].items()}
        assert got_pattern == want_pattern, u
        assert r["timezone_estimate"] == la["timezone_estimate"], u


def test_report_metadata_fields(report_rows, golden):
    for u in _overlap(golden, report_rows):
        g, r = golden[u], report_rows[u]
        assert r["posts_analyzed_for_hashtags"] == g["posts_analyzed_for_hashtags"], u
        assert r["best_posting_time"] == g["engagement_metrics"].get(
            "best_posting_time", r["best_posting_time"]
        ), u
        assert r["hashtag_analysis_date_range"] == g["hashtag_analysis_date_range"], u
        assert r["profile_picture"] == g["profile_picture"], u
        assert r["business_category"] == (g["business_category"] or ""), u
        assert r["analyzed_date"] == g["analyzed_date"], u
