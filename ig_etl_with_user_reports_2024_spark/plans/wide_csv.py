"""§3.2 — the jsontocsv stage: flatten the creator report into the
reference's wide CSV (jsontocsv_enhanced.py:27-321) plus the console
platform stats (:323-340).

Pure ``select`` over the report DataFrame: top-6 pivot to post{1..6}_*
columns, pipe-joined list cells, JSON-stringified struct/map cells (X8),
comma sanitation (X9), dead columns emitted empty exactly as the
reference does (Q2: age*, bio_location, primary_location_*, matched_*,
source). Cell-format note: the reference builds JSON cells with Python
``json.dumps`` (", " separators) and then strips commas; Spark's
``to_json`` is compact, so JSON cells differ by one space per element
after sanitation — no golden CSV exists to pin either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dims import NICHE_KEYWORDS

# exact header order (jsontocsv_enhanced.py:47-88)
HEADERS = (
    ["username", "full_name", "first_name", "last_name", "biography",
     "age_group", "age", "gender",
     "email", "phone_number", "follower_count", "creator_size", "creator_type",
     "tier", "business_category", "profile_picture",
     "tiktok_link", "youtube_link", "linktree_link", "other_social_media",
     "primary_social_link",
     "total_posts_last_3_months", "average_engagement_rate",
     "total_posts_analyzed", "engagement_rate_overall",
     "avg_likes", "avg_comments", "avg_shares", "avg_engagement_per_post",
     "consistency_score", "viral_posts_count", "post_frequency",
     "engagement_trend", "best_posting_time"]
    + [
        f"post{i}_{part}"
        for i in range(1, 7)
        for part in ("interaction_score", "likes", "comments", "er", "code", "url", "date")
    ]
    + ["collaboration_status", "total_collaborations", "recent_collaborations",
       "ugc_examples",
       "has_paid_partnerships", "total_sponsored_posts",
       "avg_sponsored_engagement", "avg_organic_engagement",
       "collaboration_score", "sponsor_frequency", "brand_mentions",
       "location_tags", "most_visited_locations", "location_hashtags",
       "timezone_estimate", "location_diversity_score",
       "bio_location", "primary_location_lat", "primary_location_lng",
       "primary_location_names", "primary_location_post_count",
       "matched_city", "matched_state", "matched_country", "matched_timezone",
       "location_distance_km",
       "fake_follower_score", "authenticity_score", "engagement_quality",
       "suspicious_indicators",
       "personality_traits", "profile_insights",
       "niche_overall", "niche_distribution", "niche_confidence_scores",
       "top_hashtags_90d", "top_mentions_90d", "posts_analyzed_for_hashtags",
       "hashtag_analysis_date_range",
       "creator_pricing_metrics", "estimated_roi", "impressions_visibility",
       "time_15_seconds", "time_30_seconds", "time_60_seconds",
       "time_1_to_5_minutes", "time_greater_than_5_minutes",
       "price_usd", "top_collaboration", "top_collaboration_brand_logo",
       "analyzed_date", "scraped_date", "source",
       "raw_analysis"]
)


def _empty() -> Column:
    return F.lit("")


def flatten_report(report: DataFrame) -> DataFrame:
    """Report → the reference's wide CSV columns, in header order."""
    c = F.col

    def top_post(i: int, field: str) -> Column:
        # top_6_posts is 0-indexed array of structs; missing → ''
        return F.coalesce(
            F.try_element_at(c("top_6_posts"), F.lit(i))[field].cast("string"),
            _empty(),
        )

    def pipe(col: Column) -> Column:
        return F.array_join(F.coalesce(col, F.array().cast("array<string>")), " | ")

    links = [
        F.coalesce(c("social_links")["tiktok"], _empty()).alias("tiktok_link"),
        F.coalesce(c("social_links")["youtube"], _empty()).alias("youtube_link"),
        F.coalesce(c("social_links")["linktree"], _empty()).alias("linktree_link"),
    ]
    other_social = F.array_join(
        F.filter(
            F.array(
                c("social_links")["tiktok"],
                c("social_links")["youtube"],
                c("social_links")["linktree"],
            ),
            lambda u: u.isNotNull() & (u != ""),
        ),
        " | ",
    )

    post_cols = []
    for i in range(1, 7):
        post_cols += [
            top_post(i, "interaction_score").alias(f"post{i}_interaction_score"),
            top_post(i, "likes").alias(f"post{i}_likes"),
            top_post(i, "comments").alias(f"post{i}_comments"),
            top_post(i, "engagement_rate").alias(f"post{i}_er"),
            top_post(i, "post_code").alias(f"post{i}_code"),
            # the reference builds the url from the absent 'shortcode'
            # field → 'https://www.instagram.com/p//' for present posts
            # (jsontocsv_enhanced.py:146) — preserved
            F.when(
                F.try_element_at(c("top_6_posts"), F.lit(i)).isNotNull(),
                F.lit("https://www.instagram.com/p//"),
            )
            .otherwise(_empty())
            .alias(f"post{i}_url"),
            top_post(i, "taken_at").alias(f"post{i}_date"),
        ]

    # top-10 by count desc for the pipe cells (ties: map order = the
    # first-seen order the maps were built with)
    def top10_keys(mapcol: str) -> Column:
        entries = F.map_entries(F.coalesce(c(mapcol), F.create_map()))
        with_idx = F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(entries) - 1, F.lit(0))),
            lambda i: F.struct(
                (-entries[i]["value"]).alias("neg"),
                i.alias("idx"),
                entries[i]["key"].alias("key"),
            ),
        )
        sorted_keys = F.transform(
            F.slice(F.array_sort(with_idx), 1, 10), lambda s: s["key"]
        )
        return F.when(F.size(entries) > 0, F.array_join(sorted_keys, " | ")).otherwise(
            _empty()
        )

    collab_brands = F.filter(
        F.coalesce(
            c("all_collaborations"),
            F.array().cast(
                "array<struct<name:string,count:int,is_recent:boolean,source:string>>"
            ),
        ),
        lambda x: x["source"].isin("paid_partnership", "tag"),
    )
    top_collab = F.array_join(
        F.transform(collab_brands, lambda x: x["name"]), " | "
    )
    brand_logo = F.array_join(
        F.transform(
            collab_brands,
            lambda x: F.concat(
                x["name"],
                F.lit(";https://assets.veelapp.com/"),
                F.lower(F.regexp_replace(x["name"], " ", "_")),
                F.lit(".jpg"),
            ),
        ),
        " | ",
    )

    price_usd = F.concat_ws(
        "|",
        F.concat(F.lit("TIME_15_SECONDS:"), c("time_15_seconds").cast("string")),
        F.concat(F.lit("TIME_30_SECONDS:"), c("time_30_seconds").cast("string")),
        F.concat(F.lit("TIME_60_SECONDS:"), c("time_60_seconds").cast("string")),
        F.concat(F.lit("TIME_1_TO_5_MINUTES:"), c("time_1_to_5_minutes").cast("string")),
        F.concat(
            F.lit("TIME_GREATER_THAN_5_MINUTES:"),
            c("time_greater_than_5_minutes").cast("string"),
        ),
    )

    # all 20 categories, declaration order, 0 for unmatched (:1078-1080)
    conf_full = F.map_from_arrays(
        F.array(*[F.lit(cat) for cat, _, _ in NICHE_KEYWORDS]),
        F.array(
            *[
                F.coalesce(
                    F.try_element_at(c("niche_confidence_matched"), F.lit(cat)),
                    F.lit(0),
                )
                for cat, _, _ in NICHE_KEYWORDS
            ]
        ),
    )

    pricing_struct = F.struct(
        c("estimated_roi"),
        c("impressions_visibility"),
        c("time_15_seconds"),
        c("time_30_seconds"),
        c("time_60_seconds"),
        c("time_1_to_5_minutes"),
        c("time_greater_than_5_minutes"),
    )

    flat = report.select(
        c("username"),
        F.coalesce(c("full_name"), _empty()).alias("full_name"),
        F.coalesce(c("first_name"), _empty()).alias("first_name"),
        F.coalesce(c("last_name"), _empty()).alias("last_name"),
        F.trim(F.regexp_replace(F.coalesce(c("biography"), _empty()), "\n", " ")).alias(
            "biography"
        ),
        # age fields never leave their defaults (Q2 — the analyzer emits
        # no dob); x6_c14_age_buckets carries the live derivation logic
        _empty().alias("age_group"),
        _empty().alias("age"),
        F.coalesce(c("gender"), _empty()).alias("gender"),
        F.coalesce(c("email"), _empty()).alias("email"),
        F.coalesce(c("phone_number"), _empty()).alias("phone_number"),
        c("follower_count"),
        F.coalesce(c("creator_size"), _empty()).alias("creator_size"),
        F.coalesce(c("creator_type"), _empty()).alias("creator_type"),
        F.coalesce(c("tier"), _empty()).alias("tier"),
        F.coalesce(c("business_category"), _empty()).alias("business_category"),
        F.coalesce(c("profile_picture"), _empty()).alias("profile_picture"),
        *links,
        other_social.alias("other_social_media"),
        F.concat(F.lit("https://www.instagram.com/"), c("username")).alias(
            "primary_social_link"
        ),
        c("total_posts_last_3_months"),
        c("average_engagement_rate"),
        c("n_posts").alias("total_posts_analyzed"),
        c("engagement_rate").alias("engagement_rate_overall"),
        c("avg_likes"),
        c("avg_comments"),
        c("avg_shares"),
        c("avg_engagement_per_post"),
        c("consistency_score"),
        c("viral_posts_count"),
        F.coalesce(c("post_frequency"), _empty()).alias("post_frequency"),
        F.coalesce(c("engagement_trend"), _empty()).alias("engagement_trend"),
        F.coalesce(c("best_posting_time"), _empty()).alias("best_posting_time"),
        *post_cols,
        F.coalesce(c("collaboration_status"), _empty()).alias("collaboration_status"),
        c("total_collaborations"),
        c("recent_collaborations"),
        F.coalesce(c("ugc_examples"), _empty()).alias("ugc_examples"),
        c("has_paid_partnerships"),
        c("total_sponsored_posts"),
        c("avg_sponsored_engagement"),
        c("avg_organic_engagement"),
        c("collaboration_score"),
        F.to_json(F.coalesce(c("sponsor_frequency"), F.create_map())).alias(
            "sponsor_frequency"
        ),
        pipe(c("brand_mentions")).alias("brand_mentions"),
        pipe(c("location_tags")).alias("location_tags"),
        pipe(c("most_visited_locations")).alias("most_visited_locations"),
        pipe(c("location_hashtags")).alias("location_hashtags"),
        F.coalesce(c("timezone_estimate"), _empty()).alias("timezone_estimate"),
        c("location_diversity_score"),
        # dead columns (Q2) — always empty in the reference too
        _empty().alias("bio_location"),
        _empty().alias("primary_location_lat"),
        _empty().alias("primary_location_lng"),
        _empty().alias("primary_location_names"),
        _empty().alias("primary_location_post_count"),
        _empty().alias("matched_city"),
        _empty().alias("matched_state"),
        _empty().alias("matched_country"),
        _empty().alias("matched_timezone"),
        _empty().alias("location_distance_km"),
        c("fake_follower_score"),
        c("authenticity_score"),
        F.coalesce(c("engagement_quality"), _empty()).alias("engagement_quality"),
        pipe(c("suspicious_indicators")).alias("suspicious_indicators"),
        F.to_json(c("personality_traits")).alias("personality_traits"),
        F.to_json(c("profile_insights")).alias("profile_insights"),
        F.coalesce(c("overall_niche"), _empty()).alias("niche_overall"),
        F.to_json(F.coalesce(c("niche_distribution"), F.create_map())).alias(
            "niche_distribution"
        ),
        F.to_json(conf_full).alias("niche_confidence_scores"),
        top10_keys("hashtags_last_90_days").alias("top_hashtags_90d"),
        top10_keys("mentions_last_90_days").alias("top_mentions_90d"),
        c("posts_analyzed_for_hashtags"),
        c("hashtag_analysis_date_range"),
        F.to_json(pricing_struct).alias("creator_pricing_metrics"),
        F.coalesce(c("estimated_roi"), F.lit("N/A")).alias("estimated_roi"),
        F.coalesce(c("impressions_visibility"), F.lit("N/A")).alias(
            "impressions_visibility"
        ),
        c("time_15_seconds"),
        c("time_30_seconds"),
        c("time_60_seconds"),
        c("time_1_to_5_minutes"),
        c("time_greater_than_5_minutes"),
        price_usd.alias("price_usd"),
        top_collab.alias("top_collaboration"),
        brand_logo.alias("top_collaboration_brand_logo"),
        c("analyzed_date"),
        c("scraped_date"),
        _empty().alias("source"),  # dead (Q2)
        F.to_json(F.struct(*[c(f.name) for f in report.schema.fields])).alias(
            "raw_analysis"
        ),
    )
    assert [f.name for f in flat.schema.fields] == HEADERS
    return flat


def sanitize_and_write(flat: DataFrame, path: str) -> None:
    """X9 comma sanitize on string cells + header CSV write
    (jsontocsv_enhanced.py:310-318)."""
    cols = [
        F.regexp_replace(c.name, ",", " ").alias(c.name)
        if c.dataType.typeName() == "string"
        else F.col(c.name)
        for c in flat.schema.fields
    ]
    flat.select(*cols).write.mode("overwrite").option("header", True).csv(path)


def platform_stats(report: DataFrame) -> DataFrame:
    """A9 — the console summary (jsontocsv_enhanced.py:323-340): creators
    with tiktok / youtube / linktree links, multi-platform, total."""
    has = lambda k: F.when(  # noqa: E731
        F.coalesce(F.col("social_links")[k], F.lit("")) != "", 1
    ).otherwise(0)
    n_platforms = has("tiktok") + has("youtube") + has("linktree")
    return report.agg(
        F.sum(has("tiktok")).alias("creators_with_tiktok"),
        F.sum(has("youtube")).alias("creators_with_youtube"),
        F.sum(has("linktree")).alias("creators_with_linktree"),
        F.sum(F.when(n_platforms >= 2, 1).otherwise(0)).alias("multi_platform"),
        F.count("*").alias("total_creators"),
    )
