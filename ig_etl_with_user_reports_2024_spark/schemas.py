"""Explicit StructTypes for the reference-shaped data model (SURVEY.md §1).

The reference parses whole GraphQL documents with ~80 mostly-unused
fields (analyze_insta_enhanced.py:66-67); these schemas list only the
fields the engine consumes, which doubles as column pruning: with an
explicit read schema the JSON/parquet scan never materializes the rest —
at 100 TB that is the difference between reading ~15 columns and ~80.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(*fields: T.StructField) -> T.StructType:
    return T.StructType(list(fields))


def _f(name: str, dtype: T.DataType) -> T.StructField:
    return T.StructField(name, dtype, nullable=True)


# --- userInfo.json → data.user (fields consumed: FIXTURES.md §A1) ---------

USER_FIELDS = _s(
    _f("username", T.StringType()),
    _f("full_name", T.StringType()),
    _f("biography", T.StringType()),
    _f("follower_count", T.LongType()),
    _f("following_count", T.LongType()),
    _f("media_count", T.LongType()),
    _f("is_private", T.BooleanType()),
    _f("is_verified", T.BooleanType()),
    _f("is_business", T.BooleanType()),
    _f("category", T.StringType()),
    _f("external_url", T.StringType()),
    _f("pronouns", T.ArrayType(T.StringType())),
    _f("bio_links", T.ArrayType(_s(_f("url", T.StringType())))),
    _f("profile_pic_url", T.StringType()),
)

USER_DOC_SCHEMA = _s(
    _f("data", _s(_f("user", USER_FIELDS))),
    _f("status", T.StringType()),
)

# --- postInfo.json → ...edges[].node (fields consumed: FIXTURES.md §A2) ---

CAPTION = _s(
    _f("text", T.StringType()),
    _f("created_at", T.LongType()),
    _f("pk", T.StringType()),
    _f("has_translation", T.BooleanType()),
)

POST_NODE = _s(
    _f("id", T.StringType()),
    _f("pk", T.StringType()),
    _f("code", T.StringType()),
    _f("taken_at", T.LongType()),
    _f("caption", CAPTION),
    _f("like_count", T.LongType()),
    _f("comment_count", T.LongType()),
    _f("share_count", T.LongType()),
    _f("view_count", T.LongType()),
    _f("product_type", T.StringType()),
    _f("media_type", T.IntegerType()),
    _f("is_paid_partnership", T.BooleanType()),
    _f("sponsor_tags", T.ArrayType(_s(_f("username", T.StringType())))),
    _f("owner", _s(_f("username", T.StringType()), _f("pk", T.StringType()))),
    _f("user", _s(_f("username", T.StringType()))),
    _f(
        "coauthor_producers",
        T.ArrayType(_s(_f("username", T.StringType()))),
    ),
    _f(
        "location",
        _s(
            _f("pk", T.StringType()),
            _f("lat", T.DoubleType()),
            _f("lng", T.DoubleType()),
            _f("name", T.StringType()),
        ),
    ),
)

POST_DOC_SCHEMA = _s(
    _f(
        "data",
        _s(
            _f(
                "xdt_api__v1__feed__user_timeline_graphql_connection",
                _s(
                    _f("edges", T.ArrayType(_s(_f("node", POST_NODE)))),
                    _f("page_info", _s(_f("has_next_page", T.BooleanType()))),
                ),
            )
        ),
    ),
    _f("status", T.StringType()),
)

# --- flat creator-grain posts table (after explode) -----------------------

POSTS_FLAT_SCHEMA = _s(
    _f("username", T.StringType()),
    _f("pos", T.IntegerType()),  # arrival order within creator (Q10)
    *POST_NODE.fields,
)

# --- us_cities_database.json dimension (SURVEY.md Q1: fixed, valid) -------

CITY_SCHEMA = _s(
    _f("city", T.StringType()),
    _f("city_ascii", T.StringType()),
    _f("state_id", T.StringType()),
    _f("state_name", T.StringType()),
    _f("county_name", T.StringType()),
    _f("country", T.StringType()),
    _f("lat", T.DoubleType()),
    _f("lng", T.DoubleType()),
    _f("population", T.LongType()),
    _f("density", T.DoubleType()),
    _f("timezone", T.StringType()),
    _f("ranking", T.LongType()),
    _f("ord", T.IntegerType()),  # file order — first-match tie-break (Q10)
)
