"""Literal dimension tables (SURVEY.md §2.9 / §4: constant folding).

The reference inlines every keyword list and the pricing table as code
(analyze_insta_enhanced.py:965-986, :894-954, :581-586, :727-746).
Here they are broadcast-able DataFrames with explicit declaration-order
columns, because the reference's argmax tie-breaks follow dict/list
declaration order (Q9) — the order must be data, not an accident.

The vocabularies and thresholds are the reference's exact tables,
transcribed as data (each cites its source lines) so the engine can
hash-match the reference's golden outputs; the engine treats them as
swappable configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --- C9 niche categories — exact 20-category keyword table from the
# reference (analyze_insta_enhanced.py:965-986), declaration order kept
# as data for the Q9 argmax tie-break.
NICHE_KEYWORDS: list[tuple[str, int, list[str]]] = [
    ("Fashion & Style", 1, ["fashion", "style", "outfit", "clothing", "model", "dress", "accessories", "fashionista", "ootd", "stylist", "boutique", "wardrobe", "trend", "chic"]),
    ("Beauty", 2, ["makeup", "skincare", "beauty", "cosmetics", "haircare", "nails", "glam", "makeupartist", "beautician", "mua", "beautyblogger", "makeover", "cosmetic"]),
    ("Lifestyle", 3, ["lifestyle", "life", "daily", "routine", "inspiration", "motivation", "blogger", "lifestyleblogger", "living", "vibes", "mindful", "wellness"]),
    ("Fitness", 4, ["fitness", "workout", "gym", "exercise", "health", "training", "muscle", "fit", "fitnessmotivation", "trainer", "bodybuilding", "crossfit", "yoga", "pilates"]),
    ("Health", 5, ["health", "wellness", "nutrition", "diet", "healthy", "mindfulness", "meditation", "nutritionist", "dietitian", "wellbeing", "mental", "holistic"]),
    ("Food", 6, ["food", "cooking", "recipe", "chef", "foodie", "cuisine", "baking", "delicious", "yummy", "foodblogger", "culinary", "restaurant", "eats", "tasty", "kitchen"]),
    ("Travel", 7, ["travel", "wanderlust", "adventure", "explore", "tourism", "vacation", "trip", "journey", "destination", "traveler", "backpacker", "nomad", "wanderer", "explorer"]),
    ("Technology", 8, ["technology", "tech", "gadget", "device", "software", "app", "smartphone", "computer", "digital", "innovation", "startup", "coding", "developer", "geek"]),
    ("Gaming", 9, ["gaming", "gamer", "videogames", "game", "esports", "playstation", "xbox", "nintendo", "streamer", "twitch", "console", "pc", "mobile", "rpg"]),
    ("Entertainment", 10, ["entertainment", "movie", "film", "tv", "television", "cinema", "streaming", "actor", "actress", "celebrity", "show", "series", "netflix"]),
    ("Comedy", 11, ["comedy", "funny", "humor", "laugh", "joke", "prank", "skit", "comedian", "hilarious", "meme", "viral", "comic", "witty"]),
    ("Education", 12, ["education", "learning", "school", "knowledge", "teach", "study", "student", "lesson", "teacher", "tutor", "academic", "university", "college", "learn"]),
    ("Business", 13, ["business", "entrepreneur", "marketing", "startup", "success", "money", "ceo", "founder", "corporate", "leadership", "boss", "hustle", "businesswoman"]),
    ("Finance", 14, ["finance", "investing", "stocks", "cryptocurrency", "money", "financial", "wealth", "investor", "trader", "bitcoin", "crypto", "forex", "portfolio"]),
    ("Art & Design", 15, ["art", "artist", "drawing", "painting", "creative", "design", "illustration", "designer", "painter", "sculptor", "gallery", "artwork", "canvas"]),
    ("Music", 16, ["music", "musician", "song", "singer", "artist", "band", "concert", "producer", "dj", "songwriter", "vocalist", "guitarist", "pianist", "rapper"]),
    ("Dance", 17, ["dance", "dancer", "choreography", "ballet", "hiphop", "contemporary", "ballroom", "choreographer", "studio", "performance", "movement"]),
    ("Sports", 18, ["sports", "athlete", "basketball", "football", "soccer", "baseball", "tennis", "coach", "player", "team", "competition", "championship", "olympics"]),
    ("Pets & Animals", 19, ["pets", "dog", "cat", "animal", "puppy", "kitten", "wildlife", "veterinarian", "petcare", "rescue", "adoption", "dogtrainer", "animallover"]),
    ("Family & Parenting", 20, ["family", "parenting", "mom", "dad", "children", "kids", "baby", "mother", "father", "parent", "motherhood", "fatherhood", "toddler"]),
]

# --- C13 sponsored-post caption indicators (exact:
# analyze_insta_enhanced.py:581-586) --------------------------------------
SPONSOR_CAPTION_TERMS = [
    "#ad", "#sponsored", "#partnership", "#collab", "#pr",
    "paid partnership", "sponsored by", "in collaboration with",
    "thanks to", "gifted by", "promo code", "discount code",
    "affiliate link", "brand ambassador", "#brandambassador",
]

# --- C13 bio partnership indicators (exact: :557-561) ---------------------
SPONSOR_BIO_TERMS = [
    "brand ambassador", "sponsored", "partnership", "collab", "pr",
    "affiliate", "discount code", "promo code", "brand partner",
    "collaboration", "paid partnership", "#ad", "#sponsored",
]

# --- C2 UGC-creator keywords (exact: analyze_insta_enhanced.py:842-846) ---
UGC_KEYWORDS = [
    "ugc", "ugccreator", "ugc creator", "user generated content",
    "user-generated content", "content creator", "brand creator",
    "ugc content", "product creator",
]

# --- C7 gender indicators (priority: Female > Male > Non-binary, Q9) ------
# exact pronoun values (analyze_insta_enhanced.py:733-746)
PRONOUNS_FEMALE = ["she/her", "she", "her"]
PRONOUNS_MALE = ["he/him", "he", "him"]
PRONOUNS_NB = ["they/them", "they", "them", "ze/zir", "xe/xem", "it/its"]

# exact indicator lists (analyze_insta_enhanced.py:758-772); semantics are
# SUBSTRING containment counts ('he' matches inside 'the' — reference
# quirk preserved), tie order Female > Male > Non-binary (:780-788, Q9)
GENDER_KEYWORDS: list[tuple[str, int, list[str]]] = [
    ("Female", 1, ["she/her", "she", "her", "woman", "girl", "female", "lady",
                   "mom", "mother", "wife", "daughter", "sister", "girlfriend",
                   "actress", "queen", "princess", "mama", "mum", "mummy",
                   "mommy", "mrs", "ms", "miss"]),
    ("Male", 2, ["he/him", "he", "him", "man", "boy", "male", "guy", "dad",
                 "father", "husband", "son", "brother", "boyfriend", "actor",
                 "king", "prince", "papa", "daddy", "mr"]),
    ("Non-binary", 3, ["they/them", "them", "they", "non-binary", "nonbinary",
                       "nb", "enby", "genderfluid", "genderqueer", "agender",
                       "ze/zir", "xe/xem"]),
]

# --- C8 account-type keywords (exact: analyze_insta_enhanced.py:1834-1841)
BRAND_KEYWORDS = ["brand", "store", "shop", "company", "co.", "official",
                  "boutique", "ecommerce", "retail"]
CREATOR_KEYWORDS = ["creator", "influencer", "content", "artist",
                    "photographer", "videographer", "ugc"]
SHOP_URL_KEYWORDS = ["shop", "store", "etsy", "amazon", "buy", "products"]

# --- platform detection (A9, social links) --------------------------------
# (reference extracts only tiktok/youtube/linktree, :812-817; the rest
# are an engine extension)
PLATFORM_DOMAINS: list[tuple[str, str]] = [
    ("tiktok", "tiktok.com"),
    ("tiktok", "tiktok.app"),
    ("youtube", "youtube.com"),
    ("youtube", "youtu.be"),
    ("linktree", "linktr.ee"),
    ("twitter", "twitter.com"),
    ("twitter", "x.com"),
    ("facebook", "facebook.com"),
    ("snapchat", "snapchat.com"),
    ("pinterest", "pinterest.com"),
    ("twitch", "twitch.tv"),
]

# --- C3 pricing — exact per-(type,tier) table
# (analyze_insta_enhanced.py:894-954): (type, tier, base, roi, impressions)
PRICING: list[tuple[str, str, float, str, str]] = [
    ("UGC Creator", "Beginner", 100.0, "3×–6×", "30K"),
    ("UGC Creator", "Experienced", 300.0, "5×–9×", "85K"),
    ("Social Media Influencer", "1K-10K", 150.0, "6×–10×", "165K"),
    ("Social Media Influencer", "10K-50K", 500.0, "6×–10×", "300K"),
    ("Social Media Influencer", "50K-500K", 2500.0, "4×–7×", "1M"),
    ("Social Media Influencer", "500K-1M+", 4000.0, "3×–6×", "3.2M"),
]

# video-length price points = Python round(mult*base) → bround 0dp
# (field names from the reference dict :896-902)
PRICE_MULTIPLIERS = [
    ("time_15_seconds", 0.4),
    ("time_30_seconds", 0.6),
    ("time_60_seconds", 1.0),
    ("time_1_to_5_minutes", 1.333),
    ("time_greater_than_5_minutes", 2.0),
]

# --- F8 mention stoplist (exact: analyze_insta_enhanced.py:1600) ----------
MENTION_STOPLIST = [
    "the", "and", "for", "from", "with", "this", "that", "have", "has",
    "her", "his", "our", "my", "your", "their", "its", "as", "at", "by",
    "to", "in", "on", "of", "or", "if",
]


def niche_dim(spark: SparkSession) -> DataFrame:
    rows = [(c, o, k) for c, o, ks in NICHE_KEYWORDS for k in ks]
    return spark.createDataFrame(rows, "category string, cat_ord int, keyword string")


def gender_keyword_dim(spark: SparkSession) -> DataFrame:
    rows = [(g, p, k) for g, p, ks in GENDER_KEYWORDS for k in ks]
    return spark.createDataFrame(rows, "gender string, gprio int, keyword string")


def pricing_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        PRICING,
        "creator_type string, tier string, base_price double, roi string, "
        "impressions string",
    )


def platform_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(PLATFORM_DOMAINS, "platform string, domain string")
