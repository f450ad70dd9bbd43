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


# ---------------------------------------------------------------------------
# tok4's REAL-SCALE merge table: 500 ordered BPE merges learned with the
# standard greedy trainer (Sennrich et al. 2016) from the deterministic
# 20k-type syllable-structured Zipf corpus in tools/tok_knee_probe.py
# (synth_word / learn_merges — rerunning that recipe reproduces this
# list bit-identically; ties break lexically). A table this size CANNOT
# ride tok1's nested-replace cascade: the Column tree blows the JVM
# driver stack from ~K=300 and DuckDB's parser dies at the same depth
# ("memory exhausted", measured SCALE_r13 §5) — tok4 exists to run a
# real-scale table through the measured fallback plan (chunked-barrier
# cascade at vocab grain) against a recursive-CTE oracle.
# Symbols never contain spaces or quotes (asserted at generation).
BPE_MERGES_500 = [
    ("s","t"), ("e","a"), ("a","i"), ("o","u"),
    ("n","g"), ("ea","t"), ("t","r"), ("n","d"),
    ("a","r"), ("e","st"), ("k","eat"), ("z","est"),
    ("s","ar"), ("zest","keat"), ("sar","zestkeat"), ("i","s"),
    ("f","ou"), ("o","s"), ("ai","s"), ("o","t"),
    ("ai","n"), ("u","r"), ("e","r"), ("a","t"),
    ("ng","m"), ("e","s"), ("st","os"), ("is","stos"),
    ("fou","ngm"), ("foungm","isstos"), ("u","st"), ("ai","t"),
    ("ai","r"), ("e","nd"), ("i","r"), ("u","n"),
    ("a","n"), ("o","n"), ("ou","t"), ("st","e"),
    ("s","ain"), ("l","ais"), ("a","s"), ("sain","lais"),
    ("ea","n"), ("ou","n"), ("ai","ng"), ("e","t"),
    ("e","l"), ("i","st"), ("u","s"), ("i","t"),
    ("ea","r"), ("i","n"), ("e","n"), ("t","end"),
    ("o","r"), ("tend","ste"), ("u","t"), ("ou","s"),
    ("u","ng"), ("ea","ng"), ("ou","r"), ("tr","ai"),
    ("z","o"), ("ea","s"), ("i","nd"), ("f","eat"),
    ("ea","l"), ("n","ust"), ("m","er"), ("ai","nd"),
    ("ou","l"), ("u","feat"), ("nust","ufeat"), ("ea","st"),
    ("ea","nd"), ("o","st"), ("s","eat"), ("ai","l"),
    ("i","ng"), ("e","ng"), ("a","st"), ("tr","es"),
    ("f","ot"), ("fou","r"), ("ou","ng"), ("z","at"),
    ("a","l"), ("tres","fot"), ("tresfot","four"), ("tresfotfour","zo"),
    ("ou","st"), ("u","nd"), ("p","on"), ("l","ot"),
    ("ai","st"), ("a","nd"), ("u","l"), ("z","un"),
    ("trai","mer"), ("traimer","ur"), ("pon","traimerur"), ("o","l"),
    ("s","ur"), ("o","ng"), ("p","is"), ("i","l"),
    ("ou","nd"), ("lot","pis"), ("a","ng"), ("f","ust"),
    ("d","ir"), ("b","aing"), ("seat","baing"), ("seatbaing","zun"),
    ("l","el"), ("g","ais"), ("st","ur"), ("o","nd"),
    ("ot","d"), ("u","tr"), ("r","ain"), ("lel","ait"),
    ("dir","lelait"), ("an","s"), ("n","o"), ("g","o"),
    ("stur","rain"), ("gais","sturrain"), ("tr","ung"), ("ist","r"),
    ("sur","at"), ("end","m"), ("zat","st"), ("es","r"),
    ("b","a"), ("ans","ais"), ("zatst","otd"), ("zatstotd","ansais"),
    ("r","e"), ("g","ot"), ("ea","m"), ("g","endm"),
    ("istr","as"), ("gendm","istras"), ("k","ind"), ("f","air"),
    ("n","ait"), ("k","utr"), ("kutr","ir"), ("fust","kutrir"),
    ("m","u"), ("s","er"), ("ost","v"), ("no","keat"),
    ("kind","v"), ("p","ai"), ("t","air"), ("m","esr"),
    ("mesr","et"), ("ur","n"), ("n","a"), ("seat","aing"),
    ("st","ai"), ("b","i"), ("r","out"), ("est","t"),
    ("z","ar"), ("it","p"), ("kindv","ing"), ("kindving","got"),
    ("kindvinggot","fair"), ("g","el"), ("un","n"), ("b","estt"),
    ("oul","nait"), ("n","at"), ("bestt","oulnait"), ("a","tr"),
    ("z","er"), ("sur","na"), ("surna","zat"), ("gel","surnazat"),
    ("l","a"), ("f","e"), ("k","ai"), ("ea","p"),
    ("k","is"), ("tr","air"), ("tr","ostv"), ("trostv","und"),
    ("n","u"), ("z","us"), ("ait","b"), ("our","v"),
    ("r","ot"), ("f","et"), ("os","b"), ("trung","oun"),
    ("t","ait"), ("st","ar"), ("z","eang"), ("t","ou"),
    ("n","eang"), ("l","ir"), ("z","ear"), ("v","ea"),
    ("trung","rout"), ("bi","trungrout"), ("st","eat"), ("k","oung"),
    ("g","al"), ("tr","e"), ("oun","pai"), ("fust","ounpai"),
    ("f","u"), ("b","eng"), ("z","et"), ("n","ar"),
    ("ean","re"), ("v","unn"), ("vunn","eanre"), ("v","ist"),
    ("r","air"), ("t","is"), ("stai","zeang"), ("itp","an"),
    ("d","out"), ("p","oun"), ("g","ait"), ("i","m"),
    ("b","and"), ("f","ail"), ("z","oung"), ("mer","fet"),
    ("itpan","merfet"), ("g","itpanmerfet"), ("k","eang"), ("f","it"),
    ("k","eam"), ("n","out"), ("keam","a"), ("n","east"),
    ("n","ind"), ("t","en"), ("t","ai"), ("f","er"),
    ("fe","f"), ("p","aind"), ("urn","el"), ("fef","urnel"),
    ("k","eand"), ("p","o"), ("tr","us"), ("st","eand"),
    ("n","ourv"), ("z","ain"), ("p","e"), ("nourv","eal"),
    ("kis","nourveal"), ("band","kisnourveal"), ("z","es"), ("b","ai"),
    ("r","es"), ("keang","gal"), ("ea","k"), ("z","ou"),
    ("r","oung"), ("l","an"), ("f","ait"), ("b","out"),
    ("tr","o"), ("v","oust"), ("zear","beng"), ("zearbeng","fail"),
    ("zat","zearbengfail"), ("d","es"), ("b","an"), ("ste","t"),
    ("l","ean"), ("s","en"), ("s","as"), ("z","ai"),
    ("koung","zer"), ("b","at"), ("n","eand"), ("m","ou"),
    ("st","ais"), ("ea","d"), ("p","er"), ("d","ai"),
    ("n","aind"), ("zar","go"), ("ear","r"), ("r","or"),
    ("k","ous"), ("tr","at"), ("l","ast"), ("paind","neast"),
    ("f","ai"), ("v","e"), ("v","o"), ("aitb","ong"),
    ("k","at"), ("f","un"), ("z","i"), ("n","e"),
    ("zes","star"), ("zesstar","fou"), ("v","an"), ("m","eat"),
    ("l","o"), ("st","est"), ("d","o"), ("ser","naind"),
    ("neand","nar"), ("neandnar","sernaind"), ("n","ail"), ("f","eng"),
    ("st","it"), ("k","u"), ("p","eat"), ("roung","trair"),
    ("z","ir"), ("s","est"), ("b","air"), ("v","oun"),
    ("m","ais"), ("ung","l"), ("s","ean"), ("rot","trai"),
    ("b","en"), ("m","o"), ("d","a"), ("i","k"),
    ("v","eas"), ("f","es"), ("l","e"), ("st","o"),
    ("f","o"), ("eap","ean"), ("b","oun"), ("nind","tou"),
    ("s","ous"), ("k","un"), ("z","on"), ("tr","ind"),
    ("g","un"), ("fu","kai"), ("k","our"), ("tr","est"),
    ("z","in"), ("v","ou"), ("r","ir"), ("m","ot"),
    ("ten","is"), ("tenis","lan"), ("rair","tenislan"), ("v","or"),
    ("z","ous"), ("z","ust"), ("zoung","t"), ("z","out"),
    ("z","a"), ("zoungt","eapean"), ("lir","zoungteapean"), ("b","end"),
    ("on","v"), ("r","ean"), ("eal","d"), ("tr","oust"),
    ("d","ait"), ("tr","eas"), ("s","air"), ("f","as"),
    ("ba","poun"), ("r","i"), ("n","ous"), ("f","ear"),
    ("ste","ng"), ("tr","or"), ("p","in"), ("p","eal"),
    ("l","u"), ("b","et"), ("tait","tair"), ("tr","ul"),
    ("z","u"), ("st","oun"), ("vist","ast"), ("vistast","fait"),
    ("vistastfait","vea"), ("b","aind"), ("st","er"), ("s","o"),
    ("g","aind"), ("f","a"), ("nail","nu"), ("tr","ir"),
    ("g","ou"), ("g","ar"), ("b","ing"), ("zun","tai"),
    ("m","ain"), ("tr","eat"), ("m","air"), ("s","aist"),
    ("z","and"), ("tr","ut"), ("a","v"), ("m","ea"),
    ("ost","fit"), ("tr","ur"), ("k","aitbong"), ("kaitbong","ostfit"),
    ("b","in"), ("z","ean"), ("r","ea"), ("k","ou"),
    ("ist","l"), ("f","osb"), ("t","e"), ("s","aing"),
    ("r","eas"), ("t","eat"), ("t","out"), ("s","ail"),
    ("mu","ban"), ("st","es"), ("p","a"), ("v","en"),
    ("s","our"), ("oul","re"), ("v","eat"), ("b","ea"),
    ("trind","baind"), ("st","air"), ("z","air"), ("k","a"),
    ("l","ou"), ("r","eat"), ("m","eng"), ("l","ai"),
    ("s","out"), ("p","i"), ("fosb","ut"), ("n","as"),
    ("m","ean"), ("s","e"), ("k","ol"), ("k","air"),
    ("g","in"), ("k","ar"), ("voust","la"), ("voustla","des"),
    ("k","ain"), ("tr","ou"), ("d","ean"), ("t","earr"),
    ("r","ou"), ("n","aing"), ("n","ai"), ("k","as"),
    ("tr","ean"), ("tearr","en"), ("m","is"), ("g","east"),
    ("b","ou"), ("n","er"), ("p","ean"), ("g","et"),
    ("b","on"), ("fou","n"), ("f","or"), ("z","or"),
    ("s","ou"), ("g","ir"), ("troust","res"), ("st","ou"),
    ("p","ast"), ("lot","troustres"), ("tr","an"), ("v","as"),
    ("st","an"), ("f","ain"), ("tr","ait"), ("k","und"),
    ("p","u"), ("z","as"), ("stais","lean"), ("staislean","ba"),
    ("k","en"), ("d","ung"), ("p","ind"), ("b","ous"),
    ("zust","as"), ("tis","zustas"), ("nat","tiszustas"), ("tr","ot"),]

# enforced, not just claimed (review finding r13): tok4's SQL twin
# interpolates these symbols into a VALUES list and into literal
# replace patterns — a quote would break the oracle text, a space
# would break the two-space encoding's separator invariant.
assert all(
    "'" not in a + b and " " not in a + b for a, b in BPE_MERGES_500
), "BPE_MERGES_500 symbols must not contain quotes or spaces"
