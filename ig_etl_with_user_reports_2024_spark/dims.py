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

from .functions.local_dim import local_dim

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
    return local_dim(spark, rows, "category string, cat_ord int, keyword string")


def gender_keyword_dim(spark: SparkSession) -> DataFrame:
    rows = [(g, p, k) for g, p, ks in GENDER_KEYWORDS for k in ks]
    return local_dim(spark, rows, "gender string, gprio int, keyword string")


def pricing_dim(spark: SparkSession) -> DataFrame:
    return local_dim(
        spark,
        PRICING,
        "creator_type string, tier string, base_price double, roi string, "
        "impressions string",
    )


def platform_dim(spark: SparkSession) -> DataFrame:
    return local_dim(spark, PLATFORM_DOMAINS, "platform string, domain string")


# ---------------------------------------------------------------------------
# tok4's REAL-SCALE merge table: 500 ordered BPE merges learned with the
# standard greedy trainer (Sennrich et al. 2016) from the deterministic
# 100k-type syllable-structured Zipf corpus in tools/tok_knee_probe.py
# (synth_word / learn_merges_fast — rerunning that recipe, `python
# tools/gen_bpe_merges.py --k 500`, reproduces this list bit-identically;
# ties break lexically; the corpus grew 20k→100k types in r15 so ONE
# trajectory reaches 50k rules — tok6 — and all three shipped tables are
# its prefixes, asserted in dims_bpe / dims_bpe50k). A table this size CANNOT
# ride tok1's nested-replace cascade: the Column tree blows the JVM
# driver stack from ~K=300 and DuckDB's parser dies at the same depth
# ("memory exhausted", measured SCALE_r13 §5) — tok4 exists to run a
# real-scale table through the measured fallback plan (chunked-barrier
# cascade at vocab grain) against a recursive-CTE oracle.
# Symbols never contain spaces or quotes (asserted at generation).
BPE_MERGES_500 = [
    ("s","t"), ("a","i"), ("e","a"), ("o","u"),
    ("n","g"), ("t","r"), ("n","d"), ("ea","t"),
    ("a","r"), ("e","st"), ("k","eat"), ("z","est"),
    ("s","ar"), ("zest","keat"), ("sar","zestkeat"), ("i","s"),
    ("f","ou"), ("o","s"), ("o","t"), ("ai","s"),
    ("u","r"), ("ai","n"), ("e","r"), ("a","t"),
    ("e","s"), ("ai","t"), ("ng","m"), ("u","st"),
    ("ai","r"), ("st","os"), ("i","r"), ("is","stos"),
    ("fou","ngm"), ("foungm","isstos"), ("u","n"), ("e","nd"),
    ("a","n"), ("o","n"), ("ou","t"), ("e","t"),
    ("a","s"), ("ea","n"), ("ou","n"), ("u","s"),
    ("ai","ng"), ("e","l"), ("s","ain"), ("i","st"),
    ("e","n"), ("i","t"), ("ea","r"), ("l","ais"),
    ("sain","lais"), ("o","r"), ("i","n"), ("u","t"),
    ("ou","r"), ("ou","s"), ("st","e"), ("ea","s"),
    ("u","ng"), ("ea","ng"), ("i","nd"), ("t","end"),
    ("ea","l"), ("ai","nd"), ("tend","ste"), ("ea","st"),
    ("z","o"), ("ai","l"), ("o","st"), ("ou","l"),
    ("ea","nd"), ("a","st"), ("tr","ai"), ("i","ng"),
    ("f","eat"), ("e","ng"), ("a","l"), ("ou","ng"),
    ("n","ust"), ("m","er"), ("ou","st"), ("u","nd"),
    ("u","feat"), ("nust","ufeat"), ("ai","st"), ("u","l"),
    ("s","eat"), ("a","nd"), ("tr","es"), ("f","ot"),
    ("fou","r"), ("o","l"), ("z","at"), ("i","l"),
    ("o","ng"), ("tres","fot"), ("tresfot","four"), ("tresfotfour","zo"),
    ("p","on"), ("ou","nd"), ("a","ng"), ("l","ot"),
    ("z","un"), ("s","ur"), ("trai","mer"), ("traimer","ur"),
    ("pon","traimerur"), ("o","nd"), ("p","is"), ("d","ir"),
    ("lot","pis"), ("f","ust"), ("b","aing"), ("baing","zun"),
    ("seat","baingzun"), ("u","tr"), ("g","ais"), ("st","ur"),
    ("l","el"), ("r","ain"), ("ot","d"), ("an","s"),
    ("lel","ait"), ("dir","lelait"), ("g","o"), ("ist","r"),
    ("n","o"), ("tr","ung"), ("stur","rain"), ("gais","sturrain"),
    ("b","a"), ("end","m"), ("sur","at"), ("es","r"),
    ("zat","st"), ("r","e"), ("g","ot"), ("ans","ais"),
    ("zatst","otd"), ("zatstotd","ansais"), ("f","air"), ("k","ind"),
    ("n","ait"), ("g","endm"), ("istr","as"), ("gendm","istras"),
    ("m","u"), ("s","er"), ("k","utr"), ("p","ai"),
    ("kutr","ir"), ("fust","kutrir"), ("ost","v"), ("n","a"),
    ("t","air"), ("b","i"), ("no","keat"), ("kind","v"),
    ("ur","n"), ("m","esr"), ("st","ai"), ("r","out"),
    ("z","ar"), ("mesr","et"), ("a","tr"), ("b","est"),
    ("it","p"), ("seat","aing"), ("t","oul"), ("g","el"),
    ("v","un"), ("f","e"), ("n","at"), ("k","ai"),
    ("ing","got"), ("kindv","inggot"), ("kindvinggot","fair"), ("l","a"),
    ("ea","p"), ("z","er"), ("n","ean"), ("k","is"),
    ("n","u"), ("v","ea"), ("tr","air"), ("toul","nait"),
    ("best","toulnait"), ("z","us"), ("f","et"), ("t","ou"),
    ("z","ear"), ("sur","na"), ("surna","zat"), ("gel","surnazat"),
    ("st","ar"), ("tr","e"), ("l","ir"), ("our","v"),
    ("f","u"), ("t","ait"), ("ait","b"), ("z","eang"),
    ("tr","ostv"), ("trostv","und"), ("n","eang"), ("st","eat"),
    ("z","et"), ("g","al"), ("k","oung"), ("trung","oun"),
    ("n","ar"), ("ea","m"), ("os","b"), ("b","eng"),
    ("trung","rout"), ("bi","trungrout"), ("p","oun"), ("i","m"),
    ("r","air"), ("t","is"), ("d","out"), ("r","ot"),
    ("v","ist"), ("p","o"), ("oun","pai"), ("fust","ounpai"),
    ("g","ait"), ("f","it"), ("f","er"), ("p","e"),
    ("n","out"), ("nean","re"), ("t","ai"), ("vun","neanre"),
    ("b","ai"), ("z","oung"), ("z","ou"), ("k","eang"),
    ("b","and"), ("f","ail"), ("tr","us"), ("t","en"),
    ("n","east"), ("stai","zeang"), ("tr","o"), ("itp","an"),
    ("ea","k"), ("n","ind"), ("z","ain"), ("z","es"),
    ("z","ai"), ("p","aind"), ("d","ai"), ("mer","fet"),
    ("itpan","merfet"), ("g","itpanmerfet"), ("r","es"), ("m","ou"),
    ("d","o"), ("k","eand"), ("b","out"), ("f","ait"),
    ("st","eand"), ("d","es"), ("f","ai"), ("l","an"),
    ("b","at"), ("v","e"), ("fe","f"), ("v","o"),
    ("p","er"), ("z","i"), ("l","ean"), ("s","en"),
    ("urn","el"), ("fef","urnel"), ("st","ais"), ("r","oung"),
    ("v","oust"), ("tr","at"), ("k","u"), ("k","ous"),
    ("r","i"), ("n","e"), ("r","or"), ("n","ourv"),
    ("l","o"), ("nourv","eal"), ("kis","nourveal"), ("band","kisnourveal"),
    ("k","at"), ("b","an"), ("r","en"), ("ea","d"),
    ("v","an"), ("f","o"), ("l","e"), ("f","un"),
    ("m","o"), ("keang","gal"), ("n","eand"), ("st","et"),
    ("d","a"), ("n","aind"), ("l","ast"), ("b","air"),
    ("t","ear"), ("s","as"), ("zear","beng"), ("zearbeng","fail"),
    ("zat","zearbengfail"), ("v","ou"), ("st","o"), ("z","ir"),
    ("b","en"), ("st","it"), ("v","oun"), ("st","est"),
    ("tr","ot"), ("m","eat"), ("koung","zer"), ("m","ais"),
    ("f","es"), ("b","oun"), ("z","a"), ("k","un"),
    ("f","eng"), ("i","k"), ("n","ail"), ("p","eat"),
    ("s","ous"), ("v","eas"), ("s","ean"), ("zar","go"),
    ("z","on"), ("g","un"), ("r","ir"), ("k","our"),
    ("z","ous"), ("z","u"), ("s","est"), ("f","ear"),
    ("paind","neast"), ("tr","ind"), ("z","in"), ("v","or"),
    ("l","u"), ("aitb","ong"), ("f","a"), ("k","ou"),
    ("z","out"), ("tr","est"), ("g","ou"), ("star","fou"),
    ("zes","starfou"), ("tr","or"), ("b","ea"), ("f","as"),
    ("tr","eas"), ("s","air"), ("m","ea"), ("ser","naind"),
    ("neand","nar"), ("neandnar","sernaind"), ("p","in"), ("d","ait"),
    ("ung","l"), ("b","et"), ("s","o"), ("z","ust"),
    ("m","ot"), ("tr","ur"), ("p","a"), ("roung","trair"),
    ("tr","ou"), ("r","ean"), ("n","ous"), ("p","i"),
    ("tr","ir"), ("p","eal"), ("tr","oust"), ("d","un"),
    ("g","a"), ("rot","trai"), ("v","en"), ("t","e"),
    ("s","e"), ("k","a"), ("m","ain"), ("b","end"),
    ("st","er"), ("st","oun"), ("g","ar"), ("s","on"),
    ("eap","ean"), ("l","ou"), ("tr","ut"), ("v","aind"),
    ("m","air"), ("tr","ul"), ("nind","tou"), ("ste","ng"),
    ("tr","eat"), ("b","in"), ("z","ean"), ("k","ar"),
    ("l","ai"), ("b","ou"), ("s","ou"), ("r","ea"),
    ("z","air"), ("fu","kai"), ("m","ean"), ("r","eas"),
    ("tr","ean"), ("v","eat"), ("f","or"), ("st","es"),
    ("s","our"), ("st","ou"), ("st","air"), ("p","u"),
    ("n","ai"), ("r","ou"), ("is","lan"), ("eal","d"),
    ("ten","islan"), ("rair","tenislan"), ("g","aind"), ("t","out"),
    ("b","aind"), ("g","in"), ("n","as"), ("zoung","t"),
    ("tr","ait"), ("m","e"), ("k","ain"), ("k","i"),
    ("t","eat"), ("g","ir"), ("zoungt","eapean"), ("lir","zoungteapean"),
    ("tr","ea"), ("b","on"), ("z","and"), ("b","ing"),
    ("k","air"), ("s","aist"), ("m","is"), ("v","as"),
    ("z","or"), ("s","out"), ("t","o"), ("p","ean"),
    ("k","as"), ("v","i"), ("b","o"), ("ba","poun"),
    ("z","e"), ("tr","a"), ("g","et"), ("f","ain"),
    ("fou","n"), ("p","ou"), ("s","ail"), ("s","aing"),
    ("m","ar"), ("k","en"), ("d","u"), ("z","as"),
    ("tait","tair"), ("r","eat"), ("tr","u"), ("b","ar"),
    ("f","i"), ("st","u"), ("b","ous"), ("tr","an"),
    ("k","ol"), ("st","an"), ("d","ean"), ("st","oul"),
    ("b","un"), ("z","eat"), ("v","in"), ("vist","ast"),
    ("vistast","fait"), ("vistastfait","vea"), ("k","or"), ("b","ait"),
    ("g","east"), ("ist","l"), ("v","u"), ("v","ai"),
    ("k","o"), ("k","ait"), ("l","out"), ("m","eng"),]

# enforced, not just claimed (review finding r13): tok4's SQL twin
# interpolates these symbols into a VALUES list and into literal
# replace patterns — a quote would break the oracle text, a space
# would break the two-space encoding's separator invariant.
assert all(
    "'" not in a + b and " " not in a + b for a, b in BPE_MERGES_500
), "BPE_MERGES_500 symbols must not contain quotes or spaces"
