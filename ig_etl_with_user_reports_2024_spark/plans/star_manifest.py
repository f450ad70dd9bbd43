"""The curation end product: one manifest row per document with the
final keep/drop decision and why.

Every family in the catalog produces a *judgement* about a document —
dd11 says "duplicate of cluster X", dc2 says "collides with an eval
doc", txt8 says "too repetitive / wrong length", sp1 says "this is
held-out eval data". A training run consumes none of those directly;
it consumes the MANIFEST that folds them into a single action per doc.
cm1 is that fold, built by composing the registered catalog queries
themselves (the Spark side calls the same plan functions the driver
checks individually; the oracle nests their oracle SQL as CTEs), so
the composition is hash-checked end-to-end, not re-derived.

Decision cascade (first match wins — mirrors the priority a curation
pipeline applies):

    1. split <> 'train'      -> 'hold_out'          (eval/val data)
    2. dc2 collision         -> 'drop_contaminated' (leaked eval)
    3. dd11 kept = false     -> 'drop_duplicate'    (near-dup cluster)
    4. txt8 keep = false     -> 'drop_quality'      (filter verdict)
    5. otherwise             -> 'keep'

Scale note (shared intermediates, since r7): the composition derives
ONE digest-tagged table and ONE canon-doc shingle explode
(pin_bounded here; a checkpointed table at 100 TB) and threads them
through both subtrees — dd11 consumes the shingles directly, dc2's
per-doc band table is the canon bands re-keyed through the digest map
(identical text → identical signature, an equality not an
approximation), so the 8-md5-per-shingle signature pass runs once
over digest-DISTINCT texts only. The manifest join itself is three
doc_id-grain equi-joins, shuffle size ∝ corpus row count with
metadata-width rows, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import hash_split, sql_hash_split
from ..sources.readers import load_table

# Side-effect imports: the composed oracles below look up dd11/txt8/dc2
# in the registry at import time, so this module must be able to load
# STANDALONE (a bare `import plans.star_manifest` crashed with KeyError
# when nothing had imported the dependency modules first — review
# finding). No cycle: neither module imports star_manifest.
from . import star_pipeline  # noqa: F401
from . import star_sampling  # noqa: F401
from .registry import QUERIES, query

# Compose the oracle from the already-registered building blocks —
# import order in __spark_entry__ guarantees they exist (this module is
# imported last). Nesting a `WITH RECURSIVE` body (dd11) inside a CTE
# is valid DuckDB.
_CM1_SQL = f"""
    WITH dd10 AS ({{dd10}}),
    t8 AS ({{txt8}}),
    dc2x AS ({{dc2}}),
    base AS (
        SELECT doc_id, {sql_hash_split('doc_id')} AS split FROM documents
    )
    SELECT b.doc_id, b.split,
           CASE WHEN b.split <> 'train' THEN 'hold_out'
                WHEN c.doc_id IS NOT NULL THEN 'drop_contaminated'
                WHEN NOT d.kept THEN 'drop_duplicate'
                WHEN NOT COALESCE(t.keep, false) THEN 'drop_quality'
                ELSE 'keep' END AS action,
           d.cluster_id, t.quality_score
    FROM base b
    JOIN dd10 d ON b.doc_id = d.doc_id
    LEFT JOIN t8 t ON b.doc_id = t.doc_id
    LEFT JOIN dc2x c ON b.doc_id = c.doc_id
"""


@query(
    "cm1_corpus_manifest",
    _CM1_SQL.format(
        dd10=QUERIES["dd11_staged_keep_list"].oracle,
        txt8=QUERIES["txt8_filter_verdict"].oracle,
        dc2=QUERIES["dc2_fuzzy_decontaminate"].oracle,
    ),
    # composes dd11, whose connected-components run per-round
    # collect/localCheckpoint at CONSTRUCTION time — the bench clock
    # must start before fn, like dd6/dd8/dd10/dd11 themselves
    eager=True,
)
def cm1_corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per document: (doc_id, split, action, cluster_id,
    quality_score) under the hold_out > contaminated > duplicate >
    quality > keep cascade documented in the module docstring. Composes
    the same dd11/txt8/dc2 plan builders the registered queries run
    (dd11/dc2 via their parameterized forms so the digest + shingle
    intermediates are derived once — module docstring scale note; the
    oracle still nests the registered oracle SQL verbatim) — the
    driver's verdict on cm1 is therefore a verdict on the COMPOSITION
    of three families it also checks individually. Since r6 the dedup input is dd11's
    STAGED keep-list (digest-dedup first, then banded LSH candidates +
    candidate-restricted verify over text-distinct docs — result-
    identical to dd10, linear in duplicate multiplicity), so the
    checked end-product plan contains no quadratic stage anywhere and
    survives dup-dense corpora; dd8's exact composition remains the
    yardstick but is no longer on cm1's path.

    Dedup semantics inherited from dd11 (see its docstring): exact
    twins merge REGARDLESS of length — shingle-less duplicates
    (< 3 words, or NULL text) that dd10's LSH would leave as
    singletons are 'drop_duplicate' here, and a NULL-text doc still
    gets a manifest row (its digest is coalesced to '<null>', so the
    inner join on dd11 cannot drop it)."""
    from ..operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    base = hash_split(docs.select("doc_id"), key="doc_id")
    # SHARED intermediates (VERDICT r6 "Next round" #3): ONE digest
    # pass and ONE shingle explode feed both the dd11 and dc2
    # subtrees. The shingle/signature work runs over digest-DISTINCT
    # texts only; dc2's per-doc band table is recovered by re-keying
    # the canon bands through the digest map (identical text →
    # identical MinHash signature, so this is an equality, not an
    # approximation — the registered dc2 oracle is unchanged). The
    # pins are the toy-scale stand-in for a checkpointed table.
    from ..operators.skew import salted_join

    tagged = dd.pin_bounded(star_pipeline.digest_tagged(docs))
    canon = tagged.filter(F.col("is_canon")).select("doc_id", "text")
    sh_canon = dd.pin_bounded(dd.exploded_shingles(canon, "doc_id", "text"))
    d = star_pipeline.staged_keep_list_plan(
        spark, docs, tagged=tagged, sh_canon=sh_canon
    ).select("doc_id", "cluster_id", "kept")
    # tagged carries canon_id directly (r8 skew-safe digest stage), so
    # the band re-key is ONE canon-grain join — salted, because a
    # mega-cluster's docs all meet the same canon_id's bands.
    bands_all = salted_join(
        tagged.select("doc_id", "canon_id"),
        dd.portable_minhash_bands_from_shingles(sh_canon)
        .withColumnRenamed("doc", "canon_id"),
        on="canon_id",
        salt_by=["doc_id"],
    ).select(F.col("doc_id").alias("doc"), "band", "bucket")
    t = QUERIES["txt8_filter_verdict"].fn(spark, sf_dir).select(
        "doc_id", "keep", "quality_score"
    )
    c = (
        star_sampling.fuzzy_decontaminate_plan(spark, docs, bands=bands_all)
        .select("doc_id")
        .withColumn("_contaminated", F.lit(True))
    )
    # txt8 has no row for token-less documents (its token explode emits
    # nothing) — a LEFT join + null-as-not-keep keeps the per-document
    # contract: such docs get 'drop_quality' with a null quality_score,
    # never a missing manifest row. dd11 covers every document by
    # construction (documents LEFT JOIN reach), so its join stays inner.
    action = (
        F.when(F.col("split") != "train", "hold_out")
        .when(F.col("_contaminated").isNotNull(), "drop_contaminated")
        .when(~F.col("kept"), "drop_duplicate")
        .when(~F.coalesce(F.col("keep"), F.lit(False)), "drop_quality")
        .otherwise("keep")
    )
    return (
        base.join(d, "doc_id")
        .join(t, "doc_id", "left")
        .join(c, "doc_id", "left")
        .select(
            "doc_id",
            "split",
            action.alias("action"),
            "cluster_id",
            "quality_score",
        )
    )
