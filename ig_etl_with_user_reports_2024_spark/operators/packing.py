"""Sequence packing for LLM pretraining — concat-and-chop offsets.

The standard pretraining data layout concatenates the token stream of
the whole corpus (in a fixed deterministic document order) and chops it
into fixed-length training sequences; every document therefore owns a
global token offset, and spans one or more sequences. Computing those
offsets is a GLOBAL PREFIX SUM — the naive Spark expression,

    sum(n_tokens) over (order by doc_id rows unbounded preceding)

is a scale-killer: a window with ORDER BY and no PARTITION BY plans an
``Exchange SinglePartition`` and funnels the entire corpus through one
task. This operator computes the identical result with the classic
two-level decomposition instead:

1. range-bucket the ids (``doc_id div bucket_width`` — order-preserving
   across buckets, no shuffle needed to ASSIGN the bucket),
2. per-bucket running sum (window PARTITIONED by bucket → full cluster
   width),
3. per-bucket totals → exclusive running sum over the bucket table
   (metadata-sized: one row per bucket; size buckets so this stays
   ~10^5-10^6 rows at the target corpus),
4. broadcast the bucket offsets back and add.

Steps 2 and 4 touch the data at full parallelism; the only serial pass
is over the tiny bucket table. The result is bit-identical to the
single-window form because bucket order extends document order.

No counterpart in the reference (its corpus fits in one Python list);
this is the scale path the engine adds for training-data pipelines,
same family as sp1/dc1 (operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shuffle_positions(
    df: DataFrame,
    id_col: str = "doc",
    seed: int = 42,
    shard_size: int = 1000,
    prefix_chars: int = 3,
) -> DataFrame:
    """Deterministic global corpus shuffle: every row gets a dense
    training-order position (0..n-1) by sorting on a salted md5 of its
    id, plus the shard that position lands in — the pass that fixes a
    reproducible training order before packing/sharding.

    Same scale shape as :func:`pack_offsets`: the naive expression is a
    single global ``row_number() over (order by hash)`` (an Exchange
    SinglePartition over the corpus); here the first ``prefix_chars``
    hex chars of the hash form ``16**prefix_chars`` range buckets whose
    lexicographic order extends the full-hash order, so positions
    decompose into a per-bucket ``row_number`` at full width plus an
    exclusive running count over the metadata-sized bucket table,
    broadcast back. Engine-portable (md5 is md5 everywhere) and
    seed-stable under any partitioning.

    ``prefix_chars`` bounds the window parallelism AND the straggler
    size: md5 is uniform, so each bucket holds ~n/16^prefix_chars rows
    in one task. The result is invariant to the choice (bucket order
    extends hash order for any prefix length); size it so a bucket fits
    one task comfortably — 3 (4096 buckets, the default) covers ~10^10
    docs at ~2.5M rows/task; use 4 (65k buckets) toward 10^12. The
    bucket table stays broadcast-tiny (≤16^prefix_chars rows) either
    way.
    """
    if not 1 <= int(prefix_chars) <= 5:
        # 5 → 1M buckets: the ceiling where the bucket table itself is
        # still unambiguously broadcast/SinglePartition-safe (~10 MB)
        raise ValueError(f"prefix_chars must be in [1, 5], got {prefix_chars}")
    ids = F.col(id_col)
    h = F.md5(F.concat_ws("|", F.lit(str(int(seed))), ids.cast("string")))
    hashed = df.select(ids.alias("_id"), h.alias("_h")).withColumn(
        "_hb", F.substring("_h", 1, int(prefix_chars))
    )
    w_in = Window.partitionBy("_hb").orderBy("_h", "_id")
    numbered = hashed.withColumn("_rn", F.row_number().over(w_in).cast("long"))
    counts = hashed.groupBy("_hb").agg(F.count("*").alias("_bn"))
    w_b = Window.orderBy("_hb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_hb", F.coalesce(F.sum("_bn").over(w_b), F.lit(0)).alias("_boff")
    )
    pos = F.col("_boff") + F.col("_rn") - 1
    return (
        numbered.join(F.broadcast(offsets), "_hb")
        .select(
            F.col("_id").alias(id_col),
            pos.alias("pos"),
            F.expr(f"(_boff + _rn - 1) div {int(shard_size)}").alias("shard"),
        )
    )


def tiered_shuffle_positions(
    df: DataFrame,
    id_col: str = "doc",
    tier_col: str = "tier",
    seed: int = 42,
    shard_size: int = 1000,
    prefix_chars: int = 3,
) -> DataFrame:
    """:func:`shuffle_positions` with a CURRICULUM: dense global
    positions ordered by (tier ASC, salted-md5(id), id) — every tier-0
    doc trains before any tier-1 doc, and WITHIN a tier the order is
    exactly the seeded shuffle (same hash, so the within-tier relative
    order equals shuffle_positions' — test-pinned by ds3). The naive
    expression is one global ``row_number() over (order by tier,
    hash)``; here the bucket key is COMPOSITE — (tier, hash prefix) —
    whose lexicographic order extends the full sort order, so the
    per-bucket windows stay ~n/16^prefix_chars rows regardless of how
    skewed the tier sizes are (a tier is split across all 16^p hash
    buckets; only the metadata-sized offset table grows by the tier
    factor: n_tiers × 16^prefix_chars rows, still broadcast-tiny for
    the handful of tiers a curriculum uses)."""
    if not 1 <= int(prefix_chars) <= 5:
        raise ValueError(f"prefix_chars must be in [1, 5], got {prefix_chars}")
    ids = F.col(id_col)
    tier = F.col(tier_col).cast("long")
    h = F.md5(F.concat_ws("|", F.lit(str(int(seed))), ids.cast("string")))
    hashed = df.select(
        ids.alias("_id"), tier.alias("_t"), h.alias("_h")
    ).withColumn("_hb", F.substring("_h", 1, int(prefix_chars)))
    w_in = Window.partitionBy("_t", "_hb").orderBy("_h", "_id")
    numbered = hashed.withColumn("_rn", F.row_number().over(w_in).cast("long"))
    counts = hashed.groupBy("_t", "_hb").agg(F.count("*").alias("_bn"))
    w_b = Window.orderBy("_t", "_hb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_t", "_hb", F.coalesce(F.sum("_bn").over(w_b), F.lit(0)).alias("_boff")
    )
    pos = F.col("_boff") + F.col("_rn") - 1
    return (
        numbered.join(F.broadcast(offsets), ["_t", "_hb"])
        .select(
            F.col("_id").alias(id_col),
            F.col("_t").alias(tier_col),
            pos.alias("pos"),
            F.expr(f"(_boff + _rn - 1) div {int(shard_size)}").alias("shard"),
        )
    )


def pack_offsets(
    df: DataFrame,
    id_col: str = "doc",
    tokens_col: str = "n_tokens",
    seq_len: int = 2048,
    bucket_width: int = 256,
) -> DataFrame:
    """Global concat-and-chop packing offsets for a (id, n_tokens) frame.

    Returns one row per input row with:
      start_off   exclusive global token offset where the doc begins
      first_seq   index of the training sequence holding its first token
      last_seq    index of the sequence holding its last token
      n_seqs      sequences the doc spans (straddlers > 1)

    Rows with ``n_tokens <= 0`` are dropped (an empty document occupies
    no position in the token stream). Ids must be unique AND
    non-negative; document order is ascending ``id_col`` — deterministic
    under any partitioning. (Non-negative because the range bucket is
    ``id div bucket_width`` and SQL ``div`` truncates toward zero, so a
    negative id would share bucket 0 with small positive ids and break
    the bucket-order-extends-id-order invariant the decomposition
    relies on.)
    """
    ids = F.col(id_col)
    toks = F.col(tokens_col).cast("long")
    nz = df.select(ids.alias("_id"), toks.alias("_n")).filter(F.col("_n") > 0)
    bucketed = nz.withColumn("_b", F.expr(f"_id div {int(bucket_width)}"))

    w_in = (
        Window.partitionBy("_b")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bucketed.withColumn("_cum_in", F.sum("_n").over(w_in))

    totals = bucketed.groupBy("_b").agg(F.sum("_n").alias("_btot"))
    w_b = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_b", F.coalesce(F.sum("_btot").over(w_b), F.lit(0)).alias("_boff")
    )

    L = int(seq_len)
    start = F.col("_boff") + F.col("_cum_in") - F.col("_n")
    first_seq = F.expr(f"(_boff + _cum_in - _n) div {L}")
    last_seq = F.expr(f"(_boff + _cum_in - 1) div {L}")
    return (
        cum.join(F.broadcast(offsets), "_b")
        .select(
            F.col("_id").alias(id_col),
            F.col("_n").alias(tokens_col),
            start.alias("start_off"),
            first_seq.alias("first_seq"),
            last_seq.alias("last_seq"),
            (last_seq - first_seq + F.lit(1)).alias("n_seqs"),
        )
    )


def epoch_tiered_positions(
    df: DataFrame,
    id_col: str = "doc",
    epoch_col: str = "epoch",
    tier_col: str = "tier",
    prefix_chars: int = 3,
) -> DataFrame:
    """:func:`tiered_shuffle_positions` with a PER-EPOCH curriculum
    restart (ds4): dense global positions ordered by (epoch ASC, tier
    ASC, md5(epoch || '|' || id), id) — epoch-major like ds2, every
    tier-0 doc of an epoch trains before any tier-1 doc of that epoch,
    and WITHIN (epoch, tier) the order is exactly ds2's epoch-reseeded
    shuffle (the SAME hash expression epoch_interleave uses, so each
    epoch's curriculum is a block permutation of that epoch's ds2
    order — test-pinned). The naive expression is one global
    ``row_number() over (order by epoch, tier, hash)``; here the
    bucket key is the THREE-part composite (epoch, tier, hash prefix),
    whose lexicographic order extends the full sort order, so
    per-bucket windows stay ~n/16^prefix_chars rows under any tier
    skew AND any epoch count — only the broadcast offset table grows,
    to n_epochs × n_tiers × 16^prefix_chars rows (≤ 4 epochs × 4
    tiers × 4096 here: still metadata). Input rows must be unique at
    (id, epoch); all input columns carry through, ``pos`` is
    appended."""
    if not 1 <= int(prefix_chars) <= 5:
        raise ValueError(f"prefix_chars must be in [1, 5], got {prefix_chars}")
    # ds2's per-epoch reseed, verbatim (operators/sampling.
    # epoch_interleave's h2): the epoch IS the shuffle seed
    h = F.md5(
        F.concat_ws(
            "|",
            F.col(epoch_col).cast("string"),
            F.col(id_col).cast("string"),
        )
    )
    hashed = (
        df.withColumn("_e", F.col(epoch_col).cast("long"))
        .withColumn("_t", F.col(tier_col).cast("long"))
        .withColumn("_h", h)
        .withColumn("_hb", F.substring("_h", 1, int(prefix_chars)))
    )
    w_in = Window.partitionBy("_e", "_t", "_hb").orderBy("_h", id_col)
    numbered = hashed.withColumn("_rn", F.row_number().over(w_in).cast("long"))
    counts = hashed.groupBy("_e", "_t", "_hb").agg(F.count("*").alias("_bn"))
    w_b = Window.orderBy("_e", "_t", "_hb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_e", "_t", "_hb",
        F.coalesce(F.sum("_bn").over(w_b), F.lit(0)).alias("_boff"),
    )
    return (
        numbered.join(F.broadcast(offsets), ["_e", "_t", "_hb"])
        .select(
            *df.columns,
            (F.col("_boff") + F.col("_rn") - 1).alias("pos"),
        )
    )
