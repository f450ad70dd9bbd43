"""Deterministic sampling operators for training-data pipelines.

Beyond-reference family (BASELINE.json north star). Sampling for a
100 TB training mix must be REPRODUCIBLE — re-running the pipeline (or
running it in another engine) must pick the same rows — so nothing here
uses ``rand()``: membership is a pure function of a salted md5 of the
row key. md5 hex is lowercase in both Spark and DuckDB and compares
bytewise under both engines' default collations, so a hex-prefix
threshold is an engine-portable Bernoulli draw:

    P(substr(md5(salt||key),1,4) < t) == int(t,16) / 16^4

Every operator is a narrow expression over the scan (sp1/sp2 are
filters — no shuffle at all; sp3 is one per-stratum shuffle that Spark 4
executes as WindowGroupLimit, i.e. partial top-k before the exchange).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, salt: str, hex_digits: int = 4) -> Column:
    """The salted md5 hex prefix that drives every sampling decision.

    Different salts give independent draws from the same key (split
    assignment vs subsampling vs shuffling must not correlate).
    """
    return F.substring(F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, hex_digits)


def sql_hash_bucket(key_expr: str, salt: str, hex_digits: int = 4) -> str:
    """DuckDB fragment matching :func:`hash_bucket`."""
    return f"substring(md5('{salt}:' || CAST({key_expr} AS VARCHAR)), 1, {hex_digits})"


def hex_threshold(frac: float) -> str:
    """The 4-hex-digit threshold string for ``P(bucket < t) == frac``.

    ``round(frac * 65536) == 65536`` (frac exactly 1.0, or within ~8e-6
    of it) would format to the FIVE-char ``'10000'``, which sorts BELOW
    most 4-char prefixes ('10000' < '1234…') and silently keeps ~1/16 of
    rows. Any overflowed threshold means keep-all, and ``'g'`` sorts
    after every hex digit, so ``bucket < 'g'`` is always true — the
    single comparison stays correct at both extremes.
    """
    n = round(frac * 65536)
    return "g" if n >= 65536 else format(n, "04x")


def hash_split(
    df: DataFrame,
    key: str,
    salt: str = "split",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """Assign train/val/test deterministically by hash range.

    Fractions quantize to 1/65536 granularity (4 hex digits); the split
    is stable under any repartitioning, insertion order, or engine.
    """
    b = hash_bucket(F.col(key), salt)
    val_hi = hex_threshold(val_frac)
    test_hi = hex_threshold(val_frac + test_frac)
    return df.withColumn(
        "split",
        F.when(b < val_hi, "val")
        .when(b < test_hi, "test")
        .otherwise("train"),
    )


def sql_hash_split(
    key_expr: str, salt: str = "split", val_frac: float = 0.1, test_frac: float = 0.1
) -> str:
    """DuckDB CASE fragment matching :func:`hash_split`'s ``split``."""
    b = sql_hash_bucket(key_expr, salt)
    val_hi = hex_threshold(val_frac)
    test_hi = hex_threshold(val_frac + test_frac)
    return (
        f"CASE WHEN {b} < '{val_hi}' THEN 'val' "
        f"WHEN {b} < '{test_hi}' THEN 'test' ELSE 'train' END"
    )


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float], salt: str = "strat"
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sample (a weighted training
    mix: each source keeps its own fraction). Unlisted strata drop."""
    b = hash_bucket(F.col(key), salt)
    cond = None
    for s, rate in rates.items():
        this = F.col(stratum) == s
        if rate < 1.0:
            # hex_threshold handles rates that round up to 65536
            # (within ~8e-6 of 1.0) by returning the keep-all sentinel
            this = this & (b < hex_threshold(rate))
        cond = this if cond is None else (cond | this)
    return df.filter(cond)


def k_per_stratum(
    df: DataFrame, key: str, stratum: str, k: int, salt: str = "ksample"
) -> DataFrame:
    """Deterministic k-row uniform sample per stratum: rank by the
    salted hash (full md5 then key as total-order tie-break) and keep
    the first k. Equivalent to a seeded reservoir sample but stable
    under any partitioning; Spark 4 runs the rank-filter as
    WindowGroupLimit (per-partition top-k before the shuffle)."""
    w = Window.partitionBy(stratum).orderBy(
        F.md5(F.concat(F.lit(salt + ":"), F.col(key).cast("string"))).asc(),
        F.col(key).asc(),
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def epoch_budget(
    df: DataFrame,
    stratum: str,
    tokens_col: str,
    budget_mult: int = 3,
    max_epochs: int = 3,
) -> DataFrame:
    """Per-source EPOCH plan for a data-constrained training run: given
    a global token budget of ``budget_mult ×`` the corpus and α=0.5
    temperature weights (budget_s ∝ floor(sqrt(T_s)), exactly
    :func:`temperature_mix`'s weighting), how many epochs of each
    source does the run see — capped at ``max_epochs`` repetitions,
    the data-constrained-scaling rule that repeating data beyond ~4
    epochs stops buying loss (Muennighoff et al. 2023, "Scaling
    Data-Constrained Language Models"). mx1 answers "which documents
    make one balanced pass"; this answers the planning question above
    it — what repetition factor the budget implies per source and
    where the cap truncates it (capped budget is surfaced, not
    silently redistributed: redistribution is iterative water-filling,
    a planner decision this report informs).

    All arithmetic after the per-source token sums is BIGINT — the
    isqrt quantization and the overflow-safe floor-div decomposition
    are temperature_mix's (see its docstring) — so the output is
    hash-exact cross-engine. ``epochs_milli = capped·1000 // T_s``
    keeps thousandths-of-an-epoch resolution in integers
    (capped ≤ max_epochs·T_s, so the ×1000 is overflow-safe below
    ~10^15 tokens per source).

    Plan shape: one map-side-combined groupBy(stratum) over the corpus,
    then a broadcast cross-join of the single global row — source-grain
    metadata from one exchange, no windows.

    Output, one row per source with any tokens: (source, source_tokens,
    budget_tokens, capped_tokens, epochs_milli, capped).
    """
    m, e = int(budget_mult), int(max_epochs)
    if m < 1 or e < 1:
        raise ValueError(f"budget_mult/max_epochs must be >= 1, got {m}/{e}")
    from .dedup import pin_bounded

    nz = df.select(
        F.col(stratum).alias("source"),
        F.col(tokens_col).cast("long").alias("_n"),
    ).filter(F.col("_n") > 0)
    # tot is source-grain metadata but its lineage aggregates the whole
    # corpus; it feeds BOTH the global 1-row agg and the budget join —
    # pin it so the corpus is aggregated once, not twice.
    tot = pin_bounded(
        nz.groupBy("source").agg(F.sum("_n").alias("source_tokens")).withColumn(
            "_isq",
            F.floor(F.sqrt(F.col("source_tokens").cast("double"))).cast("long"),
        )
    )
    g = tot.agg(
        F.sum("source_tokens").alias("_total"), F.sum("_isq").alias("_denom")
    )
    budgets = tot.crossJoin(F.broadcast(g)).select(
        "source",
        "source_tokens",
        F.expr(
            f"((_total * {m}) div _denom) * _isq"
            f" + (((_total * {m}) % _denom) * _isq) div _denom"
        ).alias("budget_tokens"),
    )
    # two-step select so capped_tokens has ONE definition; epochs_milli
    # needs SQL `div` (a double-rounded floor(a/b) can be off by an ulp
    # once a*1000 exceeds 2^53)
    capped = budgets.select(
        "source",
        "source_tokens",
        "budget_tokens",
        F.least(
            F.col("budget_tokens"), F.lit(e) * F.col("source_tokens")
        ).alias("capped_tokens"),
    )
    return capped.select(
        "source",
        "source_tokens",
        "budget_tokens",
        "capped_tokens",
        F.expr("(capped_tokens * 1000) div source_tokens").alias(
            "epochs_milli"
        ),
        (F.col("budget_tokens") > F.col("capped_tokens")).alias("capped"),
    )


def epoch_interleave(
    df: DataFrame,
    key: str,
    stratum: str,
    tokens_col: str,
    budgets: DataFrame,
    frac_salt: str = "epfrac",
    prefix_chars: int = 3,
) -> DataFrame:
    """The multi-epoch TRAINING ORDER a trainer actually consumes
    (VERDICT r9 "Next round" #3): :func:`epoch_budget` plans how many
    epochs of each source a data-constrained run sees (epochs_milli —
    e.g. 2.8 epochs of src1); this operator materializes that plan as
    the epoch-interleaved (doc, epoch, global position) stream.

    Semantics, all-integer so the result is hash-exact cross-engine:

    - per source, ``full = capped_tokens div source_tokens`` whole
      epochs and a fractional remainder of
      ``frac = capped_tokens % source_tokens`` tokens;
    - every doc of the source appears in epochs ``0..full-1``;
    - the fractional epoch (index ``full``) admits docs
      lowest-salted-hash-first until ``frac`` fills — the same
      deterministic-reservoir semantics as :func:`temperature_mix`
      (hits the budget exactly, up to the one boundary doc);
    - the global position is epoch-major: ``row_number() - 1`` over
      ``(epoch, md5(epoch || '|' || doc), doc)`` — i.e. each epoch
      is an independent :func:`~..operators.packing.shuffle_positions`
      draw with the EPOCH as the seed, so consecutive epochs replay
      the data in different deterministic orders (the reason trainers
      reshuffle between epochs).

    Scale shape: both global orders decompose the packing.py way —
    the reservoir cumsum runs per (source, hash-prefix) bucket at
    full width with a broadcast per-source bucket-offset table
    (≤ 16^prefix_chars rows per source), and the position
    row_number runs per (epoch, hash-prefix) bucket with an
    epochs × 16^prefix_chars bucket table (epochs ≤ max_epochs + 1,
    so metadata-sized). The epoch explode multiplies rows by the
    PLANNED repetition factor — exactly the blow-up the training run
    itself pays, produced here as metadata rows, never text. ``budgets``
    is source-grain (broadcast-join safe, unlike node-grain tables).

    ``budgets`` must provide (``stratum``, source_tokens,
    capped_tokens) — :func:`epoch_budget`'s output. Rows of ``df``
    with no budget row (a source with zero tokens) drop. Returns
    (key, stratum, tokens_col, epoch, pos).
    """
    x = epoch_membership(
        df, key, stratum, tokens_col, budgets,
        frac_salt=frac_salt, prefix_chars=prefix_chars,
    ).select(
        F.col(key).alias("_id"),
        F.col(stratum).alias("_s"),
        F.col(tokens_col).alias("_n"),
        F.col("epoch").alias("_e"),
    )

    # epoch-major global position: per-(epoch, hash-prefix) row_number
    # + exclusive running count over the metadata-sized bucket table
    h2 = F.md5(
        F.concat_ws("|", F.col("_e").cast("string"), F.col("_id").cast("string"))
    )
    hashed2 = x.withColumn("_h2", h2).withColumn(
        "_pb", F.substring("_h2", 1, int(prefix_chars))
    )
    w_in2 = Window.partitionBy("_e", "_pb").orderBy("_h2", "_id")
    numbered = hashed2.withColumn(
        "_rn", F.row_number().over(w_in2).cast("long")
    )
    counts2 = hashed2.groupBy("_e", "_pb").agg(F.count("*").alias("_bn2"))
    w_b2 = Window.orderBy("_e", "_pb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets2 = counts2.select(
        "_e", "_pb",
        F.coalesce(F.sum("_bn2").over(w_b2), F.lit(0)).alias("_boff2"),
    )
    return (
        numbered.join(F.broadcast(offsets2), ["_e", "_pb"])
        .select(
            F.col("_id").alias(key),
            F.col("_s").alias(stratum),
            F.col("_n").alias(tokens_col),
            F.col("_e").alias("epoch"),
            (F.col("_boff2") + F.col("_rn") - 1).alias("pos"),
        )
    )


def epoch_membership(
    df: DataFrame,
    key: str,
    stratum: str,
    tokens_col: str,
    budgets: DataFrame,
    frac_salt: str = "epfrac",
    prefix_chars: int = 3,
) -> DataFrame:
    """The MEMBERSHIP half of :func:`epoch_interleave`, factored out
    (r12) so ORDER variants can reuse it — which (doc, epoch)
    appearances a data-constrained run replays, before any position is
    assigned: every doc of a source appears in its ``full`` whole
    epochs, and the fractional last epoch admits lowest-salted-hash-
    first until the per-source remainder fills (temperature_mix's
    deterministic-reservoir semantics; identical CTEs in the ds2
    oracle). ds2 orders these rows by the plain per-epoch shuffle;
    ds4 orders them by (epoch, quality tier, per-epoch shuffle) — one
    membership definition, two orders. Same two-level per-(source,
    hash-prefix) cumsum decomposition as before (no data-sized
    SinglePartition). Returns (key, stratum, tokens_col, epoch) — one
    row per appearance."""
    if not 1 <= int(prefix_chars) <= 5:
        raise ValueError(f"prefix_chars must be in [1, 5], got {prefix_chars}")
    nz = df.select(
        F.col(key).alias("_id"),
        F.col(stratum).alias("_s"),
        F.col(tokens_col).cast("long").alias("_n"),
    ).filter(F.col("_n") > 0)
    b = budgets.select(
        F.col(stratum).alias("_s"),
        F.expr("capped_tokens div source_tokens").alias("_full"),
        (F.col("capped_tokens") % F.col("source_tokens")).alias("_frac"),
    )

    # fractional-epoch reservoir: two-level per-source cumsum over the
    # salted-hash order (temperature_mix's decomposition)
    h = F.md5(F.concat(F.lit(frac_salt + ":"), F.col("_id").cast("string")))
    hashed = nz.withColumn("_h", h).withColumn(
        "_hb", F.substring("_h", 1, int(prefix_chars))
    )
    w_in = (
        Window.partitionBy("_s", "_hb")
        .orderBy("_h", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hashed.withColumn("_cum_in", F.sum("_n").over(w_in))
    btot = hashed.groupBy("_s", "_hb").agg(F.sum("_n").alias("_bn"))
    w_b = (
        Window.partitionBy("_s")
        .orderBy("_hb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = btot.select(
        "_s", "_hb",
        F.coalesce(F.sum("_bn").over(w_b), F.lit(0)).alias("_boff"),
    )
    n_epochs = F.col("_full") + F.when(
        (F.col("_boff") + F.col("_cum_in")) <= F.col("_frac"), F.lit(1)
    ).otherwise(F.lit(0))
    member = (
        cum.join(F.broadcast(offsets), ["_s", "_hb"])
        .join(F.broadcast(b), "_s")
        .select("_id", "_s", "_n", n_epochs.cast("long").alias("_ne"))
        .filter(F.col("_ne") > 0)
    )
    return member.select(
        F.col("_id").alias(key),
        F.col("_s").alias(stratum),
        F.col("_n").alias(tokens_col),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("_ne") - 1)
        ).alias("epoch"),
    )


def temperature_mix(
    df: DataFrame,
    key: str,
    stratum: str,
    tokens_col: str,
    beta_num: int = 1,
    beta_den: int = 2,
    salt: str = "mix",
    prefix_chars: int = 3,
    order_col: str | None = None,
) -> DataFrame:
    """Temperature-weighted mixture sampling (α=0.5): rebalance a
    multi-source corpus toward low-resource sources, the standard
    pretraining-mix pass (multilingual LM recipes sample source s with
    probability ∝ T_s^α).

    Per source s with T_s total tokens, the token budget is

        budget_s = (Σ T) · (β_num/β_den) · isq_s / (Σ isq)

    where ``isq_s = floor(sqrt(T_s))`` — an integer quantization of
    T^0.5 (relative error ≤ 1/isq_s, negligible at corpus scale) chosen
    so the WHOLE keep decision is integer arithmetic: no double sums
    whose engine-specific accumulation order could flip a boundary doc
    (sqrt of a BIGINT is IEEE-correctly-rounded, so floor(sqrt(·)) is
    bit-identical across engines; everything after is BIGINT). The
    product (Σ T)·isq can overflow at 100 TB, so the budget uses the
    exact floor-div decomposition (a//m)·i + ((a%m)·i)//m.

    Docs are then kept LOWEST-SALTED-HASH-FIRST until the budget fills:
    a per-source running token sum over the md5 order — a deterministic
    reservoir that hits the budget exactly (a Bernoulli draw only hits
    it in expectation). The cumsum uses the two-level decomposition
    (``16**prefix_chars`` hash-prefix buckets per source at full width
    + broadcast bucket offsets, operators/packing.py pattern) —
    per-source windows alone would serialize each source through one
    task. ``prefix_chars`` sizes the per-source window parallelism and
    straggler ceiling exactly as in packing.shuffle_positions (results
    are invariant to it; default 3 → 4096 buckets/source, use 4 toward
    10^12-doc sources); the per-source bucket table the offsets ride
    stays ≤16^prefix_chars rows.

    ``order_col`` (optional, an INTEGER column on ``df``) prepends an
    admission priority to the salted-hash order: docs are admitted in
    (order_col ASC, hash, id) order — the importance-weighted mixture
    shape (mx3). The two-level decomposition extends naturally: cumsum
    buckets become (order_col, hash-prefix) groups and the per-source
    bucket-offset table grows to ≤ |order values| × 16^prefix_chars
    rows — still metadata-sized for bounded integer buckets. With
    ``order_col=None`` the constant 0 is used, which reduces to the
    original per-source hash order bit-for-bit.

    Returns (key, stratum, tokens, kept) for every n_tokens>0 row.
    """
    ids = F.col(key)
    if not 1 <= int(prefix_chars) <= 5:
        raise ValueError(f"prefix_chars must be in [1, 5], got {prefix_chars}")
    # NULL order values admit LAST on both engines (review finding:
    # Spark windows sort NULLS FIRST, DuckDB's ORDER BY defaults NULLS
    # LAST — a silent cross-engine divergence if a caller ever passes
    # NULLs); coalescing to Long.MAX makes the Spark side deterministic
    # and equal to the SQL twin's default.
    q = (
        F.coalesce(F.col(order_col).cast("long"), F.lit(2**63 - 1))
        if order_col is not None
        else F.lit(0).cast("long")
    )
    nz = df.select(
        ids.alias("_id"),
        F.col(stratum).alias("_s"),
        F.col(tokens_col).cast("long").alias("_n"),
        q.alias("_q"),
    ).filter(F.col("_n") > 0)
    h = F.md5(F.concat(F.lit(salt + ":"), F.col("_id").cast("string")))
    hashed = nz.withColumn("_h", h).withColumn(
        "_hb", F.substring("_h", 1, int(prefix_chars))
    )

    w_in = (
        Window.partitionBy("_s", "_q", "_hb")
        .orderBy("_h", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hashed.withColumn("_cum_in", F.sum("_n").over(w_in))

    btot = hashed.groupBy("_s", "_q", "_hb").agg(F.sum("_n").alias("_bn"))
    w_b = (
        Window.partitionBy("_s")
        .orderBy("_q", "_hb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = btot.select(
        "_s", "_q", "_hb",
        F.coalesce(F.sum("_bn").over(w_b), F.lit(0)).alias("_boff"),
    )

    # per-source totals derive from the per-bucket totals (≤16^prefix
    # rows per source) instead of a third scan of the corpus — btot
    # already paid for the md5+filter chain
    tot = btot.groupBy("_s").agg(F.sum("_bn").alias("_ts")).withColumn(
        "_isq", F.floor(F.sqrt(F.col("_ts").cast("double"))).cast("long")
    )
    g = tot.agg(
        F.sum("_ts").alias("_total"), F.sum("_isq").alias("_denom")
    )
    # budget_s = (total*beta_num) * isq // (beta_den*denom), overflow-safe
    budgets = tot.crossJoin(F.broadcast(g)).select(
        "_s",
        F.expr(
            f"((_total * {int(beta_num)}) div ({int(beta_den)} * _denom)) * _isq"
            f" + (((_total * {int(beta_num)}) % ({int(beta_den)} * _denom)) * _isq)"
            f" div ({int(beta_den)} * _denom)"
        ).alias("_budget"),
    )

    return (
        cum.join(F.broadcast(offsets), ["_s", "_q", "_hb"])
        .join(F.broadcast(budgets), "_s")
        .select(
            F.col("_id").alias(key),
            F.col("_s").alias(stratum),
            F.col("_n").alias(tokens_col),
            ((F.col("_boff") + F.col("_cum_in")) <= F.col("_budget")).alias(
                "kept"
            ),
        )
    )
