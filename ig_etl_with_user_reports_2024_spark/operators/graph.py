"""Connected components over near-duplicate pairs — the dedup endgame.

Pair generation (dd2/dd3/dd4/dd5) yields EDGES; deduplication needs
CLUSTERS: every document labeled with a canonical representative so one
survivor per component can be kept. Transitive closure is what makes
A~B, B~C collapse into one cluster even though A and C never matched.

Implementation is iterative min-label propagation PLUS per-round
pointer-doubling, the same acceleration the large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond") builds on, expressed on DataFrames:

    propagate: labels(v) <- min(labels(v), min over neighbors u of labels(u))
    shortcut:  labels(v) <- labels(labels(v))

The shortcut step lets a label jump along the already-discovered
label chain, so the round count tracks log2(component diameter), not
the diameter itself — a 1000-node path converges in ~10 rounds where
plain propagation needs ~1000 (tests/test_graph.py asserts this).
Each round is two equi-joins and one groupBy-min — shuffle cost tracks
|E| + 2|V| per round. Convergence detection rides the fact that
min-propagation monotonically decreases ``sum(label)``: a round that
leaves the sum unchanged is the fixpoint — one cheap scalar agg per
round, no change-join.

The driver-side loop is bounded control flow (≤ ``max_iter`` rounds of
plan construction), NOT per-row driver work; each round's result is
eagerly ``localCheckpoint``-ed, which truncates the lineage — essential
here because every round references the previous labels TWICE (the
union and the shortcut self-join), so an uncheckpointed plan doubles
per round and analysis alone blows up around round 10. Exhausting
``max_iter`` without reaching the fixpoint RAISES —
silently returning half-merged clusters would hand the dedup stage
wrong canonical ids with no signal. DuckDB checks the whole thing
against a recursive-CTE transitive closure (plans/star_pipeline dd6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _EAGER_HANDLES, _unpersist_local_checkpoint


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the minimum node id reachable through
    ``pairs`` (undirected): (id_col, cluster_id). Isolated nodes are
    their own cluster; ``cluster_id == id`` marks the canonical doc.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iter`` rounds (with shortcutting that bounds component
    diameter at ~2^max_iter, so hitting it means something is wrong,
    not merely a long chain).

    The returned DataFrame carries a ``last_rounds`` attribute (rounds
    executed, including the fixpoint-detection round) as a diagnostic.

    Contract for edges referencing ids OUTSIDE ``nodes`` (widened by
    the r15 round-1 join elision, pinned in tests/test_graph.py): any
    id appearing as an edge endpoint enters the output even when it is
    absent from ``nodes`` — including (since r15) edges whose endpoints
    are BOTH foreign, which the old round-1 inner join silently
    dropped. Every current caller passes edges over the node id space
    (embeddings vec_id == doc_id is itself test-pinned), so nothing
    observable changed; callers with genuinely foreign edge ids must
    semi-join ``pairs`` on ``nodes`` first.
    """
    # Eager localCheckpoint, not a lazy persist (optimization r15,
    # guide §5/§3.3 "materialise intermediates"): the pair subtree is
    # referenced TWICE by the union and then once per round — a lazy
    # cache left the whole (often expensive: LSH bands + verify) pair
    # plan inside round 1's checkpoint action, where AQE materialises
    # each cold cache leaf as its own job and recomputed the subtree
    # per leaf (measured on dd11: the pinned shingle explode executed
    # 12× inside round 0, ~4s of a 9s wall). Materialising the edge
    # list ONCE up front truncates the lineage to a stored leaf; every
    # round then reads blocks. Same fault-tolerance trade the per-round
    # label checkpoints below already make; the 100 TB analog is the
    # checkpointed edge table a production CC pass reads anyway.
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    ).localCheckpoint(eager=True)
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    # prev_sum starts unknown — the first round's agg doubles as the
    # baseline, so there is exactly ONE collect per round (the init-sum
    # collect is folded into round 1). Detection needs one round AFTER
    # the fixpoint, so the loop runs max_iter + 1 times: callers still
    # get the documented max_iter PROPAGATION budget (a graph converging
    # at exactly round max_iter must not spuriously raise), and the
    # extra round is a no-op propagation at the fixpoint.
    prev_sum = None
    converged = False
    rounds_used = 0

    for round_no in range(max_iter + 1):
        rounds_used += 1
        # merge-hint both per-round joins: the labels table is NODE-grain
        # — broadcasting it contradicts this operator's own |E| + 2|V|
        # shuffle contract and cannot work at 10^12 nodes; concretely, a
        # 128× local probe OOMed when AQE chose to broadcast 640k labels
        # while the heap was already carrying the pair stage's pinned
        # shingle cache. Sort-merge keeps the round's memory footprint
        # streaming on both sides at any scale.
        if round_no == 0:
            # round 1's join is the identity: labels(v) == v initially,
            # so edges ⋈ labels on src == id yields exactly (dst, src).
            # Projecting the edge list directly saves one |E|+|V|
            # sort-merge join per CC invocation (optimization r15,
            # guide §2.4 "remove shuffles outright"); bit-identical.
            neighbor_labels = edges.select(
                F.col("dst").alias("id"), F.col("src").alias("label")
            )
        else:
            neighbor_labels = edges.join(
                labels.hint("merge"), edges["src"] == labels["id"]
            ).select(F.col("dst").alias("id"), "label")
        propagated = (
            labels.union(neighbor_labels).groupBy("id").agg(F.min("label").alias("label"))
        )
        # pointer doubling: follow the label's own label one hop —
        # label(label(v)) is still the id of a node reachable from v
        # (labels only ever carry reachable ids), so correctness is
        # unchanged while chains collapse in log2(diameter) rounds.
        parent = propagated.select(
            F.col("id").alias("label"), F.col("label").alias("_label2")
        )
        # eager localCheckpoint both materializes the round (so the
        # convergence agg reads stored blocks, not lineage) and resets
        # the plan to a leaf. The PREVIOUS round's blocks are released
        # explicitly right after the new round is fully stored (r16,
        # VERDICT r15 #3: bounded checkpoint storage — at any moment CC
        # holds edges + at most two label rounds, instead of leaving
        # every round's blocks to the ContextCleaner's GC schedule).
        prev_labels = labels
        labels = (
            propagated.join(parent.hint("merge"), "label", "left")
            .select("id", F.coalesce("_label2", "label").alias("label"))
            .localCheckpoint(eager=True)
        )
        _unpersist_local_checkpoint(prev_labels)
        # decimal(38,0) accumulator: at the 100 TB / ~10^12-node target a
        # raw bigint sum of 64-bit ids (~10^24) overflows, which under
        # Spark 4 ANSI mode raises mid-iteration; decimal keeps the same
        # monotone-decrease fixpoint signal overflow-proof.
        new_sum = (
            labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
        )
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    # the edge checkpoint has no consumer past the loop — free it NOW
    # (r16, VERDICT r15 #3: CC releases its edge blocks on return). The
    # FINAL labels checkpoint backs the returned DataFrame, so it joins
    # the eager-pin registry and is freed by the harness's per-query
    # release_eager_pins() once the result is materialized.
    _unpersist_local_checkpoint(edges)
    _EAGER_HANDLES.append(labels)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} "
            f"rounds — returning partially-merged cluster labels would "
            f"be silently wrong; raise max_iter (each round doubles the "
            f"reachable chain length) or inspect the pair graph"
        )
    out = labels.select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )
    # Round-count diagnostic scoped to THIS result (a function attribute
    # would be racy under concurrent callers and stale after a raise);
    # tests use it to lock in the pointer-doubling log2(diameter) bound.
    out.last_rounds = rounds_used
    return out


#: fixed-point scale for pagerank ranks: 6 decimal digits.
PAGERANK_SCALE = 1_000_000

# Edge/node caches pinned by recent pagerank calls, FIFO-capped — the
# unrolled iteration plan references both once PER ROUND, so without a
# persist every round re-derives the edge list from its upstream joins.
# Same single-threaded contract as operators/dedup._PERSISTED_HANDLES:
# evicting a still-pending plan's cache causes recomputation, never
# wrong results.
_PERSISTED_HANDLES: list[DataFrame] = []
_MAX_PINNED = 4


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank in scaled-long integer arithmetic:
    (id, rank_scaled) after ``iterations`` rounds, rank_scaled being the
    rank times :data:`PAGERANK_SCALE`.

    Per-node form of the original formula (Page et al. 1999, the
    non-normalized variant):

        r'(v) = (1 - d) + d * sum over in-edges (u, v) of r(u) / outdeg(u)

    All arithmetic stays in 64-bit integers — contributions are
    ``rank_scaled div outdeg`` (floor), the damped update is
    ``(100 - pct) * SCALE / 100 + (pct * contrib_sum) div 100`` — so the
    result is bit-identical in any engine and under any partition order,
    unlike a double-summed rank (float addition order diverges across
    engines; see functions/exact.py). The deliberate floor-division
    rounding loss is ≤ outdeg ulps per node per round at 1e-6 scale —
    irrelevant for ranking, decisive for hash-exactness.

    Scale shape: outdegrees are attached to the edge list ONCE (one
    groupBy + join, persisted across rounds); each round is then one
    equi-join (ranks ⋈ edges on src) and one groupBy-sum on dst —
    shuffle cost tracks |E| per round, the Pregel floor. Node set =
    edge endpoints; a node with no in-edges keeps the base rank, a node
    with no out-edges (dangling) contributes nothing — the classic
    uniform dangling-mass redistribution is intentionally omitted so
    the per-node update stays integer-exact (documented deviation).
    With bigint ranks the groupBy sum overflows past ~1e12 nodes at
    this scale; swap the sum to decimal(38,0) there (same pattern as
    the connected-components fixpoint above).

    ``iterations`` is bounded plan construction (unrolled lineage, no
    per-round action) — fine for the small fixed counts an oracle can
    mirror; a convergence-driven variant would localCheckpoint per
    round exactly like :func:`connected_components`.
    """
    while len(_PERSISTED_HANDLES) >= _MAX_PINNED:
        _PERSISTED_HANDLES.pop(0).unpersist()
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # LAZY persists, deliberately (r16 A/B, both variants measured at
    # sf0.1 quiet, min-of-4): eagerly localCheckpoint-ing e + e_deg +
    # nodes (the CC edge-checkpoint precedent) regresses pr1 2.79→4.80 s
    # — the serialized checkpoint materializations stack on the critical
    # path, while the lazy caches' concurrent cold-leaf builds overlap
    # on otherwise-idle cores. CC's case differs: its pair subtree was
    # recomputed 12× per round-0 action; here the caches are built once
    # and the edge subtree is cheap relative to the checkpoint writes.
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_deg = e.join(outdeg, "src").persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    _PERSISTED_HANDLES.extend([e_deg, nodes])
    base = (100 - damping_pct) * PAGERANK_SCALE // 100
    ranks = nodes.select("id", F.lit(PAGERANK_SCALE).cast("long").alias("rank"))
    for it in range(iterations):
        if it == 0:
            # iteration 1's join is the identity (optimization r16, the
            # CC round-1 precedent, guide §2.4): ranks(v) == SCALE for
            # every node initially, and every src is a node by
            # construction (nodes = edge endpoints), so
            # e_deg ⋈ ranks on src == id carries rank == SCALE on every
            # row. `rank div outdeg` is then `SCALE div outdeg` — a pure
            # projection of e_deg, one fewer |E|+|V| sort-merge join per
            # pagerank call; bit-identical (same floor division).
            contrib_rows = e_deg.select(
                F.col("dst"),
                F.expr(f"{PAGERANK_SCALE} div outdeg").alias("c"),
            )
        else:
            contrib_rows = e_deg.join(
                ranks.hint("merge"), e_deg["src"] == ranks["id"]
            ).select(
                F.col("dst"),
                F.expr("rank div outdeg").alias("c"),
            )
        contrib = contrib_rows.groupBy("dst").agg(F.sum("c").alias("csum"))
        # merge-hint: contrib is NODE-grain (one row per in-edge target)
        # — same invariant as the CC label joins above; broadcasting it
        # cannot work at 10^12 nodes (locally plan-neutral: SMJ chosen
        # either way at sf0.1, plans/r16/pr1_pagerank_before.txt).
        ranks = nodes.join(
            contrib.hint("merge"), nodes["id"] == contrib["dst"], "left"
        ).select(
            "id",
            (
                F.lit(base).cast("long")
                + F.expr(
                    f"({damping_pct} * coalesce(csum, 0L)) div 100"
                )
            ).alias("rank"),
        )
    return ranks.withColumnRenamed("rank", "rank_scaled")
