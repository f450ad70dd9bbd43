"""Connected components over near-duplicate pairs — the dedup endgame.

Pair generation (dd2/dd3/dd4/dd5) yields EDGES; deduplication needs
CLUSTERS: every document labeled with a canonical representative so one
survivor per component can be kept. Transitive closure is what makes
A~B, B~C collapse into one cluster even though A and C never matched.

Implementation is iterative min-label propagation — the same alternation
GraphX/GraphFrames connected components uses, expressed on DataFrames:

    labels(v) <- min(labels(v), min over neighbors u of labels(u))

repeated to fixpoint. Each round is one equi-join (edges × labels) and
one groupBy-min — shuffle cost tracks |E| + |V| per round, rounds track
the component DIAMETER (near-dup clusters are dense, so diameters are
tiny: 2-4 rounds in practice). Convergence detection rides the fact
that min-propagation monotonically decreases ``sum(label)``: a round
that leaves the sum unchanged is the fixpoint — one cheap scalar agg
per round, no change-join.

The driver-side loop is bounded control flow (≤ ``max_iter`` rounds of
plan construction), NOT per-row driver work; each round's result is
cached and the previous round unpersisted, so the lineage stays flat at
100 TB. DuckDB checks the whole thing against a recursive-CTE
transitive closure (plans/star_pipeline dd6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    their own cluster; ``cluster_id == id`` marks the canonical doc."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    edges.persist()
    labels = nodes.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels.persist()
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    for _ in range(max_iter):
        neighbor_labels = edges.join(
            labels, edges["src"] == labels["id"]
        ).select(F.col("dst").alias("id"), "label")
        new_labels = (
            labels.union(neighbor_labels).groupBy("id").agg(F.min("label").alias("label"))
        )
        new_labels.persist()
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    edges.unpersist()
    # the final labels stay persisted: their lineage chains through every
    # round, so dropping the cache here would force the consumer to
    # recompute the whole iteration
    return labels.select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )
