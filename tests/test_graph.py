"""Connected-components tests: transitive merging across rounds,
isolated nodes, canonical-min labeling."""

from __future__ import annotations

from ig_etl_with_user_reports_2024_spark.operators.graph import (
    connected_components,
)


def _run(spark, node_ids, pair_list):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id bigint")
    pairs = spark.createDataFrame(
        pair_list or [(None, None)], "a_id bigint, b_id bigint"
    )
    if not pair_list:
        pairs = pairs.filter("a_id IS NOT NULL")
    out = connected_components(nodes, pairs)
    return {r.doc_id: r.cluster_id for r in out.collect()}


def test_chain_collapses_transitively(spark):
    # path 1-2-3-4-5: diameter 4 forces multiple propagation rounds;
    # 1 and 5 never share an edge yet must land in cluster 1
    got = _run(spark, [1, 2, 3, 4, 5], [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_separate_components_and_isolated(spark):
    got = _run(spark, [1, 2, 3, 10, 11, 99], [(2, 1), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_no_pairs_everyone_canonical(spark):
    got = _run(spark, [7, 8, 9], [])
    assert got == {7: 7, 8: 8, 9: 9}


def test_min_id_reachable_through_high_id_hub(spark):
    # min must flow through a larger-id intermediate: 100 is the hub
    got = _run(spark, [5, 100, 7], [(100, 7), (5, 100)])
    assert got == {5: 5, 100: 5, 7: 5}


def test_long_path_converges_under_round_cap(spark):
    # 1000-node path: diameter 999. Plain min-propagation would need
    # ~999 rounds; pointer doubling must land it inside max_iter=25
    # (log2(999) ≈ 10) — and non-convergence now raises, so completing
    # at all proves the fixpoint was reached.
    n = 1000
    got = _run(spark, list(range(1, n + 1)), [(i, i + 1) for i in range(1, n)])
    assert got == {i: 1 for i in range(1, n + 1)}


def test_10k_path_round_count_locks_pointer_doubling(spark):
    # 10k-node path: diameter 9999. Pointer doubling must hold the round
    # count near log2(diameter) ≈ 13.3 — plain propagation would need
    # ~10^4 rounds. Asserting ≤16 (log bound + detection round + slack)
    # locks in the shortcut step: if someone drops it, this test times
    # out at max_iter instead of passing slowly.
    n = 10_000
    nodes = spark.createDataFrame(
        [(i,) for i in range(1, n + 1)], "doc_id bigint"
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "a_id bigint, b_id bigint"
    )
    out = connected_components(nodes, pairs)
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got == {i: 1 for i in range(1, n + 1)}
    # diagnostic rides the returned DataFrame, not the function object
    assert out.last_rounds <= 16


def test_nonconvergence_raises(spark):
    import pytest

    from ig_etl_with_user_reports_2024_spark.operators.graph import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(1, 40)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 39)], "a_id bigint, b_id bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, pairs, max_iter=2)


def test_foreign_edge_ids_enter_output(spark):
    # Widened contract pin (r16, ADVICE r15 #1): since the round-1 join
    # elision, edge endpoints ABSENT from `nodes` enter the output —
    # including fully-foreign edges the pre-r15 inner join dropped.
    # Every shipped caller passes edges over the node id space, so this
    # pins the operator-level behavior a future foreign-id caller gets.
    nodes = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(1, 2), (10, 11)], "a_id bigint, b_id bigint"
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 10: 10, 11: 10}
