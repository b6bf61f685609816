"""Connected-components / duplicate-cluster semantics (operators/graph.py)."""

import pytest

from srm_etl_spark.operators.graph import connected_components, duplicate_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "left_id long, right_id long")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_two_components_min_label(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_diameter_greater_than_one(spark):
    # 7-node path: min label must propagate the full diameter
    got = _cc(spark, [(i, i + 1) for i in range(1, 7)])
    assert got == {i: 1 for i in range(1, 8)}


def test_edge_direction_irrelevant(spark):
    assert _cc(spark, [(5, 2), (2, 9)]) == {2: 2, 5: 2, 9: 2}


def test_max_iter_guard(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(1, 20)], "left_id long, right_id long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(df, max_iter=2)


def test_duplicate_clusters_sizes(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "left_id long, right_id long")
    rows = {r.node: (r.component, r.cluster_size) for r in duplicate_clusters(df).collect()}
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)}


def test_empty_pair_set(spark):
    pairs = spark.createDataFrame([], "left_id long, right_id long")
    out = connected_components(pairs)
    assert out.count() == 0
