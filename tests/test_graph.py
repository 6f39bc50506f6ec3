"""Connected components by label propagation."""

from __future__ import annotations


from audios_to_dataset_spark.operators.graph import connected_components


def _run(spark, n_nodes, edge_list):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "id long")
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    return {
        r.id: r.cluster_id
        for r in connected_components(nodes, edges).collect()
    }


def test_two_components_and_singleton(spark):
    got = _run(spark, 6, [(0, 1), (1, 2), (3, 4)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_chain_converges(spark):
    # a long path needs several propagation rounds
    got = _run(spark, 10, [(i, i + 1) for i in range(9)])
    assert set(got.values()) == {0}


def test_cycle(spark):
    got = _run(spark, 4, [(0, 1), (1, 2), (2, 0)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 3}
