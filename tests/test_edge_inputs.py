"""Empty/degenerate-input behavior of the core operators.

At 100 TB a filter can legitimately produce zero rows; every operator
must pass empties through, not throw.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_triangle_count_empty_edges(spark):
    from audios_to_dataset_spark.operators.graph import triangle_count

    empty = spark.createDataFrame([], "u long, v long")
    row = triangle_count(empty).collect()[0]
    assert (row.n_edges, row.n_nodes, row.n_triangles) == (0, 0, 0)


def test_connected_components_no_edges(spark):
    from audios_to_dataset_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    edges = spark.createDataFrame([], "src long, dst long")
    got = {r.id: r.cluster_id for r in
           connected_components(nodes, edges).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # all singletons


def test_shingles_short_docs(spark):
    from audios_to_dataset_spark.operators.dedup import shingles

    d = spark.createDataFrame(
        [(1, "one two"), (2, ""), (3, "a b c d")],
        "doc_id long, text string",
    )
    got = shingles(d, n=3).collect()
    # docs shorter than n tokens yield no shingles; doc 3 yields 2
    assert sorted((r.id, r.shingle) for r in got) == [
        (3, "a b c"), (3, "b c d")
    ]


def test_exact_dedup_empty(spark):
    from audios_to_dataset_spark.operators.dedup import exact_dedup_groups

    d = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup_groups(d).count() == 0


def test_pagerank_single_edge(spark):
    from audios_to_dataset_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    ranks = {r.id: r.rank for r in pagerank(edges, iters=2).collect()}
    assert set(ranks) == {1, 2}
    # node 2 receives node 1's full outflow, so it must outrank node 1
    assert ranks[2] > ranks[1]
    # probability mass is conserved (dangling correction included)
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_queries_tolerate_empty_and_singleton_tables(spark, tmp_path):
    """Representative queries from every family must not crash on a
    degenerate sf dir (EMPTY documents, one-row everything else) — the
    shape a fresh ingest or an aggressive filter produces."""
    import pyarrow.parquet as pq

    from audios_to_dataset_spark.catalog import TABLES
    from audios_to_dataset_spark.plans import all_queries

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "sf_tiny")
    import os

    os.makedirs(dst)
    for t in TABLES:
        tb = pq.read_table(f"{src}/{t}.parquet")
        n = 0 if t == "documents" else min(1, tb.num_rows)
        pq.write_table(tb.slice(0, n), f"{dst}/{t}.parquet")

    qs = all_queries()
    battery = (
        "q_dedup_minhash_lsh", "q_dedup_exact", "q_knn_graph",
        "q_text_stats", "q_agg_count", "q_tumbling_window",
        "q_hll_union", "q_cms_merge", "q_inverted_index",
        "q_ann_topk", "q_pagerank", "q_kmeans", "q_session_gap",
    )
    for name in battery:
        qs[name](spark, dst).collect()  # must not raise


def test_kcore_empty_edges(spark):
    from audios_to_dataset_spark.operators.graph import k_core_peel

    e = spark.createDataFrame([], "src long, dst long")
    assert k_core_peel(e, k=2, rounds=2).count() == 0


def test_pq_codes_fewer_vectors_than_k(spark):
    # k=4 codebook over 2 vectors: seeds are just the 2 ids; codes valid
    from audios_to_dataset_spark.operators.similarity import pq_codes

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: r.code_0
        for r in pq_codes(df, m=1, subdim=2, k=4, iters=1).collect()
    }
    assert got == {0: 0, 1: 1}
