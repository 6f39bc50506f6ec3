"""Bucketed co-located join: the write-once/join-many scale path."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from audios_to_dataset_spark.catalog import load
from audios_to_dataset_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    sf = "/root/testdata/sf0.001"
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "okey")
    o = load(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice"
    ).withColumnRenamed("o_orderkey", "okey")
    write_bucketed(li, "b_lineitem", "okey", n_buckets=8)
    write_bucketed(o, "b_orders", "okey", n_buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # at sf0.001 the small side would broadcast; force the sort-merge
    # path to observe the bucketing benefit (no shuffle on EITHER side)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "okey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    lt, rt = bucketed_tables
    sf = "/root/testdata/sf0.001"
    got = (
        bucketed_join(spark, lt, rt, "okey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("q"),
        )
        .first()
    )
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    exp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("q"),
        )
        .first()
    )
    assert (got.n, got.q) == (exp.n, exp.q)


def test_partitioned_layout_static_and_dynamic_pruning(spark, sf_dir, tmp_path):
    """write_partitioned output must plan STATIC partition pruning for a
    literal filter and DYNAMIC partition pruning (runtime IN-subquery
    from the joined dim's filter) for a join — the two scan
    eliminations that matter at 100 TB."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from audios_to_dataset_spark.catalog import load
    from audios_to_dataset_spark.operators.bucketing import (
        write_partitioned,
    )

    def explain(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    o = load(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_part")
    write_partitioned(o, path, "o_orderpriority")
    fact = spark.read.parquet(path)

    static = explain(fact.filter(F.col("o_orderpriority") == "1-URGENT"))
    assert "PartitionFilters" in static
    assert "o_orderpriority" in static.split("PartitionFilters", 1)[1].split(
        "\n"
    )[0]

    dim = (
        fact.select("o_orderpriority")
        .distinct()
        .filter(F.col("o_orderpriority").startswith("1"))
    )
    dpp = explain(
        fact.join(F.broadcast(dim), "o_orderpriority").select("o_orderkey")
    )
    assert "dynamicpruning" in dpp

    # and the pruned result is correct
    got = (
        fact.join(F.broadcast(dim), "o_orderpriority").count()
    )
    want = o.filter(F.col("o_orderpriority").startswith("1")).count()
    assert got == want > 0
