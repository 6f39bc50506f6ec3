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
