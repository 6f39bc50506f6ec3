"""Round-13 isolated A/B for the q_clustering_coeff wedge walk
(VERDICT r12 item 5 — group-then-generate instead of the e1 x e2 wedge
self-join + closing join).

Variants:

  cur     — shipped plan: oriented self-join generates the wedge stream,
            closing join probes it against the undirected edge list
            (5 SortMergeJoins / 134 Exchange nodes in the formatted
            plan from subtree replication).
  arr     — grouped adjacency: ONE groupBy of the oriented edges into
            per-node sorted out-neighbor arrays; triangles come from
            array_intersect(ns(s), ns(x)) per oriented edge (s, x) —
            wedge generation and closure collapse into one map-side
            expression; the adjacency attaches to the exploded edge via
            a broadcast. Triangle multiset is provably identical: each
            triangle {s,x,y} (x, y out-neighbors of s) has its third
            edge oriented exactly one way, so exactly one of
            y ∈ ns(x) / x ∈ ns(y) fires, and the emitted
            (s, least, greatest) row equals the closed wedge row.
  arr_ck  — arr + eager localCheckpoint of the adjacency (kills the
            duplicated oriented-subtree replan under the broadcast
            build).

Usage: python tools/ab_wedge_r13.py [--runs 3] [--sf DIR ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from audios_to_dataset_spark.catalog import load  # noqa: E402
from audios_to_dataset_spark.plans._util import sround  # noqa: E402
from audios_to_dataset_spark.session import get_session  # noqa: E402


def _edges_deg(spark: SparkSession, sf_dir: str):
    li = load(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a = items.select("o", F.col("p").alias("u"))
    b = items.select("o", F.col("p").alias("v"))
    edges = (
        a.join(b, "o").filter(F.col("u") < F.col("v"))
        .select("u", "v").distinct()
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    return edges, deg


def _finish(deg, tpn):
    per_node = deg.join(tpn, "node", "left").select(
        "node",
        "d",
        F.coalesce("t", F.lit(0)).cast("bigint").alias("t"),
    )
    cc = F.when(
        F.col("d") >= 2,
        (2.0 * F.col("t").cast("double"))
        / (F.col("d").cast("double") * (F.col("d") - 1).cast("double")),
    ).otherwise(F.lit(0.0))
    bucketed = per_node.select(
        F.least(F.floor(cc * 10).cast("bigint"), F.lit(9).cast("bigint"))
        .alias("bucket"),
        sround(cc, 12).alias("ccq"),
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum(F.col("ccq").cast("decimal(28,12)"))
            .cast("double")
            .alias("sum_cc"),
        )
        .orderBy("bucket")
    )


def q_cc_arrays(spark: SparkSession, sf_dir: str, checkpoint: bool):
    edges, deg = _edges_deg(spark, sf_dir)
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u").join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    adj = oriented.groupBy("s").agg(
        F.sort_array(F.collect_list("t")).alias("ns")
    )
    if checkpoint:
        adj = adj.localCheckpoint(eager=True)
    wed = adj.select("s", "ns", F.explode("ns").alias("x"))
    adjx = adj.select(F.col("s").alias("x"), F.col("ns").alias("nx"))
    tri = (
        wed.join(F.broadcast(adjx), "x")
        .select(
            "s", "x",
            F.explode(F.array_intersect("ns", "nx")).alias("y"),
        )
        .select(
            "s",
            F.least("x", "y").alias("wu"),
            F.greatest("x", "y").alias("wv"),
        )
    )
    tpn = (
        tri.select(F.explode(F.array("s", "wu", "wv")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    return _finish(deg, tpn)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", nargs="*",
                    default=["/root/testdata/sf0.1"])
    args = ap.parse_args()

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    from audios_to_dataset_spark.plans import all_queries

    cur = all_queries()["q_clustering_coeff"]
    variants = {
        "cur": cur,
        "arr": lambda s, d: q_cc_arrays(s, d, checkpoint=False),
        "arr_ck": lambda s, d: q_cc_arrays(s, d, checkpoint=True),
    }
    for sf_dir in args.sf:
        out = {v: [] for v in variants}
        for v, fn in variants.items():  # warmup
            spark.sparkContext.setJobDescription(f"warm {v}")
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        for i in range(args.runs):
            for v, fn in variants.items():
                spark.sparkContext.setJobDescription(f"{v} #{i}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                out[v].append(round(time.perf_counter() - t0, 3))
        base = cur(spark, sf_dir)
        for v, fn in variants.items():
            if v == "cur":
                continue
            df = fn(spark, sf_dir)
            d = df.exceptAll(base).count() + base.exceptAll(df).count()
            if d:
                print(f"MISMATCH {v} vs cur on {sf_dir}: {d} rows")
        print(
            {
                "sf": sf_dir,
                "runs": out,
                "min": {v: min(t) for v, t in out.items()},
            },
            flush=True,
        )


if __name__ == "__main__":
    main()
