"""Round-13 isolated A/B: r11-plan vs r12-plan pagerank (VERDICT r12
item 3 — prove or revert the §4 dangling-flag change).

The r12 change carried the loop-invariant dangling flag inside the node
frame (filter + agg per iteration) instead of materializing a dang_ids
frame and semi-joining ranks against it per iteration. The driver's r12
sf1 min-of-3 read 9.97 s vs the r11 record 7.58; the builder's settled
record read 7.99. This script answers which plan is actually faster on
a settled host at x10, min-of-N each, interleaved A/B/A/B so session
warmth cannot favour either side.

Usage: python tools/ab_pagerank_r13.py [--runs 3] [--sf1 /tmp/spark_graft_scale10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from audios_to_dataset_spark.catalog import load  # noqa: E402
from audios_to_dataset_spark.operators.graph import PR_DEC, pagerank  # noqa: E402
from audios_to_dataset_spark.plans._util import sround  # noqa: E402
from audios_to_dataset_spark.plans.sketches import (  # noqa: E402
    PR_DAMPING,
    PR_ITERS,
    PR_SUPP_OFFSET,
)
from audios_to_dataset_spark.session import get_session  # noqa: E402


def pagerank_r11(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    partitions: int | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Verbatim r11 pagerank (git a587a39^): dang_ids materialized at
    build, ranks semi-joined against it every iteration."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if partitions is not None:
        e = e.repartition(partitions, "src")
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    n_df = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "id", (F.lit(1.0) / F.col("n").cast("double")).alias("rank")
    )
    ew = e.join(outdeg, "src").localCheckpoint(eager=True)
    dang_ids = nodes.join(
        outdeg, nodes.id == outdeg.src, "left_anti"
    ).localCheckpoint(eager=True)

    for it in range(1, iters + 1):
        contrib = ew.join(ranks, ew.src == ranks.id).select(
            F.col("dst"),
            (F.col("rank") / F.col("deg").cast("double")).alias("c"),
        )
        inflow = contrib.groupBy("dst").agg(
            F.sum(F.col("c").cast(PR_DEC)).cast("double").alias("inflow")
        )
        dangling = (
            ranks.join(dang_ids, "id", "left_semi")
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast(PR_DEC)).cast("double"),
                    F.lit(0.0),
                ).alias("dmass")
            )
        )
        ranks = (
            nodes.join(inflow, nodes.id == inflow.dst, "left")
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping))
                    / F.col("n").cast("double")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dmass") / F.col("n").cast("double")
                    )
                ).alias("rank"),
            )
        )
        if it % checkpoint_every == 0 and it < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def build_edges(spark, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey").isNotNull())
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").cast("bigint").alias("src"),
            (F.col("l_suppkey").cast("bigint") + PR_SUPP_OFFSET).alias("dst"),
        )
        .distinct()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf1", default="/tmp/spark_graft_scale10")
    args = ap.parse_args()

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = args.sf1
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"sf1 dir missing: {sf_dir} (run scale_smoke --keep)")

    variants = {"r11": pagerank_r11, "r12": pagerank}
    p = spark.sparkContext.defaultParallelism

    def run(fn) -> float:
        t0 = time.perf_counter()
        r = fn(
            build_edges(spark, sf_dir),
            iters=PR_ITERS,
            damping=PR_DAMPING,
            partitions=p,
        )
        out = r.select(
            F.col("id").cast("bigint").alias("node_id"),
            sround(F.col("rank"), 9).alias("rank"),
        )
        out.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # one warmup each (not recorded) so codegen/JIT warmth is equal
    for name, fn in variants.items():
        spark.sparkContext.setJobDescription(f"warmup {name}")
        run(fn)
    results: dict[str, list[float]] = {k: [] for k in variants}
    for i in range(args.runs):
        for name, fn in variants.items():
            spark.sparkContext.setJobDescription(f"ab {name} run {i}")
            results[name].append(round(run(fn), 3))
    # equality spot-check: identical rounded ranks
    a = variants["r11"](
        build_edges(spark, sf_dir), iters=PR_ITERS,
        damping=PR_DAMPING, partitions=p,
    ).select("id", sround(F.col("rank"), 9).alias("rank"))
    b = variants["r12"](
        build_edges(spark, sf_dir), iters=PR_ITERS,
        damping=PR_DAMPING, partitions=p,
    ).select("id", sround(F.col("rank"), 9).alias("rank"))
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print({"runs": results,
           "min": {k: min(v) for k, v in results.items()},
           "rank_diff_rows": diff})


if __name__ == "__main__":
    main()
