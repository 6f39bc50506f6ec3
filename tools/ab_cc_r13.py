"""Round-13 isolated A/B for the connected-components fixpoint loop
(VERDICT r12 item 4 — cut ROUNDS, not just jobs-per-round).

Variants, all provably bit-identical in their final labels (min-label
propagation's unique fixpoint is the component min; every step below is
monotone non-increasing and bounded by it):

  cur      — shipped r12 loop: neighbor-min, EAGER per-round checkpoint,
             Σlabel convergence agg (2 jobs/round).
  lazy     — same loop, but the per-round checkpoint is LAZY and the
             Σlabel agg is the single sequential consumer that
             materializes it (1 job/round; safe per the graph.py note —
             no concurrent consumer exists before .collect() returns).
  halve    — neighbor-min + pointer jumping (label ← label-of-label)
             each round: O(log d) rounds instead of O(d), one extra
             N-row join per round (Kiveris et al. large/small-star
             family, public literature).
  lazy+halve — both.

Each variant is swapped in via monkeypatching
audios_to_dataset_spark.operators.graph.connected_components (every
call site imports inside the function), then the DECLARED heavy CC
consumers run end-to-end through the noop sink, interleaved
A/B/A/B so session warmth favours no side. Also prints the round count
(graph.LAST_CC_ROUNDS) and cross-checks final labels for equality.

Usage: python tools/ab_cc_r13.py [--runs 3] [--sf /root/testdata/sf0.1]
           [--queries q_dedup_clusters,q_split_assign,q_dbscan]
           [--variants cur,lazy,halve,lazy+halve]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from audios_to_dataset_spark.operators import graph as G  # noqa: E402
from audios_to_dataset_spark.session import get_session  # noqa: E402


def _cc_loop(
    nodes: DataFrame,
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    lazy: bool,
    halve: bool,
) -> DataFrame:
    """The r12 loop with the two experimental dials."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = (
        fwd.unionByName(
            edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select("id", F.col("id").alias("label"))
    G.LAST_CC_ROUNDS = 0
    _lsum = F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
    prev_sum = labels.agg(_lsum).collect()[0][0]
    for _ in range(max_iter):
        G.LAST_CC_ROUNDS += 1
        neighbor_min = (
            und.join(labels, und.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
            .select(F.col("a").alias("id"), "nlabel")
        )
        new_labels = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.least("label", F.coalesce("nlabel", F.col("label"))).alias(
                "label"
            ),
        )
        if halve:
            # pointer jumping: label ← label(label). Every label value
            # is a node id (initially id; neighbor-min picks another
            # node's label; jumping picks label(label)), so the lookup
            # join always matches and labels stay within the component.
            ptr = new_labels.select(
                F.col("id").alias("_pid"), F.col("label").alias("_plab")
            )
            new_labels = (
                new_labels.join(
                    ptr, new_labels.label == ptr._pid, "left"
                )
                .select(
                    "id",
                    F.coalesce("_plab", F.col("label")).alias("label"),
                )
            )
        new_labels = new_labels.localCheckpoint(eager=not lazy)
        new_sum = new_labels.agg(_lsum).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select("id", F.col("label").alias("cluster_id"))


def make_variant(lazy: bool, halve: bool):
    def cc(nodes, edges, src="src", dst="dst", max_iter=20):
        return _cc_loop(nodes, edges, src, dst, max_iter, lazy, halve)

    return cc


VARIANTS = {
    "cur": None,  # the shipped operator, unpatched
    "lazy": make_variant(lazy=True, halve=False),
    "halve": make_variant(lazy=False, halve=True),
    "lazy+halve": make_variant(lazy=True, halve=True),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--queries",
        default="q_dedup_clusters,q_split_assign,q_dbscan",
    )
    ap.add_argument("--variants", default="cur,lazy,halve,lazy+halve")
    args = ap.parse_args()

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    from audios_to_dataset_spark.plans import all_queries

    queries = all_queries()
    names = args.queries.split(",")
    variant_names = args.variants.split(",")
    orig_cc = G.connected_components

    def run(qname: str, vname: str) -> tuple[float, int]:
        fn = VARIANTS[vname]
        G.connected_components = orig_cc if fn is None else fn
        try:
            t0 = time.perf_counter()
            queries[qname](spark, args.sf).write.mode("overwrite").format(
                "noop"
            ).save()
            return (
                round(time.perf_counter() - t0, 3),
                G.LAST_CC_ROUNDS,
            )
        finally:
            G.connected_components = orig_cc

    out: dict[str, dict[str, list[float]]] = {}
    rounds: dict[str, dict[str, int]] = {}
    for qname in names:
        out[qname] = {v: [] for v in variant_names}
        rounds[qname] = {}
        for v in variant_names:  # warmup, unrecorded
            spark.sparkContext.setJobDescription(f"warm {qname} {v}")
            _, r = run(qname, v)
            rounds[qname][v] = r
        for i in range(args.runs):
            for v in variant_names:
                spark.sparkContext.setJobDescription(f"{qname} {v} #{i}")
                t, _ = run(qname, v)
                out[qname][v].append(t)
        # equality: every variant's output vs the shipped operator's
        base = None
        for v in variant_names:
            fn = VARIANTS[v]
            G.connected_components = orig_cc if fn is None else fn
            try:
                df = queries[qname](spark, args.sf)
                if base is None:
                    base = df
                    continue
                d = df.exceptAll(base).count() + base.exceptAll(df).count()
                if d:
                    print(f"MISMATCH {qname} {v}: {d} rows differ")
            finally:
                G.connected_components = orig_cc
        print(
            {
                "query": qname,
                "runs": out[qname],
                "min": {v: min(t) for v, t in out[qname].items()},
                "cc_rounds": rounds[qname],
            },
            flush=True,
        )


if __name__ == "__main__":
    main()
