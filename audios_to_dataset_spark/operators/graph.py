"""Connected components by iterative min-label propagation.

The dedup endgame: near-dup PAIRS must become near-dup CLUSTERS (keep
one doc per component). Spark has no built-in CC; this is the classic
label-propagation loop — each node repeatedly adopts the minimum label
among itself and its neighbors until a fixpoint.

Scale notes: each iteration is one equi-join (labels ⋈ edges) + one
groupBy min — both shuffle on uniformly-distributed ids. Iteration count
is bounded by the graph diameter (near-dup clusters are tiny and dense,
so convergence is fast); `max_iter` caps pathological chains, and
convergence is detected with a cheap count instead of comparing full
frames. Labels are checkpointed via localCheckpoint each round to cut
the growing lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(id, cluster_id) where cluster_id = min node id reachable from id.

    ``nodes`` must have column ``id``; ``edges`` columns ``src``/``dst``
    (undirected — both directions are added here).
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = fwd.unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()

    labels = nodes.select("id", F.col("id").alias("label"))
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels, und.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
            .select(F.col("a").alias("id"), "nlabel")
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    "label", F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))
