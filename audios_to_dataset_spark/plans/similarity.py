"""Similarity-search plans over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..operators import similarity as S
from ._util import sround

QUERY_ID = 0
TOP_K = 20

_COS_CTE = """
WITH q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
  FROM embeddings WHERE vec_id = {qid}
), v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), scored AS (
  SELECT vec_id,
         round((
           list_sum(list_transform(range(1, len(e) + 1), i -> e[i] * qe[i]))
           / (sqrt(list_sum(list_transform(e, x -> x * x)))
              * sqrt(list_sum(list_transform(qe, x -> x * x))))
           * 1000.0)) / 1000.0 + 0.0 AS cos_sim
  FROM v, q
)
"""


def q_cosine_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of every embedding vs the query vector (vec_id=0) — the exact
    brute-force baseline, all rows returned."""
    em = load(spark, sf_dir, "embeddings")
    return S.cosine_vs_query(em, query_id=QUERY_ID)


ORACLE_COSINE_SCORES = _COS_CTE.format(qid=QUERY_ID) + """
SELECT vec_id, cos_sim FROM scored
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest neighbors of the query vector, ordered on the rounded
    score with vec_id tie-break (engine-independent cutoff)."""
    em = load(spark, sf_dir, "embeddings")
    return S.topk_vs_query(em, k=TOP_K, query_id=QUERY_ID)


ORACLE_ANN_TOPK = _COS_CTE.format(qid=QUERY_ID) + f"""
SELECT vec_id, cos_sim FROM scored
ORDER BY cos_sim DESC, vec_id LIMIT {TOP_K}
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components: posexplode + grouped decimal mean —
    the distributed embedding-aggregation shape (shuffles on (label,
    pos), perfectly uniform)."""
    from pyspark.sql import functions as F

    from ..catalog import load as _load

    em = _load(spark, sf_dir, "embeddings")
    flat = em.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    dec = F.sum(
        F.col("val").cast("double").cast("decimal(28,6)")
    ).cast("double")
    return (
        flat.filter(F.col("pos") < 8)
        .groupBy("label", "pos")
        .agg((dec / F.count("val")).alias("centroid"))
        .select(
            "label",
            F.col("pos").cast("long").alias("pos"),
            sround(F.col("centroid"), 6).alias("centroid"),
        )
    )


ORACLE_LABEL_CENTROIDS = """
SELECT label, pos,
       round((CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(28,6)))
                  AS DOUBLE) / COUNT(val)) * 1000000.0) / 1000000.0 + 0.0
         AS centroid
FROM (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS val
  FROM embeddings) t
WHERE pos < 8
GROUP BY label, pos
"""


QUERIES = {
    "q_cosine_scores": q_cosine_scores,
    "q_ann_topk": q_ann_topk,
    "q_label_centroids": q_label_centroids,
}

ORACLES = {
    "q_cosine_scores": ORACLE_COSINE_SCORES,
    "q_ann_topk": ORACLE_ANN_TOPK,
    "q_label_centroids": ORACLE_LABEL_CENTROIDS,
}
