"""Path-utility plans (A2 + csv_path_rewriter parity) over documents."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.paths import rewrite_paths

_SYNTH_PATH = "concat('data/', source, '/f', doc_id, '.wav')"

# a path can't be synthesized from missing fields — and the engines
# disagree on NULL concat args (Spark NULLs the result, DuckDB skips
# the NULL), so both path queries filter them identically
# (--nulls sweep)
_SYNTH_OK = "doc_id IS NOT NULL AND source IS NOT NULL"


def q_common_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-common-dir-prefix via the min/max extremes trick (A2,
    scripts/csv_path_rewriter.py:72-79): the LCP of all strings equals the
    LCP of the lexicographic min and max — one aggregation, no full fold."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.expr(_SYNTH_OK))
        .select(F.expr(_SYNTH_PATH).alias("p"))
    )
    mm = d.agg(F.min("p").alias("lo"), F.max("p").alias("hi"))
    lcp_len = F.expr(
        "size(filter(sequence(1, least(length(lo), length(hi))),"
        " i -> substring(lo, 1, i) = substring(hi, 1, i)))"
    )
    out = mm.withColumn("lcp_len", lcp_len).withColumn(
        "prefix", F.expr("substring(lo, 1, lcp_len)")
    )
    dir_prefix = F.when(
        F.col("prefix").contains("/"),
        F.regexp_extract("prefix", r"^(.*)/[^/]*$", 1),
    ).otherwise(F.lit(""))
    return out.select(dir_prefix.alias("common_prefix"))


ORACLE_COMMON_PREFIX = f"""
WITH p AS (SELECT {_SYNTH_PATH} AS p FROM documents WHERE {_SYNTH_OK}),
mm AS (SELECT min(p) AS lo, max(p) AS hi FROM p),
l AS (
  SELECT lo, hi,
         len(list_filter(range(1, least(length(lo), length(hi)) + 1),
             i -> substr(lo, 1, CAST(i AS INT))
                  = substr(hi, 1, CAST(i AS INT)))) AS lcp_len
  FROM mm
)
SELECT CASE WHEN contains(substr(lo, 1, CAST(lcp_len AS INT)), '/')
            THEN regexp_extract(substr(lo, 1, CAST(lcp_len AS INT)),
                                '^(.*)/[^/]*$', 1)
            ELSE '' END AS common_prefix
FROM l
"""


def q_path_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """csv_path_rewriter transform (scripts/csv_path_rewriter.py:105-136):
    basename + relative path against a base dir, fixed column order."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.expr(_SYNTH_OK))
        .select(
            F.expr(_SYNTH_PATH).alias("file_name"),
            F.substring("text", 1, 20).alias("transcription"),
        )
    )
    return rewrite_paths(d, base_dir="data")


ORACLE_PATH_REWRITE = f"""
SELECT (string_split({_SYNTH_PATH}, '/'))[-1] AS file_name,
       substr({_SYNTH_PATH}, length('data/') + 1) AS relative_path,
       substr(text, 1, 20) AS transcription
FROM documents WHERE {_SYNTH_OK}
"""


def q_dir_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical directory rollup (``du -s`` semantics) — the scan
    summary a dataset ingest prints per source tree (the reference
    walks exactly such a tree, src/main.rs:718): each doc gets a
    3-level synthetic path (data/<source>/sub<doc_id%7>/f<id>.txt),
    every ANCESTOR prefix is generated JVM-side (transform over a
    sequence + slice + array_join — no UDF, no self-join), and one
    explode+groupBy yields per-directory file counts and char totals
    at every depth simultaneously. At 100 TB this is the one-pass
    alternative to running one aggregation per level: ancestors
    multiply rows only by the (tiny, bounded) path depth."""
    d = load(spark, sf_dir, "documents").filter(F.expr(_SYNTH_OK))
    path = F.concat(
        F.lit("data/"),
        F.col("source"),
        F.lit("/sub"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("/f"),
        F.col("doc_id").cast("string"),
        F.lit(".txt"),
    )
    parts = F.split(path, "/")
    ancestors = F.transform(
        F.sequence(F.lit(1), F.size(parts) - 1),
        lambda i: F.array_join(F.slice(parts, 1, i), "/"),
    )
    return (
        d.select(
            F.explode(ancestors).alias("dir"),
            F.col("n_chars"),
        )
        .groupBy("dir")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .select(
            "dir",
            F.size(F.split(F.col("dir"), "/")).cast("bigint").alias(
                "depth"
            ),
            "n_files",
            "total_chars",
        )
        .orderBy("dir")
    )


ORACLE_DIR_ROLLUP = f"""
WITH p AS (
  SELECT string_split('data/' || source || '/sub'
           || CAST(doc_id % 7 AS VARCHAR) || '/f'
           || CAST(doc_id AS VARCHAR) || '.txt', '/') AS parts,
         n_chars
  FROM documents WHERE {_SYNTH_OK}
), anc AS (
  SELECT array_to_string(list_slice(parts, 1, i), '/') AS dir, n_chars
  FROM p, unnest(range(1, len(parts))) AS t(i)
)
SELECT dir, CAST(len(string_split(dir, '/')) AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM anc GROUP BY dir ORDER BY dir
"""


QUERIES = {
    "q_common_prefix": q_common_prefix,
    "q_path_rewrite": q_path_rewrite,
    "q_dir_rollup": q_dir_rollup,
}

ORACLES = {
    "q_common_prefix": ORACLE_COMMON_PREFIX,
    "q_path_rewrite": ORACLE_PATH_REWRITE,
    "q_dir_rollup": ORACLE_DIR_ROLLUP,
}
