"""Document-curation pipeline CLI — the LLM-data twin of the audio ETL:

    python -m audios_to_dataset_spark.curate \\
        --input /data/documents.parquet --output /data/shards \\
        --seq-len 512 --source-cap 100000

Stages (each one a declared, oracle-checked query shape — see
plans/dedup.py, plans/textops.py, plans/textops2.py):

1. exact dedup      — sha256 content groups, min-id survivor
2. near dedup       — MinHash(16)+LSH(4×4) candidates; a doc is dropped
                      when ≥ ``--est-threshold`` of its sketch agrees
                      with a LOWER-id doc (the one-pass survivor rule;
                      full connected-component clustering is the
                      ``q_dedup_clusters``/``q_dedup_survivors`` path)
3. quality gate     — keep the top half per language by distinct-token
                      ratio (integer rank·2 ≤ n cutoff, q_quality_filter)
4. source cap       — ≤ ``--source-cap`` docs per source, md5 lottery
5. sequence packing — concat-and-chunk seq_id per language at
                      ``--seq-len`` whitespace tokens
6. sharded write    — parquet partitioned by lang (dynamic overwrite)

Every stage is JVM-side (one pandas-free plan end to end); stage counts
print as one JSON report line for pipeline monitoring.

Scale notes: the near-dedup shuffle keys are band hashes (uniform), the
cap/pack windows partition by source/lang, and the final write is
partitioned — nothing funnels through a single task at 100 TB.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import dedup as D

NUM_HASHES = 16
BAND_SIZE = 4
NGRAM_N = 3


def _tokens():
    return F.split(F.lower("text"), " ")


def exact_dedup(docs: DataFrame) -> DataFrame:
    h = F.sha2("text", 256)
    w = Window.partitionBy("h").orderBy("doc_id")
    return (
        docs.withColumn("h", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("h", "_rn")
    )


def near_dedup(docs: DataFrame, est_threshold: float) -> DataFrame:
    sigs = D.minhash_signatures(docs, num_hashes=NUM_HASHES, n=NGRAM_N)
    pairs = D.lsh_candidate_pairs(
        sigs, num_hashes=NUM_HASHES, band_size=BAND_SIZE
    )
    a = sigs.select(
        F.col("id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    b = sigs.select(
        F.col("id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(NUM_HASHES)
    )
    # doc_a < doc_b by construction: doc_b is the younger duplicate
    drops = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .filter(agree.cast("double") / float(NUM_HASHES) >= est_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    return docs.join(drops, "doc_id", "left_anti")


def quality_gate(docs: DataFrame) -> DataFrame:
    toks = F.filter(_tokens(), lambda t: t != "")
    quality = (
        F.size(F.array_distinct(toks)).cast("double")
        / F.greatest(F.size(toks), F.lit(1)).cast("double")
    )
    scored = docs.withColumn("_q", quality)
    w = Window.partitionBy("lang").orderBy(
        F.col("_q").desc(), "doc_id"
    )
    n = Window.partitionBy("lang")
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(n))
        .filter(F.col("_rk") * 2 <= F.col("_n"))
        .drop("_q", "_rk", "_n")
    )


def source_cap(docs: DataFrame, cap: int) -> DataFrame:
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def pack_sequences(docs: DataFrame, seq_len: int) -> DataFrame:
    n_tok = F.size(_tokens()).cast("bigint")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    return (
        docs.withColumn("n_tok", n_tok)
        .withColumn(
            "seq_id",
            ((F.sum("n_tok").over(w) - F.col("n_tok")) / seq_len).cast(
                "bigint"
            ),
        )
        .withColumn("cum_tok", cum)
    )


def run_curation(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    seq_len: int = 512,
    cap: int = 100_000,
    est_threshold: float = 0.5,
) -> dict:
    docs = spark.read.parquet(input_path)
    report = {"input": docs.count()}
    docs = exact_dedup(docs)
    report["after_exact_dedup"] = docs.count()
    docs = near_dedup(docs, est_threshold)
    report["after_near_dedup"] = docs.count()
    docs = quality_gate(docs)
    report["after_quality_gate"] = docs.count()
    docs = source_cap(docs, cap)
    report["after_source_cap"] = docs.count()
    packed = pack_sequences(docs, seq_len)
    (
        packed.write.mode("overwrite")
        .partitionBy("lang")
        .parquet(output_dir)
    )
    report["sequences"] = (
        packed.groupBy("lang", "seq_id").count().count()
    )
    report["output"] = output_dir
    return report


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="audios_to_dataset_spark.curate",
        description="Curate a document corpus into packed training shards.",
    )
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--output", required=True, help="output shard dir")
    p.add_argument("--seq-len", type=int, default=512)
    p.add_argument("--source-cap", type=int, default=100_000)
    p.add_argument(
        "--est-threshold",
        type=float,
        default=0.5,
        help="MinHash agreement fraction above which the younger doc drops",
    )
    args = p.parse_args(argv)

    from .session import get_session

    spark = get_session("curate")
    report = run_curation(
        spark,
        args.input,
        args.output,
        seq_len=args.seq_len,
        cap=args.source_cap,
        est_threshold=args.est_threshold,
    )
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
