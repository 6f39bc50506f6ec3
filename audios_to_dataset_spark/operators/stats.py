"""Dataset QA summary: the post-ingest sanity report.

The reference logs per-shard row counts (src/main.rs:610, 712); a real
pipeline wants durations, sampling-rate mix, byte totals, and decode
failures in one cheap pass — a single grouped aggregation, no collect of
media columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summarize_dataset(df: DataFrame) -> DataFrame:
    """One-row summary of an enriched dataset (expects columns duration,
    sampling_rate, length)."""
    return df.agg(
        F.count("*").alias("n_files"),
        F.sum(F.col("duration").cast("decimal(28,6)"))
        .cast("double")
        .alias("total_duration_s"),
        F.min("duration").alias("min_duration_s"),
        F.max("duration").alias("max_duration_s"),
        F.sum("length").alias("total_bytes"),
        F.count(F.when(F.col("sampling_rate") == 0, 1)).alias(
            "n_decode_failures"
        ),
        F.countDistinct("sampling_rate").alias("n_distinct_rates"),
    )


def rate_histogram(df: DataFrame) -> DataFrame:
    """(sampling_rate, n_files, total_duration_s) — the corpus mix."""
    return (
        df.groupBy("sampling_rate")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(F.col("duration").cast("decimal(28,6)"))
            .cast("double")
            .alias("total_duration_s"),
        )
    )


def shard_report(receipts: DataFrame | list) -> list:
    """Normalize sink receipts into a sorted [(shard, n_rows, path)]."""
    rows = receipts.collect() if isinstance(receipts, DataFrame) else receipts
    return sorted((r.shard, r.n_rows, r.out_path) for r in rows)
