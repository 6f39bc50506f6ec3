"""Hive-partitioned parquet sink with dynamic partition overwrite.

The lake-layout counterpart to the HF shard sink (parquet_shards.py):
instead of fixed-size numbered shards, rows are laid out as
``<root>/<col>=<value>/part-*.parquet`` so downstream reads with a
partition-column predicate scan only the matching directories (Spark's
partition pruning — zero data files touched for pruned partitions).

Dynamic overwrite (``spark.sql.sources.partitionOverwriteMode=dynamic``)
replaces ONLY the partitions present in the incoming frame — the
idempotent daily-backfill semantics a 100 TB pipeline needs: re-running
one day's job must not wipe every other day. Static overwrite (Spark's
default) would truncate the whole root first.

No analog in the reference (it writes flat numbered shards,
/root/reference/src/main.rs:718-760); engine-capability extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Write ``df`` as hive-partitioned parquet under ``path``.

    With ``dynamic=True`` (the default) an overwrite replaces only the
    partitions that appear in ``df``; other partitions on disk survive.
    The conf is set per-write and restored afterwards so the session's
    global behavior is untouched.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    try:
        spark.conf.set(key, "dynamic" if dynamic else "static")
        df.write.mode(mode).partitionBy(*partition_by).parquet(path)
    finally:
        spark.conf.set(key, prev)


def read_partitioned(spark, path: str) -> DataFrame:
    """Read the partitioned layout back; partition columns are recovered
    from the directory names and pruned by any equality/range predicate
    (assert via ``.explain`` → ``PartitionFilters``)."""
    return spark.read.parquet(path)
