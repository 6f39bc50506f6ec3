"""Loaders for the driver-generated testdata tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from .session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to always broadcast (region/nation are tiny
# at every SF; supplier stays small relative to facts).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    tune(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is TIMESTAMP(NANOS) parquet; with nanosAsLong it arrives as
    # long nanoseconds. Integer-divide to micros (matches DuckDB's ns→us
    # truncation) and restore a proper timestamp column.
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.typeName() in ("long", "bigint"):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif field.name == "ts" and field.dataType.typeName() == "timestamp_ntz":
            # Micros-precision testdata read before the inferTimestampNTZ
            # conf took effect (or under a locked-down session): reinterpret
            # the naive value as UTC wall-clock — identical instants under
            # the session zone pinned in session.tune. An unconditional
            # cast (not to_timestamp, which returns the session's
            # spark.sql.timestampType and is a no-op under a pinned
            # TIMESTAMP_NTZ default) guarantees an LTZ column.
            df = df.withColumn("ts", df["ts"].cast(TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql plans)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
