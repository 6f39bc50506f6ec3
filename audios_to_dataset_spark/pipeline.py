"""End-to-end audio→dataset pipeline — the reference's ``main()``
(/root/reference/src/main.rs:615-860) as one declarative DataFrame plan.

Stages (all lazy until the sink action):

  scan_audio_files (S1-S5)                — binaryFile + path filters
    → wav enrichment (P4)                 — pandas UDF header decode
    → load_metadata + widening (S6-S8)    — side table, lattice schema
    → lookup_join (J1-J3)                 — 3-level broadcast fallback
    → assign_shards (W1-W2)               — deterministic buckets
    → parquet / duckdb shard sink (S9-S13)

Catalyst supplies what the reference hand-codes: the path filters push
into the scan, the metadata side broadcasts (its Arc sharing), column
pruning drops unused fields, and the shard tasks fan out like the rayon
``par_bridge`` — but across executors, not threads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.wav import wav_info
from .operators.lookup_join import lookup_join
from .operators.sharding import DEFAULT_FILES_PER_SHARD, assign_shards
from .schema import TRANSCRIPTION, TRANSCRIPTION_DEFAULT
from .sources.binary_scan import DEFAULT_MAX_DEPTH, scan_audio_files
from .sources.metadata import load_metadata


def enrich_files(files: DataFrame) -> DataFrame:
    """P4+P5: WAV header decode → duration/sampling_rate columns."""
    info = wav_info(F.col("content"))
    return files.withColumn("_wav", info).select(
        "*",
        F.col("_wav.duration").alias("duration"),
        F.col("_wav.sampling_rate").alias("sampling_rate"),
    ).drop("_wav")


def build_dataset(
    spark: SparkSession,
    input_dir: str,
    metadata_file: str | None = None,
    max_depth: int = DEFAULT_MAX_DEPTH,
    check_mime_type: bool = False,
    files_per_shard: int = DEFAULT_FILES_PER_SHARD,
) -> DataFrame:
    """The full logical plan up to (but excluding) the sink."""
    files = scan_audio_files(
        spark,
        input_dir,
        max_depth=max_depth,
        metadata_file=metadata_file,
        check_mime_type=check_mime_type,
    )
    files = enrich_files(files)

    if metadata_file is not None:
        meta = load_metadata(spark, metadata_file)
        files = lookup_join(files, meta)
    else:
        # No metadata: every record still gets the transcription default
        # (MetadataStore::new → ensure_transcription_key,
        # src/main.rs:152-164).
        files = files.withColumn(
            TRANSCRIPTION, F.lit(TRANSCRIPTION_DEFAULT)
        )

    return assign_shards(files, files_per_shard)


def run_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    metadata_file: str | None = None,
    output_format: str = "parquet",
    compression: str = "snappy",
    files_per_shard: int = DEFAULT_FILES_PER_SHARD,
    max_depth: int = DEFAULT_MAX_DEPTH,
    check_mime_type: bool = False,
) -> list:
    """Run scan→enrich→join→shard→sink; returns the write receipts."""
    sharded = build_dataset(
        spark,
        input_dir,
        metadata_file=metadata_file,
        max_depth=max_depth,
        check_mime_type=check_mime_type,
        files_per_shard=files_per_shard,
    )
    if output_format == "parquet":
        from .sinks.parquet_shards import write_parquet_shards

        receipts = write_parquet_shards(
            sharded, output_dir, compression=compression
        )
    elif output_format == "duckdb":
        from .sinks.duckdb_sink import write_duckdb_shards

        receipts = write_duckdb_shards(sharded, output_dir)
    else:
        raise ValueError(
            f"unknown output_format {output_format!r}; parquet|duckdb"
        )
    return receipts.collect()
