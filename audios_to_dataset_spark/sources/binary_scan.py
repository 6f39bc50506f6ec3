"""Audio-file scan source (S1-S5): recursive directory walk → DataFrame.

Reference behavior (/root/reference/src/main.rs:655-710):

- recursive walk skipping symlinks, depth capped (default 50)
- directories skipped (files only)
- the metadata file itself excluded (by normalized relative path AND by
  canonical absolute path)
- optional MIME filter keeping a 12-entry audio allow-list (:97-110)
- whole-file bytes read per file (:738-741)

Spark shape: ``binaryFile`` source with recursiveFileLookup — columns
(path, modificationTime, length, content). The depth cap and metadata
exclusion are path-expression filters (pushed before any content I/O, the
same hand-placed-filter-order the reference uses); the MIME check is a
magic-bytes prefix test on ``content`` — JVM-side expressions, no UDF.

Scale note: binaryFile carries whole files in rows (2 GB row limit). At
100 TB the scan parallelizes by file; `spark.sql.files.maxPartitionBytes`
bounds per-task working set, and cheap path filters run before content
materialization (SURVEY.md §4.1 caveat).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_MAX_DEPTH = 50  # src/main.rs:71-73


def normalize_path(col: Column) -> Column:
    """P1 (src/main.rs:112-122): backslash→slash, strip leading './'."""
    return F.regexp_replace(
        F.regexp_replace(col, r"\\", "/"), r"^(\./)+", ""
    )


def relative_path(col: Column, input_dir: str) -> Column:
    """P2 (src/main.rs:743-758): strip the input-dir prefix then normalize;
    empty result falls back to the basename."""
    # binaryFile paths arrive as file: URIs — strip the scheme first.
    no_scheme = F.regexp_replace(col, r"^file:/*", "/")
    prefix = os.path.abspath(input_dir).rstrip("/") + "/"
    rel = F.when(
        no_scheme.startswith(prefix),
        F.substring(no_scheme, len(prefix) + 1, 1 << 30),
    ).otherwise(no_scheme)
    rel = normalize_path(rel)
    base = F.element_at(F.split(rel, "/"), -1)
    return F.when(rel == "", base).otherwise(rel)


def basename(col: Column) -> Column:
    """P3 (src/main.rs:771-780): final path segment."""
    return F.element_at(F.split(normalize_path(col), "/"), -1)


def scan_audio_files(
    spark: SparkSession,
    input_dir: str,
    max_depth: int = DEFAULT_MAX_DEPTH,
    metadata_file: str | None = None,
    check_mime_type: bool = False,
    path_glob: str | None = None,
) -> DataFrame:
    """S1-S5: recursive binaryFile scan with the reference's filters.

    Returns columns: ``path`` (absolute), ``relative_path``, ``file_name``,
    ``content`` (binary), ``length``.
    """
    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    df = reader.load(input_dir)

    rel = relative_path(F.col("path"), input_dir)
    df = df.select(
        F.col("path"),
        rel.alias("relative_path"),
        basename(F.col("path")).alias("file_name"),
        F.col("content"),
        F.col("length"),
    )

    # Depth cap (S1): segments of the relative path ≤ max_depth.
    df = df.filter(
        F.size(F.split(F.col("relative_path"), "/")) <= max_depth
    )

    # Metadata-file self-exclusion (S3): by normalized relative path and
    # by absolute path (src/main.rs:650-659, 677-693).
    if metadata_file is not None:
        meta_abs = os.path.abspath(metadata_file)
        meta_rel = os.path.relpath(meta_abs, os.path.abspath(input_dir))
        meta_rel_norm = meta_rel.replace("\\", "/").lstrip("./")
        df = df.filter(
            (F.col("relative_path") != F.lit(meta_rel_norm))
            & (
                F.regexp_replace(F.col("path"), r"^file:/*", "/")
                != F.lit(meta_abs)
            )
        )

    if check_mime_type:
        from ..functions.mime import is_audio_content

        df = df.filter(is_audio_content(F.col("content")))

    return df
