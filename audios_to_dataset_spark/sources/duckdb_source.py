"""DuckDB-shard SOURCE — read the reference's own ``<idx>.duckdb``
outputs back into Spark (migration parity: a user of
RustedBytes/audios-to-dataset has directories of these, written by
src/main.rs:797-847; this source makes switching engines free, and it
round-trips our own sink, sinks/duckdb_sink.py, which replicates that
layout byte-for-byte).

Shape: the shard list is parallelized and each task opens ITS OWN
database read-only (the same single-reader-per-file model the sink
uses for writing) and scans ``files`` through DuckDB's Arrow surface —
so the payload never materializes on the driver and a 10k-shard
dataset reads with 10k-way parallelism. The nested ``audio`` struct is
rebuilt JVM-side from flat columns (pandas→Arrow struct columns are
avoided on purpose; flat columns keep the mapInPandas batches simple
and Arrow-friendly).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FIXED = {"id", "duration", "audio"}


def _spark_type(duck_type: str) -> T.DataType:
    d = duck_type.upper()
    if d == "BOOLEAN":
        return T.BooleanType()
    if d == "DOUBLE":
        return T.DoubleType()
    if d in ("INTEGER", "INT", "INT4"):
        return T.IntegerType()
    if d in ("BIGINT", "INT8"):
        return T.LongType()
    return T.StringType()


def read_duckdb_shards(spark: SparkSession, input_dir: str) -> DataFrame:
    """Read every ``<idx>.duckdb`` shard under ``input_dir`` into one
    DataFrame: ``shard`` (from the file name), ``id`` (the sink's
    0-based in-shard row index), ``duration``, the nested ``audio``
    struct (path, sampling_rate, bytes — the DuckDB sink's field
    order), then the metadata columns. Raises ``FileNotFoundError``
    when the directory holds no shards."""
    import glob

    import duckdb

    paths = sorted(
        glob.glob(os.path.join(input_dir, "*.duckdb")),
        key=lambda p: int(os.path.splitext(os.path.basename(p))[0])
        if os.path.splitext(os.path.basename(p))[0].isdigit()
        else 1 << 60,
    )
    if not paths:
        raise FileNotFoundError(f"no .duckdb shards under {input_dir}")

    # schema discovery from shard 0 (every shard shares the DDL — the
    # sink derives it from one dataset-wide widened schema)
    con = duckdb.connect(paths[0], read_only=True)
    desc = con.execute("DESCRIBE files").fetchall()
    con.close()
    meta_fields = [
        (name, _spark_type(typ))
        for name, typ, *_ in desc
        if name not in _FIXED
    ]

    flat_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("duration", T.DoubleType()),
            T.StructField("audio_path", T.StringType()),
            T.StructField("audio_sampling_rate", T.IntegerType()),
            T.StructField("audio_bytes", T.BinaryType()),
        ]
        + [T.StructField(n, t) for n, t in meta_fields]
    )
    meta_names = [n for n, _ in meta_fields]

    files_df = spark.createDataFrame(
        [(int(os.path.splitext(os.path.basename(p))[0]), p)
         for p in paths],
        "shard long, db_path string",
    ).repartition(min(len(paths), 256))

    def read_shards(batches):
        import duckdb as _duck
        import pandas as _pd

        for pdf in batches:
            for shard, db_path in zip(pdf["shard"], pdf["db_path"]):
                c = _duck.connect(db_path, read_only=True)
                t = c.execute(
                    "SELECT id, duration, audio.path AS audio_path, "
                    "audio.sampling_rate AS audio_sampling_rate, "
                    "audio.bytes AS audio_bytes"
                    + "".join(f', "{n}"' for n in meta_names)
                    + " FROM files ORDER BY id"
                ).fetch_df()
                c.close()
                t.insert(0, "shard", int(shard))
                yield _pd.DataFrame(
                    {f.name: t[f.name] for f in flat_schema.fields}
                )

    flat = files_df.mapInPandas(read_shards, flat_schema)
    return flat.select(
        "shard",
        "id",
        "duration",
        F.struct(
            F.col("audio_path").alias("path"),
            F.col("audio_sampling_rate").alias("sampling_rate"),
            F.col("audio_bytes").alias("bytes"),
        ).alias("audio"),
        *meta_names,
    )
