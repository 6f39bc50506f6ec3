"""audios_to_dataset_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``RustedBytes/audios-to-dataset`` (a Rust audio→Parquet/DuckDB
shard pipeline), re-expressed Spark-first: declarative DataFrame plans,
Catalyst optimization, broadcast joins, window functions, pandas UDFs only
where built-ins cannot express the semantics (WAV header decode, MIME
sniffing, sharded pyarrow sinks).

Layout
------
- ``session``    SparkSession factory tuned for scale (AQE, broadcast, Arrow)
- ``catalog``    loaders for the driver testdata tables
- ``schema``     metadata schema inference + type-widening lattice (§1.3)
- ``sources``    binaryFile audio scan, CSV/JSONL metadata loaders (S1-S8)
- ``functions``  path/wav/mime/text/vector scalar function surface (§2.7)
- ``operators``  lookup join, dedup family, similarity search, sharding
- ``plans``      the declarative query plans exposed via __spark_entry__
- ``sinks``      HF-footer parquet shard writer, DuckDB shard sink (S9-S13)
- ``streaming``  Structured Streaming variants of the event-time plans
"""

__version__ = "0.1.0"
