"""Structured Streaming twins of the event-time plans (SURVEY §2.8, M7).

The reference is strictly batch; these are the engine-capability streaming
operators: watermarked tumbling-window aggregation and watermarked
dropDuplicates over the events table, executed with the availableNow
trigger against the same parquet so a batch driver can still collect the
result (the driver records a rows-only check — watermark semantics have
no DuckDB oracle).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over events.parquet with the batch-identical schema.

    The nanos→micros conversion matches catalog.load so streaming and
    batch plans see the same ``ts``.
    """
    batch_schema = load(spark, sf_dir, "events").schema
    raw_schema = ",".join(
        f"{f.name} {'BIGINT' if f.name == 'ts' else f.dataType.simpleString()}"
        for f in batch_schema.fields
    )
    # FileStreamSource requires a directory; glob-filter to the one table.
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Execute a streaming plan with the availableNow trigger into a
    memory sink and return the materialized batch DataFrame."""
    sink = f"stream_{query_name}_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix=f"ckpt_{query_name}_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(sink)


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked 1-hour tumbling window counts (append mode emits only
    windows the watermark has closed)."""
    ev = _stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events"
        )
    )
    return _run_available_now(agg, "tumbling")


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked dropDuplicates on (user_id, event_type) — the streaming
    analog of build-side first-wins dedup (J2)."""
    ev = _stream_events(spark, sf_dir)
    dedup = (
        ev.withWatermark("ts", "2 hours")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type", "event_id")
    )
    out = _run_available_now(dedup, "dedup")
    # one survivor per (user_id, event_type); which event wins is
    # arrival-order-dependent → project the deterministic part
    return out.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types")
    )


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join + watermarked tumbling aggregation: the events
    stream broadcast-joins the static customer dimension (stateless — each
    micro-batch probes the broadcast hash table, no join state), then a
    1-hour windowed count/decimal-sum per market segment. This is the
    canonical enrichment-then-aggregate streaming shape; at scale the
    static side is broadcast once per executor and the only state is the
    windowed aggregation's."""
    from ..plans._util import dsum

    ev = _stream_events(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(F.broadcast(cust), "user_id")
    agg = (
        joined.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )
    return _run_available_now(agg, "static_join")


def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked sliding windows (1 h / 30 min): each event feeds two
    overlapping windows; append mode emits closed windows only."""
    ev = _stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
    )
    return _run_available_now(agg, "sliding")


QUERIES = {
    "q_stream_tumbling": q_stream_tumbling,
    "q_stream_dedup": q_stream_dedup,
    "q_stream_sliding": q_stream_sliding,
    "q_stream_static_join": q_stream_static_join,
}

# q_stream_dedup stays rows-only (the surviving event per key is
# arrival-order dependent). The tumbling window IS oracle-checkable:
# availableNow + append mode emits exactly the windows whose end has
# passed the final watermark max(ts) - delay (verified empirically:
# 3370/3370 rows equal at sf0.01).
ORACLES: dict[str, str] = {
    "q_stream_tumbling": """
SELECT date_trunc('hour', ts) AS win_start, event_type,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR
       <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
""",
    "q_stream_sliding": """
WITH cand AS (
  SELECT ts,
         unnest([
           time_bucket(INTERVAL 30 MINUTE, ts),
           time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE
         ]) AS win_start
  FROM events
)
SELECT win_start, COUNT(*) AS n_events
FROM cand
WHERE ts >= win_start AND ts < win_start + INTERVAL 1 HOUR
GROUP BY win_start
HAVING win_start + INTERVAL 1 HOUR
       <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
""",
    "q_stream_static_join": """
SELECT date_trunc('hour', ts) AS win_start, c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR
       <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
""",
}
