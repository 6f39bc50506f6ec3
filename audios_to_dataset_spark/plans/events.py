"""Event-time plans over the events table (SURVEY §2.8).

The reference is strictly batch; these are the engine-capability windowed
aggregations the build plan (§7 M7) declares, each with a DuckDB oracle.
The Structured Streaming twins live in ``audios_to_dataset_spark.streaming``
and are checked rows-only (no SQL oracle for watermark semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ._util import dsum, dsum_sql

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, microseconds


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregation via F.window (epoch-aligned, so
    equivalent to date_trunc('hour') in SQL)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


ORACLE_TUMBLING_WINDOW = f"""
SELECT date_trunc('hour', ts) AS win_start, event_type,
       COUNT(*) AS n_events, {dsum_sql('value')} AS sum_value
FROM events GROUP BY 1, 2
"""


def q_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: new session when the gap to the previous event of
    the same user exceeds 30 min; lag + cumulative sum (SQL-expressible).

    Exact integer microsecond arithmetic keeps both engines bit-identical.
    """
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap = us - F.lag(us).over(w)
    is_new = F.when(
        gap.isNull() | (gap > SESSION_GAP_US), F.lit(1)
    ).otherwise(F.lit(0))
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_session = e.withColumn("session_id", F.sum(is_new).over(wc))
    return with_session.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


ORACLE_SESSION_GAP = f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                      > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM g
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_id
"""


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes: each event lands in two
    overlapping windows (F.window with a slide duration)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"), "n_events", "sum_value"
        )
    )


# Each event belongs to the two epoch-aligned 30-min-slide windows that
# contain it: starts at trunc30(ts) and trunc30(ts) - 30min.
ORACLE_SLIDING_WINDOW = f"""
WITH cand AS (
  SELECT ts, value,
         unnest([
           time_bucket(INTERVAL 30 MINUTE, ts),
           time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE
         ]) AS win_start
  FROM events
)
SELECT win_start, COUNT(*) AS n_events, {dsum_sql('value')} AS sum_value
FROM cand
WHERE ts >= win_start AND ts < win_start + INTERVAL 1 HOUR
GROUP BY win_start
"""


QUERIES = {
    "q_tumbling_window": q_tumbling_window,
    "q_session_gap": q_session_gap,
    "q_sliding_window": q_sliding_window,
}

ORACLES = {
    "q_tumbling_window": ORACLE_TUMBLING_WINDOW,
    "q_session_gap": ORACLE_SESSION_GAP,
    "q_sliding_window": ORACLE_SLIDING_WINDOW,
}
