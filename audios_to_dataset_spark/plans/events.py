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
from ._util import davg, davg_sql, dsum, dsum_sql, sround, sround_sql

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, microseconds


def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregation via F.window (epoch-aligned, so
    equivalent to date_trunc('hour') in SQL)."""
    e = load(spark, sf_dir, "events")
    # NULL-ts events cannot be windowed: Spark's F.window silently drops
    # them while date_trunc groups them into a NULL bucket — filter
    # explicitly on BOTH sides so the semantics are pinned, not
    # incidental (caught by the --nulls sweep).
    return (
        e.filter(F.col("ts").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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
FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
"""


def q_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: new session when the gap to the previous event of
    the same user exceeds 30 min; lag + cumulative sum (SQL-expressible).

    Exact integer microsecond arithmetic keeps both engines bit-identical.
    """
    # Unstamped events can't be placed on a timeline — drop NULL ts on
    # both sides (Spark orders NULLs first ASC, DuckDB last, so leaving
    # them in makes session boundaries engine-dependent; --nulls sweep).
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
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
  FROM events WHERE ts IS NOT NULL
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


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: hourly event counts per type over the full
    observed range, with missing hours materialized as zero rows.

    The spine (hours × types) is generated with ``sequence`` + ``explode``
    and stays tiny even at 100 TB (years of hourly buckets × a handful of
    types), so it is broadcast to the aggregated counts — the only
    shuffle is the counts groupBy itself, which is map-side combinable.
    """
    e = load(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("win_start")
    )
    types = e.select("event_type").distinct()
    spine = hours.crossJoin(types)
    counts = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("win_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    # Right-outer keeps every spine row while broadcasting the (small,
    # pre-aggregated) counts side — BroadcastHashJoin supports building
    # the non-preserved side only.
    return (
        F.broadcast(counts)
        .join(spine, ["win_start", "event_type"], "right")
        .select(
            "win_start",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


ORACLE_GAP_FILL = """
WITH b AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
), hours AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS win_start FROM b
), types AS (
  SELECT DISTINCT event_type FROM events
), c AS (
  SELECT date_trunc('hour', ts) AS win_start, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT hours.win_start, types.event_type,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM hours CROSS JOIN types
LEFT JOIN c ON c.win_start = hours.win_start
           AND c.event_type = types.event_type
"""

Z_THRESHOLD = 3.0


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers: events whose value sits more than 3
    standard deviations from the type mean.

    Mean and E[x²] go through the order-independent decimal sum so both
    engines derive bit-identical doubles; the z expression is then the
    same IEEE arithmetic on both sides, and the filter compares the
    *rounded* z so no boundary row can flip between engines. Stats are a
    5-row broadcast — the scan is the only distributed work.
    """
    e = load(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        davg("value").alias("mean"),
        davg(F.col("value") * F.col("value")).alias("m2"),
    )
    std = F.sqrt(F.col("m2") - F.col("mean") * F.col("mean"))
    z = sround((F.col("value") - F.col("mean")) / std, 6)
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id", "event_type", "value", z.alias("z")
        )
        .filter(F.abs(F.col("z")) > Z_THRESHOLD)
    )


ORACLE_ANOMALY_ZSCORE = f"""
WITH s AS (
  SELECT event_type, {davg_sql('value')} AS mean,
         {davg_sql('value * value')} AS m2
  FROM events GROUP BY event_type
), scored AS (
  SELECT event_id, e.event_type, value,
         {sround_sql('(value - mean) / sqrt(m2 - mean * mean)', 6)} AS z
  FROM events e JOIN s ON e.event_type = s.event_type
)
SELECT event_id, event_type, value, z FROM scored
WHERE abs(z) > {Z_THRESHOLD}
"""


ROLLING_US = 30 * 60 * 1_000_000  # trailing 30 minutes, microseconds


def q_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-minute per-user rolling aggregate via a RANGE window
    frame over integer microseconds — the event-time rolling feature
    (rate counters, trailing spend) that tumbling windows can't express.

    RANGE frames group ties by order *value*, so the result is
    independent of intra-tick row order on both engines; sums go through
    the decimal discipline. Scale: one window per user partition — the
    same shuffle profile as sessionization.
    """
    e = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-ROLLING_US, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_30m"),
        F.sum(F.col("value").cast("decimal(28,6)"))
        .over(w)
        .cast("double")
        .alias("sum_30m"),
    )


ORACLE_ROLLING_SUM = f"""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_30m,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sum_30m
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {ROLLING_US} PRECEDING AND CURRENT ROW)
"""


SEQ_PATTERN = "v[^p]*c[^s]*p"  # view … click … purchase, in order


def q_event_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (MATCH_RECOGNIZE-lite): encode each
    user's time-ordered events as an initials string and regex-match the
    view→click→purchase journey.

    collect_list over a (ts, event_id)-sorted window gives a
    deterministic encoding; the regex runs per user row (tiny), so the
    heavy lifting is one user_id shuffle — the same profile as
    sessionization, with the pattern logic free on top.
    """
    # timeline op: drop unstamped events on both sides (--nulls sweep;
    # NULL-ts ordering differs between engines)
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    seq = (
        e.withColumn(
            "enc", F.substring(F.col("event_type"), 1, 1)
        )
        .withColumn("journey", F.concat_ws("", F.collect_list("enc").over(w)))
        .groupBy("user_id")
        .agg(F.first("journey").alias("journey"))
    )
    return seq.select(
        "user_id",
        F.length("journey").cast("long").alias("n_events"),
        F.col("journey").rlike(SEQ_PATTERN).alias("converted"),
    ).orderBy("user_id")


ORACLE_EVENT_SEQUENCE = f"""
WITH seq AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
           AS journey
  FROM events WHERE ts IS NOT NULL GROUP BY user_id
)
SELECT user_id, CAST(length(journey) AS BIGINT) AS n_events,
       regexp_matches(journey, '{SEQ_PATTERN}') AS converted
FROM seq ORDER BY user_id
"""


def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive event
    types per user timeline (lag window + groupBy) with the row-
    conditional probability — the behavioral-model fit step. Integer
    counts; one double division against the broadcast-size from-totals.
    """
    # timeline op: drop unstamped events on both sides (--nulls sweep)
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNotNull())
        .groupBy(F.col("prev").alias("from_type"),
                 F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("n").cast("bigint").alias("tot")
    )
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .select(
            "from_type", "to_type", "n",
            (F.col("n").cast("double") / F.col("tot").cast("double"))
            .alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


ORACLE_TRANSITIONS = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events WHERE ts IS NOT NULL
), c AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
), t AS (
  SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY from_type
)
SELECT c.from_type, c.to_type, c.n,
       CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
FROM c JOIN t USING (from_type)
ORDER BY c.from_type, c.to_type
"""


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via the built-in ``session_window`` operator (the
    merging-interval aggregate Spark provides natively, vs the manual
    lag+cumsum in q_session_gap) — same 30-minute gap, so the oracle is
    the identical session CTE projected to window bounds.

    session_window's merge happens inside the aggregation, no window
    function pass at all — at scale this is one shuffle on (user_id)
    with map-side partial merging, strictly cheaper than the two window
    passes of the manual formulation.
    """
    # timeline op: drop unstamped events on both sides (--nulls sweep;
    # session_window silently drops NULL ts, the oracle must match)
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        e.groupBy(
            "user_id",
            F.session_window("ts", "30 minutes").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            # session_window's end = last event + gap; project to the
            # last-event bound so the oracle needs no gap arithmetic
            (F.unix_micros(F.col("w.end")) - SESSION_GAP_US).alias(
                "last_event_us"
            ),
            "n_events",
        )
    )


ORACLE_SESSION_WINDOW = f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                      > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, MIN(ts) AS session_start,
       epoch_us(MAX(ts)) AS last_event_us,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: per-user event-type counts packed into
    a map (map_from_entries over a sorted entry array), consumed with
    map_values + a HOF sum, and serialized via to_json for the
    cross-engine comparison (map key order is pinned by the sort, so
    the JSON string is canonical). A NULL event_type cannot be a map
    key (Spark raises NULL_MAP_KEY — one dirty row would kill the whole
    job) — untyped events are dropped on BOTH sides (--nulls sweep)."""
    e = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    per = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("event_type", "n")))
    )
    return (
        per.groupBy("user_id")
        .agg(m.alias("m"))
        .select(
            "user_id",
            F.to_json(F.col("m")).alias("type_counts"),
            F.size(F.map_keys(F.col("m"))).cast("long").alias("n_types"),
            F.aggregate(
                F.map_values(F.col("m")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("total_events"),
        )
    )


ORACLE_MAP_FUNCS = """
WITH per AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE event_type IS NOT NULL GROUP BY user_id, event_type
)
SELECT user_id,
       '{' || string_agg('"' || event_type || '":' || n, ','
                         ORDER BY event_type) || '}' AS type_counts,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(n) AS BIGINT) AS total_events
FROM per GROUP BY user_id
"""


def q_behavior_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity as Gini impurity over event types —
    1 − Σ(nᵢ/n)², the entropy-style concentration measure with NO
    logarithm (exact integer sums, one final IEEE division of exact
    bigints — bit-identical across engines). Two linear aggs; the
    histogram binning of the score is a third tiny agg. Output is the
    diversity distribution (users per 0.01-wide band), so the result
    stays dashboard-sized at any user count."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i")
    )
    per_user = per_type.groupBy("user_id").agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum(F.col("n_i") * F.col("n_i")).cast("bigint").alias("sq"),
    )
    gini = F.lit(1.0) - (
        F.col("sq").cast("double")
        / (F.col("n") * F.col("n")).cast("double")
    )
    return (
        per_user.select(
            F.floor(gini * 100).cast("bigint").alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("band")
    )


ORACLE_BEHAVIOR_DIVERSITY = """
WITH per_type AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_i
  FROM events GROUP BY user_id, event_type),
per_user AS (
  SELECT user_id, CAST(SUM(n_i) AS BIGINT) AS n,
         CAST(SUM(n_i * n_i) AS BIGINT) AS sq
  FROM per_type GROUP BY user_id),
banded AS (
  SELECT CAST(floor((1.0 - CAST(sq AS DOUBLE)
              / CAST(n * n AS DOUBLE)) * 100) AS BIGINT) AS band
  FROM per_user)
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_users
FROM banded GROUP BY band ORDER BY band
"""


CONCUR_DUR_US = 1_800_000_000


def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type — the classic sweep-line: each
    event is a 30-minute interval, exploded into +1/-1 boundary deltas,
    cumulative-summed in time order (ends sort before starts at a tie,
    so touching intervals don't double-count). MAX of the running sum
    is invariant to tie order among equal (t, delta) rows, so the
    result is deterministic even though the window's tie-break isn't.
    Partitioned by event_type — each type sweeps independently."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    starts = ev.select(
        "event_type", us.alias("t"), F.lit(1).cast("long").alias("delta")
    )
    ends = ev.select(
        "event_type",
        (us + CONCUR_DUR_US).alias("t"),
        F.lit(-1).cast("long").alias("delta"),
    )
    sweep = starts.unionByName(ends)
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sweep.select(
        "event_type", F.sum("delta").over(w).alias("cur")
    )
    return (
        cum.groupBy("event_type")
        .agg(F.max("cur").cast("bigint").alias("max_concurrent"))
        .orderBy("event_type")
    )


ORACLE_CONCURRENCY = f"""
WITH sweep AS (
  SELECT event_type, epoch_us(ts) AS t, CAST(1 AS BIGINT) AS delta
  FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + {CONCUR_DUR_US} AS t,
         CAST(-1 AS BIGINT) AS delta
  FROM events),
cum AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS cur
  FROM sweep)
SELECT event_type, CAST(MAX(cur) AS BIGINT) AS max_concurrent
FROM cum GROUP BY event_type ORDER BY event_type
"""


def q_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness profile — the measurement that picks a streaming
    watermark: treating event_id as arrival order, an event's lateness
    is how far the per-type running-max event time has already advanced
    past it. Reports per type: events, late events, max and mean
    lateness (µs), and how many would be dropped by a 1-hour watermark.
    All integer-microsecond arithmetic; the running max partitions by
    event_type (no global window)."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lateness = F.greatest(
        F.max(us).over(w) - us, F.lit(0).cast("bigint")
    )
    per = ev.select(
        "event_type", lateness.alias("late_us")
    )
    hour_us = 3_600_000_000
    return (
        per.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_late"),
            F.max("late_us").cast("bigint").alias("max_late_us"),
            (
                F.sum("late_us").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_late_us"),
            F.sum(F.when(F.col("late_us") > hour_us, 1).otherwise(0))
            .cast("bigint")
            .alias("dropped_1h_watermark"),
        )
        .orderBy("event_type")
    )


ORACLE_LATENESS = """
WITH per AS (
  SELECT event_type,
         greatest(MAX(epoch_us(ts)) OVER (PARTITION BY event_type
                    ORDER BY event_id ROWS UNBOUNDED PRECEDING)
                  - epoch_us(ts), CAST(0 AS BIGINT)) AS late_us
  FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(MAX(late_us) AS BIGINT) AS max_late_us,
       CAST(SUM(late_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS mean_late_us,
       CAST(SUM(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS dropped_1h_watermark
FROM per GROUP BY event_type ORDER BY event_type
"""


EWMA_TERMS = 8


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-decay rolling average (EWMA, half-life 1 step) of each
    user's event values over the trailing {EWMA_TERMS} events — the
    smoothing pass monitoring pipelines run per entity.

    Determinism without transcendentals: the EWMA is a FIXED-ORDER sum
    of lag terms (v·1 + lag1·0.5 + lag2·0.25 + …). Every weight is a
    power of two (exact double scaling), every add happens in the same
    textual order in both engines, and IEEE ops are deterministic — so
    no rounding discipline is needed at all. Windows partition by
    user_id (one shuffle, no global sort); the {EWMA_TERMS}-term
    expression stays inside whole-stage codegen."""
    # timeline op: drop unstamped events on both sides (--nulls sweep)
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    num = F.col("value") * F.lit(1.0)
    den = F.lit(1.0)
    for j in range(1, EWMA_TERMS):
        lj = F.lag("value", j).over(w)
        wj = 1.0 / float(2**j)
        num = num + F.coalesce(lj * F.lit(wj), F.lit(0.0))
        den = den + F.when(lj.isNull(), 0.0).otherwise(wj)
    return ev.select(
        "user_id",
        "event_id",
        us.alias("ts_us"),
        (num / den).alias("ewma"),
    ).orderBy("user_id", "ts_us", "event_id")


def _oracle_ewma() -> str:
    num = ["value * 1.0"]
    den = ["1.0"]
    for j in range(1, EWMA_TERMS):
        wj = repr(1.0 / float(2**j))
        num.append(f"COALESCE(lag(value, {j}) OVER w * {wj}, 0.0)")
        den.append(
            f"CASE WHEN lag(value, {j}) OVER w IS NULL THEN 0.0"
            f" ELSE {wj} END"
        )
    return f"""
SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       ({" + ".join(num)}) / ({" + ".join(den)}) AS ewma
FROM events WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
ORDER BY user_id, ts_us, event_id
"""


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 interval build — the lakehouse dimension-history op:
    collapse each user's event stream into [valid_from, valid_to)
    event_type intervals, a new interval only when the type CHANGES
    (consecutive repeats merge), the open interval flagged current.

    All windows partition by user_id (scale-safe: one shuffle on the
    dimension key, no global sort); timestamps stay integer
    microseconds end to end (unix_micros ↔ epoch_us)."""
    # timeline op: drop unstamped events on both sides (--nulls sweep)
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        us.alias("ts_us"),
        "event_id",
        (
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type"))
        ).alias("is_start"),
    )
    starts = marked.filter("is_start")
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return starts.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(w2).alias("valid_to_us"),
        F.lead("ts_us").over(w2).isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from_us")


ORACLE_SCD2 = """
WITH marked AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         (lag(event_type) OVER w IS NULL
          OR lag(event_type) OVER w <> event_type) AS is_start
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
starts AS (SELECT * FROM marked WHERE is_start)
SELECT user_id, event_type, ts_us AS valid_from_us,
       lead(ts_us) OVER w2 AS valid_to_us,
       (lead(ts_us) OVER w2 IS NULL) AS is_current
FROM starts
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
ORDER BY user_id, valid_from_us
"""


DRIFT_SPLIT_US = 1_705_363_200_000_000  # 2024-01-16T00:00:00Z, epoch µs
DRIFT_BIN_WIDTH = 50.0


def q_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift audit — the monitoring query a lake runs before
    trusting a new data window: per event type, compare the histogram of
    ``value`` (fixed 50-wide bins) between the first and second half of
    the month and report a drift score. PSI is the industry shape but
    its ``ln`` is outside the repo's determinism contract (sanctioned
    once, for weighted sampling), so the score is the triangular
    discrimination f-divergence sum((p_a-p_b)^2/(p_a+p_b)) — same
    drift ordering, bounded [0,2], exact rational arithmetic.

    100 TB shape: one map-side-combinable groupBy on (type, bin) with
    conditional counts (the period split is a pushed integer-µs
    predicate, no second scan), then a per-type rollup over the tiny
    bin table. Scales with distinct (type, bin), not rows."""
    e = load(spark, sf_dir, "events")
    isa = F.unix_micros("ts") < DRIFT_SPLIT_US
    tb = e.groupBy(
        "event_type",
        F.floor(F.col("value") / DRIFT_BIN_WIDTH)
        .cast("bigint")
        .alias("bin"),
    ).agg(
        F.sum(F.when(isa, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(isa, 0).otherwise(1)).alias("n_b"),
    )
    tot = tb.groupBy("event_type").agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    p_a = F.col("n_a").cast("double") / F.col("t_a").cast("double")
    p_b = F.col("n_b").cast("double") / F.col("t_b").cast("double")
    term = (p_a - p_b) * (p_a - p_b) / (p_a + p_b)
    ppm = sround(term * 1e6, 6)
    return (
        tb.join(tot, "event_type")
        .select("event_type", "n_a", "n_b", ppm.alias("_t"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_bins"),
            F.sum("n_a").alias("n_events_a"),
            F.sum("n_b").alias("n_events_b"),
            F.sum(F.col("_t").cast("decimal(28,6)"))
            .cast("double")
            .alias("drift_ppm"),
        )
    )


_DRIFT_PA = "CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE)"
_DRIFT_PB = "CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE)"
_DRIFT_TERM = (
    f"({_DRIFT_PA} - {_DRIFT_PB}) * ({_DRIFT_PA} - {_DRIFT_PB})"
    f" / ({_DRIFT_PA} + {_DRIFT_PB})"
)

ORACLE_VALUE_DRIFT = f"""
WITH tb AS (
  SELECT event_type, CAST(floor(value / {DRIFT_BIN_WIDTH!r}) AS BIGINT) AS bin,
         CAST(SUM(CASE WHEN epoch_us(ts) < {DRIFT_SPLIT_US} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN epoch_us(ts) < {DRIFT_SPLIT_US} THEN 0 ELSE 1 END)
              AS BIGINT) AS n_b
  FROM events GROUP BY 1, 2
), tot AS (
  SELECT event_type, CAST(SUM(n_a) AS BIGINT) AS t_a,
         CAST(SUM(n_b) AS BIGINT) AS t_b
  FROM tb GROUP BY 1
)
SELECT tb.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(n_a) AS BIGINT) AS n_events_a,
       CAST(SUM(n_b) AS BIGINT) AS n_events_b,
       CAST(SUM(CAST({sround_sql(f"({_DRIFT_TERM}) * 1000000.0", 6)}
                AS DECIMAL(28,6))) AS DOUBLE) AS drift_ppm
FROM tb JOIN tot USING (event_type)
GROUP BY tb.event_type
"""


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness per event type (Goh & Barabási 2008's
    B = (σ-μ)/(σ+μ) over inter-arrival times): B→-1 is a metronome,
    0 is Poisson, →1 is heavy-tailed bursts — the signal that decides
    whether a streaming ingest needs burst capacity. Gaps are integer
    SECONDS between consecutive same-type events within a calendar day
    (epoch-day partitioned, so the window key scales with time and the
    squared sums stay in bigint range); mean/variance come from exact
    integer moment sums, and the only doubles are three fixed-order
    divisions, one guarded sqrt, and the final ratio.

    100 TB shape: windows partition on (type, epoch-day) — bounded
    per-partition work forever — then one map-side-combinable rollup."""
    e = load(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    day = F.floor(us / F.lit(86_400_000_000)).cast("bigint")
    w = Window.partitionBy("event_type", "_day").orderBy("_us", "event_id")
    gaps = (
        e.select("event_type", "event_id", us.alias("_us"), day.alias("_day"))
        .withColumn("_prev", F.lag("_us").over(w))
        .filter(F.col("_prev").isNotNull())
        .select(
            "event_type",
            F.floor((F.col("_us") - F.col("_prev")) / F.lit(1e6))
            .cast("bigint")
            .alias("g"),
        )
    )
    n = F.count("*")
    mean = F.sum("g").cast("double") / n.cast("double")
    ex2 = F.sum(F.col("g") * F.col("g")).cast("double") / n.cast("double")
    var = F.greatest(ex2 - mean * mean, F.lit(0.0))
    sd = F.sqrt(var)
    return gaps.groupBy("event_type").agg(
        n.alias("n_gaps"),
        sround(mean, 6).alias("mean_gap_s"),
        sround(sd, 6).alias("sd_gap_s"),
        sround((sd - mean) / (sd + mean), 6).alias("burstiness"),
    )


_BURST_N = "CAST(COUNT(*) AS DOUBLE)"
_BURST_MEAN = f"CAST(SUM(g) AS DOUBLE) / {_BURST_N}"
_BURST_EX2 = f"CAST(SUM(g * g) AS DOUBLE) / {_BURST_N}"
_BURST_VAR = (
    f"greatest(({_BURST_EX2}) - ({_BURST_MEAN}) * ({_BURST_MEAN}), 0.0)"
)
_BURST_SD = f"sqrt({_BURST_VAR})"

ORACLE_BURSTINESS = f"""
WITH t AS (
  SELECT event_type, event_id, epoch_us(ts) AS us,
         CAST(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS day
  FROM events
), gaps AS (
  SELECT event_type,
         CAST(floor((us - prev) / 1000000.0) AS BIGINT) AS g
  FROM (
    SELECT event_type, us,
           lag(us) OVER (PARTITION BY event_type, day
                         ORDER BY us, event_id) AS prev
    FROM t) x
  WHERE prev IS NOT NULL
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       {sround_sql(_BURST_MEAN, 6)} AS mean_gap_s,
       {sround_sql(_BURST_SD, 6)} AS sd_gap_s,
       {sround_sql(f"(({_BURST_SD}) - ({_BURST_MEAN})) / (({_BURST_SD}) + ({_BURST_MEAN}))", 6)}
         AS burstiness
FROM gaps GROUP BY event_type
"""


KS_ALERT_20TH = 20  # drifted iff ks > 1/20 (0.05), tested integer-only


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test per event type — the
    UNBINNED complement of q_value_drift (no bin-width parameter to
    tune, and sensitive to location shifts binning can hide): split the
    month at DRIFT_SPLIT_US, then KS = sup over pooled values of
    |ECDF_a - ECDF_b|. The sup is computed entirely in integers:
    max |c_a*N_b - c_b*N_a| over the pooled distinct values, divided by
    N_a*N_b once at the end; the drift alert compares integer products
    only. BIGINT products are safe to ~3e9 rows per type; past that,
    lift the two products to DECIMAL(38,0).

    100 TB shape: one groupBy on (type, value) with conditional counts
    (the period predicate is a pushed integer-µs filter), then windows
    PARTITIONED by event_type over the distinct-value table — scales
    with distinct (type, value), not rows; no global window."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    isa = F.unix_micros("ts") < DRIFT_SPLIT_US
    g = e.groupBy("event_type", "value").agg(
        F.sum(F.when(isa, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(isa, 0).otherwise(1)).cast("bigint").alias("n_b"),
    )
    wt = Window.partitionBy("event_type")
    wc = wt.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = (
        g.withColumn("c_a", F.sum("n_a").over(wc))
        .withColumn("c_b", F.sum("n_b").over(wc))
        .withColumn("t_a", F.sum("n_a").over(wt))
        .withColumn("t_b", F.sum("n_b").over(wt))
        .withColumn(
            "d",
            F.abs(F.col("c_a") * F.col("t_b") - F.col("c_b") * F.col("t_a")),
        )
    )
    return t.groupBy("event_type").agg(
        F.max("t_a").alias("n_a"),
        F.max("t_b").alias("n_b"),
        sround(
            F.when(
                F.max("t_a") * F.max("t_b") > 0,
                F.max("d").cast("double")
                / (F.max("t_a") * F.max("t_b")).cast("double"),
            ),
            6,
        ).alias("ks"),
        F.when(
            F.max("d") * KS_ALERT_20TH > F.max("t_a") * F.max("t_b"),
            True,
        ).otherwise(False).alias("drifted"),
    )


ORACLE_KS_DRIFT = f"""
WITH e AS (
  SELECT event_type, value,
         CASE WHEN epoch_us(ts) < {DRIFT_SPLIT_US} THEN 1 ELSE 0 END
           AS in_a
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
), g AS (
  SELECT event_type, value,
         CAST(SUM(in_a) AS BIGINT) AS n_a,
         CAST(SUM(1 - in_a) AS BIGINT) AS n_b
  FROM e GROUP BY 1, 2
), t AS (
  SELECT event_type,
         SUM(n_a) OVER (PARTITION BY event_type ORDER BY value
                        ROWS UNBOUNDED PRECEDING) AS c_a,
         SUM(n_b) OVER (PARTITION BY event_type ORDER BY value
                        ROWS UNBOUNDED PRECEDING) AS c_b,
         SUM(n_a) OVER (PARTITION BY event_type) AS t_a,
         SUM(n_b) OVER (PARTITION BY event_type) AS t_b
  FROM g
), d AS (
  SELECT event_type, t_a, t_b,
         abs(c_a * t_b - c_b * t_a) AS d
  FROM t
)
SELECT event_type, CAST(MAX(t_a) AS BIGINT) AS n_a,
       CAST(MAX(t_b) AS BIGINT) AS n_b,
       {sround_sql(
           "CASE WHEN MAX(t_a) * MAX(t_b) > 0 THEN "
           "CAST(MAX(d) AS DOUBLE) / CAST(MAX(t_a) * MAX(t_b) AS DOUBLE)"
           " END", 6)} AS ks,
       CASE WHEN MAX(d) * {KS_ALERT_20TH} > MAX(t_a) * MAX(t_b)
            THEN TRUE ELSE FALSE END AS drifted
FROM d GROUP BY event_type
"""


DAY_US = 86_400_000_000


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline changepoint detection per event type — the drift
    LOCALIZER next to q_ks_drift's detector: daily event counts, then
    the classic CUSUM split statistic stat_k = |C_k − (k/n)·C_n| (the
    deviation of the cumulative count from the constant-rate line);
    the argmax day is the most likely rate change point, its statistic
    the evidence. Integer day buckets and counts; the only doubles are
    the (k/n)·C_n line, identical IEEE on both engines, rounded before
    the argmax with a day tie-break.

    100 TB shape: one map-side-combinable (type, day) count, then
    windows over the tiny per-type day series — scales with distinct
    days, not events. NULL timestamps have no day and NULL types no
    series; both drop identically on engine and oracle."""
    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    # floor on BOTH engines: a bare cast diverges (Spark truncates a
    # double->bigint cast, DuckDB rounds it); the division itself is
    # exact-enough IEEE on both (epoch-us < 2^53)
    day = F.floor(F.unix_micros("ts") / F.lit(DAY_US)).cast("bigint")
    daily = e.groupBy(
        "event_type", day.alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    scored = daily.select(
        "event_type",
        "day",
        F.sum("n").over(wcum).alias("cum"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("k"),
        F.sum("n").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n_days"),
    ).select(
        "event_type",
        "day",
        "total",
        "n_days",
        sround(
            F.abs(
                F.col("cum").cast("double")
                - F.col("k").cast("double")
                / F.col("n_days").cast("double")
                * F.col("total").cast("double")
            ),
            6,
        ).alias("stat"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("stat").desc(), "day"
    )
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("total").cast("bigint").alias("total_events"),
            F.col("day").alias("cp_day"),
            F.col("stat").alias("cp_stat"),
        )
        .orderBy("event_type")
    )


ORACLE_CHANGEPOINT = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / {DAY_US}) AS BIGINT) AS day,
         COUNT(*) AS n
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
), scored AS (
  SELECT event_type, day,
         SUM(n) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS cum,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k,
         SUM(n) OVER (PARTITION BY event_type) AS total,
         COUNT(*) OVER (PARTITION BY event_type) AS n_days
  FROM daily
), st AS (
  SELECT event_type, day, total, n_days,
         {sround_sql(
             "abs(CAST(cum AS DOUBLE) - CAST(k AS DOUBLE)"
             " / CAST(n_days AS DOUBLE) * CAST(total AS DOUBLE))", 6)}
           AS stat
  FROM scored
)
SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
       CAST(total AS BIGINT) AS total_events,
       day AS cp_day, stat AS cp_stat
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY stat DESC, day) AS rk
  FROM st) t
WHERE rk = 1 ORDER BY event_type
"""


def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1-3) of the per-type daily event
    series — the periodicity probe next to q_seasonality's calendar
    profile and q_changepoint's level-shift localizer: a high lag-1
    ACF means bursty/trending traffic, near-zero means memoryless
    arrivals. Pearson r over (n_t, n_{t+k}) pairs of the ORDERED day
    series, from exact decimal moments (daily counts are integers, so
    every sum is exact and both engines produce the identical double;
    the only float math is the final identical expression). Constant
    series (zero variance on either leg) yield NULL, not a 0/0 crash.

    100 TB shape: one map-side-combinable (type, day) count, then the
    3 leads + moment agg run over the tiny per-type day series —
    everything after the first agg scales with distinct days, not
    events. NULL timestamps/types drop identically on both engines."""
    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    day = F.floor(F.unix_micros("ts") / F.lit(DAY_US)).cast("bigint")
    daily = e.groupBy(
        "event_type", day.alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    led = daily.select(
        "event_type",
        "n",
        F.lead("n", 1).over(w).alias("y1"),
        F.lead("n", 2).over(w).alias("y2"),
        F.lead("n", 3).over(w).alias("y3"),
    )
    pair = led.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag_k"),
                        F.col("n").alias("x"),
                        F.col(f"y{k}").alias("y"),
                    )
                    for k in (1, 2, 3)
                ]
            )
        ).alias("p"),
    ).select("event_type", "p.lag_k", "p.x", "p.y").filter(
        F.col("y").isNotNull()
    )
    m = pair.groupBy("event_type", "lag_k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        dsum("x").alias("sx"),
        dsum("y").alias("sy"),
        dsum(F.col("x") * F.col("y")).alias("sxy"),
        dsum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y") * F.col("y")).alias("syy"),
    ).filter(F.col("n_pairs") >= 2)
    md = F.col("n_pairs").cast("double")
    num = md * F.col("sxy") - F.col("sx") * F.col("sy")
    va = md * F.col("sxx") - F.col("sx") * F.col("sx")
    vb = md * F.col("syy") - F.col("sy") * F.col("sy")
    return m.select(
        "event_type",
        F.col("lag_k").cast("bigint").alias("lag_k"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.when(
            (va > 0) & (vb > 0),
            sround(num / (F.sqrt(va) * F.sqrt(vb)), 9),
        ).alias("acf"),
    ).orderBy("event_type", "lag_k")


ORACLE_ACF = f"""
WITH daily AS (
  SELECT event_type,
         CAST(floor(epoch_us(ts) / {DAY_US}) AS BIGINT) AS day,
         COUNT(*) AS n
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
), led AS (
  SELECT event_type, n,
         lead(n, 1) OVER w AS y1,
         lead(n, 2) OVER w AS y2,
         lead(n, 3) OVER w AS y3
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)
), pairs AS (
  SELECT event_type, 1 AS lag_k, n AS x, y1 AS y FROM led
   WHERE y1 IS NOT NULL
  UNION ALL
  SELECT event_type, 2, n, y2 FROM led WHERE y2 IS NOT NULL
  UNION ALL
  SELECT event_type, 3, n, y3 FROM led WHERE y3 IS NOT NULL
), m AS (
  SELECT event_type, lag_k, COUNT(*) AS n_pairs,
         {dsum_sql('x')} AS sx, {dsum_sql('y')} AS sy,
         {dsum_sql('x * y')} AS sxy,
         {dsum_sql('x * x')} AS sxx,
         {dsum_sql('y * y')} AS syy
  FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= 2
), v AS (
  SELECT event_type, lag_k, n_pairs,
         CAST(n_pairs AS DOUBLE) * sxy - sx * sy AS num,
         CAST(n_pairs AS DOUBLE) * sxx - sx * sx AS va,
         CAST(n_pairs AS DOUBLE) * syy - sy * sy AS vb
  FROM m
)
SELECT event_type, CAST(lag_k AS BIGINT) AS lag_k,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CASE WHEN va > 0 AND vb > 0
            THEN {sround_sql('num / (sqrt(va) * sqrt(vb))', 9)}
       END AS acf
FROM v ORDER BY event_type, lag_k
"""


def q_graph_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural health metrics of the behavior-transition graph
    (the directed event-type graph q_transitions fits probabilities
    on): RECIPROCITY — the share of directed edges whose reverse edge
    exists (how two-way the behavior flows are) — and DEGREE
    ASSORTATIVITY — the Pearson correlation between each edge's
    source out-degree and target in-degree, from exact decimal
    moments like q_correlation (degrees are integers, so both engines
    emit the identical double; constant-degree graphs → NULL, not
    0/0). Self-loops are excluded (reciprocity is trivially 1 on
    them). One distinct-edge frame, two tiny degree joins, one
    semi-join for the reverse-edge test — everything after the first
    agg scales with the TYPE vocabulary, not events."""
    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        e.withColumn("prev", F.lag("event_type").over(w))
        .filter(
            F.col("prev").isNotNull()
            & (F.col("prev") != F.col("event_type"))
        )
        .select(
            F.col("prev").alias("src"), F.col("event_type").alias("dst")
        )
        .distinct()
    )
    od = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    idg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
    ed = (
        edges.join(F.broadcast(od), "src")
        .join(F.broadcast(idg), "dst")
    )
    rev = edges.select(
        F.col("src").alias("dst"), F.col("dst").alias("src")
    )
    n_recip = (
        edges.join(rev, ["src", "dst"], "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_reciprocal"))
    )
    m = ed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        dsum("od").alias("sx"),
        dsum("idg").alias("sy"),
        dsum(F.col("od") * F.col("idg")).alias("sxy"),
        dsum(F.col("od") * F.col("od")).alias("sxx"),
        dsum(F.col("idg") * F.col("idg")).alias("syy"),
    )
    md = F.col("n_edges").cast("double")
    num = md * F.col("sxy") - F.col("sx") * F.col("sy")
    va = md * F.col("sxx") - F.col("sx") * F.col("sx")
    vb = md * F.col("syy") - F.col("sy") * F.col("sy")
    return m.crossJoin(F.broadcast(n_recip)).select(
        "n_edges",
        "n_reciprocal",
        sround(
            F.col("n_reciprocal").cast("double")
            / F.greatest(F.col("n_edges"), F.lit(1)).cast("double"),
            9,
        ).alias("reciprocity"),
        F.when(
            (va > 0) & (vb > 0),
            sround(num / (F.sqrt(va) * F.sqrt(vb)), 9),
        ).alias("assortativity"),
    )


ORACLE_GRAPH_HEALTH = f"""
WITH p AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
), edges AS (
  SELECT DISTINCT prev AS src, event_type AS dst
  FROM p WHERE prev IS NOT NULL AND prev <> event_type
), od AS (
  SELECT src, COUNT(*) AS od FROM edges GROUP BY 1
), idg AS (
  SELECT dst, COUNT(*) AS idg FROM edges GROUP BY 1
), ed AS (
  SELECT e.src, e.dst, od.od, idg.idg
  FROM edges e JOIN od USING (src) JOIN idg USING (dst)
), m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
         {dsum_sql('od')} AS sx, {dsum_sql('idg')} AS sy,
         {dsum_sql('od * idg')} AS sxy,
         {dsum_sql('od * od')} AS sxx,
         {dsum_sql('idg * idg')} AS syy
  FROM ed
), r AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_reciprocal
  FROM edges a
  WHERE EXISTS (SELECT 1 FROM edges b
                WHERE b.src = a.dst AND b.dst = a.src)
), v AS (
  SELECT n_edges, n_reciprocal,
         CAST(n_edges AS DOUBLE) * sxy - sx * sy AS num,
         CAST(n_edges AS DOUBLE) * sxx - sx * sx AS va,
         CAST(n_edges AS DOUBLE) * syy - sy * sy AS vb
  FROM m CROSS JOIN r
)
SELECT n_edges, n_reciprocal,
       {sround_sql(
           "CAST(n_reciprocal AS DOUBLE)"
           " / CAST(greatest(n_edges, 1) AS DOUBLE)", 9)}
         AS reciprocity,
       CASE WHEN va > 0 AND vb > 0
            THEN {sround_sql('num / (sqrt(va) * sqrt(vb))', 9)}
       END AS assortativity
FROM v
"""


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test — the experiment-readout primitive every
    product analytics stack runs on event data: users split into arms
    by id parity (the deterministic stand-in for an assignment
    service), conversion = "did the user purchase", pooled-variance z
    statistic and a significance flag at |z| ≥ 1.96. Conversion rates
    divide exact integers and the z expression is identical IEEE on
    both engines (sqrt is correctly rounded — the one transcendental
    this repo trusts); a zero-variance pool (all or none converted)
    yields NULL, not 0/0. One distinct-user agg per arm, a 2-row
    broadcast, and scalar math — nothing here scales with events."""
    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    per_user = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    arms = per_user.groupBy(
        (F.col("user_id") % 2).cast("bigint").alias("arm")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n_users").alias("n0"), F.col("n_converted").alias("c0")
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n_users").alias("n1"), F.col("n_converted").alias("c1")
    )
    j = a.crossJoin(F.broadcast(b))
    n0d, c0d = F.col("n0").cast("double"), F.col("c0").cast("double")
    n1d, c1d = F.col("n1").cast("double"), F.col("c1").cast("double")
    p0 = c0d / n0d
    p1 = c1d / n1d
    pp = (c0d + c1d) / (n0d + n1d)
    se = F.sqrt(pp * (1.0 - pp) * (1.0 / n0d + 1.0 / n1d))
    z = F.when(se > 0, (p0 - p1) / se)
    return j.select(
        "n0",
        "c0",
        "n1",
        "c1",
        sround(p0, 9).alias("rate_a"),
        sround(p1, 9).alias("rate_b"),
        sround(z, 6).alias("z_stat"),
        # the flag compares the ROUNDED z (same expression the oracle
        # uses) so no boundary value can flip between engines
        F.when(se > 0, F.abs(sround(z, 6)) >= 1.96).alias("significant"),
    )


ORACLE_AB_TEST = f"""
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1
), arms AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS arm,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM per_user GROUP BY 1
), j AS (
  SELECT a.n_users AS n0, a.n_converted AS c0,
         b.n_users AS n1, b.n_converted AS c1
  FROM (SELECT * FROM arms WHERE arm = 0) a
  CROSS JOIN (SELECT * FROM arms WHERE arm = 1) b
), v AS (
  SELECT n0, c0, n1, c1,
         CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
         CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
         (CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE))
           / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) AS pp
  FROM j
), s AS (
  SELECT *, sqrt(pp * (1.0 - pp)
                 * (1.0 / CAST(n0 AS DOUBLE)
                    + 1.0 / CAST(n1 AS DOUBLE))) AS se
  FROM v
)
SELECT n0, c0, n1, c1,
       {sround_sql('p0', 9)} AS rate_a,
       {sround_sql('p1', 9)} AS rate_b,
       CASE WHEN se > 0 THEN {sround_sql('(p0 - p1) / se', 6)} END
         AS z_stat,
       CASE WHEN se > 0
            THEN abs({sround_sql('(p0 - p1) / se', 6)}) >= 1.96 END
         AS significant
FROM s
"""


def q_mode_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group MODE — the most frequent event_type per
    user with an explicit tie-break (count DESC, value ASC). Engines'
    built-in mode()/first() break ties by scan order, which is
    partition-dependent; spelling the tie-break as a rank window makes
    the answer identical on any partitioning (the partition-invariance
    axis). Share comes from a same-window partition sum — no second
    shuffle. Scale: one groupBy(user, type) + one window per user;
    the wordcount shuffle profile."""
    e = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    cnt = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    tot = Window.partitionBy("user_id")
    return (
        cnt.select(
            "user_id",
            "event_type",
            "n",
            F.row_number().over(w).alias("rk"),
            F.sum("n").over(tot).cast("bigint").alias("n_total"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("n").alias("n_mode"),
            "n_total",
            (
                F.col("n").cast("double")
                / F.col("n_total").cast("double")
            ).alias("mode_share"),
        )
        .orderBy("user_id")
    )


ORACLE_MODE_VALUE = """
WITH cnt AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
  GROUP BY 1, 2
), rk AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rk,
         CAST(SUM(n) OVER (PARTITION BY user_id) AS BIGINT) AS n_total
  FROM cnt
)
SELECT user_id, event_type AS mode_event_type, n AS n_mode, n_total,
       CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE) AS mode_share
FROM rk WHERE rk = 1 ORDER BY user_id
"""


DECAY_CAP_DAYS = 30  # half-life 1 day, floor at 2^-30
DECAY_DAY_US = 86_400_000_000


def q_decay_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed sampling mass per event_type — the freshness
    weighting a continuously-ingesting training pipeline applies
    before mixing (recent data counts full, day-old data counts half,
    ...). Weight = 2^-min(age_days, 30) with a 1-day half-life: a
    dyadic rational, so the per-row weight is an EXACT long numerator
    (1 << (30 - k)) and the aggregate is pure int64 — order- and
    engine-independent with no float-sum discipline needed. At 100 TB
    the numerator sum is the only state (map-side combinable); the cap
    bounds the numerator span so even 2^53-scale row counts stay exact
    in the final double divide."""
    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    us = F.unix_micros("ts")
    anchor = e.agg(F.max(us).alias("anchor_us"))
    age_days = F.expr(
        f"(anchor_us - unix_micros(ts)) DIV {DECAY_DAY_US}"
    )
    # shiftleft's numBits must be a literal in the Python API — spell
    # the column-valued shift as a SQL expression
    num = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({DECAY_CAP_DAYS}"
        f" - least((anchor_us - unix_micros(ts)) DIV {DECAY_DAY_US},"
        f" {DECAY_CAP_DAYS}) AS INT))"
    )
    return (
        e.crossJoin(F.broadcast(anchor))
        .select("event_type", num.alias("num"), age_days.alias("age"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            (
                F.sum("num").cast("double")
                / F.lit(float(1 << DECAY_CAP_DAYS))
            ).alias("decayed_mass"),
            F.min("age").cast("bigint").alias("newest_age_days"),
            F.max("age").cast("bigint").alias("oldest_age_days"),
        )
        .orderBy("event_type")
    )


ORACLE_DECAY_WEIGHTS = f"""
WITH e AS (
  SELECT event_type,
         (  (SELECT MAX(epoch_us(ts)) FROM events
             WHERE ts IS NOT NULL AND event_type IS NOT NULL)
          - epoch_us(ts)) // {DECAY_DAY_US} AS age
  FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(1::BIGINT << CAST({DECAY_CAP_DAYS}
                - LEAST(age, {DECAY_CAP_DAYS}) AS INT)) AS DOUBLE)
         / {float(1 << DECAY_CAP_DAYS)} AS decayed_mass,
       CAST(MIN(age) AS BIGINT) AS newest_age_days,
       CAST(MAX(age) AS BIGINT) AS oldest_age_days
FROM e GROUP BY event_type ORDER BY event_type
"""


QUERIES = {
    "q_mode_value": q_mode_value,
    "q_decay_weights": q_decay_weights,
    "q_changepoint": q_changepoint,
    "q_acf": q_acf,
    "q_graph_health": q_graph_health,
    "q_ab_test": q_ab_test,
    "q_scd2": q_scd2,
    "q_ewma": q_ewma,
    "q_lateness": q_lateness,
    "q_concurrency": q_concurrency,
    "q_behavior_diversity": q_behavior_diversity,
    "q_tumbling_window": q_tumbling_window,
    "q_session_gap": q_session_gap,
    "q_sliding_window": q_sliding_window,
    "q_gap_fill": q_gap_fill,
    "q_anomaly_zscore": q_anomaly_zscore,
    "q_rolling_sum": q_rolling_sum,
    "q_event_sequence": q_event_sequence,
    "q_transitions": q_transitions,
    "q_session_window": q_session_window,
    "q_map_funcs": q_map_funcs,
    "q_value_drift": q_value_drift,
    "q_ks_drift": q_ks_drift,
    "q_burstiness": q_burstiness,
}

ORACLES = {
    "q_mode_value": ORACLE_MODE_VALUE,
    "q_decay_weights": ORACLE_DECAY_WEIGHTS,
    "q_changepoint": ORACLE_CHANGEPOINT,
    "q_acf": ORACLE_ACF,
    "q_graph_health": ORACLE_GRAPH_HEALTH,
    "q_ab_test": ORACLE_AB_TEST,
    "q_scd2": ORACLE_SCD2,
    "q_ewma": _oracle_ewma(),
    "q_lateness": ORACLE_LATENESS,
    "q_concurrency": ORACLE_CONCURRENCY,
    "q_behavior_diversity": ORACLE_BEHAVIOR_DIVERSITY,
    "q_tumbling_window": ORACLE_TUMBLING_WINDOW,
    "q_session_gap": ORACLE_SESSION_GAP,
    "q_sliding_window": ORACLE_SLIDING_WINDOW,
    "q_gap_fill": ORACLE_GAP_FILL,
    "q_anomaly_zscore": ORACLE_ANOMALY_ZSCORE,
    "q_rolling_sum": ORACLE_ROLLING_SUM,
    "q_event_sequence": ORACLE_EVENT_SEQUENCE,
    "q_transitions": ORACLE_TRANSITIONS,
    "q_session_window": ORACLE_SESSION_WINDOW,
    "q_map_funcs": ORACLE_MAP_FUNCS,
    "q_value_drift": ORACLE_VALUE_DRIFT,
    "q_ks_drift": ORACLE_KS_DRIFT,
    "q_burstiness": ORACLE_BURSTINESS,
}


# --------------------------------------------------------------------------
# round-10 addition: time-RANGE window frames

RANGE_FRAME_US = 3_600_000_000  # trailing 1-hour frame


def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 1-hour aggregate via a RANGE window frame
    (``rangeBetween`` on integer event-time micros) — the
    value-based-frame engine capability q_rolling_sum's ROWS frame and
    q_sliding_window's bucketing don't exercise: every event sees
    exactly the events within the last hour of ITS OWN timestamp.

    RANGE frames are set-valued (all rows with t_us in
    [t−1h, t] regardless of tie order), so the result is
    partition-order-invariant by construction; the in-frame value sum
    runs in DECIMAL. NULL-ts rows are dropped on both sides; NULL
    user_id partitions group together on both engines.
    """
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    base = e.select(
        "user_id", "event_id",
        F.expr("unix_micros(ts)").alias("t_us"), "value",
    )
    w = (
        Window.partitionBy("user_id").orderBy("t_us")
        .rangeBetween(-RANGE_FRAME_US, 0)
    )
    return base.select(
        "user_id", "event_id", "t_us",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
        F.sum(F.col("value").cast("decimal(28,6)")).over(w)
        .cast("double").alias("sum_1h"),
    ).orderBy("event_id")


ORACLE_RANGE_FRAME = f"""
SELECT user_id, event_id, t_us,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sum_1h
FROM (SELECT user_id, event_id, epoch_us(ts) AS t_us, value
      FROM events WHERE ts IS NOT NULL)
WINDOW w AS (PARTITION BY user_id ORDER BY t_us
             RANGE BETWEEN {RANGE_FRAME_US} PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

QUERIES["q_range_frame"] = q_range_frame
ORACLES["q_range_frame"] = ORACLE_RANGE_FRAME
