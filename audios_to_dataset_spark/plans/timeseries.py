"""Time-series resampling operators over the events table (round 9
extension): OHLC bars, time-weighted averages, linear interpolation at
grid points, and LTTB-style downsampling — the read-side operators a
metrics/telemetry corpus needs before training on it.

The reference is strictly batch-file ingest (no time semantics beyond
file mtimes, ``src/main.rs:118-140``); these are engine-capability
surface like ``plans/events``. Every query keeps the exactness
discipline: integer-microsecond time math, decimal sums, identical
IEEE expression trees on both engines, and a TOTAL order behind every
first/last/argmax so the ``--nulls``/``--skew``/partition-invariance
sweeps cannot flip a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ._util import dsum, dsum_sql, sround, sround_sql

# LTTB bucket count per series. A DIAL, like the LSH plane count
# (plans/similarity.py): downsampling to B points is the operator's
# contract, so B stays fixed as data grows and per-bucket aggregates
# simply get wider — map-side combinable either way.
LTTB_BUCKETS = 16


def _clean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with a total per-row order key available: NULL ts/value/
    event_id rows are dropped explicitly on BOTH engines (the --nulls
    sweep injects them; ordered operators must not depend on engine
    NULL-ordering, which Spark and DuckDB disagree on). The SERIES id
    (event_type) must be non-NULL too: every operator here is
    per-series, and a NULL series id behaves differently under groupBy
    (one NULL group) vs equi-join (dropped) — the same drop-NULL-id
    rule the ordered packing ops adopted after the combined sweep."""
    return load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
    )


_CLEAN_SQL = (
    "SELECT * FROM events WHERE ts IS NOT NULL AND value IS NOT NULL"
    " AND event_id IS NOT NULL AND event_type IS NOT NULL"
)


def q_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) bars per event type — the
    canonical time-series resample. Open/close are true first/last
    values under the TOTAL order (ts, event_id, value), computed with
    min/max over a packed struct so the whole bar is ONE map-side
    combinable aggregation (no window, no per-group sort): at 100 TB
    this is a single partial-agg + exchange on (hour, type), and ties
    (same ts after the skew rewrite duplicates keys) stay deterministic
    because value itself is the final tie-break.
    """
    e = _clean_events(spark, sf_dir)
    h = F.date_trunc("hour", F.col("ts"))
    first_s = F.min(F.struct("ts", "event_id", "value"))
    last_s = F.max(F.struct("ts", "event_id", "value"))
    return (
        e.groupBy(h.alias("win_start"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            first_s.getField("value").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            last_s.getField("value").alias("close_v"),
            dsum("value").alias("sum_value"),
        )
        .orderBy("win_start", "event_type")
    )


ORACLE_OHLC = f"""
WITH e AS ({_CLEAN_SQL}),
b AS (
  SELECT date_trunc('hour', ts) AS win_start, event_type, ts, event_id, value
  FROM e
), r AS (
  SELECT win_start, event_type, value,
         row_number() OVER (PARTITION BY win_start, event_type
                            ORDER BY ts, event_id, value) AS rn_a,
         row_number() OVER (PARTITION BY win_start, event_type
                            ORDER BY ts DESC, event_id DESC, value DESC)
           AS rn_d
  FROM b
), agg AS (
  SELECT win_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(value) AS high_v, MIN(value) AS low_v,
         {dsum_sql('value')} AS sum_value
  FROM b GROUP BY 1, 2
)
SELECT agg.win_start, agg.event_type, n_events,
       o.value AS open_v, high_v, low_v, c.value AS close_v, sum_value
FROM agg
JOIN (SELECT win_start, event_type, value FROM r WHERE rn_a = 1) o
  USING (win_start, event_type)
JOIN (SELECT win_start, event_type, value FROM r WHERE rn_d = 1) c
  USING (win_start, event_type)
ORDER BY win_start, event_type
"""


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per event type: each sample
    holds its value until the next sample (step interpolation), so the
    average weights by the integer-microsecond duration to the next
    event instead of by row count — the correct reading for irregular
    telemetry. One window (partitioned by type — parallel across the
    key space) computes lead(ts); the weighted sum is exact via the
    decimal domain (value·duration ≤ 560·2.6e12 ≈ 1.5e15, inside
    DECIMAL(38,6)); the final division is one correctly-rounded double
    op on both engines. The last sample of each series has no duration
    and is excluded from both numerator and denominator (both engines,
    same rule) — so a SINGLE-SAMPLE series produces NO output row at
    all (its only row has NULL dur_us and is filtered before the
    groupBy); the explicit total_us = 0 guard instead covers series
    whose samples all share one timestamp (every duration 0 ⇒ NULL twa
    rather than 0/0). (Docstring corrected per ADVICE r9.)
    """
    e = _clean_events(spark, sf_dir).select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        "value",
    )
    w = Window.partitionBy("event_type").orderBy("t_us", "event_id", "value")
    dur = (F.lead("t_us").over(w) - F.col("t_us")).alias("dur_us")
    wd = e.select("event_type", "value", dur).filter(
        F.col("dur_us").isNotNull()
    )
    # value·duration as DECIMAL(18,6) × DECIMAL(19,0) — EXACT integer-
    # decimal arithmetic. Casting the double product to decimal instead
    # diverged in the NULL sweep: at ~1e15 magnitude the double→decimal
    # rendering rounds differently between engines (the sround boundary
    # problem, but unfixable by sround at this magnitude).
    total = F.sum("dur_us").cast("bigint")
    num = F.sum(
        F.col("value").cast("decimal(18,6)")
        * F.col("dur_us").cast("decimal(19,0)")
    ).cast("double")
    return (
        wd.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            total.alias("total_us"),
            # sround: the DECIMAL(38,6) numerator is ~20 significant
            # digits, and decimal→double conversion differs by 1 ulp
            # between engines at that width (Java BigDecimal converts
            # correctly-rounded; DuckDB scales an int128 in two steps)
            F.when(total > 0, sround(num / total.cast("double"), 6))
            .otherwise(F.lit(None).cast("double"))
            .alias("twa"),
        )
        .orderBy("event_type")
    )


ORACLE_TIME_WEIGHTED_AVG = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t_us, event_id, value
  FROM ({_CLEAN_SQL})
), d AS (
  SELECT event_type, value,
         lead(t_us) OVER (PARTITION BY event_type
                          ORDER BY t_us, event_id, value) - t_us AS dur_us
  FROM e
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dur_us) AS BIGINT) AS total_us,
       CASE WHEN CAST(SUM(dur_us) AS BIGINT) > 0 THEN
         {sround_sql(
             "CAST(SUM(CAST(value AS DECIMAL(18,6))"
             " * CAST(dur_us AS DECIMAL(19,0))) AS DOUBLE)"
             " / CAST(CAST(SUM(dur_us) AS BIGINT) AS DOUBLE)", 6)}
       ELSE NULL END AS twa
FROM d WHERE dur_us IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""


def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of ``value`` at hourly grid points per
    event type — the gap-fill upgrade from zero-fill (q_gap_fill) to
    value reconstruction. The hourly spine (q_gap_fill's sequence ×
    distinct types — broadcast-tiny even at 100 TB) unions with the
    samples; ONE forward and ONE backward window per type (LOCF both
    directions via last(..., ignorenulls)) find the bracketing samples;
    the interpolation ratio is integer-microsecond math and the final
    expression is the identical IEEE tree on both engines. Grid points
    outside the observed range are dropped (no extrapolation — both
    engines, same rule); a sample exactly on the grid wins as its own
    bracket: the sample sorts before the co-located grid row in BOTH
    window directions (is_grid ascending in the forward window, and —
    since round 10, ADVICE r9 — is_grid ASCENDING inside the DESC
    backward window too), so prev == next, the t1 = t0 guard fires,
    and the sample's own value is returned exactly. This also means a
    grid point coinciding with a series' LAST sample is emitted (its
    bracket is that sample on both sides) instead of silently dropped.
    Order within one timestamp is total: samples sort before grid rows
    (is_grid), then by event_id and value.
    """
    e = _clean_events(spark, sf_dir)
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    hours = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias(
            "gts"
        )
    )
    types = e.select("event_type").distinct()
    grid = hours.crossJoin(types).select(
        "event_type",
        F.unix_micros("gts").alias("t_us"),
        F.lit(1).alias("is_grid"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("double").alias("y"),
    )
    samples = e.select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        F.lit(0).alias("is_grid"),
        "event_id",
        F.col("value").alias("y"),
    )
    u = samples.unionByName(grid)
    fwd = Window.partitionBy("event_type").orderBy(
        "t_us", "is_grid", "event_id", "y"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # is_grid ASC inside the DESC walk: at equal t_us the SAMPLE enters
    # the backward frame before the grid row, so a co-located sample is
    # its own right bracket (see docstring; ADVICE r9).
    bwd = Window.partitionBy("event_type").orderBy(
        F.col("t_us").desc(),
        F.col("is_grid").asc(),
        F.col("event_id").desc(),
        F.col("y").desc(),
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sample_t = F.when(F.col("is_grid") == 0, F.col("t_us"))
    br = u.select(
        "event_type",
        "t_us",
        "is_grid",
        F.last(sample_t, ignorenulls=True).over(fwd).alias("t0"),
        F.last("y", ignorenulls=True).over(fwd).alias("y0"),
        F.last(sample_t, ignorenulls=True).over(bwd).alias("t1"),
        F.last("y", ignorenulls=True).over(bwd).alias("y1"),
    )
    out = br.filter(
        (F.col("is_grid") == 1)
        & F.col("t0").isNotNull()
        & F.col("t1").isNotNull()
    )
    ratio = (
        (F.col("t_us") - F.col("t0")).cast("double")
        / (F.col("t1") - F.col("t0")).cast("double")
    )
    interp = F.when(F.col("t1") == F.col("t0"), F.col("y0")).otherwise(
        F.col("y0") + (F.col("y1") - F.col("y0")) * ratio
    )
    return out.select(
        "event_type",
        F.timestamp_micros(F.col("t_us")).alias("win_start"),
        sround(interp, 6).alias("y_interp"),
    ).orderBy("event_type", "win_start")


ORACLE_INTERPOLATE = f"""
WITH e AS ({_CLEAN_SQL}),
b AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM e
), hours AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS gts FROM b
), grid AS (
  SELECT event_type, epoch_us(gts) AS t_us, 1 AS is_grid,
         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS DOUBLE) AS y
  FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM e) t
), samples AS (
  SELECT event_type, epoch_us(ts) AS t_us, 0 AS is_grid, event_id,
         value AS y
  FROM e
), u AS (
  SELECT * FROM samples UNION ALL SELECT * FROM grid
), br AS (
  SELECT event_type, t_us, is_grid,
         last_value(CASE WHEN is_grid = 0 THEN t_us END IGNORE NULLS)
           OVER fwd AS t0,
         last_value(y IGNORE NULLS) OVER fwd AS y0,
         last_value(CASE WHEN is_grid = 0 THEN t_us END IGNORE NULLS)
           OVER bwd AS t1,
         last_value(y IGNORE NULLS) OVER bwd AS y1
  FROM u
  WINDOW fwd AS (PARTITION BY event_type
                 ORDER BY t_us, is_grid, event_id, y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         bwd AS (PARTITION BY event_type
                 ORDER BY t_us DESC, is_grid ASC, event_id DESC, y DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, make_timestamp(t_us) AS win_start,
       {sround_sql(
           "CASE WHEN t1 = t0 THEN y0 ELSE"
           " y0 + (y1 - y0) * (CAST(t_us - t0 AS DOUBLE)"
           " / CAST(t1 - t0 AS DOUBLE)) END", 6)} AS y_interp
FROM br
WHERE is_grid = 1 AND t0 IS NOT NULL AND t1 IS NOT NULL
ORDER BY event_type, win_start
"""


def q_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB-style downsampling (largest-triangle, fixed average
    anchors) to LTTB_BUCKETS points per event type. The classic LTTB
    selects sequentially (each bucket's anchor is the PREVIOUS
    SELECTED point), which is inherently serial; the fixed-anchor
    variant used here anchors every candidate triangle on the
    NEIGHBOR-BUCKET AVERAGES instead, which turns the whole selection
    into two map-side-combinable aggregations plus one broadcast-sized
    join — the shape that scales. Per middle bucket the survivor is the
    point maximizing the doubled triangle area
    |(ax−x)(by−y) − (bx−x)(ay−y)| against the left/right bucket
    centroids; the global first and last points are always kept
    (buckets 0 and B−1), matching LTTB's endpoint rule.

    Empty-neighbor drop rule (ADVICE r9): a middle bucket whose LEFT or
    RIGHT neighbor bucket holds no points is dropped entirely (the
    candidate join against the neighbor centroids is inner on both
    engines), so the output can carry FEWER than LTTB_BUCKETS points
    per series even when the bucket itself has data. "Downsample to B
    points" is therefore an upper bound, not a guarantee, on sparse or
    gappy series; dense series emit exactly B.

    Exactness: x is integer microseconds relative to the series start;
    bucket ids are pure integer math; centroids divide decimal sums by
    counts (one correctly-rounded double op each); the area is an
    identical IEEE tree on both engines; and the argmax runs under the
    TOTAL order (area desc, x asc, event_id asc, value asc) so ties
    cannot flip across engines, partition counts, or the skew rewrite.
    """
    B = LTTB_BUCKETS
    e = _clean_events(spark, sf_dir).select(
        "event_type",
        F.unix_micros("ts").alias("t_us"),
        "event_id",
        F.col("value").alias("y"),
    )
    bounds = e.groupBy("event_type").agg(
        F.min("t_us").alias("tmin"),
        F.max("t_us").alias("tmax"),
    )
    pts = (
        e.join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            "t_us",
            "event_id",
            "y",
            (F.col("t_us") - F.col("tmin")).alias("x"),
            # integer DIV, not `/`: double division then truncation can
            # round 3.999..9 up to 4.0 and disagree with DuckDB's `//`
            F.expr(
                f"CAST(((t_us - tmin) * {B}) DIV (tmax - tmin + 1)"
                " AS BIGINT)"
            ).alias("b"),
        )
    )
    agg = pts.groupBy("event_type", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(28,6)")).alias("sy"),
    )
    left = agg.select(
        "event_type",
        (F.col("b") + 1).alias("b"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias("ax"),
        (F.col("sy").cast("double") / F.col("n").cast("double")).alias("ay"),
    )
    right = agg.select(
        "event_type",
        (F.col("b") - 1).alias("b"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias("bx"),
        (F.col("sy").cast("double") / F.col("n").cast("double")).alias("by"),
    )
    # neighbor-bucket centroids: ≤ B rows per type — broadcast-sized.
    cand = (
        pts.filter((F.col("b") >= 1) & (F.col("b") <= B - 2))
        .join(F.broadcast(left), ["event_type", "b"])
        .join(F.broadcast(right), ["event_type", "b"])
    )
    xd = F.col("x").cast("double")
    area2 = F.abs(
        (F.col("ax") - xd) * (F.col("by") - F.col("y"))
        - (F.col("bx") - xd) * (F.col("ay") - F.col("y"))
    )
    pick = F.max(
        F.struct(
            area2.alias("a"),
            (-F.col("x")).alias("nx"),
            (-F.col("event_id")).alias("ne"),
            (-F.col("y")).alias("ny"),
            F.col("t_us").alias("t"),
            F.col("y").alias("v"),
        )
    )
    middle = cand.groupBy("event_type", "b").agg(
        pick.getField("t").alias("sel_t_us"),
        pick.getField("v").alias("sel_value"),
        pick.getField("a").alias("area2"),
    )
    first_s = F.min(F.struct("t_us", "event_id", "y"))
    last_s = F.max(F.struct("t_us", "event_id", "y"))
    ends = e.groupBy("event_type").agg(
        first_s.getField("t_us").alias("ft"),
        first_s.getField("y").alias("fv"),
        last_s.getField("t_us").alias("lt"),
        last_s.getField("y").alias("lv"),
    )
    first = ends.select(
        "event_type",
        F.lit(0).cast("bigint").alias("b"),
        F.col("ft").alias("sel_t_us"),
        F.col("fv").alias("sel_value"),
        F.lit(0.0).alias("area2"),
    )
    last = ends.select(
        "event_type",
        F.lit(B - 1).cast("bigint").alias("b"),
        F.col("lt").alias("sel_t_us"),
        F.col("lv").alias("sel_value"),
        F.lit(0.0).alias("area2"),
    )
    return (
        middle.unionByName(first)
        .unionByName(last)
        .select(
            "event_type",
            "b",
            F.timestamp_micros(F.col("sel_t_us")).alias("sel_ts"),
            "sel_value",
            sround(F.col("area2"), 6).alias("area2"),
        )
        .orderBy("event_type", "b", "sel_ts", "sel_value")
    )


ORACLE_LTTB = f"""
WITH e AS (
  SELECT event_type, epoch_us(ts) AS t_us, event_id, value AS y
  FROM ({_CLEAN_SQL})
), bounds AS (
  SELECT event_type, MIN(t_us) AS tmin, MAX(t_us) AS tmax
  FROM e GROUP BY 1
), pts AS (
  SELECT e.event_type, t_us, event_id, y,
         t_us - tmin AS x,
         CAST((t_us - tmin) * {LTTB_BUCKETS} // (tmax - tmin + 1)
              AS BIGINT) AS b
  FROM e JOIN bounds ON e.event_type = bounds.event_type
), agg AS (
  SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(28,6))) AS sy
  FROM pts GROUP BY 1, 2
), cand AS (
  SELECT p.event_type, p.b, p.x, p.event_id, p.y, p.t_us,
         CAST(l.sx AS DOUBLE) / CAST(l.n AS DOUBLE) AS ax,
         CAST(l.sy AS DOUBLE) / CAST(l.n AS DOUBLE) AS ay,
         CAST(r.sx AS DOUBLE) / CAST(r.n AS DOUBLE) AS bx,
         CAST(r.sy AS DOUBLE) / CAST(r.n AS DOUBLE) AS by
  FROM pts p
  JOIN agg l ON l.event_type = p.event_type AND l.b = p.b - 1
  JOIN agg r ON r.event_type = p.event_type AND r.b = p.b + 1
  WHERE p.b BETWEEN 1 AND {LTTB_BUCKETS - 2}
), scored AS (
  SELECT event_type, b, t_us, y,
         abs((ax - CAST(x AS DOUBLE)) * (by - y)
             - (bx - CAST(x AS DOUBLE)) * (ay - y)) AS area2,
         row_number() OVER (PARTITION BY event_type, b
                            ORDER BY abs((ax - CAST(x AS DOUBLE)) * (by - y)
                                   - (bx - CAST(x AS DOUBLE)) * (ay - y))
                              DESC, x ASC, event_id ASC, y ASC) AS rn
  FROM cand
), middle AS (
  SELECT event_type, b, t_us AS sel_t_us, y AS sel_value, area2
  FROM scored WHERE rn = 1
), er AS (
  SELECT event_type, t_us, y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY t_us, event_id, y) AS rn_a,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY t_us DESC, event_id DESC, y DESC)
           AS rn_d
  FROM e
), ends AS (
  SELECT f.event_type, f.t_us AS ft, f.y AS fv, l.t_us AS lt, l.y AS lv
  FROM (SELECT event_type, t_us, y FROM er WHERE rn_a = 1) f
  JOIN (SELECT event_type, t_us, y FROM er WHERE rn_d = 1) l
    USING (event_type)
), unioned AS (
  SELECT event_type, b, sel_t_us, sel_value, area2 FROM middle
  UNION ALL
  SELECT event_type, CAST(0 AS BIGINT), ft, fv, 0.0 FROM ends
  UNION ALL
  SELECT event_type, CAST({LTTB_BUCKETS - 1} AS BIGINT), lt, lv, 0.0
  FROM ends
)
SELECT event_type, b, make_timestamp(sel_t_us) AS sel_ts, sel_value,
       {sround_sql('area2', 6)} AS area2
FROM unioned
ORDER BY event_type, b, sel_ts, sel_value
"""


QUERIES = {
    "q_ohlc": q_ohlc,
    "q_time_weighted_avg": q_time_weighted_avg,
    "q_interpolate": q_interpolate,
    "q_lttb": q_lttb,
}

ORACLES = {
    "q_ohlc": ORACLE_OHLC,
    "q_time_weighted_avg": ORACLE_TIME_WEIGHTED_AVG,
    "q_interpolate": ORACLE_INTERPOLATE,
    "q_lttb": ORACLE_LTTB,
}
