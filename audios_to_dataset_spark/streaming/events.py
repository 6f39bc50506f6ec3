"""Structured Streaming twins of the event-time plans (SURVEY §2.8, M7).

The reference is strictly batch; these are the engine-capability
streaming operators over the events table — watermarked tumbling/
sliding windows, stream-static and stream-stream (inner + left-outer)
joins, custom stateful sessionization and bloom dedup via
applyInPandasWithState, windowed-HLL distinct, and top-k — executed
with the availableNow trigger against the same parquet so a batch
driver can still collect the result. Every query carries a FULL DuckDB
value-hash oracle: availableNow + append mode emits exactly the
closed-watermark set, which is SQL-expressible (closed windows /
all-but-last sessions / expired outer-join state), so even the
stateful operators are differentially tested rather than rows-only.
BATCH_TWINS exposes structurally identical batch plans for
tools/plan_audit.py (streaming queries execute on call).
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
    import os

    import pyarrow.parquet as pq

    batch_schema = load(spark, sf_dir, "events").schema
    # Sniff the physical timestamp precision: TIMESTAMP(NANOS) testdata
    # must stream as BIGINT + ns→us division (Spark rejects nanos
    # natively); TIMESTAMP(MICROS) testdata streams as a plain timestamp.
    import pyarrow as pa

    ts_field = pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts")
    # An int64-stored ts has no .unit — treat it like the batch loader's
    # `long` branch (catalog.load): raw nanoseconds needing ns→us division.
    if pa.types.is_timestamp(ts_field.type):
        nanos = ts_field.type.unit == "ns"
    else:
        nanos = True
    raw_schema = ",".join(
        f"{f.name} {'BIGINT' if f.name == 'ts' and nanos else f.dataType.simpleString()}"
        for f in batch_schema.fields
    )
    # FileStreamSource requires a directory; glob-filter to the one table.
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


STREAM_WATCHDOG_S = 600  # ~100x a normal sf0.01 replay; wedge -> error


def _run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Execute a streaming plan with the availableNow trigger into a
    memory sink and return the materialized batch DataFrame.

    Bounded wait: an availableNow microbatch that wedges (observed
    once under heavy host contention: two 1-task stages parked at 0%
    CPU) would otherwise block awaitTermination() forever and stall
    the WHOLE differential gate. The watchdog converts a hang into one
    failed query; the ceiling is ~100x a normal replay so it never
    trips on a healthy run."""
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
    if not q.awaitTermination(STREAM_WATCHDOG_S):
        q.stop()
        raise RuntimeError(
            f"streaming replay {query_name} still running after"
            f" {STREAM_WATCHDOG_S}s — wedged microbatch killed"
        )
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


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with a
    30-minute gap via ``applyInPandasWithState`` (SURVEY §2.8 — the
    applyInPandasWithState pattern for operators Spark lacks built-in).

    State per user = the open session (start, end, n). A session is
    emitted when a later event arrives beyond the gap; each user's
    still-open tail session stays in state and is never emitted, which
    makes the emitted set deterministic and SQL-expressible (all
    sessions but each user's last) — so even this stateful operator
    gets a full DuckDB oracle, not a rows-only check. Arrow-batched
    per-key pandas, state is 3 longs/user — scales by user_id shuffle.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    # sessionization needs a user and a timestamp: a NULL user_id key
    # reaches the state fn as None (int(None) kills the task — one
    # dirty row must not fail the stream), and NULL ts can't be
    # ordered. Dropped on both sides (--nulls sweep).
    ev = (
        _stream_events(spark, sf_dir)
        .select("user_id", "ts")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )

    def sessionize(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            s, e, n = state.get
        else:
            s = e = n = None
        out: list[tuple] = []
        for t in rows["ts"]:
            us = int(pd.Timestamp(t).value // 1_000)
            if s is None:
                s, e, n = us, us, 1
            elif us - e > SESSION_GAP_US:
                out.append((key[0], s, e, n))
                s, e, n = us, us, 1
            else:
                e, n = us, n + 1
        state.update((s, e, n))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([r[0] for r in out], dtype="int64"),
                "session_start": pd.to_datetime(
                    [r[1] for r in out], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [r[2] for r in out], unit="us"
                ),
                "n_events": pd.Series([r[3] for r in out], dtype="int64"),
            }
        )

    sessions = ev.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=(
            "user_id bigint, session_start timestamp,"
            " session_end timestamp, n_events bigint"
        ),
        stateStructType="s long, e long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_available_now(sessions, "sessions")



BLOOM_M_BITS = 1024
BLOOM_K = 3


def q_stream_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed bloom dedup: per (event_type, hour) the state is a fixed
    1024-bit bloom bitset — an event is emitted only if it sets a new bit
    for its user signature. Unlike ``dropDuplicates`` (whose per-key state
    grows with distinct keys), state here is a constant 128 bytes per
    window regardless of cardinality — the memory-bounded streaming dedup
    you actually run over an unbounded firehose, trading bounded false
    positives (never false negatives) for O(1) state.

    The bloom is exactly replayable: bit positions come from the same
    md5 scheme as operators/bloom.py, and because a fully-covered
    signature sets no new bits, always-insert semantics coincide with
    insert-on-emit — so "emitted" ⟺ "first event to set one of its k
    bits", which the DuckDB oracle computes with a min-rank per
    (window, bit) group. A full differential check of a stateful
    streaming operator, not a rows-only smoke.
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    m, k = BLOOM_M_BITS, BLOOM_K

    def positions(uid: int) -> list[int]:
        # Twin of operators/bloom.py:_position — 60-bit md5 prefix mod m.
        return [
            int(
                hashlib.md5(f"{s}:{uid}".encode()).hexdigest()[:15], 16
            ) & (m - 1)
            for s in range(k)
        ]

    def dedup(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        bloom = int.from_bytes(state.get[0], "big") if state.exists else 0
        keep: list[int] = []
        users: list[int] = []
        for eid, uid in zip(rows["event_id"], rows["user_id"]):
            mask = 0
            for p in positions(int(uid)):
                mask |= 1 << p
            if mask & ~bloom:
                keep.append(int(eid))
                users.append(int(uid))
            bloom |= mask
        state.update((bloom.to_bytes(m // 8, "big"),))
        yield pd.DataFrame(
            {
                "event_id": pd.Series(keep, dtype="int64"),
                "event_type": key[0],
                "win_start": key[1],
                "user_id": pd.Series(users, dtype="int64"),
            }
        )

    # the bloom signature is int(user_id) and the window key needs ts:
    # NULL rows would crash the state fn (int(None)) — dropped on both
    # sides (--nulls sweep)
    ev = (
        _stream_events(spark, sf_dir)
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            "event_id",
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("win_start"),
            "ts",
            "user_id",
        )
    )
    out = ev.groupBy("event_type", "win_start").applyInPandasWithState(
        dedup,
        outputStructType=(
            "event_id bigint, event_type string,"
            " win_start timestamp, user_id bigint"
        ),
        stateStructType="bloom binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_available_now(out, "bloom_dedup")


def _oracle_stream_bloom_dedup() -> str:
    from ..operators.bloom import bloom_positions_sql

    pos = ", ".join(
        bloom_positions_sql("user_id", s, BLOOM_M_BITS)
        for s in range(BLOOM_K)
    )
    return f"""
WITH e AS (
  SELECT event_id, event_type, user_id, ts,
         date_trunc('hour', ts) AS win_start
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_id IS NOT NULL
), ord AS (
  SELECT *, row_number() OVER (PARTITION BY event_type, win_start
                               ORDER BY ts, event_id) AS rn
  FROM e
), bits AS (
  SELECT event_type, win_start, event_id, user_id, rn,
         unnest([{pos}]) AS pos
  FROM ord
), first_set AS (
  SELECT event_type, win_start, pos, MIN(rn) AS first_rn
  FROM bits GROUP BY event_type, win_start, pos
)
SELECT b.event_id, b.event_type, b.win_start, MIN(b.user_id) AS user_id
FROM bits b
-- NULL-safe on event_type: the untyped bucket is a legitimate window
-- key for the stream (groupBy keeps NULL groups) but plain = would
-- never match it here (--nulls sweep)
JOIN first_set f ON f.event_type IS NOT DISTINCT FROM b.event_type
                AND f.win_start = b.win_start AND f.pos = b.pos
GROUP BY b.event_id, b.event_type, b.win_start
HAVING SUM(CASE WHEN b.rn = f.first_rn THEN 1 ELSE 0 END) > 0
"""


def q_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly filter: broadcast per-type stats computed from
    the static batch (the "trained model"), score each streamed event's
    z-score JVM-side, emit only outliers — the canonical stateless
    inference-over-stream shape (no state, no watermark needed; each
    micro-batch probes the broadcast).

    Because the operator is stateless, availableNow emits exactly the
    batch anomaly set, so the DuckDB oracle is the same z-score query —
    a full differential check of the streaming path.
    """
    from ..plans._util import davg, sround

    batch = load(spark, sf_dir, "events")
    stats = batch.groupBy("event_type").agg(
        davg("value").alias("mean"),
        davg(F.col("value") * F.col("value")).alias("m2"),
    )
    std = F.sqrt(F.col("m2") - F.col("mean") * F.col("mean"))
    z = sround((F.col("value") - F.col("mean")) / std, 6)
    ev = _stream_events(spark, sf_dir)
    out = (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 3.0)
    )
    return _run_available_now(out, "anomaly")


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with event-time range condition: each
    view event pairs with the same user's purchases in the following
    hour (the classic streaming attribution join). Both sides carry
    watermarks and the join has an explicit time bound, so Spark can
    expire join state — the required shape for an unbounded run; with
    availableNow over one file the emitted pairs are exactly the batch
    self-join, which the oracle replays."""
    v = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
        )
    )
    p = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    j = v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts > view_ts"
            " AND purchase_ts <= view_ts + INTERVAL 1 HOUR"
        ),
    ).select(
        F.col("v_user").cast("bigint").alias("user_id"),
        "view_ts",
        "purchase_ts",
        "purchase_value",
    )
    return _run_available_now(j, "stream_stream")


HLL_STREAM_M = 64


def q_stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming × sketch composition: approx distinct users per 1-hour
    window over the event STREAM. The streaming job maintains only the
    md5 HLL register table per window (m=64 rows of watermarked state —
    never per-user sets, never growing with cardinality); append mode
    emits each window's registers when the watermark closes it, and a
    cheap batch finish turns registers into estimates. This is the
    firehose "uniques per hour" dashboard shape, and because the
    registers are deterministic integer arithmetic the whole composite
    carries a full DuckDB oracle (the closed-window HLL replay)."""
    from ..operators.sketch import (
        hll_estimate_from_registers,
        hll_reg_rho_cols,
    )
    from ..plans._util import sround

    ev = _stream_events(spark, sf_dir)
    reg, rho = hll_reg_rho_cols("user_id", HLL_STREAM_M)
    regs = (
        ev.select("ts", reg.alias("reg"), rho.alias("rho"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "reg")
        .agg(F.max("rho").alias("m_j"))
        .select(F.col("w.start").alias("win_start"), "reg", "m_j")
    )
    closed = _run_available_now(regs, "hll")
    return (
        hll_estimate_from_registers(closed, ["win_start"], HLL_STREAM_M)
        .select(
            "win_start",
            "registers_hit",
            sround(F.col("hll_estimate"), 4).alias("hll_estimate"),
        )
        .orderBy("win_start")
    )


def q_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join with event-time range condition —
    the attribution join that also reports unconverted views: matched
    (view, purchase) pairs emit like the inner join; a view with no
    qualifying purchase emits a null-padded row when the watermark
    passes the end of its match window (view_ts + 1h) and its join
    state is evicted. Views whose window is still open at end-of-stream
    stay in state and never emit — so the emitted set is deterministic
    and fully SQL-expressible: the batch left join, keeping null rows
    only for views whose window closed before the final watermark
    (max(ts) − 2h). This exercises the state-expiry path the inner join
    never touches; state size is bounded by the watermark exactly as in
    an unbounded run."""
    v = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
        )
    )
    p = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "2 hours")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    j = v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts > view_ts"
            " AND purchase_ts <= view_ts + INTERVAL 1 HOUR"
        ),
        "left_outer",
    ).select(
        F.col("v_user").cast("bigint").alias("user_id"),
        "view_ts",
        "purchase_ts",
        "purchase_value",
    )
    return _run_available_now(j, "stream_outer")


def q_stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-ingest / batch-finish top-k: watermarked 1-hour tumbling
    counts per event_type stream into the sink (append mode — closed
    windows only), then a batch rank keeps each window's top-3 types.
    This split is the production shape for "trending now" dashboards:
    the streaming job maintains only windowed-count state (bounded by
    the watermark), and the cheap rank runs over the already-tiny
    aggregate — never over the firehose.

    The rank window partitions by win_start, so the finish step shuffles
    the aggregate on window key — no single-partition sort."""
    from pyspark.sql import Window

    # "trending types" excludes the untyped bucket: NULL event_type
    # also breaks the rank tie (the engines order NULLs oppositely) —
    # dropped on both sides (--nulls sweep)
    ev = _stream_events(spark, sf_dir).filter(
        F.col("event_type").isNotNull()
    )
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events"
        )
    )
    closed = _run_available_now(agg, "topk")
    rk = Window.partitionBy("win_start").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    return (
        closed.withColumn("rk", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .orderBy("win_start", "rk")
    )


def _oracle_stream_hll() -> str:
    from ..operators.sketch import hll_final_sql, hll_regs_sql
    from ..plans._util import sround_sql

    hourly = "(SELECT date_trunc('hour', ts) AS win_start, user_id FROM events) t"
    return f"""
WITH regs AS (
  {hll_regs_sql(hourly, 'user_id', ['win_start'], HLL_STREAM_M)}
), est AS (
  {hll_final_sql(['win_start'], HLL_STREAM_M)}
)
SELECT win_start, registers_hit,
       {sround_sql('hll_estimate', 4)} AS hll_estimate
FROM est
WHERE win_start + INTERVAL 1 HOUR
      <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
ORDER BY win_start
"""


def _drift_rollup(spark: SparkSession, sf_dir: str, wins: DataFrame) -> DataFrame:
    """Dashboard-side scoring shared by q_stream_drift and its batch
    twin: join the windowed (type, bin) counts against the static
    full-corpus histogram and score each (window, type) with the
    triangular-discrimination divergence (q_value_drift's rational
    formula). Every window bin is necessarily present in the corpus
    baseline (window events ⊂ corpus), so a left join covers the bin
    union exactly."""
    from ..plans._util import sround

    e = load(spark, sf_dir, "events")
    binc = F.floor(F.col("value") / F.lit(50.0)).cast("bigint")
    base = e.groupBy("event_type", binc.alias("bin")).agg(
        F.count(F.lit(1)).alias("n_b")
    )
    bt = base.groupBy("event_type").agg(F.sum("n_b").alias("t_b"))
    wt = wins.groupBy("win_start", "event_type").agg(
        F.sum("n").alias("t_w")
    )
    sp = (
        wt.join(base, "event_type")
        .join(bt, "event_type")
        .join(
            wins.withColumnRenamed("n", "_n"),
            ["win_start", "event_type", "bin"],
            "left",
        )
        .fillna(0, ["_n"])
    )
    p_w = F.col("_n").cast("double") / F.col("t_w").cast("double")
    p_b = F.col("n_b").cast("double") / F.col("t_b").cast("double")
    term = (p_w - p_b) * (p_w - p_b) / (p_w + p_b)
    return (
        sp.select(
            "win_start",
            "event_type",
            "t_w",
            sround(term * 1e6, 6).alias("_t"),
        )
        .groupBy("win_start", "event_type")
        .agg(
            F.max("t_w").alias("n_events"),
            F.sum(F.col("_t").cast("decimal(28,6)"))
            .cast("double")
            .alias("drift_ppm"),
        )
    )


def q_stream_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor — the production shape of q_value_drift:
    the STREAM holds only watermarked 6-hour-window (type, bin) counts
    (bounded state: types × bins per open window, never raw events);
    each closed window's histogram is then scored against the static
    full-corpus baseline batch-side, exactly how a monitoring dashboard
    reads the sink. Divergence is the same transcendental-free
    triangular discrimination as the batch drift query."""
    ev = _stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "6 hours").alias("w"),
            "event_type",
            F.floor(F.col("value") / F.lit(50.0))
            .cast("bigint")
            .alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "bin", "n")
    )
    # the memory-sink table is referenced on BOTH sides of the rollup's
    # self-join (per-window totals vs per-bin counts); checkpoint it into
    # a plain materialized frame first — re-planning the sink relation
    # twice trips an internal analyzer error on streaming-sourced tables
    wins = _run_available_now(agg, "drift").localCheckpoint(eager=True)
    return _drift_rollup(spark, sf_dir, wins)


def _twin_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    wmax = e.agg(F.max("ts").alias("_mx"))
    wb = (
        e.groupBy(
            F.window("ts", "6 hours").alias("w"),
            "event_type",
            F.floor(F.col("value") / F.lit(50.0))
            .cast("bigint")
            .alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"),
                F.col("w.end").alias("_we"), "event_type", "bin", "n")
        .crossJoin(F.broadcast(wmax))
        .filter(
            F.unix_micros("_we")
            <= F.unix_micros("_mx") - 2 * 3600 * 1_000_000
        )
        .select("win_start", "event_type", "bin", "n")
    )
    return _drift_rollup(spark, sf_dir, wb)


def _tws_available() -> bool:
    """transformWithStateInPandas ships with PySpark 4 but its state
    protocol runs over protobuf; this container has no google.protobuf
    (and no pip), so the new API is import-gated with an
    applyInPandasWithState fallback producing identical output."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


_RECORD_HIGH_OUT = (
    "user_id bigint, event_id bigint, ts timestamp, value double"
)


def _record_high_emit(pdf, mx):
    """Shared kernel: rows breaking the running max, in (ts, event_id)
    order; returns (DataFrame, new_max)."""
    import pandas as pd

    keep = []
    for r in pdf.sort_values(["ts", "event_id"]).itertuples(index=False):
        v = float(r.value)
        if mx is None or v > mx:
            keep.append(r)
            mx = v
    return (
        pd.DataFrame(
            {
                "user_id": pd.Series(
                    [int(r.user_id) for r in keep], dtype="int64"
                ),
                "event_id": pd.Series(
                    [int(r.event_id) for r in keep], dtype="int64"
                ),
                "ts": pd.Series(
                    [r.ts for r in keep], dtype="datetime64[us]"
                ),
                "value": pd.Series(
                    [float(r.value) for r in keep], dtype="float64"
                ),
            }
        ),
        mx,
    )


def q_stream_record_high(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user record-breaking events — the streaming "new high-water
    alert" primitive (latency spike, spend record, quality ceiling):
    emit every event whose value strictly exceeds the user's running
    maximum in (ts, event_id) order; state is one double per user.

    Runs on ``transformWithStateInPandas`` (the Spark 4 arbitrary-state
    API: typed ValueState replacing applyInPandasWithState's single
    tuple) when its protobuf dependency is importable, else on
    ``applyInPandasWithState`` — both drive the same
    ``_record_high_emit`` kernel, so the emitted set is identical.

    Determinism: availableNow over one parquet = one micro-batch, and
    the kernel orders each user's rows by the total (ts, event_id)
    key, so the emitted set equals the batch window formulation
    ``value > max(value) OVER (... ROWS UNBOUNDED PRECEDING TO 1
    PRECEDING)`` — a full DuckDB oracle, not a rows-only check. NULL
    key/ts/value rows are dropped on both sides (--nulls sweep; a NULL
    in the state fn would poison the task)."""
    import pandas as pd

    ev = (
        _stream_events(spark, sf_dir)
        .select("user_id", "event_id", "ts", "value")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("event_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
    )

    if _tws_available():
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class RecordHigh(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._mx = handle.getValueState("mx", "mx double")

            def handleInputRows(self, key, rows, timerValues):
                pdf = pd.concat(list(rows))
                mx = self._mx.get()[0] if self._mx.exists() else None
                out, mx = _record_high_emit(pdf, mx)
                self._mx.update((mx,))
                yield out

            def close(self) -> None:
                pass

        out = ev.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RecordHigh(),
            outputStructType=_RECORD_HIGH_OUT,
            outputMode="append",
            timeMode="none",
        )
    else:
        from pyspark.sql.streaming.state import (
            GroupState,
            GroupStateTimeout,
        )

        def record_high(key, pdfs, state: GroupState):
            pdf = pd.concat(list(pdfs))
            mx = state.get[0] if state.exists else None
            out, mx = _record_high_emit(pdf, mx)
            state.update((mx,))
            yield out

        out = ev.groupBy("user_id").applyInPandasWithState(
            record_high,
            outputStructType=_RECORD_HIGH_OUT,
            stateStructType="mx double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return _run_available_now(out, "record_high")


ORACLE_STREAM_RECORD_HIGH = """
WITH e AS (
  SELECT user_id, event_id, ts, value FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL
    AND ts IS NOT NULL AND value IS NOT NULL
), m AS (
  SELECT user_id, event_id, ts, value,
         MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM e
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS event_id, ts,
       CAST(value AS DOUBLE) AS value
FROM m WHERE prev_max IS NULL OR value > prev_max
"""


def _twin_record_high(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin (plan audit): the window formulation of the same
    record-high filter — identical shuffle key (user_id) and per-user
    ordering as the stateful processor."""
    from pyspark.sql import Window

    e = (
        load(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("event_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return e.withColumn("prev_max", F.max("value").over(w)).filter(
        F.col("prev_max").isNull() | (F.col("value") > F.col("prev_max"))
    ).drop("prev_max")


def _with_mp3_duration(df: DataFrame) -> DataFrame:
    """Attach ``dur_ms`` decoded by the REAL MP3 frame walk over the
    per-event fixture bytes — an Arrow-batched pandas UDF inside the
    STREAMING plan (the shape a production pipeline uses to enrich a
    stream of media blobs with header metadata)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..functions.audio_headers import parse_mp3_header, synth_mp3

    @pandas_udf("long")
    def _dur(ids):  # type: ignore[no-untyped-def]
        out = []
        for i in ids:
            _f, _sr, _ch, ms = parse_mp3_header(synth_mp3(int(i)))
            out.append(ms)
        return pd.Series(out, dtype="int64")

    return df.withColumn("dur_ms", _dur(F.col("event_id")))


def q_stream_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MEDIA-METADATA enrichment — the bridge between the
    streaming and multimodal pillars: each event carries a media blob
    (deterministic MP3 fixture keyed on event_id), a pandas UDF inside
    the stream runs the real ID3v2-skip + MPEG frame walk, and a
    watermarked hourly window aggregates clip count + total decoded
    duration per event type. Append mode emits exactly the closed
    windows; the oracle recomputes every duration from the id formula
    (integer-floor ms) with the watermark bound on the FILTERED
    stream's own max ts. id-less / unstamped events are dropped on
    both sides (the fixture needs an id; F.window needs a ts)."""
    ev = _stream_events(spark, sf_dir).filter(
        F.col("event_id").isNotNull() & F.col("ts").isNotNull()
    )
    enriched = _with_mp3_duration(ev)
    agg = (
        enriched.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_clips"),
            F.sum("dur_ms").cast("bigint").alias("sum_ms"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_clips",
            "sum_ms",
        )
    )
    return _run_available_now(agg, "media_meta")


def _twin_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull() & F.col("ts").isNotNull()
    )
    return (
        _with_mp3_duration(e)
        .groupBy(F.date_trunc("hour", "ts").alias("win_start"),
                 "event_type")
        .agg(
            F.count("*").alias("n_clips"),
            F.sum("dur_ms").cast("bigint").alias("sum_ms"),
        )
    )


ORACLE_STREAM_MEDIA_META = """
SELECT date_trunc('hour', ts) AS win_start, event_type,
       COUNT(*) AS n_clips,
       CAST(SUM((3 + event_id % 5) * 1152 * 1000 //
                (CASE event_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                                   ELSE 32000 END)) AS BIGINT) AS sum_ms
FROM events
WHERE event_id IS NOT NULL AND ts IS NOT NULL
GROUP BY 1, 2
HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR
       <= (SELECT max(ts) FROM events
           WHERE event_id IS NOT NULL AND ts IS NOT NULL)
          - INTERVAL 2 HOUR
"""


QUERIES = {
    "q_stream_media_meta": q_stream_media_meta,
    "q_stream_record_high": q_stream_record_high,
    "q_stream_hll": q_stream_hll,
    "q_stream_topk": q_stream_topk,
    "q_stream_tumbling": q_stream_tumbling,
    "q_stream_dedup": q_stream_dedup,
    "q_stream_sliding": q_stream_sliding,
    "q_stream_static_join": q_stream_static_join,
    "q_stream_stream_join": q_stream_stream_join,
    "q_stream_outer_join": q_stream_outer_join,
    "q_stream_sessions": q_stream_sessions,
    "q_stream_bloom_dedup": q_stream_bloom_dedup,
    "q_stream_anomaly": q_stream_anomaly,
    "q_stream_drift": q_stream_drift,
}

# q_stream_dedup's SURVIVORS are arrival-order dependent, but the
# declared projection (distinct event types per user) is not: dedup
# keeps exactly one row per (user, type), so the count equals the batch
# COUNT(DISTINCT event_type) — a full oracle after all. The tumbling
# window is likewise oracle-checkable:
# availableNow + append mode emits exactly the windows whose end has
# passed the final watermark max(ts) - delay (verified empirically:
# 3370/3370 rows equal at sf0.01).
ORACLES: dict[str, str] = {
    "q_stream_media_meta": ORACLE_STREAM_MEDIA_META,
    "q_stream_record_high": ORACLE_STREAM_RECORD_HIGH,
    "q_stream_hll": _oracle_stream_hll(),
    "q_stream_topk": """
WITH counts AS (
  SELECT date_trunc('hour', ts) AS win_start, event_type,
         COUNT(*) AS n_events
  FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2
  -- the watermark advances on the FILTERED stream's own max event time
  -- (same class as the q_stream_outer_join --skew find)
  HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR
         <= (SELECT max(ts) FROM events WHERE event_type IS NOT NULL)
            - INTERVAL 2 HOUR),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY win_start
              ORDER BY n_events DESC, event_type) AS BIGINT) AS rk
  FROM counts)
SELECT win_start, event_type, n_events, rk
FROM ranked WHERE rk <= 3 ORDER BY win_start, rk
""",
    "q_stream_bloom_dedup": _oracle_stream_bloom_dedup(),
    # stateless inference filter: availableNow output == batch z-score set
    "q_stream_anomaly": __import__(
        "audios_to_dataset_spark.plans.events", fromlist=["x"]
    ).ORACLE_ANOMALY_ZSCORE,
    "q_stream_dedup": """
SELECT user_id, COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
""",
    "q_stream_drift": """
WITH wb AS (
  SELECT time_bucket(INTERVAL 6 HOUR, ts) AS win_start, event_type,
         CAST(floor(value / 50.0) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
  HAVING time_bucket(INTERVAL 6 HOUR, ts) + INTERVAL 6 HOUR
         <= (SELECT max(ts) FROM events) - INTERVAL 2 HOUR
), wt AS (
  SELECT win_start, event_type, CAST(SUM(n) AS BIGINT) AS t_w
  FROM wb GROUP BY 1, 2
), base AS (
  SELECT event_type, CAST(floor(value / 50.0) AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n_b
  FROM events GROUP BY 1, 2
), bt AS (
  SELECT event_type, CAST(SUM(n_b) AS BIGINT) AS t_b FROM base GROUP BY 1
), sp AS (
  SELECT wt.win_start, wt.event_type, base.bin, base.n_b, bt.t_b, wt.t_w,
         COALESCE(wb.n, 0) AS n
  FROM wt JOIN base USING (event_type) JOIN bt USING (event_type)
  LEFT JOIN wb ON wb.win_start = wt.win_start
              AND wb.event_type = wt.event_type AND wb.bin = base.bin
), terms AS (
  SELECT win_start, event_type, t_w,
         (round((((CAST(n AS DOUBLE) / CAST(t_w AS DOUBLE))
                 - (CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE)))
               * ((CAST(n AS DOUBLE) / CAST(t_w AS DOUBLE))
                 - (CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE)))
               / ((CAST(n AS DOUBLE) / CAST(t_w AS DOUBLE))
                 + (CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE)))
               * 1000000.0) * 1000000.0) / 1000000.0) + 0.0 AS t
  FROM sp
)
SELECT win_start, event_type, CAST(MAX(t_w) AS BIGINT) AS n_events,
       CAST(SUM(CAST(t AS DECIMAL(28,6))) AS DOUBLE) AS drift_ppm
FROM terms GROUP BY win_start, event_type
""",
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
    # Emitted sessions = every closed session, i.e. all but each user's
    # last (the still-open one held in state at end of stream).
    # Outer rows: a null-padded view emits when its match window
    # (view_ts + 1h) closes before the final watermark (max(ts) - 2h);
    # matched pairs emit exactly like the inner join.
    "q_stream_outer_join": """
WITH v AS (
  SELECT user_id, ts FROM events WHERE event_type = 'view'
), p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT v.user_id, v.ts AS view_ts, p.ts AS purchase_ts,
         p.value AS purchase_value
  FROM v LEFT JOIN p ON v.user_id = p.user_id
     AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
)
SELECT CAST(user_id AS BIGINT) AS user_id, view_ts, purchase_ts,
       purchase_value
FROM j
-- the GLOBAL watermark of a stream-stream join is the MIN of the two
-- inputs' watermarks, each computed from that stream's own max event
-- time AFTER its filter — not max(ts) over all events (the --skew
-- sweep exposed the difference: when another event type carries the
-- corpus max ts, the old bound over-advanced the watermark and
-- evicted one view Spark still held in state)
WHERE purchase_ts IS NOT NULL
   OR view_ts + INTERVAL 1 HOUR
      < LEAST(
          (SELECT max(ts) FROM events WHERE event_type = 'view'),
          (SELECT max(ts) FROM events WHERE event_type = 'purchase')
        ) - INTERVAL 2 HOUR
""",
    "q_stream_stream_join": """
SELECT CAST(v.user_id AS BIGINT) AS user_id, v.ts AS view_ts,
       p.ts AS purchase_ts, p.value AS purchase_value
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND v.event_type = 'view' AND p.event_type = 'purchase'
 AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
""",
    "q_stream_sessions": """
WITH s AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), g AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
), agg AS (
  SELECT user_id, sid, MIN(ts) AS session_start,
         MAX(ts) AS session_end, COUNT(*) AS n_events
  FROM g GROUP BY 1, 2
)
SELECT user_id, session_start, session_end, n_events
FROM agg
WHERE sid < (SELECT MAX(sid) FROM agg a2 WHERE a2.user_id = agg.user_id)
""",
}


# ---------------------------------------------------------------------------
# Batch twins for tools/plan_audit.py. The streaming queries execute on
# call (availableNow into a memory sink), so the plan audit can't explain
# them without running them; each twin below builds the structurally
# identical BATCH plan — same shuffle keys, join types, window
# partitioning, and (for the stateful ops) the same groupBy →
# applyInPandas exchange — so cartesians / conditional BNLJs /
# single-partition windows in the streaming graphs are caught here.
# The twins are real executable queries, not explain-only shells.
# ---------------------------------------------------------------------------


def _twin_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events")
    )


def _twin_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.dropDuplicates(["user_id", "event_type"])
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n_types"))
    )


def _twin_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "n_events")
    )


def _twin_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans._util import dsum

    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return (
        ev.join(F.broadcast(cust), "user_id")
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


def _twin_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return v.join(
        p,
        F.expr(
            "v_user = p_user AND purchase_ts > view_ts"
            " AND purchase_ts <= view_ts + INTERVAL 1 HOUR"
        ),
    ).select(
        F.col("v_user").cast("bigint").alias("user_id"),
        "view_ts",
        "purchase_ts",
        "purchase_value",
    )


def _twin_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("m"))
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return (
        v.join(
            p,
            F.expr(
                "v_user = p_user AND purchase_ts > view_ts"
                " AND purchase_ts <= view_ts + INTERVAL 1 HOUR"
            ),
            "left_outer",
        )
        .crossJoin(F.broadcast(max_ts))
        .filter(
            F.col("purchase_ts").isNotNull()
            | (
                F.col("view_ts") + F.expr("INTERVAL 1 HOUR")
                < F.col("m") - F.expr("INTERVAL 2 HOUR")
            )
        )
        .select(
            F.col("v_user").cast("bigint").alias("user_id"),
            "view_ts",
            "purchase_ts",
            "purchase_value",
        )
    )


def _twin_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same groupBy(user_id) → per-key pandas exchange as the streaming
    sessionizer; emits every closed session (all but each user's last)."""
    import pandas as pd

    def sessionize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        out: list[tuple] = []
        s = e = n = None
        uid = int(pdf["user_id"].iloc[0])
        for t in pdf["ts"]:
            us = int(pd.Timestamp(t).value // 1_000)
            if s is None:
                s, e, n = us, us, 1
            elif us - e > SESSION_GAP_US:
                out.append((uid, s, e, n))
                s, e, n = us, us, 1
            else:
                e, n = us, n + 1
        return pd.DataFrame(
            {
                "user_id": pd.Series([r[0] for r in out], dtype="int64"),
                "session_start": pd.to_datetime([r[1] for r in out], unit="us"),
                "session_end": pd.to_datetime([r[2] for r in out], unit="us"),
                "n_events": pd.Series([r[3] for r in out], dtype="int64"),
            }
        )

    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    return ev.groupBy("user_id").applyInPandas(
        sessionize,
        "user_id bigint, session_start timestamp,"
        " session_end timestamp, n_events bigint",
    )


def _twin_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same groupBy(event_type, hour) → per-key pandas exchange as the
    streaming bloom; replays the bloom insert loop without state."""
    import hashlib

    import pandas as pd

    m, k = BLOOM_M_BITS, BLOOM_K

    def dedup(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        bloom = 0
        keep: list[int] = []
        users: list[int] = []
        for eid, uid in zip(pdf["event_id"], pdf["user_id"]):
            mask = 0
            for s in range(k):
                mask |= 1 << (
                    int(
                        hashlib.md5(f"{s}:{int(uid)}".encode()).hexdigest()[
                            :15
                        ],
                        16,
                    )
                    & (m - 1)
                )
            if mask & ~bloom:
                keep.append(int(eid))
                users.append(int(uid))
            bloom |= mask
        return pd.DataFrame(
            {
                "event_id": pd.Series(keep, dtype="int64"),
                "event_type": pdf["event_type"].iloc[0],
                "win_start": pdf["win_start"].iloc[0],
                "user_id": pd.Series(users, dtype="int64"),
            }
        )

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("win_start"),
        "ts",
        "user_id",
    )
    return ev.groupBy("event_type", "win_start").applyInPandas(
        dedup,
        "event_id bigint, event_type string,"
        " win_start timestamp, user_id bigint",
    )


def _twin_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans._util import davg, sround

    batch = load(spark, sf_dir, "events")
    stats = batch.groupBy("event_type").agg(
        davg("value").alias("mean"),
        davg(F.col("value") * F.col("value")).alias("m2"),
    )
    std = F.sqrt(F.col("m2") - F.col("mean") * F.col("mean"))
    z = sround((F.col("value") - F.col("mean")) / std, 6)
    return (
        batch.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > 3.0)
    )


def _twin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    counts = _twin_tumbling(spark, sf_dir)
    rk = Window.partitionBy("win_start").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    return (
        counts.withColumn("rk", F.row_number().over(rk).cast("bigint"))
        .filter(F.col("rk") <= 3)
    )


def _twin_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import (
        hll_estimate_from_registers,
        hll_registers,
    )
    from ..plans._util import sround

    hourly = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("win_start"), "user_id"
    )
    regs = hll_registers(hourly, "user_id", ["win_start"], HLL_STREAM_M)
    return hll_estimate_from_registers(
        regs, ["win_start"], HLL_STREAM_M
    ).select(
        "win_start",
        "registers_hit",
        sround(F.col("hll_estimate"), 4).alias("hll_estimate"),
    )


BATCH_TWINS = {
    "q_stream_media_meta": _twin_media_meta,
    "q_stream_record_high": _twin_record_high,
    "q_stream_drift": _twin_drift,
    "q_stream_hll": _twin_hll,
    "q_stream_topk": _twin_topk,
    "q_stream_tumbling": _twin_tumbling,
    "q_stream_dedup": _twin_dedup,
    "q_stream_sliding": _twin_sliding,
    "q_stream_static_join": _twin_static_join,
    "q_stream_stream_join": _twin_stream_join,
    "q_stream_outer_join": _twin_outer_join,
    "q_stream_sessions": _twin_sessions,
    "q_stream_bloom_dedup": _twin_bloom_dedup,
    "q_stream_anomaly": _twin_anomaly,
}


# --------------------------------------------------------------------------
# round-10 addition: stateful streaming last-touch attribution

ATTR_WINDOW_US = 86_400_000_000  # 24 h lookback (plans/nonparam twin)
ATTR_CHANNELS = ("click", "view")
_ATTR_NO_TOUCH = -(10**18)  # state sentinel: no channel event seen yet


def q_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming last-touch revenue attribution via
    ``applyInPandasWithState``: per-user state is ONE (last channel
    ts, last channel type) pair — each arriving purchase is credited
    to the most recent prior click/view within 24 h, else 'direct',
    and the batch finish aggregates the emitted credits per channel.

    The streaming twin of plans/nonparam.q_attribution: state is two
    scalars per user (bounded, unlike a buffered-timeline join), rows
    inside a micro-batch are processed in (ts, event_id) order — the
    same total order as the batch window — so the availableNow replay
    emits exactly the batch result and the operator gets a full DuckDB
    oracle. NULL user_id (no state key) and NULL ts (unordered) rows
    are dropped on both sides; NULL-value purchases are not credited.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from ..plans._util import dsum

    ev = (
        _stream_events(spark, sf_dir)
        .select("user_id", "ts", "event_id", "event_type", "value")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )

    def attribute(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            ch_us, ch_type = state.get
        else:
            ch_us, ch_type = _ATTR_NO_TOUCH, ""
        chans: list[str] = []
        vals: list[float] = []
        for t, et, v in zip(rows["ts"], rows["event_type"],
                            rows["value"]):
            t_us = int(pd.Timestamp(t).value // 1_000)
            if et == "purchase" and pd.notna(v):
                if (ch_us != _ATTR_NO_TOUCH
                        and ch_us >= t_us - ATTR_WINDOW_US):
                    chans.append(ch_type)
                else:
                    chans.append("direct")
                vals.append(float(v))
            if et in ATTR_CHANNELS:
                ch_us, ch_type = t_us, et
        state.update((ch_us, ch_type))
        yield pd.DataFrame(
            {
                "channel": pd.Series(chans, dtype="object"),
                "value": pd.Series(vals, dtype="float64"),
            }
        )

    credits = ev.groupBy("user_id").applyInPandasWithState(
        attribute,
        outputStructType="channel string, value double",
        stateStructType="ch_us long, ch_type string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = _run_available_now(credits, "attribution")
    return (
        emitted.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conv"),
            dsum("value").alias("revenue"),
        )
        .orderBy("channel")
    )


# Full oracle: the replay processes each user's whole timeline in
# (ts, event_id) order, so the emitted credit set equals the batch
# last-touch window — restricted to non-NULL user_id (the state key).
ORACLE_STREAM_ATTRIBUTION = f"""
WITH e AS (
  SELECT event_type, value, epoch_us(ts) AS t_us, user_id, event_id, ts
  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
), touched AS (
  SELECT event_type, value, t_us,
    last_value(CASE WHEN event_type IN ('click', 'view') THEN t_us END
               IGNORE NULLS) OVER w AS ch_us,
    last_value(CASE WHEN event_type IN ('click', 'view')
               THEN event_type END IGNORE NULLS) OVER w AS ch_type
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), conv AS (
  SELECT CASE WHEN ch_us IS NOT NULL
               AND ch_us >= t_us - {ATTR_WINDOW_US}
         THEN ch_type ELSE 'direct' END AS channel, value
  FROM touched
  WHERE event_type = 'purchase' AND value IS NOT NULL
)
SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_conv,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM conv
GROUP BY channel
ORDER BY channel
"""

QUERIES["q_stream_attribution"] = q_stream_attribution
ORACLES["q_stream_attribution"] = ORACLE_STREAM_ATTRIBUTION


def _twin_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same groupBy(user_id) → per-key pandas exchange → channel agg as
    the streaming attributor (plan-audit batch twin)."""
    import pandas as pd

    from ..plans._util import dsum

    def attribute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        ch_us, ch_type = _ATTR_NO_TOUCH, ""
        chans: list[str] = []
        vals: list[float] = []
        for t, et, v in zip(pdf["ts"], pdf["event_type"], pdf["value"]):
            t_us = int(pd.Timestamp(t).value // 1_000)
            if et == "purchase" and pd.notna(v):
                if (ch_us != _ATTR_NO_TOUCH
                        and ch_us >= t_us - ATTR_WINDOW_US):
                    chans.append(ch_type)
                else:
                    chans.append("direct")
                vals.append(float(v))
            if et in ATTR_CHANNELS:
                ch_us, ch_type = t_us, et
        return pd.DataFrame({"channel": chans, "value": vals})

    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    )
    credits = ev.groupBy("user_id").applyInPandas(
        attribute, schema="channel string, value double"
    )
    return (
        credits.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_conv"),
            dsum("value").alias("revenue"),
        )
        .orderBy("channel")
    )


BATCH_TWINS["q_stream_attribution"] = _twin_attribution


# --------------------------------------------------------------------------
# round 11: streaming Bollinger bands (bounded trailing-window state)

def _boll_units6(x) -> int:
    """Micro-unit integer twin of Spark's CAST(double AS DECIMAL(28,6))
    — the quantity the batch plan's decimal window sums accumulate.

    NOT identical paths for arbitrary doubles (ADVICE r11): Catalyst
    casts via Scala ``BigDecimal.decimal(d)``, i.e. HALF_UP on the
    SHORTEST decimal representation (Double.toString), while this twin
    quantizes ``Decimal(float(x))``, the EXACT binary expansion. The
    two can land on opposite sides of a ``…5e-7`` boundary when the
    shortest repr sits exactly ON the boundary but the binary value is
    a hair below (e.g. 1.0000005 → Spark 1.000001, exact-binary
    1.000000). The stream/batch parity contract therefore rests on the
    DATA, not the rounding paths: events.value lives on a 0.01 grid, so
    values (2 dp) and their squares (4 dp) are exactly representable at
    6 dp and never near a boundary — pinned by
    tests/test_streaming.py::test_boll_units6_grid_parity."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        (Decimal(float(x)).quantize(Decimal("0.000001"),
                                    rounding=ROUND_HALF_UP)
         * 1_000_000).to_integral_value()
    )


def _boll_round9(x: float) -> float:
    """Twin of plans/_util.sround(x, 9): the ×1e9 multiply runs in IEEE
    (same as Spark), then half-up SCALE-0 rounding, and + 0.0 kills
    −0.0. Spark rounds the shortest decimal repr (BigDecimal.decimal)
    while this rounds the exact binary value via Decimal — for SCALE-0
    the two always agree (every half-integer boundary is an exactly
    representable double, and a shortest repr round-trips to its own
    double, so it can never cross a boundary the binary value doesn't
    sit on). The caveat in _boll_units6 applies only to fractional
    quantization scales."""
    from decimal import ROUND_HALF_UP, Decimal

    y = x * 1e9
    r = float(Decimal(y).quantize(Decimal(1), rounding=ROUND_HALF_UP))
    return r / 1e9 + 0.0


def _boll_walk(hist: list, eids, uids, vals):
    """Shared per-user emission walk for the streaming operator and its
    batch twin: consumes rows already in (ts, event_id) order, mutates
    ``hist`` (the trailing BOLL_W−1 RAW double values — raw, because
    the batch plan squares the unquantized double), and returns the
    emitted output rows. Every float op replicates the batch
    expression tree bit-for-bit: window sums are exact integer
    micro-units (= the decimal window sums), all divisions/sqrt are
    the same IEEE tree, rounding is half-up on exact binary values."""
    import math

    from ..plans.stats2 import BOLL_KSD, BOLL_W

    out = []
    for eid, uid, v in zip(eids, uids, vals):
        v = float(v)
        window = hist[-(BOLL_W - 1):] + [v]
        n_w = len(window)
        if n_w == BOLL_W:
            nd = float(n_w)
            s = sum(_boll_units6(x) for x in window) / 1_000_000
            ss = sum(_boll_units6(x * x) for x in window) / 1_000_000
            mean = s / nd
            var = max(ss / nd - mean * mean, 0.0)
            sd = math.sqrt(var)
            margin = _boll_round9(abs(v - mean) - BOLL_KSD * sd)
            out.append((int(eid), int(uid), n_w,
                        _boll_round9(mean), _boll_round9(sd),
                        1 if margin > 0.0 else 0))
        else:
            out.append((int(eid), int(uid), n_w, None, None, None))
        hist.append(v)
        del hist[:-(BOLL_W - 1)]
    return out


_BOLL_OUT_SCHEMA = ("event_id long, user_id long, n_w long,"
                    " mean_w double, sd_w double, breakout int")


def q_stream_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Bollinger bands via ``applyInPandasWithState``:
    per-user state is the trailing BOLL_W−1 = 4 raw values — bounded,
    unlike a buffered timeline — and each arriving event emits its
    trailing mean ± 2σ band membership exactly as the batch window
    does.

    The streaming twin of plans/stats2.q_bollinger: rows inside a
    micro-batch are processed in (ts, event_id) order (the batch
    window's total order), window sums run in exact integer
    micro-units (= the batch plan's DECIMAL window sums), and every
    double op replicates the batch IEEE tree — so the availableNow
    replay emits exactly the batch result and the operator shares
    q_bollinger's full DuckDB oracle. NULL user_id (no state key),
    NULL ts (unordered), and NULL value rows are dropped on both
    sides.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from ..plans.stats2 import BOLL_W

    ev = (
        _stream_events(spark, sf_dir)
        .select("user_id", "ts", "event_id", "value")
        .filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
    )

    def bands(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if state.exists:
            (packed,) = state.get
            hist = list(packed) if packed is not None else []
        else:
            hist = []
        out = _boll_walk(hist, rows["event_id"], rows["user_id"],
                         rows["value"])
        state.update((hist[-(BOLL_W - 1):],))
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "n_w", "mean_w",
                          "sd_w", "breakout"]
        )

    banded = ev.groupBy("user_id").applyInPandasWithState(
        bands,
        outputStructType=_BOLL_OUT_SCHEMA,
        stateStructType="hist array<double>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = _run_available_now(banded, "bollinger")
    return emitted.select(
        "event_id", "user_id", "n_w", "mean_w", "sd_w", "breakout"
    ).orderBy("event_id")


def _oracle_stream_bollinger() -> str:
    from ..plans.stats2 import ORACLE_BOLLINGER

    return ORACLE_BOLLINGER


QUERIES["q_stream_bollinger"] = q_stream_bollinger
ORACLES["q_stream_bollinger"] = _oracle_stream_bollinger()


def _twin_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same groupBy(user_id) → per-key pandas exchange as the streaming
    operator (plan-audit batch twin), sharing _boll_walk."""
    import pandas as pd

    def bands(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        out = _boll_walk([], pdf["event_id"], pdf["user_id"],
                         pdf["value"])
        return pd.DataFrame(
            out, columns=["event_id", "user_id", "n_w", "mean_w",
                          "sd_w", "breakout"]
        )

    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
    )
    return ev.groupBy("user_id").applyInPandas(
        bands, schema=_BOLL_OUT_SCHEMA
    ).orderBy("event_id")


BATCH_TWINS["q_stream_bollinger"] = _twin_bollinger


# --------------------------------------------------------------------------
# round 12: streaming running drawdown (record-peak state)

def _dd_walk(st: list, eids, uids, vals):
    """Shared per-user walk for the streaming drawdown operator and its
    batch twin: consumes rows already in (ts, event_id) order, mutates
    ``st`` ([running_peak, running_max_dd], empty for a fresh user) and
    returns the emitted rows. Every operation is a comparison or ONE
    IEEE subtraction (dd = peak − value) on raw doubles — no rounding
    step exists, so stream, batch, and the DuckDB window oracle are
    bit-equal by construction (unlike Bollinger, whose parity rests on
    the 0.01 grid — see _boll_units6)."""
    out = []
    peak = st[0] if st else None
    mdd = st[1] if st else None
    for eid, uid, v in zip(eids, uids, vals):
        v = float(v)
        peak = v if peak is None or v > peak else peak
        dd = peak - v
        mdd = dd if mdd is None or dd > mdd else mdd
        out.append((int(eid), int(uid), peak, dd, mdd))
    st[:] = [peak, mdd]
    return out


_DD_OUT_SCHEMA = ("event_id long, user_id long, peak double,"
                  " dd double, max_dd double")


def q_stream_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming running drawdown via ``applyInPandasWithState``:
    per-user state is TWO doubles (record peak, max drawdown so far) —
    the minimal stateful financial monitor next to q_stream_bollinger's
    trailing window — and each arriving event emits its running peak,
    current drawdown (peak − value), and the max drawdown to date.

    The streaming sibling of plans/stats2.q_drawdown (which reports the
    per-user SUMMARY; this emits the per-event trajectory): rows inside
    a micro-batch are processed in (ts, event_id) order, and because
    the math is max/compare plus one IEEE subtraction there is no
    quantization step at all — the availableNow replay equals the
    batch window plan and the DuckDB cumulative-window oracle
    bit-for-bit. NULL user_id (no state key), NULL ts / event_id
    (unordered), and NULL value rows are dropped on both sides.
    100 TB design: state is 2 doubles/user; one user_id shuffle."""
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    ev = (
        _stream_events(spark, sf_dir)
        .select("user_id", "ts", "event_id", "value")
        .filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull() & F.col("value").isNotNull()
        )
    )

    def track(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        st = list(state.get) if state.exists else []
        out = _dd_walk(st, rows["event_id"], rows["user_id"],
                       rows["value"])
        state.update(tuple(st))
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "peak", "dd", "max_dd"]
        )

    tracked = ev.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=_DD_OUT_SCHEMA,
        stateStructType="peak double, mdd double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = _run_available_now(tracked, "drawdown")
    return emitted.select(
        "event_id", "user_id", "peak", "dd", "max_dd"
    ).orderBy("event_id")


ORACLE_STREAM_DRAWDOWN = """
WITH p AS (
  SELECT event_id, user_id, ts,
         MAX(value) OVER w AS peak,
         MAX(value) OVER w - value AS dd
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_id IS NOT NULL AND value IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, peak, dd,
       MAX(dd) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS max_dd
FROM p
"""

QUERIES["q_stream_drawdown"] = q_stream_drawdown
ORACLES["q_stream_drawdown"] = ORACLE_STREAM_DRAWDOWN


def _twin_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same groupBy(user_id) → per-key pandas exchange as the streaming
    operator (plan-audit batch twin), sharing _dd_walk."""
    import pandas as pd

    def track(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        out = _dd_walk([], pdf["event_id"], pdf["user_id"],
                       pdf["value"])
        return pd.DataFrame(
            out, columns=["event_id", "user_id", "peak", "dd", "max_dd"]
        )

    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull() & F.col("value").isNotNull()
        )
    )
    return ev.groupBy("user_id").applyInPandas(
        track, schema=_DD_OUT_SCHEMA
    ).orderBy("event_id")


BATCH_TWINS["q_stream_drawdown"] = _twin_drawdown
