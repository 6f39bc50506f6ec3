"""Structured Streaming smoke (SURVEY §2.8): watermarked window agg and
dedup over the events table with the availableNow trigger."""

from __future__ import annotations

from audios_to_dataset_spark.streaming.events import (
    q_stream_dedup,
    q_stream_tumbling,
)


def test_stream_tumbling_matches_batch_closed_windows(spark, sf_dir):
    from pyspark.sql import functions as F

    from audios_to_dataset_spark.catalog import load

    out = q_stream_tumbling(spark, sf_dir)
    got = {
        (str(r.win_start), r.event_type): r.n_events for r in out.collect()
    }
    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    batch = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("win_start"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .collect()
    )
    import datetime

    cutoff = max_ts - datetime.timedelta(hours=2)
    expected = {
        (str(r.win_start), r.event_type): r.n_events
        for r in batch
        if r.win_start + datetime.timedelta(hours=1) <= cutoff
    }
    assert got == expected
    assert len(got) > 0


def test_stream_dedup_counts(spark, sf_dir):
    out = q_stream_dedup(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    # every user keeps at most the 5 distinct event types
    assert all(1 <= r.n_types <= 5 for r in rows)


def test_foreach_batch_parquet_sink(spark, sf_dir, tmp_path):
    """Streaming -> foreachBatch -> parquet shard per micro-batch: the
    production sink path (idempotent per-batch overwrite = exactly-once
    on replay). The rows written must equal the memory-sink run."""
    from pyspark.sql import functions as F

    from audios_to_dataset_spark.streaming.events import (
        _stream_events,
        q_stream_tumbling,
    )

    out = str(tmp_path / "stream_out")
    agg = (
        _stream_events(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events")
    )

    def sink(batch_df, batch_id):
        # append mode emits closed windows in the batch AFTER the
        # watermark advances past them; write every batch (possibly
        # empty) to its own idempotent dir
        batch_df.write.mode("overwrite").parquet(f"{out}/batch={batch_id}")

    q = (
        agg.writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(120)

    written = spark.read.parquet(f"{out}/batch=*")
    expect = q_stream_tumbling(spark, sf_dir)
    got = {tuple(r) for r in written.collect()}
    want = {tuple(r) for r in expect.collect()}
    assert got == want and len(got) > 0


def test_foreach_batch_restart_is_idempotent(spark, sf_dir, tmp_path):
    """Restarting an availableNow query against the same checkpoint must
    not reprocess data (exactly-once bookkeeping via the offset log)."""
    import glob

    from pyspark.sql import functions as F

    from audios_to_dataset_spark.streaming.events import _stream_events

    out = str(tmp_path / "o")
    ckpt = str(tmp_path / "c")
    counts = {"batches": 0}

    agg = (
        _stream_events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def sink(batch_df, batch_id):
        counts["batches"] += 1
        batch_df.write.mode("overwrite").parquet(f"{out}/b{batch_id}")

    def run_once():
        q = (
            agg.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    first = counts["batches"]
    assert first >= 1
    run_once()  # same checkpoint, no new data → no new batches
    assert counts["batches"] == first
    assert len(glob.glob(f"{out}/b*")) == first


def test_bloom_positions_python_spark_parity(spark):
    """The streaming bloom dedup's hashlib positions must equal the
    JVM-side md5 positions of operators/bloom.py — same 60-bit prefix,
    same mask — or the DuckDB oracle (built on bloom_positions_sql)
    would drift from the executed stream."""
    import hashlib

    from pyspark.sql import functions as F

    from audios_to_dataset_spark.operators.bloom import _position
    from audios_to_dataset_spark.streaming.events import (
        BLOOM_K,
        BLOOM_M_BITS,
    )

    uids = [0, 1, 7, 123456789, 999999999999]
    df = spark.createDataFrame([(u,) for u in uids], "user_id long")
    got = df.select(
        "user_id",
        *[
            _position(F.col("user_id"), s, BLOOM_M_BITS).alias(f"p{s}")
            for s in range(BLOOM_K)
        ],
    ).collect()
    for row in got:
        for s in range(BLOOM_K):
            expect = int(
                hashlib.md5(f"{s}:{row.user_id}".encode()).hexdigest()[:15],
                16,
            ) & (BLOOM_M_BITS - 1)
            assert row[f"p{s}"] == expect


def test_stream_reads_pipeline_shards(spark, tmp_path):
    """Interop loop: the audio pipeline's parquet shards are themselves a
    valid streaming source — readStream over the output dir sees every
    record the batch sink wrote (the handoff a downstream training job
    uses to tail a landing zone)."""
    import os

    from pyspark.sql import functions as F

    from audios_to_dataset_spark.functions.wav import synth_wav
    from audios_to_dataset_spark.pipeline import run_pipeline

    audio = tmp_path / "in"
    audio.mkdir()
    for i in range(6):
        (audio / f"c{i}.wav").write_bytes(synth_wav(sample_rate=8000))
    out = str(tmp_path / "shards")
    receipts = run_pipeline(spark, str(audio), out, files_per_shard=3)
    n_written = sum(r.n_rows for r in receipts)

    schema = spark.read.parquet(out).schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(out)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = "stream_shards_test"
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(sink).collect()[0].n
    assert got == n_written == 6
    assert len([f for f in os.listdir(out) if f.endswith(".parquet")]) == 2


def test_stream_outer_join_matches_batch_twin(spark, sf_dir):
    """The left-outer stream-stream join must emit exactly the batch
    left join restricted to closed match windows: matched pairs plus
    null-padded views whose (view_ts + 1h) window ended before the
    final watermark."""
    from audios_to_dataset_spark.streaming.events import (
        _twin_outer_join,
        q_stream_outer_join,
    )

    got = {tuple(r) for r in q_stream_outer_join(spark, sf_dir).collect()}
    want = {tuple(r) for r in _twin_outer_join(spark, sf_dir).collect()}
    assert got == want
    assert len(got) > 0
    assert any(r[2] is None for r in got)  # unconverted views present


def test_stream_drift_matches_batch_twin(spark, sf_dir):
    from audios_to_dataset_spark.streaming.events import (
        _twin_drift,
        q_stream_drift,
    )

    got = {
        (r.win_start, r.event_type): (r.n_events, r.drift_ppm)
        for r in q_stream_drift(spark, sf_dir).collect()
    }
    want = {
        (r.win_start, r.event_type): (r.n_events, r.drift_ppm)
        for r in _twin_drift(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_watchdog_kills_wedged_microbatch(spark, tmp_path, monkeypatch):
    """The STREAM_WATCHDOG_S branch (streaming/events.py) was added
    after an observed wedge but never driven by a test (VERDICT r8
    item 7): inject a deliberately blocked microbatch (per-row sleep
    UDF far past the patched timeout) and assert the watchdog converts
    the hang into ONE failed query while the session keeps serving
    healthy replays — the whole-gate-stall it exists to prevent."""
    import time

    import pytest
    from pyspark.sql import functions as F

    from audios_to_dataset_spark.streaming import events as se

    src = str(tmp_path / "in")
    spark.range(4).coalesce(1).write.parquet(src)
    slow = F.udf(lambda x: (time.sleep(30), x)[1], "long")
    wedged = (
        spark.readStream.schema("id long").parquet(src)
        .select(slow("id").alias("id"))
    )
    monkeypatch.setattr(se, "STREAM_WATCHDOG_S", 3)
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="wedged microbatch"):
        se._run_available_now(wedged, "watchdog_negative")
    # the watchdog fired on its clock, not the microbatch's
    assert time.monotonic() - t0 < 25
    # ...and the gate continues: a healthy replay on the SAME session
    # (same driver process as a real tools/check.py run) still works
    healthy = se._run_available_now(
        spark.readStream.schema("id long").parquet(src)
        .select((F.col("id") * 2).alias("id2")),
        "watchdog_healthy",
    )
    assert sorted(r.id2 for r in healthy.collect()) == [0, 2, 4, 6]


def test_stream_attribution_equals_batch(spark, sf_dir):
    """The stateful streaming last-touch replay must emit exactly the
    batch window-based attribution (restricted to non-NULL user_id,
    the state key) — a third cross-check beside the DuckDB oracle."""
    from pyspark.sql import functions as F

    from audios_to_dataset_spark.catalog import load
    from audios_to_dataset_spark.plans.nonparam import q_attribution
    from audios_to_dataset_spark.streaming.events import (
        q_stream_attribution,
    )

    got = {r["channel"]: (r["n_conv"], r["revenue"])
           for r in q_stream_attribution(spark, sf_dir).collect()}

    # batch twin on the same restriction: recompute q_attribution over
    # events with user_id IS NOT NULL via a filtered temp view swap is
    # overkill — the testdata's NULL-free sf dir makes the restriction
    # a no-op, so compare directly and assert the restriction holds
    assert load(spark, sf_dir, "events").filter(
        F.col("user_id").isNull()).count() == 0
    batch = {r["channel"]: (r["n_conv"], r["revenue"])
             for r in q_attribution(spark, sf_dir).collect()}
    assert set(got) == set(batch)
    for ch, (n, rev) in batch.items():
        assert got[ch][0] == n
        assert abs(got[ch][1] - rev) < 1e-6


def test_stream_bollinger_equals_batch(spark, sf_dir):
    """The availableNow replay of the stateful Bollinger operator must
    emit EXACTLY the batch window result (same rows, same rounded
    doubles, same breakout flags) — the bounded trailing-window state
    replicates the batch decimal sums bit-for-bit."""
    from audios_to_dataset_spark.plans.stats2 import q_bollinger
    from audios_to_dataset_spark.streaming.events import (
        q_stream_bollinger,
    )

    got = {r["event_id"]: tuple(r)
           for r in q_stream_bollinger(spark, sf_dir).collect()}
    want = {r["event_id"]: tuple(r)
            for r in q_bollinger(spark, sf_dir).collect()}
    assert got == want and len(got) > 0


def test_stream_bollinger_state_is_bounded(spark, sf_dir):
    """The per-user state array never exceeds BOLL_W−1 raw values —
    the bounded-state claim the 100 TB design rests on (checked via
    the shared walk, which both the streaming operator and its batch
    twin drive)."""
    from audios_to_dataset_spark.plans.stats2 import BOLL_W
    from audios_to_dataset_spark.streaming.events import _boll_walk

    hist: list = []
    out = _boll_walk(hist, range(100), [7] * 100,
                     [float(i % 13) for i in range(100)])
    assert len(hist) == BOLL_W - 1
    assert len(out) == 100
    assert out[0][2] == 1 and out[BOLL_W - 1][2] == BOLL_W
    # incremental walk equals one-shot walk (state carry correctness)
    h1: list = []
    a = _boll_walk(h1, range(50), [7] * 50,
                   [float(i % 13) for i in range(50)])
    b = _boll_walk(h1, range(50, 100), [7] * 50,
                   [float(i % 13) for i in range(50, 100)])
    assert a + b == out


def test_boll_units6_grid_parity(spark):
    """The stream/batch bit-parity contract for q_stream_bollinger rests
    on the DATA GRID, not on the rounding paths being identical
    (ADVICE r11): Spark's CAST(double AS DECIMAL(28,6)) rounds the
    SHORTEST decimal repr (BigDecimal.decimal), the Python twin rounds
    the EXACT binary expansion — and for arbitrary doubles they can
    disagree (8.5e-06: Spark 9 micro-units, exact-binary 8). This test
    (a) pins one such counter-example so the hazard stays documented,
    and (b) proves parity on the 0.01 value grid events.value lives on
    — values (2 dp) and squares (4 dp) are exact at 6 dp."""
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql import functions as F

    from audios_to_dataset_spark.streaming.events import _boll_units6

    # (a) the divergence class is real: exact-binary HALF_UP disagrees
    # with shortest-repr HALF_UP on a .5e-6 boundary double …
    hazard = 8.5e-06
    exact = Decimal(hazard).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )
    short = Decimal(repr(hazard)).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )
    assert exact != short  # 0.000008 vs 0.000009
    assert _boll_units6(hazard) == 8  # the twin takes the exact path

    # (b) … but on the 0.01 grid (and its squares) the twin matches the
    # live Spark cast bit-for-bit, including negatives and values with
    # no exact binary representation (0.01 itself).
    grid = [round(k * 0.01, 2) for k in range(-300, 301, 7)]
    grid += [k * 0.01 for k in range(-300, 301, 11)]  # unrounded path
    vals = sorted(set(grid) | {v * v for v in grid})
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        int(r[0])
        for r in df.select(
            (F.col("x").cast("decimal(28,6)") * 1_000_000)
            .cast("long")
        ).collect()
    ]
    assert got == [_boll_units6(v) for v in vals]


def test_stream_sessions_equals_batch(spark, sf_dir):
    """The availableNow replay of the stateful sessionizer must emit
    EXACTLY the batch sessionization minus each user's still-open tail
    session (which stays in state and is never emitted) — the
    replay == batch pin VERDICT r11 item 7 asked for."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from audios_to_dataset_spark.plans.events import q_session_gap
    from audios_to_dataset_spark.streaming.events import (
        q_stream_sessions,
    )

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in q_stream_sessions(spark, sf_dir).collect()
    }
    batch = q_session_gap(spark, sf_dir).withColumn(
        "mx", F.max("session_id").over(Window.partitionBy("user_id"))
    )
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch.filter(F.col("session_id") < F.col("mx")).collect()
    }
    assert got == want and len(got) > 0


def test_stream_drawdown_equals_batch_twin(spark, sf_dir):
    """The availableNow replay of the drawdown tracker must equal the
    batch groupBy→applyInPandas twin bit-for-bit (max/compare plus one
    IEEE subtraction — no rounding step exists to diverge)."""
    from audios_to_dataset_spark.streaming.events import (
        _twin_drawdown,
        q_stream_drawdown,
    )

    got = {r["event_id"]: tuple(r)
           for r in q_stream_drawdown(spark, sf_dir).collect()}
    want = {r["event_id"]: tuple(r)
            for r in _twin_drawdown(spark, sf_dir).collect()}
    assert got == want and len(got) > 0


def test_dd_walk_state_carry():
    """Incremental walk (split across two micro-batches) equals the
    one-shot walk, and state is exactly [peak, max_dd]."""
    from audios_to_dataset_spark.streaming.events import _dd_walk

    vals = [float((i * 7) % 13 - 6) for i in range(100)]
    one: list = []
    full = _dd_walk(one, range(100), [3] * 100, vals)
    st: list = []
    a = _dd_walk(st, range(50), [3] * 50, vals[:50])
    b = _dd_walk(st, range(50, 100), [3] * 50, vals[50:])
    assert a + b == full
    assert st == one == [max(vals), max(full_r[3] for full_r in full)]
