"""Timestamp-robustness regressions (ADVICE r2 #1/#2).

Two historical gaps: the streaming ts-precision sniff assumed the parquet
``ts`` column is always a timestamp physical type (an int64-stored ``ts``
raised AttributeError where the batch loader tolerated it), and the
catalog's TIMESTAMP_NTZ fallback used ``to_timestamp`` — a no-op under a
locked-down session pinning ``spark.sql.timestampType=TIMESTAMP_NTZ``.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_int64_events(path: str, n_hours: int = 6, per_hour: int = 4) -> int:
    """events.parquet with ts stored as raw int64 nanoseconds."""
    base_ns = 1_700_000_000 * 1_000_000_000  # 2023-11-14T22:13:20Z
    rows = []
    eid = 0
    for h in range(n_hours):
        for i in range(per_hour):
            rows.append(
                (
                    eid,
                    base_ns + h * 3_600_000_000_000 + i * 60_000_000_000,
                    eid % 3,
                    "click" if eid % 2 == 0 else "view",
                    float(eid),
                    "{}",
                )
            )
            eid += 1
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, path)
    return len(rows)


def test_stream_tumbling_tolerates_int64_ts(spark, tmp_path):
    """An int64-stored ts must stream exactly like the batch loader's
    `long` branch treats it (raw nanos -> us), not AttributeError in the
    precision sniff (streaming/events.py)."""
    from pyspark.sql import functions as F

    from audios_to_dataset_spark.catalog import load
    from audios_to_dataset_spark.streaming.events import q_stream_tumbling

    sf_dir = str(tmp_path)
    _write_int64_events(f"{sf_dir}/events.parquet")

    out = q_stream_tumbling(spark, sf_dir)
    got = {(str(r.win_start), r.event_type): r.n_events for r in out.collect()}

    ev = load(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    cutoff = max_ts - datetime.timedelta(hours=2)
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("win_start"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .collect()
    )
    expected = {
        (str(r.win_start), r.event_type): r.n_events
        for r in batch
        if r.win_start + datetime.timedelta(hours=1) <= cutoff
    }
    assert got == expected
    assert len(got) > 0


def test_catalog_load_casts_ntz_to_ltz_under_pinned_ntz_session(
    spark, tmp_path, monkeypatch
):
    """catalog.load must yield an LTZ (plain `timestamp`) ts even when the
    session pins spark.sql.timestampType=TIMESTAMP_NTZ and the parquet conf
    is effectively locked (simulated by no-oping session.tune), i.e. the
    naive parquet value arrives as timestamp_ntz. to_timestamp would
    return NTZ here; only an unconditional cast gives LTZ."""
    import audios_to_dataset_spark.catalog as catalog

    naive = [
        datetime.datetime(2024, 1, 1, h, 0, 0) for h in range(4)
    ]
    table = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array(naive, pa.timestamp("us")),  # no tz => naive
            "user_id": pa.array([0, 1, 0, 1], pa.int64()),
            "event_type": pa.array(["click"] * 4, pa.string()),
            "value": pa.array([0.0, 1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}"] * 4, pa.string()),
        }
    )
    pq.write_table(table, f"{tmp_path}/events.parquet")

    monkeypatch.setattr(catalog, "tune", lambda s: s)  # locked-down session
    old_infer = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    old_tstype = spark.conf.get("spark.sql.timestampType")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    try:
        raw = spark.read.parquet(f"{tmp_path}/events.parquet")
        assert raw.schema["ts"].dataType.typeName() == "timestamp_ntz", (
            "precondition: naive parquet must arrive as NTZ under this conf"
        )
        df = catalog.load(spark, str(tmp_path), "events")
        assert df.schema["ts"].dataType.typeName() == "timestamp"
        got = sorted(r.ts for r in df.select("ts").collect())
        assert got == naive  # session zone is UTC: same wall-clock instants
    finally:
        spark.conf.set(
            "spark.sql.parquet.inferTimestampNTZ.enabled", old_infer
        )
        spark.conf.set("spark.sql.timestampType", old_tstype)


def test_stream_sniff_micros_path_unchanged(spark, tmp_path):
    """A micros-precision timestamp ts (the current testdata shape) still
    takes the plain-timestamp streaming path."""
    from audios_to_dataset_spark.streaming.events import q_stream_tumbling

    naive = [
        datetime.datetime(2024, 1, 1, h, m, 0)
        for h in range(6)
        for m in (0, 30)
    ]
    table = pa.table(
        {
            "event_id": pa.array(range(len(naive)), pa.int64()),
            "ts": pa.array(naive, pa.timestamp("us")),
            "user_id": pa.array([i % 2 for i in range(len(naive))], pa.int64()),
            "event_type": pa.array(
                ["click" if i % 2 else "view" for i in range(len(naive))],
                pa.string(),
            ),
            "value": pa.array([float(i) for i in range(len(naive))], pa.float64()),
            "props": pa.array(["{}"] * len(naive), pa.string()),
        }
    )
    pq.write_table(table, f"{tmp_path}/events.parquet")
    out = q_stream_tumbling(spark, str(tmp_path))
    rows = out.collect()
    # max ts 05:30, watermark 2h => cutoff 03:30; hourly windows ending
    # <= 03:30 close: hours 0,1,2 x 2 event types (view/click alternate),
    # one event each
    assert sum(r.n_events for r in rows) == 6
    assert len(rows) == 6


def test_true_nanos_parquet_batch_and_stream(spark, tmp_path):
    """The driver testdata has alternated between TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) generations; the current sf dirs are micros, so
    this pins the nanos path with a purpose-built file: batch load must
    convert long-nanos -> micros timestamps, and streaming must take
    the BIGINT + div-1000 branch, agreeing with batch."""
    from pyspark.sql import functions as F

    from audios_to_dataset_spark.catalog import load
    from audios_to_dataset_spark.streaming.events import q_stream_tumbling

    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    naive = [
        base + datetime.timedelta(hours=h, minutes=m)
        for h in range(6)
        for m in (0, 30)
    ]
    table = pa.table(
        {
            "event_id": pa.array(range(len(naive)), pa.int64()),
            "ts": pa.array(naive, pa.timestamp("ns")),
            "user_id": pa.array([i % 2 for i in range(len(naive))], pa.int64()),
            "event_type": pa.array(
                ["view" if i % 2 == 0 else "click" for i in range(len(naive))],
                pa.string(),
            ),
            "value": pa.array([float(i) for i in range(len(naive))], pa.float64()),
            "props": pa.array(["{}"] * len(naive), pa.string()),
        }
    )
    pq.write_table(table, f"{tmp_path}/events.parquet", version="2.6")
    stored = pq.read_schema(f"{tmp_path}/events.parquet").field("ts").type
    assert pa.types.is_timestamp(stored) and stored.unit == "ns", (
        f"precondition: file must store TIMESTAMP(NANOS), got {stored}"
    )

    ev = load(spark, str(tmp_path), "events")
    assert ev.schema["ts"].dataType.typeName() == "timestamp"
    got_ts = sorted(r.ts for r in ev.select("ts").collect())
    assert got_ts == naive  # exact micros after ns->us truncation

    out = q_stream_tumbling(spark, str(tmp_path)).collect()
    batch = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    cutoff = max(naive) - datetime.timedelta(hours=2)
    want = {
        (str(r.w), r.event_type): r.n
        for r in batch
        if r.w + datetime.timedelta(hours=1) <= cutoff
    }
    got = {(str(r.win_start), r.event_type): r.n_events for r in out}
    assert got == want and len(got) > 0
