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
