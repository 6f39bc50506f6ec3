"""Unit behavior of the batch-2 curation ops (edge cases the sf-level
oracles can't reach: empty/None media content, single-event streams,
consecutive-repeat SCD2 merging)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_fake_frames_windows_and_empties(spark):
    from audios_to_dataset_spark.functions.multimodal import (
        sample_fake_frames,
    )

    payload = bytes(range(200))  # 4 frames of 64 (last short), sample 0,2
    df = spark.createDataFrame(
        [(1, payload), (2, b""), (3, None)],
        "doc_id long, content binary",
    )
    rows = sorted(
        sample_fake_frames(df).collect(),
        key=lambda r: (r.doc_id, r.frame_idx),
    )
    # empty and NULL content produce zero frames, not errors
    assert [r.doc_id for r in rows] == [1, 1]
    assert [r.frame_idx for r in rows] == [0, 2]
    assert rows[0].frame == payload[0:64]
    assert rows[1].frame == payload[128:192]
    assert rows[0].frame_len == 64 and rows[1].frame_len == 64
    assert rows[0].frame_md5 == hashlib.md5(payload[0:64]).hexdigest()


def test_scd2_merges_consecutive_repeats(spark):
    from audios_to_dataset_spark.plans.events import ORACLE_SCD2  # noqa: F401
    from pyspark.sql import Window

    # inline the same plan shape on a tiny frame: A A B A -> 3 intervals
    ev = spark.createDataFrame(
        [(1, 10, "A", 100), (1, 20, "A", 101), (1, 30, "B", 102),
         (1, 40, "A", 103)],
        "user_id long, ts_us long, event_type string, event_id long",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.withColumn(
        "is_start",
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type")),
    )
    got = [
        (r.event_type, r.ts_us)
        for r in marked.filter("is_start").orderBy("ts_us").collect()
    ]
    assert got == [("A", 10), ("B", 30), ("A", 40)]


def test_seq_pack_boundary_math(spark, sf_dir):
    from audios_to_dataset_spark.plans.textops2 import SEQ_LEN, q_seq_pack

    rows = q_seq_pack(spark, sf_dir).collect()
    assert rows, "expected one row per language"
    for r in rows:
        # n_seqs is exactly ceil(total/SEQ_LEN) and fill <= 1
        assert r.n_seqs == -(-r.total_tokens // SEQ_LEN)
        assert 0 < r.fill_ratio <= 1.0
        assert 0 <= r.boundary_docs


def test_source_cap_never_exceeds_cap(spark, sf_dir):
    from audios_to_dataset_spark.plans.textops2 import (
        SOURCE_CAP,
        q_source_cap,
    )

    for r in q_source_cap(spark, sf_dir).collect():
        assert r.n_kept <= min(SOURCE_CAP, r.n_docs)
