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


def test_bm25_matches_pure_python(spark):
    """bm25_topk's determinism contract: a pure-Python replica with the
    identical arithmetic order (IEEE doubles, shortest-repr decimal
    quantization half-up, per-doc decimal sum) reproduces every score
    bit-for-bit — no tolerance."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from audios_to_dataset_spark.plans.textops2 import bm25_topk

    docs = [
        (1, "spark query window spark"),
        (2, "query the window"),
        (3, "nothing relevant here"),
        (4, "spark spark spark spark query"),
        (5, "window"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [
        (r.doc_id, r.n_terms, r.score)
        for r in bm25_topk(df, topk=5).collect()
    ]

    terms = ("spark", "query", "window")
    k1, b = 1.5, 0.75
    toks = {
        i: [t for t in txt.lower().split(" ") if t != ""] for i, txt in docs
    }
    dls = {i: len(ts) for i, ts in toks.items()}
    nd, tot = len(docs), sum(dls.values())
    avgdl = float(tot) / float(nd)
    tf: Counter = Counter()
    for i, ts in toks.items():
        for t in ts:
            if t in terms:
                tf[(i, t)] += 1
    dfc = Counter(t for (_, t) in tf)

    def q6(x: float) -> Decimal:
        # Spark's double->decimal(28,6) cast: shortest repr, HALF_UP
        return Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )

    def sround9(x: float) -> float:
        # plans/_util.sround: round(x*1e9)/1e9 + 0.0 with HALF_UP
        scaled = Decimal(repr(x * 1e9)).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
        return float(scaled) / 1e9 + 0.0

    weights: dict[int, list[float]] = {}
    for (i, t), f in tf.items():
        idf = (float(nd) - float(dfc[t]) + 0.5) / (float(dfc[t]) + 0.5)
        sat = (float(f) * (k1 + 1.0)) / (
            float(f) + k1 * ((1.0 - b) + b * (float(dls[i]) / avgdl))
        )
        weights.setdefault(i, []).append(idf * sat)
    exp = sorted(
        (
            (i, len(ws), sround9(float(sum(q6(w) for w in ws))))
            for i, ws in weights.items()
        ),
        key=lambda r: (-r[2], r[0]),
    )
    assert got == exp
