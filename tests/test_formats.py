"""Format breadth: ORC and JSONL round trips with pushdown intact.

The reference emits parquet/DuckDB only; these pin the extra formats the
Spark engine gets for free — and that predicate pushdown survives them,
so a format choice never silently costs a full scan.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from audios_to_dataset_spark.catalog import load


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_orc")
    docs = load(spark, sf_dir, "documents")
    docs.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.count() == docs.count()
    assert back.schema == docs.schema

    q = back.filter(F.col("lang") == "en").select("doc_id")
    plan = _explain(q)
    # ORC scans support predicate pushdown; the filter must reach it
    assert "PushedFilters" in plan
    assert "EqualTo(lang,en)" in plan
    got = q.count()
    want = docs.filter(F.col("lang") == "en").count()
    assert got == want


def test_jsonl_export_reimport(spark, sf_dir, tmp_path):
    out = str(tmp_path / "docs_jsonl")
    docs = load(spark, sf_dir, "documents")
    docs.write.mode("overwrite").json(out)  # one JSON object per line
    back = spark.read.schema(docs.schema).json(out)
    assert back.count() == docs.count()
    # value-level parity on a deterministic projection
    a = {
        (r.doc_id, r.n_chars)
        for r in docs.select("doc_id", "n_chars").collect()
    }
    b = {
        (r.doc_id, r.n_chars)
        for r in back.select("doc_id", "n_chars").collect()
    }
    assert a == b


def test_header_sniffers_new_formats():
    """parse_audio_header recognizes AIFF and AU; parse_image_header
    recognizes QOI; the existing sniffs are untouched."""
    from audios_to_dataset_spark.functions.audio_formats import (
        parse_audio_header,
    )
    from audios_to_dataset_spark.functions.audio_headers import (
        synth_aiff_md5,
        synth_au_md5,
    )
    from audios_to_dataset_spark.functions.multimodal import (
        parse_image_header,
    )
    from audios_to_dataset_spark.functions.qoi import synth_qoi

    fmt, sr, dur, est = parse_audio_header(synth_aiff_md5(4))
    assert (fmt, sr, est) == ("aiff", 12000, False) and dur > 0
    fmt, sr, dur, est = parse_audio_header(synth_au_md5(5))
    assert (fmt, sr, est) == ("au", 16000, False) and dur > 0
    # AU duration accounts for the sample width (enc 3 = 2 bytes)
    n = 40 + 5 % 37
    assert abs(dur - n / 16000) < 1e-12
    fmt, w, h = parse_image_header(synth_qoi(9))
    assert fmt == "qoi" and w == 10 + 9 % 9 and h == 8 + 9 % 7
    # malformed stays rejected
    assert parse_audio_header(b".snd" + b"\x00" * 8)[0] is None
    assert parse_image_header(b"qoif")[0] is None
