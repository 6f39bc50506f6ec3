"""csv_path_rewriter parity (scripts/test_csv_path_rewriter.py)."""

from __future__ import annotations

import pytest

from audios_to_dataset_spark.functions.paths import (
    common_dir_prefix,
    rewrite_paths,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "file_name string, transcription string")


def test_common_prefix(spark):
    # test_csv_path_rewriter.py:16-22
    df = _df(spark, [("/data/a/x.wav", "t1"), ("/data/a/y.wav", "t2"),
                     ("/data/b/z.wav", "t3")])
    assert common_dir_prefix(df) == "/data"


def test_common_prefix_single_dir(spark):
    df = _df(spark, [("/data/a/x.wav", "t1"), ("/data/a/y.wav", "t2")])
    assert common_dir_prefix(df) == "/data/a"


def test_rewrite_with_base_dir(spark):
    # test_csv_path_rewriter.py:25-42, 45-56 — golden rows, fixed order
    df = _df(spark, [("/data/a/x.wav", "привіт світ")])
    out = rewrite_paths(df, base_dir="/data")
    assert out.columns == ["file_name", "relative_path", "transcription"]
    row = out.first()
    assert row.file_name == "x.wav"
    assert row.relative_path == "a/x.wav"
    assert row.transcription == "привіт світ"  # Cyrillic survives


def test_rewrite_auto_base(spark):
    df = _df(spark, [("/data/a/x.wav", "t1"), ("/data/b/6.wav/6_1.wav", "t2")])
    rows = {r.file_name: r for r in rewrite_paths(df).collect()}
    assert rows["x.wav"].relative_path == "a/x.wav"
    # dot-bearing directory names survive (test_csv_path_rewriter.py:69-94)
    assert rows["6_1.wav"].relative_path == "b/6.wav/6_1.wav"


def test_missing_column_error(spark):
    # test_csv_path_rewriter.py:59-66
    df = spark.createDataFrame([("a",)], "file_name string")
    with pytest.raises(ValueError, match="transcription"):
        rewrite_paths(df)
