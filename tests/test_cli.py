"""CLI parity (reference Args, src/main.rs:55-95)."""

from __future__ import annotations

import pytest

from audios_to_dataset_spark.__main__ import build_parser, main


def test_defaults_match_reference():
    args = build_parser().parse_args(["--input", "/x", "--output", "/y"])
    assert args.format == "parquet"
    assert args.files_per_db == 500
    assert args.max_depth_size == 50
    assert args.check_mime_type is False
    assert args.num_threads == 5
    assert args.parquet_compression == "snappy"
    assert args.metadata_file is None


def test_bad_compression_rejected(capsys):
    with pytest.raises(SystemExit):
        build_parser().parse_args(
            ["--input", "/x", "--output", "/y", "--parquet-compression", "rar"]
        )


def test_missing_input_dir_exits_2():
    assert main(["--input", "/no/such/dir", "--output", "/tmp/o"]) == 2


def test_cli_orc_end_to_end(spark, tmp_path):
    from audios_to_dataset_spark.functions.wav import synth_wav
    from audios_to_dataset_spark.pipeline import run_pipeline

    d = tmp_path / "in"
    d.mkdir()
    for i in range(4):
        (d / f"x{i}.wav").write_bytes(synth_wav(8000))
    out = str(tmp_path / "orc_out")
    receipts = run_pipeline(
        spark, str(d), out, output_format="orc", files_per_shard=2
    )
    assert sum(r.n_rows for r in receipts) == 4
    back = spark.read.orc(out)
    assert back.count() == 4
    assert {r.shard for r in back.select("shard").distinct().collect()} == {0, 1}
