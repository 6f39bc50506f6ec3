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
