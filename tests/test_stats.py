from __future__ import annotations

from audios_to_dataset_spark.functions.wav import synth_wav
from audios_to_dataset_spark.operators.stats import (
    rate_histogram,
    summarize_dataset,
)
from audios_to_dataset_spark.pipeline import build_dataset


def test_summary_and_histogram(spark, tmp_path):
    d = tmp_path / "a"
    d.mkdir()
    (d / "x.wav").write_bytes(synth_wav(16_000))
    (d / "y.wav").write_bytes(synth_wav(8_000, n_samples=4_000))
    (d / "bad.bin").write_bytes(b"not audio")
    ds = build_dataset(spark, str(d))
    s = summarize_dataset(ds).first()
    assert s.n_files == 3
    assert s.total_duration_s == 1.5
    assert s.n_decode_failures == 1
    assert s.n_distinct_rates == 3  # 16000, 8000, 0
    hist = {r.sampling_rate: r.n_files for r in rate_histogram(ds).collect()}
    assert hist == {16_000: 1, 8_000: 1, 0: 1}
