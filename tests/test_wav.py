"""WAV header decode parity (P4).

Golden values mirror the reference's fixtures
(/root/reference/tests/end_to_end.rs:332-351): 16-bit mono PCM sine WAVs
of exactly `sample_rate` samples → duration exactly 1.0 s; parse failures
→ (0.0, 0) (src/main.rs:768)."""

from __future__ import annotations

import pytest

from audios_to_dataset_spark.functions.wav import parse_wav_header, synth_wav


@pytest.mark.parametrize("rate", [8_000, 16_000, 22_050, 44_100])
def test_one_second_wav(rate):
    duration, sr = parse_wav_header(synth_wav(sample_rate=rate))
    assert duration == 1.0
    assert sr == rate


def test_half_second_stereo():
    data = synth_wav(sample_rate=16_000, n_samples=8_000, channels=2)
    duration, sr = parse_wav_header(data)
    assert duration == 0.5
    assert sr == 16_000


@pytest.mark.parametrize(
    "data",
    [None, b"", b"not a wav at all", b"RIFF\x00\x00\x00\x00MP3 ",
     b"RIFF\x10\x00\x00\x00WAVE"],
)
def test_non_wav_fallback(data):
    assert parse_wav_header(data) == (0.0, 0)


def test_truncated_data_chunk():
    # data chunk claims more bytes than present → clamp, still parses
    full = synth_wav(sample_rate=8_000)
    truncated = full[: len(full) - 1000]
    duration, sr = parse_wav_header(truncated)
    assert sr == 8_000
    assert 0.0 < duration < 1.0
