"""Wild-audio corpus test — the audio twin of test_wild_files: every
audio container decoder so far was proven against md5-synthesized
fixtures; this suite points them at the genuinely external CPython
test-suite audio assets installed in this container (the `pluck`
family: the same clip in WAV/AIFF/AU at several widths, plus ulaw AU)
and cross-checks sample-exactly against the STDLIB decoders
(wave/aifc/sunau/audioop — an independent implementation lineage).

Also pins the subset gates: 24/32-bit linear PCM and AIFC compressed
variants must be refused cleanly (None / zero-stats), never
mis-decoded as 16-bit.

Skips cleanly when the pyenv test assets or the deprecated stdlib
modules are absent (both exist on this 3.11 container).
"""

from __future__ import annotations

import glob
import warnings

import numpy as np
import pytest

from audios_to_dataset_spark.functions.audio_headers import (
    decode_aiff_samples,
    decode_au_samples,
    parse_aiff_header,
)
from audios_to_dataset_spark.functions.wav import (
    parse_wav_header,
    wav_pcm16_frames,
    wav_pcm_stats,
)

warnings.filterwarnings("ignore", category=DeprecationWarning)

try:
    import aifc
    import audioop
    import sunau
    import wave
except ImportError:  # pragma: no cover - 3.13+ without the modules
    aifc = audioop = sunau = wave = None

AUDIODATA = sorted(
    glob.glob("/root/.pyenv/versions/*/lib/python3.*/test/audiodata")
)

pytestmark = pytest.mark.skipif(
    wave is None or not AUDIODATA,
    reason="stdlib audio modules or CPython audiodata assets absent",
)


def _asset(name: str) -> str | None:
    for d in AUDIODATA:
        hits = glob.glob(f"{d}/{name}")
        if hits:
            return hits[0]
    return None


def test_wild_wav_pcm16_matches_stdlib_wave():
    p = _asset("pluck-pcm16.wav")
    if p is None:
        pytest.skip("pluck-pcm16.wav absent")
    blob = open(p, "rb").read()
    w = wave.open(p)
    want = np.frombuffer(w.readframes(w.getnframes()), "<i2")
    got = wav_pcm16_frames(blob)
    assert got is not None
    samples, rate, ch = got
    assert rate == w.getframerate() and ch == w.getnchannels()
    assert np.array_equal(np.asarray(samples), want)
    dur, hdr_rate = parse_wav_header(blob)
    assert hdr_rate == w.getframerate()
    assert abs(dur - w.getnframes() / w.getframerate()) < 1e-9


def test_wild_wav_pcm8_stats_match_stdlib():
    p = _asset("pluck-pcm8.wav")
    if p is None:
        pytest.skip("pluck-pcm8.wav absent")
    blob = open(p, "rb").read()
    w = wave.open(p)
    raw = np.frombuffer(w.readframes(w.getnframes()), np.uint8)
    want = (raw.astype(np.float64) - 128.0) * 256.0 / 32768.0
    rms, peak, _clip, n = wav_pcm_stats(blob)
    assert n == raw.size
    assert abs(rms - float(np.sqrt(np.mean(want * want)))) < 1e-12
    assert abs(peak - float(np.max(np.abs(want)))) < 1e-12


def test_wild_wav_wide_pcm_refused_cleanly():
    # 24/32-bit linear and the 24-bit EXTENSIBLE variant are outside
    # the 16-bit decode subset: every reader must refuse, not misread
    for name in ("pluck-pcm24.wav", "pluck-pcm32.wav",
                 "pluck-pcm24-ext.wav"):
        p = _asset(name)
        if p is None:
            continue
        blob = open(p, "rb").read()
        assert wav_pcm16_frames(blob) is None, name
        rms, peak, clip, n = wav_pcm_stats(blob)
        assert (rms, peak, clip, n) == (0.0, 0.0, 0.0, 0), name
        # the pure header walk still reads rate/duration fine (stdlib
        # wave can't even open the EXTENSIBLE variant — ours can)
        dur, rate = parse_wav_header(blob)
        assert rate > 0 and dur > 0, name
        try:
            w = wave.open(p)
        except wave.Error:
            continue  # format 65534: stdlib refuses, header-only check
        assert rate == w.getframerate(), name
        assert abs(dur - w.getnframes() / w.getframerate()) < 1e-9, name


def test_wild_aiff_pcm_matches_stdlib_aifc():
    for name, bits in (("pluck-pcm16.aiff", 16), ("pluck-pcm8.aiff", 8)):
        p = _asset(name)
        if p is None:
            continue
        blob = open(p, "rb").read()
        a = aifc.open(p)
        raw = a.readframes(a.getnframes())
        if bits == 16:
            want = np.frombuffer(raw, ">i2").astype(np.int16)
        else:
            want = (
                np.frombuffer(raw, np.int8).astype(np.int16) << 8
            )
        got = decode_aiff_samples(blob)
        assert got is not None, name
        rate, samples = got
        assert rate == a.getframerate(), name
        assert np.array_equal(samples, want), name
        fmt, hrate, ch, dur_ms = parse_aiff_header(blob)
        assert fmt == "aiff" and hrate == a.getframerate()
        assert ch == a.getnchannels()


def test_wild_aiff_wide_pcm_refused_cleanly():
    for name in ("pluck-pcm24.aiff", "pluck-pcm32.aiff"):
        p = _asset(name)
        if p is None:
            continue
        assert decode_aiff_samples(open(p, "rb").read()) is None, name


def test_wild_au_pcm16_matches_stdlib_sunau():
    p = _asset("pluck-pcm16.au")
    if p is None:
        pytest.skip("pluck-pcm16.au absent")
    blob = open(p, "rb").read()
    s = sunau.open(p)
    want = np.frombuffer(s.readframes(s.getnframes()), ">i2").astype(
        np.int16
    )
    got = decode_au_samples(blob)
    assert got is not None
    rate, samples = got
    assert rate == s.getframerate()
    assert np.array_equal(samples, want)


def test_wild_au_ulaw_matches_audioop():
    p = _asset("pluck-ulaw.au")
    if p is None:
        pytest.skip("pluck-ulaw.au absent")
    blob = open(p, "rb").read()
    s = sunau.open(p)
    # sunau expands ulaw via audioop when reading; ask for the raw
    # bytes instead and expand both sides explicitly
    import struct as _struct

    (off, size) = _struct.unpack_from(">II", blob, 4)
    raw = blob[off : off + size if size != 0xFFFFFFFF else len(blob)]
    want = np.frombuffer(audioop.ulaw2lin(raw, 2), "<i2").astype(np.int16)
    got = decode_au_samples(blob)
    assert got is not None
    rate, samples = got
    assert rate == s.getframerate()
    assert np.array_equal(samples, want)


def test_wild_au_wide_pcm_refused_cleanly():
    for name in ("pluck-pcm24.au", "pluck-pcm32.au"):
        p = _asset(name)
        if p is None:
            continue
        assert decode_au_samples(open(p, "rb").read()) is None, name


def test_wild_aifc_compressed_refused_cleanly():
    # FORM type AIFC (compressed alaw/ulaw) is outside the AIFF subset
    for name in ("pluck-alaw.aifc", "pluck-ulaw.aifc"):
        p = _asset(name)
        if p is None:
            continue
        blob = open(p, "rb").read()
        assert decode_aiff_samples(blob) is None, name
        fmt, _r, _c, _d = parse_aiff_header(blob)
        assert fmt is None, name


def test_wild_mp3_header_parses():
    """The one genuinely external MP3 in this container (a gsutil test
    asset with an ID3v2.4 tag) through the compressed-container header
    parser: format detected, rate from the real MPEG frame header, a
    finite positive duration. Header-only (no MP3 decoder here by
    design) — the same surface q_audio_headers audits on fixtures."""
    import os

    from audios_to_dataset_spark.functions.audio_formats import (
        parse_audio_header,
    )

    p = (
        "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/"
        "test_data/test.mp3"
    )
    if not os.path.exists(p):
        pytest.skip("gsutil test.mp3 not present")
    blob = open(p, "rb").read()
    fmt, rate, dur, ok = parse_audio_header(blob)
    assert fmt == "mp3" and ok
    assert rate in (8000, 11025, 12000, 16000, 22050, 24000, 32000,
                    44100, 48000)
    # bound the duration by the file's own size at MPEG bitrate limits:
    # 9.4 kB cannot exceed 9.4s even at 8 kbps, nor undercut 0.2s at 320
    assert 0.2 < dur < 10.0


def test_ima_adpcm_step_matches_audioop():
    """The IMA/DVI ADPCM nibble state machine against CPython's
    audioop.adpcm2lin (an independent C implementation of the same
    Intel/DVI spec, high-nibble-first): identical predictions over
    random streams AND the saturation/index-clamp extremes. This is
    the external oracle for the core the WAV tag-0x11 decoder and the
    q_audio_adpcm fixtures build on."""
    if audioop is None:
        pytest.skip("audioop absent")
    from audios_to_dataset_spark.functions.wav import ima_adpcm_step

    streams = [
        np.random.RandomState(7).randint(0, 16, 2048).tolist(),
        [7] * 200 + [15] * 200,   # ramp up then hard down: saturation
        [8, 0] * 300,             # oscillation at index floor
        [7, 15] * 300,            # max magnitude alternation
        list(range(16)) * 40,     # every nibble, cycling
    ]
    for nibbles in streams:
        packed = bytes(
            (nibbles[i] << 4) | nibbles[i + 1]
            for i in range(0, len(nibbles) - 1, 2)
        )
        lin, _st = audioop.adpcm2lin(packed, 2, None)
        want = np.frombuffer(lin, "<i2").tolist()
        pred = idx = 0
        ours = []
        for nb in nibbles[: len(want)]:
            pred, idx = ima_adpcm_step(pred, idx, nb)
            ours.append(pred)
        assert ours == want


def test_g711_tables_match_audioop_all_256():
    """Both complete G.711 expansion tables against audioop's
    independent C implementation, every code point: the µ-law and
    A-law decoders agree value-for-value over all 256 codes."""
    if audioop is None:
        pytest.skip("audioop absent")
    from audios_to_dataset_spark.functions.wav import (
        _alaw_table,
        _mulaw_table,
    )

    codes = bytes(range(256))
    assert np.array_equal(
        _mulaw_table(), np.frombuffer(audioop.ulaw2lin(codes, 2), "<i2")
    )
    assert np.array_equal(
        _alaw_table(), np.frombuffer(audioop.alaw2lin(codes, 2), "<i2")
    )
