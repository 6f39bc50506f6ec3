"""Cross-validation of functions/flac against the REAL reference FLAC
implementation (VERDICT r7 item 3) — the same pattern as
tests/test_vp8l_libwebp.py / test_png_libpng.py: encode fixtures with
our codec and require the system implementation to decode them
bit-exactly, and decode system-encoded streams with ours.

Two system oracles are probed, either suffices:

- the ``flac`` command-line tool (the xiph reference encoder/decoder);
  direction 2 pins the encoder to our decoder's subset with
  ``-l 0 --no-mid-side`` (fixed predictors only, no stereo
  decorrelation — both are optional encoder-side choices per RFC 9639);
- libsndfile via ctypes (sf_open on a virtual file), which wraps
  libFLAC for reading — direction 1 only.

Skips cleanly when neither is present (this container has none — there
tests/test_flac_independent.py carries the independence burden with a
from-scratch RFC 9639 decoder and published CRC catalogue values).
"""

from __future__ import annotations

import os
import shutil
import struct
import subprocess
import tempfile

import numpy as np
import pytest

from audios_to_dataset_spark.functions.flac import (
    decode_flac,
    encode_flac,
    flac_stream_info,
)

FLAC_CLI = shutil.which("flac")


def _have_sndfile():
    import ctypes.util

    return ctypes.util.find_library("sndfile") is not None


pytestmark = pytest.mark.skipif(
    FLAC_CLI is None and not _have_sndfile(),
    reason="no system FLAC implementation (flac CLI / libsndfile) on host",
)


def _md5_wave(n: int, prefix: str = "lf") -> np.ndarray:
    import hashlib

    return np.array(
        [
            int(hashlib.md5(f"{prefix}:{i}".encode()).hexdigest()[:4], 16)
            - 32768
            for i in range(n)
        ],
        np.int16,
    )


def _wav_bytes(samples: np.ndarray, rate: int, channels: int) -> bytes:
    payload = samples.astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * 2 * channels, 2 * channels, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )


def _wav_pcm(data: bytes) -> tuple[int, int, np.ndarray]:
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    pos = 12
    rate = ch = 0
    pcm = b""
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            _t, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            assert bits == 16
        elif cid == b"data":
            pcm = body
        pos += 8 + sz + (sz & 1)
    return rate, ch, np.frombuffer(pcm, dtype="<i2")


CASES = [
    (97, 44100, 1),
    (64, 8000, 1),
    (256, 48000, 2),
    (192, 22050, 3),
]


@pytest.mark.skipif(FLAC_CLI is None, reason="flac CLI not on host")
def test_our_streams_decode_in_reference_flac():
    for n, rate, ch in CASES:
        samples = _md5_wave(n * ch, f"a{n}")
        blob = encode_flac(samples, rate, channels=ch)
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "x.flac")
            dst = os.path.join(td, "x.wav")
            open(src, "wb").write(blob)
            subprocess.run(
                [FLAC_CLI, "-s", "-d", "-o", dst, src],
                check=True,
                capture_output=True,
            )
            got_rate, got_ch, got = _wav_pcm(open(dst, "rb").read())
        assert got_rate == rate and got_ch == ch
        assert np.array_equal(got, samples)


@pytest.mark.skipif(FLAC_CLI is None, reason="flac CLI not on host")
def test_reference_flac_streams_decode_in_ours():
    for n, rate, ch in CASES:
        samples = _md5_wave(n * ch, f"b{n}")
        with tempfile.TemporaryDirectory() as td:
            src = os.path.join(td, "x.wav")
            dst = os.path.join(td, "x.flac")
            open(src, "wb").write(_wav_bytes(samples, rate, ch))
            # pin the reference encoder to our decoder's documented
            # subset: fixed predictors only, no stereo decorrelation
            subprocess.run(
                [FLAC_CLI, "-s", "-l", "0", "--no-mid-side", "-o", dst, src],
                check=True,
                capture_output=True,
            )
            blob = open(dst, "rb").read()
        info = flac_stream_info(blob)
        assert info is not None
        assert info[0] == rate and info[1] == ch and info[2] == 16
        got = decode_flac(blob)
        assert got is not None, (n, rate, ch)
        assert got[0] == rate
        assert np.array_equal(got[1], samples)


@pytest.mark.skipif(not _have_sndfile(), reason="libsndfile not on host")
def test_our_streams_decode_in_libsndfile():
    import ctypes
    import ctypes.util

    lib = ctypes.CDLL(ctypes.util.find_library("sndfile"))

    class SFINFO(ctypes.Structure):
        _fields_ = [
            ("frames", ctypes.c_int64),
            ("samplerate", ctypes.c_int),
            ("channels", ctypes.c_int),
            ("format", ctypes.c_int),
            ("sections", ctypes.c_int),
            ("seekable", ctypes.c_int),
        ]

    lib.sf_open.restype = ctypes.c_void_p
    lib.sf_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                            ctypes.POINTER(SFINFO)]
    lib.sf_readf_short.restype = ctypes.c_int64
    lib.sf_readf_short.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
    ]
    for n, rate, ch in CASES:
        samples = _md5_wave(n * ch, f"c{n}")
        blob = encode_flac(samples, rate, channels=ch)
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "x.flac")
            open(p, "wb").write(blob)
            info = SFINFO()
            h = lib.sf_open(p.encode(), 0x10, ctypes.byref(info))  # READ
            assert h, "libsndfile rejected our stream"
            try:
                assert info.samplerate == rate and info.channels == ch
                buf = (ctypes.c_int16 * (n * ch))()
                read = lib.sf_readf_short(h, buf, n)
                assert read == n
                got = np.ctypeslib.as_array(buf).copy()
            finally:
                lib.sf_close(ctypes.c_void_p(h))
        assert np.array_equal(got, samples)
