"""Cross-validation of the pure-Python JPEG decoder against the REAL
libjpeg62 — the fourth codec under the system-lib ground-truth
discipline (webp/png/gif siblings). libjpeg runs in a SUBPROCESS
(tests/helpers/libjpeg_decode.py) because its default error handler
calls exit(); the helper self-calibrates the opaque
jpeg_decompress_struct field offsets from the expected dims.

Verified contract: our grayscale fixture families (baseline,
PROGRESSIVE/SOF2, EXIF-carrying) decode BIT-IDENTICALLY to libjpeg;
wild color 4:2:0 JPEGs agree within ±2 per sample (T.81 does not
mandate an exact IDCT, and chroma upsampling differs — libjpeg uses
fancy upsampling; the mean disagreement is ~0.002 levels).

Skips cleanly when libjpeg.so.62 is not present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

from audios_to_dataset_spark.functions.jpeg import (
    decode_jpeg_pixels,
    synth_gray_jpeg,
    synth_gray_jpeg_progressive,
    synth_jpeg_with_exif,
)


def _have_libjpeg() -> bool:
    try:
        ctypes.CDLL("libjpeg.so.62")
        return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _have_libjpeg(), reason="libjpeg62 not present"
)

HELPER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "helpers",
    "libjpeg_decode.py",
)


def libjpeg_decode(data: bytes, w: int, h: int):
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "in.jpg")
        dst = os.path.join(td, "out.npy")
        open(src, "wb").write(data)
        r = subprocess.run(
            [sys.executable, HELPER, src, dst, str(w), str(h)],
            capture_output=True, text=True, timeout=60,
        )
        if r.returncode != 0:
            return None
        return np.load(dst)


@pytest.mark.parametrize(
    "name,synth",
    [
        ("baseline", synth_gray_jpeg),
        ("progressive", synth_gray_jpeg_progressive),
        ("exif", synth_jpeg_with_exif),
    ],
)
def test_fixture_jpegs_bit_identical_to_libjpeg(name, synth):
    """Grayscale fixtures (integer-exact closed forms) must decode to
    the EXACT same samples in libjpeg — zero tolerance."""
    for d in range(6):
        data = synth(d)
        mine = decode_jpeg_pixels(data)
        assert mine is not None, (name, d)
        h, w = mine.shape[:2]
        ref = libjpeg_decode(data, w, h)
        assert ref is not None, f"libjpeg rejected {name} fixture {d}"
        assert ref.shape == mine.shape
        assert np.array_equal(ref, mine), (name, d)


def test_wild_color_jpegs_within_idct_tolerance():
    """Real-world 4:2:0 color JPEGs: libjpeg and our decoder must agree
    within ±2 per sample (IDCT + chroma-upsampling rounding; T.81
    mandates no exact IDCT)."""
    paths = [
        "/usr/share/doc/nodejs/thin-white-stripe.jpg",
        "/usr/share/doc/nodejs/full-white-stripe.jpg",
    ]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        pytest.skip("no wild JPEGs on this host")
    for p in paths:
        data = open(p, "rb").read()
        mine = decode_jpeg_pixels(data)
        assert mine is not None, p
        h, w = mine.shape[:2]
        ref = libjpeg_decode(data, w, h)
        assert ref is not None, p
        diff = np.abs(ref.astype(int) - mine.astype(int))
        assert diff.max() <= 2, (p, int(diff.max()))
        assert diff.mean() < 0.05, (p, float(diff.mean()))
