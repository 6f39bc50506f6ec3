"""Cross-validation of functions/vp8l against the REAL libwebp (via
ctypes on the system libwebp.so) — the ground truth the self-consistent
fixture oracles cannot provide. This suite exists because it caught two
real decoder bugs on arrival: the code-length symbol order (16 sits at
position 8 of the order, not the end) and the long-zero-run offset
(code 18 means 11-138 zeros, not 7+) — both invisible to round-trip
tests whose encoder shares the decoder's assumptions.

Skips cleanly when libwebp is not present.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from audios_to_dataset_spark.functions.vp8l import (
    decode_vp8l_pixels,
    encode_vp8l,
    encode_vp8l_color_transform,
    encode_vp8l_lz77,
    encode_vp8l_meta,
    encode_vp8l_palette,
    encode_vp8l_predictor,
)


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", "webp"):
        try:
            if name == "webp":
                found = ctypes.util.find_library("webp")
                if not found:
                    continue
                name = found
            lib = ctypes.CDLL(name)
            lib.WebPDecodeRGB.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGB.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ]
            return lib
        except OSError:
            continue
    return None


LIB = _load_libwebp()
pytestmark = pytest.mark.skipif(LIB is None, reason="libwebp not present")


def lw_decode(data: bytes):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = LIB.WebPDecodeRGB(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        return None
    n = w.value * h.value * 3
    out = (
        np.ctypeslib.as_array(p, shape=(n,))
        .copy()
        .reshape(h.value, w.value, 3)
    )
    LIB.WebPFree(p)
    return out


def lw_encode(px: np.ndarray) -> bytes | None:
    h, w, _ = px.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = LIB.WebPEncodeLosslessRGB(
        px.tobytes(), w, h, w * 3, ctypes.byref(out)
    )
    if size == 0:
        return None
    data = bytes(bytearray(np.ctypeslib.as_array(out, shape=(size,))))
    LIB.WebPFree(out)
    return data


def _contents(rng):
    """Random, tiled (LZ77-heavy), paletted, and smooth (predictor-
    friendly) images — the shapes that drive libwebp's encoder into
    different transform/code choices."""
    for trial in range(40):
        kind = trial % 4
        h, w = rng.randint(1, 50), rng.randint(1, 50)
        if kind == 0:
            yield rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        elif kind == 1:
            tile = rng.randint(0, 256, (3, 4, 3)).astype(np.uint8)
            yield np.tile(tile, (h // 3 + 1, w // 4 + 1, 1))[:h, :w]
        elif kind == 2:
            cs = rng.randint(0, 256, (rng.randint(1, 30), 3))
            yield cs[rng.randint(0, len(cs), (h, w))].astype(np.uint8)
        else:
            px = np.zeros((h, w, 3), np.uint8)
            for y in range(h):
                for x in range(w):
                    px[y, x] = (
                        (x * 3 + y) % 256,
                        (x + y) % 256,
                        (2 * x + 5 * y) % 256,
                    )
            yield px


def test_real_libwebp_streams_decode_in_ours():
    """Every libwebp-encoded lossless stream (its encoder freely picks
    palettes, predictors, caches, LZ77, meta groups) must decode
    pixel-exactly in our decoder."""
    rng = np.random.RandomState(7)
    n = 0
    for px in _contents(rng):
        data = lw_encode(px)
        assert data is not None
        got = decode_vp8l_pixels(data)
        assert got is not None, f"decode None on shape {px.shape}"
        assert np.array_equal(got, px), f"mismatch on shape {px.shape}"
        n += 1
    assert n == 40


def test_our_streams_decode_in_real_libwebp():
    """Every encoder mode we emit must be accepted and reproduced by
    libwebp — proof the bitstreams are spec-conformant, not merely
    self-consistent."""
    rng = np.random.RandomState(8)
    px = rng.randint(0, 256, (13, 17, 3)).astype(np.uint8)
    for name, enc in (
        ("plain", encode_vp8l),
        ("lz77", lambda p: encode_vp8l_lz77(p, cache_bits=5)),
        ("lz77_sg", lambda p: encode_vp8l_lz77(p, subtract_green=True)),
        ("predictor", encode_vp8l_predictor),
        ("color", encode_vp8l_color_transform),
        ("meta", encode_vp8l_meta),
    ):
        out = lw_decode(enc(px))
        assert out is not None, f"libwebp rejected {name}"
        assert np.array_equal(out, px), f"libwebp mismatch for {name}"
    cs = rng.randint(0, 256, (9, 3))
    pal = cs[rng.randint(0, 9, (8, 12))].astype(np.uint8)
    out = lw_decode(encode_vp8l_palette(pal))
    assert out is not None and np.array_equal(out, pal)
    # tiled content through lz77: real backreferences cross-decode
    tile = rng.randint(0, 256, (3, 4, 3)).astype(np.uint8)
    tl = np.tile(tile, (5, 6, 1))
    out = lw_decode(encode_vp8l_lz77(tl))
    assert out is not None and np.array_equal(out, tl)
