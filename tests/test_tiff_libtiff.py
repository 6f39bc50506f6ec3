"""Cross-validation of the TIFF codec against the REAL libtiff (via
ctypes on the system libtiff.so) — the fifth system-library codec
oracle, same pattern as tests/test_vp8l_libwebp.py /
test_png_libpng.py / test_gif_giflib.py / test_jpeg_libjpeg.py: a
round-trip fixture suite cannot catch a mirrored spec bug in
encode+decode, so every stream we emit must be read bit-exactly by the
reference implementation, and streams the reference writes must decode
bit-exactly in ours.

Covers both byte orders and both compressions we implement
(Compression 1 = none, 32773 = PackBits). Skips cleanly when libtiff
is not present.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np
import pytest

from audios_to_dataset_spark.functions.multimodal import (
    decode_tiff_pixels,
    encode_tiff,
)


def _load_libtiff():
    for name in ("libtiff.so.6", "libtiff.so.5", "libtiff.so", "tiff"):
        try:
            if name == "tiff":
                found = ctypes.util.find_library("tiff")
                if not found:
                    continue
                name = found
            lib = ctypes.CDLL(name)
            lib.TIFFOpen.restype = ctypes.c_void_p
            lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
            lib.TIFFClose.argtypes = [ctypes.c_void_p]
            lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
            lib.TIFFReadRGBAImageOriented.argtypes = [
                ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int,
            ]
            lib.TIFFWriteScanline.restype = ctypes.c_int
            lib.TIFFWriteScanline.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
                ctypes.c_uint16,
            ]
            return lib
        except OSError:
            continue
    return None


LIB = _load_libtiff()
pytestmark = pytest.mark.skipif(LIB is None, reason="libtiff not present")

ORIENTATION_TOPLEFT = 1


def lt_read(blob: bytes) -> np.ndarray | None:
    """Decode a TIFF byte string through libtiff to (h, w, 3) RGB."""
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.tiff")
        open(p, "wb").write(blob)
        tif = LIB.TIFFOpen(p.encode(), b"r")
        if not tif:
            return None
        try:
            w = ctypes.c_uint32()
            h = ctypes.c_uint32()
            LIB.TIFFGetField(ctypes.c_void_p(tif), 256, ctypes.byref(w))
            LIB.TIFFGetField(ctypes.c_void_p(tif), 257, ctypes.byref(h))
            n = w.value * h.value
            raster = (ctypes.c_uint32 * n)()
            ok = LIB.TIFFReadRGBAImageOriented(
                tif, w.value, h.value, raster, ORIENTATION_TOPLEFT, 0
            )
            if not ok:
                return None
            abgr = np.ctypeslib.as_array(raster).reshape(h.value, w.value)
        finally:
            LIB.TIFFClose(tif)
    out = np.empty((abgr.shape[0], abgr.shape[1], 3), np.uint8)
    out[:, :, 0] = abgr & 0xFF          # TIFFGetR
    out[:, :, 1] = (abgr >> 8) & 0xFF   # TIFFGetG
    out[:, :, 2] = (abgr >> 16) & 0xFF  # TIFFGetB
    return out


def lt_write(px: np.ndarray, compression: int) -> bytes:
    """Encode (h, w, 3) RGB through libtiff's scanline writer."""
    h, w, _ = px.shape
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "x.tiff")
        tif = LIB.TIFFOpen(p.encode(), b"w")
        assert tif, "libtiff TIFFOpen(w) failed"
        try:
            t = ctypes.c_void_p(tif)
            LIB.TIFFSetField(t, 256, ctypes.c_uint32(w))   # ImageWidth
            LIB.TIFFSetField(t, 257, ctypes.c_uint32(h))   # ImageLength
            LIB.TIFFSetField(t, 258, ctypes.c_int(8))      # BitsPerSample
            LIB.TIFFSetField(t, 259, ctypes.c_int(compression))
            LIB.TIFFSetField(t, 262, ctypes.c_int(2))      # RGB
            LIB.TIFFSetField(t, 277, ctypes.c_int(3))      # SamplesPerPixel
            LIB.TIFFSetField(t, 278, ctypes.c_uint32(max(1, h // 2)))
            LIB.TIFFSetField(t, 284, ctypes.c_int(1))      # chunky
            for y in range(h):
                row = np.ascontiguousarray(px[y]).tobytes()
                assert LIB.TIFFWriteScanline(
                    tif, ctypes.c_char_p(row), y, 0
                ) == 1
        finally:
            LIB.TIFFClose(tif)
        return open(p, "rb").read()


def _contents(rng):
    for trial in range(12):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        if trial % 3 == 0:
            yield rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        elif trial % 3 == 1:
            # long runs: the shape PackBits actually compresses
            base = rng.randint(0, 256, (h, 1, 3)).astype(np.uint8)
            yield np.repeat(base, w, axis=1)
        else:
            tile = rng.randint(0, 256, (2, 3, 3)).astype(np.uint8)
            yield np.tile(tile, (h // 2 + 1, w // 3 + 1, 1))[:h, :w]


def test_our_streams_decode_in_libtiff():
    rng = np.random.RandomState(11)
    n = 0
    for px in _contents(rng):
        for little in (True, False):
            for packbits in (False, True):
                blob = encode_tiff(px, little=little, packbits=packbits)
                got = lt_read(blob)
                assert got is not None, (
                    f"libtiff rejected little={little} packbits={packbits}"
                )
                assert np.array_equal(got, px), (
                    f"libtiff mismatch little={little} packbits={packbits}"
                    f" shape={px.shape}"
                )
        n += 1
    assert n == 12


def test_libtiff_streams_decode_in_ours():
    rng = np.random.RandomState(12)
    n = 0
    for px in _contents(rng):
        for compression in (1, 32773):  # none, PackBits
            blob = lt_write(px, compression)
            got = decode_tiff_pixels(blob)
            assert got is not None, (
                f"our decoder returned None (compression={compression},"
                f" shape={px.shape})"
            )
            assert np.array_equal(got, px), (
                f"mismatch vs libtiff-written stream"
                f" (compression={compression}, shape={px.shape})"
            )
        n += 1
    assert n == 12


def test_wild_tiff_outside_subset_degrade_cleanly():
    """libtiff-written streams using features outside our documented
    subset (LZW) must be refused with None, never mis-decoded."""
    rng = np.random.RandomState(13)
    px = rng.randint(0, 256, (9, 7, 3)).astype(np.uint8)
    blob = lt_write(px, 5)  # LZW
    assert lt_read(blob) is not None  # libtiff round-trips it
    assert decode_tiff_pixels(blob) is None


def test_wild_content_through_our_tiff_encoder():
    """Wild installed images through encode_tiff (both byte orders ×
    none/PackBits), read back by libtiff — content-driven strip and
    run shapes the random/tiled fixtures don't produce."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_wild_files import _wild_files

    from audios_to_dataset_spark.functions.multimodal import (
        decode_image_pixels,
        parse_image_header,
    )

    PIXEL_CAP = 120_000
    done = 0
    for p in _wild_files():
        blob = open(p, "rb").read()
        hdr = parse_image_header(blob)
        if hdr is None:
            continue
        _fmt, w, h = hdr
        if w * h > PIXEL_CAP:
            continue
        px = decode_image_pixels(blob)
        if px is None:
            continue
        for little in (True, False):
            for packbits in (False, True):
                got = lt_read(encode_tiff(px, little=little,
                                          packbits=packbits))
                assert got is not None and np.array_equal(got, px), (
                    f"little={little} packbits={packbits} on {p}"
                )
        done += 1
        if done >= 6:
            break
    assert done >= 4, f"only {done} wild images ran"
