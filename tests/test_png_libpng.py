"""Cross-validation of the pure-Python PNG codec against the REAL
libpng16 (simplified png_image API via ctypes) — the same ground-truth
discipline as tests/test_vp8l_libwebp.py: our fixture encoder's output
must decode pixel-identically in libpng, and libpng-written files must
decode pixel-exactly in our decoder. Skips cleanly when libpng16 is
not present."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from audios_to_dataset_spark.functions.multimodal import (
    decode_png_pixels,
    synth_gray_png,
)


class PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


PNG_IMAGE_VERSION = 1
PNG_FORMAT_RGB = 2


def _load_libpng():
    for name in ("libpng16.so", "libpng16.so.16", "libpng.so"):
        try:
            lib = ctypes.CDLL(name)
            lib.png_image_begin_read_from_memory.restype = ctypes.c_int
            lib.png_image_begin_read_from_memory.argtypes = [
                ctypes.POINTER(PngImage), ctypes.c_char_p, ctypes.c_size_t,
            ]
            lib.png_image_finish_read.restype = ctypes.c_int
            lib.png_image_finish_read.argtypes = [
                ctypes.POINTER(PngImage), ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_void_p,
            ]
            lib.png_image_write_to_memory.restype = ctypes.c_int
            lib.png_image_write_to_memory.argtypes = [
                ctypes.POINTER(PngImage), ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
            ]
            return lib
        except (OSError, AttributeError):
            continue
    return None


LIB = _load_libpng()
pytestmark = pytest.mark.skipif(LIB is None, reason="libpng16 not present")


def libpng_decode(data: bytes):
    img = PngImage()
    img.version = PNG_IMAGE_VERSION
    if not LIB.png_image_begin_read_from_memory(
        ctypes.byref(img), data, len(data)
    ):
        return None
    img.format = PNG_FORMAT_RGB
    buf = (ctypes.c_uint8 * (img.width * img.height * 3))()
    if not LIB.png_image_finish_read(ctypes.byref(img), None, buf, 0, None):
        return None
    return np.frombuffer(bytes(buf), np.uint8).reshape(
        img.height, img.width, 3
    )


def libpng_encode(px: np.ndarray):
    h, w, _ = px.shape
    img = PngImage()
    img.version = PNG_IMAGE_VERSION
    img.width = w
    img.height = h
    img.format = PNG_FORMAT_RGB
    size = ctypes.c_size_t(0)
    LIB.png_image_write_to_memory(
        ctypes.byref(img), None, ctypes.byref(size), 0, px.tobytes(), 0, None
    )
    buf = (ctypes.c_uint8 * size.value)()
    if not LIB.png_image_write_to_memory(
        ctypes.byref(img), buf, ctypes.byref(size), 0, px.tobytes(), 0, None
    ):
        return None
    return bytes(buf)


def test_our_png_fixtures_decode_in_libpng():
    """Our fixture encoder (cycled row filters) must be accepted by
    libpng and produce the identical pixels our decoder produces."""
    for d in range(12):
        data = synth_gray_png(d)
        ref = libpng_decode(data)
        mine = decode_png_pixels(data)
        assert ref is not None, f"libpng rejected fixture {d}"
        assert mine is not None and mine.shape == ref.shape
        assert np.array_equal(ref, mine), d


def test_libpng_streams_decode_in_ours():
    """libpng-written truecolor PNGs (its own filter/deflate choices)
    must decode pixel-exactly in our decoder."""
    rng = np.random.RandomState(4)
    for t in range(15):
        h, w = rng.randint(1, 40), rng.randint(1, 40)
        if t % 3 == 2:  # smooth content drives nontrivial filters
            px = np.zeros((h, w, 3), np.uint8)
            for y in range(h):
                for x in range(w):
                    px[y, x] = ((x * 3 + y) % 256, (x + y) % 256,
                                (2 * x + 5 * y) % 256)
        else:
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        data = libpng_encode(px)
        assert data is not None
        mine = decode_png_pixels(data)
        assert mine is not None, (h, w)
        assert np.array_equal(mine, px), (h, w)


def test_wild_content_through_our_png_encoder():
    """Wild-content direction for the PNG ENCODER (the resize
    pipeline's re-encode path): real installed images through
    encode_png (plain, filter-cycled, and Adam7-interlaced) must be
    accepted and pixel-reproduced by libpng. Same lesson as the VP8L
    distance-map bug: only content we didn't synthesize drives
    encoder structures fixtures never produce."""
    from test_wild_files import _wild_files

    from audios_to_dataset_spark.functions.multimodal import (
        decode_image_pixels,
        encode_png,
        parse_image_header,
    )

    PIXEL_CAP = 60_000
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
        for name, enc in (
            ("plain", lambda q: encode_png(q)),
            ("cycled", lambda q: encode_png(q, cycle_filters=True)),
            ("adam7", lambda q: encode_png(q, interlace=True)),
        ):
            got = libpng_decode(enc(px))
            assert got is not None, f"libpng rejected {name} of {p}"
            assert np.array_equal(got, px), f"{name} mismatch on {p}"
        done += 1
        if done >= 6:
            break
    assert done >= 4, f"only {done} wild images ran"
