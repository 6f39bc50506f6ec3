"""Multimodal column plumbing: real header decodes, real mapInPandas
schema/batch contracts, deterministic fake features, stubbed codecs."""

from __future__ import annotations

import struct

import pytest

from audios_to_dataset_spark.functions.multimodal import (
    fake_embedding,
    parse_image_header,
    partition_by_size_budget,
    sample_video_frames,
    with_content_embedding,
    with_image_info,
)


def _png(w: int, h: int) -> bytes:
    ihdr = b"IHDR" + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + ihdr + b"\x00" * 16


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 16


def _bmp(w: int, h: int) -> bytes:
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 16


def _jpeg(w: int, h: int) -> bytes:
    sof = b"\xff\xc0" + struct.pack(">HBHH", 8 + 9, 8, h, w) + b"\x03"
    return b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00" \
        + sof + b"\x00" * 8


def test_parse_headers():
    assert parse_image_header(_png(640, 480)) == ("png", 640, 480)
    assert parse_image_header(_gif(320, 200)) == ("gif", 320, 200)
    assert parse_image_header(_bmp(800, 600)) == ("bmp", 800, 600)
    assert parse_image_header(_jpeg(1024, 768)) == ("jpeg", 1024, 768)
    assert parse_image_header(b"garbage data here") == (None, 0, 0)
    assert parse_image_header(None) == (None, 0, 0)
    # bottom-up BMP (negative height) is normalized
    assert parse_image_header(_bmp(10, -20)) == ("bmp", 10, 20)


def test_with_image_info_schema_and_values(spark):
    rows = [
        ("a", _png(640, 480)),
        ("b", _jpeg(1024, 768)),
        ("c", b"not an image"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "id string, content binary")
    out = with_image_info(df)
    assert out.schema.simpleString() == (
        "struct<id:string,content:binary,"
        "image:struct<format:string,width:int,height:int>>"
    )
    got = {r.id: r.image for r in out.collect()}
    assert got["a"].format == "png" and got["a"].width == 640
    assert got["b"].height == 768
    assert got["c"].format is None and got["c"].width == 0
    assert got["d"].format is None


def test_fake_embedding_deterministic_and_normalized(spark):
    e1 = fake_embedding(b"hello", 16)
    e2 = fake_embedding(b"hello", 16)
    e3 = fake_embedding(b"world", 16)
    assert e1 == e2 and e1 != e3 and len(e1) == 16
    assert abs(sum(x * x for x in e1) - 1.0) < 1e-5

    df = spark.createDataFrame(
        [("a", b"hello"), ("b", None)], "id string, content binary"
    )
    out = with_content_embedding(df, dim=8)
    got = {r.id: r.embedding for r in out.collect()}
    assert len(got["a"]) == 8
    # driver-side and executor-side fakes agree (pure function of bytes)
    assert [round(x, 5) for x in got["a"]] == [
        round(x, 5) for x in fake_embedding(b"hello", 8)
    ]
    assert got["b"] is not None  # NULL content → embedding of b""


def test_sample_video_frames_skips_undecodable(spark):
    """sample_video_frames is real for AVI (raw + MJPEG); non-AVI bytes
    follow the skip-with-fallback contract: zero rows, no exception."""
    df = spark.createDataFrame([(1, b"x")], "doc_id long, content binary")
    assert sample_video_frames(df).count() == 0


def test_partition_by_size_budget(spark):
    df = spark.createDataFrame(
        [(i, b"x" * 1000, 1000) for i in range(100)],
        "id long, content binary, length long",
    )
    out = partition_by_size_budget(df, target_bytes_per_partition=10_000)
    assert out.rdd.getNumPartitions() == 11  # 100kB / 10kB + 1
    assert out.count() == 100


def test_bmp_roundtrip_exact():
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
    )

    rng = np.random.RandomState(7)
    # widths 3 and 5 force nonzero row padding; 4 is pad-free
    for w, h in [(3, 2), (4, 4), (5, 3), (17, 13)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype("uint8")
        out = decode_bmp_pixels(encode_bmp(px))
        assert out is not None and out.shape == (h, w, 3)
        assert (out == px).all()


def test_bmp_decode_rejects_malformed():
    import struct

    from audios_to_dataset_spark.functions.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
    )
    import numpy as np

    good = encode_bmp(np.zeros((2, 2, 3), dtype="uint8"))
    assert decode_bmp_pixels(None) is None
    assert decode_bmp_pixels(b"notabmp") is None
    assert decode_bmp_pixels(good[:30]) is None  # truncated header
    assert decode_bmp_pixels(good[:-4]) is None  # truncated pixels
    bad_bpp = bytearray(good)
    struct.pack_into("<H", bad_bpp, 28, 32)
    assert decode_bmp_pixels(bytes(bad_bpp)) is None


def test_resize_nn_matches_index_rule():
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import resize_nn

    px = np.arange(7 * 5 * 3, dtype="uint8").reshape(5, 7, 3)
    out = resize_nn(px, 3, 2)
    for j in range(2):
        for i in range(3):
            assert (out[j, i] == px[(j * 5) // 2, (i * 7) // 3]).all()


def test_resize_images_bmp_passthrough_and_resize(spark):
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
        resize_images_bmp,
    )

    px = np.arange(6 * 4 * 3, dtype="uint8").reshape(4, 6, 3)
    rows = [(1, encode_bmp(px)), (2, b"not an image")]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r.id: bytes(r.content)
           for r in resize_images_bmp(df, 2, 2).collect()}
    out = decode_bmp_pixels(got[1])
    assert out is not None and out.shape == (2, 2, 3)
    assert got[2] == b"not an image"


def test_avi_roundtrip_exact():
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_avi_frames,
        encode_avi_raw,
    )

    rng = np.random.RandomState(3)
    frames = [
        rng.randint(0, 256, size=(5, 7, 3)).astype("uint8")
        for _ in range(4)
    ]
    out = decode_avi_frames(encode_avi_raw(frames))
    assert out is not None and len(out) == 4
    for a, b in zip(frames, out):
        assert (a == b).all()


def test_avi_decode_rejects_malformed():
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_avi_frames,
        encode_avi_raw,
    )

    good = encode_avi_raw([np.zeros((2, 2, 3), dtype="uint8")])
    assert decode_avi_frames(None) is None
    assert decode_avi_frames(b"RIFFxxxxWAVE") is None
    assert decode_avi_frames(good[:20]) is None


def test_sample_avi_frames_every_n(spark):
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        encode_avi_raw,
        sample_avi_frames,
    )

    frames = [
        np.full((2, 2, 3), v, dtype="uint8") for v in (10, 20, 30, 40, 50)
    ]
    rows = [(7, encode_avi_raw(frames)), (8, b"junk")]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = sorted(
        (r.doc_id, r.frame_idx, r.mean_px)
        for r in sample_avi_frames(df, every_n=2).collect()
    )
    assert got == [(7, 0, 10.0), (7, 2, 30.0), (7, 4, 50.0)]


def test_png_roundtrip_all_filters():
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    rng = np.random.RandomState(11)
    for w, h in [(1, 6), (5, 7), (16, 16)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype("uint8")
        for cyc in (False, True):
            out = decode_png_pixels(encode_png(px, cycle_filters=cyc))
            assert out is not None and (out == px).all()


def test_png_palette_and_interlace_roundtrip():
    """ctype-3 (PLTE) and Adam7 layouts, both encoders cycling filters;
    odd sizes leave some interlace passes empty."""
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_png_pixels,
        encode_png,
        encode_png_palette,
    )

    rng = np.random.RandomState(4)
    for w, h in [(1, 1), (7, 5), (8, 8), (13, 11), (1, 9), (31, 2)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype("uint8")
        out = decode_png_pixels(
            encode_png(px, cycle_filters=True, interlace=True)
        )
        assert out is not None and (out == px).all()
        pal = rng.randint(0, 256, size=(64, 3)).astype("uint8")
        idx = rng.randint(0, 64, size=(h, w)).astype("uint8")
        for il in (False, True):
            out = decode_png_pixels(encode_png_palette(idx, pal, il))
            assert out is not None and (out == pal[idx]).all()
    # out-of-range palette index -> keep-with-fallback None
    pal8 = rng.randint(0, 256, size=(8, 3)).astype("uint8")
    bad = np.full((4, 4), 9, dtype="uint8")
    assert decode_png_pixels(encode_png_palette(bad, pal8)) is None


def test_png_16bit_msb_downconversion():
    """Depth-16 decode takes each sample's high byte (libpng strip_16),
    with the 6-byte filter unit, in both scan layouts."""
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_png_pixels,
        encode_png16,
    )

    rng = np.random.RandomState(6)
    for w, h in [(1, 1), (7, 5), (13, 11)]:
        px16 = rng.randint(0, 65536, size=(h, w, 3)).astype(np.uint16)
        for il in (False, True):
            out = decode_png_pixels(encode_png16(px16, interlace=il))
            assert out is not None
            assert (out == (px16 >> 8).astype("uint8")).all()


def test_png_decode_rejects_unsupported():
    import struct
    import zlib

    from audios_to_dataset_spark.functions.multimodal import (
        decode_png_pixels,
    )

    assert decode_png_pixels(None) is None
    assert decode_png_pixels(b"\x89PNG\r\n\x1a\nxxxx") is None
    # sub-8-bit depth header -> unsupported (16-bit decodes since r5)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 3, 0, 0, 0)
    body = (
        struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    assert decode_png_pixels(b"\x89PNG\r\n\x1a\n" + body) is None
    # 16-bit palette violates the spec -> rejected
    ihdr16p = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    body16p = (
        struct.pack(">I", len(ihdr16p)) + b"IHDR" + ihdr16p
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr16p) & 0xFFFFFFFF)
    )
    assert decode_png_pixels(b"\x89PNG\r\n\x1a\n" + body16p) is None


def test_resize_images_codec_free_fallback(spark):
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_image_pixels,
        encode_bmp,
        encode_png,
        resize_images,
    )

    px = np.arange(6 * 4 * 3, dtype="uint8").reshape(4, 6, 3)
    rows = [
        (1, encode_bmp(px)),
        (2, encode_png(px, cycle_filters=True)),
        (3, b"\xff\xd8 not really jpeg"),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {r.id: bytes(r.content) for r in resize_images(df, 3, 2).collect()}
    for i, magic in ((1, b"BM"), (2, b"\x89PNG\r\n\x1a\n")):
        out = decode_image_pixels(got[i])
        assert out is not None and out.shape == (2, 3, 3)
        assert got[i][: len(magic)] == magic
    assert got[3] == b"\xff\xd8 not really jpeg"


def test_gif_roundtrip_exact():
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_gif_pixels,
        encode_gif_gray,
    )

    rng = np.random.RandomState(9)
    # > 250 pixels forces the encoder's mid-stream CLEAR codes
    for w, h in [(4, 3), (17, 19), (30, 20)]:
        px = rng.randint(0, 256, size=(h, w)).astype("uint8")
        out = decode_gif_pixels(encode_gif_gray(px))
        assert out is not None and out.shape == (h, w, 3)
        assert (out[:, :, 0] == px).all()
        assert (out == out[:, :, :1]).all()  # gray palette -> equal channels


def test_gif_decode_ignores_bytes_after_eoi():
    """Trailing bytes inside the data sub-blocks after the EOI code must
    not re-enter the LZW decoder (ADVICE r4: the EOI break only exited
    the inner loop, so post-EOI padding could hit the invalid-code
    branch and reject a valid image)."""
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_gif_pixels,
        encode_gif_gray,
    )

    px = np.arange(7 * 5, dtype="uint8").reshape(5, 7)
    enc = encode_gif_gray(px)
    # enc ends with: ...blocks + b"\x00" (terminator) + b"\x3b" (trailer).
    # Splice a junk sub-block (0xFF bytes decode to garbage codes) after
    # the real LZW data, before the terminator.
    assert enc[-2:] == b"\x00\x3b"
    tampered = enc[:-2] + b"\x03\xff\xff\xff" + b"\x00\x3b"
    out = decode_gif_pixels(tampered)
    assert out is not None and out.shape == (5, 7, 3)
    assert (out[:, :, 0] == px).all()


def test_gif_decode_rejects_malformed():
    from audios_to_dataset_spark.functions.multimodal import (
        decode_gif_pixels,
    )

    assert decode_gif_pixels(None) is None
    assert decode_gif_pixels(b"GIF89a" + b"\x00" * 5) is None
    assert decode_gif_pixels(b"JFIFxxxxxxxxxx") is None


def test_resize_images_gif_input_reencodes_png(spark):
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_image_pixels,
        encode_gif_gray,
        resize_images,
    )

    px = np.arange(6 * 4, dtype="uint8").reshape(4, 6)
    df = spark.createDataFrame(
        [(1, encode_gif_gray(px))], "id long, content binary"
    )
    out = bytes(resize_images(df, 3, 2).collect()[0].content)
    assert out[:8] == b"\x89PNG\r\n\x1a\n"
    dec = decode_image_pixels(out)
    assert dec is not None and dec.shape == (2, 3, 3)
    for j in range(2):
        for i in range(3):
            assert dec[j, i, 0] == px[(j * 4) // 2, (i * 6) // 3]


def test_gif_interlace_and_local_palette_roundtrip():
    """All four encoder modes (interlace x local/global palette) decode
    back to the source pixels, including 1-row/1-col edge shapes."""
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_gif_pixels,
        encode_gif_gray,
    )

    rng = np.random.RandomState(8)
    for w, h in [(1, 1), (4, 3), (17, 19), (9, 1), (1, 13)]:
        px = rng.randint(0, 256, size=(h, w)).astype("uint8")
        for il in (False, True):
            for lp in (False, True):
                out = decode_gif_pixels(
                    encode_gif_gray(px, interlace=il, local_palette=lp)
                )
                assert out is not None and out.shape == (h, w, 3)
                assert (out[:, :, 0] == px).all()


def test_parse_tiff_webp_headers():
    """TIFF IFD walk (both byte orders, SHORT and LONG entries) and the
    three WebP variants (VP8L lossless, VP8X extended, VP8 lossy)."""
    import struct

    from audios_to_dataset_spark.functions.multimodal import (
        parse_image_header,
    )

    def tiff(w, h, little=True, typ=3):
        e = "<" if little else ">"
        hdr = (b"II*\x00" if little else b"MM\x00*") + struct.pack(
            e + "I", 8
        )

        def ent(tag, val):
            if typ == 3:
                return (
                    struct.pack(e + "HHI", tag, 3, 1)
                    + struct.pack(e + "H", val)
                    + b"\x00\x00"
                )
            return struct.pack(e + "HHI", tag, 4, 1) + struct.pack(
                e + "I", val
            )

        return (
            hdr + struct.pack(e + "H", 2) + ent(256, w) + ent(257, h)
            + struct.pack(e + "I", 0)
        )

    def vp8l(w, h):
        bits = (w - 1) | ((h - 1) << 14)
        body = b"VP8L" + struct.pack("<I", 5) + b"\x2f" + struct.pack(
            "<I", bits
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body

    def vp8x(w, h):
        body = (
            b"VP8X" + struct.pack("<I", 10) + b"\x00" * 4
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
            + b"\x00" * 4
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body

    def vp8(w, h):
        body = (
            b"VP8 " + struct.pack("<I", 16) + b"\x00" * 3
            + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + b"\x00" * 4
        )
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body

    assert parse_image_header(tiff(640, 480)) == ("tiff", 640, 480)
    assert parse_image_header(tiff(123, 77, little=False)) == (
        "tiff", 123, 77,
    )
    assert parse_image_header(tiff(70000, 5, typ=4)) == ("tiff", 70000, 5)
    assert parse_image_header(vp8l(320, 200)) == ("webp", 320, 200)
    assert parse_image_header(vp8x(1920, 1080)) == ("webp", 1920, 1080)
    assert parse_image_header(vp8(352, 288)) == ("webp", 352, 288)
    assert parse_image_header(b"RIFF\x04\x00\x00\x00WEBPXXXX") == (
        "webp", 0, 0,
    )
    # RIFF AVI must not be claimed as webp
    assert parse_image_header(
        b"RIFF\x10\x00\x00\x00AVI " + b"\x00" * 16
    ) == (None, 0, 0)


def test_mrle_interframe_persistence_and_robustness():
    """MS-RLE8: skipped rows persist across frames (true inter-frame
    state); malformed opcode streams fail closed instead of throwing."""
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        _decode_rle8_into,
        decode_avi_frames,
        encode_avi_mrle,
    )

    f0 = np.arange(24, dtype=np.uint8).reshape(4, 6)
    f1 = f0.copy()
    f1[1] = 200  # only row 1 changes
    frames = decode_avi_frames(encode_avi_mrle([f0, f1], 6, 4))
    assert frames is not None and len(frames) == 2
    # frame 1 keeps rows 0/2/3 from frame 0, repaints row 1
    assert (frames[1][1, :, 0] == 200).all()
    assert (frames[1][0] == frames[0][0]).all()
    assert (frames[1][3] == frames[0][3]).all()

    fb = np.zeros((4, 6), dtype=np.uint8)
    assert _decode_rle8_into(b"\x09\x01", fb) is False      # run off row
    assert _decode_rle8_into(b"\x00\x05\x01\x02", fb) is False  # abs trunc
    assert _decode_rle8_into(b"\x00\x02\xff\xff", fb) is False  # delta oob
    assert _decode_rle8_into(b"\x02\x07\x00\x01", fb) is True
    assert (fb[0, :2] == 7).all()


def test_dhash_contract_and_banding_recall():
    """dHash: null-safe halves, 32-bit range, perturbation locality, and
    the pigeonhole banding guarantee (any pair within 4 bits shares at
    least one of the 4 16-bit bands — the recall basis q_image_neardup
    relies on)."""
    import itertools

    from audios_to_dataset_spark.functions.multimodal import (
        PHASH_GROUPS,
        decode_bmp_pixels,
        dhash64,
        synth_group_bmp,
    )

    hashes = {
        d: dhash64(decode_bmp_pixels(synth_group_bmp(d)))
        for d in range(120)
    }
    for hi, lo in hashes.values():
        assert 0 <= hi < 1 << 32 and 0 <= lo < 1 << 32

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    def bandkeys(h):
        return {
            (0, h[0] >> 16), (1, h[0] & 65535),
            (2, h[1] >> 16), (3, h[1] & 65535),
        }

    same = [
        ham(hashes[a], hashes[b])
        for a, b in itertools.combinations(hashes, 2)
        if a % PHASH_GROUPS == b % PHASH_GROUPS
    ]
    cross = [
        ham(hashes[a], hashes[b])
        for a, b in itertools.combinations(hashes, 2)
        if a % PHASH_GROUPS != b % PHASH_GROUPS
    ]
    # one perturbed pixel flips at most 2 of the 64 gradient bits per
    # image -> same-group pairs stay within 4 bits; cross-group images
    # are md5-random and must separate cleanly
    assert same and max(same) <= 4
    assert sum(1 for d in cross if d <= 6) == 0
    # pigeonhole: <=4 differing bits cannot cover all 4 bands differently
    # here (and in general the banding equi-join must recall every pair
    # the fixture family produces)
    for a, b in itertools.combinations(hashes, 2):
        if ham(hashes[a], hashes[b]) <= 4:
            assert bandkeys(hashes[a]) & bandkeys(hashes[b])


def test_dhash_null_and_undecodable(spark):
    """NULL / non-image content must yield NULL hash halves (the WAV
    keep-with-fallback contract)."""
    import pandas as pd

    from audios_to_dataset_spark.functions.multimodal import with_dhash

    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "content": [None, b"not an image"]}
        )
    )
    rows = {r["doc_id"]: r for r in with_dhash(df).collect()}
    assert rows[1]["dhash_hi"] is None and rows[1]["dhash_lo"] is None
    assert rows[2]["dhash_hi"] is None and rows[2]["dhash_lo"] is None


def test_msvc_codec_roundtrip_and_skip_persistence():
    """MS Video 1: exact round trip through every opcode, block-granular
    inter-frame persistence (skipped blocks keep frame k-1 pixels), and
    malformed-stream rejection."""
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        _decode_msvc_into,
        decode_avi_frames,
        encode_avi_msvc,
    )

    w, h = 8, 8
    f0 = np.zeros((h, w), dtype=np.uint8)
    f0[:4, :4] = 10                       # 1-color block
    f0[:4, 4:] = np.tile([20, 30], (4, 2))  # 2-color block
    f0[4:, :4] = 200                      # 1-color, bit7 color
    q = np.array([[1, 2], [2, 1]], dtype=np.uint8)
    f0[4:, 4:] = np.kron(np.ones((2, 2), np.uint8), q) * 40  # 2-color
    f1 = f0.copy()
    f1[:4, :4] = 99                       # only one block changes
    avi = encode_avi_msvc([f0, f1], w, h)
    frames = decode_avi_frames(avi)
    assert frames is not None and len(frames) == 2
    assert np.array_equal(frames[0][:, :, 0], f0)
    assert np.array_equal(frames[1][:, :, 0], f1)  # 3 blocks persisted

    # frame 1 payload must be small: 1 block painted + skips
    # malformed: skip count 0 is rejected
    fb = np.zeros((8, 8), dtype=np.uint8)
    assert _decode_msvc_into(bytes([0, 0x84]), fb) is False
    # truncated stream leaves remaining blocks persistent (legal)
    fb[:] = 7
    assert _decode_msvc_into(bytes([5, 0x80]), fb) is True
    assert fb[0, 0] == 5 and fb[4, 4] == 7


def test_msvc_eight_color_block():
    """8-color blocks reconstruct per-quadrant colors exactly, including
    the bit7 mode-signal constraint on the stream's quadrant 0."""
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_avi_frames,
        encode_avi_msvc,
    )

    blk = np.zeros((4, 4), dtype=np.uint8)
    # top-down quadrants; stream quadrant 0 = bottom-left (rows 2:4,
    # cols 0:2) needs one bit7 color
    blk[0:2, 0:2] = [[1, 2], [2, 1]]
    blk[0:2, 2:4] = [[3, 4], [4, 3]]
    blk[2:4, 0:2] = [[200, 5], [5, 200]]
    blk[2:4, 2:4] = [[6, 7], [7, 6]]
    avi = encode_avi_msvc([blk], 4, 4)
    frames = decode_avi_frames(avi)
    assert frames is not None
    assert np.array_equal(frames[0][:, :, 0], blk)


def test_msvc_decoder_fuzz():
    """Garbage byte streams must never crash or hang the MSVC block
    state machine — worst case it returns False or leaves the
    framebuffer partially painted."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from audios_to_dataset_spark.functions.multimodal import (
        _decode_msvc_into,
    )

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=200))
    def run(buf):
        fb = np.zeros((8, 12), dtype=np.uint8)
        r = _decode_msvc_into(buf, fb)
        assert r in (True, False)

    run()


def test_mp4_header_malformed():
    """MP4 box walk: version-1 mvhd (64-bit duration), missing moov,
    zero timescale, and truncated box sizes all behave."""
    import struct

    from audios_to_dataset_spark.functions.audio_headers import (
        parse_mp4_header,
        synth_mp4,
    )

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    # version-1 mvhd: 64-bit duration at a different offset
    mvhd1 = box(
        b"mvhd",
        b"\x01\x00\x00\x00" + b"\x00" * 16
        + struct.pack(">I", 1000) + struct.pack(">Q", 7_000)
        + b"\x00" * 80,
    )
    data = box(b"ftyp", b"isom") + box(b"moov", mvhd1)
    assert parse_mp4_header(data) == ("mp4", 1000, 0, 7000)
    # no moov
    assert parse_mp4_header(box(b"ftyp", b"isom")) == (None, 0, 0, 0)
    # box size overruns the buffer -> walk stops cleanly
    trunc = synth_mp4(5)[:40]
    assert parse_mp4_header(trunc) == (None, 0, 0, 0)


def test_tga_codec():
    """TGA: RLE + literal packets, both row origins, type-2 path,
    malformed rejection, and run-boundary handling at 128."""
    import struct

    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_tga_pixels,
        encode_tga_rle,
    )

    # a 130-wide solid row forces a 128-run + 2-run split
    px = np.full((2, 130, 3), 77, dtype=np.uint8)
    px[1, ::2] = 10  # alternating row -> literal packets
    for td in (True, False):
        got = decode_tga_pixels(encode_tga_rle(px, top_down=td))
        assert got is not None and np.array_equal(got, px)
    # type 2 uncompressed
    raw = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    hdr = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 4, 2, 24, 0x20
    )
    assert np.array_equal(
        decode_tga_pixels(hdr + raw[:, :, ::-1].tobytes()), raw
    )
    # malformed: truncated RLE stream, unknown type, wrong bpp
    good = encode_tga_rle(px)
    assert decode_tga_pixels(good[:30]) is None
    bad = bytearray(good)
    bad[2] = 3  # unknown image type
    assert decode_tga_pixels(bytes(bad)) is None
    assert decode_tga_pixels(None) is None


def test_ico_codec():
    """ICO: both payload branches (24-bpp doubled-height DIB, embedded
    PNG), header surface, and malformed rejection."""
    import struct

    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_ico_pixels,
        encode_ico,
        parse_image_header,
        synth_gray_ico,
    )

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8)
    for as_png in (False, True):
        data = encode_ico(px, as_png)
        got = decode_ico_pixels(data)
        assert got is not None and np.array_equal(got, px)
        assert parse_image_header(data) == ("ico", 7, 5)
    # 0-in-entry means 256 per spec (header surface only)
    wide = encode_ico(np.zeros((4, 256, 3), dtype=np.uint8), False)
    assert parse_image_header(wide)[:2] == ("ico", 256)
    # fixture branches: even -> DIB, odd -> PNG
    assert synth_gray_ico(2)[22:26] == struct.pack("<I", 40)
    assert synth_gray_ico(3)[22:30] == b"\x89PNG\r\n\x1a\n"
    # malformed: wrong magic, zero entries, truncated payload, odd
    # doubled height, non-24bpp DIB
    good = encode_ico(px, False)
    assert decode_ico_pixels(b"\x00\x00\x02\x00" + good[4:]) is None
    assert decode_ico_pixels(good[:4] + b"\x00\x00" + good[6:]) is None
    assert decode_ico_pixels(good[:40]) is None
    bad = bytearray(good)
    struct.pack_into("<i", bad, 22 + 4 + 4, 9)  # biHeight odd
    assert decode_ico_pixels(bytes(bad)) is None
    bad = bytearray(good)
    struct.pack_into("<H", bad, 22 + 14, 8)  # bpp 8
    assert decode_ico_pixels(bytes(bad)) is None
    assert decode_ico_pixels(None) is None


def test_pnm_codec():
    """Netpbm: P5/P6 round-trips, comment + whitespace lexing, and
    malformed rejection."""
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_pnm_pixels,
        encode_pnm,
        parse_image_header,
        synth_gray_pnm,
    )

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, (3, 9, 3), dtype=np.uint8)
    gray = np.repeat(px[:, :, :1], 3, axis=2)
    assert np.array_equal(decode_pnm_pixels(encode_pnm(gray, True)), gray)
    assert np.array_equal(decode_pnm_pixels(encode_pnm(px, False)), px)
    assert parse_image_header(encode_pnm(px, False)) == ("ppm", 9, 3)
    assert parse_image_header(encode_pnm(gray, True)) == ("pgm", 9, 3)
    # exotic-but-legal headers: multiple comments, CRLF, tab runs
    body = bytes(px[:1, :2].tobytes())
    assert (
        decode_pnm_pixels(b"P6 # c1\r\n#c2\n\t 2\t1 \n 255\n" + body)
        is not None
    )
    # fixture branches: even -> P5, odd -> P6
    assert synth_gray_pnm(2)[:2] == b"P5"
    assert synth_gray_pnm(3)[:2] == b"P6"
    # malformed: ASCII variant, maxval 65535, truncated raster, junk
    # token, negative-free but zero dims
    assert decode_pnm_pixels(b"P3\n2 1\n255\n1 2 3 4 5 6") is None
    assert decode_pnm_pixels(b"P6\n2 1\n65535\n" + bytes(12)) is None
    assert decode_pnm_pixels(b"P6\n2 2\n255\n" + bytes(5)) is None
    assert decode_pnm_pixels(b"P6\n2 x\n255\n" + bytes(12)) is None
    assert decode_pnm_pixels(b"P6\n0 1\n255\n") is None
    assert decode_pnm_pixels(None) is None


def test_tiff_codec():
    """TIFF: both byte orders x both compressions round-trip, PackBits
    runs and literals, strip split at odd heights, gray replication,
    malformed rejection."""
    import struct

    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        _packbits_decode,
        _packbits_encode,
        decode_tiff_pixels,
        encode_tiff,
        parse_image_header,
        synth_gray_tiff,
    )

    rng = np.random.RandomState(2)
    for h in (1, 2, 5):
        px = rng.randint(0, 256, (h, 7, 3), dtype=np.uint8)
        for little in (True, False):
            for pb in (True, False):
                got = decode_tiff_pixels(encode_tiff(px, little, pb))
                assert got is not None and np.array_equal(got, px)
    # PackBits edge shapes: long runs (>128), long literals, empty
    assert _packbits_decode(_packbits_encode(b"\x07" * 300), 300) == b"\x07" * 300
    lit = bytes(range(200))
    assert _packbits_decode(_packbits_encode(lit), 200) == lit
    assert _packbits_decode(b"", 0) == b""
    # header surface agrees with the full decode
    data = synth_gray_tiff(9)
    fmt, w, h = parse_image_header(data)
    px = decode_tiff_pixels(data)
    assert fmt == "tiff" and (h, w) == px.shape[:2]
    # malformed: LZW compression code, 16-bit samples, truncated strip
    bad = bytearray(encode_tiff(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<H", bad, 8 + 2 + 12 * 3 + 8, 5)  # comp -> LZW
    assert decode_tiff_pixels(bytes(bad)) is None
    good = encode_tiff(np.zeros((4, 4, 3), np.uint8))
    assert decode_tiff_pixels(good[:40]) is None
    assert decode_tiff_pixels(None) is None


def test_vp8l_codec():
    """VP8L: full-alphabet round-trips (normal Huffman form incl. the
    degenerate zero-bit code-length code), subset gates, container
    rejection, and agreement with the independent header parser."""
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        parse_image_header,
    )
    from audios_to_dataset_spark.functions.vp8l import (
        _LSBReader,
        _LSBWriter,
        decode_vp8l_pixels,
        encode_vp8l,
        synth_gray_webp,
    )

    rng = np.random.RandomState(6)
    for h, w in ((1, 1), (3, 17), (10, 4)):
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        data = encode_vp8l(px)
        got = decode_vp8l_pixels(data)
        assert got is not None and np.array_equal(got, px)
        assert parse_image_header(data) == ("webp", w, h)
    # LSB bit I/O round-trip (ReadBits semantics)
    bw = _LSBWriter()
    for v, n in ((5, 3), (0, 1), (1023, 14), (1, 1)):
        bw.write(v, n)
    br = _LSBReader(bw.bytes())
    assert [br.read(n) for n in (3, 1, 14, 1)] == [5, 0, 1023, 1]
    # subset gates: flipping the transform-present bit rejects; the
    # bit sits right after the 32-bit dim/version field of the payload
    good = encode_vp8l(rng.randint(0, 256, (2, 2, 3), dtype=np.uint8))
    bad = bytearray(good)
    bad[21 + 4] |= 0x01  # payload byte 4 bit 0 = transform flag
    assert decode_vp8l_pixels(bytes(bad)) is None
    # container rejection
    for junk in (None, b"", good[:25], b"RIFX" + good[4:]):
        assert decode_vp8l_pixels(junk) is None
    # fixture determinism
    assert synth_gray_webp(7) == synth_gray_webp(7)


def test_vp8l_lz77_cache_transform():
    """VP8L wild-file paths (VERDICT r6 item 3): LZ77 backreferences
    through the 120-entry distance map (incl. overlapping copies),
    color-cache hits at every legal width, and the subtract-green
    transform — all round-tripping bit-exactly against the literal
    encoder's ground truth."""
    import numpy as np

    from audios_to_dataset_spark.functions.vp8l import (
        _DIST_MAP,
        decode_vp8l_pixels,
        encode_vp8l_lz77,
        synth_tiled_webp,
    )

    # spec table sanity: 120 entries, prefix pinned, no duplicates
    assert len(_DIST_MAP) == len(set(_DIST_MAP)) == 120
    assert _DIST_MAP[:8] == (
        (0, 1), (1, 0), (1, 1), (-1, 1),
        (0, 2), (2, 0), (1, 2), (-1, 2),
    )
    assert all(
        -8 <= x <= 8 and 0 <= y <= 8 and (y > 0 or x > 0)
        for x, y in _DIST_MAP
    )

    rng = np.random.RandomState(11)
    # tiled content -> real backrefs (row distance w maps to code 1)
    tile = rng.randint(0, 256, (3, 4, 3), dtype=np.uint8)
    px = np.tile(tile, (4, 5, 1))
    for sg in (False, True):
        for cb in (1, 4, 11):
            data = encode_vp8l_lz77(px, cache_bits=cb, subtract_green=sg)
            got = decode_vp8l_pixels(data)
            assert got is not None and np.array_equal(got, px), (sg, cb)
    # constant image: one literal + overlapping distance-1 copies
    const = np.full((9, 13, 3), 200, dtype=np.uint8)
    got = decode_vp8l_pixels(encode_vp8l_lz77(const))
    assert got is not None and np.array_equal(got, const)
    # random content still round-trips (cache hits, few/no backrefs)
    px = rng.randint(0, 256, (6, 7, 3), dtype=np.uint8)
    got = decode_vp8l_pixels(encode_vp8l_lz77(px, subtract_green=True))
    assert got is not None and np.array_equal(got, px)
    # fixture: deterministic, decodes to the md5 tile formula
    import hashlib

    d = 5
    t = decode_vp8l_pixels(synth_tiled_webp(d))
    assert t is not None and t.shape == (8 + d % 5, 10 + d % 7, 3)
    v = int(hashlib.md5(f"wz:{d}:1:2".encode()).hexdigest()[:2], 16)
    assert (t[2, 1] == v).all()
    assert synth_tiled_webp(d) == synth_tiled_webp(d)


def test_vp8l_predictor_palette_transforms():
    """VP8L predictor + color-indexing transforms: all 14 modes via the
    (bx+by)%14 grid, every index-bundling width (1/2/4/8 bpp), delta
    table accumulation, and exact round-trips for smooth, random, and
    paletted content."""
    import numpy as np

    from audios_to_dataset_spark.functions.vp8l import (
        decode_vp8l_pixels,
        encode_vp8l_palette,
        encode_vp8l_predictor,
        synth_palette_webp,
        synth_predictor_webp,
    )

    rng = np.random.RandomState(13)
    # predictor over a smooth gradient (predictor-friendly) and noise
    h, w = 20, 30
    grad = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            grad[y, x] = ((x * 3 + y) % 256, (x + 2 * y) % 256,
                          (5 * y + 2 * x) % 256)
    for sb in (2, 3, 4):
        out = decode_vp8l_pixels(encode_vp8l_predictor(grad, size_bits=sb))
        assert out is not None and np.array_equal(out, grad), sb
    noise = rng.randint(0, 256, (13, 17, 3), dtype=np.uint8)
    out = decode_vp8l_pixels(encode_vp8l_predictor(noise))
    assert out is not None and np.array_equal(out, noise)
    # palette at every packing width + the 256-color boundary
    for ncolors in (1, 2, 4, 16, 17, 256):
        colors = rng.randint(0, 256, (ncolors, 3))
        img = colors[rng.randint(0, ncolors, (9, 21))].astype(np.uint8)
        for cb in (0, 3):
            out = decode_vp8l_pixels(encode_vp8l_palette(img, cache_bits=cb))
            assert out is not None and np.array_equal(out, img), (
                ncolors, cb,
            )
    with __import__("pytest").raises(ValueError, match="palette"):
        encode_vp8l_palette(
            rng.randint(0, 256, (30, 30, 3)).astype(np.uint8)
        )
    # fixtures decode and are deterministic
    assert synth_palette_webp(9) == synth_palette_webp(9)
    assert synth_predictor_webp(9) == synth_predictor_webp(9)
    assert decode_vp8l_pixels(synth_palette_webp(3)) is not None
    assert decode_vp8l_pixels(synth_predictor_webp(3)) is not None
    # color (cross-component) transform: all four transforms now decode
    from audios_to_dataset_spark.functions.vp8l import (
        encode_vp8l_color_transform,
        synth_color_webp,
    )

    px = rng.randint(0, 256, (18, 25, 3), dtype=np.uint8)
    for sb in (2, 4):
        out = decode_vp8l_pixels(
            encode_vp8l_color_transform(px, size_bits=sb)
        )
        assert out is not None and np.array_equal(out, px), sb
    assert synth_color_webp(7) == synth_color_webp(7)
    assert decode_vp8l_pixels(synth_color_webp(7)) is not None
    # meta prefix codes: two groups, backrefs crossing group borders
    from audios_to_dataset_spark.functions.vp8l import (
        encode_vp8l_meta,
        synth_meta_webp,
    )

    for mb in (2, 4):
        for sg in (False, True):
            q = rng.randint(0, 256, (15, 22, 3), dtype=np.uint8)
            out = decode_vp8l_pixels(
                encode_vp8l_meta(q, meta_bits=mb, subtract_green=sg)
            )
            assert out is not None and np.array_equal(out, q), (mb, sg)
    tiled = np.tile(rng.randint(0, 256, (3, 4, 3), dtype=np.uint8),
                    (6, 7, 1))
    out = decode_vp8l_pixels(encode_vp8l_meta(tiled, meta_bits=2))
    assert out is not None and np.array_equal(out, tiled)
    assert synth_meta_webp(6) == synth_meta_webp(6)
    assert decode_vp8l_pixels(synth_meta_webp(6)) is not None


def test_webp_exif_scrub():
    """VP8X metadata scrub: EXIF/XMP chunks removed (incl. the RIFF
    odd-size padding), flag bits cleared, image bytes untouched,
    idempotent; plain containers pass through; junk → None."""
    import numpy as np

    from audios_to_dataset_spark.functions.vp8l import (
        decode_vp8l_pixels,
        encode_vp8l_lz77,
        encode_webp_with_exif,
        extract_webp_still,
        scrub_webp_metadata,
        synth_exif_webp,
    )

    rng = np.random.RandomState(19)
    px = rng.randint(0, 256, (6, 9, 3), dtype=np.uint8)
    for exif_len in (21, 22):  # odd exercises the padding rule
        data = encode_webp_with_exif(px, b"II*\x00" + bytes(exif_len - 4))
        scrubbed, had = scrub_webp_metadata(data)
        assert had
        assert len(data) - len(scrubbed) == 8 + exif_len + (exif_len & 1)
        s2, had2 = scrub_webp_metadata(scrubbed)
        assert not had2 and s2 == scrubbed
        out = decode_vp8l_pixels(extract_webp_still(scrubbed))
        assert out is not None and np.array_equal(out, px)
        # VP8X EXIF/XMP flag bits cleared
        assert scrubbed[20] & 0x0C == 0
    plain = encode_vp8l_lz77(px)
    assert scrub_webp_metadata(plain) == (plain, False)
    assert scrub_webp_metadata(b"junk") is None
    assert synth_exif_webp(5) == synth_exif_webp(5)


def test_webp_animation_compositing():
    """Animated WebP (VP8X/ANIM/ANMF): the x2 offset rule, background
    init, overwrite compositing, and dispose-to-background — verified
    pixel-exact against a hand-built expectation."""
    import numpy as np

    from audios_to_dataset_spark.functions.vp8l import (
        decode_webp_anim_frames,
        encode_webp_anim,
        synth_anim_webp,
    )

    rng = np.random.RandomState(17)
    full = rng.randint(0, 256, (10, 14, 3), dtype=np.uint8)
    p1 = rng.randint(0, 256, (4, 6, 3), dtype=np.uint8)
    data = encode_webp_anim(
        (14, 10), (9, 9, 9),
        [(0, 0, full, False), (4, 2, p1, True), (8, 4, p1, False)],
    )
    frames = decode_webp_anim_frames(data)
    assert frames is not None and len(frames) == 3
    assert np.array_equal(frames[0], full)
    want1 = full.copy()
    want1[2:6, 4:10] = p1
    assert np.array_equal(frames[1], want1)
    want2 = full.copy()
    want2[2:6, 4:10] = (9, 9, 9)  # disposed to background
    want2[4:8, 8:14] = p1
    assert np.array_equal(frames[2], want2)
    # odd offsets are unrepresentable (stored /2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="even"):
        encode_webp_anim((14, 10), (0, 0, 0), [(1, 0, p1, False)])
    # still images / junk return None
    assert decode_webp_anim_frames(b"RIFFxxxxWEBP") is None
    assert decode_webp_anim_frames(None) is None
    assert synth_anim_webp(4) == synth_anim_webp(4)


def test_qoi_codec():
    """QOI (qoiformat.org 1.0): exact round-trips for RGB and RGBA
    incl. long runs and index hits, fixture op coverage (one image
    exercises RUN/INDEX/DIFF/LUMA/RGB), and malformed rejection."""
    import numpy as np

    from audios_to_dataset_spark.functions.qoi import (
        decode_qoi_pixels,
        encode_qoi,
        synth_qoi,
    )

    rng = np.random.RandomState(9)
    px3 = rng.randint(0, 256, (5, 11, 3), dtype=np.uint8)
    px4 = rng.randint(0, 256, (4, 7, 4), dtype=np.uint8)
    px3[2, :] = px3[2, 0]  # in-row run
    px4[:, 3] = px4[0, 3]  # cross-row repeats -> index hits
    for px in (px3, px4):
        got = decode_qoi_pixels(encode_qoi(px))
        assert got is not None and np.array_equal(got, px)
    # a 200-px constant image forces the 62-run split path
    const = np.full((10, 20, 3), 77, dtype=np.uint8)
    got = decode_qoi_pixels(encode_qoi(const))
    assert got is not None and np.array_equal(got, const)
    # fixture: every opcode family present in one stream
    b = synth_qoi(7)
    ops = set()
    pos, end = 14, len(b) - 8
    while pos < end:
        t = b[pos]
        if t == 0xFE:
            ops.add("rgb")
            pos += 4
        elif t == 0xFF:
            ops.add("rgba")
            pos += 5
        elif t >> 6 == 0:
            ops.add("index")
            pos += 1
        elif t >> 6 == 1:
            ops.add("diff")
            pos += 1
        elif t >> 6 == 2:
            ops.add("luma")
            pos += 2
        else:
            ops.add("run")
            pos += 1
    assert {"run", "index", "diff", "luma", "rgb"} <= ops
    # malformed: bad magic, zero dims, run past pixel count, missing
    # end marker, stream that runs dry
    assert decode_qoi_pixels(None) is None
    assert decode_qoi_pixels(b"qoix" + b[4:]) is None
    zero = b[:4] + b"\x00\x00\x00\x00" + b[8:]
    assert decode_qoi_pixels(zero) is None
    assert decode_qoi_pixels(b[:-1]) is None
    assert decode_qoi_pixels(b[:20]) is None


def test_jpeg_metadata_scrub():
    """strip_jpeg_metadata removes APP1/COM exactly (byte-identical to
    the pre-injection stream), preserves pixels, and is total on
    malformed/truncated input."""
    import numpy as np

    from audios_to_dataset_spark.functions.jpeg import (
        decode_jpeg_pixels,
        strip_jpeg_metadata,
        synth_gray_jpeg,
        synth_jpeg_with_exif,
    )

    for i in (0, 1, 7, 12):
        withmeta = synth_jpeg_with_exif(i)
        base = synth_gray_jpeg(i)
        got = strip_jpeg_metadata(withmeta)
        assert got is not None
        scrubbed, removed = got
        assert scrubbed == base
        assert removed == 60 + i % 40 + (22 if i % 2 == 0 else 0)
        assert np.array_equal(
            decode_jpeg_pixels(scrubbed), decode_jpeg_pixels(withmeta)
        )
    # a clean stream loses nothing
    got = strip_jpeg_metadata(synth_gray_jpeg(5))
    assert got is not None and got[1] == 0
    # totality: truncations, bad SOI, segment overrun
    b = synth_jpeg_with_exif(3)
    for cut in range(0, len(b)):
        r = strip_jpeg_metadata(b[:cut])
        assert r is None or isinstance(r[0], bytes)
    assert strip_jpeg_metadata(b"\x00" + b[1:]) is None
    assert strip_jpeg_metadata(b"\xff\xd8\xff\xe1\xff\xff") is None
    assert strip_jpeg_metadata(None) is None


def test_gif_animation_compositing():
    """decode_gif_frames: canvas persistence (disposal 1), restore-to-
    background (disposal 2), patch offsets, and totality."""
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_gif_frames,
        decode_gif_pixels,
        encode_gif_animation,
        synth_gray_gif_anim,
    )

    base = np.full((6, 8), 50, dtype=np.uint8)
    patch = np.full((2, 3), 200, dtype=np.uint8)
    b = encode_gif_animation(
        (8, 6), [(0, 0, base, 1), (2, 1, patch, 2), (5, 3, patch, 1)]
    )
    frames = decode_gif_frames(b)
    assert frames is not None and len(frames) == 3
    assert (frames[0] == 50).all()
    # frame 1: patch drawn over the persistent canvas
    assert (frames[1][1:3, 2:5] == 200).all()
    assert frames[1][0, 0] == 50
    # frame 2: patch-1 region restored to background (palette[0] = 0),
    # new patch at (5,3), untouched canvas survives
    assert (frames[2][1:3, 2:5] == 0).all()
    assert (frames[2][3:5, 5:8] == 200).all()
    assert frames[2][0, 0] == 50
    # the single-frame decoder still reads frame 0
    assert decode_gif_pixels(b) is not None
    # fixture shape
    fs = decode_gif_frames(synth_gray_gif_anim(9))
    assert fs is not None and len(fs) == 3
    assert fs[0].shape == (10 + 9 % 5, 12 + 9 % 7)
    # malformed: truncation anywhere -> None or valid frames, never a
    # raise; out-of-canvas patch rejected
    for cut in range(0, len(b), 7):
        r = decode_gif_frames(b[:cut])
        assert r is None or isinstance(r, list)
    bad = encode_gif_animation((8, 6), [(7, 5, patch, 1)])
    assert decode_gif_frames(bad) is None
    assert decode_gif_frames(None) is None


def test_vp8l_pixel_count_cap():
    """ADVICE r7: a crafted ~30-byte VP8L header can declare
    16384x16384 (14-bit dims) and LZ77 backrefs would expand it to a
    268M-entry list; dims whose product exceeds 2^26 must be refused
    up front (same cap as the VP8X canvas path), in microseconds."""
    import struct
    import time

    from audios_to_dataset_spark.functions.vp8l import decode_vp8l_pixels

    bits = 0x2F.to_bytes(1, "little")
    # 14-bit w-1 = 16383, 14-bit h-1 = 16383, alpha 0, version 000
    payload = bits + struct.pack("<I", (16383) | (16383 << 14))
    blob = (
        b"RIFF" + struct.pack("<I", 12 + 8 + len(payload)) + b"WEBP"
        + b"VP8L" + struct.pack("<I", len(payload)) + payload
        + b"\x00" * 8
    )
    t0 = time.perf_counter()
    assert decode_vp8l_pixels(blob) is None
    assert time.perf_counter() - t0 < 0.1  # refused before any decode
    # boundary: 8192x8192 == 2^26 exactly is still allowed through the
    # cap (it then fails structurally later, which is fine)
    payload_ok = bits + struct.pack("<I", (8191) | (8191 << 14))
    blob_ok = (
        b"RIFF" + struct.pack("<I", 12 + 8 + len(payload_ok)) + b"WEBP"
        + b"VP8L" + struct.pack("<I", len(payload_ok)) + payload_ok
        + b"\x00" * 8
    )
    assert decode_vp8l_pixels(blob_ok) is None  # truncated, not capped


def test_pnm_p4_bitmap_decodes():
    """P4 packed-bitmap branch (round 9): MSB-first rows padded to
    whole bytes, 1 = black; header has NO maxval token."""
    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_pnm_pixels,
        parse_image_header,
    )

    # 10x2: rows need 2 bytes each, last 6 bits of byte 2 are padding
    # row0 = 1010101010, row1 = 0000000011
    blob = b"P4\n10 2\n" + bytes([0b10101010, 0b10000000,
                                  0b00000000, 0b11000000])
    px = decode_pnm_pixels(blob)
    assert px is not None and px.shape == (2, 10, 3)
    assert px[0, :, 0].tolist() == [0, 255] * 5
    assert px[1, :, 0].tolist() == [255] * 8 + [0, 0]
    assert np.array_equal(px[:, :, 0], px[:, :, 2])
    assert parse_image_header(blob) == ("pbm", 10, 2)
    # truncated raster and zero dims still reject
    assert decode_pnm_pixels(b"P4\n10 2\n" + bytes(3)) is None
    assert decode_pnm_pixels(b"P4\n0 2\n") is None


def test_tiff_rgba_extrasamples_drops_alpha():
    """spp=4 branch (round 9): RGBA chunky uncompressed TIFF decodes
    with the alpha plane dropped — hand-built IFD, both byte orders."""
    import struct

    import numpy as np

    from audios_to_dataset_spark.functions.multimodal import (
        decode_tiff_pixels,
    )

    rng = np.random.RandomState(9)
    rgba = rng.randint(0, 256, (3, 5, 4), dtype=np.uint8)
    for e, magic in (("<", b"II*\x00"), (">", b"MM\x00*")):
        raster = rgba.tobytes()
        # layout: magic+ifd_off(8) | raster | bps array | IFD
        bps_off = 8 + len(raster)
        ifd_off = bps_off + 8
        entries = [
            (256, 3, 1, 5), (257, 3, 1, 3), (258, 3, 4, bps_off),
            (259, 3, 1, 1), (262, 3, 1, 2), (273, 4, 1, 8),
            (277, 3, 1, 4), (278, 3, 1, 3), (279, 4, 1, len(raster)),
            (338, 3, 1, 2),  # ExtraSamples: unassociated alpha
        ]
        blob = magic + struct.pack(e + "I", ifd_off) + raster
        blob += struct.pack(e + "HHHH", 8, 8, 8, 8)
        blob += struct.pack(e + "H", len(entries))
        for tag, typ, cnt, val in entries:
            if typ == 3 and cnt == 1:
                blob += struct.pack(e + "HHIHH", tag, typ, cnt, val, 0)
            else:
                blob += struct.pack(e + "HHII", tag, typ, cnt, val)
        blob += struct.pack(e + "I", 0)
        px = decode_tiff_pixels(blob)
        assert px is not None and px.shape == (3, 5, 3), e
        assert np.array_equal(px, rgba[:, :, :3]), e
