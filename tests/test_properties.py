"""Property-based tests (hypothesis) for the pure kernels — the reference
has no randomized testing (SURVEY §5); these harden the parsers that face
arbitrary bytes in production."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from audios_to_dataset_spark.functions.multimodal import parse_image_header
from audios_to_dataset_spark.functions.wav import parse_wav_header, synth_wav


@given(st.binary(max_size=2048))
@settings(max_examples=300, deadline=None)
def test_wav_parser_total_on_garbage(data):
    # never throws; failure contract is exactly (0.0, 0)
    duration, sr = parse_wav_header(data)
    assert duration >= 0.0
    assert sr >= 0
    if sr == 0:
        assert duration == 0.0


@given(st.binary(max_size=2048))
@settings(max_examples=300, deadline=None)
def test_image_parser_total_on_garbage(data):
    fmt, w, h = parse_image_header(data)
    assert (fmt is None) == (w == 0 and h == 0) or fmt is not None
    assert w >= 0 and h >= 0


@given(
    rate=st.sampled_from([8_000, 16_000, 22_050, 44_100, 48_000]),
    n=st.integers(min_value=0, max_value=50_000),
    channels=st.integers(min_value=1, max_value=2),
)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_duration(rate, n, channels):
    duration, sr = parse_wav_header(
        synth_wav(sample_rate=rate, n_samples=n, channels=channels)
    )
    assert sr == rate
    assert abs(duration - n / rate) < 1e-9


@given(st.binary(min_size=0, max_size=64))
@settings(max_examples=200, deadline=None)
def test_wav_parser_prefix_safety(data):
    # a valid header with arbitrary tail bytes never crashes
    base = synth_wav(sample_rate=8_000, n_samples=100)
    duration, sr = parse_wav_header(base + data)
    assert sr in (0, 8_000)


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=200, deadline=None)
def test_fake_embedding_deterministic(s):
    from audios_to_dataset_spark.functions.multimodal import fake_embedding

    b = s.encode()
    assert fake_embedding(b, 8) == fake_embedding(b, 8)
    assert len(fake_embedding(b, 8)) == 8


@given(st.binary(max_size=4096), st.floats(min_value=0.05, max_value=2.0))
@settings(max_examples=200, deadline=None)
def test_segmenter_total_and_conservative(data, seg_s):
    """Segmenter never throws on arbitrary bytes; on parseable WAVs the
    segment payloads concatenate back to the original data chunk."""
    from audios_to_dataset_spark.functions.wav import segment_wav_bytes

    segs = segment_wav_bytes(data, seg_s)
    assert isinstance(segs, list)
    for idx, (i, st_s, dur, riff) in enumerate(segs):
        assert i == idx
        assert st_s >= 0.0 and dur > 0.0
        assert riff[:4] == b"RIFF"


@given(
    rate=st.sampled_from([8_000, 16_000]),
    n=st.integers(min_value=1, max_value=40_000),
    seg_s=st.sampled_from([0.1, 0.25, 0.5, 1.0]),
)
@settings(max_examples=50, deadline=None)
def test_segmenter_covers_every_frame(rate, n, seg_s):
    from audios_to_dataset_spark.functions.wav import (
        segment_wav_bytes,
        synth_wav,
    )

    src = synth_wav(rate, n_samples=n)
    segs = segment_wav_bytes(src, seg_s)
    assert b"".join(r[44:] for _, _, _, r in segs) == src[44:]
    assert abs(sum(d for _, _, d, _ in segs) - n / rate) < 1e-9


def _py_spread16(x):
    x &= 0xFFFF
    for s, m in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                 (2, 0x33333333), (1, 0x55555555)):
        x = (x | (x << s)) & m
    return x


@given(st.integers(min_value=0, max_value=0xFFFF),
       st.integers(min_value=0, max_value=0xFFFF))
@settings(max_examples=300, deadline=None)
def test_morton_bijective_and_monotone_blocks(x, y):
    """Morton code de-interleaves back to (x, y) exactly."""
    z = _py_spread16(x) | (_py_spread16(y) << 1)
    rx = ry = 0
    for bit in range(16):
        rx |= ((z >> (2 * bit)) & 1) << bit
        ry |= ((z >> (2 * bit + 1)) & 1) << bit
    assert (rx, ry) == (x, y)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        max_size=12,
    ),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=12, deadline=None)
def test_kcore_matches_python_peel(spark, edge_list, k, rounds):
    """k_core_peel against a literal python replay of synchronous
    peeling on random ≤8-node graphs (self-loops dropped, like the
    operator's distinct-undirected normalization)."""
    from audios_to_dataset_spark.operators.graph import k_core_peel

    edges = {(a, b) for a, b in edge_list if a != b}
    und = {frozenset(e) for e in edges}
    # python replay
    adj: dict[int, set[int]] = {}
    for e in und:
        a, b = tuple(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected: dict[int, int] = {}
    for _ in range(rounds):
        deg = {n: len(ns) for n, ns in adj.items()}
        keep = {n for n, d in deg.items() if d >= k}
        expected = {n: deg[n] for n in keep}
        adj = {
            n: {x for x in ns if x in keep}
            for n, ns in adj.items()
            if n in keep
        }
    if not edges:
        return  # createDataFrame([], schema) path covered elsewhere
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        r.id: r.core_deg
        for r in k_core_peel(df, k=k, rounds=rounds).collect()
    }
    assert got == expected


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_image_decoders_never_raise(data):
    from audios_to_dataset_spark.functions.multimodal import (
        decode_avi_frames,
        decode_bmp_pixels,
        decode_gif_pixels,
        decode_image_pixels,
        decode_png_pixels,
    )

    for fn in (
        decode_bmp_pixels,
        decode_png_pixels,
        decode_gif_pixels,
        decode_image_pixels,
    ):
        out = fn(data)
        assert out is None or out.ndim == 3
    frames = decode_avi_frames(data)
    assert frames is None or all(f.ndim == 3 for f in frames)


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_image_decoders_never_raise_with_magic(data):
    """Adversarial variant: prepend each format's magic so the parsers
    walk deep into malformed chunk structures."""
    from audios_to_dataset_spark.functions.multimodal import (
        decode_avi_frames,
        decode_bmp_pixels,
        decode_gif_pixels,
        decode_png_pixels,
    )

    for out in (
        decode_bmp_pixels(b"BM" + data),
        decode_png_pixels(b"\x89PNG\r\n\x1a\n" + data),
        decode_gif_pixels(b"GIF89a" + data),
    ):
        assert out is None or out.ndim == 3
    frames = decode_avi_frames(b"RIFF\xff\xff\x00\x00AVI " + data)
    assert frames is None or all(f.ndim == 3 for f in frames)
