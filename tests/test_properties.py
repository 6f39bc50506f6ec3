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


def _py_buckets(vectors, tables):
    """Python replay of multitable_buckets' sign-bit hash (same
    left-to-right double fold as operators.similarity._dot)."""
    out = []
    for vid, v in enumerate(vectors):
        for t, planes in enumerate(tables):
            bits = ""
            for plane in planes:
                acc = 0.0
                for x, p in zip(v, plane):
                    acc += float(x) * p
                bits += "1" if acc >= 0 else "0"
            out.append((vid, f"{t}:{bits}"))
    return out


def _expected_candidates(buckets):
    """Directed distinct candidate pairs + the sum-of-bucket^2 budget."""
    from collections import defaultdict

    members = defaultdict(list)
    for vid, b in buckets:
        members[b].append(vid)
    pairs = set()
    budget = 0
    for ids in members.values():
        budget += len(ids) * (len(ids) - 1)
        for a in ids:
            for b in ids:
                if a != b:
                    pairs.add((a, b))
    return pairs, budget


@given(
    st.lists(
        st.lists(
            st.integers(min_value=-5, max_value=5), min_size=4, max_size=4
        ),
        min_size=2,
        max_size=14,
    )
)
@settings(max_examples=10, deadline=None)
def test_knn_graph_candidate_budget(spark, vectors):
    """VERDICT r4 item 5: the knn_graph candidate set must equal the
    per-table bucket self-join replayed in python, and stay within the
    sum-of-bucket^2 budget — a future plane-count change that silently
    explodes candidates fails here. k is set above any possible degree
    so every surviving candidate pair is observable in the output."""
    from audios_to_dataset_spark.operators.similarity import knn_graph
    from audios_to_dataset_spark.plans.dedup import _make_planes

    tables = _make_planes(n_tables=2, n_planes=2, dim=4, seed=5)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.src, r.dst)
        for r in knn_graph(df, tables, k=10**6).collect()
    }
    expected, budget = _expected_candidates(
        _py_buckets(vectors, tables)
    )
    # zero-norm vectors have no defined cosine: the operator drops them
    # (instead of DIVIDE_BY_ZERO under ANSI) — mirror that here
    nonzero = {i for i, v in enumerate(vectors) if any(x != 0 for x in v)}
    expected = {(a, b) for a, b in expected
                if a in nonzero and b in nonzero}
    assert got == expected
    assert len(got) <= budget <= len(tables) * len(vectors) ** 2


def test_knn_graph_pathological_identical_vectors(spark):
    """All vectors identical -> one bucket per table; the candidate set
    must collapse to exactly n(n-1) directed pairs (cross-table dedup),
    pinned against the REAL auto-scaled KNN plane config."""
    from audios_to_dataset_spark.operators.similarity import knn_graph
    from audios_to_dataset_spark.plans.dedup import EMB_DIM, knn_planes

    n = 12
    v = [1.0] * EMB_DIM
    df = spark.createDataFrame(
        [(i, v) for i in range(n)], "vec_id long, embedding array<double>"
    )
    planes = knn_planes(n)
    assert len(planes) == 8 and all(len(t) == 4 for t in planes)
    cand = knn_graph(df, planes, k=10**6).count()
    assert cand == n * (n - 1)


def test_knn_planes_autoscale_rule():
    """The plane-count dial is a deterministic integer function of N:
    matches the hand-tuned r5 value (5) at sf0.1's N=2000, reaches 9 at
    the x10 smoke's N=20000, clamps to [4, 12], is monotone, and every
    plane set is a prefix of the single seeded 12-plane family (the
    property that lets the DuckDB oracle mirror it with substr)."""
    from audios_to_dataset_spark.plans.dedup import (
        KNN_PLANES_FULL,
        knn_n_planes,
        knn_planes,
    )

    assert knn_n_planes(0) == 4
    assert knn_n_planes(500) == 4      # sf0.001 / sf0.01
    assert knn_n_planes(2000) == 5     # sf0.1 — the hand-tuned value
    assert knn_n_planes(20000) == 9    # x10 smoke — the measured twin
    assert knn_n_planes(10**12) == 12  # hard cap
    prev = 0
    for n in (1, 10, 100, 1000, 10**4, 10**5, 10**6):
        p = knn_n_planes(n)
        assert p >= prev
        prev = p
        assert knn_planes(n) == [t[:p] for t in KNN_PLANES_FULL]
    # avg bucket bound: 2^P * 64 >= N whenever the cap isn't binding
    for n in (100, 999, 4096, 65536, 10**5):
        p = knn_n_planes(n)
        if p < 12:
            assert (1 << p) * 64 >= n
        if p > 4:
            assert (1 << (p - 1)) * 64 < n


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
    # the WebP container surface added in r7: anim frames, metadata
    # scrub, still extraction — same never-raise contract
    from audios_to_dataset_spark.functions.vp8l import (
        decode_webp_anim_frames,
        extract_webp_still,
        scrub_webp_metadata,
    )

    af = decode_webp_anim_frames(data)
    assert af is None or all(f.ndim == 3 for f in af)
    sc = scrub_webp_metadata(data)
    assert sc is None or isinstance(sc[1], bool)
    still = extract_webp_still(data)
    assert still is None or still[:4] == b"RIFF"


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

    from audios_to_dataset_spark.functions.jpeg import decode_jpeg_pixels

    for out in (
        decode_bmp_pixels(b"BM" + data),
        decode_png_pixels(b"\x89PNG\r\n\x1a\n" + data),
        decode_gif_pixels(b"GIF89a" + data),
        decode_jpeg_pixels(b"\xff\xd8" + data),
    ):
        assert out is None or out.ndim == 3
    frames = decode_avi_frames(b"RIFF\xff\xff\x00\x00AVI " + data)
    assert frames is None or all(f.ndim == 3 for f in frames)


@given(st.binary(max_size=4096))
@settings(max_examples=200, deadline=None)
def test_jpeg_decoder_total_on_garbage(data):
    """decode_jpeg_pixels never throws on arbitrary bytes — returns a
    well-formed RGB array or None (the skip-with-fallback contract)."""
    from audios_to_dataset_spark.functions.jpeg import decode_jpeg_pixels

    px = decode_jpeg_pixels(data)
    assert px is None or (px.ndim == 3 and px.shape[2] == 3)


@given(st.binary(min_size=0, max_size=256), st.integers(0, 400))
@settings(max_examples=200, deadline=None)
def test_jpeg_decoder_corrupt_tail_and_truncation(tail, cut):
    """A valid progressive JPEG with truncated scans or appended garbage
    never throws; truncation mid-scan returns None or a decode of the
    scans that survived (both acceptable under skip-with-fallback)."""
    from audios_to_dataset_spark.functions.jpeg import (
        decode_jpeg_pixels,
        synth_gray_jpeg_progressive,
    )

    base = synth_gray_jpeg_progressive(7)
    px = decode_jpeg_pixels(base[: max(2, len(base) - cut)] + tail)
    assert px is None or (px.ndim == 3 and px.shape[2] == 3)


@given(st.binary(max_size=2048))
@settings(max_examples=300, deadline=None)
def test_new_decoders_total_on_garbage(data):
    """ICO / Netpbm / FLAC decoders never raise on arbitrary bytes —
    None or a well-shaped result, the repo-wide fallback contract."""
    from audios_to_dataset_spark.functions.flac import decode_flac
    from audios_to_dataset_spark.functions.multimodal import (
        decode_ico_pixels,
        decode_pnm_pixels,
    )

    px = decode_ico_pixels(data)
    assert px is None or (px.ndim == 3 and px.shape[2] == 3)
    px = decode_pnm_pixels(data)
    assert px is None or (px.ndim == 3 and px.shape[2] == 3)
    out = decode_flac(data)
    assert out is None or (out[0] > 0 and out[1].ndim == 1)


@given(st.binary(max_size=96), st.integers(min_value=0, max_value=400))
@settings(max_examples=200, deadline=None)
def test_flac_truncation_and_tail_garbage(tail, cut):
    """A valid FLAC stream truncated anywhere, or with garbage
    appended, decodes to None or to the exact original samples — the
    CRCs and the total-sample gate admit no third outcome."""
    import numpy as np

    from audios_to_dataset_spark.functions.flac import (
        decode_flac,
        synth_flac_md5,
    )

    base = synth_flac_md5(11)
    ref = decode_flac(base)
    assert ref is not None
    mangled = base[: max(4, len(base) - cut)] + tail
    out = decode_flac(mangled)
    assert out is None or (
        out[0] == ref[0] and np.array_equal(out[1], ref[1])
    )


@given(st.binary(max_size=2048), st.integers(min_value=0, max_value=300))
@settings(max_examples=250, deadline=None)
def test_qoi_total_and_truncation(tail, cut):
    """QOI decoder totality: arbitrary bytes never raise, pure
    truncation decodes to None or the exact original (the stream
    runs dry / the end marker is gone), and appended garbage is
    rejected by the end-marker check. QOI has no CRC, so unlike the
    FLAC twin a crafted tail COULD complete a different valid image —
    the shape contract is all a decoder can promise there."""
    import numpy as np

    from audios_to_dataset_spark.functions.qoi import (
        decode_qoi_pixels,
        synth_qoi,
    )

    out = decode_qoi_pixels(tail)
    assert out is None or (out.ndim == 3 and out.shape[2] in (3, 4))
    base = synth_qoi(13)
    ref = decode_qoi_pixels(base)
    assert ref is not None
    truncated = decode_qoi_pixels(base[: len(base) - cut])
    assert truncated is None or np.array_equal(truncated, ref)
    if tail:
        assert decode_qoi_pixels(base + tail) is None


@given(st.binary(max_size=2048))
@settings(max_examples=300, deadline=None)
def test_session4_decoders_total_on_garbage(data):
    """AIFF / AU / animated-GIF / JPEG-scrub are total on arbitrary
    bytes — None or a well-shaped result, never a raise."""
    from audios_to_dataset_spark.functions.audio_headers import (
        decode_aiff_samples,
        decode_au_samples,
    )
    from audios_to_dataset_spark.functions.jpeg import strip_jpeg_metadata
    from audios_to_dataset_spark.functions.multimodal import (
        decode_gif_frames,
    )

    for dec in (decode_aiff_samples, decode_au_samples):
        out = dec(data)
        assert out is None or (out[0] > 0 and out[1].ndim == 1)
    fs = decode_gif_frames(data)
    assert fs is None or (len(fs) >= 1 and fs[0].ndim == 2)
    sc = strip_jpeg_metadata(data)
    assert sc is None or (isinstance(sc[0], bytes) and sc[1] >= 0)


@given(st.integers(min_value=0, max_value=200), st.integers(0, 400))
@settings(max_examples=120, deadline=None)
def test_aiff_au_truncation(doc_id, cut):
    """A valid AIFF/AU stream truncated anywhere decodes to None or
    the exact original samples (COMM/SSND and header size gates admit
    no third outcome at fixture scale)."""
    import numpy as np

    from audios_to_dataset_spark.functions.audio_headers import (
        decode_aiff_samples,
        decode_au_samples,
        synth_aiff_md5,
        synth_au_md5,
    )

    for synth, dec in (
        (synth_aiff_md5, decode_aiff_samples),
        (synth_au_md5, decode_au_samples),
    ):
        base = synth(doc_id)
        ref = dec(base)
        assert ref is not None
        out = dec(base[: max(0, len(base) - cut)])
        assert out is None or (
            out[0] == ref[0] and np.array_equal(out[1], ref[1])
        )
