"""EBML walk: vint decoding pinned against an independent bit-string
implementation, fixture invariants, and the never-raise contract."""

from __future__ import annotations

from audios_to_dataset_spark.functions.audio_headers import (
    _read_vint,
    parse_ebml,
    synth_ebml,
)


def _vint_bits(data: bytes, pos: int, keep_marker: bool):
    """Independent twin: decode by literal bit-string manipulation
    (RFC 8794 §4) instead of arithmetic shifts."""
    if pos >= len(data) or data[pos] == 0:
        return None
    bits = format(data[pos], "08b")
    width = bits.index("1") + 1
    if pos + width > len(data):
        return None
    all_bits = "".join(
        format(b, "08b") for b in data[pos : pos + width]
    )
    if not keep_marker:
        # clear the marker bit (position width-1 in the bit string)
        all_bits = all_bits[: width - 1] + "0" + all_bits[width:]
    return int(all_bits, 2), pos + width


def test_vint_matches_independent_bitstring():
    cases = [
        bytes([0x81]),
        bytes([0x40, 0x02]),
        bytes([0x20, 0x00, 0x03]),
        bytes([0x1A, 0x45, 0xDF, 0xA3]),
        bytes([0x01, 0, 0, 0, 0, 0, 0, 0x42]),
    ]
    for c in cases:
        for keep in (True, False):
            assert _read_vint(c, 0, keep) == _vint_bits(c, 0, keep), (
                c,
                keep,
            )
    # malformed: zero first byte, truncation
    assert _read_vint(b"\x00\x01", 0, True) is None
    assert _read_vint(b"\x40", 0, True) is None


def test_fixture_invariants_hold():
    for d in range(60):
        n, depth, nc, leaf, ok = parse_ebml(synth_ebml(d))
        exp_nc = 1 + d % 5
        assert nc == exp_nc
        assert n == 7 + 3 * exp_nc
        assert depth == 3
        exp_leaf = 16 + exp_nc * 2 + sum(
            20 + (d + 7 * k) % 50 for k in range(exp_nc)
        )
        assert leaf == exp_leaf
        assert ok


def test_never_raises_on_mutation_or_truncation():
    base = synth_ebml(11)
    for cut in range(0, len(base), 7):
        parse_ebml(base[:cut])
    for i in range(0, len(base), 5):
        m = bytearray(base)
        m[i] ^= 0x91
        n, depth, nc, leaf, ok = parse_ebml(bytes(m))
        assert n >= 0 and leaf >= 0
    assert parse_ebml(None) == (0, 0, 0, 0, False)
    assert parse_ebml(b"") == (0, 0, 0, 0, False)
