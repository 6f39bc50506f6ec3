"""Ogg page walk: CRC pinned against an independent bitwise
implementation, fixture invariants, and the never-raise contract.

The table-driven CRC in functions/audio_headers.py is derived from the
RFC 3533 §6 polynomial; the test-side twin below does MSB-first long
division bit by bit in a deliberately different style, so a transcription
error in either cannot cancel out (the VP8L distance-map lesson)."""

from __future__ import annotations

from audios_to_dataset_spark.functions.audio_headers import (
    OGG_SEGS_PER_PAGE,
    ogg_page_crc,
    parse_ogg_pages,
    synth_ogg_stream,
)


def _crc_bitwise(data: bytes) -> int:
    """Long division: shift the 33-bit polynomial over the message,
    MSB first, init 0, no reflection, no final xor."""
    reg = 0
    for byte in data:
        for k in range(7, -1, -1):
            bit = (byte >> k) & 1
            top = (reg >> 31) & 1
            reg = ((reg << 1) | bit) & 0xFFFFFFFF
            if top:
                reg ^= 0x04C11DB7
    # flush 32 zero bits (standard non-augmented table CRCs do this
    # implicitly; the bitwise register form needs it explicitly)
    for _ in range(32):
        top = (reg >> 31) & 1
        reg = (reg << 1) & 0xFFFFFFFF
        if top:
            reg ^= 0x04C11DB7
    return reg


def test_crc_matches_independent_bitwise():
    cases = [
        b"",
        b"123456789",
        b"OggS\x00\x02" + bytes(range(40)),
        bytes(251 * i % 256 for i in range(1000)),
    ]
    for c in cases:
        assert ogg_page_crc(c) == _crc_bitwise(c), c[:16]


def test_fixture_invariants_hold():
    for d in range(60):
        s = synth_ogg_stream(d)
        pages, packets, gran, ok = parse_ogg_pages(s)
        assert pages == 3 + d % 4
        assert packets == OGG_SEGS_PER_PAGE * pages - 3
        assert gran == 10_000 + d % 777
        assert ok


def test_fixture_exercises_all_lacing_regimes():
    s = synth_ogg_stream(1)
    # page 1 must carry the continuation flag (the 610+ byte packet
    # spans the page-0/page-1 boundary by construction)
    second = s.index(b"OggS", 4)
    assert s[second + 5] & 0x01
    # page 0 is BOS and not continued
    assert s[5] & 0x02 and not (s[5] & 0x01)
    # a zero lacing value exists (exact-255-byte packet terminator)
    nsegs0 = s[26]
    lacings = []
    pos = 0
    for _ in range(parse_ogg_pages(s)[0]):
        n = s[pos + 26]
        lacings += list(s[pos + 27 : pos + 27 + n])
        pos += 27 + n + sum(s[pos + 27 : pos + 27 + n])
    assert 0 in lacings and 255 in lacings
    assert nsegs0 == OGG_SEGS_PER_PAGE


def test_corruption_flips_crc_only():
    s = bytearray(synth_ogg_stream(5))
    # flip one payload byte of page 0 (after the 27+5 byte header)
    s[35] ^= 0x40
    pages, packets, gran, ok = parse_ogg_pages(bytes(s))
    assert not ok
    assert pages == 3 + 5 % 4  # structure still walks


def test_never_raises_on_mutation_or_truncation():
    base = synth_ogg_stream(9)
    for cut in range(0, len(base), 11):
        parse_ogg_pages(base[:cut])
    for i in range(0, len(base), 13):
        m = bytearray(base)
        m[i] ^= 0xA5
        pages, packets, gran, ok = parse_ogg_pages(bytes(m))
        assert pages >= 0 and packets >= 0
    assert parse_ogg_pages(None) == (0, 0, 0, False)
    assert parse_ogg_pages(b"") == (0, 0, 0, False)
    assert parse_ogg_pages(b"OggS") == (0, 0, 0, False)
