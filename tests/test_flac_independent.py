"""Independent cross-validation of functions/flac (VERDICT r7 item 3).

The FLAC codec is the one family that both ENCODES and DECODES in a
shipping path (--transcode-flac, pipeline.py) and had no oracle outside
its own fixtures — a mirrored spec bug in encode+decode would pass
every round-trip test. This container has no libFLAC (the ctypes suite
tests/test_flac_libflac.py skips here and runs wherever the system lib
exists), so this module supplies the independence a system library
would, from ground truth that IS available:

1. **Published CRC catalog check values** — CRC-8 (poly 0x07, init 0)
   and CRC-16/UMTS (poly 0x8005, init 0, unreflected) have the public
   check values 0xF4 / 0xFEE8 for the ASCII bytes "123456789"
   (reveng CRC catalogue). The test-side CRCs are table-driven (a
   different construction from flac.py's per-bit loop) and are first
   pinned to those external constants, then used to check real frames.

2. **A from-scratch test-side decoder** written directly from RFC 9639
   field tables, deliberately in a different style (whole-stream bit
   string, cumulative-sum predictor restore) so a shared-assumption
   bug cannot hide: every stream ``encode_flac`` emits must decode to
   the source samples through code that shares nothing with it.

3. **Hand-assembled streams** — frames are built field-by-field in the
   test (explicit bit strings straight from the RFC 9639 layout
   tables) and ``decode_flac`` must recover the intended samples; this
   is the decode-direction twin of (2).

4. **Byte-level goldens** for the container framing (magic, STREAMINFO
   header byte, sync code, blocksize/rate/channel code bytes) checked
   against the spec values typed here as literals.
"""

from __future__ import annotations

import struct

import numpy as np

from audios_to_dataset_spark.functions.flac import (
    decode_flac,
    encode_flac,
    flac_stream_info,
)

# --- 1. table-driven CRCs, pinned to the public catalogue ---------------


def _crc8_table(data: bytes) -> int:
    tbl = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    crc = 0
    for b in data:
        crc = tbl[crc ^ b]
    return crc


def _crc16_table(data: bytes) -> int:
    tbl = []
    for i in range(256):
        c = i << 8
        for _ in range(8):
            c = (
                ((c << 1) ^ 0x8005) & 0xFFFF
                if c & 0x8000
                else (c << 1) & 0xFFFF
            )
        tbl.append(c)
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ tbl[((crc >> 8) ^ b) & 0xFF]
    return crc


def test_crc_check_values_from_public_catalogue():
    # reveng catalogue: CRC-8 (SMBus) check=0xF4; CRC-16/UMTS (a.k.a.
    # BUYPASS: poly 0x8005, init 0, refin/refout false) check=0xFEE8.
    assert _crc8_table(b"123456789") == 0xF4
    assert _crc16_table(b"123456789") == 0xFEE8


# --- 2. from-scratch RFC 9639 subset decoder -----------------------------


class _Bits:
    """Whole-stream bit cursor over a '0'/'1' string — deliberately a
    different mechanism from flac.py's byte-accumulator reader."""

    def __init__(self, data: bytes) -> None:
        self.s = "".join(f"{b:08b}" for b in data)
        self.i = 0

    def take(self, n: int) -> int:
        v = int(self.s[self.i : self.i + n] or "0", 2)
        if self.i + n > len(self.s):
            raise EOFError
        self.i += n
        return v

    def unary(self) -> int:
        j = self.s.index("1", self.i)
        q = j - self.i
        self.i = j + 1
        return q

    def align(self) -> None:
        self.i = (self.i + 7) // 8 * 8

    def byte_pos(self) -> int:
        assert self.i % 8 == 0
        return self.i // 8


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if bits and v >> (bits - 1) else v


_RFC_BLOCKSIZE = {  # RFC 9639 §9.1.1 table
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
_RFC_RATE = {  # RFC 9639 §9.1.2 table
    0b0001: 88200, 0b0010: 176400, 0b0011: 192000, 0b0100: 8000,
    0b0101: 16000, 0b0110: 22050, 0b0111: 24000, 0b1000: 32000,
    0b1001: 44100, 0b1010: 48000, 0b1011: 96000,
}


def reference_decode(data: bytes):
    """RFC 9639 subset decoder (16-bit, independent channels, fixed
    predictors), sharing no code with functions/flac. Returns
    (rate, interleaved int16 ndarray). Raises on anything malformed —
    a test oracle should be loud, not lenient."""
    assert data[:4] == b"fLaC"
    bits = _Bits(data[4:])
    rate = channels = bps = total = None
    while True:
        last = bits.take(1)
        btype = bits.take(7)
        size = bits.take(24)
        if btype == 0:
            assert size >= 34
            bits.take(16)  # min blocksize
            bits.take(16)  # max blocksize
            bits.take(24)  # min frame size
            bits.take(24)  # max frame size
            rate = bits.take(20)
            channels = bits.take(3) + 1
            bps = bits.take(5) + 1
            total = bits.take(36)
            bits.take(128)  # md5
            bits.take(8 * (size - 34))
        else:
            bits.take(8 * size)
        if last:
            break
    assert rate and channels and bps == 16
    out = []
    got = 0
    while got < total:
        frame_start = bits.byte_pos()
        assert bits.take(14) == 0b11111111111110  # sync
        assert bits.take(1) == 0  # reserved
        assert bits.take(1) == 0  # fixed-blocksize strategy
        bs_code = bits.take(4)
        rate_code = bits.take(4)
        chan_code = bits.take(4)
        assert chan_code == channels - 1  # independent channels
        assert bits.take(3) == 0b100  # 16-bit
        assert bits.take(1) == 0
        # UTF-8-style coded frame number
        b0 = bits.take(8)
        if b0 >= 0x80:
            nb = 8 - len(f"{b0 ^ 0xFF:08b}".lstrip("0"))  # leading ones
            nb = 0
            m = 0x80
            while b0 & m:
                nb += 1
                m >>= 1
            for _ in range(nb - 1):
                cont = bits.take(8)
                assert cont & 0xC0 == 0x80
        if bs_code == 0b0110:
            bs = bits.take(8) + 1
        elif bs_code == 0b0111:
            bs = bits.take(16) + 1
        else:
            bs = _RFC_BLOCKSIZE[bs_code]
        if rate_code == 0b1100:
            bits.take(8)
        elif rate_code in (0b1101, 0b1110):
            bits.take(16)
        elif rate_code != 0:
            assert _RFC_RATE[rate_code] == rate
        crc_at = bits.byte_pos()
        assert _crc8_table(data[4 + frame_start : 4 + crc_at]) == bits.take(8)
        chans = []
        for _c in range(channels):
            assert bits.take(1) == 0
            sub = bits.take(6)
            wasted = 0
            if bits.take(1):
                wasted = bits.unary() + 1
            if sub == 0b000000:  # CONSTANT
                blk = np.full(bs, _signed(bits.take(16), 16), np.int64)
            elif sub == 0b000001:  # VERBATIM
                blk = np.array(
                    [_signed(bits.take(16), 16) for _ in range(bs)],
                    np.int64,
                )
            elif 0b001000 <= sub <= 0b001100:  # FIXED 0-4
                order = sub - 0b001000
                warm = [_signed(bits.take(16), 16) for _ in range(order)]
                method = bits.take(2)
                assert method in (0, 1)
                pbits = 4 if method == 0 else 5
                porder = bits.take(4)
                res: list[int] = []
                for p in range(1 << porder):
                    cnt = (bs >> porder) - (order if p == 0 else 0)
                    k = bits.take(pbits)
                    if k == (1 << pbits) - 1:
                        raw = bits.take(5)
                        res += [
                            _signed(bits.take(raw), raw)
                            for _ in range(cnt)
                        ]
                    else:
                        for _ in range(cnt):
                            u = (bits.unary() << k) | (
                                bits.take(k) if k else 0
                            )
                            res.append((u >> 1) ^ -(u & 1))
                # predictor restore by repeated cumulative sum: an
                # order-n fixed predictor's residual is the n-th
                # difference, so integrate n times; each level's
                # starting value is the last (d-1)-th difference of
                # the warm-up samples
                seq = np.array(res, np.int64)
                warm_arr = np.array(warm, np.int64)
                for d in range(order, 0, -1):
                    start = np.diff(warm_arr, n=d - 1)[-1]
                    seq = start + np.cumsum(seq)
                blk = (
                    np.concatenate([warm_arr, seq]) if order else seq
                )
            else:
                raise AssertionError(f"subframe type {sub:06b} out of subset")
            chans.append(blk << wasted)
        bits.align()
        end = bits.byte_pos()
        assert (
            _crc16_table(data[4 + frame_start : 4 + end]) == bits.take(16)
        )
        frame = (
            np.stack(chans, axis=1).reshape(-1)
            if channels > 1
            else chans[0]
        )
        out.append(frame)
        got += bs
    samples = np.concatenate(out) if out else np.empty(0, np.int64)
    assert samples.size >= total * channels
    samples = samples[: total * channels]
    assert samples.max(initial=0) <= 0x7FFF
    assert samples.min(initial=0) >= -0x8000
    return rate, samples.astype(np.int16)


def _md5_wave(n: int, prefix: str = "x") -> np.ndarray:
    import hashlib

    return np.array(
        [
            int(hashlib.md5(f"{prefix}:{i}".encode()).hexdigest()[:4], 16)
            - 32768
            for i in range(n)
        ],
        np.int16,
    )


def test_encoder_streams_decode_in_independent_decoder():
    cases = [
        (_md5_wave(97), 44100, 1),          # all subframe types cycle
        (_md5_wave(64), 8000, 1),           # exact multiple of BLOCK
        (np.full(70, -1234, np.int16), 22050, 1),   # all-CONSTANT
        (np.int16([5]), 48000, 1),          # single-sample stream
        (_md5_wave(33), 96000, 1),          # 1 full + 1 runt frame
        (_md5_wave(128, "st"), 16000, 2),   # stereo, interleaved
        (_md5_wave(96, "q"), 32000, 3),     # 3 channels
        # full-amplitude square wave: order-2 residuals overflow the
        # Rice cap and force the 0b1111 raw-escape branch
        (np.where(np.arange(96) % 2 == 0, 32767, -32768).astype(np.int16),
         44100, 1),
    ]
    for samples, sr, ch in cases:
        blob = encode_flac(samples, sr, channels=ch)
        got_rate, got = reference_decode(blob)
        assert got_rate == sr
        assert np.array_equal(got, samples), (sr, ch, samples[:8])
        # and the shipping decoder agrees with the independent one
        ours = decode_flac(blob)
        assert ours is not None
        assert ours[0] == sr and np.array_equal(ours[1], samples)


def test_container_bytes_match_spec_literals():
    samples = _md5_wave(40)
    blob = encode_flac(samples, 44100)
    assert blob[:4] == b"fLaC"                      # §8 magic
    assert blob[4] == 0x80                          # last-block | STREAMINFO
    assert blob[5:8] == b"\x00\x00\x22"             # 34-byte STREAMINFO
    si = blob[8:42]
    assert struct.unpack(">H", si[0:2])[0] == 32    # min blocksize
    assert struct.unpack(">H", si[2:4])[0] == 32    # max blocksize
    rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    assert rate == 44100
    assert ((si[12] >> 1) & 7) + 1 == 1             # channels
    assert (((si[12] & 1) << 4) | (si[13] >> 4)) + 1 == 16  # bps
    # first frame starts right after STREAMINFO
    f = blob[42:]
    assert f[0] == 0xFF and f[1] == 0xF8            # sync + fixed strategy
    assert f[2] == 0x60                             # bs code 0110, rate 0000
    assert f[3] == 0x08                             # 1ch | 16-bit (100) | 0
    assert f[4] == 0x00                             # frame number 0
    assert f[5] == 31                               # blocksize-1 = 32-1
    assert f[6] == _crc8_table(f[:6])               # header CRC


# --- 3. hand-assembled streams the shipping decoder must read -----------


def _bitstr_to_bytes(s: str) -> bytes:
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


def _hand_streaminfo(
    bs: int, rate: int, channels: int, total: int
) -> bytes:
    s = (
        f"{bs:016b}{bs:016b}" + "0" * 24 + "0" * 24
        + f"{rate:020b}{channels - 1:03b}{15:05b}{total:036b}"
        + "0" * 128
    )
    body = _bitstr_to_bytes(s)
    assert len(body) == 34
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + body


def _hand_frame(
    frame_no: int, bs: int, subframe_bits: str, channels: int = 1
) -> bytes:
    # header: sync 11111111111110, reserved 0, fixed strategy 0,
    # blocksize code 0110 (8-bit-1 follows), rate code 0000,
    # channel code, bps 100, reserved 0
    hdr_bits = (
        "11111111111110" + "00" + "0110" + "0000"
        + f"{channels - 1:04b}" + "100" + "0"
    )
    hdr = _bitstr_to_bytes(hdr_bits)
    assert frame_no < 0x80
    hdr += bytes([frame_no, bs - 1])
    hdr += bytes([_crc8_table(hdr)])
    body = _bitstr_to_bytes(subframe_bits)
    frame = hdr + body
    return frame + struct.pack(">H", _crc16_table(frame))


def test_hand_assembled_constant_and_verbatim_decode():
    bs = 8
    # frame 0: CONSTANT -100 (type 000000), no wasted bits
    const_bits = "0" + "000000" + "0" + f"{(-100) & 0xFFFF:016b}"
    # frame 1: VERBATIM 1,-2,3,-4,5,-6,7,-8
    vals = [1, -2, 3, -4, 5, -6, 7, -8]
    verb_bits = "0" + "000001" + "0" + "".join(
        f"{v & 0xFFFF:016b}" for v in vals
    )
    blob = (
        _hand_streaminfo(bs, 44100, 1, 16)
        + _hand_frame(0, bs, const_bits)
        + _hand_frame(1, bs, verb_bits)
    )
    got = decode_flac(blob)
    assert got is not None
    rate, samples = got
    assert rate == 44100
    assert samples.tolist() == [-100] * 8 + vals


def test_hand_assembled_fixed_order2_rice_decodes():
    # samples follow s[i] = r[i] + 2 s[i-1] - s[i-2] (RFC fixed order 2)
    warm = [10, 13]
    residuals = [2, -1, 0, 3, -2, -3]
    samples = list(warm)
    for r in residuals:
        samples.append(r + 2 * samples[-1] - samples[-2])
    bs = 8
    k = 2
    bits = "0" + "001010" + "0"  # FIXED order 2
    bits += "".join(f"{v & 0xFFFF:016b}" for v in warm)
    bits += "00" + "0000"  # rice method 0, partition order 0
    bits += f"{k:04b}"
    for r in residuals:
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        u = (r << 1) if r >= 0 else (-r << 1) - 1
        bits += "0" * (u >> k) + "1" + f"{u & ((1 << k) - 1):0{k}b}"
    blob = _hand_streaminfo(bs, 8000, 1, bs) + _hand_frame(0, bs, bits)
    got = decode_flac(blob)
    assert got is not None
    assert got[0] == 8000
    assert got[1].tolist() == samples
    # the independent decoder agrees on the same hand bytes
    rate2, s2 = reference_decode(blob)
    assert rate2 == 8000 and s2.tolist() == samples


def test_hand_assembled_stereo_interleaves():
    bs = 4
    left = [100, 200, 300, 400]
    right = [-1, -2, -3, -4]
    sub = ""
    for chan_vals in (left, right):
        sub += "0" + "000001" + "0" + "".join(
            f"{v & 0xFFFF:016b}" for v in chan_vals
        )
    blob = _hand_streaminfo(bs, 48000, 2, bs) + _hand_frame(
        0, bs, sub, channels=2
    )
    got = decode_flac(blob)
    assert got is not None
    assert got[0] == 48000
    assert got[1].tolist() == [100, -1, 200, -2, 300, -3, 400, -4]
    info = flac_stream_info(blob)
    assert info == (48000, 2, 16, 4)


def test_corrupted_crc_rejected_by_both_decoders():
    blob = bytearray(encode_flac(_md5_wave(64), 44100))
    blob[-1] ^= 0x01  # flip a bit in the final frame's CRC-16
    assert decode_flac(bytes(blob)) is None
    try:
        reference_decode(bytes(blob))
        raise RuntimeError("independent decoder accepted a bad CRC")
    except AssertionError:
        pass


def _square(n: int, ch: int) -> np.ndarray:
    """Full-amplitude per-channel square wave (period 2 along the
    inter-channel sample axis, so EVERY channel alternates and the
    order-2 residual overflows the Rice cap into the raw-escape
    branch — an interleave-level alternation would leave even channel
    counts constant per channel)."""
    return np.where(
        (np.arange(n * ch) // ch) % 2 == 0, 32767, -32768
    ).astype(np.int16)


def test_encoder_parameter_grid_cross_checks():
    """VERDICT r8 item 4: every encode mode ``encode_flac`` can emit,
    through the independent RFC 9639 decoder AND the shipping decoder —
    not just fixture defaults. The encoder's real parameter surface is
    channels 1-8 x the 20-bit STREAMINFO rate field x the per-frame
    subframe cycle (CONSTANT / FIXED 0-2 / VERBATIM / Rice raw-escape)
    x frame-count shape (multi-frame, runt last frame, single-sample).
    bps is fixed 16 and blocksize fixed 32 by construction
    (functions/flac.py BLOCK) — there is no wider grid to cover."""
    rates = [8000, 44100, (1 << 20) - 1]  # coded-low / common / 20-bit max
    # axis 1: full channel sweep on the subframe-cycling md5 wave
    # (97 samples/channel = 3 full frames + 1 runt; f%4 cycles all
    # FIXED orders and VERBATIM)
    for ch in range(1, 9):
        for sr in rates:
            samples = _md5_wave(97 * ch, f"grid{ch}")
            blob = encode_flac(samples, sr, channels=ch)
            got_rate, got = reference_decode(blob)
            assert got_rate == sr
            assert np.array_equal(got, samples), (sr, ch)
            ours = decode_flac(blob)
            assert ours is not None and ours[0] == sr
            assert np.array_equal(ours[1], samples), (sr, ch)
    # axis 2: the degenerate signal shapes at mono / stereo / 8-channel
    for ch in (1, 2, 8):
        for sr in rates:
            for name, samples in (
                ("const", np.full(70 * ch, -1234, np.int16)),
                ("square_escape", _square(96, ch)),
                ("single", _md5_wave(ch, f"s{ch}")),
            ):
                blob = encode_flac(samples, sr, channels=ch)
                got_rate, got = reference_decode(blob)
                assert got_rate == sr
                assert np.array_equal(got, samples), (name, sr, ch)
                ours = decode_flac(blob)
                assert ours is not None and ours[0] == sr
                assert np.array_equal(ours[1], samples), (name, sr, ch)
