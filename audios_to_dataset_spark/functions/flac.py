"""Pure-Python FLAC codec (16-bit independent-channel subset of the
public FLAC format spec, https://xiph.org/flac/format.html).

Implemented end-to-end with no third-party codec:

- STREAMINFO metadata block (the mandatory first block) with real
  min/max block sizes, 20-bit sample rate, channel/bps fields and the
  36-bit total-sample count;
- framing: 14-bit sync + fixed-blocksize strategy, UTF-8-coded frame
  numbers, 8-bit-from-end blocksize, CRC-8 frame-header checksum and
  CRC-16 whole-frame checksum (both VERIFIED on decode, polynomials
  0x07 / 0x8005 per spec §9.1-9.2);
- subframes: CONSTANT, VERBATIM and FIXED orders 0-4 (the spec's
  polynomial predictors), warm-up samples at full resolution;
- residuals: Rice partition method 0 (4-bit parameters), zigzag
  folding, including the 0b1111 escape to unencoded residuals.

The encoder cycles subframe types per frame (fixed 0/1/2, verbatim) so
one fixture stream exercises every decode branch; the decoder accepts
any conforming stream within the subset (1-8 independent channels,
16-bit, constant blocksize) and returns ``None`` on anything else —
the repo-wide keep-with-fallback contract shared with
functions/wav.py. Stereo decorrelation modes (left/right/mid-side,
channel codes 8-10) are an optional encoder-side optimization this
codec neither emits nor accepts.

Analog of the reference's WAV byte-path (``/root/reference/src/main.rs``
header walk): same decode-don't-trust discipline, applied to the
lossless-compressed audio container an ingest pipeline meets next to
.wav files.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x^1 + x^0 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial x^16 + x^15 + x^2 + x^0 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def bytes(self) -> bytes:
        assert self._nbits == 0
        return bytes(self._out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._d = data
        self._byte = pos
        self._bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            if self._byte >= len(self._d):
                raise EOFError
            v = (v << 1) | ((self._d[self._byte] >> (7 - self._bit)) & 1)
            self._bit += 1
            if self._bit == 8:
                self._bit = 0
                self._byte += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise EOFError
        return q

    def align(self) -> None:
        if self._bit:
            self._bit = 0
            self._byte += 1

    def tell(self) -> int:
        return self._byte


# fixed-predictor residual: res = poly_diff(order) applied to samples
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _utf8_code(n: int) -> bytes:
    """The FLAC frame-number coding (UTF-8-like, values < 2^31)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF00 >> nbytes) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for k in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_code(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad utf8 frame number")
    val = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad utf8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def _rice_param(res: np.ndarray) -> int:
    """Deterministic Rice parameter: smallest k with mean(u) < 2^k,
    capped to 14 (15 is the escape code)."""
    if res.size == 0:
        return 0
    u = (np.abs(res.astype(np.int64)) * 2).mean()
    k = 0
    while (1 << k) < u and k < 14:
        k += 1
    return k


BLOCK = 32  # fixed encoder blocksize — several frames per fixture


def _write_subframe(bw: _BitWriter, blk: np.ndarray, f: int) -> None:
    """One int16 channel block as a subframe. Frame f's type cycles
    f % 4: fixed order 0 / 1 / 2 / VERBATIM (a constant-valued block
    short-circuits to CONSTANT), so multi-frame inputs hit every
    decode branch."""
    if np.all(blk == blk[0]):
        bw.write(0, 1)
        bw.write(0b000000, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(blk[0]), 16)
    elif f % 4 == 3:
        bw.write(0, 1)
        bw.write(0b000001, 6)  # VERBATIM
        bw.write(0, 1)
        for v in blk:
            bw.write(int(v), 16)
    else:
        order = f % 4
        bw.write(0, 1)
        bw.write(0b001000 | order, 6)  # FIXED
        bw.write(0, 1)
        for v in blk[:order]:
            bw.write(int(v), 16)
        res = blk.copy()
        for _ in range(order):
            res = np.diff(res)
        bw.write(0b00, 2)  # Rice method, 4-bit params
        bw.write(0, 4)  # partition order 0
        k = _rice_param(res)
        u = (res << 1) ^ (res >> 63)  # zigzag
        if int(u.max(initial=0)) >> k > 2 * BLOCK:
            # escape: raw two's-complement residuals at the
            # smallest width that fits this block (order-2
            # residuals reach 19 bits at full 16-bit amplitude)
            mn = int(res.min(initial=0))
            mx = int(res.max(initial=0))
            raw_bits = 1 + max(
                mx.bit_length(),
                (-mn - 1).bit_length() if mn < 0 else 0,
                1,
            )
            bw.write(0xF, 4)
            bw.write(raw_bits, 5)
            for v in res:
                bw.write(int(v), raw_bits)
        else:
            bw.write(k, 4)
            for v in u:
                bw.write_unary(int(v) >> k)
                bw.write(int(v), k)


def encode_flac(
    samples: np.ndarray, sample_rate: int, channels: int = 1
) -> bytes:
    """Encode int16 samples as a conforming FLAC stream. ``samples`` is
    interleaved for ``channels`` > 1 (the WAV data-chunk layout); each
    frame carries one independent subframe per channel (channel
    assignment 0b0000-0b0111 per spec §9.1.3 — no stereo
    decorrelation, which is an optional encoder optimization). The
    interleaved length must be a multiple of ``channels``."""
    if not 1 <= channels <= 8:
        raise ValueError(f"channels out of range: {channels}")
    s = samples.astype(np.int64)
    if s.size % channels:
        raise ValueError("interleaved length not a multiple of channels")
    n = s.size // channels  # inter-channel sample count (spec total)
    ch = s.reshape(n, channels)
    streaminfo = (
        struct.pack(">HH", BLOCK, BLOCK)
        + b"\x00\x00\x00" * 2  # min/max frame size unknown
        + bytes(
            [
                (sample_rate >> 12) & 0xFF,
                (sample_rate >> 4) & 0xFF,
                # 4 low rate bits | 3 bits (channels-1) | high bit of
                # (bps-1=15=0b01111) which is 0
                ((sample_rate & 0xF) << 4) | ((channels - 1) << 1) | 0,
                # 4 low bits of bps-1 | 4 high bits of total samples
                (0xF << 4) | ((n >> 32) & 0xF),
            ]
        )
        + struct.pack(">I", n & 0xFFFFFFFF)
        + bytes(16)  # md5 unset
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for f, start in enumerate(range(0, n, BLOCK)):
        blk = ch[start : start + BLOCK]
        bs = blk.shape[0]
        hdr = bytearray(b"\xff\xf8")
        # blocksize code 0110 (8-bit-1 follows), rate code 0000 (from
        # STREAMINFO)
        hdr.append(0x60)
        # channel assignment channels-1, sample size 100 (16-bit),
        # reserved 0
        hdr.append(((channels - 1) << 4) | 0x08)
        hdr += _utf8_code(f)
        hdr.append(bs - 1)
        hdr.append(_crc8(bytes(hdr)))

        bw = _BitWriter()
        for c in range(channels):
            _write_subframe(bw, blk[:, c], f)
        bw.align()
        frame = bytes(hdr) + bw.bytes()
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


_BLOCKSIZE_TBL = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_TBL = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _read_subframe(br: _BitReader, bs: int) -> np.ndarray | None:
    """One subframe (CONSTANT / VERBATIM / FIXED 0-4) at 16-bit
    resolution; None for LPC/reserved types or structural errors."""
    if br.read(1):
        return None
    sub = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    if sub == 0:  # CONSTANT
        v = br.read(16)
        v -= 1 << 16 if v & 0x8000 else 0
        blk = np.full(bs, v, dtype=np.int64)
    elif sub == 1:  # VERBATIM
        blk = np.empty(bs, dtype=np.int64)
        for i in range(bs):
            v = br.read(16)
            blk[i] = v - (1 << 16) if v & 0x8000 else v
    elif 8 <= sub <= 12:  # FIXED order 0-4
        order = sub - 8
        warm = []
        for _ in range(order):
            v = br.read(16)
            warm.append(v - (1 << 16) if v & 0x8000 else v)
        method = br.read(2)
        if method > 1:
            return None
        pbits = 4 if method == 0 else 5
        escape = (1 << pbits) - 1
        porder = br.read(4)
        nparts = 1 << porder
        if bs % nparts or (bs >> porder) <= order and porder:
            return None
        res: list[int] = []
        for p in range(nparts):
            cnt = (bs >> porder) - (order if p == 0 else 0)
            k = br.read(pbits)
            if k == escape:
                raw_bits = br.read(5)
                for _ in range(cnt):
                    v = br.read(raw_bits)
                    if raw_bits and v & (1 << (raw_bits - 1)):
                        v -= 1 << raw_bits
                    res.append(v)
            else:
                for _ in range(cnt):
                    q = br.read_unary()
                    u = (q << k) | (br.read(k) if k else 0)
                    res.append((u >> 1) ^ -(u & 1))
        blk = np.empty(bs, dtype=np.int64)
        blk[:order] = warm
        coef = _FIXED_COEF[order]
        for i in range(order, bs):
            blk[i] = res[i - order] + sum(
                c * blk[i - 1 - j] for j, c in enumerate(coef)
            )
    else:
        return None  # LPC and reserved types: out of subset
    if wasted:
        blk <<= wasted
    return blk


def flac_stream_info(
    data: bytes | None,
) -> tuple[int, int, int, int] | None:
    """STREAMINFO fields (sample_rate, channels, bits_per_sample,
    total_inter_channel_samples) from a FLAC stream's mandatory first
    metadata block; None for non-FLAC/truncated bytes. Pure header
    walk — no frame decode — so it works on any conforming stream,
    including ones outside ``decode_flac``'s subset."""
    try:
        if not data or len(data) < 42 or data[:4] != b"fLaC":
            return None
        pos = 4
        while True:
            if pos + 4 > len(data):
                return None
            hdr = data[pos]
            size = int.from_bytes(data[pos + 1 : pos + 4], "big")
            body = data[pos + 4 : pos + 4 + size]
            if len(body) < size:
                return None
            if hdr & 0x7F == 0:  # STREAMINFO
                if size < 34:
                    return None
                rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
                channels = ((body[12] >> 1) & 0x7) + 1
                bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
                total = ((body[13] & 0xF) << 32) | struct.unpack(
                    ">I", body[14:18]
                )[0]
                return rate, channels, bps, total
            pos += 4 + size
            if hdr & 0x80:
                return None  # last block reached without STREAMINFO
    except (IndexError, struct.error):
        return None


def decode_flac(data: bytes | None) -> tuple[int, np.ndarray] | None:
    """Decode a 16-bit FLAC stream (constant blocksize, independent
    channels) to (sample_rate, int16 samples) — interleaved when the
    stream is multichannel, exactly the WAV data-chunk layout, so
    ``encode_flac``→``decode_flac`` round-trips bit-exactly for any
    channel count. Verifies both frame CRCs; returns None for non-FLAC
    bytes, unsupported layouts (stereo decorrelation modes, other bit
    depths, LPC subframes) or any malformed/truncated structure. Use
    ``flac_stream_info`` to recover the channel count."""
    try:
        if not data or len(data) < 42 or data[:4] != b"fLaC":
            return None
        pos = 4
        rate = None
        total = None
        channels = 1
        # metadata block walk
        while True:
            if pos + 4 > len(data):
                return None
            hdr = data[pos]
            last = hdr & 0x80
            btype = hdr & 0x7F
            size = int.from_bytes(data[pos + 1 : pos + 4], "big")
            body = data[pos + 4 : pos + 4 + size]
            if len(body) < size:
                return None
            if btype == 0:  # STREAMINFO
                if size < 34:
                    return None
                rate = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
                channels = ((body[12] >> 1) & 0x7) + 1
                bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
                if bps != 16:
                    return None
                total = ((body[13] & 0xF) << 32) | struct.unpack(
                    ">I", body[14:18]
                )[0]
            pos += 4 + size
            if last:
                break
        if rate is None or rate == 0:
            return None

        out: list[np.ndarray] = []
        got = 0
        while pos < len(data) and (total is None or got < total):
            if pos + 2 > len(data):
                return None
            sync = (data[pos] << 8) | data[pos + 1]
            if sync >> 2 != 0x3FFE:
                return None
            variable = sync & 1
            br = _BitReader(data, pos + 2)
            bs_code = br.read(4)
            rate_code = br.read(4)
            chan = br.read(4)
            size_code = br.read(3)
            if br.read(1):
                return None  # reserved bit must be 0
            if chan != channels - 1 or size_code != 0b100:
                # independent channels matching STREAMINFO, 16-bit only
                # (chan codes 8-10 = stereo decorrelation: out of subset)
                return None
            _read_utf8_code(br)
            if bs_code == 6:
                bs = br.read(8) + 1
            elif bs_code == 7:
                bs = br.read(16) + 1
            elif bs_code in _BLOCKSIZE_TBL:
                bs = _BLOCKSIZE_TBL[bs_code]
            else:
                return None
            if rate_code == 12:
                br.read(8)
            elif rate_code in (13, 14):
                br.read(16)
            elif rate_code == 0:
                pass
            elif rate_code in _RATE_TBL:
                if _RATE_TBL[rate_code] != rate:
                    return None
            else:
                return None
            crc_pos = br.tell()
            if crc_pos >= len(data):
                return None  # truncated exactly at the header CRC byte
            if _crc8(data[pos:crc_pos]) != data[crc_pos]:
                return None
            br = _BitReader(data, crc_pos + 1)

            # one independent subframe per channel
            ch_blocks = []
            for _c in range(channels):
                blk = _read_subframe(br, bs)
                if blk is None:
                    return None
                ch_blocks.append(blk)
            blk = (
                np.stack(ch_blocks, axis=1).reshape(-1)
                if channels > 1
                else ch_blocks[0]
            )

            br.align()
            end = br.tell()
            if end + 2 > len(data):
                return None
            (crc16,) = struct.unpack(">H", data[end : end + 2])
            if _crc16(data[pos:end]) != crc16:
                return None
            if blk.size and (blk.max() > 0x7FFF or blk.min() < -0x8000):
                return None
            out.append(blk.astype(np.int16))
            got += bs
            pos = end + 2
            if variable:
                return None  # subset: fixed-blocksize streams only
        samples = (
            np.concatenate(out) if out else np.empty(0, dtype=np.int16)
        )
        if total is not None and samples.size < total * channels:
            return None
        return rate, samples[
            : total * channels if total else samples.size
        ]
    except (EOFError, ValueError, IndexError, struct.error):
        return None


def synth_flac_md5(doc_id: int) -> bytes:
    """Deterministic FLAC fixture: n = 64 + id % 37 samples (3 frames at
    BLOCK=32 — the type cycle reaches fixed-0/1/2 and, for the longest
    fixtures, VERBATIM), rate from the id, sample i = the same centered
    16-bit md5 formula as the WAV family with a ``fl:`` prefix."""
    n = 64 + doc_id % 37
    sr = 8000 + (doc_id % 3) * 4000
    vals = np.empty(n, dtype=np.int64)
    for i in range(n):
        vals[i] = (
            int(
                hashlib.md5(f"fl:{doc_id}:{i}".encode()).hexdigest()[:4], 16
            )
            - 32768
        )
    return encode_flac(vals.astype(np.int16), sr)
