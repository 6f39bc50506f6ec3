"""Pure-Python + numpy baseline JPEG codec (no PIL, no libjpeg).

Closes the last implementable codec gate from VERDICT r4 item 2: the
container has no PIL/ffmpeg, but baseline JFIF is just Huffman coding +
dequantization + an 8x8 IDCT + YCbCr→RGB — all expressible with stdlib
``struct`` and numpy (the same dependency set the WAV decoder uses).

Decoder scope (``decode_jpeg_pixels``):
- baseline DCT (SOF0) and extended-sequential Huffman (SOF1)
- PROGRESSIVE DCT (SOF2, T.81 §G.2): multi-scan spectral selection +
  successive approximation — interleaved/non-interleaved DC first and
  refinement scans, per-band AC first scans with cross-block EOB runs,
  AC refinement with correction bits, per-scan restart state resets
- grayscale and 3-component YCbCr with sampling factors 1 or 2
  (4:4:4 / 4:2:2 / 4:2:0), nearest-neighbor chroma upsampling
- 8- and 16-bit-precision quantization tables, multiple DQT/DHT
  segments, restart intervals (DRI + RSTn), 0xFF00 byte unstuffing
- missing DHT falls back to the ITU T.81 Annex K typical tables (the
  MJPEG convention — MJPG AVI frames routinely omit them)
- arithmetic, hierarchical, lossless, 12-bit → ``None``
  (keep-with-fallback, same contract as the PNG/GIF/BMP decoders)

Encoder scope (fixtures + MJPEG synthesis, NOT a general compressor):
``encode_jpeg_gray`` / ``encode_jpeg_ycbcr`` Huffman-encode caller-given
QUANTIZED coefficient blocks with the Annex K tables. With a DC quant
step of 8 and DC-only blocks, IDCT yields exactly ``dc + 128`` for all
64 samples (the DC basis function is constant: s = Z00/8, float-exact),
so the synthetic fixtures decode to md5-recomputable pixel values a
DuckDB oracle can replay coordinate-by-coordinate — full value-hash
coverage of the Huffman path, bitstream framing, dequant, IDCT and
block assembly.

Reference scope parity: the reference decodes media headers only
(/root/reference/src/main.rs:760-769, WAV); pixel-level JPEG decode is
part of this repo's beyond-reference multimodal surface. Format facts
are public spec (ITU-T T.81 / ISO 10918-1); the Annex K Huffman and
zigzag tables are published constants.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Published constants (ITU-T T.81 Annex K)
# --------------------------------------------------------------------------


def _zigzag() -> list[int]:
    """Natural-order index for each zigzag scan position (64 entries)."""
    out: list[int] = []
    for d in range(15):
        pts = [(u, d - u) for u in range(d + 1) if u < 8 and d - u < 8]
        if d % 2 == 0:
            pts.reverse()
        out.extend(u * 8 + v for (u, v) in pts)
    return out


ZIGZAG = _zigzag()

# (bits per code length 1..16, symbol values) — T.81 tables K.3-K.6
DC_LUMA = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
DC_CHROMA = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
AC_LUMA = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)
AC_CHROMA = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)

for _bits, _vals in (DC_LUMA, DC_CHROMA, AC_LUMA, AC_CHROMA):
    assert len(_vals) == sum(_bits), "Annex K table transcription error"

# Orthonormal 1-D DCT basis: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16);
# IDCT of an 8x8 coefficient block Z is M.T @ Z @ M. DC-only blocks come
# out float-EXACT (s = Z00/8), which the fixture encoders rely on.
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits, vals):
    """(length, code) -> symbol map from a T.81 (BITS, HUFFVAL) pair."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _encode_codes(bits, vals):
    """symbol -> (code, length) map (encoder direction)."""
    return {
        sym: (code, length)
        for (length, code), sym in _canonical_codes(bits, vals).items()
    }


# --------------------------------------------------------------------------
# Bit I/O over the entropy-coded segment
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader with 0xFF00 unstuffing. Stops at any real
    marker (0xFF followed by non-zero, non-RST); ``restart()`` consumes
    an expected RSTn at a byte-aligned boundary."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt != 0x00:
                return False  # real marker: scan data ends here
            self.pos += 2
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read(self, n: int) -> int | None:
        while self.nbits < n:
            if not self._fill():
                return None
        self.nbits -= n
        out = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return out

    def huff(self, table) -> int | None:
        length = 0
        code = 0
        for _ in range(16):
            bit = self.read(1)
            if bit is None:
                return None
            code = (code << 1) | bit
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        return None

    def restart(self) -> bool:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if self.pos + 2 > len(d) or d[self.pos] != 0xFF:
            return False
        if not (0xD0 <= d[self.pos + 1] <= 0xD7):
            return False
        self.pos += 2
        return True


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map s received magnitude bits to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _BitWriter:
    """MSB-first bit writer with 0xFF stuffing; 1-padding on align."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, n: int) -> None:
        self.acc = (self.acc << n) | (code & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg_pixels(data: bytes | None) -> np.ndarray | None:
    """Decode a baseline or progressive JPEG to (h, w, 3) uint8 RGB,
    or None."""
    try:
        return _decode(data)
    except Exception:
        return None


def _scan_baseline(data: bytes, start: int, scan_comps: list[dict],
                   huff: dict, ri: int, mcus_x: int, mcus_y: int) -> bool:
    """Decode the single sequential-DCT scan (T.81 §F.2) into each
    component's ``coef`` array. Returns False on a malformed stream."""
    reader = _BitReader(data, start)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if ri and mcu_count and mcu_count % ri == 0:
                if not reader.restart():
                    return False
                for c in scan_comps:
                    c["pred"] = 0
            mcu_count += 1
            for c in scan_comps:
                dc_t = huff[(0, c["td"])]
                ac_t = huff[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        block = c["coef"][row * c["bx"] + col]
                        s = reader.huff(dc_t)
                        if s is None or s > 15:
                            return False
                        extra = reader.read(s) if s else 0
                        if extra is None:
                            return False
                        c["pred"] += _extend(extra, s)
                        block[0] = c["pred"]
                        k = 1
                        while k <= 63:
                            rs = reader.huff(ac_t)
                            if rs is None:
                                return False
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return False
                            extra = reader.read(sz)
                            if extra is None:
                                return False
                            block[ZIGZAG[k]] = _extend(extra, sz)
                            k += 1
    return True


def _prog_dc_first(reader: _BitReader, block, c: dict, huff: dict,
                   al: int) -> bool:
    s = reader.huff(huff[(0, c["td"])])
    if s is None or s > 15:
        return False
    extra = reader.read(s) if s else 0
    if extra is None:
        return False
    c["pred"] += _extend(extra, s)
    block[0] = c["pred"] << al
    return True


def _prog_dc_refine(reader: _BitReader, block, al: int) -> bool:
    bit = reader.read(1)
    if bit is None:
        return False
    if bit:
        block[0] = int(block[0]) | (1 << al)
    return True


def _prog_ac_first(reader: _BitReader, block, ac_t: dict, ss: int,
                   se: int, al: int, state: dict) -> bool:
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return True
    k = ss
    while k <= se:
        rs = reader.huff(ac_t)
        if rs is None:
            return False
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:  # EOBn: run of 2^r + ext blocks ending here
                eobrun = 1 << r
                if r:
                    extra = reader.read(r)
                    if extra is None:
                        return False
                    eobrun += extra
                state["eobrun"] = eobrun - 1
                break
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                return False
            extra = reader.read(s)
            if extra is None:
                return False
            block[ZIGZAG[k]] = _extend(extra, s) << al
            k += 1
    return True


def _prog_ac_refine(reader: _BitReader, block, ac_t: dict, ss: int,
                    se: int, al: int, state: dict) -> bool:
    """Successive-approximation AC refinement (T.81 §G.2, the
    correction-bit algorithm): newly-significant coefficients arrive as
    ±2^Al; every already-nonzero coefficient visited consumes one
    correction bit that may add 2^Al toward its sign."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = reader.huff(ac_t)
            if rs is None:
                return False
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:  # EOBn — tail corrections handled below
                    eobrun = 1 << r
                    if r:
                        extra = reader.read(r)
                        if extra is None:
                            return False
                        eobrun += extra
                    state["eobrun"] = eobrun
                    break
                s_val = 0  # ZRL: skip 16 zero-history positions
            else:
                if s != 1:
                    return False
                bit = reader.read(1)
                if bit is None:
                    return False
                s_val = p1 if bit else m1
            while k <= se:
                z = ZIGZAG[k]
                coef = int(block[z])
                if coef != 0:
                    bit = reader.read(1)
                    if bit is None:
                        return False
                    if bit and not (coef & p1):
                        block[z] = coef + (p1 if coef >= 0 else m1)
                else:
                    if r == 0:
                        if s_val:
                            block[z] = s_val
                        k += 1
                        break
                    r -= 1
                k += 1
    if state["eobrun"] > 0:
        while k <= se:
            z = ZIGZAG[k]
            coef = int(block[z])
            if coef != 0:
                bit = reader.read(1)
                if bit is None:
                    return False
                if bit and not (coef & p1):
                    block[z] = coef + (p1 if coef >= 0 else m1)
            k += 1
        state["eobrun"] -= 1
    return True


def _next_marker(data: bytes, pos: int) -> int | None:
    """Byte offset of the next real marker (not stuffing, not RSTn) at
    or after ``pos`` — the end of a scan's entropy-coded data."""
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00 or nxt == 0xFF or 0xD0 <= nxt <= 0xD7:
            pos += 2 if nxt != 0xFF else 1
            continue
        return pos
    return None


def _scan_progressive(data: bytes, start: int, scan_comps: list[dict],
                      huff: dict, ri: int, ss: int, se: int, ah: int,
                      al: int, w: int, h: int, hmax: int, vmax: int,
                      mcus_x: int, mcus_y: int) -> int | None:
    """Decode one progressive scan (T.81 §G.2) into the shared per-
    component coefficient arrays; returns the offset of the marker
    after the entropy-coded data, or None on a malformed stream.

    DC scans (Ss=Se=0) may be interleaved; AC scans cover one component
    and one spectral band, non-interleaved in the component's own block
    raster order. Ah=0 scans deliver new bits ``<< Al``; Ah>0 scans
    refine one bit per coefficient."""
    dc_scan = ss == 0
    if dc_scan and (se != 0 or (ah and ah != al + 1)):
        return None
    if not dc_scan and (len(scan_comps) != 1 or ss > se or se > 63
                        or (ah and ah != al + 1)):
        return None
    for c in scan_comps:
        if dc_scan and ah == 0 and (0, c["td"]) not in huff:
            return None
        if not dc_scan and (1, c["ta"]) not in huff:
            return None
        c["pred"] = 0
    reader = _BitReader(data, start)
    state = {"eobrun": 0}

    def at_restart() -> bool:
        if not reader.restart():
            return False
        for c in scan_comps:
            c["pred"] = 0
        state["eobrun"] = 0
        return True

    if len(scan_comps) == 1:
        # Non-interleaved: the component's own block grid (not MCU-padded)
        c = scan_comps[0]
        nbx = -(-(-(-w * c["h"] // hmax)) // 8)
        nby = -(-(-(-h * c["v"] // vmax)) // 8)
        ac_t = huff.get((1, c["ta"]))
        n = 0
        for row in range(nby):
            for col in range(nbx):
                if ri and n and n % ri == 0 and not at_restart():
                    return None
                n += 1
                block = c["coef"][row * c["bx"] + col]
                if dc_scan:
                    ok = (_prog_dc_first(reader, block, c, huff, al)
                          if ah == 0 else
                          _prog_dc_refine(reader, block, al))
                elif ah == 0:
                    ok = _prog_ac_first(reader, block, ac_t, ss, se, al,
                                        state)
                else:
                    ok = _prog_ac_refine(reader, block, ac_t, ss, se, al,
                                         state)
                if not ok:
                    return None
    else:
        if not dc_scan:
            return None  # AC scans are single-component by spec
        n = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if ri and n and n % ri == 0 and not at_restart():
                    return None
                n += 1
                for c in scan_comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            block = c["coef"][row * c["bx"] + col]
                            ok = (_prog_dc_first(reader, block, c, huff,
                                                 al)
                                  if ah == 0 else
                                  _prog_dc_refine(reader, block, al))
                            if not ok:
                                return None
    end = _next_marker(data, reader.pos)
    return end if end is not None else len(data)


def _decode(data: bytes | None) -> np.ndarray | None:
    if not data or len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    w = h = 0
    ri = 0
    prog = False
    hmax = vmax = mcus_x = mcus_y = 0
    nscans = 0
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI — done (fails below if no scan decoded)
            break
        if pos + 4 > len(data):
            return None
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                n = 64 * (2 if pq else 1)
                raw = seg[i : i + n]
                i += n
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = vals
                qt[tq] = nat
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = tuple(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = tuple(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential / progressive
            prog = marker == 0xC2
            prec = seg[0]
            if prec != 8:
                return None
            h, w = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            if nc not in (1, 3):
                return None
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                   for c in comps):
                return None
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                c["bx"] = mcus_x * c["h"]
                c["by"] = mcus_y * c["v"]
                c["coef"] = np.zeros((c["by"] * c["bx"], 64),
                                     dtype=np.int32)
                c["pred"] = 0
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if not comps or w <= 0 or h <= 0:
                return None
            ns = seg[0]
            scan_comps = []
            for s in range(ns):
                cs, tt = seg[1 + 2 * s : 3 + 2 * s]
                comp = next((c for c in comps if c["id"] == cs), None)
                if comp is None:
                    return None
                comp["td"], comp["ta"] = tt >> 4, tt & 15
                scan_comps.append(comp)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            start = pos + 2 + seglen
            if not prog:
                if (ss, se, ah, al) != (0, 63, 0, 0):
                    return None
                if len(scan_comps) != len(comps):
                    return None  # multi-scan sequential not supported
                # MJPEG convention: tables omitted -> Annex K typical
                if not huff:
                    huff[(0, 0)] = _canonical_codes(*DC_LUMA)
                    huff[(1, 0)] = _canonical_codes(*AC_LUMA)
                    huff[(0, 1)] = _canonical_codes(*DC_CHROMA)
                    huff[(1, 1)] = _canonical_codes(*AC_CHROMA)
                for c in scan_comps:
                    if (0, c["td"]) not in huff or (1, c["ta"]) not in huff:
                        return None
                if not _scan_baseline(data, start, scan_comps, huff, ri,
                                      mcus_x, mcus_y):
                    return None
                nscans += 1
                break  # one scan holds all components
            end = _scan_progressive(data, start, scan_comps, huff, ri,
                                    ss, se, ah, al, w, h, hmax, vmax,
                                    mcus_x, mcus_y)
            if end is None:
                return None
            nscans += 1
            pos = end
            continue
        pos += 2 + seglen
    if nscans == 0 or not comps or w <= 0 or h <= 0:
        return None
    for c in comps:
        if c["tq"] not in qt:
            return None

    planes = []
    for c in comps:
        z = (c["coef"].astype(np.float64) * qt[c["tq"]]).reshape(-1, 8, 8)
        s = np.einsum("ux,nuv,vy->nxy", _M, z, _M)
        px = np.clip(np.round(s) + 128.0, 0, 255).astype(np.uint8)
        plane = (
            px.reshape(c["by"], c["bx"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["by"] * 8, c["bx"] * 8)
        )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        return np.ascontiguousarray(
            np.repeat(planes[0][:, :, None], 3, axis=2)
        )
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Fixture encoder (quantized coefficients in, valid baseline JPEG out)
# --------------------------------------------------------------------------

_Q_FIX = np.full(64, 8, dtype=np.int64)  # q0 = 8 -> DC-only pixel = dc+128


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_seg(tq: int, q_nat: np.ndarray) -> bytes:
    zz = bytes(int(q_nat[ZIGZAG[k]]) for k in range(64))
    return _seg(0xDB, bytes([tq]) + zz)


def _dht_seg(tc: int, th: int, table) -> bytes:
    bits, vals = table
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


def _encode_block(wtr: _BitWriter, block, pred: int, dc_enc, ac_enc) -> int:
    """Huffman-encode one 64-coefficient NATURAL-order block; returns the
    new DC predictor."""
    dc = int(block[0])
    diff = dc - pred
    s = int(abs(diff)).bit_length()
    code, n = dc_enc[s]
    wtr.write(code, n)
    if s:
        wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    zz = [int(block[ZIGZAG[k]]) for k in range(64)]
    run = 0
    last = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, n = ac_enc[0xF0]  # ZRL
            wtr.write(code, n)
            run -= 16
        sz = int(abs(v)).bit_length()
        code, n = ac_enc[(run << 4) | sz]
        wtr.write(code, n)
        wtr.write(v if v >= 0 else v + (1 << sz) - 1, sz)
        run = 0
    if last < 63:
        code, n = ac_enc[0x00]  # EOB
        wtr.write(code, n)
    return dc


def encode_jpeg_gray(
    coef_blocks: np.ndarray,
    w: int,
    h: int,
    q_nat: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Grayscale baseline JPEG from (by, bx, 64) QUANTIZED natural-order
    coefficient blocks (by = ceil(h/8), bx = ceil(w/8))."""
    if q_nat is None:
        q_nat = _Q_FIX
    by, bx, _ = coef_blocks.shape
    dc_enc = _encode_codes(*DC_LUMA)
    ac_enc = _encode_codes(*AC_LUMA)
    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(0, q_nat)
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _dht_seg(0, 0, DC_LUMA)
    out += _dht_seg(1, 0, AC_LUMA)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    wtr = _BitWriter()
    pred = 0
    n_mcu = 0
    rst = 0
    for yb in range(by):
        for xb in range(bx):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                wtr.align()
                wtr.out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = 0
            n_mcu += 1
            pred = _encode_block(wtr, coef_blocks[yb, xb], pred, dc_enc, ac_enc)
    wtr.align()
    return bytes(out) + bytes(wtr.out) + b"\xff\xd9"


# Custom AC Huffman table for PROGRESSIVE scans: the Annex K tables are
# sequential-only (no EOBn symbols with r>0), so the progressive encoder
# carries its own — every symbol a progressive AC scan can emit (EOBn
# r=0..14, ZRL, and (run, size) for run 0..15 / size 1..10), all coded
# at 8 bits (176 codes < 256; the all-ones code stays unused as T.81
# recommends). Wasteful as compression, fully valid as a bitstream.
_PROG_AC_SYMS = tuple(sorted(
    {r << 4 for r in range(15)}
    | {0xF0}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
))
PROG_AC = ((0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMS), 0, 0, 0, 0, 0, 0,
            0, 0), _PROG_AC_SYMS)


def _emit_rst(wtr: _BitWriter, rst: int) -> int:
    wtr.align()
    wtr.out += bytes([0xFF, 0xD0 + rst % 8])
    return rst + 1


def _enc_scan_dc(blocks, dc_enc, ah: int, al: int, ri: int) -> bytes:
    """DC scan: first (Ah=0) codes diff(dc >> Al); refinement sends bit
    Al of each DC coefficient."""
    wtr = _BitWriter()
    pred = 0
    rst = 0
    for i, b in enumerate(blocks):
        if ri and i and i % ri == 0:
            rst = _emit_rst(wtr, rst)
            pred = 0
        dc = int(b[0]) >> al  # arithmetic shift: the DC point transform
        if ah == 0:
            diff = dc - pred
            pred = dc
            s = abs(diff).bit_length()
            code, n = dc_enc[s]
            wtr.write(code, n)
            if s:
                wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        else:
            wtr.write(dc & 1, 1)
    wtr.align()
    return bytes(wtr.out)


def _enc_scan_ac_first(blocks, ac_enc, ss: int, se: int, al: int,
                       ri: int) -> bytes:
    """First AC scan of a band: sequential-style run/size coding of the
    point-transformed magnitudes, with cross-block EOB runs."""
    wtr = _BitWriter()
    eobrun = 0
    rst = 0

    def flush_eob() -> None:
        nonlocal eobrun
        while eobrun > 0:
            chunk = min(eobrun, 0x7FFF)
            r = chunk.bit_length() - 1
            code, n = ac_enc[r << 4]
            wtr.write(code, n)
            if r:
                wtr.write(chunk - (1 << r), r)
            eobrun -= chunk

    for i, b in enumerate(blocks):
        if ri and i and i % ri == 0:
            flush_eob()
            rst = _emit_rst(wtr, rst)
        vals = []
        for k in range(ss, se + 1):
            t = int(b[ZIGZAG[k]])
            tv = abs(t) >> al
            vals.append(tv if t >= 0 else -tv)
        last = max((j for j, v in enumerate(vals) if v), default=-1)
        if last < 0:
            eobrun += 1
            continue
        flush_eob()
        run = 0
        for j in range(last + 1):
            v = vals[j]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, n = ac_enc[0xF0]
                wtr.write(code, n)
                run -= 16
            s = abs(v).bit_length()
            code, n = ac_enc[(run << 4) | s]
            wtr.write(code, n)
            wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < len(vals) - 1:
            eobrun += 1
    flush_eob()
    wtr.align()
    return bytes(wtr.out)


def _enc_scan_ac_refine(blocks, ac_enc, ss: int, se: int, al: int,
                        ri: int) -> bytes:
    """AC refinement scan: newly-significant coefficients (|coef|>>Al
    == 1) emit (run, 1) symbols; already-nonzero ones ride as buffered
    correction bits flushed after the next symbol; blocks with no new
    coefficients fold into cross-block EOB runs carrying their
    correction bits."""
    wtr = _BitWriter()
    eobrun = 0
    tail_bits: list[int] = []  # corrections of EOB-covered blocks
    rst = 0

    def flush_eob() -> None:
        nonlocal eobrun, tail_bits
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            code, n = ac_enc[r << 4]
            wtr.write(code, n)
            if r:
                wtr.write(eobrun - (1 << r), r)
            eobrun = 0
        for bit in tail_bits:
            wtr.write(bit, 1)
        tail_bits = []

    for i, b in enumerate(blocks):
        if ri and i and i % ri == 0:
            flush_eob()
            rst = _emit_rst(wtr, rst)
        absv = []
        sign = []
        for k in range(ss, se + 1):
            t = int(b[ZIGZAG[k]])
            absv.append(abs(t) >> al)
            sign.append(t >= 0)
        eobpos = max((j for j, v in enumerate(absv) if v == 1), default=-1)
        if eobpos < 0:
            # no newly-significant coefficient: the whole band rides an
            # EOB run; nonzero-history corrections go to the run's bits
            tail_bits.extend(v & 1 for v in absv if v > 1)
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        pending: list[int] = []

        def flush_pending() -> None:
            for bit in pending:
                wtr.write(bit, 1)
            pending.clear()

        for j in range(eobpos + 1):
            v = absv[j]
            if v == 0:
                run += 1
                continue
            # lazy ZRL: emitted on reaching a nonzero position, so the
            # buffered corrections line up with the decoder's skip walk
            while run > 15:
                code, n = ac_enc[0xF0]
                wtr.write(code, n)
                flush_pending()
                run -= 16
            if v > 1:
                pending.append(v & 1)
                continue
            code, n = ac_enc[(run << 4) | 1]
            wtr.write(code, n)
            wtr.write(1 if sign[j] else 0, 1)
            flush_pending()
            run = 0
        if eobpos < len(absv) - 1:
            tail_bits.extend(
                absv[j] & 1
                for j in range(eobpos + 1, len(absv))
                if absv[j] > 1
            )
            eobrun += 1
    flush_eob()
    wtr.align()
    return bytes(wtr.out)


def encode_jpeg_gray_progressive(
    coef_blocks: np.ndarray,
    w: int,
    h: int,
    q_nat: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Grayscale PROGRESSIVE (SOF2) JPEG from (by, bx, 64) QUANTIZED
    natural-order coefficient blocks, encoded as the canonical 4-scan
    successive-approximation script:

      1. DC first       (Ss=0 Se=0  Ah=0 Al=1)
      2. DC refinement  (Ss=0 Se=0  Ah=1 Al=0)
      3. AC first       (Ss=1 Se=63 Ah=0 Al=1)
      4. AC refinement  (Ss=1 Se=63 Ah=1 Al=0)

    so a decoder must run every progressive code path (DC/AC x
    first/refine, EOB runs, correction bits) to reconstruct the exact
    coefficients ``coef_blocks`` — the decoded image is bit-identical
    to the baseline encoding of the same blocks."""
    if q_nat is None:
        q_nat = _Q_FIX
    by, bx, _ = coef_blocks.shape
    dc_enc = _encode_codes(*DC_LUMA)
    ac_enc = _encode_codes(*PROG_AC)
    blocks = [coef_blocks[yb, xb] for yb in range(by) for xb in range(bx)]
    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(0, q_nat)
    out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _dht_seg(0, 0, DC_LUMA)
    out += _dht_seg(1, 0, PROG_AC)
    ri = restart_interval
    if ri:
        out += _seg(0xDD, struct.pack(">H", ri))
    scans = (
        (0, 0, 0, 1, _enc_scan_dc(blocks, dc_enc, 0, 1, ri)),
        (0, 0, 1, 0, _enc_scan_dc(blocks, dc_enc, 1, 0, ri)),
        (1, 63, 0, 1, _enc_scan_ac_first(blocks, ac_enc, 1, 63, 1, ri)),
        (1, 63, 1, 0, _enc_scan_ac_refine(blocks, ac_enc, 1, 63, 0, ri)),
    )
    for ss, se, ah, al, payload in scans:
        out += _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        out += payload
    return bytes(out) + b"\xff\xd9"


def synth_gray_jpeg_progressive(doc_id: int) -> bytes:
    """Deterministic grayscale PROGRESSIVE JPEG: same non-MCU-aligned
    dims as the baseline fixture, and each 8x8 block carries a DC value
    plus one AC coefficient at (u, v) = (4, 4) — the one AC basis whose
    product M[4,x]*M[4,y] is exactly ±1/8, so with q=8 the IDCT stays
    integer-exact: pixel (x, y) = clip(v + a*s(x%8)*s(y%8)) with
    s(t) = +1 for t in {0,3,4,7} else -1, v = first md5 byte of
    ``jq:{id}:{bx}:{by}`` and a = (second md5 byte % 7) - 3. |a| <= 3
    spans every refinement path: a = ±1 arrives newly-significant in
    the refine scan, |a| in {2,3} exercises correction bits 0 and 1,
    a = 0 blocks fold into EOB runs. Restart markers every 3 blocks
    exercise per-scan restart state resets."""
    import hashlib

    w = 11 + doc_id % 10
    h = 9 + doc_id % 8
    bx = -(-w // 8)
    by = -(-h // 8)
    blocks = np.zeros((by, bx, 64), dtype=np.int64)
    for yb in range(by):
        for xb in range(bx):
            hx = hashlib.md5(f"jq:{doc_id}:{xb}:{yb}".encode()).hexdigest()
            blocks[yb, xb, 0] = int(hx[:2], 16) - 128
            blocks[yb, xb, 4 * 8 + 4] = int(hx[2:4], 16) % 7 - 3
    return encode_jpeg_gray_progressive(blocks, w, h, restart_interval=3)


def encode_jpeg_ycbcr(
    y_blocks: np.ndarray,
    cb_blocks: np.ndarray,
    cr_blocks: np.ndarray,
    w: int,
    h: int,
    sampling: tuple[int, int] = (1, 1),
) -> bytes:
    """3-component baseline JPEG from per-component QUANTIZED blocks.

    ``sampling`` is the luma (H, V) factor pair — (1, 1) = 4:4:4,
    (2, 2) = 4:2:0 (chroma always 1x1). Block arrays are (by, bx, 64)
    natural-order, sized for each component's own grid."""
    sh, sv = sampling
    dc_l, ac_l = _encode_codes(*DC_LUMA), _encode_codes(*AC_LUMA)
    dc_c, ac_c = _encode_codes(*DC_CHROMA), _encode_codes(*AC_CHROMA)
    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(0, _Q_FIX)
    out += _dqt_seg(1, _Q_FIX)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += _seg(0xC0, sof)
    out += _dht_seg(0, 0, DC_LUMA) + _dht_seg(1, 0, AC_LUMA)
    out += _dht_seg(0, 1, DC_CHROMA) + _dht_seg(1, 1, AC_CHROMA)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    mcus_x = -(-w // (8 * sh))
    mcus_y = -(-h // (8 * sv))
    wtr = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(sv):
                for bx in range(sh):
                    preds[0] = _encode_block(
                        wtr,
                        y_blocks[my * sv + by, mx * sh + bx],
                        preds[0], dc_l, ac_l,
                    )
            preds[1] = _encode_block(wtr, cb_blocks[my, mx], preds[1],
                                     dc_c, ac_c)
            preds[2] = _encode_block(wtr, cr_blocks[my, mx], preds[2],
                                     dc_c, ac_c)
    wtr.align()
    return bytes(out) + bytes(wtr.out) + b"\xff\xd9"


# --------------------------------------------------------------------------
# Deterministic fixture (oracle-recomputable pixels)
# --------------------------------------------------------------------------


def synth_gray_jpeg(doc_id: int) -> bytes:
    """Deterministic grayscale baseline JPEG: dims (11 + id%10,
    9 + id%8) — NOT multiples of 8, so MCU-edge cropping is exercised —
    and every 8x8 block is DC-only with pixel value v(bx, by) = first
    md5 byte of ``jp:{id}:{bx}:{by}``. With q0 = 8 and dc = v - 128 the
    IDCT is float-exact, so decoded pixel (x, y) == v(x//8, y//8): the
    formula a DuckDB oracle replays per coordinate."""
    import hashlib

    w = 11 + doc_id % 10
    h = 9 + doc_id % 8
    bx = -(-w // 8)
    by = -(-h // 8)
    blocks = np.zeros((by, bx, 64), dtype=np.int64)
    for yb in range(by):
        for xb in range(bx):
            v = int(
                hashlib.md5(f"jp:{doc_id}:{xb}:{yb}".encode()).hexdigest()[:2],
                16,
            )
            blocks[yb, xb, 0] = v - 128
    return encode_jpeg_gray(blocks, w, h)


def strip_jpeg_metadata(data: bytes | None):
    """EXIF/metadata scrub — the privacy pass an image-dataset release
    runs (JFIF APP segments routinely carry GPS coordinates, serial
    numbers, and editor history): walk the T.81 segment stream and
    drop APP1 (EXIF/XMP) and COM segments, copying everything else
    verbatim; from SOS onward the entropy-coded payload is copied
    through untouched. Returns ``(scrubbed_bytes, removed_bytes)`` or
    ``None`` for malformed input (bad SOI, a segment overrunning the
    buffer). Standalone markers (TEM, RSTn) before SOS are copied
    as-is. The scrub is structural — pixels are untouched, which the
    caller can prove by decoding the scrubbed stream."""
    if data is None or len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    out = bytearray(b"\xff\xd8")
    removed = 0
    pos = 2
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xDA:  # SOS: entropy data follows, copy the rest
            out += data[pos:]
            return bytes(out), removed
        if marker == 0xD9:  # EOI before SOS (no image data)
            out += data[pos : pos + 2]
            return bytes(out), removed
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            out += data[pos : pos + 2]
            pos += 2
            continue
        if pos + 4 > n:
            return None
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        if seg_len < 2 or pos + 2 + seg_len > n:
            return None
        total = 2 + seg_len
        if marker in (0xE1, 0xFE):  # APP1 (EXIF/XMP) or COM
            removed += total
        else:
            out += data[pos : pos + total]
        pos += total
    return None


def synth_jpeg_with_exif(doc_id: int) -> bytes:
    """The q_jpeg_pixels fixture with deterministic metadata injected
    after SOI: an APP1 Exif segment (``Exif\\0\\0`` + 50 + id % 40
    padding bytes) and, for even ids, an 18-byte COM segment — so
    removed_bytes has a closed-form oracle:
    60 + id % 40 + (id even ? 22 : 0)."""
    base = synth_gray_jpeg(doc_id)
    pad = 50 + doc_id % 40
    payload = b"Exif\x00\x00" + bytes((doc_id + i) % 256 for i in range(pad))
    app1 = b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    com = b""
    if doc_id % 2 == 0:
        body = b"synthetic comment!"
        com = b"\xff\xfe" + struct.pack(">H", 2 + len(body)) + body
    return base[:2] + app1 + com + base[2:]
