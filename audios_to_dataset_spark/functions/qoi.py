"""Pure-Python QOI ("Quite OK Image") codec, per the public one-page
specification (qoiformat.org, version 1.0).

QOI is the byte-aligned streaming image format increasingly used as a
zero-dependency interchange codec in ML data tooling (fast to decode,
trivially seekable per file). The full format is implemented — all six
chunk ops on both sides:

- ``QOI_OP_RGB``  (0xFE) / ``QOI_OP_RGBA`` (0xFF): literal pixels;
- ``QOI_OP_INDEX`` (0b00xxxxxx): 64-entry running array indexed by the
  spec hash ``(r*3 + g*5 + b*7 + a*11) % 64``;
- ``QOI_OP_DIFF`` (0b01drdgdb): 2-bit channel deltas, bias 2;
- ``QOI_OP_LUMA`` (0b10dggggg + drdg|dbdg byte): 6-bit green delta
  (bias 32) with 4-bit red/blue deltas relative to it (bias 8);
- ``QOI_OP_RUN`` (0b11rrrrrr): run of the previous pixel, bias -1,
  lengths 1..62 (63/64 are the RGB/RGBA tags).

Header: ``qoif`` magic, big-endian u32 width/height, u8 channels
(3 or 4), u8 colorspace. Stream ends with seven 0x00 bytes then 0x01.

Parity role (reference behavior: RustedBytes/audios-to-dataset
src/main.rs — media files land as opaque byte columns; decode is the
engine's job): the decoder is total — any malformed, truncated, or
non-QOI stream returns ``None``, never a partial image. Images here
are small fixtures; the per-pixel Python loop runs inside an
Arrow-batched pandas UDF, parallel across partitions.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def encode_qoi(px: np.ndarray) -> bytes:
    """Encode an (h, w, 3) or (h, w, 4) uint8 array as a QOI stream,
    using every op the spec defines (run / index / diff / luma /
    literal) with the spec's mandated precedence (run first, then
    index, then diff/luma, literal last)."""
    h, w, ch = px.shape
    assert ch in (3, 4)
    out = bytearray()
    out += _MAGIC
    out += struct.pack(">IIBB", w, h, ch, 0)

    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    flat = px.reshape(-1, ch)
    for i in range(flat.shape[0]):
        p = flat[i]
        cur = (int(p[0]), int(p[1]), int(p[2]),
               int(p[3]) if ch == 4 else 255)
        if cur == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run > 0:
            out.append(0xC0 | (run - 1))
            run = 0
        idx = (cur[0] * 3 + cur[1] * 5 + cur[2] * 7 + cur[3] * 11) % 64
        if index[idx] == cur:
            out.append(idx)
        else:
            index[idx] = cur
            if cur[3] == prev[3]:
                dr = (cur[0] - prev[0] + 256) % 256
                dg = (cur[1] - prev[1] + 256) % 256
                db = (cur[2] - prev[2] + 256) % 256
                # signed deltas in [-128, 127]
                dr = dr - 256 if dr > 127 else dr
                dg = dg - 256 if dg > 127 else dg
                db = db - 256 if db > 127 else db
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2)
                               | (db + 2))
                elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                      and -8 <= db - dg <= 7):
                    out.append(0x80 | (dg + 32))
                    out.append(((dr - dg + 8) << 4) | (db - dg + 8))
                else:
                    out.append(0xFE)
                    out += bytes(cur[:3])
            else:
                out.append(0xFF)
                out += bytes(cur)
        prev = cur
    if run > 0:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi_pixels(data: bytes | None) -> np.ndarray | None:
    """Decode a QOI stream to an (h, w, channels) uint8 array, or
    ``None`` for anything malformed: bad magic, zero/absurd dims, a
    stream that runs dry or overruns the pixel count, or a missing
    end marker."""
    if data is None or len(data) < 14 + 8 or data[:4] != _MAGIC:
        return None
    w, h, ch, _cs = struct.unpack_from(">IIBB", data, 4)
    if ch not in (3, 4) or w == 0 or h == 0 or w * h > 1 << 24:
        return None
    n = w * h
    out = np.zeros((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    end = len(data) - 8
    i = 0
    while i < n:
        if pos >= end:
            return None
        b1 = data[pos]
        pos += 1
        if b1 == 0xFE:  # RGB
            if pos + 3 > end:
                return None
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif b1 == 0xFF:  # RGBA
            if pos + 4 > end:
                return None
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        elif b1 >> 6 == 0:  # INDEX
            r, g, b, a = index[b1]
        elif b1 >> 6 == 1:  # DIFF
            r = (r + ((b1 >> 4) & 3) - 2) % 256
            g = (g + ((b1 >> 2) & 3) - 2) % 256
            b = (b + (b1 & 3) - 2) % 256
        elif b1 >> 6 == 2:  # LUMA
            if pos >= end:
                return None
            dg = (b1 & 0x3F) - 32
            b2 = data[pos]
            pos += 1
            r = (r + dg + ((b2 >> 4) & 0xF) - 8) % 256
            g = (g + dg) % 256
            b = (b + dg + (b2 & 0xF) - 8) % 256
        else:  # RUN
            run = (b1 & 0x3F) + 1
            if run > 62 or i + run > n:
                return None
            out[i:i + run] = (r, g, b, a)
            i += run
            continue
        index[(r * 3 + g * 5 + b * 7 + a * 11) % 64] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if data[end:end + 8] != _END:
        return None
    return out[:, :ch].reshape(h, w, ch)


def synth_qoi(doc_id: int) -> bytes:
    """Deterministic QOI fixture for ``doc_id``, built so ONE image
    exercises every opcode family: constant rows (y%4==0 → RUN then
    INDEX on later rows), gradient-by-7 rows (y%4==2 → LUMA, with RGB
    literals at the %48 wrap), and md5-blocked rows whose in-block
    steps are +1 on g/b only (→ DIFF) with literal RGB at block seams.
    Pixel values are pure functions of (doc_id, x, y) so a DuckDB
    oracle recomputes the exact mean without running the codec."""
    w = 10 + doc_id % 9
    h = 8 + doc_id % 7
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            if y % 4 == 0:
                px[y, x] = (9, 9, 9)
            elif y % 4 == 2:
                c = (16 + (x * 7) % 48 + y) % 256
                px[y, x] = (c, c, c)
            else:
                v = int(
                    hashlib.md5(
                        f"qo:{doc_id}:{x // 3}:{y}".encode()
                    ).hexdigest()[:2],
                    16,
                )
                s = (v + x % 3) % 256
                px[y, x] = (v, s, s)
    return encode_qoi(px)
