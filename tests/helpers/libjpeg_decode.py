"""Subprocess helper for tests/test_jpeg_libjpeg.py: decode a JPEG via
the system libjpeg.so.62 through ctypes and save the pixels as .npy.
Runs in its own process because libjpeg's default error handler calls
exit() — a malformed input must never take the pytest process down.

Usage: python libjpeg_decode.py in.jpg out.npy expected_w expected_h
"""
import ctypes
import struct as st
import sys

import numpy as np

STRUCT_SIZE = 632  # sizeof(struct jpeg_decompress_struct), libjpeg62


def main() -> int:
    j = ctypes.CDLL("libjpeg.so.62")
    j.jpeg_std_error.restype = ctypes.c_void_p
    j.jpeg_std_error.argtypes = [ctypes.c_void_p]
    j.jpeg_CreateDecompress.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_size_t]
    j.jpeg_mem_src.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_ulong]
    j.jpeg_read_header.restype = ctypes.c_int
    j.jpeg_read_header.argtypes = [ctypes.c_void_p, ctypes.c_int]
    j.jpeg_start_decompress.restype = ctypes.c_int
    j.jpeg_start_decompress.argtypes = [ctypes.c_void_p]
    j.jpeg_read_scanlines.restype = ctypes.c_uint
    j.jpeg_read_scanlines.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint]
    j.jpeg_finish_decompress.argtypes = [ctypes.c_void_p]
    j.jpeg_destroy_decompress.argtypes = [ctypes.c_void_p]

    data = open(sys.argv[1], "rb").read()
    errbuf = ctypes.create_string_buffer(1024)  # must outlive cinfo
    errp = j.jpeg_std_error(errbuf)
    cinfo = ctypes.create_string_buffer(STRUCT_SIZE)
    ctypes.cast(cinfo, ctypes.POINTER(ctypes.c_void_p))[0] = errp
    j.jpeg_CreateDecompress(cinfo, 62, STRUCT_SIZE)
    buf = ctypes.create_string_buffer(data, len(data))
    j.jpeg_mem_src(cinfo, buf, len(data))
    if j.jpeg_read_header(cinfo, 1) != 1:
        return 2
    if j.jpeg_start_decompress(cinfo) != 1:
        return 2

    # self-calibrate field offsets: (output_width, output_height) is
    # the LAST adjacent u32 pair equal to the image dims (image_* come
    # first in the struct); output_components is the first int in
    # {1, 3} shortly after it
    raw = bytes(cinfo.raw)
    w, h = int(sys.argv[3]), int(sys.argv[4])
    pairs = [off for off in range(0, STRUCT_SIZE - 16, 4)
             if st.unpack_from("<II", raw, off) == (w, h)]
    if not pairs:
        return 3
    out_off = pairs[-1]
    comp = None
    for off in range(out_off + 8, out_off + 40, 4):
        (v,) = st.unpack_from("<i", raw, off)
        if v in (1, 3):
            comp = v
            break
    if comp is None:
        return 3

    rowlen = w * comp
    rowbuf = ctypes.create_string_buffer(rowlen)
    rp = (ctypes.c_void_p * 1)(ctypes.cast(rowbuf, ctypes.c_void_p))
    rows = []
    for _y in range(h):
        if j.jpeg_read_scanlines(cinfo, rp, 1) != 1:
            return 4
        rows.append(rowbuf.raw[:rowlen])
    j.jpeg_finish_decompress(cinfo)
    j.jpeg_destroy_decompress(cinfo)
    px = np.frombuffer(b"".join(rows), np.uint8).reshape(h, w, comp)
    if comp == 1:
        px = np.repeat(px, 3, axis=2)
    np.save(sys.argv[2], px)
    return 0


if __name__ == "__main__":
    sys.exit(main())
