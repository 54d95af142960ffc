"""Dependency-free raster image codecs (BMP 24-bit, PPM P6) in pure numpy.

De-stubs the ``codec="real"`` path of :mod:`geowave_spark.functions.multimodal`
for two formats whose encodings are trivial header + pixel layouts — no
image library required, so the container constraint (no PIL/libav) doesn't
apply.  Both are lossless for 8-bit RGB, which makes round-trips exactly
testable.

Formats:
- **BMP**: 14-byte file header + 40-byte BITMAPINFOHEADER, 24 bpp, BI_RGB
  (uncompressed), rows bottom-up and padded to 4 bytes, BGR byte order.
  Top-down files (negative height) are accepted on decode.
- **PPM (P6)**: ASCII header ``P6 <w> <h> <maxval>`` (with comment support)
  followed by raw RGB bytes; maxval must be <= 255.
"""

from __future__ import annotations

import struct

import numpy as np


def bmp_bytes(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w = rgb.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # bottom-up rows, BGR order, each row padded to a 4-byte boundary
    bgr = rgb[::-1, :, ::-1]
    if pad:
        rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    data_offset = 14 + 40
    file_size = data_offset + len(body)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + body


def bmp_decode(buf: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB array."""
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _, _, _, data_offset) = struct.unpack_from("<2sIHHI", buf, 0)
    (hdr_size, w, h, planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", buf, 14
    )
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = data_offset + stride * h
    if len(buf) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


def ppm_bytes(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a binary PPM (P6)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w = rgb.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()


def ppm_decode(buf: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) into an (h, w, 3) uint8 RGB array."""
    if buf[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and '#' comments between header fields
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace byte after maxval precedes the raster
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    if len(buf) < pos + need:
        raise ValueError("truncated PPM payload")
    arr = np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos)
    return np.ascontiguousarray(arr.reshape(h, w, 3))


def decode_image(buf: bytes) -> np.ndarray:
    """Magic-byte dispatch: BMP or PPM payload -> (h, w, 3) uint8 RGB."""
    if buf[:2] == b"BM":
        return bmp_decode(buf)
    if buf[:2] == b"P6":
        return ppm_decode(buf)
    raise ValueError(f"unrecognized image payload (magic {buf[:2]!r})")
