"""Dependency-free raster image codecs (BMP 24-bit, PPM P6, PNG 8-bit) in
pure numpy + stdlib zlib.

De-stubs the ``codec="real"`` path of :mod:`geowave_spark.functions.multimodal`
for formats whose encodings need no image library, so the container
constraint (no PIL/libav) doesn't apply.  All are lossless for 8-bit RGB,
which makes round-trips exactly testable.

Formats:
- **BMP**: 14-byte file header + 40-byte BITMAPINFOHEADER, 24 bpp, BI_RGB
  (uncompressed), rows bottom-up and padded to 4 bytes, BGR byte order.
  Top-down files (negative height) are accepted on decode.
- **PPM (P6)**: ASCII header ``P6 <w> <h> <maxval>`` (with comment support)
  followed by raw RGB bytes; maxval must be <= 255.
- **PNG**: 8-bit greyscale / RGB / RGBA (color types 0, 2, 6), no
  interlace.  DEFLATE via stdlib :mod:`zlib`; all five scanline filters
  (None/Sub/Up/Average/Paeth) are unfiltered on decode, and the encoder can
  emit any fixed filter so every unfilter path is round-trip testable.
- **JPEG (baseline)**: lives in :mod:`geowave_spark.functions.jpegcodec`
  (DCT + canonical Huffman in pure numpy); :func:`decode_image` dispatches
  to it on the 0xFFD8 magic.
- **GIF (87a/89a)**: lives in :mod:`geowave_spark.functions.gifcodec`
  (variable-width LZW, interlace, transparency); dispatched on the GIF8
  magic.
- **TIFF (baseline)**: lives in :mod:`geowave_spark.functions.tiffcodec`
  (uncompressed + PackBits strips, 8-bit grey/RGB/RGBA, II/MM byte order);
  dispatched on the II*/MM* magic.  Progressive JPEG and LZW/JPEG-in-TIFF
  still raise with the integration point documented in :func:`decode_image`.
"""

from __future__ import annotations

import struct
import zlib

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def png_bytes(rgb: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an 8-bit truecolor PNG.

    ``filter_type`` applies that scanline filter (0=None, 1=Sub, 2=Up,
    3=Average, 4=Paeth) to EVERY row — not the adaptive per-row choice a
    production encoder makes, but it lets tests drive each unfilter path in
    :func:`png_decode` with bit-exact round-trips.
    """
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown PNG filter {filter_type}")
    h, w = rgb.shape[:2]
    raw = rgb.reshape(h, w * 3).astype(np.int32)
    prior = np.zeros(w * 3, dtype=np.int32)
    lines = bytearray()
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prior
        elif filter_type == 3:
            filt = cur - (left + prior) // 2
        else:  # Paeth
            up_left = np.concatenate([np.zeros(3, np.int32), prior[:-3]])
            filt = cur - _paeth_predictor(left, prior, up_left)
        lines.append(filter_type)
        lines.extend((filt % 256).astype(np.uint8).tobytes())
        prior = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth_predictor(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized (a=left, b=above, c=upper-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_decode(buf: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (grey / RGB / RGBA) into an
    (h, w, 3) uint8 RGB array.  Grey is replicated across channels; an alpha
    channel is dropped (payload pixels, not compositing, are the contract).
    CRCs are verified; interlaced, paletted, and 16-bit files raise."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, 0
    h = depth = ctype = interlace = -1
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        name = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(buf):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if zlib.crc32(name + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {name!r}")
        if name == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif name == b"IDAT":
            idat.extend(data)
        elif name == b"IEND":
            break
        pos += 12 + length
    if depth != 8 or ctype not in (0, 2, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} color_type={ctype} "
            f"interlace={interlace} (8-bit grey/RGB/RGBA, no interlace)"
        )
    bpp = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * bpp
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG DEFLATE stream: {e}") from None
    if raw.size != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    raw = raw.reshape(h, stride + 1)
    recon = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft, line = int(raw[y, 0]), raw[y, 1:].astype(np.int32)
        if ft == 0:
            row = line
        elif ft == 1:  # Sub: per channel-lane cumulative sum mod 256
            row = np.cumsum(line.reshape(w, bpp), axis=0).reshape(stride) % 256
        elif ft == 2:  # Up
            row = (line + prior) % 256
        elif ft in (3, 4):  # Average / Paeth: left-recon dependency -> per-pixel
            row = np.zeros(stride, dtype=np.int32)
            left = np.zeros(bpp, dtype=np.int32)
            up_left = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                sl = slice(x * bpp, (x + 1) * bpp)
                up = prior[sl]
                if ft == 3:
                    px = (line[sl] + (left + up) // 2) % 256
                else:
                    px = (line[sl] + _paeth_predictor(left, up, up_left)) % 256
                row[sl] = px
                left, up_left = px, up
        else:
            raise ValueError(f"unknown PNG filter {ft} on row {y}")
        recon[y] = row.astype(np.uint8)
        prior = row
    if ctype == 0:
        return np.ascontiguousarray(
            np.repeat(recon.reshape(h, w, 1), 3, axis=2)
        )
    px = recon.reshape(h, w, bpp)
    return np.ascontiguousarray(px[:, :, :3])


def decode_image(buf: bytes) -> np.ndarray:
    """Magic-byte dispatch: BMP, PPM, PNG, GIF, baseline TIFF, or baseline
    JPEG payload -> (h, w, 3) uint8 RGB.

    Unrecognized payloads raise here — this function is the integration
    point for a real image library (PIL/libav): add a branch on the magic
    bytes returning the same (h, w, 3) uint8 contract and every downstream
    operator (decode_media, extract_features, resize) works unchanged.
    """
    if buf[:2] == b"BM":
        return bmp_decode(buf)
    if buf[:2] == b"P6":
        return ppm_decode(buf)
    if buf[:8] == _PNG_SIG:
        return png_decode(buf)
    if buf[:4] == b"GIF8":
        from geowave_spark.functions.gifcodec import gif_decode

        return gif_decode(buf)
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        from geowave_spark.functions.tiffcodec import tiff_decode

        return tiff_decode(buf)
    if buf[:2] == b"\xff\xd8":
        from geowave_spark.functions.jpegcodec import jpeg_decode

        return jpeg_decode(buf)
    raise ValueError(f"unrecognized image payload (magic {buf[:2]!r})")
