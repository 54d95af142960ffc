"""Dependency-free baseline TIFF codec (pure numpy + struct).

De-stubs the TIFF branch of
:func:`geowave_spark.functions.imagecodec.decode_image` for the baseline
profile (TIFF 6.0 spec, part 1): uncompressed or PackBits-compressed,
8-bit grayscale (both polarities), palette-color (ColorMap), or
RGB/RGBA, strip-organized, either byte order (II/MM).  That covers
scanner/GIS-style output; LZW/JPEG-in-TIFF, tiled organization,
planar-separate, and separated/YCbCr photometrics raise with the
integration point named — the same honesty contract as the other
codecs — and malformed/truncated payloads raise ValueError, never a
bare struct.error.

The encoder writes single-IFD little-endian RGB strips (optionally
PackBits) for fixtures and export; round-trips are bit-exact.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 §8)
_WIDTH, _LENGTH, _BITS, _COMPRESSION, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFFSETS, _SAMPLES, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR, _COLORMAP = 284, 320
_TILE_TAGS = (322, 323, 324, 325)  # TileWidth/Length/Offsets/ByteCounts

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_entries(buf: bytes, order: str) -> dict[int, list[int]]:
    (ifd_off,) = struct.unpack_from(order + "I", buf, 4)
    (n,) = struct.unpack_from(order + "H", buf, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        off = ifd_off + 2 + 12 * i
        tag, ttype, count = struct.unpack_from(order + "HHI", buf, off)
        if ttype not in _TYPE_SIZE:
            continue  # unknown field type: skip per spec
        size = _TYPE_SIZE[ttype] * count
        if size > len(buf):
            # a valid entry's payload fits in the file; a corrupt count
            # would otherwise build a giant format string below
            raise ValueError(f"TIFF entry {tag} overruns the buffer")
        if size <= 4:
            vpos = off + 8
        else:
            (vpos,) = struct.unpack_from(order + "I", buf, off + 8)
        fmt = {1: "B", 3: "H", 4: "I"}.get(ttype)
        if fmt is None:
            continue  # ASCII/RATIONAL tags are irrelevant here
        tags[tag] = list(struct.unpack_from(order + fmt * count, buf, vpos))
    return tags


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out.extend(data[i : i + n + 1])
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out.extend(data[i : i + 1] * (257 - n))
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expected])


def tiff_decode(buf: bytes) -> np.ndarray:
    """Decode a baseline TIFF into an (h, w, 3) uint8 RGB array."""
    if buf[:4] == b"II*\x00":
        order = "<"
    elif buf[:4] == b"MM\x00*":
        order = ">"
    else:
        raise ValueError("not a TIFF payload")
    try:
        t = _read_entries(buf, order)
    except (struct.error, IndexError) as e:
        # malformed offsets/counts in real-world corrupt files must surface
        # as the same ValueError contract every other codec keeps
        raise ValueError(f"truncated TIFF: {e}") from None
    if any(tag in t for tag in _TILE_TAGS):
        raise ValueError(
            "tiled TIFF not supported (baseline strip organization only; "
            "plug PIL into imagecodec.decode_image for tiled files)"
        )
    try:
        w, h = t[_WIDTH][0], t[_LENGTH][0]
        offsets, counts = t[_STRIP_OFFSETS], t[_STRIP_COUNTS]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from None
    spp = t.get(_SAMPLES, [1])[0]
    bits = t.get(_BITS, [8])
    comp = t.get(_COMPRESSION, [1])[0]
    planar = t.get(_PLANAR, [1])[0]
    photo = t.get(_PHOTO, [1 if spp == 1 else 2])[0]
    if any(b != 8 for b in bits) or spp not in (1, 3, 4) or planar != 1:
        raise ValueError(
            f"unsupported TIFF: bits={bits} samples={spp} planar={planar} "
            "(baseline 8-bit chunky grey/RGB/RGBA only; plug PIL in "
            "imagecodec.decode_image for the rest)"
        )
    if photo not in (0, 1, 2, 3):
        # 5=separated (CMYK), 6=YCbCr, ...: decoding these as RGB would be
        # silent garbage, not a lossy approximation
        raise ValueError(
            f"unsupported TIFF photometric {photo} (MinIsWhite/MinIsBlack/"
            "RGB/palette only; plug PIL into imagecodec.decode_image)"
        )
    if (photo == 2) != (spp >= 3) or (photo == 3 and spp != 1):
        raise ValueError(
            f"inconsistent TIFF photometric {photo} for samples={spp}"
        )
    if comp not in (1, 32773):
        raise ValueError(
            f"unsupported TIFF compression {comp} (1=none, 32773=PackBits; "
            "LZW/JPEG-in-TIFF need a library)"
        )
    rows_per_strip = t.get(_ROWS_PER_STRIP, [h])[0] or h
    stride = w * spp
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = bytes(buf[off : off + cnt])
        if len(strip) != cnt:
            raise ValueError("truncated TIFF strip")
        if comp == 32773:
            n_rows = min(rows_per_strip, h - si * rows_per_strip)
            strip = _packbits_decode(strip, n_rows * stride)
        raw.extend(strip)
    if len(raw) < h * stride:
        raise ValueError("TIFF strip data smaller than image")
    px = np.frombuffer(bytes(raw[: h * stride]), dtype=np.uint8).reshape(h, w, spp)
    if spp == 1:
        if photo == 3:  # palette-color: indices through the ColorMap
            cmap = t.get(_COLORMAP)
            if cmap is None or len(cmap) != 3 * 256:
                raise ValueError("palette TIFF missing or short ColorMap")
            # ColorMap is 16-bit reds, then greens, then blues; 8-bit
            # writers expand with v*257, so >>8 recovers the byte exactly
            pal = (np.array(cmap, dtype=np.uint16).reshape(3, 256).T >> 8).astype(
                np.uint8
            )
            return np.ascontiguousarray(pal[px[:, :, 0]])
        if photo == 0:  # WhiteIsZero: invert to the usual polarity
            px = 255 - px
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    return np.ascontiguousarray(px[:, :, :3])  # alpha dropped, like PNG


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits (the spec's recommended scope)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and row[j + 1] == row[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out.append(257 - run)
            out.append(row[i])
            i = j + 1
        else:
            # literal segment until the next >=3 run (2-runs inside literals
            # are cheaper left literal) or 128 bytes
            k = i
            while k < n and k - i < 128:
                if k + 2 < n and row[k] == row[k + 1] == row[k + 2]:
                    break
                k += 1
            out.append(k - i - 1)
            out.extend(row[i:k])
            i = k
    return bytes(out)


def tiff_bytes(
    rgb: np.ndarray,
    packbits: bool = False,
    rows_per_strip: int = 4,
    gps: tuple[float, float] | None = None,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a little-endian baseline TIFF
    (multiple strips so the strip walk is actually exercised).

    ``gps=(lat, lon)`` embeds an EXIF GPS IFD (pointer tag 0x8825) — the
    geotagged-media fixture path for
    :func:`geowave_spark.functions.exif.gps_from_media`.
    """
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w = rgb.shape[:2]
    stride = w * 3
    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = rgb[y0 : y0 + rows_per_strip].tobytes()
        strips.append(_packbits_encode(chunk) if packbits else chunk)

    n_entries = 9 if gps is None else 10
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_entries + 4
    # BitsPerSample needs 3 SHORTs (6 bytes > 4): store out-of-line first
    bits_off = data_off
    data_off += 6
    gps_blk = b""
    gps_off = 0
    if gps is not None:
        from geowave_spark.functions.exif import gps_ifd_bytes

        gps_off = data_off
        gps_blk = gps_ifd_bytes(gps[0], gps[1], gps_off)
        data_off += len(gps_blk)
    n_strips = len(strips)
    if n_strips > 1:
        offsets_off = data_off
        data_off += 4 * n_strips
        counts_off = data_off
        data_off += 4 * n_strips
    strip_offsets = []
    pos = data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    def entry(tag, ttype, count, value):
        return struct.pack("<HHI", tag, ttype, count) + struct.pack("<I", value)

    e = [
        entry(_WIDTH, 4, 1, w),
        entry(_LENGTH, 4, 1, h),
        entry(_BITS, 3, 3, bits_off),
        entry(_COMPRESSION, 3, 1, 32773 if packbits else 1),
        entry(_PHOTO, 3, 1, 2),  # RGB
        entry(
            _STRIP_OFFSETS, 4, n_strips,
            strip_offsets[0] if n_strips == 1 else offsets_off,
        ),
        entry(_SAMPLES, 3, 1, 3),
        entry(_ROWS_PER_STRIP, 4, 1, rows_per_strip),
        entry(
            _STRIP_COUNTS, 4, n_strips,
            len(strips[0]) if n_strips == 1 else counts_off,
        ),
    ]
    if gps is not None:
        e.append(entry(0x8825, 4, 1, gps_off))  # GPS IFD pointer (sorted last)
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", n_entries) + b"".join(e) + struct.pack("<I", 0)
    out += struct.pack("<HHH", 8, 8, 8)
    out += gps_blk
    if n_strips > 1:
        out += struct.pack(f"<{n_strips}I", *strip_offsets)
        out += struct.pack(f"<{n_strips}I", *(len(s) for s in strips))
    for s in strips:
        out += s
    return bytes(out)
