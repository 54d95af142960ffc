"""Motion-JPEG-in-AVI video codec — pure struct + the existing JPEG codec.

Extends the video modality beyond uncompressed Y4M to the compressed
format GIS-adjacent capture hardware actually emits (drone cameras,
surveillance DVRs, traffic cams): an AVI RIFF container whose ``00dc``
chunks are ordinary JPEG frames.  Everything hard was already built —
:mod:`geowave_spark.functions.jpegcodec` decodes the frames — so this
module is only the container walk plus one real-world compatibility
quirk: many MJPEG writers omit the Huffman tables from each frame (the
OpenDML convention says decoders must assume the Annex-K typical tables),
so :func:`_ensure_dht` splices them in when a frame has no DHT segment.

Decoder: tolerant RIFF/LIST walk (skips idx1, unknown chunks, junk
padding), frame chunks ``00dc``/``00db``, fps from the ``strh`` stream
header's rate/scale, consistent-dimension check.  Encoder (fixtures and
export): minimal standards-shaped hdrl (avih + strl/strh/strf) + movi,
optional ``omit_dht=True`` to exercise the table-injection path.
H.264/VP9 payloads still genuinely need a library and keep raising in
``videocodec.decode_video_payload``.
"""

from __future__ import annotations

import struct

import numpy as np


def _ensure_dht(jpeg: bytes) -> bytes:
    """Insert the Annex-K typical Huffman tables before SOS when the frame
    carries no DHT segment (the MJPEG/OpenDML omission convention)."""
    pos = 2
    n = len(jpeg)
    sos_at = None
    while pos + 4 <= n and jpeg[pos] == 0xFF:
        marker = jpeg[pos + 1]
        if marker == 0xC4:
            return jpeg  # tables present
        if marker == 0xDA:
            sos_at = pos
            break
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        pos += 2 + seglen
    if sos_at is None:
        raise ValueError("MJPEG frame has no SOS marker")
    from geowave_spark.functions.jpegcodec import (
        _AC_CHROMA_BITS,
        _AC_CHROMA_VALS,
        _AC_LUMA_BITS,
        _AC_LUMA_VALS,
        _DC_CHROMA_BITS,
        _DC_CHROMA_VALS,
        _DC_LUMA_BITS,
        _DC_LUMA_VALS,
    )

    dht = bytearray()
    for tc, th, bits, vals in (
        (0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS),
        (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS),
        (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
        (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
    ):
        dht += bytes([0xFF, 0xC4]) + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
        dht += bytes(bits) + bytes(vals)
    return jpeg[:sos_at] + bytes(dht) + jpeg[sos_at:]


def _strip_dht(jpeg: bytes) -> bytes:
    """Remove every DHT segment (fixture path for the omission quirk)."""
    out = bytearray(jpeg[:2])
    pos = 2
    n = len(jpeg)
    while pos + 4 <= n and jpeg[pos] == 0xFF:
        marker = jpeg[pos + 1]
        if marker == 0xDA:
            out += jpeg[pos:]
            return bytes(out)
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:
            out += jpeg[pos : pos + 2]
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker != 0xC4:
            out += jpeg[pos : pos + 2 + seglen]
        pos += 2 + seglen
    raise ValueError("MJPEG frame has no SOS marker")


def avi_mjpeg_bytes(
    frames: np.ndarray, fps: int = 25, quality: int = 90, omit_dht: bool = False
) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as an MJPEG AVI."""
    from geowave_spark.functions.jpegcodec import jpeg_bytes

    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("expected (n, h, w, 3) RGB frames")
    n, h, w = frames.shape[:3]
    if n == 0 or fps <= 0:
        raise ValueError("need at least one frame and a positive fps")
    payloads = []
    for f in frames:
        j = jpeg_bytes(f, quality=quality)
        payloads.append(_strip_dht(j) if omit_dht else j)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    # AVIMAINHEADER is 56 bytes: 10 fields + dwReserved[4], all DWORDs
    avih = struct.pack(
        "<14I",
        1_000_000 // fps, 0, 0, 0x10, n, 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    # flags, priority, language, initialFrames, scale, rate, start, length,
    # suggestedBufferSize, quality (-1 = default), sampleSize, rcFrame
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, n, 0, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_mjpeg_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode an MJPEG AVI into ((n, h, w, 3) uint8 RGB frames, fps)."""
    from geowave_spark.functions.jpegcodec import jpeg_decode

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    rate = scale = None
    micro_per_frame = None
    payloads: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal rate, scale, micro_per_frame
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError(f"truncated AVI chunk {fourcc!r}")
            if fourcc == b"LIST":
                walk(body_start + 4, body_start + size)
            elif fourcc == b"strh" and size >= 32 and buf[body_start : body_start + 4] == b"vids":
                scale, rate = struct.unpack_from("<II", buf, body_start + 20)
            elif fourcc == b"avih" and size >= 4:
                (micro_per_frame,) = struct.unpack_from("<I", buf, body_start)
            elif fourcc in (b"00dc", b"00db") and size:
                payloads.append(buf[body_start : body_start + size])
            pos = body_start + size + (size & 1)

    walk(12, len(buf))
    if not payloads:
        raise ValueError("AVI contains no video frames")
    if rate and scale:
        fps = max(1, round(rate / scale))
    elif micro_per_frame:
        fps = max(1, round(1_000_000 / micro_per_frame))
    else:
        fps = 25
    frames = []
    dims = None
    for p in payloads:
        if p[:2] != b"\xff\xd8":
            raise ValueError("AVI video chunk is not a JPEG frame")
        f = jpeg_decode(_ensure_dht(p))
        if dims is None:
            dims = f.shape
        elif f.shape != dims:
            raise ValueError("MJPEG frames disagree on dimensions")
        frames.append(f)
    return np.ascontiguousarray(np.stack(frames)), fps
