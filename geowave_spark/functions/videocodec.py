"""Dependency-free Y4M (YUV4MPEG2) video codec in pure numpy.

De-stubs the video modality of :mod:`geowave_spark.functions.multimodal`:
Y4M is the uncompressed interchange format the mjpegtools/ffmpeg ecosystem
uses — an ASCII stream header, then per-frame ``FRAME`` markers followed by
raw planes — so, like BMP/PPM/WAV, it needs no media library.

Colorspaces:
- **Cmono**: one luma plane per frame.  8-bit round-trips are bit-exact,
  which makes it the testing contract.
- **C444**: full-resolution YCbCr planes; decode converts to RGB via BT.601
  (the Y4M default), encode does the forward conversion.  Integer rounding
  makes round-trips near-exact (within +/-2 per channel), never exact —
  inherent to YCbCr, not a codec defect.

Compressed video (H.264/VP9/...) genuinely needs a library; unrecognized
magic raises in :func:`decode_video_payload` with the libav integration
point documented.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2 "


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """BT.601 full-swing RGB -> YCbCr (uint8 in, uint8 out)."""
    from geowave_spark.functions.colorspace import rgb_to_ycbcr_f

    return np.clip(np.rint(rgb_to_ycbcr_f(rgb)), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    from geowave_spark.functions.colorspace import ycbcr_to_rgb_u8

    return ycbcr_to_rgb_u8(ycc)


def y4m_bytes(
    frames: np.ndarray, fps: int = 25, colorspace: str = "mono"
) -> bytes:
    """Encode frames as a YUV4MPEG2 stream.

    ``colorspace="mono"`` takes (n, h, w) uint8 luma frames (bit-exact);
    ``colorspace="444"`` takes (n, h, w, 3) uint8 RGB frames and converts to
    BT.601 YCbCr planes (lossy by integer rounding).
    """
    frames = np.asarray(frames, dtype=np.uint8)
    if colorspace == "mono":
        if frames.ndim != 3:
            raise ValueError("mono expects (n, h, w) luma frames")
        n, h, w = frames.shape
        tag = b"Cmono"
        planes = [frames[i].tobytes() for i in range(n)]
    elif colorspace == "444":
        if frames.ndim != 4 or frames.shape[3] != 3:
            raise ValueError("444 expects (n, h, w, 3) RGB frames")
        n, h, w = frames.shape[:3]
        tag = b"C444"
        ycc = _rgb_to_ycbcr(frames)
        planes = [
            b"".join(np.ascontiguousarray(ycc[i, :, :, c]).tobytes() for c in range(3))
            for i in range(n)
        ]
    else:
        raise ValueError(f"unknown colorspace {colorspace!r}")
    hdr = _MAGIC + f"W{w} H{h} F{fps}:1 Ip A1:1 ".encode() + tag + b"\n"
    return hdr + b"".join(b"FRAME\n" + p for p in planes)


def y4m_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a YUV4MPEG2 stream into ((n, h, w, 3) uint8 RGB frames, fps).

    Mono luma is replicated across RGB channels; C444 converts via BT.601.
    Subsampled colorspaces (C420/C422) and per-frame parameter overrides
    raise — add the plane upsampling here to extend coverage.
    """
    if buf[:10] != _MAGIC:
        raise ValueError("not a YUV4MPEG2 payload")
    nl = buf.index(b"\n")
    w = h = fps = -1
    ctag = "420"  # the Y4M default when no C tag is present
    for tok in buf[10:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            # rational F<num>:<den> (e.g. NTSC F30000:1001 ~ 29.97)
            num, _, den = t[1:].partition(":")
            fps = max(1, round(int(num) / max(1, int(den or "1"))))
        elif t[0] == "C":
            ctag = t[1:]
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if ctag not in ("mono", "444"):
        raise ValueError(
            f"unsupported Y4M colorspace C{ctag} (mono/444 only; add chroma "
            "upsampling for C420/C422)"
        )
    frame_px = h * w * (1 if ctag == "mono" else 3)
    pos, frames = nl + 1, []
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        if fnl > pos + 5:
            raise ValueError("per-frame parameters not supported")
        pos = fnl + 1
        if pos + frame_px > len(buf):
            raise ValueError("truncated Y4M frame")
        plane = np.frombuffer(buf, dtype=np.uint8, count=frame_px, offset=pos)
        if ctag == "mono":
            frames.append(np.repeat(plane.reshape(h, w, 1), 3, axis=2))
        else:
            frames.append(_ycbcr_to_rgb(plane.reshape(3, h, w).transpose(1, 2, 0)))
        pos += frame_px
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return np.ascontiguousarray(np.stack(frames)), fps


def decode_video_payload(buf: bytes) -> tuple[np.ndarray, int]:
    """Magic-byte dispatch for video payloads -> ((n, h, w, 3) RGB, fps).

    The integration point for compressed video (libav/PyAV): add a branch on
    the container magic returning the same contract and the downstream
    mapInPandas operators work unchanged.
    """
    if buf[:10] == _MAGIC:
        return y4m_decode(buf)
    raise ValueError(f"unrecognized video payload (magic {buf[:4]!r})")
