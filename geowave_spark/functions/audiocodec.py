"""Dependency-free WAV (RIFF PCM) audio codec in pure numpy + struct.

De-stubs the audio modality of :mod:`geowave_spark.functions.multimodal` the
same way :mod:`geowave_spark.functions.imagecodec` de-stubs images: WAV's
canonical form is a trivial chunked header over raw PCM samples, so no audio
library is required and 16-bit round-trips are bit-exact.

Scope: PCM (format tag 1) at 16-bit depth, any channel count / sample rate.
Compressed formats (MP3/AAC/FLAC) genuinely need a library; their payloads
raise in :func:`decode_audio_payload` with the integration point documented.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_bytes(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode an (n,) or (n, channels) int16 sample array as a PCM WAV."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("expected (n,) or (n, channels) int16 samples")
    n, ch = samples.shape
    body = np.ascontiguousarray(samples).tobytes()  # interleaved LE int16
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    riff_body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM 16-bit WAV into ((n, channels) int16 samples, rate).

    Walks RIFF chunks (tolerating extras like LIST/fact before data);
    rejects non-PCM format tags and non-16-bit depths explicitly.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    ch = rate = bits = tag = None
    data: bytes | None = None
    while pos + 8 <= len(buf):
        name = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        chunk = buf[pos + 8 : pos + 8 + size]
        if len(chunk) != size:
            raise ValueError(f"truncated WAV chunk {name!r}")
        if name == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", chunk, 0)
        elif name == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if tag is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if tag != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV: format_tag={tag} bits={bits} (PCM 16-bit only; "
            "compressed audio needs a real codec library)"
        )
    n = len(data) // (ch * 2)
    samples = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return np.ascontiguousarray(samples), rate


def decode_audio_payload(buf: bytes) -> tuple[np.ndarray, int]:
    """Magic-byte dispatch for audio payloads -> (samples int16, rate).

    The integration point for real compressed-audio support (libav/soundfile):
    add a branch on the container magic returning the same contract and the
    downstream mapInPandas operators work unchanged.
    """
    if buf[:4] == b"RIFF":
        return wav_decode(buf)
    raise ValueError(f"unrecognized audio payload (magic {buf[:4]!r})")
