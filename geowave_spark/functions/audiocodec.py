"""Dependency-free WAV audio codec in pure numpy + struct.

De-stubs the audio modality of :mod:`geowave_spark.functions.multimodal` the
same way :mod:`geowave_spark.functions.imagecodec` de-stubs images: WAV's
canonical form is a trivial chunked header over raw PCM samples, so no audio
library is required and 16-bit round-trips are bit-exact.

Scope:

- **PCM** (format tag 1) at 16-bit depth, any channel count / sample rate
  — lossless, bit-exact round-trips.
- **G.711 A-law / mu-law** (tags 6 / 7): the 8-bit logarithmic companding
  telephony corpora use.  Decode expands via the ITU-T G.711 segment
  formulas (pinned by the idempotency law: every 8-bit code re-encodes to
  itself); encode exists for fixtures/export.
- **IMA ADPCM** (tag 0x11): 4-bit block-based differential coding (the
  "DVI/IMA" WAV variant), mono or stereo, any block size; the block
  header's predictor is sample 0 per the IMA spec, and the optional
  ``fact`` chunk trims the final block.  Lossy: pinned by SNR bounds,
  exact block-header samples, and an independently hand-stepped known
  vector (tests re-derive the step arithmetic scalar-by-scalar).

Truly entropy-coded formats (MP3/AAC/FLAC) genuinely need a library; their
payloads raise in :func:`decode_audio_payload` with the integration point
documented.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- G.711

_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def _ulaw_decode_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.int64)
    u = ~codes & 0xFF
    t = (((u & 0x0F) << 3) + _ULAW_BIAS) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.int64)
    a = codes ^ 0x55
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


_ULAW_TABLE = _ulaw_decode_table()
_ALAW_TABLE = _alaw_decode_table()


def ulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 -> 8-bit mu-law codes (ITU-T G.711)."""
    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    exp = np.clip(np.floor(np.log2(mag)).astype(np.int64) - 7, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 -> 8-bit A-law codes (ITU-T G.711)."""
    x = np.asarray(samples, dtype=np.int64)
    sign = np.where(x >= 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 32767)
    exp = np.maximum(np.floor(np.log2(np.maximum(mag, 1))).astype(np.int64) - 7, 0)
    exp = np.clip(exp, 0, 7)
    mant = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    return ((sign | (exp << 4) | mant) ^ 0x55).astype(np.uint8)


# ----------------------------------------------------------- IMA ADPCM

_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int64,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2, dtype=np.int64)


def _ima_decode_nibbles(nibbles: np.ndarray, pred: int, idx: int) -> np.ndarray:
    """Decode a channel's nibble sequence given the block-header state."""
    out = np.empty(len(nibbles), dtype=np.int16)
    for i, n in enumerate(nibbles):
        step = int(_IMA_STEPS[idx])
        delta = step >> 3
        if n & 4:
            delta += step
        if n & 2:
            delta += step >> 1
        if n & 1:
            delta += step >> 2
        pred = pred - delta if n & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        out[i] = pred
        idx = max(0, min(88, idx + int(_IMA_INDEX[n])))
    return out


def _ima_encode_channel(x: np.ndarray, pred: int, idx: int) -> tuple[np.ndarray, int]:
    """Encode samples (after the header sample) into nibbles, tracking the
    decoder's reconstruction so decode(encode(x)) is self-consistent.
    Returns (nibbles, final step index)."""
    nibbles = np.empty(len(x), dtype=np.uint8)
    for i, s in enumerate(np.asarray(x, dtype=np.int64)):
        step = int(_IMA_STEPS[idx])
        diff = int(s) - pred
        n = 8 if diff < 0 else 0
        diff = abs(diff)
        if diff >= step:
            n |= 4
            diff -= step
        if diff >= step >> 1:
            n |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            n |= 1
        # mirror the decoder exactly
        delta = step >> 3
        if n & 4:
            delta += step
        if n & 2:
            delta += step >> 1
        if n & 1:
            delta += step >> 2
        pred = pred - delta if n & 8 else pred + delta
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(_IMA_INDEX[n])))
        nibbles[i] = n
    return nibbles, idx


def _ima_decode(data: bytes, ch: int, block_align: int, n_samples: int | None) -> np.ndarray:
    """Decode IMA ADPCM data chunk -> (n, ch) int16.

    The final block may be shorter than block_align (the in-the-wild
    convention for non-multiple sample counts); its trailing partial
    4-byte channel group, if any, is dropped."""
    if block_align < 4 * ch or (block_align - 4 * ch) % (4 * ch):
        raise ValueError(f"invalid IMA ADPCM block align {block_align} for {ch} ch")
    if len(data) == 0:
        out = np.zeros((0, ch), dtype=np.int16)
        if n_samples:
            raise ValueError("WAV fact chunk larger than decoded data")
        return out
    chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        if len(block) < 4 * ch:
            raise ValueError("truncated IMA ADPCM block header")
        preds, idxs = [], []
        for c in range(ch):
            pred, idx, _res = struct.unpack_from("<hBB", block, 4 * c)
            if idx > 88:
                raise ValueError("corrupt IMA ADPCM step index")
            preds.append(pred)
            idxs.append(idx)
        body_len = (len(block) - 4 * ch) // (4 * ch) * (4 * ch)
        body = np.frombuffer(block, dtype=np.uint8, count=body_len, offset=4 * ch)
        nibs = np.empty(len(body) * 2, dtype=np.uint8)
        nibs[0::2] = body & 0x0F  # low nibble first, per the IMA layout
        nibs[1::2] = body >> 4
        # channels alternate in 4-byte words = 8-nibble groups
        groups = nibs.reshape(-1, 8)
        for c in range(ch):
            mine = groups[c::ch].ravel()
            decoded = _ima_decode_nibbles(mine, preds[c], idxs[c])
            chans[c].append(np.concatenate([[np.int16(preds[c])], decoded]))
    out = np.stack([np.concatenate(c) for c in chans], axis=1)
    if n_samples is not None:
        if n_samples > len(out):
            raise ValueError("WAV fact chunk larger than decoded data")
        out = out[:n_samples]
    return np.ascontiguousarray(out)


def _ima_encode(samples: np.ndarray, block_align: int) -> bytes:
    """(n, ch) int16 -> IMA ADPCM data chunk bytes (pads the last block by
    repeating the final sample, standard practice)."""
    n, ch = samples.shape
    spb = (block_align - 4 * ch) * 2 // ch + 1
    out = bytearray()
    idx = [0] * ch
    for start in range(0, n, spb):
        blk = samples[start : start + spb]
        if len(blk) < spb:  # pad with the final sample
            blk = np.concatenate([blk, np.repeat(blk[-1:], spb - len(blk), axis=0)])
        # headers carry (first sample, carried step index) per channel
        for c in range(ch):
            out += struct.pack("<hBB", int(blk[0, c]), idx[c], 0)
        nib_groups: list[np.ndarray] = []
        for c in range(ch):
            nibbles, idx[c] = _ima_encode_channel(blk[1:, c], int(blk[0, c]), idx[c])
            nib_groups.append(nibbles)
        # interleave per 8-nibble (4-byte) groups
        interleaved = np.empty((len(nib_groups[0]) // 8, ch, 8), dtype=np.uint8)
        for c in range(ch):
            interleaved[:, c, :] = nib_groups[c].reshape(-1, 8)
        flat = interleaved.reshape(-1)
        packed = (flat[0::2] | (flat[1::2] << 4)).astype(np.uint8)
        out += packed.tobytes()
    return bytes(out)


def wav_bytes(
    samples: np.ndarray, sample_rate: int = 16000, codec: str = "pcm"
) -> bytes:
    """Encode an (n,) or (n, channels) int16 sample array as a WAV.

    ``codec``: ``"pcm"`` (tag 1, 16-bit, lossless), ``"ulaw"`` / ``"alaw"``
    (G.711 tags 7 / 6, 8-bit companded), or ``"ima"`` (tag 0x11 IMA ADPCM,
    4-bit blocks with a fact chunk carrying the true sample count).
    """
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError("expected (n,) or (n, channels) int16 samples")
    n, ch = samples.shape
    fact = b""
    if codec == "pcm":
        body = np.ascontiguousarray(samples).tobytes()  # interleaved LE int16
        fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    elif codec in ("ulaw", "alaw"):
        enc = ulaw_encode if codec == "ulaw" else alaw_encode
        body = np.ascontiguousarray(enc(samples)).tobytes()
        tag = 7 if codec == "ulaw" else 6
        fmt = struct.pack("<HHIIHH", tag, ch, sample_rate, sample_rate * ch, ch, 8)
    elif codec == "ima":
        block_align = 256 * ch
        spb = (block_align - 4 * ch) * 2 // ch + 1
        body = _ima_encode(samples, block_align)
        byte_rate = -(-sample_rate // spb) * block_align
        fmt = struct.pack(
            "<HHIIHHHH", 0x11, ch, sample_rate, byte_rate, block_align, 4, 2, spb
        )
        fact = b"fact" + struct.pack("<II", 4, n)
    else:
        raise ValueError(f"unknown WAV codec {codec!r}")
    riff_body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + fact
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a WAV into ((n, channels) int16 samples, rate).

    Walks RIFF chunks (tolerating extras like LIST before data); decodes
    PCM 16-bit (tag 1), G.711 A-law/mu-law (tags 6/7), and IMA ADPCM
    (tag 0x11, honoring the fact chunk's sample count); other format tags
    raise explicitly.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    ch = rate = bits = tag = block_align = None
    n_fact: int | None = None
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
            tag, ch, rate, _br, block_align, bits = struct.unpack_from(
                "<HHIIHH", chunk, 0
            )
        elif name == b"fact" and size >= 4:
            (n_fact,) = struct.unpack_from("<I", chunk, 0)
        elif name == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if tag is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if ch is None or ch < 1:
        raise ValueError("WAV fmt chunk declares no channels")
    if tag == 1 and bits == 16:
        n = len(data) // (ch * 2)
        samples = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    elif tag in (6, 7) and bits == 8:
        table = _ALAW_TABLE if tag == 6 else _ULAW_TABLE
        n = len(data) // ch
        codes = np.frombuffer(data, dtype=np.uint8, count=n * ch).reshape(n, ch)
        samples = table[codes]
    elif tag == 0x11 and bits == 4:
        samples = _ima_decode(data, ch, block_align, n_fact)
    else:
        raise ValueError(
            f"unsupported WAV: format_tag={tag} bits={bits} (PCM 16-bit, "
            "G.711 A-law/mu-law 8-bit, IMA ADPCM 4-bit; MP3/AAC/FLAC need "
            "a real codec library)"
        )
    return np.ascontiguousarray(samples), rate


def decode_audio_payload(buf: bytes) -> tuple[np.ndarray, int]:
    """Magic-byte dispatch for audio payloads -> (samples int16, rate).

    WAV (all supported format tags) and FLAC decode natively; the
    integration point for the remaining compressed formats (MP3/AAC via
    libav/soundfile) is a branch on the container magic returning the same
    contract — the downstream mapInPandas operators work unchanged.
    """
    if buf[:4] == b"RIFF":
        return wav_decode(buf)
    if buf[:4] == b"fLaC":
        from geowave_spark.functions.flaccodec import flac_decode

        return flac_decode(buf)
    raise ValueError(f"unrecognized audio payload (magic {buf[:4]!r})")
