"""Dependency-free FLAC codec in pure Python/numpy.

Earlier rounds grouped FLAC with MP3/AAC as "genuinely needs a library" —
too pessimistic, the same call as baseline JPEG: FLAC (the xiph format
spec) is fixed/LPC linear prediction plus Rice-coded residuals and CRCs,
all plain integer arithmetic.  Since FLAC is LOSSLESS, round-trips are
bit-exact — the strongest possible law — which is what makes every decode
path testable without fixtures from a reference binary.

Scope (stated honestly):

- **Decoder**: 16-bit streams, mono/stereo/multichannel independent
  channels plus all three stereo decorrelation modes (left/side,
  right/side, mid/side with the side channel's extra bit), subframe types
  CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC (any order), Rice coding
  methods 0/1 with escaped (raw) partitions, any partition order, wasted
  bits, both blocking strategies, frame-header CRC-8 and frame CRC-16
  verified, sample rate from STREAMINFO or the common header codes.
  Non-16-bit depths raise (the engine's sample contract is int16).
- **Encoder** (fixtures/export): STREAMINFO + fixed-blocksize frames;
  subframe search over CONSTANT / VERBATIM / FIXED 0-4 and optional
  quantized-LPC (Levinson-Durbin, 12-bit precision); Rice parameter per
  partition; independent or mid/side stereo; correct CRCs and the
  STREAMINFO MD5 of the raw samples.

Entropy-coded psychoacoustic formats (MP3/AAC) still genuinely need a
library; they keep raising in ``decode_audio_payload``.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n > 0:
            if self.byte >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            avail = 8 - self.bit
            take = min(n, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            n -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def sread(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        n = 0
        while self.read(1) == 0:
            n += 1
            if n > 1 << 24:
                raise ValueError("runaway unary code in FLAC stream")
        return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame/sample index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)):  # capacity = (7-nbytes)+6*(nbytes-1)
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC coded number")
    v = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# --------------------------------------------------------------- decoder

_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192, 14: 16384, 15: 32768,
}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _decode_residual(br: _BitReader, block_size: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = br.read(4)
    nparts = 1 << po
    if block_size % nparts:
        raise ValueError("FLAC partition order does not divide block size")
    out = np.empty(block_size - order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        n = (block_size >> po) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC partition smaller than predictor order")
        param = br.read(plen)
        if param == escape:
            bits = br.read(5)
            for i in range(n):
                out[idx + i] = br.sread(bits) if bits else 0
        else:
            for i in range(n):
                q = br.unary()
                r = br.read(param) if param else 0
                u = (q << param) | r
                out[idx + i] = (u >> 1) ^ -(u & 1)
        idx += n
    return out


def _predict(warm: np.ndarray, resid: np.ndarray, coefs: list[int], shift: int) -> np.ndarray:
    order = len(coefs)
    out = np.empty(order + len(resid), dtype=np.int64)
    out[:order] = warm
    c = np.array(coefs, dtype=np.int64)
    for i in range(len(resid)):
        pred = int((out[i : i + order][::-1] * c).sum()) >> shift
        out[order + i] = resid[i] + pred
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = br.sread(bps)
        out = np.full(block_size, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([br.sread(bps) for _ in range(block_size)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = np.array([br.sread(bps) for _ in range(order)], dtype=np.int64)
        resid = _decode_residual(br, block_size, order)
        out = _predict(warm, resid, _FIXED_COEFS[order], 0)
    elif stype >= 32:  # LPC
        order = (stype & 31) + 1
        warm = np.array([br.sread(bps) for _ in range(order)], dtype=np.int64)
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.sread(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.sread(precision) for _ in range(order)]
        resid = _decode_residual(br, block_size, order)
        out = _predict(warm, resid, coefs, shift)
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    return out << wasted


def flac_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode a FLAC stream into ((n, channels) int16 samples, rate)."""
    if buf[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    info = None
    while pos + 4 <= len(buf):
        hdr = buf[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + buf[pos + 1 : pos + 4])
        body = buf[pos + 4 : pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:  # STREAMINFO
            if ln < 34:
                raise ValueError("short FLAC STREAMINFO")
            br = _BitReader(body)
            br.read(16)  # min block size
            br.read(16)  # max block size
            br.read(24)
            br.read(24)
            rate = br.read(20)
            ch = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, ch, bps, total)
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC missing STREAMINFO")
    rate, ch, bps, total = info
    if bps != 16:
        raise ValueError(f"unsupported FLAC bit depth {bps} (int16 contract)")
    chans: list[list[np.ndarray]] = [[] for _ in range(ch)]
    n_out = 0
    while pos < len(buf) and (total == 0 or n_out < total):
        frame_start = pos
        br = _BitReader(buf, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync at byte {pos}")
        br.read(1)  # reserved
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        chan_code = br.read(4)
        size_code = br.read(3)
        br.read(1)  # reserved
        _read_utf8_number(br)
        if bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        elif bs_code in _BLOCKSIZE_CODES:
            block_size = _BLOCKSIZE_CODES[bs_code]
        else:
            raise ValueError(f"reserved FLAC block size code {bs_code}")
        if rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        elif rate_code != 0 and rate_code not in _RATE_CODES:
            raise ValueError(f"invalid FLAC sample rate code {rate_code}")
        if size_code not in (0, 4):  # 0 = from STREAMINFO, 4 = 16-bit
            raise ValueError("unsupported FLAC frame sample size (16-bit contract)")
        br.align()
        crc_pos = br.byte  # the CRC-8 byte follows the header fields
        if crc_pos >= len(buf) or _crc8(buf[frame_start:crc_pos]) != buf[crc_pos]:
            raise ValueError("FLAC frame header CRC mismatch")
        br.byte = crc_pos + 1
        if chan_code < 8:
            n_ch = chan_code + 1
            if n_ch != ch:
                raise ValueError("FLAC frame channel count differs from STREAMINFO")
            subs = [_decode_subframe(br, block_size, 16) for _ in range(n_ch)]
        elif chan_code in (8, 9, 10):
            if ch != 2:
                raise ValueError("FLAC stereo decorrelation in non-stereo stream")
            if chan_code == 8:  # left/side
                left = _decode_subframe(br, block_size, 16)
                side = _decode_subframe(br, block_size, 17)
                subs = [left, left - side]
            elif chan_code == 9:  # right/side
                side = _decode_subframe(br, block_size, 17)
                right = _decode_subframe(br, block_size, 16)
                subs = [right + side, right]
            else:  # mid/side
                mid = _decode_subframe(br, block_size, 16)
                side = _decode_subframe(br, block_size, 17)
                m2 = (mid << 1) | (side & 1)  # restore the dropped low bit
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"reserved FLAC channel assignment {chan_code}")
        br.align()
        if br.byte + 2 > len(buf):
            raise ValueError("truncated FLAC frame (missing CRC-16)")
        if _crc16(buf[frame_start : br.byte]) != struct.unpack_from(">H", buf, br.byte)[0]:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.byte + 2
        for c in range(ch):
            chans[c].append(subs[c])
        n_out += block_size
    if n_out == 0:
        raise ValueError("FLAC stream contains no frames")
    out = np.stack([np.concatenate(c) for c in chans], axis=1)
    if total:
        out = out[:total]
    if out.max(initial=0) > 32767 or out.min(initial=0) < -32768:
        raise ValueError("decoded FLAC samples exceed int16")
    return np.ascontiguousarray(out.astype(np.int16)), rate


# --------------------------------------------------------------- encoder


def _zigzag(resid: np.ndarray) -> np.ndarray:
    r = resid.astype(np.int64)
    return np.where(r < 0, ((-r) << 1) - 1, r << 1)


def _best_rice(resid: np.ndarray) -> tuple[int, int]:
    """(param, exact bit cost) minimizing unary+binary Rice length."""
    if len(resid) == 0:
        return 0, 0
    u = _zigzag(resid)
    best_p, best_c = 0, None
    for p in range(15):
        c = int((u >> p).sum()) + len(u) * (p + 1)
        if best_c is None or c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _safe_po(po: int, block_size: int, order: int) -> int:
    """Partition order usable for this block: partitions must divide the
    block evenly AND the first partition must be strictly larger than the
    predictor order (the spec forbids a zero-sample first partition) —
    otherwise fall back to one partition."""
    if po and (block_size % (1 << po) == 0) and (block_size >> po) > order:
        return po
    return 0


def _write_residual(bw: _BitWriter, resid: np.ndarray, order: int, block_size: int, po: int) -> None:
    bw.write(0, 2)  # rice method 0
    bw.write(po, 4)
    nparts = 1 << po
    idx = 0
    for p in range(nparts):
        n = (block_size >> po) - (order if p == 0 else 0)
        part = resid[idx : idx + n]
        param, _ = _best_rice(part)
        bw.write(param, 4)
        for v in part:
            u = (int(v) << 1) ^ (int(v) >> 63)  # zigzag via arithmetic shift
            bw.unary(u >> param)
            if param:
                bw.write(u & ((1 << param) - 1), param)
        idx += n


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_quantize(x: np.ndarray, order: int, precision: int = 12):
    """Levinson-Durbin + coefficient quantization; None when degenerate."""
    xf = x.astype(np.float64)
    n = len(xf)
    if n <= order or not np.any(xf):
        return None
    ac = np.array([float((xf[: n - k] * xf[k:]).sum()) for k in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    coefs = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - (coefs[:i] * ac[i:0:-1][:i]).sum()
        if err == 0:
            return None
        k = acc / err
        coefs[i] = k
        coefs[:i] = coefs[:i] - k * coefs[:i][::-1]
        err *= 1 - k * k
        if err <= 0:
            return None
    cmax = np.abs(coefs).max()
    if cmax == 0 or not np.isfinite(cmax):
        return None
    shift = precision - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = max(1, min(15, shift))
    q = np.round(coefs * (1 << shift)).astype(np.int64)
    lim = 1 << (precision - 1)
    q = np.clip(q, -lim, lim - 1)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(x: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    order = len(q)
    xi = x.astype(np.int64)
    resid = np.empty(len(xi) - order, dtype=np.int64)
    for i in range(order, len(xi)):
        pred = int((xi[i - order : i][::-1] * q).sum()) >> shift
        resid[i - order] = xi[i] - pred
    return resid


def _encode_subframe(bw: _BitWriter, x: np.ndarray, bps: int, lpc_order: int, po: int) -> None:
    block_size = len(x)
    if (x == x[0]).all():  # CONSTANT
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(int(x[0]), bps)
        return
    best = None  # (cost_bits, order, resid)
    for order in range(5):
        if block_size <= order:
            break
        r = _fixed_residual(x, order)
        cost = order * bps + _best_rice(r)[1]
        if best is None or cost < best[0]:
            best = (cost, order, r)
    lpc = None
    lpc_cost = None
    if lpc_order > 0 and block_size > lpc_order:
        qz = _lpc_quantize(x, lpc_order)
        if qz is not None:
            q, shift = qz
            r = _lpc_residual(x, q, shift)
            cost = lpc_order * bps + 9 + lpc_order * 12 + _best_rice(r)[1]
            if cost < best[0] and np.abs(r).max(initial=0) < 1 << 30:
                lpc = (q, shift, r)
                lpc_cost = cost
    verbatim_cost = block_size * bps
    if lpc is not None and lpc_cost < verbatim_cost:
        q, shift, r = lpc
        bw.write(0, 1)
        bw.write(32 | (len(q) - 1), 6)
        bw.write(0, 1)
        for v in x[: len(q)]:
            bw.write(int(v), bps)
        bw.write(12 - 1, 4)  # precision 12
        bw.write(shift, 5)
        for c in q:
            bw.write(int(c), 12)
        _write_residual(bw, r, len(q), block_size, _safe_po(po, block_size, len(q)))
        return
    cost, order, r = best
    if cost < verbatim_cost:
        bw.write(0, 1)
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in x[:order]:
            bw.write(int(v), bps)
        _write_residual(bw, r, order, block_size, _safe_po(po, block_size, order))
    else:  # VERBATIM
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write(int(v), bps)


def flac_bytes(
    samples: np.ndarray,
    sample_rate: int = 16000,
    block_size: int = 1024,
    stereo: str = "independent",
    lpc_order: int = 0,
    partition_order: int = 0,
) -> bytes:
    """Encode (n,) or (n, ch) int16 samples as a FLAC stream.

    ``stereo="mid_side"`` uses mid/side decorrelation (2 channels only);
    ``lpc_order > 0`` enables quantized-LPC subframes when they beat the
    fixed predictors; ``partition_order`` splits Rice residuals into
    2^po partitions when the block size divides evenly.
    """
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if n == 0:
        raise ValueError("cannot encode an empty FLAC stream (zero samples)")
    if ch > 8:
        raise ValueError("FLAC supports at most 8 channels")
    if stereo not in ("independent", "mid_side"):
        raise ValueError(f"unknown stereo mode {stereo!r}")
    if stereo == "mid_side" and ch != 2:
        raise ValueError("mid_side needs exactly 2 channels")
    md5 = hashlib.md5(np.ascontiguousarray(samples).tobytes()).digest()
    out = bytearray(b"fLaC")
    info = _BitWriter()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(ch - 1, 3)
    info.write(15, 5)  # bps - 1 = 15
    info.write(n, 36)
    info.align()
    body = bytes(info.out) + md5
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    frame_no = 0
    for start in range(0, n, block_size):
        blk = samples[start : start + block_size].astype(np.int64)
        bs = len(blk)
        hdr = _BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(7, 4)  # 16-bit block size follows
        hdr.write(0, 4)  # rate from STREAMINFO
        chan_code = 10 if stereo == "mid_side" else ch - 1
        hdr.write(chan_code, 4)
        hdr.write(4, 3)  # 16-bit samples
        hdr.write(0, 1)
        hdr.align()
        hdr_bytes = bytes(hdr.out) + _utf8_number(frame_no) + struct.pack(">H", bs - 1)
        hdr_bytes += bytes([_crc8(hdr_bytes)])
        bw = _BitWriter()
        if stereo == "mid_side":
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            _encode_subframe(bw, mid, 16, lpc_order, partition_order)
            _encode_subframe(bw, side, 17, lpc_order, partition_order)
        else:
            for c in range(ch):
                _encode_subframe(bw, blk[:, c], 16, lpc_order, partition_order)
        bw.align()
        frame = hdr_bytes + bytes(bw.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
