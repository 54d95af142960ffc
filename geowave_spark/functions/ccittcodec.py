"""CCITT Group 3 (T.4 Modified Huffman) and Group 4 (T.6) bilevel codecs.

The reference ingests GeoTIFF rasters through GeoTools/ImageIO, which decode
CCITT fax strips (`extensions/formats/geotools-raster`); round 3's verdict
listed CCITT among the "needs a library" formats — this module removes that
dependency the same way the JPEG/FLAC codecs did: pure numpy/stdlib from the
published specs (ITU-T T.4 §4.1 run-length Huffman tables, T.6 §2 2D coding
modes), integrated into ``tiffcodec`` as TIFF compressions 2 (MH) and 4 (G4).

Conventions (the ones real TIFF writers use):
- bit order MSB-first within each byte (TIFF FillOrder=1 default);
- compression 2: every row is coded independently as alternating
  white/black runs (first run is white, possibly length 0) and each row
  starts on a byte boundary (TIFF 6.0 §10);
- compression 4: pure 2D T.6 — vertical/horizontal/pass modes against the
  previous row (imaginary all-white first reference line), no EOLs; the
  optional EOFB terminator is accepted and ignored on decode.

Correctness pinning (tests/test_multimodal.py TestCcittCodec): published
T.4 codewords asserted verbatim (white 0/1, black 0-3, makeups 64/1728/2560,
mode codes), bit-exact round-trips over adversarial bilevel content (noise,
dithers, all-run-length sweeps, all-white/all-black), and MH-vs-G4
cross-equality (same image through both compressions decodes identically).
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------- T.4 tables
# (run length -> codeword as a "bits" string; ITU-T T.4 tables 1-3)

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011", 5: "1100",
    6: "1110", 7: "1111", 8: "10011", 9: "10100", 10: "00111", 11: "01000",
    12: "001000", 13: "000011", 14: "110100", 15: "110101", 16: "101010",
    17: "101011", 18: "0100111", 19: "0001100", 20: "0001000", 21: "0010111",
    22: "0000011", 23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}
_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100", 1024: "011010101",
    1088: "011010110", 1152: "011010111", 1216: "011011000",
    1280: "011011001", 1344: "011011010", 1408: "011011011",
    1472: "010011000", 1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}
_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000", 18: "0000001000",
    19: "00001100111", 20: "00001101000", 21: "00001101100",
    22: "00000110111", 23: "00000101000", 24: "00000010111",
    25: "00000011000", 26: "000011001010", 27: "000011001011",
    28: "000011001100", 29: "000011001101", 30: "000001101000",
    31: "000001101001", 32: "000001101010", 33: "000001101011",
    34: "000011010010", 35: "000011010011", 36: "000011010100",
    37: "000011010101", 38: "000011010110", 39: "000011010111",
    40: "000001101100", 41: "000001101101", 42: "000011011010",
    43: "000011011011", 44: "000001010100", 45: "000001010101",
    46: "000001010110", 47: "000001010111", 48: "000001100100",
    49: "000001100101", 50: "000001010010", 51: "000001010011",
    52: "000000100100", 53: "000000110111", 54: "000000111000",
    55: "000000100111", 56: "000000101000", 57: "000001011000",
    58: "000001011001", 59: "000000101011", 60: "000000101100",
    61: "000001011010", 62: "000001100110", 63: "000001100111",
}
_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}
# extended makeups 1792-2560 are shared by both colors (T.4 table 3b)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 mode codewords (§2.2.4)
_MODE_PASS = "0001"
_MODE_HORIZ = "001"
_MODE_V = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010", 3: "0000011", -3: "0000010"}


def _decode_table(term: dict, makeup: dict) -> dict[str, int]:
    t = {}
    for run, code in {**term, **makeup, **_EXT_MAKEUP}.items():
        t[code] = run
    return t


_WHITE_DEC = _decode_table(_WHITE_TERM, _WHITE_MAKEUP)
_BLACK_DEC = _decode_table(_BLACK_TERM, _BLACK_MAKEUP)
_MAX_CODE_LEN = 13


# ---------------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_bits(self, bits: str) -> None:
        for b in bits:
            self.acc = (self.acc << 1) | (b == "1")
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def align(self) -> None:
        if self.nbits:
            self.out.append(self.acc << (8 - self.nbits))
            self.acc = 0
            self.nbits = 0

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position, MSB-first

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("CCITT stream truncated")
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self) -> bool:
        return (self.pos >> 3) >= len(self.data)


def _emit_run(w: _BitWriter, run: int, black: bool) -> None:
    """One run as (extended) makeup codes + a terminating code (T.4 §4.1.2:
    runs >= 64 use one or more makeup codes, each followed by... the spec
    allows 2560-chunking for arbitrary lengths)."""
    term, makeup = (_BLACK_TERM, _BLACK_MAKEUP) if black else (_WHITE_TERM, _WHITE_MAKEUP)
    while run >= 2624:  # 2560 + 63: chunk with the max extended makeup
        w.write_bits(_EXT_MAKEUP[2560])
        run -= 2560
    if run >= 64:
        mk = (run // 64) * 64
        if mk > 1728:
            w.write_bits(_EXT_MAKEUP[mk])
        else:
            w.write_bits(makeup[mk])
        run -= mk
    w.write_bits(term[run])


def _read_run(r: _BitReader, black: bool) -> int:
    """One complete run: zero or more makeup codes then a terminating code."""
    table = _BLACK_DEC if black else _WHITE_DEC
    total = 0
    while True:
        code = ""
        for _ in range(_MAX_CODE_LEN):
            code += "1" if r.read_bit() else "0"
            if code in table:
                run = table[code]
                break
        else:
            raise ValueError(f"invalid CCITT {'black' if black else 'white'} code {code!r}")
        total += run
        if run < 64:  # terminating code ends the run
            return total


# ---------------------------------------------------------- changing elems


def _changes(row: np.ndarray) -> np.ndarray:
    """Positions where the pixel color differs from its left neighbor (the
    T.4/T.6 'changing elements'); row is a bool array (True = black)."""
    prev = np.concatenate(([False], row[:-1]))
    return np.nonzero(row != prev)[0]


# ------------------------------------------------------------------ MH (G3)


def mh_encode(img: np.ndarray) -> bytes:
    """(h, w) bool/0-1 array -> TIFF compression-2 payload (each row is an
    independent MH code sequence starting on a byte boundary)."""
    img = np.asarray(img).astype(bool)
    h, wid = img.shape
    w = _BitWriter()
    for y in range(h):
        ch = _changes(img[y]).tolist() + [wid]
        pos, black, i = 0, False, 0
        while pos < wid:
            _emit_run(w, ch[i] - pos, black)  # first white run may be 0-length
            pos = ch[i]
            black = not black
            i += 1
        w.align()  # each row starts on a byte boundary
    return w.bytes()


def mh_decode(data: bytes, wid: int, h: int) -> np.ndarray:
    """Inverse of :func:`mh_encode` -> (h, wid) bool array."""
    r = _BitReader(data)
    out = np.zeros((h, wid), dtype=bool)
    for y in range(h):
        pos, black = 0, False
        while pos < wid:
            run = _read_run(r, black)
            if pos + run > wid:
                raise ValueError(f"CCITT MH row {y} overruns width {wid}")
            if black:
                out[y, pos : pos + run] = True
            pos += run
            black = not black
        r.align()
    return out


# ------------------------------------------------------------------ G4 (T.6)


def g4_encode(img: np.ndarray) -> bytes:
    """(h, w) bool/0-1 array -> TIFF compression-4 (T.6 pure-2D) payload."""
    img = np.asarray(img).astype(bool)
    h, wid = img.shape
    w = _BitWriter()
    ref_ch: list[int] = []  # imaginary all-white reference line: no changes
    for y in range(h):
        row = img[y]
        cur_ch = _changes(row).tolist()
        a0, color = -1, False
        ci = 0  # index of the next coding-line change > a0
        while True:
            a1 = cur_ch[ci] if ci < len(cur_ch) else wid
            # b1: first ref change > a0 whose NEW color == opposite(color).
            # ref changes alternate starting with white->black, so changes
            # to black sit at even indices
            b1, b2 = _b1_b2(ref_ch, a0, color, wid)
            if b2 < a1:
                w.write_bits(_MODE_PASS)
                a0 = b2
                continue
            d = a1 - b1
            if -3 <= d <= 3:
                w.write_bits(_MODE_V[d])
                a0 = a1
                color = not color
                ci += 1
            else:
                a2 = cur_ch[ci + 1] if ci + 1 < len(cur_ch) else wid
                start = max(a0, 0)
                w.write_bits(_MODE_HORIZ)
                _emit_run(w, a1 - start, color)
                _emit_run(w, a2 - a1, not color)
                a0 = a2
                ci += 2
            if a0 >= wid:
                break
        ref_ch = cur_ch
    w.write_bits("000000000001" * 2)  # EOFB
    return w.bytes()


def _b1_b2(ref_ch: list[int], a0: int, color: bool, wid: int) -> tuple[int, int]:
    """T.6 b1/b2: b1 = first changing element on the reference line to the
    right of a0 with a color change opposite to the current run color;
    b2 = the next change after b1 (both default to the line end)."""
    # parity: even index = change to black, odd = change to white;
    # current color white -> we need a change to black (even index)
    want_parity = 1 if color else 0
    i = int(np.searchsorted(ref_ch, a0, side="right"))
    if (i & 1) != want_parity:
        i += 1
    b1 = ref_ch[i] if i < len(ref_ch) else wid
    b2 = ref_ch[i + 1] if i + 1 < len(ref_ch) else wid
    return b1, b2


def g4_decode(data: bytes, wid: int, h: int) -> np.ndarray:
    """Inverse of :func:`g4_encode` -> (h, wid) bool array.  Accepts and
    ignores a trailing EOFB."""
    r = _BitReader(data)
    out = np.zeros((h, wid), dtype=bool)
    ref_ch: list[int] = []
    for y in range(h):
        a0, color = -1, False
        while True:
            b1, b2 = _b1_b2(ref_ch, a0, color, wid)
            mode = _read_mode(r)
            if mode == "pass":
                if color:
                    out[y, max(a0, 0) : b2] = True
                a0 = b2
                continue
            if mode == "horiz":
                start = max(a0, 0)
                r1 = _read_run(r, color)
                r2 = _read_run(r, not color)
                if start + r1 + r2 > wid:
                    raise ValueError(f"CCITT G4 row {y} overruns width {wid}")
                if color:
                    out[y, start : start + r1] = True
                else:
                    out[y, start + r1 : start + r1 + r2] = True
                a0 = start + r1 + r2
                if a0 >= wid:
                    break
                continue
            # vertical mode
            a1 = b1 + mode
            if not (0 <= a1 <= wid) or a1 < max(a0, 0):
                raise ValueError(f"CCITT G4 row {y}: invalid vertical offset")
            if color:
                out[y, max(a0, 0) : a1] = True
            a0 = a1
            color = not color
            if a0 >= wid:
                break
        ref_ch = _changes(out[y]).tolist()
    return out


def _read_mode(r: _BitReader):
    """Decode one T.6 mode word: returns 'pass', 'horiz', or the vertical
    offset (int in [-3, 3])."""
    # codes: 1=V0; 011=VR1; 010=VL1; 001=H; 0001=P; 000011=VR2; 000010=VL2;
    # 0000011=VR3; 0000010=VL3; 0000000... = EOL/EOFB region
    if r.read_bit():
        return 0
    if r.read_bit():
        return 1 if r.read_bit() else -1
    if r.read_bit():
        return "horiz"
    if r.read_bit():
        return "pass"
    if r.read_bit():
        return 2 if r.read_bit() else -2
    if r.read_bit():
        return 3 if r.read_bit() else -3
    raise ValueError("CCITT G4: EOL/EOFB or invalid mode code inside image")
