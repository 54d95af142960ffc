"""Geohash cell backend — the third Z-family layout (zorder, S2-cube, hex,
geohash) over the same tiered-cell machinery.

A geohash IS a Morton key in base32 clothing: lon/lat bisected alternately
(lon first), the interleaved bits grouped 5 at a time into the geohash
alphabet.  Equivalently (and how this module computes it, vectorized):

    lonq = min(floor((lon + 180) / 360 * 2^ceil(5p/2)), 2^ceil(5p/2) - 1)
    latq = min(floor((lat +  90) / 180 * 2^floor(5p/2)), 2^floor(5p/2) - 1)
    code = interleave(lonq, latq)   # lon takes the MSB, zorder convention
    hash = base32(code)             # 5 bits per char, p chars

The standard public convention (Niemeyer 2008) — keys interoperate with
every geohash library.  The reference's Z-order backend
(`core/index/.../sfc/zorder/ZOrderSFC.java:62-158`) uses the same
interleave with binary keys; geohash is its text-keyed sibling, so prefix
truncation = parent cell exactly like the tiered layouts.
"""

from __future__ import annotations

import numpy as np

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

__all__ = ["BASE32", "geohash_encode", "geohash_decode_box", "lonlat_bits"]


def lonlat_bits(precision: int) -> tuple[int, int]:
    """(lon_bits, lat_bits) for a precision-p geohash: lon gets the extra
    bit on odd totals because the bisection starts with longitude."""
    total = 5 * precision
    return (total + 1) // 2, total // 2


def geohash_encode(lon: np.ndarray, lat: np.ndarray, precision: int) -> np.ndarray:
    """Vectorized geohash of float arrays -> fixed-length strings."""
    lb, tb = lonlat_bits(precision)
    lonq = np.minimum(
        np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * (1 << lb)),
        (1 << lb) - 1,
    ).astype(np.uint64)
    latq = np.minimum(
        np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * (1 << tb)),
        (1 << tb) - 1,
    ).astype(np.uint64)
    total = 5 * precision
    code = np.zeros_like(lonq)
    for k in range(total):
        if k % 2 == 0:
            bit = (lonq >> np.uint64(lb - 1 - k // 2)) & np.uint64(1)
        else:
            bit = (latq >> np.uint64(tb - 1 - (k - 1) // 2)) & np.uint64(1)
        code = (code << np.uint64(1)) | bit
    chars = np.empty((len(code), precision), dtype="U1")
    for j in range(precision):
        idx = ((code >> np.uint64(5 * (precision - 1 - j))) & np.uint64(31)).astype(int)
        chars[:, j] = np.array(list(BASE32))[idx]
    return np.array(["".join(row) for row in chars])


def geohash_decode_box(h: str) -> tuple[float, float, float, float]:
    """Geohash -> (minlon, minlat, maxlon, maxlat) cell bounds (the K9
    inverse for this backend)."""
    p = len(h)
    lb, tb = lonlat_bits(p)
    code = 0
    for ch in h:
        code = (code << 5) | BASE32.index(ch)
    lonq = latq = 0
    for k in range(5 * p):
        bit = (code >> (5 * p - 1 - k)) & 1
        if k % 2 == 0:
            lonq = (lonq << 1) | bit
        else:
            latq = (latq << 1) | bit
    lon0 = lonq / (1 << lb) * 360.0 - 180.0
    lat0 = latq / (1 << tb) * 180.0 - 90.0
    return (lon0, lat0, lon0 + 360.0 / (1 << lb), lat0 + 180.0 / (1 << tb))
