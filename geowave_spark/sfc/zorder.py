"""Vectorized Z-order (Morton) curve — the reference's alternative SFC.

Mirrors `/root/reference/core/index/src/main/java/mil/nga/giat/geowave/core/index/sfc/zorder/ZOrderSFC.java:62-158`
and `ZOrderUtils.java`: interleave the normalized per-dimension bins bit by
bit.  Bit-for-bit trivial (interleaving has one convention given dimension
order: dim 0 takes the most significant bit of each group, matching the
reference's dimension ordering lon, lat).
"""

from __future__ import annotations

import numpy as np

__all__ = ["zorder_encode", "zorder_decode"]


def zorder_encode(coords: list[np.ndarray], bits: int) -> np.ndarray:
    """Interleave ndims integer coords (each < 2^bits) into uint64 keys.

    Key bit layout (msb first): x0[bits-1] x1[bits-1] ... x0[0] x1[0].
    """
    n = len(coords)
    x = [c.astype(np.uint64, copy=False) for c in coords]
    h = np.zeros_like(x[0])
    for j in range(bits - 1, -1, -1):
        for i in range(n):
            h = (h << np.uint64(1)) | ((x[i] >> np.uint64(j)) & np.uint64(1))
    return h


def zorder_decode(h: np.ndarray, ndims: int, bits: int) -> list[np.ndarray]:
    h = h.astype(np.uint64, copy=False)
    x = [np.zeros(len(h), dtype=np.uint64) for _ in range(ndims)]
    pos = ndims * bits
    for j in range(bits - 1, -1, -1):
        for i in range(ndims):
            pos -= 1
            x[i] = (x[i] << np.uint64(1)) | ((h >> np.uint64(pos)) & np.uint64(1))
    return x
