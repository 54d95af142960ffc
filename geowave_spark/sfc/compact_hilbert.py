"""Compact Hilbert curve for UNEQUAL per-dimension bit allocations.

The reference's spatio-temporal index offers biased precision —
SPATIAL = (25, 25, 10) bits for (lon, lat, time), TEMPORAL = (10, 10, 40)
(`SpatialTemporalDimensionalityTypeProvider.java:149-190`) — and feeds them
to uzaygezen's ``CompactHilbertCurve`` (`HilbertSFC.java:114-165`).
uzaygezen implements C. Hamilton's compact Hilbert indices ("Compact
Hilbert indices: space-filling curves for domains with unequal side
lengths", Dalhousie CS-2006-07; Hamilton & Rau-Chaplin, IPL 2008), which is
what this module re-derives from the published algorithm:

- the curve visits the cells of the box ``prod 2^{m_j}`` in exactly the
  order the full Hilbert curve on the enclosing cube ``(2^M)^n`` visits
  them (M = max m_j), and the compact index is the contiguous rank — this
  DEFINING property is the test oracle (``tests/test_sfc.py`` brute-forces
  the rank on small boxes and requires equality);
- per step, only dimensions with ``m_j > i`` contribute a bit; the output
  packs ``popcount(mu)`` bits via the gray-code rank of the free bits, so
  the total key is exactly ``sum m_j`` bits — (25,25,10) and (10,10,40)
  both pack to 60 bits and fit a Spark LongType.

Same convention caveat as ``sfc/hilbert.py``: the reference publishes no
asymmetric key vectors, so cross-implementation byte equality with
uzaygezen is unverifiable offline; what is pinned is the published
algorithm itself (rank-oracle property, bijectivity, gray-code adjacency,
hand-derived small-case tables) plus frozen regression vectors so any
convention drift breaks loudly.  Every key is produced AND consumed by this
module, so convention choice cannot affect query results.

All functions are numpy-vectorized over point batches (no per-row Python),
per the engine's Arrow-batch contract.
"""

from __future__ import annotations

import numpy as np

__all__ = ["compact_hilbert_encode", "compact_hilbert_decode", "BIAS_BITS"]

#: the reference's bias allocations (lon, lat, within-year time fraction)
BIAS_BITS = {
    "spatial": (25, 25, 10),
    "balanced": (20, 20, 20),
    "temporal": (10, 10, 40),
}

_ONE = np.uint64(1)


def _mask(n: int) -> np.uint64:
    return np.uint64((1 << n) - 1)


def _rotr(x: np.ndarray, r: np.ndarray, n: int) -> np.ndarray:
    """Right-rotate n-bit words by per-element amounts r (0 <= r < n)."""
    r = r.astype(np.uint64)
    nn = np.uint64(n)
    return ((x >> r) | (x << (nn - r))) & _mask(n)


def _rotl(x: np.ndarray, r: np.ndarray, n: int) -> np.ndarray:
    r = r.astype(np.uint64)
    nn = np.uint64(n)
    return ((x << r) | (x >> (nn - r))) & _mask(n)


def _gc(i: np.ndarray) -> np.ndarray:
    return i ^ (i >> _ONE)


def _gc_inv(g: np.ndarray, n: int) -> np.ndarray:
    """Inverse gray code via prefix-xor (n-bit words)."""
    i = g.copy()
    sh = 1
    while sh < n:
        i ^= i >> np.uint64(sh)
        sh *= 2
    return i


def _tsb(i: np.ndarray) -> np.ndarray:
    """Count of trailing set bits: tsb(i) = count_trailing_zeros(i + 1)."""
    ip = i + _ONE
    low = ip & (~ip + _ONE)  # lowest set bit of i+1
    # popcount(low - 1) = its trailing-zero count; words are tiny (<= 7 bits)
    v = (low - _ONE).astype(np.uint64)
    cnt = np.zeros_like(v)
    while v.any():
        cnt += v & _ONE
        v >>= _ONE
    return cnt


def _entry(w: np.ndarray) -> np.ndarray:
    """Hamilton's entry point e(w): e(0)=0, e(w)=gc(2*floor((w-1)/2))."""
    base = np.where(w == 0, np.uint64(0), (w - _ONE) & ~_ONE)
    return _gc(base)


def _dirn(w: np.ndarray, n: int) -> np.ndarray:
    """Hamilton's intra-sub-hypercube direction d(w) mod n."""
    odd = (w & _ONE).astype(bool)
    d = np.where(odd, _tsb(w), _tsb(np.where(w == 0, np.uint64(0), w - _ONE)))
    d = np.where(w == 0, np.uint64(0), d)
    return d % np.uint64(n)


def _gray_rank(mu: np.ndarray, w: np.ndarray, n: int) -> np.ndarray:
    """Pack the bits of w at positions where mu is set (order-preserving),
    per element — Hamilton's GrayCodeRank."""
    r = np.zeros_like(w)
    for k in range(n - 1, -1, -1):
        sel = ((mu >> np.uint64(k)) & _ONE).astype(bool)
        r = np.where(sel, (r << _ONE) | ((w >> np.uint64(k)) & _ONE), r)
    return r


def _gray_rank_inv(
    mu: np.ndarray, pi: np.ndarray, r: np.ndarray, n: int
) -> np.ndarray:
    """Hamilton's GrayCodeRankInverse: reconstruct w such that the free bits
    of w (where mu set) spell r and the constrained bits of gc(w) (where mu
    clear) match the pattern pi."""
    # per-element count of free bits; consumed high-to-low as k descends
    j = np.zeros_like(mu)
    m = mu.copy()
    while m.any():
        j += m & _ONE
        m >>= _ONE
    w = np.zeros_like(r)
    ik1 = np.zeros_like(r)  # bit k+1 of w
    for k in range(n - 1, -1, -1):
        sel = ((mu >> np.uint64(k)) & _ONE).astype(bool)
        j = np.where(sel, j - _ONE, j)
        rbit = (r >> j) & _ONE
        gbit_c = (pi >> np.uint64(k)) & _ONE
        ibit = np.where(sel, rbit, gbit_c ^ ik1)
        w |= ibit << np.uint64(k)
        ik1 = ibit
    return w


def compact_hilbert_encode(
    coords: list[np.ndarray], dims_bits: tuple[int, ...]
) -> np.ndarray:
    """(per-dim integer bin arrays) -> compact Hilbert keys.

    ``coords[j]`` must lie in ``[0, 2^dims_bits[j])``; the result lies in
    ``[0, 2^sum(dims_bits))``.  Equal ``dims_bits`` degenerates to the
    standard Hilbert index (every extract mask is full, every rank is the
    identity)."""
    n = len(dims_bits)
    if n != len(coords):
        raise ValueError("coords/dims_bits arity mismatch")
    total = sum(dims_bits)
    if total > 63:
        raise ValueError(f"compact key needs {total} bits; max 63 for LongType")
    M = max(dims_bits)
    x = [np.asarray(c).astype(np.uint64) for c in coords]
    for j, (c, m) in enumerate(zip(x, dims_bits)):
        if (c >> np.uint64(m)).any():
            raise ValueError(f"dim {j} has values outside [0, 2^{m})")
    size = x[0].shape
    h = np.zeros(size, dtype=np.uint64)
    e = np.zeros(size, dtype=np.uint64)
    d = np.zeros(size, dtype=np.uint64)
    nn = np.uint64(n)
    for i in range(M - 1, -1, -1):
        mu_axes = 0
        for j, m in enumerate(dims_bits):
            if m > i:
                mu_axes |= 1 << j
        nbits = bin(mu_axes).count("1")
        l = np.zeros(size, dtype=np.uint64)
        for j in range(n):
            if dims_bits[j] > i:
                l |= ((x[j] >> np.uint64(i)) & _ONE) << np.uint64(j)
        rot = (d + _ONE) % nn
        t = _rotr(l ^ e, rot, n)
        w = _gc_inv(t, n)
        mu_rot = _rotr(np.full(size, mu_axes, dtype=np.uint64), rot, n)
        r = _gray_rank(mu_rot, w, n)
        e = e ^ _rotl(_entry(w), rot, n)
        d = (d + _dirn(w, n) + _ONE) % nn
        h = (h << np.uint64(nbits)) | r
    return h.astype(np.int64)


def _decode_levels(
    hh: np.ndarray, dims_bits: tuple[int, ...], levels: int, key_bits: int
) -> list[np.ndarray]:
    """Shared decode loop: consume the top ``levels`` curve levels of keys
    that are ``key_bits`` wide.  Returns per-dim PARTIAL bins — dim j's top
    ``max(0, dims_bits[j] - (M - levels))`` bits, right-aligned."""
    n = len(dims_bits)
    M = max(dims_bits)
    size = hh.shape
    x = [np.zeros(size, dtype=np.uint64) for _ in range(n)]
    e = np.zeros(size, dtype=np.uint64)
    d = np.zeros(size, dtype=np.uint64)
    nn = np.uint64(n)
    consumed = 0
    for i in range(M - 1, M - 1 - levels, -1):
        mu_axes = 0
        for j, m in enumerate(dims_bits):
            if m > i:
                mu_axes |= 1 << j
        nbits = bin(mu_axes).count("1")
        consumed += nbits
        r = (hh >> np.uint64(key_bits - consumed)) & _mask(nbits)
        rot = (d + _ONE) % nn
        mu_rot = _rotr(np.full(size, mu_axes, dtype=np.uint64), rot, n)
        pi = _rotr(e, rot, n) & ~mu_rot & _mask(n)
        w = _gray_rank_inv(mu_rot, pi, r, n)
        l = _gc(w)
        l = _rotl(l, rot, n) ^ e
        for j in range(n):
            if dims_bits[j] > i:
                x[j] |= ((l >> np.uint64(j)) & _ONE) << np.uint64(i)
        e = e ^ _rotl(_entry(w), rot, n)
        d = (d + _dirn(w, n) + _ONE) % nn
    # right-align the partial bins (bits below level M-levels are unknown)
    i0 = M - levels
    return [c >> np.uint64(min(m, i0)) for c, m in zip(x, dims_bits)]


def compact_hilbert_decode(
    h: np.ndarray, dims_bits: tuple[int, ...]
) -> list[np.ndarray]:
    """Inverse of :func:`compact_hilbert_encode` (bit-exact round-trip)."""
    M = max(dims_bits)
    total = sum(dims_bits)
    hh = np.asarray(h).astype(np.uint64)
    return [c.astype(np.int64) for c in _decode_levels(hh, dims_bits, M, total)]


def compact_hilbert_ranges(
    bin_lo: tuple[int, ...],
    bin_hi: tuple[int, ...],
    dims_bits: tuple[int, ...],
    max_ranges: int = 5000,
) -> list[tuple[int, int]]:
    """Query box (inclusive per-dim bin ranges at full resolution) ->
    contiguous inclusive compact-Hilbert key ranges (K2 for the BIAS
    layouts — the uzaygezen ``BacktrackingQueryBuilder`` role that
    ``HilbertSFC.decomposeRange`` delegates to).

    Same contract as ``decompose_query_ranges``: descend the curve's
    prefix tree level by level; regions fully inside the query emit their
    whole key subrange, boundary regions refine; when the budget binds,
    boundary regions emit over-inclusively — never under-inclusive.  The
    prefix property this relies on (the first K bits of a compact key
    identify an axis-aligned box) is exactly the standard curve's, with
    per-level fan-out 2^popcount(extract mask)."""
    n = len(dims_bits)
    M = max(dims_bits)
    total = sum(dims_bits)
    lo = [int(v) for v in bin_lo]
    hi = [int(v) for v in bin_hi]
    ranges: list[tuple[int, int]] = []
    frontier = np.array([0], dtype=np.uint64)  # key prefixes, `level` levels
    consumed = 0
    for level in range(1, M + 1):
        i = M - level  # curve level being consumed; also remaining levels
        mu_axes = 0
        for j, m in enumerate(dims_bits):
            if m > i:
                mu_axes |= 1 << j
        nbits = bin(mu_axes).count("1")
        consumed += nbits
        children = (
            (frontier[:, None] << np.uint64(nbits))
            | np.arange(1 << nbits, dtype=np.uint64)
        ).ravel()
        partial = _decode_levels(children, dims_bits, level, consumed)
        # per-dim spans of each child region at full resolution
        key_shift = np.uint64(total - consumed)
        inter = np.ones(len(children), dtype=bool)
        inside = np.ones(len(children), dtype=bool)
        for j in range(n):
            rem = np.uint64(min(dims_bits[j], i))
            clo = (partial[j] << rem).astype(np.int64)
            chi = (((partial[j] + _ONE) << rem) - _ONE).astype(np.int64)
            inter &= (chi >= lo[j]) & (clo <= hi[j])
            inside &= (clo >= lo[j]) & (chi <= hi[j])
        for c in children[inter & inside]:
            ranges.append(
                (int(c << key_shift), int(((c + _ONE) << key_shift) - _ONE))
            )
        frontier = children[inter & ~inside]
        if len(ranges) + len(frontier) >= max_ranges or level == M:
            for c in frontier:
                ranges.append(
                    (int(c << key_shift), int(((c + _ONE) << key_shift) - _ONE))
                )
            break
    ranges.sort()
    # merge adjacent/overlapping
    merged: list[tuple[int, int]] = []
    for a, b in ranges:
        if merged and a <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], b))
        else:
            merged.append((a, b))
    return merged
