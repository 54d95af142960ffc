"""Temporal binning (TemporalBinningStrategy analog).

The reference splits temporal query constraints into per-bin ranges so each
bin's keys can be scanned independently
(`core/geotime/.../dimension/TemporalBinningStrategy.java`; behavioral
vectors in `TemporalBinningStrategyTest.java:50-140`):

- bins are epoch-aligned calendar units (YEAR / MONTH / DAY);
- an inclusive [start, end] range yields one clipped range per touched bin;
- a bin whose clipped range covers the whole bin is marked full-extent
  (the scan can skip fine temporal filtering for that bin).

The engine consumes this for the 3D spatio-temporal route: one key-range
set per year bin, full-extent bins needing no time refine.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

_MS = timedelta(milliseconds=1)


def _bin_start(ts: datetime, unit: str) -> datetime:
    if unit == "year":
        return datetime(ts.year, 1, 1)
    if unit == "month":
        return datetime(ts.year, ts.month, 1)
    if unit == "day":
        return datetime(ts.year, ts.month, ts.day)
    raise ValueError(f"unsupported unit {unit}")


def _next_bin(bs: datetime, unit: str) -> datetime:
    if unit == "year":
        return datetime(bs.year + 1, 1, 1)
    if unit == "month":
        return datetime(bs.year + (bs.month // 12), bs.month % 12 + 1, 1)
    return bs + timedelta(days=1)


@dataclass(frozen=True)
class TemporalBin:
    bin_start: datetime
    lo: datetime  # clipped inclusive start
    hi: datetime  # clipped inclusive end (reference ms-inclusive convention)
    full_extent: bool


def temporal_bin_ranges(start: datetime, end: datetime, unit: str = "year") -> list[TemporalBin]:
    """Inclusive [start, end] -> one clipped range per touched bin, with the
    reference's full-extent marking (covers [bin_start, next_bin - 1ms])."""
    if end < start:
        raise ValueError("end before start")
    out: list[TemporalBin] = []
    b = _bin_start(start, unit)
    while b <= end:
        nb = _next_bin(b, unit)
        lo = max(start, b)
        hi = min(end, nb - _MS)
        out.append(TemporalBin(b, lo, hi, lo == b and hi == nb - _MS))
        b = nb
    return out
