"""Cost-based index selection across multiple index layouts.

Re-expresses `ChooseBestMatchIndexQueryStrategy.java:51-118` + the row-range
histogram cardinality estimate (`DataStoreUtils.cardinality`,
`RowRangeHistogramStatistics`) as a driver-side planner over table layouts:

- every candidate layout decomposes the query constraints into SFC key
  ranges (K2, capped like the reference's 5000);
- a constraint leaving any of the layout's dimensions unbounded means full
  table scan for that layout — kept only as the fallback default;
- per-layout cardinality = sum of histogram mass overlapping the ranges
  (histogram built once per layout from the table's key column — the analog
  of per-tablet row-range statistics);
- the layout with the minimum estimated cardinality wins.

The planner is driver-side arithmetic over tiny histograms (one bounded
aggregation per layout at build time, zero Spark jobs at choose time) —
exactly the role the reference's strategy plays ahead of the scan.
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from dataclasses import dataclass
from typing import Callable

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FULL_SCAN = float("inf")


@dataclass(frozen=True)
class RangeHistogram:
    """Equi-depth row-range histogram over an index's key space: sorted key
    samples plus total row count (the RowRangeHistogramStatistics shape)."""

    bounds: np.ndarray  # sorted key quantile boundaries, len = n_buckets + 1
    total_rows: int

    def cardinality(self, ranges: list[tuple[int, int]]) -> float:
        """Estimated rows intersecting the inclusive key ranges: full buckets
        inside the range count fully, boundary buckets fractionally
        (uniform-within-bucket, the reference's estimate)."""
        if not len(self.bounds) or self.total_rows == 0:
            return 0.0
        per_bucket = self.total_rows / (len(self.bounds) - 1)
        est = 0.0
        for lo, hi in ranges:
            i = bisect_right(self.bounds.tolist(), lo) - 1
            j = bisect_left(self.bounds.tolist(), hi)
            i = max(i, 0)
            j = min(j, len(self.bounds) - 1)
            if i >= j:
                continue
            for b in range(i, j):
                blo, bhi = float(self.bounds[b]), float(self.bounds[b + 1])
                width = max(bhi - blo, 1.0)
                ov = max(0.0, min(float(hi), bhi) - max(float(lo), blo))
                est += per_bucket * min(ov / width, 1.0)
        return est


def build_range_histogram(
    df: DataFrame, key_col: str, n_buckets: int = 64
) -> RangeHistogram:
    """One bounded aggregation: approx key quantiles + count (the ingest-time
    statistics pass; at cluster scale this is the same partial-agg shape the
    engine's stats_summary uses)."""
    total = df.count()
    if total == 0:
        return RangeHistogram(np.array([]), 0)
    qs = df.approxQuantile(key_col, [i / n_buckets for i in range(n_buckets + 1)], 0.001)
    return RangeHistogram(np.array(qs, dtype=np.float64), total)


@dataclass(frozen=True)
class CandidateIndex:
    """A table layout: name + constraint decomposer returning inclusive key
    ranges, or None when the constraints leave one of the layout's dimensions
    unbounded (-> full table scan for this layout)."""

    name: str
    decompose: Callable[[dict], list[tuple[int, int]] | None]
    histogram: RangeHistogram


def choose_best_index(
    candidates: list[CandidateIndex], constraints: dict
) -> tuple[str, dict[str, float]]:
    """The reference's getIndices loop: full-scan layouts are kept only as
    the default when every layout is a full scan; otherwise the minimum
    estimated cardinality wins.  Returns (winner, per-layout estimates)."""
    estimates: dict[str, float] = {}
    best_name, best_est = None, float("inf")
    default = None
    for cand in candidates:
        ranges = cand.decompose(constraints)
        if ranges is None:
            estimates[cand.name] = FULL_SCAN
            if default is None:
                default = cand.name
            continue
        est = cand.histogram.cardinality(ranges)
        estimates[cand.name] = est
        if est < best_est:
            best_name, best_est = cand.name, est
    return (best_name if best_name is not None else default), estimates


# ---------------------------------------------------------------------------
# standard decomposers for the engine's layouts
# ---------------------------------------------------------------------------


def spatial_2d_decomposer(bits: int, max_ranges: int = 5000, cfg=None):
    """2D tiered-SFC layout: needs a bbox; time constraints are ignored
    (refined post-scan).  ``cfg`` must be the SpatialConfig the table's key
    column was actually encoded with (backend mismatch = nonsense ranges)."""
    from geowave_spark.sfc import DEFAULT_CONFIG
    from geowave_spark.sfc.tiered import decompose_query_ranges

    cfg = cfg or DEFAULT_CONFIG

    def _d(c: dict):
        if "bbox" not in c:
            return None  # spatially unbounded -> full scan on this layout
        minx, miny, maxx, maxy = c["bbox"]
        return decompose_query_ranges(minx, miny, maxx, maxy, bits, max_ranges, cfg)

    return _d


def prepare_layouts(
    pts: DataFrame,
    xy_bits: int = 10,
    t_bits: int = 10,
    bias: str | None = None,
    ts_col: str = "event_ts",
) -> dict:
    """Ingest-time layout preparation: materialize the layouts' key columns
    and their range histograms ONCE (the reference computes row-range stats
    at ingest, not per query).  Pass the result to routed_points_query so
    query planning is pure driver arithmetic over the cached histograms.

    ``bias`` additionally materializes a compact-Hilbert BIAS layout
    (``"spatial"``/``"temporal"``/``"balanced"``) as a third candidate —
    the reference's -bias index option sitting beside BALANCED in the same
    store (`SpatialTemporalDimensionalityTypeProvider`)."""
    from pyspark.sql import functions as F

    from geowave_spark.operators.indexing import (
        with_biased_st_cells,
        with_point_cells,
        with_spatiotemporal_cells,
    )
    from geowave_spark.sfc import SpatialConfig

    cfg = SpatialConfig(tiers=(0, xy_bits), backend="zorder")
    flat = with_point_cells(pts, cfg=cfg, cell_col="_cell2d").drop("tier").cache()
    st = with_spatiotemporal_cells(
        pts, spatial_bits=xy_bits, time_bits=t_bits, ts_col=ts_col
    ).cache()
    out = {
        "cfg": cfg,
        "flat": flat,
        "st": st,
        "h2d": build_range_histogram(flat, "_cell2d"),
        "h3d_by_years": {},  # filled lazily per queried year set
        "xy_bits": xy_bits,
        "t_bits": t_bits,
        "bias": bias,
    }
    if bias is not None:
        biased = with_biased_st_cells(pts, bias, cell_col="_bias_key", ts_col=ts_col).cache()
        out["biased"] = biased
        out["hbias_by_years"] = {}
    return out


# session-lifetime layout registry: the reference's long-lived DataStore
# loads index metadata + row-range statistics ONCE and serves every query
# from them (`BaseDataStore` holding `IndexStore`/`DataStatisticsStore`);
# rebuilding per query call costs two key-column materializations plus an
# approxQuantile histogram — measured at ~2/3 of cql_spatial_routed's
# latency (BENCH/BASELINE.md §7).
_LAYOUTS: dict[tuple, dict] = {}


def layouts_for(
    pts: DataFrame,
    xy_bits: int = 10,
    t_bits: int = 10,
    bias: str | None = None,
    ts_col: str = "event_ts",
) -> dict:
    """prepare_layouts memoized on the table's semantic identity.

    The key combines the canonicalized analyzed-plan hash (stable across
    separate reads of the same files) with the scan's resolved FILE LIST —
    semanticHash alone is path-based, so an in-place rewrite would
    otherwise serve stale layouts (verified: overwriting a parquet dir
    leaves the hash unchanged).  Rewritten tables list different part
    files, so they miss and rebuild.  Entries hold cached DataFrames —
    :func:`release_layouts` drops them (and rewrite paths like the CLI
    splits ops call it), since non-file invalidation (e.g. an updated
    in-memory view) is not detectable here."""
    key = (
        pts._jdf.queryExecution().analyzed().semanticHash(),
        hash(tuple(sorted(pts.inputFiles()))),
        xy_bits, t_bits, bias, ts_col,
    )
    hit = _LAYOUTS.get(key)
    if hit is None:
        hit = _LAYOUTS[key] = prepare_layouts(
            pts, xy_bits, t_bits, bias=bias, ts_col=ts_col
        )
    return hit


def release_layouts() -> None:
    """Unpersist and forget every registered layout."""
    while _LAYOUTS:
        _, layouts = _LAYOUTS.popitem()
        for k in ("flat", "st", "biased"):
            df = layouts.get(k)
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass


def routed_points_query(
    pts: DataFrame,
    bbox: tuple[float, float, float, float],
    ts_lo,
    ts_hi,
    xy_bits: int = 10,
    t_bits: int = 10,
    ts_col: str = "event_ts",
    layouts: dict | None = None,
    refine=None,
    force: str | None = None,
) -> tuple[DataFrame, str]:
    """End-to-end cost-based routing: materialize both layouts' key columns,
    estimate each layout's scan cardinality for the constraints, execute the
    winner's key-range predicate, then refine exactly — so the OUTPUT is
    route-independent (plain box+time semantics) while the SCAN is the
    chosen index's.  This is the reference's getIndices -> query loop
    (`ChooseBestMatchIndexQueryStrategy` feeding `AccumuloDataStore.query`)
    as one function.  Returns (rows, winning layout name).

    ``refine`` substitutes the post-scan exact predicate (the CQL front-end
    passes its full compiled filter here, mirroring CQLQuery.java's "the CQL
    filter covers the baseQuery": the key-range scan only prunes, the fine
    filter re-verifies every row).  The (bbox, ts) constraints must then be
    over-inclusive w.r.t. ``refine`` for the output to stay exact."""
    import datetime as dt

    from pyspark.sql import functions as F

    from geowave_spark.operators.indexing import st_cell_ranges

    # layouts + histograms come from prepare_layouts (ingest-time) when
    # provided; the self-contained default goes through the session-lifetime
    # registry, so repeated queries against the same table plan from the
    # already-built histograms (the reference's long-lived DataStore shape)
    if layouts is None:
        layouts = layouts_for(pts, xy_bits, t_bits, ts_col=ts_col)
    cfg = layouts["cfg"]
    flat = layouts["flat"]
    st = layouts["st"]

    # per-year-bin windows (TemporalBinningStrategy.getNormalizedRanges —
    # the 3D route scans one key-range set per bin, full-extent bins at the
    # whole [0, 1] fraction window)
    from geowave_spark.functions.temporal import temporal_bin_ranges

    tbins = temporal_bin_ranges(ts_lo, ts_hi - dt.timedelta(microseconds=1), "year")
    windows: list[tuple[int, float, float]] = []
    for tb in tbins:
        y0 = tb.bin_start
        y1 = dt.datetime(y0.year + 1, 1, 1)
        span = (y1 - y0).total_seconds()
        if tb.full_extent:
            windows.append((y0.year, 0.0, 1.0))
        else:
            flo = (tb.lo - y0).total_seconds() / span
            fhi = min(((tb.hi - y0).total_seconds() + 1e-3) / span, 1.0)
            windows.append((y0.year, flo, fhi))

    years = [w[0] for w in windows]
    ykey = tuple(years)
    if ykey not in layouts["h3d_by_years"]:
        layouts["h3d_by_years"][ykey] = build_range_histogram(
            st.filter(F.col("time_bin").isin(years)), "st_cell"
        )
    candidates = [
        CandidateIndex(
            "spatial_2d",
            spatial_2d_decomposer(xy_bits, cfg=cfg),
            layouts["h2d"],
        ),
        CandidateIndex(
            "spatiotemporal_3d",
            spatiotemporal_3d_decomposer(xy_bits, t_bits),
            layouts["h3d_by_years"][ykey],
        ),
    ]
    if layouts.get("bias") is not None:
        if ykey not in layouts["hbias_by_years"]:
            layouts["hbias_by_years"][ykey] = build_range_histogram(
                layouts["biased"].filter(F.col("time_bin").isin(years)), "_bias_key"
            )
        candidates.append(
            CandidateIndex(
                "spatiotemporal_biased",
                biased_st_decomposer(layouts["bias"]),
                layouts["hbias_by_years"][ykey],
            )
        )
    # estimate with the first bin's window (bins are structurally alike);
    # the histogram already spans only the touched years
    constraints = {"bbox": bbox, "t_range": (windows[0][1], windows[0][2])}
    winner, _ = choose_best_index(candidates, constraints)
    if force is not None:
        # the reference lets a query name its index (QueryOptions.setIndex);
        # the scan still refines exactly, so forcing never changes results
        if force not in {c.name for c in candidates}:
            raise ValueError(f"unknown layout {force!r} to force")
        winner = force

    minx, miny, maxx, maxy = bbox
    exact = refine
    if exact is None:
        exact = (
            (F.col("lon") >= minx)
            & (F.col("lon") <= maxx)
            & (F.col("lat") >= miny)
            & (F.col("lat") <= maxy)
            & (F.col(ts_col) >= F.lit(ts_lo))
            & (F.col(ts_col) < F.lit(ts_hi))
        )
    # predicate range budget: 64 ranges keeps the OR-chain expression tree
    # shallow (Catalyst recurses per node — thousands of ranges overflow the
    # planner stack); the decomposers stay over-inclusive under the cap and
    # the exact refine restores precision
    if winner == "spatiotemporal_3d":
        parts = []
        for year, flo, fhi in windows:
            ranges = st_cell_ranges(
                minx, miny, maxx, maxy, flo, fhi, xy_bits, t_bits, max_ranges=64
            )
            pred = None
            for lo, hi in ranges:
                p = (F.col("st_cell") >= lo) & (F.col("st_cell") <= hi)
                pred = p if pred is None else (pred | p)
            parts.append(st.filter((F.col("time_bin") == year) & pred))
        routed = parts[0]
        for p in parts[1:]:
            routed = routed.unionByName(p)
    elif winner == "spatiotemporal_biased":
        parts = []
        for year, flo, fhi in windows:
            ranges = biased_key_ranges(
                minx, miny, maxx, maxy, flo, fhi, layouts["bias"], max_ranges=64
            )
            pred = None
            for lo, hi in ranges:
                p = (F.col("_bias_key") >= lo) & (F.col("_bias_key") <= hi)
                pred = p if pred is None else (pred | p)
            parts.append(layouts["biased"].filter((F.col("time_bin") == year) & pred))
        routed = parts[0]
        for p in parts[1:]:
            routed = routed.unionByName(p)
    else:
        from geowave_spark.sfc.tiered import decompose_query_ranges

        pred = None
        for lo, hi in decompose_query_ranges(minx, miny, maxx, maxy, xy_bits, 64, cfg):
            p = (F.col("_cell2d") >= lo) & (F.col("_cell2d") <= hi)
            pred = p if pred is None else (pred | p)
        routed = flat.filter(pred)
    return routed.filter(exact), winner


def biased_key_ranges(
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
    frac_lo: float,
    frac_hi: float,
    bias: str,
    max_ranges: int = 5000,
) -> list[tuple[int, int]]:
    """K2 for the compact-Hilbert BIAS layouts: (bbox, fraction-of-year
    window) -> inclusive ``_bias_key`` ranges via the prefix-tree descent
    (`sfc/compact_hilbert.py::compact_hilbert_ranges`)."""
    import numpy as np

    from geowave_spark.sfc.compact_hilbert import BIAS_BITS, compact_hilbert_ranges
    from geowave_spark.sfc.tiered import lat_bins, lon_bins, value_bins

    dims = BIAS_BITS[bias]
    xlo = int(lon_bins(np.array([minx]), dims[0], is_min=True)[0])
    xhi = int(lon_bins(np.array([maxx]), dims[0], is_min=False)[0])
    ylo = int(lat_bins(np.array([miny]), dims[1], is_min=True)[0])
    yhi = int(lat_bins(np.array([maxy]), dims[1], is_min=False)[0])
    tlo = int(value_bins(np.array([frac_lo]), dims[2], is_min=True)[0])
    thi = int(value_bins(np.array([min(frac_hi, 1.0)]), dims[2], is_min=False)[0])
    return compact_hilbert_ranges((xlo, ylo, tlo), (xhi, yhi, thi), dims, max_ranges)


def biased_st_decomposer(bias: str, max_ranges: int = 5000):
    """BIAS layout candidate for the chooser: needs bbox AND a bounded
    time window, like the 3D layout (any unbounded dimension -> full
    scan, the reference's `isFullTableScan` rule)."""

    def _d(c: dict):
        if "bbox" not in c or "t_range" not in c:
            return None
        minx, miny, maxx, maxy = c["bbox"]
        tlo, thi = c["t_range"]
        return biased_key_ranges(minx, miny, maxx, maxy, tlo, thi, bias, max_ranges)

    return _d


def spatiotemporal_3d_decomposer(xy_bits: int, t_bits: int, max_ranges: int = 5000):
    """3D (x, y, time) Z-order layout (K6): needs BOTH a bbox and a
    fraction-of-year time window; an unbounded time dimension makes this
    layout a full scan (`isFullTableScan`: ANY unbounded dimension)."""
    from geowave_spark.operators.indexing import st_cell_ranges

    def _d(c: dict):
        if "bbox" not in c or "t_range" not in c:
            return None
        minx, miny, maxx, maxy = c["bbox"]
        tlo, thi = c["t_range"]
        return st_cell_ranges(minx, miny, maxx, maxy, tlo, thi, xy_bits, t_bits, max_ranges)

    return _d
