"""Raster coverage tiling (R5) + mosaic merge (R6).

Re-expresses the reference's raster ingest path as DataFrame stages:

- **Tier selection** (`RasterDataAdapter.convertToIndex`,
  `extensions/adapters/raster/.../adapter/RasterDataAdapter.java:391-516`):
  the tile world size is ``envelope_span * tileSize / grid_span`` per
  dimension; the chosen pyramid level is the substrategy whose cell size is
  closest to that without going over (``floorEntry(1.0 + eps)`` on the
  cell/tile-range ratio), falling back to the finest tier when every cell is
  larger.  With ``build_pyramid`` the coarser levels up to
  ``maxSpan / tileSize`` ingest too.
- **Tile chop + resample** (`MosaicPerPyramidLevelBuilder`,
  `RasterDataAdapter.java:520-700`): every SFC cell overlapping the coverage
  envelope at the chosen tier yields one tileSize^2 tile; target pixels
  sample the source grid nearest-neighbor at pixel centers; anything outside
  the source grid is nodata (the background/footprint fill).
- **Mosaic merge** (`NoDataMergeStrategy.java:36-100`): tiles landing on the
  same (tier, cell) merge per-pixel — the latest (highest-priority) tile
  wins where it has data, earlier tiles fill its nodata holes.

Spark shape: tiling is one Arrow-batched pass over the coverage table (the
only Python — resampling is genuinely per-pixel data work), bounded fan-out
(cells-per-coverage ~ envelope/cell ratio).  The merge is ONE groupBy on the
cell key using JVM higher-order functions (sort_array + aggregate +
zip_with): no Python, map-side partial collect, shuffle payload = one
tile array per (coverage, cell).  At 10^12-doc scale the cell key is uniform
within a coverage footprint; hot mosaics (many coverages on one cell) are
bounded by the overlap count, not the corpus.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.sfc import DEFAULT_CONFIG, SpatialConfig
from geowave_spark.sfc.tiered import bbox_span_bins

TILE_SIZE = 32
NODATA = -1
_REL_EPS = 1e-9  # MathUtils.EPSILON analog for the floorEntry(1.0 + eps) rule


def select_raster_tier(
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
    width_px: int,
    height_px: int,
    tile_size: int = TILE_SIZE,
    cfg: SpatialConfig = DEFAULT_CONFIG,
) -> int:
    """Full-resolution pyramid level: the coarsest tier whose cell size fits
    within the tile world size in BOTH dimensions (ratio <= 1 + eps), i.e.
    ``floorEntry`` on max_d(cell / tile_range_d); finest tier if none fits."""
    tile_world_min = min(
        (maxx - minx) * tile_size / width_px, (maxy - miny) * tile_size / height_px
    )
    fitting = [t for t in cfg.tiers if 360.0 / 2.0**t <= tile_world_min * (1.0 + _REL_EPS)]
    return min(fitting) if fitting else cfg.finest


def pyramid_tiers(
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
    width_px: int,
    height_px: int,
    tile_size: int = TILE_SIZE,
    cfg: SpatialConfig = DEFAULT_CONFIG,
) -> list[int]:
    """Full-res tier plus every coarser tier whose cell size <= maxSpan/tileSize
    world units... mirroring the buildPyramid tailMap/headMap walk: coarser
    levels ingest while one tile can still hold the whole span."""
    full = select_raster_tier(minx, miny, maxx, maxy, width_px, height_px, tile_size, cfg)
    tile_world_min = min(
        (maxx - minx) * tile_size / width_px, (maxy - miny) * tile_size / height_px
    )
    max_span_px = max(width_px, height_px)
    out = [full]
    for t in sorted(cfg.tiers, reverse=True):
        if t >= full:
            continue
        cell = 360.0 / 2.0**t
        ratio = cell / tile_world_min
        if ratio <= max_span_px / tile_size:
            out.append(t)
    return out


_TILE_SCHEMA = (
    "coverage_id string, tier int, xb long, yb long, cell long, pixels array<int>"
)


def _resample_bilinear(
    src: np.ndarray, wx: np.ndarray, wy: np.ndarray, r, pxw: float, pxh: float, nodata: int
) -> np.ndarray:
    """Bilinear resample of one tile: fractional source coordinates at the
    target pixel centers, edge-replicated at the grid border; a target pixel
    whose 4-neighborhood touches a source NODATA falls back to the nearest
    sample (the footprint rule — interpolating across nodata would smear the
    fill value into real data)."""
    h, w = src.shape
    fy = (wy - r.miny) / pxh - 0.5
    fx = (wx - r.minx) / pxw - 0.5
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    ty = (fy - y0)[:, None]
    tx = (fx - x0)[None, :]
    y0c, y1c = np.clip(y0, 0, h - 1), np.clip(y0 + 1, 0, h - 1)
    x0c, x1c = np.clip(x0, 0, w - 1), np.clip(x0 + 1, 0, w - 1)
    v00 = src[np.ix_(y0c, x0c)].astype(np.float64)
    v01 = src[np.ix_(y0c, x1c)].astype(np.float64)
    v10 = src[np.ix_(y1c, x0c)].astype(np.float64)
    v11 = src[np.ix_(y1c, x1c)].astype(np.float64)
    out = (
        v00 * (1 - ty) * (1 - tx)
        + v01 * (1 - ty) * tx
        + v10 * ty * (1 - tx)
        + v11 * ty * tx
    )
    tile = np.rint(out).astype(np.int32)
    touches_nodata = (
        (v00 == nodata) | (v01 == nodata) | (v10 == nodata) | (v11 == nodata)
    )
    if touches_nodata.any():
        # floor(f + 0.5), matching the nearest mode's floor((w-min)/px)
        # convention exactly (np.rint would round half-to-even)
        yn = np.clip(np.floor(fy + 0.5).astype(np.int64), 0, h - 1)
        xn = np.clip(np.floor(fx + 0.5).astype(np.int64), 0, w - 1)
        tile[touches_nodata] = src[np.ix_(yn, xn)][touches_nodata]
    return tile


def _resample_bicubic(
    src: np.ndarray,
    wx: np.ndarray,
    wy: np.ndarray,
    r,
    pxw: float,
    pxh: float,
    nodata: int,
    a: float = -0.5,
) -> np.ndarray:
    """Bicubic resample of one tile: the standard piecewise-cubic kernel
    with sharpness ``a`` (-0.5 = Catmull-Rom, JAI's INTERP_BICUBIC; -1.0 =
    JAI's INTERP_BICUBIC_2), 4x4 neighborhood, edge-replicated at the grid
    border, nearest fallback wherever the neighborhood touches source
    nodata (same footprint rule as bilinear)."""
    h, w = src.shape
    fy = (wy - r.miny) / pxh - 0.5
    fx = (wx - r.minx) / pxw - 0.5
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    ty = fy - y0
    tx = fx - x0

    def taps(t):
        # kernel at offsets -1..2 for fraction t: |s| = t+1, t, 1-t, 2-t
        s0, s1, s2, s3 = 1.0 + t, t, 1.0 - t, 2.0 - t
        return (
            a * s0**3 - 5 * a * s0**2 + 8 * a * s0 - 4 * a,
            (a + 2) * s1**3 - (a + 3) * s1**2 + 1.0,
            (a + 2) * s2**3 - (a + 3) * s2**2 + 1.0,
            a * s3**3 - 5 * a * s3**2 + 8 * a * s3 - 4 * a,
        )

    wys = taps(ty)
    wxs = taps(tx)
    out = np.zeros((len(wy), len(wx)), dtype=np.float64)
    touches_nodata = np.zeros_like(out, dtype=bool)
    for i in range(4):
        yc = np.clip(y0 + (i - 1), 0, h - 1)
        for j in range(4):
            xc = np.clip(x0 + (j - 1), 0, w - 1)
            v = src[np.ix_(yc, xc)].astype(np.float64)
            out += v * wys[i][:, None] * wxs[j][None, :]
            touches_nodata |= v == nodata
    tile = np.rint(out).astype(np.int32)
    if touches_nodata.any():
        yn = np.clip(np.floor(fy + 0.5).astype(np.int64), 0, h - 1)
        xn = np.clip(np.floor(fx + 0.5).astype(np.int64), 0, w - 1)
        tile[touches_nodata] = src[np.ix_(yn, xn)][touches_nodata]
    return tile


_INTERPOLATIONS = ("nearest", "bilinear", "bicubic", "bicubic2")


def raster_tiles(
    coverages: DataFrame,
    tile_size: int = TILE_SIZE,
    cfg: SpatialConfig = DEFAULT_CONFIG,
    build_pyramid: bool = False,
    nodata: int = NODATA,
    interpolation: str = "nearest",  # one of _INTERPOLATIONS
) -> DataFrame:
    """Chop each coverage into per-cell tileSize^2 tiles at its selected
    tier(s).  Output: one row per (coverage, tier, cell) with the resampled
    pixel array (row-major, row 0 = southernmost, nodata outside the source
    grid).

    ``interpolation`` mirrors the reference's configurable resampling on
    re-tiling (`RasterDataAdapter.java:391-516` carries a JAI Interpolation
    through `MosaicPerPyramidLevelBuilder`): ``nearest`` (the oracle-exact
    contract) samples the source grid at target pixel centers; ``bilinear``
    blends the 4-neighborhood with edge replication at the border and a
    nearest fallback wherever the neighborhood touches source nodata;
    ``bicubic`` / ``bicubic2`` apply the piecewise-cubic kernel at JAI's
    two sharpness settings (a=-0.5 / a=-1.0) over the 4x4 neighborhood
    with the same border and nodata rules.

    Input schema: (coverage_id, minx, miny, maxx, maxy, width, height,
    pixels array<int>) — `pixels` row-major, row 0 = southernmost.
    """
    if interpolation not in _INTERPOLATIONS:
        raise ValueError(f"unknown interpolation {interpolation!r}")

    def _chop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows: dict[str, list] = {
                "coverage_id": [],
                "tier": [],
                "xb": [],
                "yb": [],
                "cell": [],
                "pixels": [],
            }
            for r in pdf.itertuples(index=False):
                src = np.asarray(r.pixels, dtype=np.int32).reshape(r.height, r.width)
                tiers = (
                    pyramid_tiers(r.minx, r.miny, r.maxx, r.maxy, r.width, r.height, tile_size, cfg)
                    if build_pyramid
                    else [
                        select_raster_tier(
                            r.minx, r.miny, r.maxx, r.maxy, r.width, r.height, tile_size, cfg
                        )
                    ]
                )
                pxw = (r.maxx - r.minx) / r.width
                pxh = (r.maxy - r.miny) / r.height
                for t in tiers:
                    bins = 2.0**t
                    cellw = 360.0 / bins
                    xlo, xhi, ylo, yhi = (
                        int(a[0])
                        for a in bbox_span_bins(
                            np.array([r.minx]),
                            np.array([r.miny]),
                            np.array([r.maxx]),
                            np.array([r.maxy]),
                            t,
                        )
                    )
                    for cy in range(ylo, yhi + 1):
                        cell_miny = (cy / bins) * 360.0 - 180.0
                        wy = cell_miny + ((np.arange(tile_size) + 0.5) * cellw) / tile_size
                        row_i = np.floor((wy - r.miny) / pxh).astype(np.int64)
                        rok = (row_i >= 0) & (row_i < r.height)
                        for cx in range(xlo, xhi + 1):
                            cell_minx = (cx / bins) * 360.0 - 180.0
                            wx = cell_minx + ((np.arange(tile_size) + 0.5) * cellw) / tile_size
                            col_i = np.floor((wx - r.minx) / pxw).astype(np.int64)
                            cok = (col_i >= 0) & (col_i < r.width)
                            tile = np.full((tile_size, tile_size), nodata, dtype=np.int32)
                            ok = rok[:, None] & cok[None, :]
                            if interpolation == "bilinear":
                                tile[ok] = _resample_bilinear(
                                    src, wx, wy, r, pxw, pxh, nodata
                                )[ok]
                            elif interpolation in ("bicubic", "bicubic2"):
                                tile[ok] = _resample_bicubic(
                                    src, wx, wy, r, pxw, pxh, nodata,
                                    a=-0.5 if interpolation == "bicubic" else -1.0,
                                )[ok]
                            else:
                                tile[ok] = src[
                                    row_i.clip(0, r.height - 1)[:, None].repeat(tile_size, 1)[ok],
                                    col_i.clip(0, r.width - 1)[None, :].repeat(tile_size, 0)[ok],
                                ]
                            key = cfg.encode(
                                np.array([cx], dtype=np.uint64),
                                np.array([cy], dtype=np.uint64),
                                t,
                            )
                            out_rows["coverage_id"].append(r.coverage_id)
                            out_rows["tier"].append(t)
                            out_rows["xb"].append(cx)
                            out_rows["yb"].append(cy)
                            out_rows["cell"].append(int(key[0]))
                            out_rows["pixels"].append(tile.ravel().tolist())
            yield pd.DataFrame(out_rows)

    return coverages.mapInPandas(_chop, _TILE_SCHEMA)


def mosaic_tiles(
    tiles: DataFrame,
    tile_size: int = TILE_SIZE,
    nodata: int = NODATA,
    priority_col: str = "coverage_id",
) -> DataFrame:
    """NoDataMergeStrategy as pure JVM expressions: per (tier, cell), tiles
    sort descending by priority (latest wins) and fold with
    ``zip_with(acc, next, (a, b) -> if(a == nodata, b, a))`` — the latest
    tile's data pixels stand, earlier tiles fill its nodata holes.

    Output: (tier, xb, yb, cell, n_sources, merged array<int>).
    """
    npix = tile_size * tile_size
    grouped = tiles.groupBy("tier", "xb", "yb", "cell").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(priority_col).alias("p"), F.col("pixels").alias("px"))),
            asc=False,
        ).alias("ts"),
        # size(collect_set) instead of countDistinct: a distinct aggregate
        # alongside collect_list forces a second Exchange (keys + source in
        # the partial stage); the set materializes in the same single pass
        F.size(F.collect_set(F.col(priority_col))).cast("long").alias("n_sources"),
    )
    merged = grouped.withColumn(
        "merged",
        F.aggregate(
            F.col("ts"),
            F.expr(f"array_repeat(CAST({nodata} AS INT), {npix})"),
            lambda acc, t: F.zip_with(
                acc, t["px"], lambda a, b: F.when(a == F.lit(nodata), b).otherwise(a)
            ),
        ),
    )
    return merged.select("tier", "xb", "yb", "cell", "n_sources", "merged")


def mosaic_summary(merged: DataFrame, nodata: int = NODATA) -> DataFrame:
    """Oracle-comparable projection: per cell, contributing-source count,
    exact integer checksum of data pixels, nodata count."""
    return merged.select(
        "tier",
        "xb",
        "yb",
        "n_sources",
        F.aggregate(
            F.col("merged"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.when(x == F.lit(nodata), F.lit(0)).otherwise(x).cast("long"),
        ).alias("checksum"),
        F.size(F.filter(F.col("merged"), lambda x: x == F.lit(nodata))).alias("n_nodata"),
    )
