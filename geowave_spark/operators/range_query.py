"""Spatial (box / polygon ± temporal) range queries — the primary query path.

Mirrors the reference lifecycle (`AccumuloDataStore.query`, SURVEY.md §3.1):

1. constraint planning: query geometry -> bbox hypercube(s), date-line aware
   (two bins when wrapping, `LongitudeDefinition.java:38-88`)
2. coarse filter: per-dimension range predicates — pure Catalyst, pushed to
   the parquet scan (the analog of SFC range decomposition + BatchScanner
   pruning; optionally an explicit SFC key-range predicate when the table
   carries `cell`, mirroring K2)
3. fine refine: exact geometry predicate in one Arrow-batched UDF
   (`SpatialQueryFilter.java:182-228` OVERLAPS/CONTAINS), prepared once per
   batch like the reference's interned prepared geometries (`:286-363`).

Box queries over point data skip step 3 entirely (the coarse filter is
already exact) — the F1-only / IndexOnlySpatialQuery fast path.
"""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from geowave_spark.geometry.predicates import PreparedGeometry
from geowave_spark.geometry.wkt import parse_wkt
from geowave_spark.sfc import (
    DEFAULT_CONFIG,
    SpatialConfig,
    decompose_query_ranges,
    normalize_lon_range,
)

_PREPARED_CACHE: dict[str, PreparedGeometry] = {}


def _prepared(wkt: str) -> PreparedGeometry:
    pg = _PREPARED_CACHE.get(wkt)
    if pg is None:
        pg = _PREPARED_CACHE[wkt] = PreparedGeometry(wkt)
    return pg


def _is_box(geom) -> bool:
    """Axis-aligned rectangle detection (coarse filter is then exact)."""
    kind, data = geom
    if kind != "polygon" or len(data) != 1:
        return False
    ring = data[0]
    if len(ring) != 5:
        return False
    xs, ys = set(ring[:, 0].tolist()), set(ring[:, 1].tolist())
    return len(xs) == 2 and len(ys) == 2


def bbox_predicate(
    geom_wkt: str, lon_col: Column, lat_col: Column
) -> tuple[Column, tuple[float, float, float, float]]:
    """Coarse per-dimension predicate with date-line wrap -> (predicate, bbox)."""
    from geowave_spark.geometry.wkt import geom_bbox

    geom = parse_wkt(geom_wkt)
    minx, miny, maxx, maxy = geom_bbox(geom)
    pred = None
    for lo, hi in normalize_lon_range(minx, maxx):
        p = (lon_col >= lo) & (lon_col <= hi)
        pred = p if pred is None else (pred | p)
    pred = pred & (lat_col >= miny) & (lat_col <= maxy)
    return pred, (minx, miny, maxx, maxy)


def sfc_range_predicate(
    geom_wkt: str,
    cell_col: Column,
    bits: int,
    cfg: SpatialConfig = DEFAULT_CONFIG,
    max_ranges: int = 64,
) -> Column:
    """Explicit SFC key-range predicate (K2) for tables sorted by cell —
    enables parquet row-group pruning on the key column at scale."""
    from geowave_spark.geometry.wkt import geom_bbox

    minx, miny, maxx, maxy = geom_bbox(parse_wkt(geom_wkt))
    pred = None
    for lo_lon, hi_lon in normalize_lon_range(minx, maxx):
        for lo, hi in decompose_query_ranges(
            lo_lon, miny, hi_lon, maxy, bits=bits, max_ranges=max_ranges, cfg=cfg
        ):
            p = (cell_col >= lo) & (cell_col <= hi)
            pred = p if pred is None else (pred | p)
    return pred if pred is not None else F.lit(True)


def pip_udf(geom_wkt: str, compare_op: str = "OVERLAPS"):
    """Fine-filter UDF for point rows vs one query geometry."""

    @F.pandas_udf(BooleanType())
    def _pip(lon: pd.Series, lat: pd.Series) -> pd.Series:
        pg = _prepared(geom_wkt)
        m = pg.contains_points(lon.to_numpy(np.float64), lat.to_numpy(np.float64))
        return pd.Series(m)

    return _pip


def spatial_query_points(
    df: DataFrame,
    geom_wkt: str,
    compare_op: str = "OVERLAPS",
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str | None = None,
    ts_range: tuple[datetime, datetime] | None = None,
    cell_col: str | None = None,
    cfg: SpatialConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Spatial (± temporal) filter over point features.

    For zero-dimensional data OVERLAPS == CONTAINS (point within geometry),
    per BasicQueryFilter op semantics (`BasicQueryFilter.java:40-63`).
    """
    geom = parse_wkt(geom_wkt)
    coarse, _ = bbox_predicate(geom_wkt, F.col(lon_col), F.col(lat_col))
    if cell_col is not None:
        coarse = sfc_range_predicate(geom_wkt, F.col(cell_col), cfg.finest, cfg) & coarse
    out = df.filter(coarse)
    if not _is_box(geom) and geom[0] in ("polygon", "multipolygon"):
        # exact refine as a pure Catalyst expression (unrolled ray cast) —
        # no Python round-trip for point rows vs an areal query geometry
        from geowave_spark.geometry.pip_expr import pip_point_expr

        out = out.filter(pip_point_expr(geom_wkt, F.col(lon_col), F.col(lat_col)))
    elif not _is_box(geom):
        out = out.filter(pip_udf(geom_wkt, compare_op)(F.col(lon_col), F.col(lat_col)))
    if ts_col is not None and ts_range is not None:
        out = out.filter((F.col(ts_col) >= F.lit(ts_range[0])) & (F.col(ts_col) < F.lit(ts_range[1])))
    return out


def _edges_cross(line: np.ndarray, pg: PreparedGeometry) -> bool:
    from geowave_spark.geometry.predicates import segments_intersect

    ax1, ay1, ax2, ay2 = line[:-1, 0], line[:-1, 1], line[1:, 0], line[1:, 1]
    for x1, y1, x2, y2 in pg._rings:
        for j in range(len(x1)):
            if segments_intersect(ax1, ay1, ax2, ay2, x1[j], y1[j], x2[j], y2[j]).any():
                return True
    return False


def line_filter_udf(geom_wkt: str, compare_op: str):
    """Fine filter for linestring rows (tracks) vs one query geometry.

    OVERLAPS = JTS intersects; CONTAINS = geometry within query
    (`SpatialQueryFilter.java:54-96`).  Query geometry prepared once; track
    WKT parsed per row inside the Arrow batch (minority path).
    """

    @F.pandas_udf(BooleanType())
    def _f(wkt: pd.Series) -> pd.Series:
        from geowave_spark.geometry.predicates import (
            linestring_intersects_box,
            linestring_intersects_polygon,
            linestring_within_box,
        )

        pg = _prepared(geom_wkt)
        is_box = _is_box((pg.kind, pg.data))
        minx, miny, maxx, maxy = pg.bbox
        out = np.zeros(len(wkt), dtype=bool)
        for i, w in enumerate(wkt):
            if w is None:
                continue
            kind, data = parse_wkt(w)
            if kind == "point":
                out[i] = bool(pg.contains_points(np.array([data[0]]), np.array([data[1]]))[0])
                continue
            line = data
            if compare_op == "CONTAINS":
                if is_box:
                    out[i] = linestring_within_box(line, minx, miny, maxx, maxy)
                else:
                    # within: all vertices inside AND no edge crosses the
                    # boundary (covers concave query polygons)
                    inside_all = bool(pg.contains_points(line[:, 0], line[:, 1]).all())
                    out[i] = inside_all and not _edges_cross(line, pg)
            else:
                if is_box:
                    out[i] = linestring_intersects_box(line, minx, miny, maxx, maxy)
                else:
                    out[i] = linestring_intersects_polygon(line, pg)
        return pd.Series(out)

    return _f


def spatial_query_tracks(
    df: DataFrame,
    geom_wkt: str,
    compare_op: str = "OVERLAPS",
    wkt_col: str = "geom_wkt",
    bbox_cols: tuple[str, str, str, str] | None = None,
) -> DataFrame:
    """Spatial filter over line features (tornado-tracks analog)."""
    out = df
    if bbox_cols is not None:
        from geowave_spark.geometry.wkt import geom_bbox

        qminx, qminy, qmaxx, qmaxy = geom_bbox(parse_wkt(geom_wkt))
        bminx, bminy, bmaxx, bmaxy = (F.col(c) for c in bbox_cols)
        if compare_op == "CONTAINS":
            coarse = (bminx >= qminx) & (bmaxx <= qmaxx) & (bminy >= qminy) & (bmaxy <= qmaxy)
        else:
            coarse = (bmaxx >= qminx) & (bminx <= qmaxx) & (bmaxy >= qminy) & (bminy <= qmaxy)
        out = out.filter(coarse)
    return out.filter(line_filter_udf(geom_wkt, compare_op)(F.col(wkt_col)))
