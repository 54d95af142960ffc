"""Convex hulls per group (J5 hull stage / §2.7 scalar).

The reference computes per-cluster convex hulls with JTS inside a reducer
(`analytics/mapreduce/.../clustering/ConvexHullMapReduce.java:249-255`,
`analytics/api/.../GeometryHullTool.java`).  Spark shape: groupBy(cluster)
-> applyInPandas with a vectorized Andrew monotone-chain (numpy argsort +
cross products) per group — groups are cluster-sized (bounded), the shuffle
key is the cluster id, and the output is one WKT row per cluster.

Deterministic: hull vertices start from the lexicographically smallest
(x, y) point and wind counter-clockwise, so WKT strings are comparable
across runs and against the shapely/python oracle in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def monotone_chain(xy: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns CCW hull vertices starting at the
    lexicographically smallest point, without repeating the first point."""
    pts = np.unique(xy, axis=0)  # sorts lexicographically (x, then y)
    if len(pts) <= 2:
        return pts
    def half(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out
    lower = half(pts)
    upper = half(pts[::-1])
    hull = np.array(lower[:-1] + upper[:-1])
    return hull


def hull_wkt(xy: np.ndarray) -> str:
    h = monotone_chain(xy)
    if len(h) == 1:
        return f"POINT ({h[0,0]!r} {h[0,1]!r})"
    if len(h) == 2:
        return "LINESTRING (" + ", ".join(f"{x!r} {y!r}" for x, y in h) + ")"
    ring = np.vstack([h, h[:1]])
    return "POLYGON ((" + ", ".join(f"{x!r} {y!r}" for x, y in ring) + "))"


def group_hulls(
    df: DataFrame,
    group_col: str = "cluster",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """One hull row per group: (group, hull_wkt, n_points, n_vertices)."""

    def _hull(pdf: pd.DataFrame) -> pd.DataFrame:
        xy = pdf[[lon_col, lat_col]].to_numpy(np.float64)
        h = monotone_chain(xy)
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "hull_wkt": [hull_wkt(xy)],
                "n_points": [len(pdf)],
                "n_vertices": [len(h)],
            }
        )

    gtype = dict(df.dtypes)[group_col]
    schema = f"{group_col} {gtype}, hull_wkt string, n_points bigint, n_vertices bigint"
    return df.groupBy(group_col).applyInPandas(_hull, schema)
