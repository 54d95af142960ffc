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
    return hull_ring_wkt(monotone_chain(xy))


def _seg_point_dist(ax, ay, bx, by, px, py) -> float:
    """Perpendicular distance from point to segment, or -1 when the
    projection falls outside the segment (GeometryHullTool.calcDistance:900-909
    — candidates must project onto the edge being dug)."""
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    if L2 == 0.0:
        return -1.0
    t = ((px - ax) * dx + (py - ay) * dy) / L2
    if t < 0.0 or t > 1.0:
        return -1.0
    ex, ey = ax + t * dx - px, ay + t * dy - py
    return float(np.hypot(ex, ey))


def _proper_cross(ax, ay, bx, by, cx, cy, dx, dy) -> bool:
    def orient(ox, oy, px, py, qx, qy):
        return np.sign((px - ox) * (qy - oy) - (py - oy) * (qx - ox))

    d1 = orient(cx, cy, dx, dy, ax, ay)
    d2 = orient(cx, cy, dx, dy, bx, by)
    d3 = orient(ax, ay, bx, by, cx, cy)
    d4 = orient(ax, ay, bx, by, dx, dy)
    return bool(d1 * d2 < 0 and d3 * d4 < 0)


def concave_hull(xy: np.ndarray, threshold: float = 1.8) -> np.ndarray:
    """Park-Oh "dig" concave hull (GeometryHullTool.concaveHullParkOhMethod,
    `analytics/api/.../GeometryHullTool.java:268-380`): start from the convex
    hull, repeatedly take the longest live edge and, when its nearest
    projecting inner point digs deep enough (edge_len / min(dist to endpoints)
    > threshold, the paper's N), split the edge through that point — skipping
    digs that would self-intersect or steal a point closer to another edge.
    Deterministic: ties break lexicographically; returns ring vertices in
    order without repeating the first.
    """
    import heapq

    hull = monotone_chain(xy)
    if len(hull) <= 3:
        return hull
    hull_set = {(float(x), float(y)) for x, y in hull}
    inner = sorted(
        {(float(x), float(y)) for x, y in np.unique(xy, axis=0)} - hull_set
    )
    nxt: dict[tuple, tuple] = {}
    heap: list = []
    queued: set[tuple] = set()  # the reference's live TreeSet working set
    ring = [tuple(map(float, p)) for p in hull]

    def push(a, b, length):
        heapq.heappush(heap, (-length, a, b))
        queued.add((a, b))

    for a, b in zip(ring, ring[1:] + ring[:1]):
        nxt[a] = b
        push(a, b, float(np.hypot(b[0] - a[0], b[1] - a[1])))
    start = ring[0]

    def alive_edges():
        a = start
        while True:
            b = nxt[a]
            yield a, b
            a = b
            if a == start:
                return

    while heap and inner:
        neg_len, a, b = heapq.heappop(heap)
        if nxt.get(a) != b or (a, b) not in queued:
            continue  # stale entry (edge already split)
        queued.discard((a, b))
        eh = -neg_len
        score, cand = np.inf, None
        for p in inner:
            d = _seg_point_dist(a[0], a[1], b[0], b[1], p[0], p[1])
            if abs(d) <= 1e-9 and d >= 0.0:
                score, cand = 0.0, p
                break
            if d > 0.0 and d < score:
                score, cand = d, p
        if cand is None:
            continue  # edge retired: nothing projects onto it
        if score == 0.0:
            inner.remove(cand)  # already on the boundary
            push(a, b, eh)
            continue
        # the reference checks closer-ness against the REMAINING working set
        # only (`isCandidateCloserToAnotherEdge`, :550-571): a retired edge no
        # longer claims candidates, so digging migrates to the closer edge
        closer_elsewhere = any(
            _seg_point_dist(ea[0], ea[1], eb[0], eb[1], cand[0], cand[1]) >= 0
            and _seg_point_dist(ea[0], ea[1], eb[0], eb[1], cand[0], cand[1]) < score
            for (ea, eb) in queued
            if nxt.get(ea) == eb
        )
        if closer_elsewhere:
            continue  # edge retired, candidate stays available
        inner.remove(cand)  # consumed whether or not the dig proceeds (:335)
        d1 = float(np.hypot(cand[0] - a[0], cand[1] - a[1]))
        d2 = float(np.hypot(cand[0] - b[0], cand[1] - b[1]))
        if eh / max(min(d1, d2), 1e-300) <= threshold:
            continue  # not concave enough to dig; edge retired
        crosses = any(
            (ea, eb) != (a, b)
            and (
                _proper_cross(a[0], a[1], cand[0], cand[1], ea[0], ea[1], eb[0], eb[1])
                or _proper_cross(cand[0], cand[1], b[0], b[1], ea[0], ea[1], eb[0], eb[1])
            )
            for ea, eb in alive_edges()
        )
        if crosses:
            continue
        nxt[a] = cand
        nxt[cand] = b
        push(a, cand, d1)
        push(cand, b, d2)

    out = []
    p = start
    while True:
        out.append(p)
        p = nxt[p]
        if p == start:
            break
    return np.array(out)


def concave_hull_wkt(xy: np.ndarray, threshold: float = 1.8) -> str:
    return hull_ring_wkt(concave_hull(xy, threshold))


def hull_ring_wkt(h: np.ndarray) -> str:
    """Format an already-computed hull ring (avoids re-running the dig)."""
    if len(h) == 1:
        return f"POINT ({float(h[0, 0])!r} {float(h[0, 1])!r})"
    if len(h) == 2:
        return "LINESTRING (" + ", ".join(f"{float(x)!r} {float(y)!r}" for x, y in h) + ")"
    ring = np.vstack([h, h[:1]])
    return "POLYGON ((" + ", ".join(f"{float(x)!r} {float(y)!r}" for x, y in ring) + "))"


def group_concave_hulls(
    df: DataFrame,
    group_col: str = "cluster",
    lon_col: str = "lon",
    lat_col: str = "lat",
    threshold: float = 1.8,
) -> DataFrame:
    """One Park-Oh concave hull row per group — the DBSCAN hull stage the
    reference runs through ConvexHullMapReduce with GeometryHullTool."""

    def _hull(pdf: pd.DataFrame) -> pd.DataFrame:
        xy = pdf[[lon_col, lat_col]].to_numpy(np.float64)
        h = concave_hull(xy, threshold)  # ONE dig; WKT formats the result
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "hull_wkt": [hull_ring_wkt(h)],
                "n_points": [len(pdf)],
                "n_vertices": [len(h)],
            }
        )

    gtype = dict(df.dtypes)[group_col]
    schema = f"{group_col} {gtype}, hull_wkt string, n_points bigint, n_vertices bigint"
    return df.groupBy(group_col).applyInPandas(_hull, schema)


def _ring_area(ring: np.ndarray) -> float:
    """Shoelace area of an open ring (absolute value)."""
    x, y = ring[:, 0], ring[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def group_concave_hull_invariants(
    df: DataFrame,
    group_col: str = "cluster",
    lon_col: str = "lon",
    lat_col: str = "lat",
    threshold: float = 1.8,
) -> DataFrame:
    """Concave hull per group + machine-checked invariants — the checkable
    surface for the Park-Oh dig (`GeometryHullTool.java:268-380`), whose
    greedy loop is not SQL-expressible.  Per group the hull is computed AND
    verified with the engine's independent ray-cast/area kernels:

    - ``members_inside``: every member is strictly inside the hull ring, IS a
      hull vertex, or lies within eps of a hull edge;
    - ``vertices_are_members``: every hull vertex is one of the group's own
      points (the dig only ever inserts data points);
    - ``area_le_convex``: shoelace area of the concave ring <= the convex
      hull's (digging only removes area).

    A SQL oracle can then independently derive the group structure
    (cluster -> n_points) and assert the three booleans are all TRUE.
    """

    def _check(pdf: pd.DataFrame) -> pd.DataFrame:
        from geowave_spark.geometry.predicates import PreparedGeometry

        xy = pdf[[lon_col, lat_col]].to_numpy(np.float64)
        h = concave_hull(xy, threshold)
        conv = monotone_chain(xy)
        if len(h) < 3:
            # degenerate groups: a point hull means every member coincides
            # with it; a segment hull (3+ collinear points) means every
            # member lies ON the segment, not just at its endpoints
            if len(h) == 1:
                verts = {(float(x), float(y)) for x, y in h}
                inside = all((float(x), float(y)) in verts for x, y in xy)
            else:
                span = float(max(np.ptp(xy[:, 0]), np.ptp(xy[:, 1]), 1e-12))
                eps = 1e-9 * span
                (ax, ay), (bx, by) = h[0], h[1]
                inside = all(
                    (float(x), float(y)) in {(float(ax), float(ay)), (float(bx), float(by))}
                    or 0.0 <= _seg_point_dist(ax, ay, bx, by, x, y) <= eps
                    for x, y in xy
                )
            return pd.DataFrame(
                {
                    group_col: [pdf[group_col].iloc[0]],
                    "n_points": [len(pdf)],
                    "members_inside": [inside],
                    "vertices_are_members": [True],
                    "area_le_convex": [True],
                }
            )
        ring = np.vstack([h, h[:1]])
        pg = PreparedGeometry(("polygon", [ring]))
        inside = pg.contains_points(xy[:, 0], xy[:, 1])
        hull_set = {(float(x), float(y)) for x, y in h}
        span = float(max(np.ptp(xy[:, 0]), np.ptp(xy[:, 1]), 1e-12))
        eps = 1e-9 * span
        members_inside = True
        for (x, y), ok in zip(xy, inside):
            if ok or (float(x), float(y)) in hull_set:
                continue
            # boundary tolerance: ray-cast half-open edges can classify a
            # point ON a dug edge as outside
            on_edge = any(
                0.0 <= _seg_point_dist(a[0], a[1], b[0], b[1], x, y) <= eps
                for a, b in zip(ring[:-1], ring[1:])
            )
            if not on_edge:
                members_inside = False
                break
        pts_set = {(float(x), float(y)) for x, y in xy}
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_points": [len(pdf)],
                "members_inside": [members_inside],
                "vertices_are_members": [hull_set <= pts_set],
                "area_le_convex": [
                    _ring_area(h) <= _ring_area(conv) * (1.0 + 1e-12)
                ],
            }
        )

    gtype = dict(df.dtypes)[group_col]
    schema = (
        f"{group_col} {gtype}, n_points bigint, members_inside boolean, "
        "vertices_are_members boolean, area_le_convex boolean"
    )
    return df.groupBy(group_col).applyInPandas(_check, schema)


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
