"""Minimal vectorized WKT codec (no shapely in this environment).

The reference carries geometry as JTS objects serialized to WKB
(`/root/reference/core/geotime/src/main/java/mil/nga/giat/geowave/core/geotime/GeometryUtils.java:221-253`);
our engine carries WKT strings in DataFrame columns and parses them inside
Arrow-batched UDFs.  Supported types (all the fixtures use): POINT,
LINESTRING, POLYGON (with holes), MULTIPOLYGON.

A parsed geometry is a tuple (kind, data):
  ('point', (x, y))
  ('linestring', ndarray[N,2])
  ('polygon', [ring0, ring1, ...])           # ring = ndarray[N,2], ring0 = shell
  ('multipolygon', [polygon_data, ...])
"""

from __future__ import annotations

import re

import numpy as np

_POINT_RE = re.compile(r"POINT\s*\(\s*([-+0-9.eE]+)\s+([-+0-9.eE]+)\s*\)")


def _parse_coords(body: str) -> np.ndarray:
    pts = [p.split() for p in body.split(",")]
    return np.array([[float(a), float(b)] for a, b, *_ in pts], dtype=np.float64)


def _split_rings(body: str) -> list[np.ndarray]:
    # body like "(x y, x y, ...), (x y, ...)"
    rings = re.findall(r"\(([^()]*)\)", body)
    return [_parse_coords(r) for r in rings]


def parse_wkt(wkt: str):
    s = wkt.strip()
    u = s.upper()
    if u.startswith("POINT"):
        m = _POINT_RE.match(u)
        if not m:
            body = s[s.index("(") + 1 : s.rindex(")")]
            arr = _parse_coords(body)
            return ("point", (float(arr[0, 0]), float(arr[0, 1])))
        return ("point", (float(m.group(1)), float(m.group(2))))
    if u.startswith("LINESTRING"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return ("linestring", _parse_coords(body))
    if u.startswith("MULTIPOLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        polys = re.findall(r"\(\(.*?\)\)", body, flags=re.S)
        return ("multipolygon", [_split_rings(p) for p in polys])
    if u.startswith("POLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return ("polygon", _split_rings("(" + body + ")" if "(" not in body else body))
    raise ValueError(f"unsupported WKT: {s[:40]}")


def geom_to_wkt(geom) -> str:
    """Inverse of :func:`parse_wkt` with shortest-round-trip float repr
    (bit-exact double round-trips, the engine-wide formatting convention)."""
    kind, data = geom

    def coords(arr) -> str:
        # float() before !r: numpy >= 2.0 reprs scalars as 'np.float64(x)'
        return ", ".join(f"{float(x)!r} {float(y)!r}" for x, y in np.asarray(arr))

    if kind == "point":
        return f"POINT ({float(data[0])!r} {float(data[1])!r})"
    if kind == "linestring":
        return f"LINESTRING ({coords(data)})"
    if kind == "polygon":
        return "POLYGON (" + ", ".join(f"({coords(r)})" for r in data) + ")"
    if kind == "multipolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(f"({coords(r)})" for r in p) + ")" for p in data)
            + ")"
        )
    raise ValueError(kind)


def points_from_wkt(series) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized fast path: pandas Series of 'POINT (x y)' -> (x, y) arrays."""
    ext = series.str.extract(r"POINT\s*\(\s*([-+0-9.eE]+)\s+([-+0-9.eE]+)\s*\)")
    return ext[0].astype(np.float64).to_numpy(), ext[1].astype(np.float64).to_numpy()


def geom_bbox(geom) -> tuple[float, float, float, float]:
    kind, data = geom
    if kind == "point":
        x, y = data
        return (x, y, x, y)
    if kind == "linestring":
        return (
            float(data[:, 0].min()),
            float(data[:, 1].min()),
            float(data[:, 0].max()),
            float(data[:, 1].max()),
        )
    if kind == "polygon":
        shell = data[0]
        return (
            float(shell[:, 0].min()),
            float(shell[:, 1].min()),
            float(shell[:, 0].max()),
            float(shell[:, 1].max()),
        )
    if kind == "multipolygon":
        boxes = [geom_bbox(("polygon", p)) for p in data]
        return (
            min(b[0] for b in boxes),
            min(b[1] for b in boxes),
            max(b[2] for b in boxes),
            max(b[3] for b in boxes),
        )
    raise ValueError(kind)


def geom_centroid(geom) -> tuple[float, float]:
    """JTS-compatible centroid (the reference test oracle hashes this:
    `GeoWaveTestEnvironment.java:328-332`).

    point -> itself; linestring -> length-weighted segment midpoints;
    polygon -> area-weighted (shoelace), holes subtract.
    """
    kind, data = geom
    if kind == "point":
        return data
    if kind == "linestring":
        seg = np.diff(data, axis=0)
        lens = np.hypot(seg[:, 0], seg[:, 1])
        mids = (data[:-1] + data[1:]) / 2.0
        total = lens.sum()
        if total == 0:
            return (float(data[0, 0]), float(data[0, 1]))
        return (float((mids[:, 0] * lens).sum() / total), float((mids[:, 1] * lens).sum() / total))
    if kind == "polygon":
        a_sum = cx_sum = cy_sum = 0.0
        for i, ring in enumerate(data):
            x, y = ring[:, 0], ring[:, 1]
            cross = x[:-1] * y[1:] - x[1:] * y[:-1]
            a = cross.sum() / 2.0
            if a == 0:
                continue
            cx = ((x[:-1] + x[1:]) * cross).sum() / (6.0 * a)
            cy = ((y[:-1] + y[1:]) * cross).sum() / (6.0 * a)
            w = abs(a) * (1 if i == 0 else -1)
            a_sum += w
            cx_sum += cx * w
            cy_sum += cy * w
        return (cx_sum / a_sum, cy_sum / a_sum)
    if kind == "multipolygon":
        a_sum = cx_sum = cy_sum = 0.0
        for p in data:
            cx, cy = geom_centroid(("polygon", p))
            # area of polygon with holes
            area = 0.0
            for i, ring in enumerate(p):
                x, y = ring[:, 0], ring[:, 1]
                a = abs((x[:-1] * y[1:] - x[1:] * y[:-1]).sum() / 2.0)
                area += a if i == 0 else -a
            a_sum += area
            cx_sum += cx * area
            cy_sum += cy * area
        return (cx_sum / a_sum, cy_sum / a_sum)
    raise ValueError(kind)


def hash_centroid(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Port of the reference integration-test oracle hash
    (`GeoWaveTestEnvironment.java:328-332`):
    Double.doubleToLongBits(x) + Double.doubleToLongBits(y*31), int64 wrap.
    """
    bx = np.asarray(x, dtype=np.float64).view(np.int64)
    by = (np.asarray(y, dtype=np.float64) * 31.0).view(np.int64)
    with np.errstate(over="ignore"):
        return (bx.astype(np.uint64) + by.astype(np.uint64)).astype(np.int64)
