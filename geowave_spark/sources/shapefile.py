"""Dependency-free ESRI shapefile (.shp + .dbf) reader and writer.

The reference ingests shapefiles through GeoTools' SimpleFeature sources
(``extensions/formats/geotools-vector/.../GeoToolsVectorDataStoreIngestPlugin
.java``); this is the Spark-native equivalent with no GDAL/GeoTools: the
1998 ESRI whitepaper formats are fixed-layout binary (big/little-endian
struct fields), parsed with stdlib ``struct`` + numpy.

Scale shape: files load via Spark's ``binaryFile`` source (one row per
file, splits parallelize across files — shapefiles are capped at 2 GB by
the format itself, so per-file parallelism is the right unit), grouped by
path stem so each ``applyInPandas`` group sees exactly one shapefile's
``.shp`` and ``.dbf`` together.  Geometries emit as the engine's WKT, so a
shapefile zone layer feeds ``pip_join``/``areal_join`` unchanged (pinned in
tests/test_formats.py).

Format scope (stated honestly): shape types Null (0), Point (1),
PolyLine (3), Polygon (5), MultiPoint (8) — the 2D types the engine's
geometry model covers; Z/M types raise.  Polygon ring grouping follows the
spec: outer rings are clockwise (y-up), holes counter-clockwise, and each
hole is assigned to the outer ring that contains its first vertex (exact
even-odd containment via the engine's ray cast, not a bbox heuristic).
DBF: dBase III field types C (string), N/F (numeric), L (logical),
D (date-as-string); attributes emit as one canonical-JSON column, the way
the reference carries feature attributes it doesn't index.
"""

from __future__ import annotations

import json
import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SHAPEFILE_SCHEMA = (
    "source string, record_no int, geom_type string, geom_wkt string, "
    "attributes string"
)

_SHP_POINT, _SHP_POLYLINE, _SHP_POLYGON, _SHP_MULTIPOINT = 1, 3, 5, 8


# ---------------------------------------------------------------- writers


def _signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _close(ring) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[0]])
    return r


def shp_bytes(geoms: list[tuple[str, object]]) -> bytes:
    """Encode engine geometries ((kind, data) as in ``geometry/wkt.py``)
    as a .shp main file.  All geometries must share one shape type family
    (the format requires a single shape type per file): point ->
    Point, linestring -> PolyLine, polygon/multipolygon -> Polygon.
    Ring orientation is normalized to the spec (outer CW, holes CCW).
    """
    kinds = {k for k, _ in geoms}
    if kinds <= {"point"}:
        stype = _SHP_POINT
    elif kinds <= {"linestring"}:
        stype = _SHP_POLYLINE
    elif kinds <= {"polygon", "multipolygon"}:
        stype = _SHP_POLYGON
    else:
        raise ValueError(f"mixed/unsupported shapefile geometry kinds {kinds}")

    records = []
    allx, ally = [], []
    for i, (kind, data) in enumerate(geoms):
        if kind == "point":
            x, y = float(data[0]), float(data[1])
            content = struct.pack("<idd", _SHP_POINT, x, y)
            allx += [x, x]
            ally += [y, y]
        else:
            if kind == "linestring":
                parts = [np.asarray(data, dtype=np.float64)]
            else:
                polys = [data] if kind == "polygon" else data
                parts = []
                for rings in polys:
                    for ri, ring in enumerate(rings):
                        r = _close(ring)
                        # outer CW (negative shoelace area), holes CCW
                        want_cw = ri == 0
                        if (_signed_area(r) < 0) != want_cw:
                            r = r[::-1]
                        parts.append(r)
            pts = np.vstack(parts)
            offs, n = [], 0
            for p in parts:
                offs.append(n)
                n += len(p)
            bbox = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
            content = struct.pack("<i4d", stype, *bbox)
            content += struct.pack("<ii", len(parts), len(pts))
            content += struct.pack(f"<{len(parts)}i", *offs)
            content += pts.astype("<f8").tobytes()
            allx += [bbox[0], bbox[2]]
            ally += [bbox[1], bbox[3]]
        # record header: number (1-based) + content length, both BE 16-bit words
        records.append(struct.pack(">ii", i + 1, len(content) // 2) + content)

    body = b"".join(records)
    file_words = (100 + len(body)) // 2
    header = struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0, file_words)
    header += struct.pack("<ii", 1000, stype)
    header += struct.pack(
        "<8d",
        min(allx) if allx else 0.0,
        min(ally) if ally else 0.0,
        max(allx) if allx else 0.0,
        max(ally) if ally else 0.0,
        0.0, 0.0, 0.0, 0.0,
    )
    return header + body


def dbf_bytes(records: list[dict], fields: list[tuple[str, str, int, int]]) -> bytes:
    """dBase III .dbf: ``fields`` is [(name<=10, type C|N|F|L|D, length,
    decimals)]; records are dicts keyed by field name."""
    desc = b""
    rec_size = 1  # deletion flag
    for name, ftype, length, dec in fields:
        if ftype not in "CNFLD":
            raise ValueError(f"unsupported dbf field type {ftype!r}")
        desc += struct.pack(
            "<11sc4xBB14x", name.encode("ascii")[:10].ljust(11, b"\0"),
            ftype.encode("ascii"), length, dec,
        )
        rec_size += length
    header_size = 32 + len(desc) + 1
    out = struct.pack(
        "<B3BIHH20x", 0x03, 24, 1, 1, len(records), header_size, rec_size
    )
    out += desc + b"\x0d"
    for rec in records:
        row = b" "  # not deleted
        for name, ftype, length, dec in fields:
            v = rec.get(name)
            if v is None:
                s = b" " * length
            elif ftype == "C":
                s = str(v).encode("ascii", "replace")[:length].ljust(length, b" ")
            elif ftype in "NF":
                s = (f"{float(v):.{dec}f}" if dec else str(int(v))).encode("ascii")
                s = s[:length].rjust(length, b" ")
            elif ftype == "L":
                s = (b"T" if v else b"F").ljust(length, b" ")
            else:  # D: yyyymmdd string
                s = str(v).encode("ascii")[:length].ljust(length, b" ")
            row += s
        out += row
    return out + b"\x1a"


# ---------------------------------------------------------------- parsers


def parse_shp(buf: bytes) -> list[tuple[int, str, object]]:
    """.shp bytes -> [(record_no, kind, data)] in the engine's geometry
    model; Null shapes are skipped, Z/M shape types raise."""
    if len(buf) < 100 or struct.unpack_from(">i", buf, 0)[0] != 9994:
        raise ValueError("not a shapefile (.shp) payload")
    out = []
    pos = 100
    n = len(buf)
    while pos + 8 <= n:
        rec_no, clen = struct.unpack_from(">ii", buf, pos)
        pos += 8
        end = pos + clen * 2
        (stype,) = struct.unpack_from("<i", buf, pos)
        if stype == 0:
            pos = end
            continue
        if stype == _SHP_POINT:
            x, y = struct.unpack_from("<dd", buf, pos + 4)
            out.append((rec_no, "point", (x, y)))
        elif stype == _SHP_MULTIPOINT:
            (npts,) = struct.unpack_from("<i", buf, pos + 36)
            pts = np.frombuffer(buf, "<f8", npts * 2, pos + 40).reshape(npts, 2)
            for p in pts:
                out.append((rec_no, "point", (float(p[0]), float(p[1]))))
        elif stype in (_SHP_POLYLINE, _SHP_POLYGON):
            nparts, npts = struct.unpack_from("<ii", buf, pos + 36)
            offs = list(struct.unpack_from(f"<{nparts}i", buf, pos + 44)) + [npts]
            pts = np.frombuffer(
                buf, "<f8", npts * 2, pos + 44 + 4 * nparts
            ).reshape(npts, 2)
            parts = [pts[offs[i] : offs[i + 1]].copy() for i in range(nparts)]
            if stype == _SHP_POLYLINE:
                for part in parts:
                    out.append((rec_no, "linestring", part))
            else:
                out.append((rec_no,) + _assemble_polygons(parts))
        else:
            raise ValueError(
                f"unsupported shape type {stype} (Z/M shapefiles need the "
                "2D projection step a GIS library provides)"
            )
        pos = end
    return out


def _assemble_polygons(rings: list[np.ndarray]) -> tuple[str, object]:
    """Spec ring grouping: CW rings are outers, CCW are holes; each hole
    belongs to the outer that CONTAINS its first vertex (exact ray cast)."""
    from geowave_spark.geometry.predicates import _raycast

    outers = [r for r in rings if _signed_area(r) < 0]
    holes = [r for r in rings if _signed_area(r) >= 0]
    if not outers:  # degenerate: treat every ring as an outer
        outers, holes = rings, []
    polys = [[o[::-1]] for o in outers]  # engine convention: CCW outer
    for h in holes:
        px, py = float(h[0, 0]), float(h[0, 1])
        for oi, o in enumerate(outers):
            inside = bool(
                _raycast(
                    np.array([px]), np.array([py]),
                    o[:-1, 0], o[:-1, 1], o[1:, 0], o[1:, 1],
                )[0]
            )
            if inside:
                polys[oi].append(h)
                break
        else:
            polys[0].append(h)  # spec-violating stray hole: keep, don't drop
    if len(polys) == 1:
        return ("polygon", polys[0])
    return ("multipolygon", polys)


def parse_dbf(buf: bytes) -> list[dict | None]:
    """.dbf bytes -> one attributes dict per record, in file order.

    Soft-deleted records (``*`` flag) yield ``None`` rather than being
    dropped: the sibling .shp has no deletion concept, so record N of the
    .shp must always pair with slot N here — compacting the list would
    silently shift every later record onto its neighbour's attributes."""
    if len(buf) < 33:
        raise ValueError("not a dbf payload")
    n_rec, header_size, rec_size = struct.unpack_from("<IHH", buf, 4)
    fields = []
    pos = 32
    while pos < header_size - 1 and buf[pos] != 0x0D:
        name = buf[pos : pos + 11].split(b"\0")[0].decode("ascii")
        ftype = chr(buf[pos + 11])
        length, dec = buf[pos + 16], buf[pos + 17]
        fields.append((name, ftype, length, dec))
        pos += 32
    out = []
    pos = header_size
    for _ in range(n_rec):
        if pos + rec_size > len(buf):
            break
        if buf[pos : pos + 1] == b"*":  # deleted: placeholder keeps alignment
            out.append(None)
            pos += rec_size
            continue
        rec = {}
        fpos = pos + 1
        for name, ftype, length, dec in fields:
            raw = buf[fpos : fpos + length].decode("ascii", "replace").strip()
            fpos += length
            if raw == "":
                rec[name] = None
            elif ftype in "NF":
                rec[name] = float(raw) if (dec or "." in raw) else int(raw)
            elif ftype == "L":
                rec[name] = raw.upper() in ("T", "Y")
            else:
                rec[name] = raw
        out.append(rec)
        pos += rec_size
    return out


# ----------------------------------------------------------------- reader


def read_shapefile(
    spark: SparkSession, path: str, max_file_bytes: int | None = None
) -> DataFrame:
    """Shapefile(s) -> (source, record_no, geom_type, geom_wkt, attributes)
    rows.  ``path`` is a glob that must match the ``.shp`` files and their
    sibling ``.dbf`` files (e.g. ``/data/zones.*`` or ``/data/*``); a .shp
    with no .dbf yields null attributes.  PolyLine records explode one row
    per part; MultiPoint one row per point (record_no ties parts back
    together) — same convention as the GeoJSON reader's multi-part
    explode."""
    from geowave_spark.geometry.wkt import geom_to_wkt
    from geowave_spark.sources.formats import MAX_WHOLE_FILE_BYTES, _guard_whole_file

    if max_file_bytes is None:
        max_file_bytes = MAX_WHOLE_FILE_BYTES

    bins = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .filter(F.lower(F.col("path")).rlike(r"\.(shp|dbf)$"))
        .withColumn("stem", F.regexp_replace("path", r"\.[^./]+$", ""))
    )

    def _parse_group(pdf):
        import pandas as pd

        shp = dbf = None
        stem = ""
        for p, c in zip(pdf["path"], pdf["content"]):
            # one stem = one applyInPandas group = one task: refuse a
            # single payload that can't be one Arrow row, same discipline
            # as the whole-file text parses
            _guard_whole_file(p, c, max_file_bytes, "shapefile member")
            stem = p.rsplit("/", 1)[-1].rsplit(".", 1)[0]
            if p.lower().endswith(".shp"):
                shp = bytes(c)
            elif p.lower().endswith(".dbf"):
                dbf = bytes(c)
        cols = ["source", "record_no", "geom_type", "geom_wkt", "attributes"]
        if shp is None:  # stray .dbf with no geometry
            return pd.DataFrame(columns=cols)
        attrs = parse_dbf(dbf) if dbf is not None else []
        rows = []
        for rec_no, kind, data in parse_shp(shp):
            a = attrs[rec_no - 1] if rec_no - 1 < len(attrs) else None
            rows.append(
                (
                    f"{stem}.shp",
                    rec_no,
                    kind,
                    geom_to_wkt((kind, data)),
                    json.dumps(a, sort_keys=True) if a is not None else None,
                )
            )
        return pd.DataFrame(rows, columns=cols)

    return bins.groupBy("stem").applyInPandas(_parse_group, SHAPEFILE_SCHEMA)
