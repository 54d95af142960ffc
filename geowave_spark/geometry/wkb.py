"""OGC WKB geometry codec (binary twin of the WKT layer).

SURVEY §1.1 planned binary geometry columns the way the reference stores
them (`GeometryUtils.java:221-253` — JTS WKBWriter/WKBReader); the engine
standardized on WKT strings for oracle-comparability, which costs ~2-5x on
the wire.  This module supplies the binary codec for the storage/shuffle
path: little-endian ISO WKB for Point / LineString / Polygon /
MultiPolygon, plus Arrow-batched Spark column codecs.  Round-trips are
bit-exact (doubles are copied, never reformatted), so WKB columns are safe
for the broadcast catalog and indexed table layouts where payload width
matters.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

_POINT, _LINESTRING, _POLYGON, _MULTIPOLYGON = 1, 2, 3, 6


def wkb_dumps(geom) -> bytes:
    """(kind, data) parsed geometry (or WKT string) -> little-endian WKB."""
    from geowave_spark.geometry.wkt import parse_wkt

    if isinstance(geom, str):
        geom = parse_wkt(geom)
    kind, data = geom
    out = bytearray()

    def ring_bytes(ring: np.ndarray) -> bytes:
        b = struct.pack("<I", len(ring))
        return b + np.asarray(ring, dtype="<f8").tobytes()

    if kind == "point":
        out += struct.pack("<bI", 1, _POINT)
        out += struct.pack("<dd", float(data[0]), float(data[1]))
    elif kind == "linestring":
        out += struct.pack("<bI", 1, _LINESTRING)
        out += ring_bytes(np.asarray(data))
    elif kind == "polygon":
        out += struct.pack("<bI", 1, _POLYGON)
        out += struct.pack("<I", len(data))
        for ring in data:
            out += ring_bytes(ring)
    elif kind == "multipolygon":
        out += struct.pack("<bI", 1, _MULTIPOLYGON)
        out += struct.pack("<I", len(data))
        for poly in data:
            out += struct.pack("<bI", 1, _POLYGON)
            out += struct.pack("<I", len(poly))
            for ring in poly:
                out += ring_bytes(ring)
    else:
        raise ValueError(f"unsupported geometry kind {kind}")
    return bytes(out)


def wkb_loads(buf: bytes):
    """WKB -> (kind, data) in the engine's parsed-geometry shape."""
    pos = 0

    def read(fmt):
        nonlocal pos
        vals = struct.unpack_from(fmt, buf, pos)
        pos += struct.calcsize(fmt)
        return vals

    def read_ring():
        nonlocal pos
        (n,) = read("<I")
        arr = np.frombuffer(buf, dtype="<f8", count=2 * n, offset=pos).reshape(n, 2)
        pos += 16 * n
        return arr.copy()

    (endian,) = read("<b")
    if endian != 1:
        raise ValueError("only little-endian WKB supported")
    (gtype,) = read("<I")
    if gtype & 0x20000000:  # EWKB SRID flag: consume the 4-byte SRID word
        gtype &= ~0x20000000
        read("<I")
    if gtype & 0xC0000000:  # EWKB Z/M flags: coordinate stride would differ
        raise ValueError("Z/M WKB coordinates not supported")
    if gtype > 6:  # ISO 1001+/2001+/3001+ (Z/M/ZM) or unknown types
        raise ValueError(f"unsupported WKB geometry type {gtype}")
    if gtype == _POINT:
        x, y = read("<dd")
        return ("point", (x, y))  # tuple, matching parse_wkt's convention
    if gtype == _LINESTRING:
        return ("linestring", read_ring())
    if gtype == _POLYGON:
        (nr,) = read("<I")
        return ("polygon", [read_ring() for _ in range(nr)])
    if gtype == _MULTIPOLYGON:
        (np_,) = read("<I")
        polys = []
        for _ in range(np_):
            read("<b")
            read("<I")
            (nr,) = read("<I")
            polys.append([read_ring() for _ in range(nr)])
        return ("multipolygon", polys)
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_to_wkt_str(buf: bytes) -> str:
    from geowave_spark.geometry.wkt import geom_to_wkt

    return geom_to_wkt(wkb_loads(buf))


@F.pandas_udf(BinaryType())
def wkt_to_wkb(wkt: pd.Series) -> pd.Series:
    """Arrow-batched column codec: WKT string -> WKB binary."""
    return pd.Series([None if w is None else wkb_dumps(w) for w in wkt])


@F.pandas_udf(StringType())
def wkb_to_wkt(b: pd.Series) -> pd.Series:
    """Arrow-batched column codec: WKB binary -> WKT string (shortest
    round-trip float repr, matching the WKT layer's formatting)."""
    return pd.Series([None if v is None else wkb_to_wkt_str(bytes(v)) for v in b])


def with_wkb_geometry(df, wkt_col: str = "geom_wkt", wkb_col: str = "geom_wkb"):
    """Storage-path helper: add the binary geometry column (keep or drop the
    WKT at the caller's discretion)."""
    return df.withColumn(wkb_col, wkt_to_wkb(F.col(wkt_col)))
