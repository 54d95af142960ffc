"""Span -> geometry extraction over the interleaved docs table.

The engine's primary input (BASELINE.json input_hint) is
``docs(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``; geometries
travel as WKT in spans with kind='geo' (FIXTURES.md convention).  This module
extracts per-doc geometry *without touching the spans column* — the per-row
invariant is span-sequence equality (kind, text, media_ref, order), so every
transform carries ``spans`` through unchanged.

The point fast path (~90% of docs) is a pure-Catalyst expression (filter +
regexp_extract, whole-stage-codegen, no Python at all).  The generic path
(linestring/polygon centroids + bboxes) is one Arrow-batched pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

_GEO_BBOX_SCHEMA = StructType(
    [
        StructField("cx", DoubleType()),
        StructField("cy", DoubleType()),
        StructField("minx", DoubleType()),
        StructField("miny", DoubleType()),
        StructField("maxx", DoubleType()),
        StructField("maxy", DoubleType()),
    ]
)

_POINT_RX = r"^POINT \(([-+0-9.eE]+) ([-+0-9.eE]+)\)$"


def first_geo_span(spans: Column) -> Column:
    """WKT of the first geo span (docs are guaranteed >=1)."""
    return F.filter(spans, lambda s: s["kind"] == F.lit("geo"))[0]["text"]


def with_geometry(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """docs + (geom_wkt, cx, cy, minx, miny, maxx, maxy); spans untouched.

    Mirrors the reference's adapter encode step: entry -> common index values
    (`AbstractDataAdapter.encode`); geometry envelopes per
    `GeometryUtils.java:45-81`, centroid per JTS getCentroid (used by the
    KDE mapper `GaussianCellMapper.java:106-118`).
    """
    df = docs.withColumn("geom_wkt", first_geo_span(F.col(spans_col)))
    px = F.regexp_extract("geom_wkt", _POINT_RX, 1)
    py = F.regexp_extract("geom_wkt", _POINT_RX, 2)
    is_point = px != F.lit("")

    @F.pandas_udf(_GEO_BBOX_SCHEMA)
    def _generic(wkt: pd.Series) -> pd.DataFrame:
        from geowave_spark.geometry.wkt import geom_bbox, geom_centroid, parse_wkt

        out = np.zeros((len(wkt), 6), dtype=np.float64)
        for i, w in enumerate(wkt):
            if w is None:
                out[i] = np.nan
                continue
            g = parse_wkt(w)
            cx, cy = geom_centroid(g)
            minx, miny, maxx, maxy = geom_bbox(g)
            out[i] = (cx, cy, minx, miny, maxx, maxy)
        return pd.DataFrame(out, columns=[f.name for f in _GEO_BBOX_SCHEMA.fields])

    # Only non-point WKT reaches Python: pass NULL for the fast path so the
    # UDF's per-row parser runs on the ~10% minority.
    g = _generic(F.when(~is_point, F.col("geom_wkt")))
    df = df.withColumn(
        "cx", F.when(is_point, px.cast("double")).otherwise(g["cx"])
    ).withColumn("cy", F.when(is_point, py.cast("double")).otherwise(g["cy"]))
    df = (
        df.withColumn("minx", F.when(is_point, F.col("cx")).otherwise(g["minx"]))
        .withColumn("miny", F.when(is_point, F.col("cy")).otherwise(g["miny"]))
        .withColumn("maxx", F.when(is_point, F.col("cx")).otherwise(g["maxx"]))
        .withColumn("maxy", F.when(is_point, F.col("cy")).otherwise(g["maxy"]))
    )
    return df


def refine_intersects_box_udf(minx: float, miny: float, maxx: float, maxy: float):
    """Arrow-batched exact geometry-vs-box intersects refine for the non-point
    minority (lines/polygons): per-kind dispatch in
    geometry/predicates.geom_intersects_box (SAT for segments and convex
    rings — same formulas as the SQL oracle)."""
    from pyspark.sql.types import BooleanType

    @F.pandas_udf(BooleanType())
    def _refine(wkt: pd.Series) -> pd.Series:
        from geowave_spark.geometry.predicates import geom_intersects_box

        return pd.Series(
            [bool(w is not None and geom_intersects_box(w, minx, miny, maxx, maxy)) for w in wkt]
        )

    return _refine


def span_signature(spans_col: str = "spans") -> Column:
    """Deterministic per-doc signature of (kind, text, media_ref, order):
    the invariant every pipeline must preserve bit-for-bit."""
    return F.sha2(
        F.concat_ws(
            "\x1e",
            F.transform(
                F.col(spans_col),
                lambda s: F.concat_ws(
                    "\x1f", s["kind"], s["text"], s["media_ref"], s["offset"].cast("string")
                ),
            ),
        ),
        256,
    )
