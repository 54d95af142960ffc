"""Distance functions (§2.7): Euclidean (degree-space) and great-circle.

The reference's distance family (`analytics/api/.../distance/
CoordinateEuclideanDistanceFn.java`, `CoordinateCircleDistanceFn.java`,
`FeatureCentroidOrthodromicDistanceFn.java`) reduced to pure Catalyst
column expressions — JVM trig inside whole-stage codegen, no UDFs.  The
orthodromic (ellipsoidal geodesy) variant is approximated by spherical
haversine; for kNN/threshold semantics the ranking is identical at the
distances the partitioner handles (its geodesic use is bbox inflation,
`OrthodromicDistancePartitioner.java:96-140`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0087714  # IUGG mean radius
# km per degree of a great circle (2*pi*R/360 = 111.195) rounded DOWN — the
# partitioner's bbox-inflation scale: dividing km by a smaller constant
# yields slightly larger degree radii, so candidate balls are supersets
KM_PER_DEG = 111.19


def euclidean_deg_sq(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    dx = lon1 - lon2
    dy = lat1 - lat2
    return dx * dx + dy * dy


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance, spherical haversine (stable for small angles)."""
    rlat1 = F.radians(lat1)
    rlat2 = F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) * F.sin(dlat) + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_km_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """DuckDB twin (same formula, same operand order)."""
    return (
        f"2.0 * {EARTH_RADIUS_KM} * asin(sqrt("
        f"sin(radians({lat2} - {lat1}) / 2) * sin(radians({lat2} - {lat1}) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians({lon2} - {lon1}) / 2) * sin(radians({lon2} - {lon1}) / 2)))"
    )
