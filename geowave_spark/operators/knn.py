"""Distance-bounded kNN join (J2) + broadcast centroid kNN (J3).

Mirrors the reference's NN pipeline: the partitioner inflates each query
point's bbox by the search distance and emits primary + expansion cells
(`AbstractPartitioner.java:78-127`; grid resolution chosen from the distance,
`:241-280` — bits such that cell size >= 2d), pairs are compared within cells
(`NNMapReduce.java:119-291`), and neighbor lists are distance-bounded top-k
(`NNProcessor.java`, `AnalyticRecipes.addToTopN`).  As in the reference, kNN
is distance-bounded: d is fixed a priori; the k-th neighbor beyond d is not
returned (SURVEY.md J2).

Spark shape: the small query side explodes to expansion cells at the
distance-derived tier and is broadcast; the big point side derives its
ancestor cell with a bit shift (never exploded, never re-encoded).  Exact
distances + per-query top-k via a window.  Deterministic tie-break on
(distance, fid) so results are reproducible and oracle-comparable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window

from geowave_spark.sfc import DEFAULT_CONFIG, SpatialConfig, cells_covering_bbox

from .indexing import cell_at_tier, with_point_cells


def tier_for_distance(distance_deg: float, cfg: SpatialConfig = DEFAULT_CONFIG) -> int:
    """Finest defined tier whose cell size >= 2*distance (the reference's
    partitioner grid rule, AbstractPartitioner.java:241-280: bits =
    log2(range / (2d)))."""
    bits = int(np.floor(np.log2(360.0 / max(2.0 * distance_deg, 1e-12))))
    usable = [t for t in cfg.tiers if 0 < t <= bits]
    return max(usable) if usable else min(t for t in cfg.tiers if t > 0)


def expansion_cells_udf(distance_deg: float, bits: int, cfg: SpatialConfig = DEFAULT_CONFIG):
    """pandas UDF: query point -> primary + ring expansion cells (its bbox
    inflated by the search distance, covered at the distance tier)."""

    @F.pandas_udf(ArrayType(LongType()))
    def _cells(lon: pd.Series, lat: pd.Series) -> pd.Series:
        out = []
        for x, y in zip(lon.to_numpy(np.float64), lat.to_numpy(np.float64)):
            cells = cells_covering_bbox(
                x - distance_deg, y - distance_deg, x + distance_deg, y + distance_deg, bits, cfg
            )
            out.append(cells.tolist())
        return pd.Series(out)

    return _cells


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    max_distance_deg: float,
    *,
    query_id_col: str = "qid",
    query_lon_col: str = "qlon",
    query_lat_col: str = "qlat",
    id_col: str = "fid",
    lon_col: str = "lon",
    lat_col: str = "lat",
    cfg: SpatialConfig = DEFAULT_CONFIG,
    point_cell_col: str | None = None,
) -> DataFrame:
    """For each query point: its k nearest data points within max_distance.

    Output: (qid, fid, dist_sq, rank) — dist_sq is the exact squared planar
    degree distance (identical IEEE ops to the SQL oracle), rank 1..k ordered
    by (dist_sq, fid).
    """
    bits = tier_for_distance(max_distance_deg, cfg)
    q = queries.withColumn(
        "_qcell",
        F.explode(
            expansion_cells_udf(max_distance_deg, bits, cfg)(
                F.col(query_lon_col), F.col(query_lat_col)
            )
        ),
    )
    if point_cell_col is None:
        points = with_point_cells(points, lon_col, lat_col, cfg, cell_col="_pcell").drop("tier")
        point_cell_col = "_pcell"
    probe = points.withColumn("_jcell", cell_at_tier(F.col(point_cell_col), cfg.finest, bits))

    dx = F.col(lon_col) - F.col(query_lon_col)
    dy = F.col(lat_col) - F.col(query_lat_col)
    joined = (
        probe.join(F.broadcast(q), probe["_jcell"] == q["_qcell"], "inner")
        .withColumn("dist_sq", dx * dx + dy * dy)
        .filter(F.col("dist_sq") <= max_distance_deg * max_distance_deg)
    )
    w = Window.partitionBy(query_id_col).orderBy("dist_sq", id_col)
    out = (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "dist_sq", "rank")
    )
    return out


def knn_join_brute(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    max_distance_deg: float,
    **kw,
) -> DataFrame:
    """J3 pattern: broadcast nested-loop (crossJoin) + window top-k — the
    reference's AnalyticRecipes.findClosest/aggregateByKey(topN) shape.
    Used as the per-cell baseline and for verifying the pruned variant."""
    query_id_col = kw.get("query_id_col", "qid")
    qlon = kw.get("query_lon_col", "qlon")
    qlat = kw.get("query_lat_col", "qlat")
    id_col = kw.get("id_col", "fid")
    lon_col = kw.get("lon_col", "lon")
    lat_col = kw.get("lat_col", "lat")
    dx = F.col(lon_col) - F.col(qlon)
    dy = F.col(lat_col) - F.col(qlat)
    joined = (
        points.crossJoin(F.broadcast(queries))
        .withColumn("dist_sq", dx * dx + dy * dy)
        .filter(F.col("dist_sq") <= max_distance_deg * max_distance_deg)
    )
    w = Window.partitionBy(query_id_col).orderBy("dist_sq", id_col)
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "dist_sq", "rank")
    )
