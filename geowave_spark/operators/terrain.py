"""Terrain derivatives over a gridded surface: Horn slope / aspect /
hillshade.

The classic raster-analytics triple (Horn, "Hill shading and the
reflectance map", Proc. IEEE 1981 — the ESRI/GDAL default): from a value
grid z(col, row), the 3x3 weighted finite differences

    p = dz/dx = ((z[+1,-1] + 2 z[+1,0] + z[+1,+1])
               - (z[-1,-1] + 2 z[-1,0] + z[-1,+1])) / (8 * cell)
    q = dz/dy = ((z[-1,+1] + 2 z[0,+1] + z[+1,+1])
               - (z[-1,-1] + 2 z[0,-1] + z[+1,-1])) / (8 * cell)

give slope = atan(sqrt(p^2 + q^2)), aspect = atan2(q, -p), and the
Lambertian hillshade cos(zen) cos(slope) + sin(zen) sin(slope)
cos(azimuth - aspect).  The reference's raster analytics stop at KDE /
tile resampling (`analytics/mapreduce/.../kde/`,
`adapter/raster/.../RasterTileResizeSpark*`); slope/aspect is the obvious
next operator a raster user expects, applied here to the same
density-surface grid the hotspot family uses (`operators/hotspot.py
cell_counts`) — any z-valued cell grid works.

Spark-first shape (survives a 10^12-cell grid): the 3x3 stencil is a
SCATTER, not a gather — each source cell explodes to the <= 8 neighbor
targets it contributes to, with its (wx, wy) Horn weights attached, and
one groupBy(target) sums the two weighted differences.  One corpus-scan,
one shuffle on uniform cell keys, no windows, no Python.  Missing
neighbors contribute 0 — the natural zero-padding for a count surface.

Cross-engine determinism: the weighted sums are exact integers (counts x
{+-1, +-2}); p and q are single IEEE divisions; the final trig tree is
quantized floor(val * 1e6) per the repo convention (last-ulp libm variance
flips ~1e-9 of rows).  Flat cells (p = q = 0) emit NULL aspect — never
atan2(+-0, +-0), whose signed-zero branch cuts differ between engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["horn_terrain", "horn_terrain_sql"]

_Q = 1_000_000

# Horn weight tables: offset (dx, dy) -> weight in the p (x-difference) and
# q (y-difference) sums.  Corners carry both.
_P_W = {(1, -1): 1, (1, 0): 2, (1, 1): 1, (-1, -1): -1, (-1, 0): -2, (-1, 1): -1}
_Q_W = {(-1, 1): 1, (0, 1): 2, (1, 1): 1, (-1, -1): -1, (0, -1): -2, (1, -1): -1}


def horn_terrain(
    grid: DataFrame,
    cell: float = 1.0,
    sun_azimuth_deg: float = 315.0,
    sun_altitude_deg: float = 45.0,
    x_col: str = "xb",
    y_col: str = "yb",
    z_col: str = "x",
) -> DataFrame:
    """Per grid cell: (xb, yb, z, slope_ppm, aspect_ppm, hillshade_ppm).

    ``grid`` is any (x index, y index, value) cell table; slope is in
    radians-ppm over the index-space cell size, aspect in radians-ppm
    counterclockwise from +x with NULL for flat cells, hillshade the
    Lambertian reflectance in [0, 1]-ppm (clamped at 0)."""
    if cell <= 0:
        raise ValueError("cell must be positive")
    g = grid.select(
        F.col(x_col).cast("long").alias("_cx"),
        F.col(y_col).cast("long").alias("_cy"),
        F.col(z_col).cast("long").alias("_z"),
    )
    offsets = sorted(set(_P_W) | set(_Q_W))
    scatter = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(_P_W.get((dx, dy), 0)).alias("wx"),
                F.lit(_Q_W.get((dx, dy), 0)).alias("wy"),
            )
            for dx, dy in offsets
        ]
    )
    # scatter: a source at offset d from its target is the target's (-d)
    # stencil tap; _P_W/_Q_W are antisymmetric under d -> -d, so negating
    # the source-indexed weights re-indexes the table correctly
    contrib = (
        g.withColumn("_o", F.explode(scatter))
        .select(
            (F.col("_cx") + F.col("_o.dx")).alias("_tx"),
            (F.col("_cy") + F.col("_o.dy")).alias("_ty"),
            (-F.col("_z") * F.col("_o.wx")).alias("_px"),
            (-F.col("_z") * F.col("_o.wy")).alias("_qy"),
        )
    )
    sums = contrib.groupBy("_tx", "_ty").agg(
        F.sum("_px").alias("_sp"), F.sum("_qy").alias("_sq")
    )
    # emit only occupied cells (inner join back to the grid)
    joined = g.join(
        sums,
        (g["_cx"] == sums["_tx"]) & (g["_cy"] == sums["_ty"]),
        "left",
    ).select(
        "_cx",
        "_cy",
        "_z",
        F.coalesce("_sp", F.lit(0)).alias("_sp"),
        F.coalesce("_sq", F.lit(0)).alias("_sq"),
    )
    denom = 8.0 * float(cell)
    p = F.col("_sp").cast("double") / F.lit(denom)
    q = F.col("_sq").cast("double") / F.lit(denom)
    slope = F.atan(F.sqrt(p * p + q * q))
    zen = math.radians(90.0 - float(sun_altitude_deg))
    az = math.radians(float(sun_azimuth_deg))
    shade = F.lit(math.cos(zen)) * F.cos(slope) + F.lit(math.sin(zen)) * F.sin(
        slope
    ) * F.cos(F.lit(az) - F.atan2(q, -p))
    flat = (F.col("_sp") == 0) & (F.col("_sq") == 0)
    return joined.select(
        F.col("_cx").alias("xb"),
        F.col("_cy").alias("yb"),
        F.col("_z").alias("z"),
        F.floor(slope * F.lit(_Q)).cast("long").alias("slope_ppm"),
        F.when(flat, F.lit(None).cast("long"))
        .otherwise(F.floor(F.atan2(q, -p) * F.lit(_Q)).cast("long"))
        .alias("aspect_ppm"),
        F.when(flat, F.floor(F.lit(math.cos(zen) * _Q)).cast("long"))
        .otherwise(
            F.floor(F.greatest(shade, F.lit(0.0)) * F.lit(_Q)).cast("long")
        )
        .alias("hillshade_ppm"),
    )


def horn_terrain_sql(
    points_path: str,
    cell_deg: float = 1.0,
    sun_azimuth_deg: float = 315.0,
    sun_altitude_deg: float = 45.0,
) -> str:
    """DuckDB twin over the same point-density grid: an independent GATHER
    formulation — each cell LEFT JOINs its 8 neighbors by key and the Horn
    sums are written tap-by-tap — against the engine's scatter shape."""
    zen = math.radians(90.0 - float(sun_altitude_deg))
    az = math.radians(float(sun_azimuth_deg))
    denom = 8.0 * float(cell_deg)
    # DuckDB parses bare float literals as DECIMAL and overflows them when
    # multiplied by the ppm grid — force DOUBLE
    cz = f"CAST({math.cos(zen)!r} AS DOUBLE)"
    sz = f"CAST({math.sin(zen)!r} AS DOUBLE)"
    azl = f"CAST({az!r} AS DOUBLE)"

    def tap(dx: int, dy: int) -> str:
        return (
            f"COALESCE((SELECT x FROM g n WHERE n.xb = g0.xb + {dx} "
            f"AND n.yb = g0.yb + {dy}), 0)"
        )

    p_terms = " + ".join(f"{w} * {tap(dx, dy)}" for (dx, dy), w in sorted(_P_W.items()))
    q_terms = " + ".join(f"{w} * {tap(dx, dy)}" for (dx, dy), w in sorted(_Q_W.items()))
    return f"""
        WITH g AS (
          SELECT CAST(floor(lon / {float(cell_deg)!r}) AS BIGINT) AS xb,
                 CAST(floor(lat / {float(cell_deg)!r}) AS BIGINT) AS yb,
                 CAST(count(*) AS BIGINT) AS x
          FROM '{points_path}' GROUP BY 1, 2),
        d AS (
          SELECT g0.xb, g0.yb, g0.x AS z,
                 CAST({p_terms} AS BIGINT) AS sp,
                 CAST({q_terms} AS BIGINT) AS sq
          FROM g g0),
        t AS (
          SELECT xb, yb, z, sp, sq,
                 CAST(sp AS DOUBLE) / {denom!r} AS p,
                 CAST(sq AS DOUBLE) / {denom!r} AS q
          FROM d)
        SELECT xb, yb, z,
               CAST(FLOOR(atan(sqrt(p * p + q * q)) * {_Q}) AS BIGINT) AS slope_ppm,
               CASE WHEN sp = 0 AND sq = 0 THEN NULL
                    ELSE CAST(FLOOR(atan2(q, -p) * {_Q}) AS BIGINT)
               END AS aspect_ppm,
               CASE WHEN sp = 0 AND sq = 0
                    THEN CAST(FLOOR({cz} * {_Q}) AS BIGINT)
                    ELSE CAST(FLOOR(GREATEST(
                      {cz} * cos(atan(sqrt(p * p + q * q)))
                      + {sz} * sin(atan(sqrt(p * p + q * q)))
                        * cos({azl} - atan2(q, -p)), CAST(0.0 AS DOUBLE)) * {_Q})
                      AS BIGINT)
               END AS hillshade_ppm
        FROM t
    """
