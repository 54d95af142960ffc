"""Global point-pattern statistics: directional distribution (standard
deviational ellipse) and the Clark-Evans average-nearest-neighbor index.

The reference's statistics layer stops at per-field numeric/bbox/histogram
stats (`core/geotime/.../stats/*`, wired in `operators/..` A1-A11); the two
single-number *pattern* descriptors every desktop GIS ships next to them
(ArcGIS "Directional Distribution" and "Average Nearest Neighbor") are the
natural completion for a spatial analytics engine, and both reduce to
shapes that survive 10^12 points:

- **std_ellipse**: one pass of integer-exact moment sums.  Coordinates
  quantize to micro-degrees per row (the track_stats/IDW discipline), the
  five moment sums run as DECIMAL(38,0) (a 10^12-row sum of squares fits
  with ~5 digits to spare); the A-form products n*S_ab cap the exact
  envelope at n ~ 5e10 worst-case rows (every point at |lon| = 180) —
  beyond that Spark's decimal multiply overflows to NULL and DuckDB's
  HUGEINT raises, so a larger corpus should pre-center coordinates (or
  aggregate per region first), centering happens in the exact A-form
  (A_xx = n*Sxx - Sx^2 = n^2 * sum((x - xbar)^2)), and the eigen
  decomposition of the 2x2 scatter matrix is ONE pinned float expression
  over those exact integers — theta = atan2/2 (no division-by-zero
  branch), sigma = sqrt of the eigenvalues.  Nothing shuffles but a 1-row
  agg.

- **clark_evans**: R = mean observed NN distance / expected mean under
  CSR (0.5 / sqrt(density)).  The NN stage IS the engine's bucketed kNN
  join (k=2 self-join, self-pair dropped), so the 100-TB shape is the
  audited ring-expansion candidate join, not a cross join; per-point NN
  distances quantize to micro-degrees (IEEE sqrt is correctly rounded)
  before the order-independent sum.  Neighbors beyond ``max_nn_deg`` are
  excluded from the mean — a documented truncation both engines share
  (the oracle applies the identical bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "std_ellipse",
    "std_ellipse_sql",
    "clark_evans",
    "clark_evans_sql",
]

_M = 1_000_000


def std_ellipse(
    points: DataFrame, lon_col: str = "lon", lat_col: str = "lat"
) -> DataFrame:
    """Standard deviational ellipse (Yuill 1971): returns one row
    (n, mean_x_micro, mean_y_micro, sigma_major_micro, sigma_minor_micro,
    theta_microrad) — mean center, principal-axis standard deviations and
    the major-axis angle from +x in (-pi/2, pi/2], all floor-quantized to
    micro units (micro-degrees / micro-radians).  Exact up to ~5e10 rows
    at worst-case coordinates (see the module docstring's A-form envelope
    note)."""
    xu = F.floor(F.col(lon_col) * _M).cast("decimal(38,0)")
    yu = F.floor(F.col(lat_col) * _M).cast("decimal(38,0)")
    sums = points.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(xu).alias("sx"),
        F.sum(yu).alias("sy"),
        F.sum(xu * xu).alias("sxx"),
        F.sum(yu * yu).alias("syy"),
        F.sum(xu * yu).alias("sxy"),
    )
    # exact centered second moments, scaled by n^2: A_ab = n*S_ab - S_a*S_b
    sums = sums.select(
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("axx"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("ayy"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("axy"),
    )
    axx = F.col("axx").cast("double")
    ayy = F.col("ayy").cast("double")
    axy = F.col("axy").cast("double")
    nd = F.col("n").cast("double")
    disc = F.sqrt((axx - ayy) * (axx - ayy) + 4.0 * axy * axy)
    lam_max = (axx + ayy + disc) / (2.0 * nd * nd)
    lam_min = (axx + ayy - disc) / (2.0 * nd * nd)
    # mean as floor(double/double): Spark's integral DIV truncates toward
    # zero while DuckDB's // floors, so the integer forms disagree on
    # negative sums; floor of an IEEE division is engine-exact instead
    return sums.select(
        F.col("n").cast("long").alias("n"),
        F.floor(F.col("sx").cast("double") / nd).cast("long").alias("mean_x_micro"),
        F.floor(F.col("sy").cast("double") / nd).cast("long").alias("mean_y_micro"),
        F.floor(F.sqrt(lam_max)).cast("long").alias("sigma_major_micro"),
        # lam_min can round to a hair below 0 when the scatter is rank-1
        F.floor(F.sqrt(F.greatest(lam_min, F.lit(0.0)))).cast("long").alias(
            "sigma_minor_micro"
        ),
        F.floor(F.atan2(2.0 * axy, axx - ayy) / 2.0 * _M).cast("long").alias(
            "theta_microrad"
        ),
    )


def std_ellipse_sql(points_table: str, lon_col: str = "lon", lat_col: str = "lat") -> str:
    """DuckDB twin: HUGEINT moment sums (exact like the decimal path),
    the identical A-form centering and pinned eigen expression."""
    return f"""
        WITH q AS (
          SELECT CAST(floor({lon_col} * {_M}) AS HUGEINT) AS xu,
                 CAST(floor({lat_col} * {_M}) AS HUGEINT) AS yu
          FROM {points_table}),
        s AS (
          SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                 SUM(xu) AS sx, SUM(yu) AS sy,
                 SUM(xu * xu) AS sxx, SUM(yu * yu) AS syy,
                 SUM(xu * yu) AS sxy
          FROM q),
        a AS (
          SELECT n, sx, sy,
                 CAST(n * sxx - sx * sx AS DOUBLE) AS axx,
                 CAST(n * syy - sy * sy AS DOUBLE) AS ayy,
                 CAST(n * sxy - sx * sy AS DOUBLE) AS axy,
                 CAST(n AS DOUBLE) AS nd
          FROM s)
        SELECT CAST(n AS BIGINT) AS n,
               CAST(floor(CAST(sx AS DOUBLE) / nd) AS BIGINT) AS mean_x_micro,
               CAST(floor(CAST(sy AS DOUBLE) / nd) AS BIGINT) AS mean_y_micro,
               CAST(floor(sqrt((axx + ayy
                    + sqrt((axx - ayy) * (axx - ayy) + 4.0 * axy * axy))
                    / (2.0 * nd * nd))) AS BIGINT) AS sigma_major_micro,
               CAST(floor(sqrt(GREATEST((axx + ayy
                    - sqrt((axx - ayy) * (axx - ayy) + 4.0 * axy * axy))
                    / (2.0 * nd * nd), 0.0))) AS BIGINT) AS sigma_minor_micro,
               CAST(floor(atan2(2.0 * axy, axx - ayy) / 2.0 * {_M}) AS BIGINT)
                 AS theta_microrad
        FROM a
    """


def clark_evans(
    points: DataFrame,
    max_nn_deg: float,
    id_col: str = "fid",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Clark-Evans R (Clark & Evans 1954): one row
    (n_points, n_with_nn, sum_nnd_micro, r_ppm).  R < 1 clustered,
    R ~ 1 CSR, R -> 2.149 for a perfect hex lattice.  Density uses the
    corpus bounding-box area; points whose nearest neighbor is farther
    than ``max_nn_deg`` are excluded from the observed mean (documented
    truncation, shared with the oracle)."""
    from geowave_spark.operators.knn import knn_join

    if max_nn_deg <= 0:
        raise ValueError("max_nn_deg must be positive")
    queries = points.select(
        F.col(id_col).alias("qid"),
        F.col(lon_col).alias("qlon"),
        F.col(lat_col).alias("qlat"),
    )
    nn = (
        knn_join(
            queries,
            points,
            k=2,
            max_distance_deg=max_nn_deg,
            id_col=id_col,
            lon_col=lon_col,
            lat_col=lat_col,
        )
        .filter(F.col(id_col) != F.col("qid"))
        .groupBy("qid")
        .agg(F.min("dist_sq").alias("d2"))
        .agg(
            F.count("*").alias("n_with_nn"),
            F.sum(F.floor(F.sqrt(F.col("d2")) * _M).cast("long")).alias(
                "sum_nnd_micro"
            ),
        )
    )
    extent = points.agg(
        F.count("*").alias("n_points"),
        F.min(lon_col).alias("x0"),
        F.max(lon_col).alias("x1"),
        F.min(lat_col).alias("y0"),
        F.max(lat_col).alias("y1"),
    )
    nd = F.col("n_points").cast("double")
    area = (F.col("x1") - F.col("x0")) * (F.col("y1") - F.col("y0"))
    # try_divide throughout: a degenerate collinear extent (area 0) or an
    # all-isolate corpus (n_with_nn 0) yields NULL — DuckDB's division by
    # zero returns NULL natively, so the engines agree
    dbar = F.try_divide(
        F.col("sum_nnd_micro").cast("double") / F.lit(float(_M)),
        F.col("n_with_nn").cast("double"),
    )
    return nn.crossJoin(extent).select(
        "n_points",
        "n_with_nn",
        "sum_nnd_micro",
        F.floor(dbar * 2.0 * F.sqrt(F.try_divide(nd, area)) * _M)
        .cast("long")
        .alias("r_ppm"),
    )


def clark_evans_sql(
    points_table: str,
    max_nn_deg: float,
    id_col: str = "fid",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> str:
    """DuckDB twin: brute-force NN under the same distance bound and the
    identical pinned float expression (the Spark side's NN stage is the
    bucketed kNN join — an independent plan)."""
    d = float(max_nn_deg)
    return f"""
        WITH nnd AS (
          SELECT a.{id_col} AS qid,
                 MIN((b.{lon_col} - a.{lon_col}) * (b.{lon_col} - a.{lon_col})
                   + (b.{lat_col} - a.{lat_col}) * (b.{lat_col} - a.{lat_col}))
                   AS d2
          FROM {points_table} a JOIN {points_table} b
            ON b.{id_col} <> a.{id_col}
           -- bbox bounds are implied by the distance bound; they let the
           -- planner run a range (IE) join instead of a full cross product
           AND b.{lon_col} BETWEEN a.{lon_col} - {d!r} AND a.{lon_col} + {d!r}
           AND b.{lat_col} BETWEEN a.{lat_col} - {d!r} AND a.{lat_col} + {d!r}
           AND (b.{lon_col} - a.{lon_col}) * (b.{lon_col} - a.{lon_col})
             + (b.{lat_col} - a.{lat_col}) * (b.{lat_col} - a.{lat_col})
             <= {d!r} * {d!r}
          GROUP BY a.{id_col}),
        agg AS (
          SELECT COUNT(*) AS n_with_nn,
                 SUM(CAST(floor(sqrt(d2) * {_M}) AS BIGINT)) AS sum_nnd_micro
          FROM nnd),
        ext AS (
          SELECT COUNT(*) AS n_points,
                 MIN({lon_col}) AS x0, MAX({lon_col}) AS x1,
                 MIN({lat_col}) AS y0, MAX({lat_col}) AS y1
          FROM {points_table})
        SELECT n_points, n_with_nn, sum_nnd_micro,
               CAST(floor(CAST(sum_nnd_micro AS DOUBLE) / {_M}.0
                          / CAST(n_with_nn AS DOUBLE)
                          * 2.0
                          * sqrt(CAST(n_points AS DOUBLE)
                                 / ((x1 - x0) * (y1 - y0)))
                          * {_M}) AS BIGINT) AS r_ppm
        FROM agg CROSS JOIN ext
    """
