"""Seasonal comparison KDE (R8) — two interleaved KDE pyramids + combined
percentile, the reference's `analytics/mapreduce/.../kde/compare/*` pipeline
re-expressed as one declarative DataFrame plan.

Semantics (`ComparisonGaussianCellMapper.java:58-178`):

- each timestamped point contributes to a SUMMER or WINTER density store with
  a seasonal weight in [0, 1]:
  months May-Aug -> summer, weight 1;
  April / September -> summer, transitional Gaussian ``exp(-t^2)`` where t
  ramps 3 -> 0 across April (0 -> 3 across September), so April 30 / Sept 1
  count fully and the far edges approach 0;
  Jan-Mar -> winter, t ramps 0 -> 3 from Dec 31 to Mar 31 (fades out);
  Oct-Dec -> winter, t ramps 3 -> 0 toward Dec 31 (fades in).
  Month boundaries use the reference's lenient-Calendar day-0 convention
  (``Calendar.set(y, m, 0)`` = last day of month m-1), midnight UTC.
- per (level, cell, season): Gaussian-splat sums, then percentile = rank /
  season cell count within the level (`ComparisonCellDataReducer.java:20-37`,
  ties share the group-start rank — RANK() semantics).  The reference
  multiplexes seasons through negative cell ids
  (`NegativeCellIdCounter`/`ComparisonCombiningStatsMapper.java:21-27`); a
  season column is the DataFrame-native equivalent.
- per (level, cell): combined = summer_percentile - winter_percentile
  (`ComparisonCellData.java:84-90`, missing season reads 0 per
  `ComparisonCombiningStatsReducer.java:40-52`), then combined_percentile =
  rank of combined / level cell count
  (`ComparisonAccumuloStatsReducer.java:60-75` — the four output bands are
  summer, winter, combined, combined-percentile).

Exactness contract: the seasonal weight is quantized to integer parts-per-
million (``round(exp(-t^2) * 1e6)``) so per-cell sums are exact integers in
any accumulation order — the same trick the base KDE plays with its x1000
kernel taps.  One splat contributes at most kernel_max^2 * 1e6 ~ 1.5e11, so
bigint sums hold ~6e7 max-weight contributions per (cell, season); beyond
that cast the sum to decimal(38,0).

Scale: the per-(level, season) and per-level rank windows carry the same
single-partition-per-group concern as the base KDE's exact path;
``percentile_mode='auto'`` switches to the percentile_approx sketch on the
same occupied-cell bound (see :func:`geowave_spark.operators.kde.kde_pyramid`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from geowave_spark.operators.kde import (
    KERNEL_X1000,
    MAX_EXACT_CELLS,
    MAX_OFFSET,
    _offsets_df,
    with_tile_columns,
)

WEIGHT_PPM = 1_000_000


def _ep_us(date_col: Column) -> Column:
    """Microseconds since epoch of a date at midnight (UTC session tz)."""
    return F.unix_micros(date_col.cast("timestamp"))


def seasonal_weight_cols(ts: Column) -> tuple[Column, Column]:
    """(season, weight_ppm) for one timestamp — the month rules of
    `ComparisonGaussianCellMapper.incrementLevelStore` with the contribution
    quantized to integer ppm (see module docstring)."""
    # parquet timestamps load as TIMESTAMP_NTZ; with the session tz pinned to
    # UTC the cast to TIMESTAMP is wall-clock identity and unix_micros applies
    ts = ts.cast("timestamp")
    m, y = F.month(ts), F.year(ts)
    eu = F.unix_micros(ts)
    dec31_prev = _ep_us(F.make_date(y - 1, F.lit(12), F.lit(31)))  # (y, 0, 0)
    mar31 = _ep_us(F.make_date(y, F.lit(3), F.lit(31)))  # (y, 3, 0)
    apr30 = _ep_us(F.make_date(y, F.lit(4), F.lit(30)))  # (y, 4, 0)
    aug31 = _ep_us(F.make_date(y, F.lit(8), F.lit(31)))  # (y, 8, 0)
    sep30 = _ep_us(F.make_date(y, F.lit(9), F.lit(30)))  # (y, 9, 0)
    dec31 = _ep_us(F.make_date(y, F.lit(12), F.lit(31)))  # (y+1, 0, 0)
    t = (
        F.when(m <= 3, (eu - dec31_prev) * 3.0 / (mar31 - dec31_prev))
        .when(m >= 10, (dec31 - eu) * 3.0 / (dec31 - sep30))
        .when(m == 4, (apr30 - eu) * 3.0 / (apr30 - mar31))
        .when(m == 9, (eu - aug31) * 3.0 / (sep30 - aug31))
        .otherwise(F.lit(0.0))
    )
    weight_ppm = (
        F.when((m >= 5) & (m <= 8), F.lit(WEIGHT_PPM).cast("long"))
        .otherwise(F.round(F.exp(-t * t) * WEIGHT_PPM).cast("long"))
    )
    season = F.when((m >= 4) & (m <= 9), F.lit("summer")).otherwise(F.lit("winter"))
    return season, weight_ppm


def _year_bounds_df(points: DataFrame, ts_col: str) -> DataFrame:
    """Tiny per-year table of the six ramp boundaries (microseconds since
    epoch).  The boundary dates depend only on the year, so computing them
    once per distinct year and broadcast-joining keeps the giant
    make_date/unix_micros expression tree OUT of the 49x-exploded splat
    stage — inlined per-row it blows the generated code past the JIT method
    limit and the whole fused stage drops to interpreted execution (measured
    ~7x slowdown on the full bench query at sf0.1)."""
    y = F.col("_y")
    return (
        points.select(F.year(F.col(ts_col).cast("timestamp")).alias("_y"))
        .distinct()
        .select(
            "_y",
            _ep_us(F.make_date(y - 1, F.lit(12), F.lit(31))).alias("_dec31_prev"),
            _ep_us(F.make_date(y, F.lit(3), F.lit(31))).alias("_mar31"),
            _ep_us(F.make_date(y, F.lit(4), F.lit(30))).alias("_apr30"),
            _ep_us(F.make_date(y, F.lit(8), F.lit(31))).alias("_aug31"),
            _ep_us(F.make_date(y, F.lit(9), F.lit(30))).alias("_sep30"),
            _ep_us(F.make_date(y, F.lit(12), F.lit(31))).alias("_dec31"),
        )
    )


def _splat_cells_seasonal(
    points: DataFrame,
    min_level: int,
    max_level: int,
    tile_size: int,
    lon_col: str,
    lat_col: str,
    ts_col: str,
) -> DataFrame:
    """Gaussian splat with per-point seasonal weights: identical binning to
    the base KDE's `_splat_cells`, grouped by (level, cell, season) with
    exact integer sums of kernel_weight x weight_ppm.

    The returned ``season`` column is an INT (1 = summer, 0 = winter): a
    string group key in the 49x-exploded aggregation is measurably slower,
    and nothing downstream needs the name until after the per-cell pivot.
    The weight arithmetic is bit-identical to :func:`seasonal_weight_cols`
    (same ops, same order, same int64 inputs) — only the boundary-date
    subtrees move into the broadcast year table (see :func:`_year_bounds_df`).
    """
    spark = points.sparkSession
    levels = spark.createDataFrame(
        [(lv,) for lv in range(min_level, max_level + 1)], "level int"
    )
    offsets = _offsets_df(spark)

    ts = F.col(ts_col).cast("timestamp")
    m, eu = F.col("_m"), F.col("_eu")
    t = (
        F.when(m <= 3, (eu - F.col("_dec31_prev")) * 3.0 / (F.col("_mar31") - F.col("_dec31_prev")))
        .when(m >= 10, (F.col("_dec31") - eu) * 3.0 / (F.col("_dec31") - F.col("_sep30")))
        .when(m == 4, (F.col("_apr30") - eu) * 3.0 / (F.col("_apr30") - F.col("_mar31")))
        .when(m == 9, (eu - F.col("_aug31")) * 3.0 / (F.col("_sep30") - F.col("_aug31")))
        .otherwise(F.lit(0.0))
    )
    wppm = (
        F.when((m >= 5) & (m <= 8), F.lit(WEIGHT_PPM).cast("long"))
        .otherwise(F.round(F.exp(-t * t) * WEIGHT_PPM).cast("long"))
    )
    season = F.when((m >= 4) & (m <= 9), F.lit(1)).otherwise(F.lit(0))
    # The trailing repartition() is a deliberate evaluation barrier, not a
    # balance tweak: whole-stage codegen defers non-join-condition
    # expressions into the innermost broadcast-join loop, so without it the
    # weight arithmetic runs once per (point x level x tap) — 147x per point
    # — instead of once per point (measured 19s -> 2.5s on the sf0.1 splat).
    # The shuffle moves only the 4-column skinny projection (~30 B/row), one
    # narrow pass that also spreads the 49x splat across the cluster — the
    # right trade at any scale.
    weighted = (
        points.select(
            lon_col,
            lat_col,
            F.year(ts).alias("_y"),
            F.month(ts).alias("_m"),
            F.unix_micros(ts).alias("_eu"),
        )
        .join(F.broadcast(_year_bounds_df(points, ts_col)), "_y")
        .select(lon_col, lat_col, season.alias("season"), wppm.alias("_wppm"))
        .repartition(
            int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        )
    )

    num_x_posts = F.expr(f"shiftleft(2L, level) * {tile_size}")
    num_y_posts = F.expr(f"shiftleft(1L, level) * {tile_size}")
    splat = (
        weighted
        .crossJoin(F.broadcast(levels))
        .withColumn("nx", num_x_posts)
        .withColumn("ny", num_y_posts)
        .withColumn("xbin", F.floor((F.col(lon_col) + 180.0) / 360.0 * F.col("nx")))
        .withColumn("ybin", F.floor((F.col(lat_col) + 90.0) / 180.0 * F.col("ny")))
        .crossJoin(F.broadcast(offsets))
        .withColumn("x", F.col("xbin") + F.col("dx"))
        .withColumn("y", F.col("ybin") + F.col("dy"))
        .filter(
            (F.col("x") >= 0)
            & (F.col("x") < F.col("nx"))
            & (F.col("y") >= 0)
            & (F.col("y") < F.col("ny"))
        )
        .withColumn("cell_id", F.col("x") * F.col("ny") + F.col("y"))
        .withColumn("cw", F.col("w") * F.col("_wppm"))
    )
    return splat.groupBy("level", "cell_id", "season").agg(
        F.sum("cw").alias("weight_scaled")
    )


def _exact_pct(df: DataFrame, part_cols: list[str], val_col: str, out_col: str) -> DataFrame:
    """rank/count percentile per partition — ties share the group-start rank,
    the reference reducers' currentKey convention."""
    rank_w = Window.partitionBy(*part_cols).orderBy(val_col)
    tot_w = Window.partitionBy(*part_cols)
    return df.withColumn(out_col, F.rank().over(rank_w) / F.count("*").over(tot_w))


def _sketch_pct(
    df: DataFrame, part_cols: list[str], val_col: str, out_col: str, buckets: int
) -> DataFrame:
    """Scale path: per-partition quantile sketch broadcast back — no window,
    error <= 1/buckets + sketch error (same trade as the base KDE)."""
    probs = [i / buckets for i in range(1, buckets + 1)]
    stats = df.groupBy(*part_cols).agg(
        F.percentile_approx(
            val_col, F.array(*[F.lit(p) for p in probs]), F.lit(100_000)
        ).alias("_qs")
    )
    return (
        df.join(F.broadcast(stats), part_cols)
        .withColumn(
            out_col,
            F.size(F.filter(F.col("_qs"), lambda q: q <= F.col(val_col)))
            / F.lit(float(buckets)),
        )
        .drop("_qs")
    )


def kde_comparison(
    points: DataFrame,
    min_level: int = 1,
    max_level: int = 25,
    tile_size: int = 1,
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "event_ts",
    percentile_mode: str = "auto",  # 'auto' | 'exact' | 'approx'
    max_exact_cells: int = MAX_EXACT_CELLS,
    quantile_buckets: int = 1000,
) -> DataFrame:
    """Timestamped points -> per-(level, cell) seasonal comparison bands.

    Output columns: level, cell_id, summer_percentile, winter_percentile,
    combined (= summer - winter), combined_percentile, + tile assignment
    columns (tile_x, tile_y, px, py, tile_west, tile_south).
    """
    cells = _splat_cells_seasonal(
        points, min_level, max_level, tile_size, lon_col, lat_col, ts_col
    )
    if percentile_mode == "auto":
        grid_bound = 2 ** (2 * max_level + 1) * tile_size * tile_size
        if grid_bound > max_exact_cells:
            splat_bound = points.count() * len(KERNEL_X1000) ** 2
            exact = min(grid_bound, splat_bound) <= max_exact_cells
        else:
            exact = True
    elif percentile_mode in ("exact", "approx"):
        exact = percentile_mode == "exact"
    else:
        raise ValueError(
            f"percentile_mode must be 'auto', 'exact' or 'approx', got {percentile_mode!r}"
        )

    if exact:
        seasoned = _exact_pct(cells, ["level", "season"], "weight_scaled", "_pct")
    else:
        seasoned = _sketch_pct(
            cells, ["level", "season"], "weight_scaled", "_pct", quantile_buckets
        )
    per_cell = (
        seasoned.groupBy("level", "cell_id")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("season") == 1, F.col("_pct"))), F.lit(0.0)
            ).alias("summer_percentile"),
            F.coalesce(
                F.max(F.when(F.col("season") == 0, F.col("_pct"))), F.lit(0.0)
            ).alias("winter_percentile"),
        )
        .withColumn("combined", F.col("summer_percentile") - F.col("winter_percentile"))
    )
    if exact:
        banded = _exact_pct(per_cell, ["level"], "combined", "combined_percentile")
    else:
        banded = _sketch_pct(
            per_cell, ["level"], "combined", "combined_percentile", quantile_buckets
        )
    return with_tile_columns(banded, tile_size)


def kde_comparison_oracle_sql(
    points_path: str,
    min_level: int,
    max_level: int,
    tile_size: int,
    ts_col: str = "event_ts",
) -> str:
    """DuckDB SQL computing the identical comparison pyramid (independent
    executor, same integer-ppm quantization)."""
    kern = ", ".join(
        f"({dx}, {dy}, {KERNEL_X1000[dx + MAX_OFFSET] * KERNEL_X1000[dy + MAX_OFFSET]})"
        for dx in range(-MAX_OFFSET, MAX_OFFSET + 1)
        for dy in range(-MAX_OFFSET, MAX_OFFSET + 1)
    )
    levels = ", ".join(f"({lv})" for lv in range(min_level, max_level + 1))
    return f"""
        WITH offsets(dx, dy, w) AS (VALUES {kern}),
        levels(level) AS (VALUES {levels}),
        ts0 AS (
          SELECT lon, lat, month({ts_col}) AS m, epoch_us({ts_col}) AS eu,
                 epoch_us(make_date(year({ts_col}) - 1, 12, 31)::TIMESTAMP) AS dec31_prev,
                 epoch_us(make_date(year({ts_col}), 3, 31)::TIMESTAMP) AS mar31,
                 epoch_us(make_date(year({ts_col}), 4, 30)::TIMESTAMP) AS apr30,
                 epoch_us(make_date(year({ts_col}), 8, 31)::TIMESTAMP) AS aug31,
                 epoch_us(make_date(year({ts_col}), 9, 30)::TIMESTAMP) AS sep30,
                 epoch_us(make_date(year({ts_col}), 12, 31)::TIMESTAMP) AS dec31
          FROM '{points_path}'),
        ts1 AS (
          SELECT lon, lat, m,
                 CASE WHEN m <= 3 THEN (eu - dec31_prev) * 3.0 / (mar31 - dec31_prev)
                      WHEN m >= 10 THEN (dec31 - eu) * 3.0 / (dec31 - sep30)
                      WHEN m = 4 THEN (apr30 - eu) * 3.0 / (apr30 - mar31)
                      WHEN m = 9 THEN (eu - aug31) * 3.0 / (sep30 - aug31)
                      ELSE 0.0 END AS t
          FROM ts0),
        pts AS (
          SELECT lon, lat,
                 CASE WHEN m BETWEEN 4 AND 9 THEN 'summer' ELSE 'winter' END AS season,
                 CASE WHEN m BETWEEN 5 AND 8 THEN {WEIGHT_PPM}
                      ELSE CAST(ROUND(EXP(-(t * t)) * {WEIGHT_PPM}) AS BIGINT) END AS wppm
          FROM ts1),
        splat AS (
          SELECT l.level, p.season,
                 (FLOOR((p.lon + 180.0) / 360.0 * ((1 << (l.level + 1)) * {tile_size})) + o.dx) AS x,
                 (FLOOR((p.lat + 90.0) / 180.0 * ((1 << l.level) * {tile_size})) + o.dy) AS y,
                 ((1 << (l.level + 1)) * {tile_size}) AS nx,
                 ((1 << l.level) * {tile_size}) AS ny,
                 o.w * p.wppm AS cw
          FROM pts p, levels l, offsets o),
        cells AS (
          SELECT level, season, CAST(x * ny + y AS BIGINT) AS cell_id,
                 CAST(SUM(cw) AS BIGINT) AS weight_scaled, MAX(ny) AS ny
          FROM splat WHERE x >= 0 AND x < nx AND y >= 0 AND y < ny
          GROUP BY level, season, x * ny + y),
        spct AS (
          SELECT *, RANK() OVER (PARTITION BY level, season ORDER BY weight_scaled)
                    / COUNT(*) OVER (PARTITION BY level, season) AS pct
          FROM cells),
        percell AS (
          SELECT level, cell_id, MAX(ny) AS ny,
                 COALESCE(MAX(CASE WHEN season = 'summer' THEN pct END), 0.0) AS summer_percentile,
                 COALESCE(MAX(CASE WHEN season = 'winter' THEN pct END), 0.0) AS winter_percentile
          FROM spct GROUP BY level, cell_id),
        comb AS (
          SELECT *, summer_percentile - winter_percentile AS combined FROM percell),
        final AS (
          SELECT *, RANK() OVER (PARTITION BY level ORDER BY combined)
                    / COUNT(*) OVER (PARTITION BY level) AS combined_percentile
          FROM comb)
        SELECT level, cell_id, summer_percentile, winter_percentile, combined,
               combined_percentile,
               CAST((cell_id // ny) // {tile_size} AS BIGINT) AS tile_x,
               CAST((cell_id % ny) // {tile_size} AS BIGINT) AS tile_y,
               CAST((cell_id // ny) % {tile_size} AS INT) AS px,
               CAST({tile_size} - 1 - ((cell_id % ny) % {tile_size}) AS INT) AS py,
               (CAST((cell_id // ny) // {tile_size} AS BIGINT) * 360.0) / (1 << (level + 1)) - 180.0 AS tile_west,
               (CAST((cell_id % ny) // {tile_size} AS BIGINT) * 180.0) / (1 << level) - 90.0 AS tile_south
        FROM final
    """
