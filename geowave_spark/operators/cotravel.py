"""Co-traveler detection: entity pairs repeatedly co-located in space+time.

The classic "companion" / "travelling together" analytic over movement
data: two entities co-travel when their pings fall within ``radius_deg``
AND ``tau_s`` of each other, repeatedly.  The reference indexes tracks for
spatial-temporal range scans (`core/geotime/.../SpatialTemporalQuery.java`)
but has no pairwise movement analytic; this is the beyond-reference
movement-family capstone the round brief calls for, built as a bucketed
spatio-temporal self-join — the same candidate-then-refine discipline as
`operators/spatial_join.py` and `operators/media_dedup.py`.

Plan shape (one shuffle, no DISTINCT, nothing quadratic):

- pings: LINESTRING vertex explode (`trajectory.track_vertices`) + an
  exact-integer per-vertex timestamp (microseconds, floor-interpolated
  between the track's start/end — BIGINT arithmetic, identical in any
  engine).
- bucket keys: space cell = floor(x/radius), floor(y/radius); time bin =
  tu / tau (integer div).  A qualifying pair differs by <=1 in each key.
- candidates: side A explodes to its 9 spatial neighbor cells x time bins
  {0,+1} (18 copies, a bounded map-side constant); side B keeps its exact
  key; one (cell,bin) equi-join.  The exactly-once rule that replaces a
  dedup shuffle: a same-bin pair matches in BOTH orientations -> keep only
  ping_a < ping_b; a bin+1 pair matches ONLY with A = the earlier-bin ping
  -> keep all.  (`delta = 1 OR ping_a < ping_b`, where ping order is
  (fid, idx) lexicographic.)
- refine: |dt| <= tau and squared planar-degree distance <= radius^2
  (doubles, identical IEEE evaluation order in Spark and DuckDB — the
  `operators/trajectory.py` convention).
- aggregate: groupBy canonical (fid_lo, fid_hi): ping-pair count + distinct
  co-occurrence time bins (bin of the earlier ping).

100 TB shape: the only shuffle is the (cell, bin) hash join — keys are
uniform under clustering because a metro blob spans thousands of
radius-sized cells x time bins (the `operators/hotspot.py` argument, with
time as an extra smoothing dimension).  The 18x explode multiplies map
output, not join fan-out; output is bounded by true co-travel events
(output-sensitive, like the Hausdorff join's candidate stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US = 1_000_000  # microseconds per second


def track_pings(
    tracks: DataFrame,
    wkt_col: str = "geom_wkt",
    fid_col: str = "fid",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """(fid, idx, x, y, tu): vertices with exact-integer interpolated
    timestamps — vertex i of an n-vertex track pings at
    ``start + floor(i * (end - start) / (n - 1))`` microseconds (BIGINT all
    the way; a 2-vertex track spans its full window, 1-vertex tracks are
    dropped as timeless)."""
    # same WKT parse as trajectory.track_vertices, carrying the time window
    body = F.regexp_replace(F.col(wkt_col), r"LINESTRING \(|\)", "")
    verts = F.transform(
        F.split(body, ", "),
        lambda p: F.struct(
            F.split(p, " ")[0].cast("double").alias("x"),
            F.split(p, " ")[1].cast("double").alias("y"),
        ),
    )
    return (
        tracks.select(
            F.col(fid_col).alias("fid"),
            F.unix_micros(F.col(start_col).cast("timestamp")).alias("_su"),
            F.unix_micros(F.col(end_col).cast("timestamp")).alias("_eu"),
            F.posexplode(verts).alias("idx", "_v"),
            F.size(verts).alias("_n"),
        )
        .filter(F.col("_n") >= F.lit(2))
        .select(
            "fid",
            "idx",
            F.col("_v.x").alias("x"),
            F.col("_v.y").alias("y"),
            (
                F.col("_su")
                + F.floor(
                    F.col("idx") * (F.col("_eu") - F.col("_su")) / (F.col("_n") - 1)
                )
            )
            .cast("long")
            .alias("tu"),
        )
    )


def cotravel_hits(
    tracks: DataFrame,
    radius_deg: float = 0.2,
    tau_s: int = 14400,
) -> DataFrame:
    """One row per qualifying ping pair: (fid_a, fid_b, cobin) with
    fid_a < fid_b canonical and ``cobin`` = the earlier ping's tau bin —
    the shared candidate+refine stage under ``cotravel_pairs`` (pair
    aggregation) and ``convoy_pairs`` (consecutive-bin islands)."""
    if radius_deg <= 0 or tau_s <= 0:
        raise ValueError("radius_deg and tau_s must be positive")
    tau_u = int(tau_s) * US
    p = track_pings(tracks)
    keyed = p.select(
        "fid",
        "idx",
        "x",
        "y",
        "tu",
        F.floor(F.col("x") / F.lit(float(radius_deg))).cast("long").alias("cx"),
        F.floor(F.col("y") / F.lit(float(radius_deg))).cast("long").alias("cy"),
        F.floor(F.col("tu") / F.lit(tau_u)).cast("long").alias("tb"),
    )
    # side A explodes to 9 spatial neighbors x time-bin offsets {0,+1}
    offsets = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(dt).alias("dt")
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dt in (0, 1)
        ]
    )
    a = (
        keyed.withColumn("_o", F.explode(offsets))
        .select(
            F.col("fid").alias("fid_a"),
            F.col("idx").alias("idx_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
            F.col("tu").alias("ta"),
            (F.col("cx") + F.col("_o.dx")).alias("jx"),
            (F.col("cy") + F.col("_o.dy")).alias("jy"),
            (F.col("tb") + F.col("_o.dt")).alias("jt"),
            F.col("_o.dt").alias("dt"),
        )
    )
    b = keyed.select(
        F.col("fid").alias("fid_b"),
        F.col("idx").alias("idx_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.col("tu").alias("tb_u"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
        F.col("tb").alias("jt"),
    )
    r2 = float(radius_deg) * float(radius_deg)
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    ping_a_lt_b = (F.col("fid_a") < F.col("fid_b")) | (
        (F.col("fid_a") == F.col("fid_b")) & (F.col("idx_a") < F.col("idx_b"))
    )
    pairs = (
        a.join(b, ["jx", "jy", "jt"])
        .filter(F.col("fid_a") != F.col("fid_b"))
        # exactly-once without a dedup shuffle: same-bin matches appear in
        # both orientations (keep ping_a < ping_b); bin+1 matches only with
        # A = earlier bin (keep all)
        .filter((F.col("dt") == 1) | ping_a_lt_b)
        .filter(F.abs(F.col("ta") - F.col("tb_u")) <= F.lit(tau_u))
        .filter(dx * dx + dy * dy <= F.lit(r2))
    )
    lo_t = F.least(F.col("ta"), F.col("tb_u"))
    return pairs.select(
        F.least("fid_a", "fid_b").alias("fid_a"),
        F.greatest("fid_a", "fid_b").alias("fid_b"),
        F.floor(lo_t / F.lit(tau_u)).cast("long").alias("cobin"),
    )


def cotravel_pairs(
    tracks: DataFrame,
    radius_deg: float = 0.2,
    tau_s: int = 14400,
    min_pairs: int = 1,
) -> DataFrame:
    """Entity pairs with >= ``min_pairs`` ping co-occurrences within
    ``radius_deg`` planar degrees and ``tau_s`` seconds.

    Returns (fid_a, fid_b, n_pairs, n_bins): fid_a < fid_b, ping-pair count
    and distinct co-occurrence time bins (earlier ping's bin)."""
    return (
        cotravel_hits(tracks, radius_deg, tau_s)
        .groupBy("fid_a", "fid_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("cobin").alias("n_bins"),
        )
        .filter(F.col("n_pairs") >= F.lit(int(min_pairs)))
    )


def convoy_pairs(
    tracks: DataFrame,
    radius_deg: float = 0.2,
    tau_s: int = 14400,
    min_len: int = 2,
) -> DataFrame:
    """Sustained companions: pairs co-located in >= ``min_len``
    CONSECUTIVE tau bins — the pairwise core of convoy/flock detection
    (Jeung et al., "Discovery of Convoys in Trajectory Databases",
    VLDB 2008): a convoy requires density-connection sustained over k
    consecutive timestamps; the pairwise sustained-k relation is its
    candidate graph.  Built as gaps-and-islands over the distinct
    co-occurrence bins: island id = cobin - row_number() is constant
    exactly on maximal consecutive runs.

    Returns (fid_a, fid_b, n_bins, max_run): total distinct co-bins and
    the longest consecutive run, filtered to max_run >= min_len.

    100 TB shape: the hits stage is the cotravel bucketed join; after a
    distinct (pair, bin) agg, the window partitions by pair — million-row
    partitions would need a pair to co-occur for a million consecutive
    bins, so the window never skews."""
    from pyspark.sql.window import Window

    if min_len < 1:
        raise ValueError("min_len must be >= 1")
    bins = (
        cotravel_hits(tracks, radius_deg, tau_s)
        .select("fid_a", "fid_b", "cobin")
        .distinct()
    )
    w = Window.partitionBy("fid_a", "fid_b").orderBy("cobin")
    runs = bins.withColumn("isl", F.col("cobin") - F.row_number().over(w)).groupBy(
        "fid_a", "fid_b", "isl"
    )
    return (
        runs.agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("fid_a", "fid_b")
        .agg(
            F.sum("run_len").alias("n_bins"),
            F.max("run_len").alias("max_run"),
        )
        .filter(F.col("max_run") >= F.lit(int(min_len)))
    )


def _hits_ctes(tracks_path: str, radius_deg: float, tau_s: int) -> str:
    """Shared DuckDB CTE prefix (raw -> pings -> hits): an independent
    time-band self-join (no cell bucketing, no orientation trick; IEJoin
    handles the band) with the same exact-integer ping interpolation and
    the same refine arithmetic as the Spark side."""
    tau_u = int(tau_s) * US
    r2 = float(radius_deg) * float(radius_deg)
    verts = (
        "list_transform(string_split(replace(replace(geom_wkt, "
        "'LINESTRING (', ''), ')', ''), ', '), "
        "p -> struct_pack(x := CAST(string_split(p, ' ')[1] AS DOUBLE), "
        "y := CAST(string_split(p, ' ')[2] AS DOUBLE)))"
    )
    return f"""
        WITH raw AS (
          SELECT fid, epoch_us(start_ts) AS su, epoch_us(end_ts) AS eu,
                 unnest({verts}) AS vert,
                 generate_subscripts({verts}, 1) AS idx1,
                 len({verts}) AS n
          FROM '{tracks_path}'),
        pings AS (
          SELECT fid, idx1 - 1 AS idx, vert.x AS x, vert.y AS y,
                 su + CAST(floor((idx1 - 1) * (eu - su) / (n - 1)) AS BIGINT) AS tu
          FROM raw WHERE n >= 2),
        hits AS (
          SELECT p1.fid AS fid_a, p2.fid AS fid_b,
                 CAST(floor(least(p1.tu, p2.tu) / {tau_u}) AS BIGINT) AS cobin
          FROM pings p1, pings p2
          WHERE p1.fid < p2.fid
            AND p2.tu BETWEEN p1.tu - {tau_u} AND p1.tu + {tau_u}
            AND (p1.x - p2.x) * (p1.x - p2.x)
              + (p1.y - p2.y) * (p1.y - p2.y) <= {r2!r})
    """


def cotravel_sql(
    tracks_path: str,
    radius_deg: float = 0.2,
    tau_s: int = 14400,
    min_pairs: int = 1,
) -> str:
    """DuckDB twin of :func:`cotravel_pairs` (see :func:`_hits_ctes`)."""
    return f"""
        {_hits_ctes(tracks_path, radius_deg, tau_s)}
        SELECT fid_a, fid_b,
               count(*) AS n_pairs,
               count(DISTINCT cobin) AS n_bins
        FROM hits
        GROUP BY fid_a, fid_b
        HAVING count(*) >= {int(min_pairs)}
    """


def convoy_sql(
    tracks_path: str,
    radius_deg: float = 0.2,
    tau_s: int = 14400,
    min_len: int = 2,
) -> str:
    """DuckDB twin of :func:`convoy_pairs`: same gaps-and-islands over the
    independent time-band hits join."""
    return f"""
        {_hits_ctes(tracks_path, radius_deg, tau_s)},
        bins AS (SELECT DISTINCT fid_a, fid_b, cobin FROM hits),
        isl AS (
          SELECT fid_a, fid_b,
                 cobin - ROW_NUMBER() OVER (
                   PARTITION BY fid_a, fid_b ORDER BY cobin) AS isl
          FROM bins),
        runs AS (
          SELECT fid_a, fid_b, count(*) AS run_len
          FROM isl GROUP BY fid_a, fid_b, isl)
        SELECT fid_a, fid_b,
               sum(run_len) AS n_bins,
               max(run_len) AS max_run
        FROM runs
        GROUP BY fid_a, fid_b
        HAVING max(run_len) >= {int(min_len)}
    """
