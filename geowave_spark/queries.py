"""Named query catalog: Spark implementations + DuckDB oracle SQL.

Each entry is one operator surface from SURVEY.md §2, exercised end-to-end:
the Spark implementation runs through the engine's operators; the oracle is
an *independent algorithm* (plain SQL arithmetic — half-planes for PIP,
range predicates for boxes, explicit bin arithmetic for tier selection) over
the same deterministic parquet fixtures.

Column-name contract: every computed column is aliased identically in the
Spark plan and the SQL so the driver's sorted-column value hash compares
apples to apples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geowave_spark.datagen import geo_dir_for
from geowave_spark.extract import span_signature, with_geometry
from geowave_spark.operators.range_query import spatial_query_points, spatial_query_tracks
from geowave_spark.operators.spatial_join import pip_join, zonal_stats

# fixture-pinned filter geometries (match datagen._gen_query_filters)
BOX_WKT = "POLYGON ((-75.0 39.5, -72.0 39.5, -72.0 42.5, -75.0 42.5, -75.0 39.5))"
BOX = (-75.0, 39.5, -72.0, 42.5)
CONTAINS_BOX = (-75.0, 39.5, -71.0, 43.5)
CONTAINS_BOX_WKT = "POLYGON ((-75.0 39.5, -71.0 39.5, -71.0 43.5, -75.0 43.5, -75.0 39.5))"
DATELINE_BOX_WKT = "POLYGON ((175.0 -20.0, 185.0 -20.0, 185.0 20.0, 175.0 20.0, 175.0 -20.0))"
TS_LO = "2012-06-01 00:00:00"
TS_HI = "2013-01-01 00:00:00"

GEO_SF001 = "/root/repo/data/geo/sf0.01"  # oracle runs at sf=0.01 (driver contract)


def _geo(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    d = geo_dir_for(sf_dir)
    return spark.read.parquet(str(d / f"{table}.parquet"))


def _polygon_filter_wkt() -> str:
    """The convex 'polygon' saved filter (deterministic, seed 4242)."""
    import duckdb

    from geowave_spark.datagen import ensure_geo_tables

    d = ensure_geo_tables("sf0.01")
    con = duckdb.connect()
    (wkt,) = con.execute(
        f"SELECT geom_wkt FROM '{d}/query_filters.parquet' WHERE name='polygon'"
    ).fetchone()
    con.close()
    return wkt


def _halfplanes_sql_literal(wkt: str) -> str:
    """Convex polygon -> SQL literal of half-plane rows (a, b, c) with
    interior = a*x + b*y <= c.  Baked into the oracle as an independent PIP
    algorithm."""
    import numpy as np

    from geowave_spark.geometry.wkt import parse_wkt

    kind, rings = parse_wkt(wkt)
    assert kind == "polygon"
    ring = rings[0]
    x, y = ring[:, 0], ring[:, 1]
    if (x[:-1] * y[1:] - x[1:] * y[:-1]).sum() < 0:
        ring = ring[::-1]
    rows = []
    for j in range(len(ring) - 1):
        p1x, p1y = ring[j]
        p2x, p2y = ring[j + 1]
        a = p2y - p1y
        b = -(p2x - p1x)
        c = a * p1x + b * p1y
        rows.append(f"({a!r}, {b!r}, {c!r})")
    return "(VALUES " + ", ".join(rows) + ") AS hp(a, b, c)"


# ---------------------------------------------------------------------------
# queries — each returns a callable (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------

def q_spatial_box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+F1: box range scan over points (GeoWaveBasicIT box filter)."""
    pts = _geo(spark, sf_dir, "points")
    return spatial_query_points(pts, BOX_WKT).select(
        "fid", "lon", "lat", F.col("magnitude").alias("magnitude")
    )


def q_spatial_box_temporal_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+F1+temporal: box + time range (GeoWaveBasicIT box-temporal)."""
    import datetime as dt

    pts = _geo(spark, sf_dir, "points")
    lo = dt.datetime.fromisoformat(TS_LO)
    hi = dt.datetime.fromisoformat(TS_HI)
    out = spatial_query_points(pts, BOX_WKT, ts_col="event_ts", ts_range=(lo, hi))
    # fixtures are tz-naive parquet (TIMESTAMP_NTZ); epoch is the UTC reading,
    # matching DuckDB's epoch_ms (session tz pinned to UTC in get_spark)
    return out.select(
        "fid", "lon", "lat", F.unix_millis(F.col("event_ts").cast("timestamp")).alias("event_ms")
    )


def q_spatial_polygon_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+F1+F2: polygon filter with exact PIP refine."""
    pts = _geo(spark, sf_dir, "points")
    return spatial_query_points(pts, _polygon_filter_wkt()).select("fid", "lon", "lat")


def q_dateline_box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 with date-line wrap: lon range [175,185] -> two bins."""
    pts = _geo(spark, sf_dir, "points")
    return spatial_query_points(pts, DATELINE_BOX_WKT).select("fid", "lon", "lat")


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: cell-bucketed PIP join points x convex zones (broadcast build)."""
    pts = _geo(spark, sf_dir, "points")
    zones = _geo(spark, sf_dir, "zones").filter(F.col("zclass") == "convex")
    out = pip_join(pts, zones)
    return out.select("fid", "zone_id", "lon", "lat")


def q_pip_join_hex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 hex mode — the north star's "encode to H3/S2 cells -> cell-bucketed
    PIP join" literally: bucket keys are packed hex cells (sfc/hexgrid.py),
    the probe side bins with pure Catalyst expressions (no encode UDF on the
    big side), zones cover via the conservative axial-rectangle rule.  Same
    refine, identical rows to pip_join (equality pytest + same oracle)."""
    pts = _geo(spark, sf_dir, "points")
    zones = _geo(spark, sf_dir, "zones").filter(F.col("zclass") == "convex")
    out = pip_join(pts, zones, mode="hex")
    return out.select("fid", "zone_id", "lon", "lat")


def q_pip_join_tiered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 tiered mode: zones at their K1 insertion tiers, per-tier joins."""
    pts = _geo(spark, sf_dir, "points")
    zones = _geo(spark, sf_dir, "zones").filter(F.col("zclass") == "convex")
    out = pip_join(pts, zones, mode="tiered")
    return out.select("fid", "zone_id", "lon", "lat")


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/A-family: PIP join + per-zone aggregation (exact int-valued sums)."""
    pts = _geo(spark, sf_dir, "points")
    zones = _geo(spark, sf_dir, "zones").filter(F.col("zclass") == "convex")
    return zonal_stats(
        pts,
        zones,
        [
            F.count("*").alias("n_points"),
            F.sum("magnitude").alias("sum_magnitude"),
            F.min("lat").alias("min_lat"),
            F.max("lat").alias("max_lat"),
        ],
    )


def q_zonal_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal MAJORITY (the categorical zonal statistic next to J6's
    numeric aggs): PIP join -> per-(zone, category) counts -> per-zone
    mode with a (count desc, category asc) tie-break, plus the exact
    integer share in ppm.  Oracle: the half-plane PIP scan with QUALIFY."""
    from pyspark.sql import Window

    from geowave_spark.operators.spatial_join import pip_join

    pts = _geo(spark, sf_dir, "points")
    zones = _geo(spark, sf_dir, "zones").filter(F.col("zclass") == "convex")
    pc = (
        pip_join(pts, zones)
        .groupBy("zone_id", "category")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("zone_id").orderBy(F.desc("n"), F.asc("category"))
    totals = pc.groupBy("zone_id").agg(F.sum("n").alias("n_total"))
    return (
        pc.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .join(totals, "zone_id")
        .select(
            "zone_id",
            F.col("category").alias("majority_cat"),
            F.col("n").alias("n_majority"),
            "n_total",
            F.expr("n * 1000000L DIV n_total").alias("share_ppm"),
        )
    )


def q_tracks_contains_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 CONTAINS over line features: track fully within the box."""
    tracks = _geo(spark, sf_dir, "tracks")
    return spatial_query_tracks(tracks, CONTAINS_BOX_WKT, compare_op="CONTAINS").select(
        "fid", "length_km"
    )


def q_tracks_box_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1+F1+temporal over *range-typed* time (tracks carry [start,end]):
    overlap semantics — track time range intersects the query range
    (TemporalConstraints overlap, `TemporalConstraintsTest` model)."""
    import datetime as dt

    tracks = _geo(spark, sf_dir, "tracks")
    lo = dt.datetime.fromisoformat(TS_LO)
    hi = dt.datetime.fromisoformat(TS_HI)
    out = spatial_query_tracks(tracks, CONTAINS_BOX_WKT, compare_op="CONTAINS").filter(
        (F.col("start_ts") < F.lit(hi)) & (F.col("end_ts") >= F.lit(lo))
    )
    return out.select("fid", "length_km")


def q_docs_extent_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs pipeline over ALL geometry kinds (point/line/polygon): extract
    bbox per doc, coarse bbox-intersects filter vs the box (K1 extent path),
    spans carried through."""
    docs = _geo(spark, sf_dir, "docs")
    geo = with_geometry(docs)
    out = geo.filter(
        (F.col("minx") <= BOX[2])
        & (F.col("maxx") >= BOX[0])
        & (F.col("miny") <= BOX[3])
        & (F.col("maxy") >= BOX[1])
    )
    return out.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.col("minx"),
        F.col("maxy"),
    )


def q_docs_polygon_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 for polygon/line-valued *data* geometries: coarse bbox pass, then
    exact per-kind intersects refine (point range check stays native; only
    the ~10% non-point minority reaches the Arrow batch) — the
    `SpatialQueryFilter.java:182-228` accept semantics for every geometry
    type, not bbox-only."""
    from geowave_spark.extract import refine_intersects_box_udf

    docs = _geo(spark, sf_dir, "docs")
    geo = with_geometry(docs)
    coarse = geo.filter(
        (F.col("minx") <= BOX[2])
        & (F.col("maxx") >= BOX[0])
        & (F.col("miny") <= BOX[3])
        & (F.col("maxy") >= BOX[1])
    )
    _refine = refine_intersects_box_udf(BOX[0], BOX[1], BOX[2], BOX[3])
    is_point = F.col("geom_wkt").startswith("POINT")
    point_ok = (
        (F.col("cx") >= BOX[0])
        & (F.col("cx") <= BOX[2])
        & (F.col("cy") >= BOX[1])
        & (F.col("cy") <= BOX[3])
    )
    # ArrowEvalPython computes the UDF for every batch row regardless of the
    # surrounding when(); gating the INPUT (NULL for the point fast path,
    # the with_geometry pattern) keeps the per-row parse on the ~10% minority
    refined = coarse.filter(
        F.when(is_point, point_ok).otherwise(
            _refine(F.when(~is_point, F.col("geom_wkt")))
        )
    )
    return refined.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.split("geom_wkt", " ")[0].alias("gkind"),
    )


def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user (30-min inactivity gap) — the custom
    stateful-operator pattern expressed declaratively; oracle re-derives
    sessions with gaps-and-islands SQL."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.session_window(F.col("ts").cast("timestamp"), "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
        )
    )


def q_docs_box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs pipeline: span->geometry extraction + box filter (point-geo docs),
    spans carried through untouched (invariant surface)."""
    docs = _geo(spark, sf_dir, "docs")
    geo = with_geometry(docs)
    pts = geo.filter(F.col("geom_wkt").startswith("POINT"))
    out = spatial_query_points(pts, BOX_WKT, lon_col="cx", lat_col="cy")
    return out.select(
        "doc_id",
        F.col("cx").alias("lon"),
        F.col("cy").alias("lat"),
        F.size("spans").alias("n_spans"),
    )


def q_spans_preserved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-row invariant: run the extraction pipeline end-to-end and emit
    the span-sequence signature — must equal the signature computed directly
    on the source table (the oracle does the latter)."""
    docs = _geo(spark, sf_dir, "docs")
    processed = with_geometry(docs)  # full pipeline transform
    return processed.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.concat_ws(
            "\x1e",
            F.transform(
                F.col("spans"),
                lambda s: F.concat_ws(
                    "\x1f", s["kind"], s["text"], s["media_ref"], s["offset"].cast("string")
                ),
            ),
        ).alias("span_sig"),
    )


def q_subsample_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: fixed-resolution subsampling — one representative per tier-11 cell
    (dropDuplicates on truncated SFC key; deterministic min(fid) rep)."""
    from geowave_spark.operators.indexing import cell_at_tier, with_point_cells
    from geowave_spark.sfc import DEFAULT_CONFIG

    pts = with_point_cells(_geo(spark, sf_dir, "points"))
    t11 = pts.withColumn("cell11", cell_at_tier(F.col("cell"), DEFAULT_CONFIG.finest, 11))
    return (
        t11.groupBy("cell11")
        .agg(F.min("fid").alias("fid"), F.count("*").alias("n_in_cell"))
        .select("fid", "n_in_cell")
    )


def q_subsample_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4: the same tier-11 subsampling on the Z-order backend — cell ids
    differ from Hilbert but the cell partition of the plane is identical, so
    the (rep fid, count) result set matches the same bin-arithmetic oracle."""
    from geowave_spark.operators.indexing import cell_at_tier, with_point_cells
    from geowave_spark.sfc import SpatialConfig

    zcfg = SpatialConfig(backend="zorder")
    pts = with_point_cells(_geo(spark, sf_dir, "points"), cfg=zcfg)
    t11 = pts.withColumn("cell11", cell_at_tier(F.col("cell"), zcfg.finest, 11))
    return (
        t11.groupBy("cell11")
        .agg(F.min("fid").alias("fid"), F.count("*").alias("n_in_cell"))
        .select("fid", "n_in_cell")
    )


KNN_K = 10
KNN_DIST = 1.0


def _knn_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic query subset: every fid ending in '00' (1% of points)."""
    return (
        _geo(spark, sf_dir, "points")
        .filter(F.col("fid").endswith("00"))
        .select(F.col("fid").alias("qid"), F.col("lon").alias("qlon"), F.col("lat").alias("qlat"))
    )


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: distance-bounded kNN, adaptive ring expansion (broadcast queries)."""
    from geowave_spark.operators.knn import knn_join_adaptive

    pts = _geo(spark, sf_dir, "points")
    return knn_join_adaptive(_knn_queries(spark, sf_dir), pts, k=KNN_K, max_distance_deg=KNN_DIST)


def q_orders_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table relational rollup across four driver tables (TPC-H
    Q5-lite): orders joined through customer -> nation -> region with the
    dimension chain broadcast (three sub-MB build sides — the star-join
    shape every warehouse plan wants), exact count + integer-safe order
    count per region/status."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    dims = customer.join(
        F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"]
    ).join(F.broadcast(region), F.col("n_regionkey") == region["r_regionkey"])
    joined = orders.join(
        F.broadcast(dims.select("c_custkey", "r_name")),
        orders["o_custkey"] == F.col("c_custkey"),
    )
    return joined.groupBy("r_name", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


def q_tracks_st_insertion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 for EXTENT data (TieredSFCIndexStrategyTest.testRegions semantics):
    each track's (bbox, time range) splits per year bin, then the finest 3D
    tier whose span product fits 2^3 duplicates emits the covered cells.
    Output: (fid, time_bin, tier, n_cells) — the oracle re-derives the bin
    split, fraction windows, and tier selection in pure SQL arithmetic."""
    from geowave_spark.operators.indexing import st_range_insertion_udf

    tracks = _geo(spark, sf_dir, "tracks")
    body = F.regexp_replace(F.col("geom_wkt"), r"LINESTRING \(|\)", "")
    verts = F.transform(
        F.split(body, ", "),
        lambda p: F.struct(
            F.split(p, " ")[0].cast("double").alias("x"),
            F.split(p, " ")[1].cast("double").alias("y"),
        ),
    )
    bb = tracks.select(
        "fid",
        "start_ts",
        "end_ts",
        F.array_min(F.transform(verts, lambda v: v["x"])).alias("minx"),
        F.array_max(F.transform(verts, lambda v: v["x"])).alias("maxx"),
        F.array_min(F.transform(verts, lambda v: v["y"])).alias("miny"),
        F.array_max(F.transform(verts, lambda v: v["y"])).alias("maxy"),
    )
    exploded = bb.withColumn(
        "_c",
        F.explode(
            st_range_insertion_udf()(
                F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"),
                F.col("start_ts"), F.col("end_ts"),
            )
        ),
    )
    return (
        exploded.groupBy(
            "fid", F.col("_c.time_bin").alias("time_bin"), F.col("_c.tier").alias("tier")
        )
        .agg(F.count("*").alias("n_cells"))
    )


def q_st_insertion_biased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 bias variants (tracks_st_insertion's unequal-bits sibling): each
    point's insertion key under the SPATIAL (25,25,10) and TEMPORAL
    (10,10,40) bit allocations
    (`SpatialTemporalDimensionalityTypeProvider.java:149-190`), computed by
    the compact-Hilbert transform (`sfc/compact_hilbert.py`, uzaygezen's
    algorithm in `HilbertSFC.java:114-165`), then decoded BACK to per-dim
    bins executor-side.  The oracle re-derives the bins by pure SQL
    arithmetic, so a green row proves each biased key is a faithful
    bijection of the correct (lon, lat, year-fraction) bins at that bias'
    precision; the curve's visit ORDER (not SQL-expressible) is pinned by
    the rank-oracle vectors in tests/test_sfc.py."""
    from geowave_spark.operators.indexing import (
        biased_st_decode_udf as dec_udf,
        with_biased_st_cells,
    )

    pts = _geo(spark, sf_dir, "points")
    df = with_biased_st_cells(pts, "spatial", cell_col="sp_key")
    df = with_biased_st_cells(df, "temporal", cell_col="tm_key")
    df = df.withColumn("_s", dec_udf("spatial")(F.col("sp_key"))).withColumn(
        "_t", dec_udf("temporal")(F.col("tm_key"))
    )
    return df.select(
        "fid",
        "time_bin",
        F.col("_s.xb").alias("s_xb"),
        F.col("_s.yb").alias("s_yb"),
        F.col("_s.tb").alias("s_tb"),
        F.col("_t.xb").alias("t_xb"),
        F.col("_t.yb").alias("t_yb"),
        F.col("_t.tb").alias("t_tb"),
    )


def q_lineitem_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over the driver's relational tables —
    the A-family statistics operators applied to a non-spatial corpus (same
    partial-agg shapes, integer-exact quantity sums, min/max prices).
    Demonstrates the engine's stats surface is not geometry-bound."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cutoff = F.lit("1998-09-02")
    return (
        li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            F.count("*").alias("count_order"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


def q_events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: hour rollup from raw,
    day rollup FROM THE HOUR LEVEL, week from the day level — coarser tiers
    never touch raw rows (the KDE-pyramid pattern applied to time; at
    10^12 rows the day rollup reads ~24 rows per bucket instead of
    millions).  Metrics chosen exact under re-aggregation (count sums,
    min-of-mins, max-of-maxes), so every level equals the direct rollup the
    oracle computes from raw."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hour = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    day = (
        hour.groupBy(F.date_trunc("day", F.col("bucket")).alias("bucket"))
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    week = (
        day.groupBy(F.date_trunc("week", F.col("bucket")).alias("bucket"))
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    return (
        hour.withColumn("level", F.lit("hour"))
        .unionByName(day.withColumn("level", F.lit("day")))
        .unionByName(week.withColumn("level", F.lit("week")))
        .select("level", "bucket", "n", "min_value", "max_value")
    )


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (brief's custom-operator family): for each probe event,
    the latest 'click' by the same user at or before it — union + ordered
    window, one shuffle on the key, no inequality join.  DuckDB's native
    ASOF JOIN is the independent oracle."""
    from geowave_spark.operators.temporal_join import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    probes = ev.filter(F.col("event_id") % 20 == 0).select("event_id", "user_id", "ts")
    builds = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(probes, builds, key_col="user_id", value_cols=["event_id", "value"])
    return out.select("event_id", "asof_event_id", "asof_value")


def q_points_track_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: points whose timestamp falls inside a track's
    [start, end] window — time buckets as 1D cells + exact refine, never an
    inequality join."""
    from geowave_spark.operators.temporal_join import interval_join

    pts = (
        _geo(spark, sf_dir, "points")
        .filter(F.col("fid").endswith("0"))
        .select(F.col("fid").alias("point_fid"), F.col("event_ts"))
    )
    tracks = _geo(spark, sf_dir, "tracks").select(
        F.col("fid").alias("track_fid"), "start_ts", "end_ts"
    )
    out = interval_join(pts, tracks, probe_ts_col="event_ts")
    return out.select("point_fid", "track_fid")


DIST_JOIN_DEG = 0.25


def q_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 without the top-k: the FULL epsilon-neighborhood join (every pair
    within distance — NNMapReduce's raw output).  Distance kept small: the
    output is pair-count-sensitive by definition."""
    from geowave_spark.operators.knn import distance_join

    pts = _geo(spark, sf_dir, "points")
    out = distance_join(_knn_queries(spark, sf_dir), pts, DIST_JOIN_DEG)
    return out.filter(F.col("qid") != F.col("fid")).select("qid", "fid", "dist_sq")


KDE_MIN_LEVEL, KDE_MAX_LEVEL, KDE_TILE_SIZE = 4, 6, 4


def q_kde_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1-R3: KDE pyramid with exact tile assignment (the bit-for-bit tile
    surface) — all-Catalyst splat + agg + windows."""
    from geowave_spark.operators.kde import kde_pyramid

    pts = _geo(spark, sf_dir, "points")
    return kde_pyramid(
        pts, min_level=KDE_MIN_LEVEL, max_level=KDE_MAX_LEVEL, tile_size=KDE_TILE_SIZE
    )


def q_kde_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7: tile resize (tileSize 4 -> 2).  The oracle computes the pyramid
    directly at tileSize 2 — bit-for-bit equality is the reference's
    KDERasterResizeIT.testSamplesMatch contract."""
    from geowave_spark.operators.kde import kde_pyramid, resize_pyramid

    pts = _geo(spark, sf_dir, "points")
    tiles4 = kde_pyramid(
        pts, min_level=KDE_MIN_LEVEL, max_level=KDE_MAX_LEVEL, tile_size=KDE_TILE_SIZE
    )
    return resize_pyramid(tiles4, old_tile_size=KDE_TILE_SIZE, new_tile_size=KDE_TILE_SIZE // 2)


def q_kde_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8: seasonal comparison KDE — summer/winter percentile pyramids +
    combined band (`analytics/mapreduce/.../kde/compare/*`), one declarative
    plan with integer-ppm seasonal weights for cross-engine exactness."""
    from geowave_spark.operators.kde_compare import kde_comparison

    pts = _geo(spark, sf_dir, "points")
    return kde_comparison(
        pts, min_level=KDE_MIN_LEVEL, max_level=KDE_MAX_LEVEL, tile_size=KDE_TILE_SIZE
    )


def q_lexicoder_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K8 codec contract: ranking by the double lexicoder's BYTES must equal
    ranking by the native value (the oracle orders by magnitude directly) —
    proof the sort-order-preserving encoding is correct over the whole
    corpus.  Export-path demo; query-time ordering stays native."""
    from pyspark.sql.window import Window

    from geowave_spark.functions.lexicoder import lexicoded_double_col

    pts = _geo(spark, sf_dir, "points")
    lex = pts.withColumn("lex", lexicoded_double_col(F.col("magnitude")))
    w = Window.orderBy("lex", "fid")
    return lex.select("fid", F.row_number().over(w).alias("lex_rank"))


# F9 visibility fixture: 8 policy labels assigned deterministically by fid
# digits; scanner authorizations {alpha, bravo}.  The oracle hardcodes the
# hand-derived truth of each expression so it does NOT share the engine's
# parser (truth table in the oracle SQL).
VIS_EXPRS = [
    "alpha",                            # True  (alpha held)
    "bravo",                            # True  (bravo held)
    "charlie",                          # False
    "alpha&bravo",                      # True
    "alpha&charlie",                    # False (charlie missing)
    "alpha|charlie",                    # True  (alpha held)
    "delta|(charlie&bravo)",            # False (delta and charlie missing)
    '(alpha|charlie)&(bravo|delta)',    # True  (alpha & bravo)
]
VIS_AUTHS = ("alpha", "bravo")


def q_visibility_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: row visibility — Accumulo-style boolean label expressions against
    a scanner auth set, evaluated once per DISTINCT expression on the driver
    and shipped as a Catalyst IN filter (zero per-row Python; the label set
    is policy-bounded at any corpus scale)."""
    from geowave_spark.functions.visibility import filter_by_visibility

    pts = _geo(spark, sf_dir, "points")
    idx = F.substring(F.col("fid"), 4, 8).cast("int") % len(VIS_EXPRS)
    with_vis = pts.withColumn(
        "vis", F.element_at(F.array(*[F.lit(e) for e in VIS_EXPRS]), idx + 1)
    )
    return filter_by_visibility(with_vis, "vis", set(VIS_AUTHS)).select(
        "fid", "category", "vis"
    )


def q_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: fixed-bin numeric histogram of magnitude (width-10 bins)."""
    pts = _geo(spark, sf_dir, "points")
    return (
        pts.withColumn("bin", F.floor(F.col("magnitude") / 10).cast("long"))
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.min("magnitude").alias("bin_min"),
            F.max("magnitude").alias("bin_max"),
        )
    )


def q_percentile_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 analog: exact percentiles per category (HdrHistogram stand-in —
    Spark's exact percentile; at scale swap for approx_percentile)."""
    pts = _geo(spark, sf_dir, "points")
    return pts.groupBy("category").agg(
        F.percentile("magnitude", F.lit(0.25)).alias("p25"),
        F.percentile("magnitude", F.lit(0.5)).alias("p50"),
        F.percentile("magnitude", F.lit(0.9)).alias("p90"),
    )


def q_distinct_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 surface (exact twin of FeatureHyperLogLogStatistics; swap in
    approx_count_distinct at scale) over the events stream table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_cql_attribute_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: CQL-style attribute predicate — Spark SQL expr is a CQL superset."""
    pts = _geo(spark, sf_dir, "points")
    return pts.filter(
        F.expr(
            "magnitude >= 50 AND category IN ('cat1', 'cat3') "
            "AND lon BETWEEN -80 AND -60"
        )
    ).select("fid", "lon", "lat", "magnitude", "category")


def q_text_like_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 text secondary-index predicate (LikeFilter analog)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.filter(F.col("text").like("%table value%")).select("doc_id", "n_chars")


def q_spatiotemporal_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6: spatio-temporal binning — YEAR time bins (TemporalBinningStrategy
    default) x tier-11 spatial cells; per-bin cell/point counts."""
    from geowave_spark.operators.indexing import cell_at_tier, with_point_cells
    from geowave_spark.sfc import DEFAULT_CONFIG

    pts = with_point_cells(_geo(spark, sf_dir, "points"))
    binned = pts.withColumn("year", F.year("event_ts")).withColumn(
        "cell11", cell_at_tier(F.col("cell"), DEFAULT_CONFIG.finest, 11)
    )
    per_cell = binned.groupBy("year", "cell11").agg(F.count("*").alias("n"))
    return per_cell.groupBy("year").agg(
        F.count("*").alias("n_cells"),
        F.sum("n").alias("n_points"),
        F.max("n").alias("max_cell_points"),
    )


def q_events_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling calendar windows over the events stream table (the
    reference's only window construct is temporal binning, §2.9) — same plan
    shape Structured Streaming uses for windowed aggs."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), F.col("event_type")
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


def q_hot_cell_salting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K7: hot-cell detection for salting — per tier-7 cell counts with the
    hot flag (threshold 500), the planning input for explicit skew salting."""
    from geowave_spark.operators.indexing import cell_at_tier, with_point_cells
    from geowave_spark.sfc import DEFAULT_CONFIG

    pts = with_point_cells(_geo(spark, sf_dir, "points"))
    t7 = pts.withColumn("cell7", cell_at_tier(F.col("cell"), DEFAULT_CONFIG.finest, 7))
    return (
        t7.groupBy("cell7")
        .agg(F.min("fid").alias("rep_fid"), F.count("*").alias("n_in_cell"))
        .select("rep_fid", "n_in_cell", (F.col("n_in_cell") >= 500).alias("is_hot"))
    )


KMEANS_K = 8
KMEANS_ITERS = 5
DBSCAN_EPS = 0.05
DBSCAN_MIN_PTS = 5


def _kmeans_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/4 sample (engine-independent md5 filter, NOT limit —
    Spark's limit picks arbitrary partitions and cannot be oracle-compared)."""
    from geowave_spark.functions.text import md5_long

    pts = _geo(spark, sf_dir, "points")
    return pts.filter(F.pmod(md5_long(F.col("fid")), F.lit(4)) == 0)


def _dbscan_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from geowave_spark.functions.text import md5_long

    pts = _geo(spark, sf_dir, "points")
    return pts.filter(F.pmod(md5_long(F.col("fid")), F.lit(5)) == 0)


ST_DBSCAN_EPS_S = 0.15  # spatial epsilon (wider than plain DBSCAN:
# the temporal gate thins each neighborhood, so density needs range)
ST_DBSCAN_EPS_T_S = 60 * 86400  # temporal epsilon: 60 days


def q_st_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST-DBSCAN cluster sizes (operators/clustering.py st_dbscan, Birant &
    Kut 2007): density clustering where neighbors must be within 0.15 deg
    AND 60 days — the same md5-subset corpus as dbscan_clusters with a
    wider spatial epsilon (the temporal gate thins each neighborhood), so
    the rows directly show time splitting spatially-merged clusters.
    Oracle = WITH RECURSIVE reachability over the spatio-temporal edge
    set."""
    from geowave_spark.operators.clustering import st_dbscan

    out = st_dbscan(
        _dbscan_subset(spark, sf_dir),
        eps_s=ST_DBSCAN_EPS_S,
        eps_t_s=ST_DBSCAN_EPS_T_S,
        min_pts=DBSCAN_MIN_PTS,
    )
    return out.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.sum(F.col("is_core").cast("int")).alias("n_core"),
    )


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: per-cluster sizes after fixed Lloyd iterations.  Oracle = the same
    deterministic algorithm (md5-ranked init, k=8, 5 unrolled iterations)
    written as a DuckDB CTE chain — mirrors GeoWaveKMeansIT's
    ingest-then-verify contract (`GeoWaveKMeansIT.java:213-308`)."""
    from geowave_spark.operators.clustering import kmeans

    assign, _ = kmeans(_kmeans_subset(spark, sf_dir), k=KMEANS_K, max_iters=KMEANS_ITERS)
    return assign.groupBy("cluster").agg(F.count("*").alias("n"))


def q_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: cluster sizes.  Oracle = eps self-join + WITH RECURSIVE reachability
    (min core id per component) in DuckDB (`DBScanIT.java:178-183`)."""
    from geowave_spark.operators.clustering import dbscan

    out = dbscan(_dbscan_subset(spark, sf_dir), eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS)
    return out.groupBy("cluster").agg(
        F.count("*").alias("n_members"),
        F.sum(F.col("is_core").cast("int")).alias("n_core"),
    )


def q_dbscan_hulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 hull stage: per-cluster convex hulls of DBSCAN clusters.  Oracle
    counts hull vertices with an independent algorithm: a member is a strict
    hull vertex iff the circular gap between directions to its co-members
    exceeds pi (all others in an open half-plane)."""
    from geowave_spark.operators.clustering import dbscan
    from geowave_spark.operators.hull import group_hulls

    pts = _dbscan_subset(spark, sf_dir)
    members = dbscan(pts, eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS).join(
        pts.select("fid", "lon", "lat"), "fid"
    )
    return group_hulls(members).select("cluster", "n_points", "n_vertices")


def q_dbscan_concave_hulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 hull stage, concave variant (GeometryHullTool.concaveHullParkOhMethod
    — the hull the reference's DBSCAN actually emits).  The greedy dig loop
    is not SQL-expressible, so the checkable surface is its INVARIANTS: per
    cluster the engine computes the hull and self-verifies (independent
    ray-cast containment of every member, vertices-subset-of-members,
    concave-area <= convex-area); the oracle independently re-derives the
    cluster structure (recursive-CTE DBSCAN -> per-cluster counts) and
    asserts the three invariants all hold.  Dig-shape semantics beyond the
    invariants stay pytest-pinned in tests/test_hull_stateful.py."""
    from geowave_spark.operators.clustering import dbscan
    from geowave_spark.operators.hull import group_concave_hull_invariants

    pts = _dbscan_subset(spark, sf_dir)
    members = dbscan(pts, eps=DBSCAN_EPS, min_pts=DBSCAN_MIN_PTS).join(
        pts.select("fid", "lon", "lat"), "fid"
    )
    return group_concave_hull_invariants(members).select(
        "cluster",
        "n_points",
        "members_inside",
        "vertices_are_members",
        "area_le_convex",
    )


def q_spatiotemporal_3d_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K6 proper: 3D (lon, lat, time-in-year) Z-order keys with YEAR bin-id
    prefix; per-year cell/point statistics.  Oracle re-bins with the same
    edge rules (ceil-1 spatial bins, microsecond-exact year fraction)."""
    from geowave_spark.operators.indexing import with_spatiotemporal_cells

    pts = with_spatiotemporal_cells(_geo(spark, sf_dir, "points"))
    per_cell = pts.groupBy("time_bin", "st_cell").agg(F.count("*").alias("n"))
    return per_cell.groupBy("time_bin").agg(
        F.count("*").alias("n_cells"),
        F.sum("n").alias("n_points"),
        F.max("n").alias("max_cell_points"),
    )


HAVERSINE_K = 5
HAVERSINE_RADIUS_KM = 200.0


def q_knn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 + geodesic distance (CoordinateCircleDistanceFn analog): broadcast
    nested-loop kNN under great-circle distance, rank-only output (trig ulps
    differ across engines; ordering does not)."""
    from geowave_spark.functions.distance import haversine_km

    pts = _geo(spark, sf_dir, "points")
    q = _knn_queries(spark, sf_dir)
    hav = haversine_km(F.col("lon"), F.col("lat"), F.col("qlon"), F.col("qlat"))
    from pyspark.sql.window import Window

    scored = (
        pts.crossJoin(F.broadcast(q))
        .filter(F.col("fid") != F.col("qid"))
        .withColumn("hav_km", hav)
        .filter(F.col("hav_km") <= HAVERSINE_RADIUS_KM)
    )
    w = Window.partitionBy("qid").orderBy("hav_km", "fid")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= HAVERSINE_K)
        .select("qid", "fid", "rank")
    )


CMS_DEPTH = 4
CMS_WIDTH = 1024


def q_knn_geodesic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 under great-circle distance, scale path: cell-bucketed candidate
    balls with lat-aware lon inflation + exact haversine refine — replaces
    the broadcast-NL `knn_haversine` baseline at corpus scale; identical
    results, so it shares that query's oracle."""
    from geowave_spark.operators.knn import knn_join_geodesic

    pts = _geo(spark, sf_dir, "points")
    q = _knn_queries(spark, sf_dir)
    return knn_join_geodesic(
        q, pts, k=HAVERSINE_K, max_distance_km=HAVERSINE_RADIUS_KM
    ).select("qid", "fid", "rank")


def q_cms_category_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: count-min sketch per attribute (FeatureCountMinSketchStatistics
    analog, `core/store/.../statistics/CountMinSketchStatistics`).

    The sketch is built as data: depth x width hashed counters from ONE
    partial-agg groupBy (the distributed CMS build — counters merge by sum,
    exactly how per-partition sketches compose), then each category's
    estimate is the min over its depth buckets.  Deterministic engine-portable
    hash (md5 prefix) makes the estimate oracle-checkable; at sf0.01 the
    1024-wide rows are collision-free so estimate == exact, which the output
    exposes side-by-side."""
    from geowave_spark.functions.text import md5_long

    pts = _geo(spark, sf_dir, "points")
    rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))).alias("depth")
    hashed = pts.select("category", rows).withColumn(
        "bucket",
        F.pmod(md5_long(F.concat_ws(":", F.col("depth"), F.col("category"))), F.lit(CMS_WIDTH)),
    )
    # the sketch table: (depth, bucket) -> counter  [partial agg map-side]
    sketch = hashed.groupBy("depth", "bucket").agg(F.count("*").alias("counter"))
    cats = (
        pts.groupBy("category")
        .agg(F.count("*").alias("n_exact"))
        .withColumn("depth", F.explode(F.sequence(F.lit(0), F.lit(CMS_DEPTH - 1))))
        .withColumn(
            "bucket",
            F.pmod(
                md5_long(F.concat_ws(":", F.col("depth"), F.col("category"))), F.lit(CMS_WIDTH)
            ),
        )
    )
    return (
        cats.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy("category", "n_exact")
        .agg(F.min("counter").alias("n_est"))
        .select("category", "n_exact", "n_est")
    )


def q_docs_zone_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 extended to areal probe geometries: documents of EVERY geometry
    kind (point/line/polygon) joined to convex zones on exact intersects —
    both sides cell-bucketed, pairs deduped before the per-kind refine
    (`SpatialQueryFilter.java:182-228` applied pairwise)."""
    from geowave_spark.operators.spatial_join import areal_join

    docs = with_geometry(_geo(spark, sf_dir, "docs")).select(
        "doc_id", "geom_wkt", "minx", "miny", "maxx", "maxy"
    )
    zones = _geo(spark, sf_dir, "zones").filter(F.col("zclass") == "convex")
    out = areal_join(docs, zones)
    return out.select(
        "doc_id", "zone_id", F.split("geom_wkt", " ")[0].alias("gkind")
    )


def q_docs_zone_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CONTAINS twin of docs_zone_join: documents whose whole geometry
    lies inside a convex zone (for convex regions, all-vertices-inside is
    exact for every kind — the oracle checks exactly that)."""
    from geowave_spark.operators.spatial_join import areal_join

    docs = with_geometry(_geo(spark, sf_dir, "docs")).select(
        "doc_id", "geom_wkt", "minx", "miny", "maxx", "maxy"
    )
    zones = _geo(spark, sf_dir, "zones").filter(F.col("zclass") == "convex")
    out = areal_join(docs, zones, compare_op="CONTAINS")
    return out.select(
        "doc_id", "zone_id", F.split("geom_wkt", " ")[0].alias("gkind")
    )


def q_routed_box_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based index routing end-to-end: the chooser picks the cheaper
    layout (2D tiered vs 3D spatio-temporal) for the box+time constraints
    and the scan runs through that layout's key ranges; exact refine makes
    the result route-independent, so the oracle is the plain SQL filter."""
    import datetime as dt

    from geowave_spark.plans.index_select import routed_points_query

    pts = _geo(spark, sf_dir, "points")
    lo = dt.datetime.fromisoformat(TS_LO)
    hi = dt.datetime.fromisoformat(TS_HI)
    out, _winner = routed_points_query(pts, BOX, lo, hi)
    return out.select(
        "fid", "lon", "lat", F.unix_millis(F.col("event_ts").cast("timestamp")).alias("event_ms")
    )


# the CQL front-end's driver query: one string exercising the spatial op,
# the temporal op, and plain attribute predicates together, so extraction
# must pull BOTH index constraints and the fine filter must re-verify all
# three families (CQLQuery.java:59-100's exact flow)
CQL_ROUTED = (
    f"BBOX(geom, {BOX[0]}, {BOX[1]}, {BOX[2]}, {BOX[3]}) "
    f"AND event_ts DURING {TS_LO.replace(' ', 'T')}/{TS_HI.replace(' ', 'T')} "
    "AND magnitude >= 10 AND category IN ('cat1', 'cat3')"
)


def q_st_biased_box_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 for the BIAS layouts: box+time constraints decomposed to compact-
    Hilbert key ranges on the SPATIAL-bias (25,25,10) keys
    (`sfc/compact_hilbert.py::compact_hilbert_ranges`, the uzaygezen
    BacktrackingQueryBuilder role in `HilbertSFC.decomposeRange`), scanned
    as a pushable key predicate + exact refine — so the oracle is the plain
    box+time SQL and a green row proves the ranged scan over biased keys
    loses nothing.  Range exactness itself is pinned exhaustively in
    tests/test_sfc.py (keys-in-ranges == cells-in-box on small grids)."""
    import datetime as dt

    import numpy as np

    from geowave_spark.operators.indexing import with_biased_st_cells
    from geowave_spark.sfc.compact_hilbert import BIAS_BITS, compact_hilbert_ranges
    from geowave_spark.sfc.tiered import lat_bins, lon_bins, value_bins

    dims = BIAS_BITS["spatial"]
    minx, miny, maxx, maxy = BOX
    t_lo, t_hi = dt.datetime(2012, 3, 1), dt.datetime(2012, 9, 1)
    y0, y1 = dt.datetime(2012, 1, 1), dt.datetime(2013, 1, 1)
    span = (y1 - y0).total_seconds()
    flo = (t_lo - y0).total_seconds() / span
    fhi = (t_hi - y0).total_seconds() / span
    xlo = int(lon_bins(np.array([minx]), dims[0], is_min=True)[0])
    xhi = int(lon_bins(np.array([maxx]), dims[0], is_min=False)[0])
    ylo = int(lat_bins(np.array([miny]), dims[1], is_min=True)[0])
    yhi = int(lat_bins(np.array([maxy]), dims[1], is_min=False)[0])
    tlo = int(value_bins(np.array([flo]), dims[2], is_min=True)[0])
    thi = int(value_bins(np.array([fhi]), dims[2], is_min=False)[0])
    # 64-range budget keeps the OR-chain shallow (the engine-wide Catalyst
    # rule); the descent stays over-inclusive under the cap
    ranges = compact_hilbert_ranges((xlo, ylo, tlo), (xhi, yhi, thi), dims, 64)
    pred = None
    for a, b in ranges:
        p = (F.col("sp_key") >= a) & (F.col("sp_key") <= b)
        pred = p if pred is None else (pred | p)
    exact = (
        (F.col("lon") >= minx)
        & (F.col("lon") <= maxx)
        & (F.col("lat") >= miny)
        & (F.col("lat") <= maxy)
        & (F.col("event_ts") >= F.lit(t_lo))
        & (F.col("event_ts") < F.lit(t_hi))
    )
    pts = _geo(spark, sf_dir, "points")
    df = with_biased_st_cells(pts, "spatial", cell_col="sp_key")
    return (
        df.filter((F.col("time_bin") == 2012) & pred)
        .filter(exact)
        .select(
            "fid",
            "lon",
            "lat",
            F.unix_millis(F.col("event_ts").cast("timestamp")).alias("event_ms"),
        )
    )


CQL_DOCS = (
    f"BBOX(geom, {BOX[0]}, {BOX[1]}, {BOX[2]}, {BOX[3]}) AND n_spans BETWEEN 3 AND 6"
)


def q_cql_docs_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 areal binding: the SAME CQL front-end against a table whose
    geometry attribute is a real WKT feature column (points/lines/polygons
    mixed) — BBOX compiles to the exact per-kind intersects refine
    (`SpatialQueryFilter.java:182-228` accept semantics), attribute
    predicates stay native.  Oracle: the docs_polygon_query SAT arithmetic
    plus the attribute clause."""
    from geowave_spark.functions.cql import CqlBinding, parse_cql, to_column

    docs = _geo(spark, sf_dir, "docs")
    geo = with_geometry(docs).withColumn("n_spans", F.size("spans"))
    fine = to_column(parse_cql(CQL_DOCS), CqlBinding(wkt_col="geom_wkt"))
    return geo.filter(fine).select(
        "doc_id", "n_spans", F.split("geom_wkt", " ")[0].alias("gkind")
    )


def q_cql_areal_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cql_docs_bbox THROUGH the tiered extent index: the docs are written
    once per sf as an ingest_extents layout (tier dirs + cell-sorted files,
    cached beside the geo fixtures), then the CQL's envelope prunes
    tier+cell ranges before the same fine filter — the reference's
    CQL-over-feature-store scan.  Same oracle as cql_docs_bbox because the
    routed output is exact (route-independence also pinned in
    tests/test_cql.py)."""
    from geowave_spark.plans.cql_route import cql_areal_routed_query
    from geowave_spark.sources.tables import ingest_extents, read_indexed

    d = geo_dir_for(sf_dir)
    # sibling of the fixture dir — writing INSIDE it would corrupt
    # directory-wide reads of the fixtures (mixed partition roots)
    path = d.parent / f"{d.name}_extent_cql_idx"
    if not (path / "_SUCCESS").exists():
        docs = with_geometry(_geo(spark, sf_dir, "docs")).withColumn(
            "n_spans", F.size("spans")
        )
        ingest_extents(
            docs.select(
                "doc_id", "geom_wkt", "n_spans", "minx", "miny", "maxx", "maxy"
            ),
            str(path),
        )
    back = read_indexed(spark, str(path))
    routed, _route = cql_areal_routed_query(back, CQL_DOCS)
    return routed.select(
        "doc_id", "n_spans", F.split("geom_wkt", " ")[0].alias("gkind")
    )


def q_cql_spatial_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 front-end: OGC CQL string -> parsed filter -> extracted geometry +
    time constraints -> cost-based index routing -> key-range scan -> full
    CQL re-verify (functions/cql.py + plans/cql_route.py, mirroring
    CQLQuery.java:59-100 / ExtractGeometryFilterVisitor /
    ExtractTimeFilterVisitor).  Output is route-independent; the oracle is
    the plain SQL translation of the same string."""
    from geowave_spark.plans.cql_route import cql_routed_query

    pts = _geo(spark, sf_dir, "points")
    out, _route = cql_routed_query(pts, CQL_ROUTED)
    return out.select(
        "fid",
        "lon",
        "lat",
        "magnitude",
        "category",
        F.unix_millis(F.col("event_ts").cast("timestamp")).alias("event_ms"),
    )


S2_BITS = 6


def q_s2_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3/S2-family cell backend (sfc/s2cube.py): per-cube-face-cell point
    counts at resolution 6.  The binning chain (sphere -> face -> gnomonic
    -> quadratic st -> grid) runs as pure Catalyst expressions; the Hilbert
    key is the bijective storage form of the (face, i, j) triple emitted
    here, which is what the SQL oracle re-derives."""
    from geowave_spark.operators.indexing import with_s2_bins

    pts = _geo(spark, sf_dir, "points")
    return (
        with_s2_bins(pts, bits=S2_BITS)
        .groupBy("s2_face", "s2_ib", "s2_jb")
        .agg(F.count("*").alias("n"), F.min("fid").alias("first_fid"))
    )


def q_track_od_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin-destination flow matrix (operators/trajectory.py od_flows):
    track endpoints located with ONE cell-bucketed PIP join against the
    convex zones, o/d paired on the track id, flows counted per zone pair."""
    from geowave_spark.operators.trajectory import od_flows

    tracks = _geo(spark, sf_dir, "tracks")
    zones = _geo(spark, sf_dir, "zones").filter(F.col("zclass") == "convex")
    return od_flows(tracks, zones)


STAY_RADIUS_DEG = 0.15
STAY_MIN_RUN = 3


def q_track_staypoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory stay-point anchors (operators/trajectory.py): vertices of
    each track whose next min_run-1 vertices stay within the radius — the
    distance-only Li et al. detector as LEAD windows keyed on the track."""
    from geowave_spark.operators.trajectory import staypoints

    return staypoints(
        _geo(spark, sf_dir, "tracks"),
        radius_deg=STAY_RADIUS_DEG,
        min_run=STAY_MIN_RUN,
    )


GI_CELL_DEG = 1.0


def q_emerging_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-time Gi* + Mann-Kendall trend per cell (operators/hotspot.py
    emerging_hotspots): monthly (cell, t) bins, 3x3x3 neighborhood z-scores,
    per-cell trend classification from the sign-pair sum."""
    from geowave_spark.operators.hotspot import emerging_hotspots

    return emerging_hotspots(_geo(spark, sf_dir, "points"), cell_deg=GI_CELL_DEG)


def q_hotspot_gi_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hotspot z-scores over 1-degree gridded point counts
    (operators/hotspot.py) — the significance-tested sibling of the KDE
    density pyramid (`analytics/mapreduce/.../kde/`): per occupied cell,
    queen-neighborhood sum vs the global mean/std, quantized to ppm."""
    from geowave_spark.operators.hotspot import gi_star

    return gi_star(_geo(spark, sf_dir, "points"), cell_deg=GI_CELL_DEG)


KNOX_DIST_DEG = 0.5
KNOX_TAU_MS = 3 * 86_400_000


def q_knox_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knox space-time interaction statistic (operators/hotspot.py
    knox_test): of all unordered event pairs, how many are close in both
    space (<=0.5 deg) and time (<=3 days) vs the independence expectation —
    every pair count found output-sensitively (3x3 cell-neighborhood
    equi-join for space, +-1 bin join for time; no n^2 stage).  The oracle
    is brute-force over the full pair matrix — an independent algorithm."""
    from geowave_spark.operators.hotspot import knox_test

    return knox_test(
        _geo(spark, sf_dir, "points"), dist_deg=KNOX_DIST_DEG, tau_ms=KNOX_TAU_MS
    )


RIPLEY_DISTS = (0.25, 0.5, 1.0)
# colocation PI neighbor radius: 0.05 deg, NOT the Ripley ladder head —
# PI enumerates exact cross-category neighbor pairs, so the radius must
# scale with feature density (at sf0.1's metro-blob density, d=0.25 means
# ~5.6e8 candidate pairs: a true-output blowup, measured in
# BENCH/BASELINE.md §9, not a plan defect)
COLOC_D = 0.05
CROSS_K_CATS = ("cat0", "cat1")


def q_ripley_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K at three radii (operators/hotspot.py ripley_k): the
    second-order clustering-scale statistic — ONE output-sensitive
    candidate join at the largest radius, all radii counted as WHEN-sums
    over the same joined rows.  The oracle brute-forces the full unordered
    pair matrix (an independent algorithm)."""
    from geowave_spark.operators.hotspot import ripley_k

    return ripley_k(_geo(spark, sf_dir, "points"), dists=RIPLEY_DISTS)


def q_colocation_cross_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate cross-K colocation of two point categories
    (operators/hotspot.py cross_k): do cat0 and cat1 events attract or
    repel at each scale?  Category filter pushes to the scan, only the a
    side explodes to the bounded 3x3 neighborhood, disjoint sides need no
    ordering dedup.  Brute-force a x b oracle."""
    from geowave_spark.operators.hotspot import cross_k

    return cross_k(
        _geo(spark, sf_dir, "points"), *CROSS_K_CATS, dists=RIPLEY_DISTS
    )


def q_terrain_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horn slope / aspect / hillshade over the 1-degree point-density
    surface (operators/terrain.py): the 3x3 stencil as a bounded scatter
    explode + one uniform-key groupBy — the raster-derivative family the
    reference's KDE/tile pipeline stops short of.  Oracle gathers each
    cell's 8 neighbors by key (independent formulation)."""
    from geowave_spark.operators.hotspot import cell_counts
    from geowave_spark.operators.terrain import horn_terrain

    return horn_terrain(cell_counts(_geo(spark, sf_dir, "points"), 1.0), cell=1.0)


CONTOUR_THETA = 2.5


def q_contour_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares iso-contours at count level 2.5 over the 1-degree
    density surface (operators/contour.py): corner assembly as a bounded
    x4 scatter + one pivot groupBy, then the 16-case edge-interpolation
    table in pure Catalyst.  Oracle assembles corners by 4 LEFT JOINs (a
    gather — independent plan), same half-integer level."""
    from geowave_spark.operators.contour import marching_squares
    from geowave_spark.operators.hotspot import cell_counts

    return marching_squares(
        cell_counts(_geo(spark, sf_dir, "points"), GI_CELL_DEG), theta=CONTOUR_THETA
    )


CLARK_EVANS_DMAX = 0.25
QT_CAP = 200
QT_MIN_TIER, QT_MAX_TIER = 3, 12


def q_region_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster regionization (operators/regionize.py): 4-connected
    components of the occupied density-surface cells via the shared
    large-star/small-star CC core; literal-offset scatter finds the
    edges on the CELL table.  Oracle: WITH RECURSIVE closure min-label."""
    from geowave_spark.operators.hotspot import cell_counts
    from geowave_spark.operators.regionize import region_label

    return region_label(cell_counts(_geo(spark, sf_dir, "points"), GI_CELL_DEG))


def q_adaptive_quadtree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density-adaptive quadtree layout (operators/quadtree.py): split
    cells coarse-to-fine until each leaf holds <= cap, the frontier shrinking
    each round.  Oracle: the bounded level loop unrolled into generated
    CTEs (one join per level)."""
    from geowave_spark.operators.quadtree import adaptive_quadtree

    return adaptive_quadtree(
        _geo(spark, sf_dir, "points"), QT_CAP, QT_MIN_TIER, QT_MAX_TIER
    )



def q_std_ellipse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional distribution: standard deviational ellipse over the
    point corpus (operators/pointstats.py) — one pass of DECIMAL(38,0)
    moment sums, A-form centering, eigen decomposition as one pinned
    float expression.  Oracle: HUGEINT sums, identical expression."""
    from geowave_spark.operators.pointstats import std_ellipse

    return std_ellipse(_geo(spark, sf_dir, "points"))


def q_clark_evans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clark-Evans average-nearest-neighbor index (operators/
    pointstats.py): the NN stage is the engine's bucketed kNN join (k=2
    self-join); the oracle recomputes NN by brute force under the same
    distance bound — an independent plan."""
    from geowave_spark.operators.pointstats import clark_evans

    return clark_evans(_geo(spark, sf_dir, "points"), CLARK_EVANS_DMAX)


def q_contour_polylines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iso-line assembly: marching-squares segments chained into polyline
    components by shared endpoints via the dedup family's large-star/
    small-star connected components (operators/contour.py).  Oracle: the
    gather-plan segments fed through a WITH RECURSIVE transitive-closure
    min-label — an independent components algorithm."""
    from geowave_spark.operators.contour import contour_polylines, marching_squares
    from geowave_spark.operators.hotspot import cell_counts

    return contour_polylines(
        marching_squares(
            cell_counts(_geo(spark, sf_dir, "points"), GI_CELL_DEG),
            theta=CONTOUR_THETA,
        )
    )


PMI_WINDOW, PMI_MIN_COUNT, PMI_K = 3, 5, 30
SSSP_SNAP, SSSP_HOPS = 0.05, 8


def q_track_bearings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-track circular bearing stats (operators/trajectory.py
    track_bearing_stats): Mardia mean direction + resultant concentration
    as a zero-shuffle array fold with per-segment quantized sin/cos.
    Oracle: same fold over the shared WKT vertex idiom."""
    from geowave_spark.operators.trajectory import track_bearing_stats

    return track_bearing_stats(_geo(spark, sf_dir, "tracks"))


def q_hourly_periodicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hour-of-day chi-square periodicity (operators/
    periodicity.py): exact integer algebra (24*so2 - n^2)*1e6 DIV n over
    two uniform-key aggs.  Oracle: identical algebra."""
    from geowave_spark.operators.periodicity import hourly_periodicity

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hourly_periodicity(ev)


def q_cell_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell Shannon category diversity + evenness (operators/
    hotspot.py cell_diversity): per-term micro-nat quantization before
    the per-cell sum.  Oracle: identical trees."""
    from geowave_spark.operators.hotspot import cell_diversity

    return cell_diversity(_geo(spark, sf_dir, "points"), GI_CELL_DEG)


def q_local_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anselin LISA cluster/outlier map (operators/hotspot.py
    local_morans_i): per-cell local Moran's I + HH/LH/LL/HL quadrant over
    the same gridding/neighborhood machinery as Gi*.  Oracle: identical
    integer aggregates, term-for-term float expression."""
    from geowave_spark.operators.hotspot import local_morans_i

    return local_morans_i(_geo(spark, sf_dir, "points"), GI_CELL_DEG)



def q_track_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop single-source shortest paths over the snap-contracted
    track network (operators/graph.py): delta-frontier Bellman-Ford, one
    uniform equi-join + min-agg per round, hub source.  Oracle: the
    relaxation unrolled into generated CTE levels."""
    from geowave_spark.operators.graph import sssp_bounded, track_graph

    g = track_graph(_geo(spark, sf_dir, "tracks"), SSSP_SNAP)
    return sssp_bounded(g, hops=SSSP_HOPS)



def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocation extraction (operators/collocate.py) — the text twin
    of the spatial colocation PI: within-window token pairs as zero-join
    Catalyst array zips, micro-nat-quantized PMI, tie-broken top-k.
    Oracle: position self-join pair generation (independent plan)."""
    from geowave_spark.operators.collocate import pmi_collocations

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return pmi_collocations(docs, PMI_WINDOW, PMI_MIN_COUNT, PMI_K)


TFIDF_K = 5


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction (operators/search.py
    tfidf_top_terms): exact-integer tf x micro-nat idf scores, one
    row_number window per doc.  Oracle pins the identical arithmetic via
    QUALIFY."""
    from geowave_spark.operators.search import tfidf_top_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_top_terms(docs, TFIDF_K)


BM25_TERMS = ["hash", "join", "window"]
BM25_K = 12


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the document corpus (operators/search.py):
    one corpus scan with the |Q|-term filter map-side before the (doc, term)
    shuffle, broadcast df/corpus stats, integer micro-quantized per-term
    contributions (order-independent sum), TakeOrdered top-k.  Oracle is
    the gather formulation (per-doc list_filter counts, no explode)."""
    from geowave_spark.operators.search import bm25_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bm25_topk(docs, BM25_TERMS, k=BM25_K)


def q_colocation_pi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Colocation-pattern participation index for EVERY category pair
    (operators/hotspot.py colocation_pi, Shekhar & Huang SSTD 2001): the
    fraction of each category's instances with a cross-category neighbor
    within 0.25 deg, PI = the min of the two sides — integer-exact ppm,
    one 3x3 cell self-join.  Brute-force pair-matrix oracle."""
    from geowave_spark.operators.hotspot import colocation_pi

    return colocation_pi(_geo(spark, sf_dir, "points"), d=COLOC_D)


def q_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I spatial autocorrelation over the same 1-degree grid
    as Gi* (operators/hotspot.py morans_i): integer pair/cell sums combined
    in one pinned float expression, ppm-quantized — the corpus-wide
    single-number complement to the per-cell hotspot map."""
    from geowave_spark.operators.hotspot import morans_i

    return morans_i(_geo(spark, sf_dir, "points"), cell_deg=GI_CELL_DEG)


def q_idw_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDW magnitude surface at occupied 1-degree cell centers
    (operators/interpolate.py): inverse-square-distance weighted mean over
    the 3x3 cell neighborhood, per-term FLOOR-quantized weights so every
    aggregation input is an exact integer — the value-surface sibling of
    the KDE density pyramid."""
    from geowave_spark.operators.interpolate import idw_grid

    return idw_grid(_geo(spark, sf_dir, "points"), cell_deg=GI_CELL_DEG)


def q_track_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-track summaries (operators/trajectory.py track_stats): vertex and
    segment counts, planar length in exact integer micro-degrees (per-term
    quantized), duration in ms — ONE map-side projection, the vertex array
    folds without ever exploding or shuffling."""
    from geowave_spark.operators.trajectory import track_stats

    return track_stats(_geo(spark, sf_dir, "tracks"))


def q_stanag_track_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: STANAG 4676 ingest end-to-end — NATO TrackMessage XML files parse
    executor-side (sources/formats.read_stanag4676, mirroring
    `extensions/formats/stanag4676` NATO4676Decoder semantics), points
    reassemble into the track contract, and track_stats runs unchanged.
    The fixture is tracks.parquet serialized as 4676 XML (coordinate text
    verbatim, times floored to the wire format's milliseconds), so the
    oracle is the SAME independent track_stats SQL over the parquet source:
    matching it proves the 4676 parse + reassembly is byte-identical."""
    from pathlib import Path

    from geowave_spark.datagen import SCALES, ensure_stanag4676
    from geowave_spark.operators.trajectory import track_stats
    from geowave_spark.sources.formats import read_stanag4676, stanag_to_tracks

    sf = Path(sf_dir).name
    d = ensure_stanag4676(sf if sf in SCALES else "sf0.01")
    pts = read_stanag4676(spark, str(d / "stanag4676" / "*.xml"))
    return track_stats(stanag_to_tracks(pts))


def q_track_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Douglas-Peucker simplification over every track at once
    (operators/trajectory.py simplify_tracks): distributed split rounds —
    each round one interior-vertex join + one max_by argmax per active
    segment; rounds = max recursion depth across tracks.  The oracle is the
    identical recursion as a DuckDB recursive CTE."""
    from geowave_spark.operators.trajectory import simplify_tracks

    return simplify_tracks(_geo(spark, sf_dir, "tracks"), tolerance_deg=0.05)


HAUSDORFF_DEG = 0.2


def q_track_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory-similarity self-join (operators/trajectory.py
    hausdorff_join): every track pair within 0.2 deg discrete Hausdorff
    distance, found output-sensitively — one vertex explode to threshold-
    width cells, a 3x3-neighborhood equi-join (the only vertex pairs ever
    materialized are near pairs), per-vertex min / per-direction max with a
    coverage proof.  The oracle is brute-force full-matrix Hausdorff over
    bbox-close pairs — an independent algorithm."""
    from geowave_spark.operators.trajectory import hausdorff_join

    return hausdorff_join(_geo(spark, sf_dir, "tracks"), threshold_deg=HAUSDORFF_DEG)


SNAP_RADIUS_DEG = 0.1
SNAP_CELL_DEG = 0.25


def q_map_match_snap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-matching snap join (operators/mapmatch.py snap_join): every
    point within 0.1 deg of the track network snaps to its nearest
    segment — the network explodes to radius-padded bbox cells (build
    side), pings carry one cell key (probe side, never exploded), one
    equi-join + exact projection refine + groupBy-argmin.  The oracle is
    brute-force point x segment with a bbox prefilter — an independent
    plan, same IEEE arithmetic."""
    from geowave_spark.operators.mapmatch import snap_join

    return snap_join(
        _geo(spark, sf_dir, "points"),
        _geo(spark, sf_dir, "tracks"),
        radius_deg=SNAP_RADIUS_DEG,
        cell_deg=SNAP_CELL_DEG,
    )


COTRAVEL_DEG = 0.2  # co-location radius (planar degrees)
COTRAVEL_TAU_S = 14400  # co-location time window (4 h)


def q_cotravel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-traveler detection (operators/cotravel.py): entity pairs whose
    interpolated track pings repeatedly co-occur within 0.2 deg AND 4 h —
    a bucketed spatio-temporal self-join on (radius-cell, tau-bin) keys
    with an orientation rule that makes every qualifying ping pair appear
    exactly once (no dedup shuffle).  The oracle is an independent
    time-band IEJoin with the same exact-integer ping interpolation."""
    from geowave_spark.operators.cotravel import cotravel_pairs

    return cotravel_pairs(
        _geo(spark, sf_dir, "tracks"), radius_deg=COTRAVEL_DEG, tau_s=COTRAVEL_TAU_S
    )


def q_convoy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sustained companions (operators/cotravel.py): pairs co-located in
    >= 2 CONSECUTIVE tau bins — the pairwise candidate graph of convoy
    detection (Jeung et al., VLDB 2008), computed as gaps-and-islands
    over the cotravel hits stage.  The oracle replays the same islands
    arithmetic over an independent time-band IEJoin."""
    from geowave_spark.operators.cotravel import convoy_pairs

    return convoy_pairs(
        _geo(spark, sf_dir, "tracks"),
        radius_deg=COTRAVEL_DEG,
        tau_s=COTRAVEL_TAU_S,
        min_len=2,
    )


RESAMPLE_STEP_S = 4 * 3600  # tracks span hours-to-days; 4 h gives ~9 ticks each


def q_track_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-cadence track resampling (operators/trajectory.py
    resample_tracks): one interpolated position per entity per 4-hour
    absolute epoch tick — the normalization pass upstream of co-travel /
    OD / snapshot clustering.  Exact-integer tick grid; the lerp tree is
    IEEE-identical in the DuckDB twin."""
    from geowave_spark.operators.trajectory import resample_tracks

    return resample_tracks(_geo(spark, sf_dir, "tracks"), step_s=RESAMPLE_STEP_S)


MOVING_EPS_DEG = 0.5
MOVING_BIN_S = 7 * 86400
MOVING_MIN_PTS = 3
MOVING_THETA_PPM = 100_000


def q_moving_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving clusters (operators/cotravel.py, Kalnis et al. SSTD 2005):
    weekly snapshot density clusters of track pings chained by entity-set
    Jaccard >= 0.1 across consecutive weeks — all snapshots cluster in ONE
    label-propagation run because edges never cross a bin.  Oracle =
    WITH RECURSIVE per-bin reachability + the same integer chain math."""
    from geowave_spark.operators.cotravel import moving_clusters

    return moving_clusters(
        _geo(spark, sf_dir, "tracks"),
        eps_deg=MOVING_EPS_DEG,
        bin_s=MOVING_BIN_S,
        min_pts=MOVING_MIN_PTS,
        theta_ppm=MOVING_THETA_PPM,
    )


def q_geofence_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence enter/exit/switch events per entity timeline
    (operators/geofence.py): one PIP join resolves each ping's (minimum)
    containing convex zone, one (entity, time) window emits the
    transitions.  The reference answers the static which-pings-are-inside
    half; the transition stream is the stateful sequel."""
    from geowave_spark.operators.geofence import geofence_transitions

    pts = _geo(spark, sf_dir, "points")
    zones = _geo(spark, sf_dir, "zones").filter(F.col("zclass") == "convex")
    return geofence_transitions(pts, zones)


GEOHASH_PRECISION = 5


def q_geohash_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5 geohash backend (sfc/geohash.py): per-geohash point counts at
    precision 5 — the standard Niemeyer base32 Morton key, computed as pure
    Catalyst bit arithmetic (operators/indexing.py with_geohash), so keys
    interoperate with every public geohash library.  The reference's
    Z-order backend (`ZOrderSFC.java:62-158`) is the binary-keyed sibling;
    prefix truncation here plays cell_at_tier's role."""
    from geowave_spark.operators.indexing import with_geohash

    pts = _geo(spark, sf_dir, "points")
    return (
        with_geohash(pts, precision=GEOHASH_PRECISION)
        .groupBy("geohash")
        .agg(F.count("*").alias("n"), F.min("fid").alias("first_fid"))
    )


def _geohash_oracle() -> str:
    """Same quantize/interleave/base32 arithmetic as one SQL expression."""
    from geowave_spark.sfc.geohash import lonlat_bits

    p = GEOHASH_PRECISION
    lb, tb = lonlat_bits(p)
    lonq = f"LEAST(CAST(FLOOR((lon + 180.0) / 360.0 * {float(1 << lb)}) AS BIGINT), {(1 << lb) - 1})"
    latq = f"LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * {float(1 << tb)}) AS BIGINT), {(1 << tb) - 1})"
    terms = []
    total = 5 * p
    for k in range(total):
        if k % 2 == 0:
            terms.append(f"(((lonq >> {lb - 1 - k // 2}) & 1) << {total - 1 - k})")
        else:
            terms.append(f"(((latq >> {tb - 1 - (k - 1) // 2}) & 1) << {total - 1 - k})")
    code = " + ".join(terms)
    chars = " || ".join(
        f"substr('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"CAST(((code >> {5 * (p - 1 - j)}) & 31) + 1 AS INT), 1)"
        for j in range(p)
    )
    return f"""
        WITH q AS (SELECT fid, {lonq} AS lonq, {latq} AS latq
                   FROM '{GEO_SF001}/points.parquet'),
        c AS (SELECT fid, {code} AS code FROM q)
        SELECT {chars} AS geohash, CAST(count(*) AS BIGINT) AS n,
               MIN(fid) AS first_fid
        FROM c GROUP BY code
    """


HEX_RES = 6


def q_hex_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3-family cell backend (sfc/hexgrid.py): per-hex-cell point counts at
    resolution 6.  Pointy-top axial binning with cube rounding runs as pure
    Catalyst expressions (operators/indexing.py with_hex_bins); the packed
    int64 key is the bijective storage form of the (q, r) pair emitted here,
    which is what the SQL oracle re-derives with identical FLOOR rounding."""
    from geowave_spark.operators.indexing import with_hex_bins

    pts = _geo(spark, sf_dir, "points")
    return (
        with_hex_bins(pts, res=HEX_RES)
        .groupBy("hex_q", "hex_r")
        .agg(F.count("*").alias("n"), F.min("fid").alias("first_fid"))
    )


def q_knn_hexring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/J3 hex variant — the north star's named "H3-ring-expansion kNN":
    both sides bin to hex cells, the query side expands by a broadcast
    kRing-offset literal table, candidates come from one (q, r) equi-join —
    zero Python anywhere in each round's plan (plan-shape pytest).  Rounds
    expand the radius adaptively with executor-side retirement (the fixed
    full-ball variant measured 97 s at sf0.1 over hot clusters; adaptive
    measured 19.6 s cold on the same input).  Output contract and oracle
    identical to knn_join."""
    from geowave_spark.operators.knn import knn_join_hexring_adaptive

    pts = _geo(spark, sf_dir, "points")
    return knn_join_hexring_adaptive(
        _knn_queries(spark, sf_dir), pts, k=KNN_K, max_distance_deg=KNN_DIST
    )


def q_raster_tiling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5+R6: coverage -> tier selection (convertToIndex floorEntry rule) ->
    per-cell tileSize^2 chop with nearest-neighbor resample -> no-data mosaic
    merge (latest-wins, earlier fills holes) -> exact integer summary.
    Mirrors `RasterDataAdapter.java:391-516` + `NoDataMergeStrategy.java`."""
    from pathlib import Path

    from geowave_spark.datagen import SCALES, ensure_coverages
    from geowave_spark.operators.raster import mosaic_summary, mosaic_tiles, raster_tiles

    sf = Path(sf_dir).name
    d = ensure_coverages(sf if sf in SCALES else "sf0.01")
    covs = spark.read.parquet(str(d / "coverages.parquet"))
    return mosaic_summary(mosaic_tiles(raster_tiles(covs))).select(
        "tier", "xb", "yb", "n_sources", "checksum", "n_nodata"
    )


def q_raster_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5 with buildPyramid=true: each coverage ingests at its full-res tier
    PLUS every coarser tier while one tile can still hold the span
    (`RasterDataAdapter.java:470-480` tailMap walk) — per-tier mosaic
    summaries."""
    from pathlib import Path

    from geowave_spark.datagen import SCALES, ensure_coverages
    from geowave_spark.operators.raster import mosaic_summary, mosaic_tiles, raster_tiles

    sf = Path(sf_dir).name
    d = ensure_coverages(sf if sf in SCALES else "sf0.01")
    covs = spark.read.parquet(str(d / "coverages.parquet"))
    return mosaic_summary(mosaic_tiles(raster_tiles(covs, build_pyramid=True))).select(
        "tier", "xb", "yb", "n_sources", "checksum", "n_nodata"
    )


def q_geotiff_ingest_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4+R5: georeferenced-raster ingest — single-band GeoTIFF binaries
    (Tiepoint+PixelScale or ModelTransformation georeferencing, GDAL nodata,
    none/PackBits/LZW/Deflate strips ± predictor, both byte orders) decode
    executor-side into placed coverages, then run the full tier-select /
    chop / mosaic pipeline.  The fixture is the raster_tiling coverage set
    round-tripped through real GeoTIFF encoding, so the oracle is the SAME
    independent SQL re-derivation over the parquet source: matching it
    proves the georeferencing parse placed every pixel bit-identically.
    Mirrors `extensions/formats/geotools-raster` ingest feeding
    `RasterDataAdapter.java:391-516`."""
    from pathlib import Path

    from geowave_spark.datagen import SCALES, ensure_geotiffs
    from geowave_spark.operators.raster import mosaic_summary, mosaic_tiles, raster_tiles
    from geowave_spark.sources.formats import read_geotiff_coverages

    sf = Path(sf_dir).name
    d = ensure_geotiffs(sf if sf in SCALES else "sf0.01")
    covs = read_geotiff_coverages(spark.read.parquet(str(d / "geotiffs.parquet")))
    return mosaic_summary(mosaic_tiles(raster_tiles(covs))).select(
        "tier", "xb", "yb", "n_sources", "checksum", "n_nodata"
    )


def q_stats_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-A5 analog: per-category ingest statistics (count, bbox, range)."""
    pts = _geo(spark, sf_dir, "points")
    return pts.groupBy("category").agg(
        F.count("*").alias("n"),
        F.min("lon").alias("min_lon"),
        F.max("lon").alias("max_lon"),
        F.min("lat").alias("min_lat"),
        F.max("lat").alias("max_lat"),
        F.sum("magnitude").alias("sum_magnitude"),
    )


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — independent algorithms over the same parquet
# ---------------------------------------------------------------------------

def _knn_haversine_oracle() -> str:
    from geowave_spark.functions.distance import haversine_km_sql

    hav = haversine_km_sql("q.lon", "q.lat", "p.lon", "p.lat")
    return f"""
        SELECT qid, fid, rank FROM (
          SELECT q.fid AS qid, p.fid AS fid,
                 ROW_NUMBER() OVER (
                   PARTITION BY q.fid ORDER BY {hav}, p.fid) AS rank
          FROM (SELECT * FROM '{GEO_SF001}/points.parquet' WHERE fid LIKE '%00') q,
               '{GEO_SF001}/points.parquet' p
          WHERE p.fid <> q.fid AND {hav} <= {HAVERSINE_RADIUS_KM})
        WHERE rank <= {HAVERSINE_K}
    """


def _docs_zone_join_oracle() -> str:
    """Exact any-geometry x convex-zone intersects by independent algorithms:
    points by half-plane conjunction; segments by Cyrus-Beck parametric
    clipping against the zone half-planes; convex data polygons by the
    two-sided separating-axis test (zone half-planes vs data vertices, data
    edge half-planes vs zone ring vertices)."""
    docs = f"'{GEO_SF001}/docs.parquet'"
    hp = f"'{GEO_SF001}/zone_halfplanes.parquet'"
    zones = f"'{GEO_SF001}/zones.parquet'"
    verts_of = (
        "list_transform(string_split({body}, ', '), "
        "p -> struct_pack(x := CAST(string_split(p, ' ')[1] AS DOUBLE), "
        "y := CAST(string_split(p, ' ')[2] AS DOUBLE)))"
    )
    line_body = "replace(replace(wkt, 'LINESTRING (', ''), ')', '')"
    poly_body = "replace(replace(wkt, 'POLYGON ((', ''), '))', '')"
    zring_body = "replace(replace(geom_wkt, 'POLYGON ((', ''), '))', '')"
    return f"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(spans, s -> s.kind = 'geo')[1].text AS wkt,
                 string_split(list_filter(spans, s -> s.kind = 'geo')[1].text, ' ')[1] AS gkind
          FROM {docs}),
        z AS (SELECT zone_id, {verts_of.format(body=zring_body)} AS zverts
              FROM {zones} WHERE zclass = 'convex'),
        pts AS (
          SELECT d.doc_id, h.zone_id, d.gkind
          FROM (SELECT doc_id, gkind,
                  TRY_CAST(regexp_extract(wkt, '^POINT \\(([-+0-9.eE]+) ([-+0-9.eE]+)\\)$', 1) AS DOUBLE) AS px,
                  TRY_CAST(regexp_extract(wkt, '^POINT \\(([-+0-9.eE]+) ([-+0-9.eE]+)\\)$', 2) AS DOUBLE) AS py
                FROM d WHERE gkind = 'POINT') d,
               (SELECT DISTINCT zone_id FROM {hp}) h
          WHERE NOT EXISTS (
            SELECT 1 FROM {hp} q
            WHERE q.zone_id = h.zone_id AND q.a * d.px + q.b * d.py > q.c)),
        lsegs AS (
          SELECT doc_id, gkind, i,
                 verts[i].x AS x1, verts[i].y AS y1,
                 verts[i+1].x - verts[i].x AS dx, verts[i+1].y - verts[i].y AS dy
          FROM (SELECT doc_id, gkind, {verts_of.format(body=line_body)} AS verts
                FROM d WHERE gkind = 'LINESTRING'),
               LATERAL unnest(range(1, len(verts))) AS u(i)),
        lclip AS (
          -- Cyrus-Beck: clip t in [0,1] against every half-plane
          SELECT s.doc_id, s.gkind, q.zone_id, s.i,
                 GREATEST(0.0, COALESCE(MAX(CASE WHEN q.a * s.dx + q.b * s.dy < 0
                   THEN -(q.a * s.x1 + q.b * s.y1 - q.c) / (q.a * s.dx + q.b * s.dy) END), 0.0)) AS tlo,
                 LEAST(1.0, COALESCE(MIN(CASE WHEN q.a * s.dx + q.b * s.dy > 0
                   THEN -(q.a * s.x1 + q.b * s.y1 - q.c) / (q.a * s.dx + q.b * s.dy) END), 1.0)) AS thi,
                 SUM(CASE WHEN q.a * s.dx + q.b * s.dy = 0
                          AND q.a * s.x1 + q.b * s.y1 > q.c THEN 1 ELSE 0 END) AS n_bad
          FROM lsegs s, {hp} q
          GROUP BY s.doc_id, s.gkind, q.zone_id, s.i),
        lines AS (
          SELECT DISTINCT doc_id, zone_id, gkind
          FROM lclip WHERE n_bad = 0 AND tlo <= thi),
        dpoly AS (
          SELECT doc_id, gkind, {verts_of.format(body=poly_body)} AS verts
          FROM d WHERE gkind = 'POLYGON'),
        polys AS (
          SELECT p.doc_id, z.zone_id, p.gkind
          FROM dpoly p, z
          -- (a) no zone half-plane has every data vertex strictly outside
          WHERE NOT EXISTS (
            SELECT 1 FROM {hp} q WHERE q.zone_id = z.zone_id
              AND len(list_filter(p.verts, v -> q.a * v.x + q.b * v.y <= q.c)) = 0)
          -- (b) no data edge (CCW half-plane) has every zone vertex outside
            AND len(list_filter(range(1, len(p.verts)), i ->
              len(list_filter(z.zverts, v ->
                (p.verts[i+1].y - p.verts[i].y) * v.x
                + (-(p.verts[i+1].x - p.verts[i].x)) * v.y
                <= (p.verts[i+1].y - p.verts[i].y) * p.verts[i].x
                + (-(p.verts[i+1].x - p.verts[i].x)) * p.verts[i].y)) = 0)) = 0)
        SELECT * FROM pts UNION ALL SELECT * FROM lines UNION ALL SELECT * FROM polys"""


def _tracks_st_insertion_oracle() -> str:
    """Independent SQL re-derivation of the 3D ranged insertion: per-year
    bin split with the engine's microsecond conventions, fraction windows,
    the standard bin edge rules per dimension, finest tier with span
    product <= 8, n_cells = the product at the chosen tier."""
    tracks = f"'{GEO_SF001}/tracks.parquet'"
    verts = (
        "list_transform(string_split(replace(replace(geom_wkt, 'LINESTRING (', ''), ')', ''), ', '), "
        "p -> struct_pack(x := CAST(string_split(p, ' ')[1] AS DOUBLE), "
        "y := CAST(string_split(p, ' ')[2] AS DOUBLE)))"
    )
    return f"""
        WITH bb AS (
          SELECT fid, start_ts, end_ts,
                 list_min(list_transform({verts}, v -> v.x)) AS minx,
                 list_max(list_transform({verts}, v -> v.x)) AS maxx,
                 list_min(list_transform({verts}, v -> v.y)) AS miny,
                 list_max(list_transform({verts}, v -> v.y)) AS maxy
          FROM {tracks}),
        bins AS (
          SELECT b.*, y.y AS time_bin,
                 make_timestamp(y.y, 1, 1, 0, 0, 0) AS y0,
                 make_timestamp(y.y + 1, 1, 1, 0, 0, 0) AS y1
          FROM bb b,
               LATERAL unnest(generate_series(
                 CAST(date_part('year', b.start_ts) AS INT),
                 CAST(date_part('year', b.end_ts - INTERVAL 1 microsecond) AS INT))) AS y(y)),
        frac AS (
          SELECT *,
            CASE WHEN GREATEST(start_ts, y0) = y0
                  AND LEAST(end_ts - INTERVAL 1 microsecond, y1 - INTERVAL 1 millisecond)
                      = y1 - INTERVAL 1 millisecond
                 THEN 0.0
                 ELSE CAST(datediff('microsecond', y0, GREATEST(start_ts, y0)) AS DOUBLE)
                    / CAST(datediff('microsecond', y0, y1) AS DOUBLE) END AS flo,
            CASE WHEN GREATEST(start_ts, y0) = y0
                  AND LEAST(end_ts - INTERVAL 1 microsecond, y1 - INTERVAL 1 millisecond)
                      = y1 - INTERVAL 1 millisecond
                 THEN 1.0
                 ELSE LEAST(CAST(datediff('microsecond', y0, LEAST(end_ts, y1)) AS DOUBLE)
                          / CAST(datediff('microsecond', y0, y1) AS DOUBLE), 1.0) END AS fhi
          FROM bins),
        spans AS (
          SELECT f.fid, f.time_bin, u.t AS tier,
                 (GREATEST(s.xh, s.xl) - s.xl + 1)
               * (GREATEST(s.yh, s.yl) - s.yl + 1)
               * (GREATEST(s.th, s.tl) - s.tl + 1) AS prod
          FROM frac f,
               unnest([1,2,3,4,5,6,7,8,9,10]) AS u(t),
               LATERAL (SELECT POWER(2.0, u.t) AS n) nn,
               LATERAL (SELECT
                 CAST(LEAST(FLOOR(((LEAST(GREATEST(f.minx, -180.0), 180.0) + 180.0) / 360.0) * n), n - 1) AS BIGINT) AS xl,
                 CAST(GREATEST(CEIL(((LEAST(GREATEST(f.maxx, -180.0), 180.0) + 180.0) / 360.0) * n) - 1, 0) AS BIGINT) AS xh,
                 CAST(LEAST(FLOOR(((LEAST(GREATEST(f.miny, -90.0), 90.0) + 180.0) / 360.0) * n), n - 1) AS BIGINT) AS yl,
                 CAST(GREATEST(CEIL(((LEAST(GREATEST(f.maxy, -90.0), 90.0) + 180.0) / 360.0) * n) - 1, 0) AS BIGINT) AS yh,
                 CAST(LEAST(FLOOR(f.flo * n), n - 1) AS BIGINT) AS tl,
                 CAST(GREATEST(CEIL(f.fhi * n) - 1, 0) AS BIGINT) AS th) s),
        chosen AS (
          SELECT fid, time_bin,
                 COALESCE(MAX(tier) FILTER (WHERE prod <= 8), 0) AS tier
          FROM spans GROUP BY fid, time_bin)
        SELECT c.fid, CAST(c.time_bin AS INT) AS time_bin, CAST(c.tier AS TINYINT) AS tier,
               CAST(COALESCE(s.prod, 1) AS BIGINT) AS n_cells
        FROM chosen c
        LEFT JOIN spans s ON s.fid = c.fid AND s.time_bin = c.time_bin AND s.tier = c.tier"""


def _docs_zone_within_oracle() -> str:
    """CONTAINS vs a convex zone is exactly all-vertices-satisfy-every-
    half-plane (vertices inside a convex region imply the hull — and so the
    whole geometry — inside)."""
    docs = f"'{GEO_SF001}/docs.parquet'"
    hp = f"'{GEO_SF001}/zone_halfplanes.parquet'"
    verts_of = (
        "list_transform(string_split({body}, ', '), "
        "p -> struct_pack(x := CAST(string_split(p, ' ')[1] AS DOUBLE), "
        "y := CAST(string_split(p, ' ')[2] AS DOUBLE)))"
    )
    line_body = "replace(replace(wkt, 'LINESTRING (', ''), ')', '')"
    poly_body = "replace(replace(wkt, 'POLYGON ((', ''), '))', '')"
    return f"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(spans, s -> s.kind = 'geo')[1].text AS wkt,
                 string_split(list_filter(spans, s -> s.kind = 'geo')[1].text, ' ')[1] AS gkind
          FROM {docs}),
        dv AS (
          SELECT doc_id, gkind,
                 CASE gkind
                   WHEN 'POINT' THEN [struct_pack(
                     x := TRY_CAST(regexp_extract(wkt, '^POINT \\(([-+0-9.eE]+) ([-+0-9.eE]+)\\)$', 1) AS DOUBLE),
                     y := TRY_CAST(regexp_extract(wkt, '^POINT \\(([-+0-9.eE]+) ([-+0-9.eE]+)\\)$', 2) AS DOUBLE))]
                   WHEN 'LINESTRING' THEN {verts_of.format(body=line_body)}
                   ELSE {verts_of.format(body=poly_body)}
                 END AS verts
          FROM d)
        SELECT v.doc_id, z.zone_id, v.gkind
        FROM dv v, (SELECT DISTINCT zone_id FROM {hp}) z
        WHERE NOT EXISTS (
          SELECT 1 FROM {hp} q
          WHERE q.zone_id = z.zone_id
            AND len(list_filter(v.verts, p -> q.a * p.x + q.b * p.y > q.c)) > 0)"""


def _s2_oracle() -> str:
    from geowave_spark.operators.indexing import s2_bins_sql

    return f"""
        SELECT s2_face, s2_ib, s2_jb,
               CAST(count(*) AS BIGINT) AS n, MIN(fid) AS first_fid
        FROM '{GEO_SF001}/points.parquet' p,
        {s2_bins_sql("p.lon", "p.lat", S2_BITS)}
        GROUP BY s2_face, s2_ib, s2_jb"""


def _hex_oracle() -> str:
    from geowave_spark.operators.indexing import hex_bins_sql

    return f"""
        SELECT hex_q, hex_r,
               CAST(count(*) AS BIGINT) AS n, MIN(fid) AS first_fid
        FROM '{GEO_SF001}/points.parquet' p,
        {hex_bins_sql("p.lon", "p.lat", HEX_RES)}
        GROUP BY hex_q, hex_r"""


def _raster_oracle(pyramid: bool = False) -> str:
    """Independent SQL re-derivation of the raster pipeline: tier selection
    (coarsest cell <= tile world size; with ``pyramid`` also every coarser
    level while one tile holds the span), bbox->bin spans with the engine's
    edge rules, nearest-neighbor resample with the identical FP expressions,
    and the latest-wins merge as ARG_MAX over non-nodata contributions."""
    from geowave_spark.datagen import ensure_coverages
    from geowave_spark.operators.raster import NODATA, TILE_SIZE, _REL_EPS

    ensure_coverages("sf0.01")
    g = GEO_SF001
    tiers = "[0,1,2,3,4,5,6,7,8,9,10,11,13,18,31]"
    ts = TILE_SIZE
    nd = NODATA
    if pyramid:
        tiered_cte = f"""
        full_t AS (
          SELECT c.*, COALESCE((
            SELECT MIN(t) FROM unnest({tiers}) AS u(t)
            WHERE 360.0 / POWER(2.0, t) <= c.tworld * (1.0 + {_REL_EPS!r})), 31) AS full_tier
          FROM cov c),
        tiered AS (
          SELECT c.* EXCLUDE (full_tier), u.t AS tier
          FROM full_t c, unnest({tiers}) AS u(t)
          WHERE u.t = c.full_tier
             OR (u.t < c.full_tier
                 AND (360.0 / POWER(2.0, u.t)) / c.tworld
                     <= GREATEST(c.width, c.height) / {ts}.0)),"""
    else:
        tiered_cte = f"""
        tiered AS (
          SELECT c.*, COALESCE((
            SELECT MIN(t) FROM unnest({tiers}) AS u(t)
            WHERE 360.0 / POWER(2.0, t) <= c.tworld * (1.0 + {_REL_EPS!r})), 31) AS tier
          FROM cov c),"""
    return f"""
        WITH cov AS (
          SELECT coverage_id, minx, miny, maxx, maxy, width, height, pixels,
                 LEAST((maxx - minx) * {ts} / width, (maxy - miny) * {ts} / height) AS tworld
          FROM '{g}/coverages.parquet'),{tiered_cte}
        binned AS (
          SELECT *, POWER(2.0, tier) AS bins, 360.0 / POWER(2.0, tier) AS cellw,
            CAST(LEAST(FLOOR(((LEAST(GREATEST(minx, -180.0), 180.0) + 180.0) / 360.0) * POWER(2.0, tier)), POWER(2.0, tier) - 1) AS BIGINT) AS xlo,
            CAST(GREATEST(CEIL(((LEAST(GREATEST(maxx, -180.0), 180.0) + 180.0) / 360.0) * POWER(2.0, tier)) - 1, 0) AS BIGINT) AS xhi,
            CAST(LEAST(FLOOR(((LEAST(GREATEST(miny, -90.0), 90.0) + 180.0) / 360.0) * POWER(2.0, tier)), POWER(2.0, tier) - 1) AS BIGINT) AS ylo,
            CAST(GREATEST(CEIL(((LEAST(GREATEST(maxy, -90.0), 90.0) + 180.0) / 360.0) * POWER(2.0, tier)) - 1, 0) AS BIGINT) AS yhi
          FROM tiered),
        cells AS (
          SELECT b.*, gx.cx, gy.cy
          FROM binned b,
               LATERAL unnest(range(b.xlo, GREATEST(b.xhi, b.xlo) + 1)) AS gx(cx),
               LATERAL unnest(range(b.ylo, GREATEST(b.yhi, b.ylo) + 1)) AS gy(cy)),
        px AS (
          SELECT coverage_id, tier, cx, cy, p,
                 CASE WHEN col >= 0 AND col < width AND row >= 0 AND row < height
                      THEN pixels[row * width + col + 1] ELSE {nd} END AS val
          FROM (
            SELECT c.*, u.p,
              CAST(FLOOR(((((c.cx / c.bins) * 360.0 - 180.0)
                   + ((CAST(u.p % {ts} AS DOUBLE) + 0.5) * c.cellw) / {ts}) - c.minx)
                   / ((c.maxx - c.minx) / c.width)) AS BIGINT) AS col,
              CAST(FLOOR(((((c.cy / c.bins) * 360.0 - 180.0)
                   + ((CAST(u.p // {ts} AS DOUBLE) + 0.5) * c.cellw) / {ts}) - c.miny)
                   / ((c.maxy - c.miny) / c.height)) AS BIGINT) AS row
            FROM cells c, LATERAL unnest(range(0, {ts * ts})) AS u(p))),
        merged AS (
          SELECT tier, cx, cy, p,
                 ARG_MAX(val, coverage_id) FILTER (WHERE val <> {nd}) AS mval
          FROM px GROUP BY tier, cx, cy, p),
        srcs AS (
          SELECT tier, cx, cy, CAST(COUNT(DISTINCT coverage_id) AS BIGINT) AS n_sources
          FROM px GROUP BY tier, cx, cy)
        SELECT CAST(m.tier AS INT) AS tier, m.cx AS xb, m.cy AS yb, s.n_sources,
               CAST(SUM(CASE WHEN m.mval IS NULL THEN 0 ELSE m.mval END) AS BIGINT) AS checksum,
               CAST(SUM(CASE WHEN m.mval IS NULL THEN 1 ELSE 0 END) AS INT) AS n_nodata
        FROM merged m JOIN srcs s USING (tier, cx, cy)
        GROUP BY m.tier, m.cx, m.cy, s.n_sources"""


def _docs_polygon_oracle() -> str:
    """Exact per-kind intersects in pure SQL: point range check; segment and
    convex-polygon vs box via the separating-axis test (same formulas, same
    op order as geometry/predicates.py).  Data rings are CCW AND convex by
    construction (datagen `_convex_ring`: ascending angles) — SAT on edge
    normals is exact only under that convexity; the engine itself now checks
    `ring_is_convex` and routes concave rings through the general even-odd
    polygon-polygon test, which this SQL twin deliberately does not model."""
    docs = f"'{GEO_SF001}/docs.parquet'"
    minx, miny, maxx, maxy = BOX
    # segment i spans verts[i] -> verts[i+1] (1-indexed DuckDB lists)
    sa = "(-(verts[i+1].y - verts[i].y))"
    sb = "(verts[i+1].x - verts[i].x)"
    sc = f"({sa} * verts[i].x + {sb} * verts[i].y)"
    sprojs = ", ".join(
        f"{sa} * ({X}) + {sb} * ({Y})"
        for X, Y in ((minx, miny), (minx, maxy), (maxx, miny), (maxx, maxy))
    )
    seg_sat = f"""len(list_filter(range(1, len(verts)), i ->
        GREATEST(verts[i].x, verts[i+1].x) >= {minx} AND LEAST(verts[i].x, verts[i+1].x) <= {maxx}
        AND GREATEST(verts[i].y, verts[i+1].y) >= {miny} AND LEAST(verts[i].y, verts[i+1].y) <= {maxy}
        AND LEAST({sprojs}) <= {sc} AND {sc} <= GREATEST({sprojs}))) > 0"""
    # polygon edge i: CCW half-plane a*x + b*y <= c is the interior side
    pa = "(verts[i+1].y - verts[i].y)"
    pb = "(-(verts[i+1].x - verts[i].x))"
    pc = f"({pa} * verts[i].x + {pb} * verts[i].y)"
    pprojs = ", ".join(
        f"{pa} * ({X}) + {pb} * ({Y})"
        for X, Y in ((minx, miny), (minx, maxy), (maxx, miny), (maxx, maxy))
    )
    poly_sat = f"""
        len(list_filter(verts, v -> v.x >= {minx})) > 0 AND len(list_filter(verts, v -> v.x <= {maxx})) > 0
        AND len(list_filter(verts, v -> v.y >= {miny})) > 0 AND len(list_filter(verts, v -> v.y <= {maxy})) > 0
        AND len(list_filter(range(1, len(verts)), i -> LEAST({pprojs}) > {pc})) = 0"""
    verts_expr = (
        "list_transform(string_split({body}, ', '), "
        "p -> struct_pack(x := CAST(string_split(p, ' ')[1] AS DOUBLE), "
        "y := CAST(string_split(p, ' ')[2] AS DOUBLE)))"
    )
    line_body = "replace(replace(wkt, 'LINESTRING (', ''), ')', '')"
    poly_body = "replace(replace(wkt, 'POLYGON ((', ''), '))', '')"
    return f"""
        WITH d AS (
          SELECT doc_id, CAST(len(spans) AS INT) AS n_spans,
                 list_filter(spans, s -> s.kind = 'geo')[1].text AS wkt,
                 string_split(list_filter(spans, s -> s.kind = 'geo')[1].text, ' ')[1] AS gkind
          FROM {docs}),
        pts AS (
          SELECT doc_id, n_spans, gkind FROM d,
          LATERAL (SELECT
            TRY_CAST(regexp_extract(wkt, '^POINT \\(([-+0-9.eE]+) ([-+0-9.eE]+)\\)$', 1) AS DOUBLE) AS lon,
            TRY_CAST(regexp_extract(wkt, '^POINT \\(([-+0-9.eE]+) ([-+0-9.eE]+)\\)$', 2) AS DOUBLE) AS lat)
          WHERE gkind = 'POINT'
            AND lon >= {minx} AND lon <= {maxx} AND lat >= {miny} AND lat <= {maxy}),
        lines AS (
          SELECT doc_id, n_spans, gkind FROM (
            SELECT doc_id, n_spans, gkind, {verts_expr.format(body=line_body)} AS verts
            FROM d WHERE gkind = 'LINESTRING')
          WHERE {seg_sat}),
        polys AS (
          SELECT doc_id, n_spans, gkind FROM (
            SELECT doc_id, n_spans, gkind, {verts_expr.format(body=poly_body)} AS verts
            FROM d WHERE gkind = 'POLYGON')
          WHERE {poly_sat})
        SELECT * FROM pts UNION ALL SELECT * FROM lines UNION ALL SELECT * FROM polys"""


def _kmeans_oracle() -> str:
    """Unrolled Lloyd iterations as a DuckDB CTE chain — same deterministic
    init (k smallest md5 hashes), same tie-breaks, same IEEE products.
    Early convergence in the engine is a no-op under unrolling (converged
    centroids stop moving, so extra iterations repeat the assignment)."""
    from geowave_spark.functions.text import md5_long_sql

    h = md5_long_sql("fid")
    parts = [
        f"sub AS (SELECT fid, lon, lat FROM '{GEO_SF001}/points.parquet' WHERE {h} % 4 = 0)",
        f"""c0 AS (
          SELECT ROW_NUMBER() OVER (ORDER BY h) - 1 AS cluster, lon AS cx, lat AS cy
          FROM (SELECT {h} AS h, lon, lat FROM sub ORDER BY 1 LIMIT {KMEANS_K}))""",
    ]
    for i in range(1, KMEANS_ITERS + 1):
        parts.append(
            f"""a{i} AS (
          SELECT fid, lon, lat, cluster FROM (
            SELECT s.fid, s.lon, s.lat, c.cluster,
                   ROW_NUMBER() OVER (PARTITION BY s.fid ORDER BY
                     (s.lon - c.cx) * (s.lon - c.cx) + (s.lat - c.cy) * (s.lat - c.cy),
                     c.cluster) AS rn
            FROM sub s CROSS JOIN c{i - 1} c) WHERE rn = 1)"""
        )
        if i < KMEANS_ITERS:
            parts.append(
                f"""c{i} AS (
          SELECT c.cluster, COALESCE(m.cx, c.cx) AS cx, COALESCE(m.cy, c.cy) AS cy
          FROM c{i - 1} c LEFT JOIN (
            SELECT cluster, AVG(lon) AS cx, AVG(lat) AS cy FROM a{i} GROUP BY cluster) m
          USING (cluster))"""
            )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT CAST(cluster AS INT) AS cluster, CAST(count(*) AS BIGINT) AS n
        FROM a{KMEANS_ITERS} GROUP BY cluster"""
    )


def _dbscan_members_cte() -> str:
    """Shared WITH RECURSIVE prologue: DBSCAN membership (id, label, is_core)
    via eps self-join edges, degree-thresholded cores, transitive-closure
    reachability (min reachable core id = component label), border points
    attached to their minimum core neighbor's label."""
    from geowave_spark.functions.text import md5_long_sql

    h = md5_long_sql("fid")
    eps2 = repr(DBSCAN_EPS * DBSCAN_EPS)  # same float literal the engine uses
    return f"""WITH RECURSIVE
        sub AS (SELECT fid, lon, lat FROM '{GEO_SF001}/points.parquet' WHERE {h} % 5 = 0),
        edges AS (
          SELECT a.fid AS a, b.fid AS b
          FROM sub a JOIN sub b
            ON a.fid <> b.fid
           AND (a.lon - b.lon) * (a.lon - b.lon)
             + (a.lat - b.lat) * (a.lat - b.lat) <= {eps2}),
        core AS (SELECT a AS id FROM edges GROUP BY a HAVING count(*) >= {DBSCAN_MIN_PTS - 1}),
        cc AS (SELECT e.a, e.b FROM edges e
               WHERE e.a IN (SELECT id FROM core) AND e.b IN (SELECT id FROM core)),
        reach(id, r) AS (
          SELECT id, id FROM core
          UNION
          SELECT cc.a, reach.r FROM cc JOIN reach ON reach.id = cc.b),
        labels AS (SELECT id, MIN(r) AS label FROM reach GROUP BY id),
        border AS (
          SELECT e.a AS id, MIN(e.b) AS attach FROM edges e
          WHERE e.b IN (SELECT id FROM core) AND e.a NOT IN (SELECT id FROM core)
          GROUP BY e.a),
        members AS (
          SELECT id, label, TRUE AS is_core FROM labels
          UNION ALL
          SELECT b.id, l.label, FALSE AS is_core
          FROM border b JOIN labels l ON l.id = b.attach)"""


def _dbscan_oracle() -> str:
    return (
        _dbscan_members_cte()
        + """
        SELECT label AS cluster,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(SUM(CASE WHEN is_core THEN 1 ELSE 0 END) AS BIGINT) AS n_core
        FROM members GROUP BY label"""
    )


def _st_dbscan_oracle() -> str:
    """ST-DBSCAN twin of :func:`_dbscan_oracle`: identical WITH RECURSIVE
    reachability, edge predicate extended with the temporal epsilon."""
    from geowave_spark.functions.text import md5_long_sql

    h = md5_long_sql("fid")
    eps2 = repr(ST_DBSCAN_EPS_S * ST_DBSCAN_EPS_S)
    tau_u = ST_DBSCAN_EPS_T_S * 1_000_000
    return f"""WITH RECURSIVE
        sub AS (SELECT fid, lon, lat, epoch_us(event_ts) AS tu
                FROM '{GEO_SF001}/points.parquet' WHERE {h} % 5 = 0),
        edges AS (
          SELECT a.fid AS a, b.fid AS b
          FROM sub a JOIN sub b
            ON a.fid <> b.fid
           AND abs(a.tu - b.tu) <= {tau_u}
           AND (a.lon - b.lon) * (a.lon - b.lon)
             + (a.lat - b.lat) * (a.lat - b.lat) <= {eps2}),
        core AS (SELECT a AS id FROM edges GROUP BY a HAVING count(*) >= {DBSCAN_MIN_PTS - 1}),
        cc AS (SELECT e.a, e.b FROM edges e
               WHERE e.a IN (SELECT id FROM core) AND e.b IN (SELECT id FROM core)),
        reach(id, r) AS (
          SELECT id, id FROM core
          UNION
          SELECT cc.a, reach.r FROM cc JOIN reach ON reach.id = cc.b),
        labels AS (SELECT id, MIN(r) AS label FROM reach GROUP BY id),
        border AS (
          SELECT e.a AS id, MIN(e.b) AS attach FROM edges e
          WHERE e.b IN (SELECT id FROM core) AND e.a NOT IN (SELECT id FROM core)
          GROUP BY e.a),
        members AS (
          SELECT id, label, TRUE AS is_core FROM labels
          UNION ALL
          SELECT b.id, l.label, FALSE AS is_core
          FROM border b JOIN labels l ON l.id = b.attach)
        SELECT label AS cluster,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(SUM(CASE WHEN is_core THEN 1 ELSE 0 END) AS BIGINT) AS n_core
        FROM members GROUP BY label"""


def _dbscan_hulls_oracle() -> str:
    """Independent hull-vertex count: a member is a strict convex-hull vertex
    of its cluster iff the largest circular gap between directions to its
    co-members exceeds pi (equivalently: all co-members fit in an open
    half-plane through it).  Collinear boundary points (gap == pi exactly)
    are excluded — matching the engine's strict monotone chain."""
    return (
        _dbscan_members_cte()
        + """,
        mcoords AS (SELECT m.id, m.label, s.lon, s.lat
                    FROM members m JOIN sub s ON s.fid = m.id),
        pairs AS (
          SELECT p.label, p.id, atan2(q.lat - p.lat, q.lon - p.lon) AS th
          FROM mcoords p JOIN mcoords q ON p.label = q.label AND p.id <> q.id),
        gapped AS (
          SELECT label, id, th,
                 th - LAG(th) OVER (PARTITION BY label, id ORDER BY th) AS gap
          FROM pairs),
        span AS (
          SELECT label, id,
                 GREATEST(COALESCE(MAX(gap), 0), 2 * PI() - (MAX(th) - MIN(th))) AS circgap
          FROM gapped GROUP BY label, id),
        verts AS (SELECT label, count(*) AS n_vertices FROM span
                  WHERE circgap > PI() GROUP BY label),
        sizes AS (SELECT label, count(*) AS n_points FROM members GROUP BY label)
        SELECT s.label AS cluster,
               CAST(s.n_points AS BIGINT) AS n_points,
               CAST(v.n_vertices AS BIGINT) AS n_vertices
        FROM sizes s JOIN verts v ON v.label = s.label"""
    )


def _dbscan_concave_hulls_oracle() -> str:
    """Invariant oracle for the Park-Oh concave hull: the cluster structure
    (label -> member count) re-derived independently via the recursive-CTE
    DBSCAN, and the three hull invariants asserted TRUE — the Spark side
    self-verifies them per cluster with independent ray-cast/area kernels
    (hull.py group_concave_hull_invariants), so any violation hash-mismatches
    here."""
    return (
        _dbscan_members_cte()
        + """
        SELECT label AS cluster,
               CAST(count(*) AS BIGINT) AS n_points,
               TRUE AS members_inside,
               TRUE AS vertices_are_members,
               TRUE AS area_le_convex
        FROM members GROUP BY label"""
    )


def _cms_oracle() -> str:
    from geowave_spark.functions.text import md5_long_sql

    pts = f"'{GEO_SF001}/points.parquet'"
    hb = md5_long_sql("(d.depth || ':' || category)")
    hc = md5_long_sql("(d.depth || ':' || c.category)")
    return f"""
        WITH hashed AS (
          SELECT category, d.depth, {hb} % {CMS_WIDTH} AS bucket
          FROM {pts}, (SELECT unnest(range(0, {CMS_DEPTH})) AS depth) d),
        sketch AS (SELECT depth, bucket, count(*) AS counter
                   FROM hashed GROUP BY depth, bucket),
        cats AS (SELECT category, CAST(count(*) AS BIGINT) AS n_exact
                 FROM {pts} GROUP BY category),
        cat_buckets AS (
          SELECT c.category, c.n_exact, d.depth, {hc} % {CMS_WIDTH} AS bucket
          FROM cats c, (SELECT unnest(range(0, {CMS_DEPTH})) AS depth) d)
        SELECT category, n_exact, CAST(MIN(s.counter) AS BIGINT) AS n_est
        FROM cat_buckets cb JOIN sketch s USING (depth, bucket)
        GROUP BY category, n_exact"""


def build_oracles() -> dict[str, str]:
    from geowave_spark.operators.hotspot import (
        colocation_pi_sql,
        cross_k_sql,
        emerging_hotspots_sql,
        gi_star_sql,
        knox_test_sql,
        morans_i_sql,
        ripley_k_sql,
    )
    from geowave_spark.operators.trajectory import (
        od_flows_sql,
        hausdorff_join_sql,
        resample_tracks_sql,
        simplify_tracks_sql,
        staypoints_sql,
        track_stats_sql,
    )
    from geowave_spark.operators.cotravel import (
        convoy_sql,
        cotravel_sql,
        moving_clusters_sql,
    )
    from geowave_spark.operators.contour import contour_polylines_sql, marching_squares_sql
    from geowave_spark.operators.search import bm25_topk_sql, tfidf_top_terms_sql
    from geowave_spark.operators.pointstats import clark_evans_sql, std_ellipse_sql
    from geowave_spark.operators.quadtree import adaptive_quadtree_sql
    from geowave_spark.operators.regionize import region_label_sql
    from geowave_spark.operators.collocate import pmi_collocations_sql
    from geowave_spark.operators.graph import sssp_bounded_sql
    from geowave_spark.operators.hotspot import cell_diversity_sql, local_morans_i_sql
    from geowave_spark.operators.periodicity import hourly_periodicity_sql
    from geowave_spark.operators.trajectory import track_bearing_stats_sql
    from geowave_spark.operators.mapmatch import snap_join_sql
    from geowave_spark.operators.terrain import horn_terrain_sql
    from geowave_spark.operators.interpolate import idw_grid_sql
    from geowave_spark.operators.geofence import geofence_transitions_sql
    from geowave_spark.operators.kde import kde_oracle_sql
    from geowave_spark.operators.kde_compare import kde_comparison_oracle_sql
    from geowave_spark.queries_text import build_text_oracles

    g = GEO_SF001
    pts = f"'{g}/points.parquet'"
    zones = f"'{g}/zones.parquet'"
    hp = f"'{g}/zone_halfplanes.parquet'"
    tracks = f"'{g}/tracks.parquet'"
    docs = f"'{g}/docs.parquet'"
    poly_hp = _halfplanes_sql_literal(_polygon_filter_wkt())

    return {
        **build_text_oracles(),
        "spatial_box_query": f"""
            SELECT fid, lon, lat, magnitude FROM {pts}
            WHERE lon >= {BOX[0]} AND lon <= {BOX[2]} AND lat >= {BOX[1]} AND lat <= {BOX[3]}
        """,
        "spatial_box_temporal_query": f"""
            SELECT fid, lon, lat, epoch_ms(event_ts) AS event_ms FROM {pts}
            WHERE lon >= {BOX[0]} AND lon <= {BOX[2]} AND lat >= {BOX[1]} AND lat <= {BOX[3]}
              AND event_ts >= TIMESTAMP '{TS_LO}' AND event_ts < TIMESTAMP '{TS_HI}'
        """,
        "spatial_polygon_query": f"""
            SELECT p.fid, p.lon, p.lat FROM {pts} p
            WHERE NOT EXISTS (
              SELECT 1 FROM {poly_hp} WHERE hp.a * p.lon + hp.b * p.lat > hp.c)
        """,
        "dateline_box_query": f"""
            SELECT fid, lon, lat FROM {pts}
            WHERE (lon >= 175.0 OR lon <= -175.0) AND lat >= -20.0 AND lat <= 20.0
        """,
        "pip_join": f"""
            SELECT p.fid, z.zone_id, p.lon, p.lat
            FROM {pts} p, (SELECT DISTINCT zone_id FROM {hp}) z
            WHERE NOT EXISTS (
              SELECT 1 FROM {hp} h
              WHERE h.zone_id = z.zone_id AND h.a * p.lon + h.b * p.lat > h.c)
        """,
        "pip_join_tiered": f"""
            SELECT p.fid, z.zone_id, p.lon, p.lat
            FROM {pts} p, (SELECT DISTINCT zone_id FROM {hp}) z
            WHERE NOT EXISTS (
              SELECT 1 FROM {hp} h
              WHERE h.zone_id = z.zone_id AND h.a * p.lon + h.b * p.lat > h.c)
        """,
        "pip_join_hex": f"""
            SELECT p.fid, z.zone_id, p.lon, p.lat
            FROM {pts} p, (SELECT DISTINCT zone_id FROM {hp}) z
            WHERE NOT EXISTS (
              SELECT 1 FROM {hp} h
              WHERE h.zone_id = z.zone_id AND h.a * p.lon + h.b * p.lat > h.c)
        """,
        "zonal_stats": f"""
            SELECT z.zone_id,
                   CAST(count(*) AS BIGINT) AS n_points,
                   SUM(p.magnitude) AS sum_magnitude,
                   MIN(p.lat) AS min_lat,
                   MAX(p.lat) AS max_lat
            FROM {pts} p, (SELECT DISTINCT zone_id FROM {hp}) z
            WHERE NOT EXISTS (
              SELECT 1 FROM {hp} h
              WHERE h.zone_id = z.zone_id AND h.a * p.lon + h.b * p.lat > h.c)
            GROUP BY z.zone_id
        """,
        "tracks_contains_box": f"""
            SELECT fid, length_km FROM (
              SELECT fid, length_km,
                     list_transform(
                       string_split(
                         replace(replace(geom_wkt, 'LINESTRING (', ''), ')', ''), ', '),
                       p -> struct_pack(
                         x := CAST(string_split(p, ' ')[1] AS DOUBLE),
                         y := CAST(string_split(p, ' ')[2] AS DOUBLE))) AS verts
              FROM {tracks})
            WHERE len(list_filter(verts,
                  v -> v.x < {CONTAINS_BOX[0]} OR v.x > {CONTAINS_BOX[2]}
                    OR v.y < {CONTAINS_BOX[1]} OR v.y > {CONTAINS_BOX[3]})) = 0
        """,
        "docs_box_query": f"""
            SELECT doc_id, lon, lat, n_spans FROM (
              SELECT doc_id,
                     CAST(len(spans) AS INT) AS n_spans,
                     list_filter(spans, s -> s.kind = 'geo')[1].text AS wkt
              FROM {docs}),
            LATERAL (SELECT
               TRY_CAST(regexp_extract(wkt, '^POINT \\(([-+0-9.eE]+) ([-+0-9.eE]+)\\)$', 1) AS DOUBLE) AS lon,
               TRY_CAST(regexp_extract(wkt, '^POINT \\(([-+0-9.eE]+) ([-+0-9.eE]+)\\)$', 2) AS DOUBLE) AS lat)
            WHERE wkt LIKE 'POINT%'
              AND lon >= {BOX[0]} AND lon <= {BOX[2]} AND lat >= {BOX[1]} AND lat <= {BOX[3]}
        """,
        "spans_preserved": f"""
            SELECT doc_id,
                   CAST(len(spans) AS INT) AS n_spans,
                   array_to_string(
                     list_transform(spans, s ->
                       concat_ws(chr(31), s.kind, s.text, s.media_ref, CAST(s.offset AS VARCHAR))),
                     chr(30)) AS span_sig
            FROM {docs}
        """,
        "subsample_resolution": f"""
            WITH binned AS (
              SELECT fid,
                     CAST(GREATEST(CEIL(((lon + 180.0) / 360.0) * 2048) - 1, 0) AS BIGINT) AS xb,
                     CAST(GREATEST(CEIL(((LEAST(GREATEST(lat, -90.0), 90.0) + 180.0) / 360.0) * 2048) - 1, 0) AS BIGINT) AS yb
              FROM {pts})
            SELECT MIN(fid) AS fid, CAST(count(*) AS BIGINT) AS n_in_cell
            FROM binned GROUP BY xb, yb
        """,
        "subsample_zorder": f"""
            WITH binned AS (
              SELECT fid,
                     CAST(GREATEST(CEIL(((lon + 180.0) / 360.0) * 2048) - 1, 0) AS BIGINT) AS xb,
                     CAST(GREATEST(CEIL(((LEAST(GREATEST(lat, -90.0), 90.0) + 180.0) / 360.0) * 2048) - 1, 0) AS BIGINT) AS yb
              FROM {pts})
            SELECT MIN(fid) AS fid, CAST(count(*) AS BIGINT) AS n_in_cell
            FROM binned GROUP BY xb, yb
        """,
        "knn_join": f"""
            SELECT qid, fid, dist_sq, rank FROM (
              SELECT q.fid AS qid, p.fid AS fid,
                     (p.lon - q.lon) * (p.lon - q.lon) + (p.lat - q.lat) * (p.lat - q.lat) AS dist_sq,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.fid
                       ORDER BY (p.lon - q.lon) * (p.lon - q.lon) + (p.lat - q.lat) * (p.lat - q.lat),
                                p.fid) AS rank
              FROM (SELECT * FROM {pts} WHERE fid LIKE '%00') q, {pts} p
              WHERE (p.lon - q.lon) * (p.lon - q.lon) + (p.lat - q.lat) * (p.lat - q.lat)
                    <= {KNN_DIST * KNN_DIST})
            WHERE rank <= {KNN_K}
        """,
        "kde_tiles": kde_oracle_sql(
            f"{g}/points.parquet", KDE_MIN_LEVEL, KDE_MAX_LEVEL, KDE_TILE_SIZE
        ),
        # resize(4 -> 2) must equal the pyramid computed directly at tileSize
        # 2 on levels shifted by +1 (same post grid)
        "kde_resize": kde_oracle_sql(
            f"{g}/points.parquet", KDE_MIN_LEVEL + 1, KDE_MAX_LEVEL + 1, KDE_TILE_SIZE // 2
        ),
        "kde_comparison": kde_comparison_oracle_sql(
            f"{g}/points.parquet", KDE_MIN_LEVEL, KDE_MAX_LEVEL, KDE_TILE_SIZE
        ),
        # byte order must equal native value order — the oracle never sees
        # the lexicoder, it ranks by the raw double
        "lexicoder_rank": f"""
            SELECT fid, ROW_NUMBER() OVER (ORDER BY magnitude, fid) AS lex_rank
            FROM '{g}/points.parquet'
        """,
        # visible set derived BY HAND against auths {alpha, bravo} (comments
        # in VIS_EXPRS) — independent of the engine's expression parser
        "visibility_filter": f"""
            WITH v AS (
              SELECT fid, category,
                     (['alpha', 'bravo', 'charlie', 'alpha&bravo',
                       'alpha&charlie', 'alpha|charlie',
                       'delta|(charlie&bravo)',
                       '(alpha|charlie)&(bravo|delta)'])
                     [CAST(SUBSTR(fid, 4) AS INT) % 8 + 1] AS vis
              FROM '{g}/points.parquet')
            SELECT fid, category, vis FROM v
            WHERE vis IN ('alpha', 'bravo', 'alpha&bravo', 'alpha|charlie',
                          '(alpha|charlie)&(bravo|delta)')
        """,
        "histogram_fixed_bins": f"""
            SELECT CAST(FLOOR(magnitude / 10) AS BIGINT) AS bin,
                   count(*) AS n,
                   MIN(magnitude) AS bin_min,
                   MAX(magnitude) AS bin_max
            FROM {pts} GROUP BY 1
        """,
        "percentile_by_category": f"""
            SELECT category,
                   quantile_cont(magnitude, 0.25) AS p25,
                   quantile_cont(magnitude, 0.5) AS p50,
                   quantile_cont(magnitude, 0.9) AS p90
            FROM {pts} GROUP BY category
        """,
        "distinct_count_stats": """
            SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "cql_attribute_filter": f"""
            SELECT fid, lon, lat, magnitude, category FROM {pts}
            WHERE magnitude >= 50 AND category IN ('cat1', 'cat3')
              AND lon BETWEEN -80 AND -60
        """,
        "text_like_query": """
            SELECT doc_id, n_chars FROM documents WHERE text LIKE '%table value%'
        """,
        "spatiotemporal_bins": f"""
            WITH binned AS (
              SELECT date_part('year', event_ts) AS year,
                     CAST(GREATEST(CEIL(((lon + 180.0) / 360.0) * 2048) - 1, 0) AS BIGINT) AS xb,
                     CAST(GREATEST(CEIL(((LEAST(GREATEST(lat, -90.0), 90.0) + 180.0) / 360.0) * 2048) - 1, 0) AS BIGINT) AS yb
              FROM {pts}),
            per_cell AS (
              SELECT year, xb, yb, count(*) AS n FROM binned GROUP BY year, xb, yb)
            SELECT CAST(year AS INT) AS year,
                   count(*) AS n_cells,
                   CAST(SUM(n) AS BIGINT) AS n_points,
                   MAX(n) AS max_cell_points
            FROM per_cell GROUP BY year
        """,
        "hot_cell_salting": f"""
            WITH binned AS (
              SELECT fid,
                     CAST(GREATEST(CEIL(((lon + 180.0) / 360.0) * 128) - 1, 0) AS BIGINT) AS xb,
                     CAST(GREATEST(CEIL(((LEAST(GREATEST(lat, -90.0), 90.0) + 180.0) / 360.0) * 128) - 1, 0) AS BIGINT) AS yb
              FROM {pts})
            SELECT MIN(fid) AS rep_fid, count(*) AS n_in_cell,
                   count(*) >= 500 AS is_hot
            FROM binned GROUP BY xb, yb
        """,
        "tracks_box_temporal": f"""
            SELECT fid, length_km FROM (
              SELECT fid, length_km, start_ts, end_ts,
                     list_transform(
                       string_split(
                         replace(replace(geom_wkt, 'LINESTRING (', ''), ')', ''), ', '),
                       p -> struct_pack(
                         x := CAST(string_split(p, ' ')[1] AS DOUBLE),
                         y := CAST(string_split(p, ' ')[2] AS DOUBLE))) AS verts
              FROM '{GEO_SF001}/tracks.parquet')
            WHERE len(list_filter(verts,
                  v -> v.x < {CONTAINS_BOX[0]} OR v.x > {CONTAINS_BOX[2]}
                    OR v.y < {CONTAINS_BOX[1]} OR v.y > {CONTAINS_BOX[3]})) = 0
              AND start_ts < TIMESTAMP '{TS_HI}' AND end_ts >= TIMESTAMP '{TS_LO}'
        """,
        "docs_extent_query": f"""
            WITH g AS (
              SELECT doc_id, CAST(len(spans) AS INT) AS n_spans,
                     list_transform(
                       regexp_extract_all(list_filter(spans, s -> s.kind = 'geo')[1].text,
                                          '[-+]?[0-9]+(\\.[0-9]+)?([eE][-+]?[0-9]+)?'),
                       c -> CAST(c AS DOUBLE)) AS coords
              FROM '{GEO_SF001}/docs.parquet'),
            b AS (
              SELECT doc_id, n_spans,
                     list_aggregate(list_transform(range(1, len(coords) + 1, 2), i -> coords[i]), 'min') AS minx,
                     list_aggregate(list_transform(range(1, len(coords) + 1, 2), i -> coords[i]), 'max') AS maxx,
                     list_aggregate(list_transform(range(2, len(coords) + 1, 2), i -> coords[i]), 'min') AS miny,
                     list_aggregate(list_transform(range(2, len(coords) + 1, 2), i -> coords[i]), 'max') AS maxy
              FROM g)
            SELECT doc_id, n_spans, minx, maxy FROM b
            WHERE minx <= {BOX[2]} AND maxx >= {BOX[0]}
              AND miny <= {BOX[3]} AND maxy >= {BOX[1]}
        """,
        "events_sessionization": """
            WITH marked AS (
              SELECT user_id, ts,
                     CASE WHEN LAG(ts) OVER w IS NULL
                            OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            sess AS (
              SELECT user_id, ts,
                     SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
              FROM marked)
            SELECT user_id, MIN(ts) AS session_start,
                   count(*) AS n_events
            FROM sess GROUP BY user_id, sid
        """,
        "lineitem_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
                   CAST(count(*) AS BIGINT) AS count_order,
                   MIN(l_extendedprice) AS min_price,
                   MAX(l_extendedprice) AS max_price
            FROM lineitem
            WHERE l_shipdate <= '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "events_rollup_cascade": """
            SELECT 'hour' AS level, date_trunc('hour', ts) AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   MIN(value) AS min_value, MAX(value) AS max_value
            FROM events GROUP BY 2
            UNION ALL
            SELECT 'day', date_trunc('day', ts),
                   CAST(count(*) AS BIGINT), MIN(value), MAX(value)
            FROM events GROUP BY 2
            UNION ALL
            SELECT 'week', date_trunc('week', ts),
                   CAST(count(*) AS BIGINT), MIN(value), MAX(value)
            FROM events GROUP BY 2
        """,
        "events_asof_join": """
            SELECT p.event_id,
                   b.event_id AS asof_event_id,
                   b.value AS asof_value
            FROM (SELECT * FROM events WHERE event_id % 20 = 0) p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
              ON p.user_id = b.user_id AND p.ts >= b.ts
        """,
        "points_track_interval_join": f"""
            SELECT p.fid AS point_fid, t.fid AS track_fid
            FROM (SELECT * FROM {pts} WHERE fid LIKE '%0') p, {tracks} t
            WHERE p.event_ts >= t.start_ts AND p.event_ts <= t.end_ts
        """,
        "distance_join": f"""
            SELECT qid, fid, dist_sq FROM (
              SELECT q.fid AS qid, p.fid AS fid,
                     (p.lon - q.lon) * (p.lon - q.lon)
                   + (p.lat - q.lat) * (p.lat - q.lat) AS dist_sq
              FROM (SELECT * FROM {pts} WHERE fid LIKE '%00') q, {pts} p
              WHERE p.fid <> q.fid)
            WHERE dist_sq <= {DIST_JOIN_DEG * DIST_JOIN_DEG!r}
        """,
        "knn_haversine": _knn_haversine_oracle(),
        "knn_geodesic": _knn_haversine_oracle(),
        "docs_polygon_query": _docs_polygon_oracle(),
        # areal CQL = the same SAT arithmetic + the attribute clause
        "cql_docs_bbox": f"""
            SELECT doc_id, n_spans, gkind FROM ({_docs_polygon_oracle()})
            WHERE n_spans BETWEEN 3 AND 6
        """,
        # routed twin: exact refine makes the indexed scan route-invisible
        "cql_areal_routed": f"""
            SELECT doc_id, n_spans, gkind FROM ({_docs_polygon_oracle()})
            WHERE n_spans BETWEEN 3 AND 6
        """,
        "raster_tiling": _raster_oracle(),
        "raster_pyramid": _raster_oracle(pyramid=True),
        # identical oracle by design: the GeoTIFF fixture IS coverages.parquet
        # round-tripped through real TIFF bytes, so oracle-equality proves the
        # georeferencing parse + pixel decode placed everything bit-exactly
        "geotiff_ingest_tiles": _raster_oracle(),
        "s2_cell_counts": _s2_oracle(),
        "hex_cell_counts": _hex_oracle(),
        "geohash_cell_counts": _geohash_oracle(),
        "hotspot_gi_star": gi_star_sql(f"{GEO_SF001}/points.parquet", GI_CELL_DEG),
        "emerging_hotspots": emerging_hotspots_sql(f"{GEO_SF001}/points.parquet", GI_CELL_DEG),
        "track_staypoints": staypoints_sql(f"{GEO_SF001}/tracks.parquet", STAY_RADIUS_DEG, STAY_MIN_RUN),
        "track_od_flows": od_flows_sql(f"{GEO_SF001}/tracks.parquet", f"{GEO_SF001}/zone_halfplanes.parquet"),
        "morans_i": morans_i_sql(f"{GEO_SF001}/points.parquet", GI_CELL_DEG),
        "knox_test": knox_test_sql(
            f"{GEO_SF001}/points.parquet", KNOX_DIST_DEG, KNOX_TAU_MS
        ),
        "ripley_k": ripley_k_sql(f"{GEO_SF001}/points.parquet", RIPLEY_DISTS),
        "colocation_pi": colocation_pi_sql(
            f"{GEO_SF001}/points.parquet", COLOC_D
        ),
        "terrain_slope": horn_terrain_sql(f"{GEO_SF001}/points.parquet", 1.0),
        "colocation_cross_k": cross_k_sql(
            f"{GEO_SF001}/points.parquet", *CROSS_K_CATS, RIPLEY_DISTS
        ),
        "idw_grid": idw_grid_sql(f"{GEO_SF001}/points.parquet", GI_CELL_DEG),
        "track_stats": track_stats_sql(f"{GEO_SF001}/tracks.parquet"),
        # identical oracle by design: the 4676 fixture IS tracks.parquet
        # serialized as TrackMessage XML, so oracle-equality proves the
        # decoder-semantics parse + reassembly is byte-identical
        "stanag_track_stats": track_stats_sql(f"{GEO_SF001}/tracks.parquet"),
        "track_simplify": simplify_tracks_sql(f"{GEO_SF001}/tracks.parquet", 0.05),
        "track_hausdorff": hausdorff_join_sql(f"{GEO_SF001}/tracks.parquet", HAUSDORFF_DEG),
        "contour_lines": marching_squares_sql(
            f"{GEO_SF001}/points.parquet", GI_CELL_DEG, CONTOUR_THETA
        ),
        "bm25_search": bm25_topk_sql("documents", BM25_TERMS, k=BM25_K),
        "tfidf_keywords": tfidf_top_terms_sql("documents", TFIDF_K),
        "track_bearings": track_bearing_stats_sql(
            f"{GEO_SF001}/tracks.parquet"
        ),
        "hourly_periodicity": hourly_periodicity_sql("events"),
        "zonal_majority": f"""
            WITH pc AS (
              SELECT z.zone_id, p.category, COUNT(*) AS n
              FROM {pts} p, (SELECT DISTINCT zone_id FROM {hp}) z
              WHERE NOT EXISTS (
                SELECT 1 FROM {hp} h
                WHERE h.zone_id = z.zone_id AND h.a * p.lon + h.b * p.lat > h.c)
              GROUP BY 1, 2),
            tot AS (SELECT zone_id, SUM(n) AS n_total FROM pc GROUP BY 1)
            SELECT pc.zone_id, pc.category AS majority_cat,
                   pc.n AS n_majority, tot.n_total,
                   pc.n * 1000000 // tot.n_total AS share_ppm
            FROM pc JOIN tot USING (zone_id)
            QUALIFY row_number() OVER (
              PARTITION BY pc.zone_id ORDER BY pc.n DESC, pc.category ASC) = 1
        """,
        "cell_diversity": cell_diversity_sql(
            f"{GEO_SF001}/points.parquet", GI_CELL_DEG
        ),
        "local_morans_i": local_morans_i_sql(
            f"{GEO_SF001}/points.parquet", GI_CELL_DEG
        ),
        "track_sssp": sssp_bounded_sql(
            f"{GEO_SF001}/tracks.parquet", SSSP_SNAP, SSSP_HOPS
        ),
        "pmi_collocations": pmi_collocations_sql(
            "documents", PMI_WINDOW, PMI_MIN_COUNT, PMI_K
        ),
        "std_ellipse": std_ellipse_sql(f"'{GEO_SF001}/points.parquet'"),
        "region_label": region_label_sql(
            f"'{GEO_SF001}/points.parquet'", GI_CELL_DEG
        ),
        "adaptive_quadtree": adaptive_quadtree_sql(
            f"'{GEO_SF001}/points.parquet'", QT_CAP, QT_MIN_TIER, QT_MAX_TIER
        ),
        "clark_evans": clark_evans_sql(
            f"'{GEO_SF001}/points.parquet'", CLARK_EVANS_DMAX
        ),
        "contour_polylines": contour_polylines_sql(
            f"{GEO_SF001}/points.parquet", GI_CELL_DEG, CONTOUR_THETA
        ),
        "map_match_snap": snap_join_sql(
            f"{GEO_SF001}/points.parquet", f"{GEO_SF001}/tracks.parquet", SNAP_RADIUS_DEG
        ),
        "cotravel_pairs": cotravel_sql(
            f"{GEO_SF001}/tracks.parquet", COTRAVEL_DEG, COTRAVEL_TAU_S
        ),
        "convoy_pairs": convoy_sql(
            f"{GEO_SF001}/tracks.parquet", COTRAVEL_DEG, COTRAVEL_TAU_S, 2
        ),
        "track_resample": resample_tracks_sql(
            f"{GEO_SF001}/tracks.parquet", RESAMPLE_STEP_S
        ),
        "moving_clusters": moving_clusters_sql(
            f"{GEO_SF001}/tracks.parquet",
            MOVING_EPS_DEG,
            MOVING_BIN_S,
            MOVING_MIN_PTS,
            MOVING_THETA_PPM,
        ),
        "geofence_transitions": geofence_transitions_sql(
            f"{GEO_SF001}/points.parquet", f"{GEO_SF001}/zone_halfplanes.parquet"
        ),
        # the hex-kRing join must reproduce the exact kNN answer — same
        # brute-force oracle as knn_join (independent algorithm either way)
        "knn_hexring": f"""
            SELECT qid, fid, dist_sq, rank FROM (
              SELECT q.fid AS qid, p.fid AS fid,
                     (p.lon - q.lon) * (p.lon - q.lon) + (p.lat - q.lat) * (p.lat - q.lat) AS dist_sq,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.fid
                       ORDER BY (p.lon - q.lon) * (p.lon - q.lon) + (p.lat - q.lat) * (p.lat - q.lat),
                                p.fid) AS rank
              FROM (SELECT * FROM {pts} WHERE fid LIKE '%00') q, {pts} p
              WHERE (p.lon - q.lon) * (p.lon - q.lon) + (p.lat - q.lat) * (p.lat - q.lat)
                    <= {KNN_DIST * KNN_DIST})
            WHERE rank <= {KNN_K}
        """,
        "docs_zone_join": _docs_zone_join_oracle(),
        "docs_zone_within": _docs_zone_within_oracle(),
        "tracks_st_insertion": _tracks_st_insertion_oracle(),
        # bias bins re-derived arithmetically: lon/lat via the engine's
        # normalization edge rule (ceil - 1, clamped), time via the
        # fraction-of-year floor rule; 2^25 = 33554432, 2^10 = 1024,
        # 2^40 = 1099511627776
        "st_insertion_biased": f"""
            WITH frac AS (
              SELECT fid,
                     CAST(date_part('year', event_ts) AS INT) AS time_bin,
                     lon,
                     LEAST(GREATEST(lat, -90.0), 90.0) AS clat,
                     CAST(datediff('microsecond', date_trunc('year', event_ts), event_ts) AS DOUBLE)
                       / CAST(datediff('microsecond', date_trunc('year', event_ts),
                                       date_trunc('year', event_ts) + INTERVAL 1 YEAR) AS DOUBLE) AS f
              FROM {pts})
            SELECT fid, time_bin,
                   CAST(GREATEST(CEIL(((lon + 180.0) / 360.0) * 33554432) - 1, 0) AS BIGINT) AS s_xb,
                   CAST(GREATEST(CEIL(((clat + 180.0) / 360.0) * 33554432) - 1, 0) AS BIGINT) AS s_yb,
                   CAST(FLOOR(f * 1024) AS BIGINT) AS s_tb,
                   CAST(GREATEST(CEIL(((lon + 180.0) / 360.0) * 1024) - 1, 0) AS BIGINT) AS t_xb,
                   CAST(GREATEST(CEIL(((clat + 180.0) / 360.0) * 1024) - 1, 0) AS BIGINT) AS t_yb,
                   CAST(FLOOR(f * 1099511627776) AS BIGINT) AS t_tb
            FROM frac
        """,
        "orders_by_region": """
            SELECT r.r_name, o.o_orderstatus,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   MIN(o.o_totalprice) AS min_price,
                   MAX(o.o_totalprice) AS max_price
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name, o.o_orderstatus
        """,
        "routed_box_temporal": f"""
            SELECT fid, lon, lat, epoch_ms(event_ts) AS event_ms FROM {pts}
            WHERE lon >= {BOX[0]} AND lon <= {BOX[2]} AND lat >= {BOX[1]} AND lat <= {BOX[3]}
              AND event_ts >= TIMESTAMP '{TS_LO}' AND event_ts < TIMESTAMP '{TS_HI}'
        """,
        "st_biased_box_query": f"""
            SELECT fid, lon, lat, epoch_ms(event_ts) AS event_ms FROM {pts}
            WHERE lon >= {BOX[0]} AND lon <= {BOX[2]} AND lat >= {BOX[1]} AND lat <= {BOX[3]}
              AND event_ts >= TIMESTAMP '2012-03-01 00:00:00'
              AND event_ts < TIMESTAMP '2012-09-01 00:00:00'
        """,
        # plain SQL translation of CQL_ROUTED (DURING is strict per FES)
        "cql_spatial_routed": f"""
            SELECT fid, lon, lat, magnitude, category,
                   epoch_ms(event_ts) AS event_ms FROM {pts}
            WHERE lon >= {BOX[0]} AND lon <= {BOX[2]} AND lat >= {BOX[1]} AND lat <= {BOX[3]}
              AND event_ts > TIMESTAMP '{TS_LO}' AND event_ts < TIMESTAMP '{TS_HI}'
              AND magnitude >= 10 AND category IN ('cat1', 'cat3')
        """,
        "kmeans_clusters": _kmeans_oracle(),
        "dbscan_clusters": _dbscan_oracle(),
        "st_dbscan_clusters": _st_dbscan_oracle(),
        "dbscan_hulls": _dbscan_hulls_oracle(),
        "dbscan_concave_hulls": _dbscan_concave_hulls_oracle(),
        "cms_category_sketch": _cms_oracle(),
        "spatiotemporal_3d_cells": f"""
            WITH binned AS (
              SELECT
                CAST(date_part('year', event_ts) AS INT) AS time_bin,
                CAST(GREATEST(CEIL(((lon + 180.0) / 360.0) * 1024) - 1, 0) AS BIGINT) AS xb,
                CAST(GREATEST(CEIL(((LEAST(GREATEST(lat, -90.0), 90.0) + 180.0) / 360.0) * 1024) - 1, 0) AS BIGINT) AS yb,
                CAST(FLOOR((CAST(datediff('microsecond', date_trunc('year', event_ts), event_ts) AS DOUBLE)
                     / CAST(datediff('microsecond', date_trunc('year', event_ts),
                                     date_trunc('year', event_ts) + INTERVAL 1 YEAR) AS DOUBLE)) * 1024) AS BIGINT) AS tb
              FROM {pts}),
            per_cell AS (
              SELECT time_bin, xb, yb, tb, count(*) AS n
              FROM binned GROUP BY time_bin, xb, yb, tb)
            SELECT time_bin, count(*) AS n_cells, CAST(SUM(n) AS BIGINT) AS n_points,
                   MAX(n) AS max_cell_points
            FROM per_cell GROUP BY time_bin
        """,
        "events_windowed_counts": """
            SELECT date_trunc('day', ts) AS day, event_type,
                   count(*) AS n,
                   count(DISTINCT user_id) AS n_users,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value
            FROM events GROUP BY 1, 2
        """,
        "stats_summary": f"""
            SELECT category,
                   CAST(count(*) AS BIGINT) AS n,
                   MIN(lon) AS min_lon, MAX(lon) AS max_lon,
                   MIN(lat) AS min_lat, MAX(lat) AS max_lat,
                   SUM(magnitude) AS sum_magnitude
            FROM {pts} GROUP BY category
        """,
    }


from geowave_spark.queries_text import TEXT_QUERIES  # noqa: E402

# every implemented query/operator — the full library surface.  The local
# oracle gate (tools/check_oracle.py) and tests/test_oracle_parity.py check
# ALL of these against their DuckDB oracles.
ALL_QUERIES = {
    **TEXT_QUERIES,
    "spatial_box_query": q_spatial_box_query,
    "spatial_box_temporal_query": q_spatial_box_temporal_query,
    "spatial_polygon_query": q_spatial_polygon_query,
    "dateline_box_query": q_dateline_box_query,
    "pip_join": q_pip_join,
    "pip_join_hex": q_pip_join_hex,
    "pip_join_tiered": q_pip_join_tiered,
    "zonal_stats": q_zonal_stats,
    "tracks_contains_box": q_tracks_contains_box,
    "docs_box_query": q_docs_box_query,
    "spans_preserved": q_spans_preserved,
    "subsample_resolution": q_subsample_resolution,
    "stats_summary": q_stats_summary,
    "knn_join": q_knn_join,
    "kde_tiles": q_kde_tiles,
    "kde_resize": q_kde_resize,
    "kde_comparison": q_kde_comparison,
    "visibility_filter": q_visibility_filter,
    "lexicoder_rank": q_lexicoder_rank,
    "histogram_fixed_bins": q_histogram_fixed_bins,
    "percentile_by_category": q_percentile_by_category,
    "distinct_count_stats": q_distinct_count_stats,
    "cql_attribute_filter": q_cql_attribute_filter,
    "text_like_query": q_text_like_query,
    "spatiotemporal_bins": q_spatiotemporal_bins,
    "events_windowed_counts": q_events_windowed_counts,
    "hot_cell_salting": q_hot_cell_salting,
    "kmeans_clusters": q_kmeans_clusters,
    "dbscan_clusters": q_dbscan_clusters,
    "st_dbscan_clusters": q_st_dbscan_clusters,
    "dbscan_hulls": q_dbscan_hulls,
    "dbscan_concave_hulls": q_dbscan_concave_hulls,
    "tracks_box_temporal": q_tracks_box_temporal,
    "docs_extent_query": q_docs_extent_query,
    "docs_polygon_query": q_docs_polygon_query,
    "raster_tiling": q_raster_tiling,
    "geotiff_ingest_tiles": q_geotiff_ingest_tiles,
    "raster_pyramid": q_raster_pyramid,
    "s2_cell_counts": q_s2_cell_counts,
    "hex_cell_counts": q_hex_cell_counts,
    "geohash_cell_counts": q_geohash_cell_counts,
    "hotspot_gi_star": q_hotspot_gi_star,
    "emerging_hotspots": q_emerging_hotspots,
    "track_staypoints": q_track_staypoints,
    "track_od_flows": q_track_od_flows,
    "morans_i": q_morans_i,
    "knox_test": q_knox_test,
    "ripley_k": q_ripley_k,
    "colocation_cross_k": q_colocation_cross_k,
    "colocation_pi": q_colocation_pi,
    "terrain_slope": q_terrain_slope,
    "idw_grid": q_idw_grid,
    "track_stats": q_track_stats,
    "stanag_track_stats": q_stanag_track_stats,
    "track_simplify": q_track_simplify,
    "track_hausdorff": q_track_hausdorff,
    "map_match_snap": q_map_match_snap,
    "contour_lines": q_contour_lines,
    "bm25_search": q_bm25_search,
    "pmi_collocations": q_pmi_collocations,
    "track_sssp": q_track_sssp,
    "local_morans_i": q_local_morans_i,
    "track_bearings": q_track_bearings,
    "tfidf_keywords": q_tfidf_keywords,
    "cell_diversity": q_cell_diversity,
    "hourly_periodicity": q_hourly_periodicity,
    "zonal_majority": q_zonal_majority,
    "contour_polylines": q_contour_polylines,
    "std_ellipse": q_std_ellipse,
    "adaptive_quadtree": q_adaptive_quadtree,
    "region_label": q_region_label,
    "clark_evans": q_clark_evans,
    "cotravel_pairs": q_cotravel_pairs,
    "convoy_pairs": q_convoy_pairs,
    "moving_clusters": q_moving_clusters,
    "track_resample": q_track_resample,
    "geofence_transitions": q_geofence_transitions,
    "knn_hexring": q_knn_hexring,
    "routed_box_temporal": q_routed_box_temporal,
    "cql_spatial_routed": q_cql_spatial_routed,
    "cql_docs_bbox": q_cql_docs_bbox,
    "cql_areal_routed": q_cql_areal_routed,
    "docs_zone_join": q_docs_zone_join,
    "docs_zone_within": q_docs_zone_within,
    "events_sessionization": q_events_sessionization,
    "subsample_zorder": q_subsample_zorder,
    "cms_category_sketch": q_cms_category_sketch,
    "spatiotemporal_3d_cells": q_spatiotemporal_3d_cells,
    "knn_haversine": q_knn_haversine,
    "knn_geodesic": q_knn_geodesic,
    "distance_join": q_distance_join,
    "events_asof_join": q_events_asof_join,
    "events_rollup_cascade": q_events_rollup_cascade,
    "lineitem_pricing_summary": q_lineitem_pricing_summary,
    "tracks_st_insertion": q_tracks_st_insertion,
    "st_insertion_biased": q_st_insertion_biased,
    "st_biased_box_query": q_st_biased_box_query,
    "orders_by_region": q_orders_by_region,
    "points_track_interval_join": q_points_track_interval_join,
}

# The driver's correctness gate records at most 50 rows per round; the library
# holds 125 oracle-checked queries, so most coverage necessarily lives in
# tests/test_oracle_parity.py (the IDENTICAL Spark-vs-DuckDB comparison, green
# in the pytest suite) + tools/check_oracle.py (defaults to ALL queries).
# Every name here is excluded from the 50-row surface for one of two reasons,
# stated per entry: it already holds >=1 green driver row from a prior round,
# or it is a twin of a registered query (same operator, different
# table/metric/backend).  After the r05 rotation below, every library query
# has either a green driver row from some round or a surface slot this round.
DRIVER_EXCLUDED = {
    "ann_cosine_topk": "brute-force cosine top-k (green r03 row); ann_ivf_topk + ann_ivfpq_topk drive the bucketed ANN family on the r05 surface and the cosine fold is shared",
    "ann_lsh_topk": "holds a green r03 driver row; rotated out at the end of r04 so the closing wave's never-checked queries earn driver rows — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "boilerplate_block_dedup": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "bpe_pair_counts": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "cms_category_sketch": "A9 count-min sketch (green r01+r03 rows); the sketch family stays driver-covered by distinct_count_stats (A8) + stats_summary, md5-hash portability pinned by the parity oracle; rotated out for track_hausdorff",
    "contour_lines": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "cql_attribute_filter": "F4 native-expression path (green r03 row); the CQL string front-end now drives the same predicate family on the r04 surface via cql_docs_bbox + cql_spatial_routed, and text_like_query keeps the parity pin",
    "dateline_box_query": "F1 dateline-wrap case of spatial_box_query (green r03 row; wrap edge rules pinned by pytest + parity oracle)",
    "dbscan_clusters": "holds green driver rows (r2+r3+r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "dbscan_concave_hulls": "J5 hull stage (green r03 row); dbscan_clusters keeps the membership pin on the r04 surface and the hull-vertex invariant oracle stays in parity tests",
    "dbscan_hulls": "convex sibling of dbscan_concave_hulls; hull math shared",
    "dedup_clusters": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "dedup_embedding_cosine": "exact all-pairs twin (green r03 row); semdedup_prune drives the same cosine fold through the cluster-then-prune plan on the r04 surface, the LSH-bucketed variant stays recall-pinned in tests/test_ann_recall.py",
    "dedup_exact": "F5 exact dedup (green r03 row); the md5-key convention stays driver-covered by train_split_stratified + boilerplate_block_dedup on the r04 surface, and the duplicate-representative pin stays in training_data_filter",
    "dedup_minhash_signatures": "intermediate stage of dedup_minhash_lsh",
    "dedup_ngram_jaccard": "the shared-shingle Jaccard join IS dedup_minhash_lsh's verify stage (green r03 row); rotated out for dedup_clusters, which exercises the same pair graph transitively",
    "dedup_simhash": "F5 hamming-bucket twin of dedup_minhash_lsh (green r03 row; dedup family stays driver-covered via exact/minhash/clusters/embedding)",
    "distance_join": "fixed-radius sibling of knn_join (green r03 row) — same expansion-cell candidate join + exact haversine refine; J2 stays driver-covered via knn_join and knn_hexring; rotated out for split_contamination",
    "distinct_count_stats": "holds a green r03 driver row; rotated out at the end of r04 so the closing wave's never-checked queries earn driver rows — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "doc_fingerprint": "rolling-hash fingerprint (green r03 row; the identical md5-fold convention is exercised by every dedup oracle, parity test keeps the exact pin)",
    "docs_box_query": "S1 box scan on the documents table (green r03 row; spatial_box_query pins the operator, docs coverage continues via docs_polygon_query/docs_zone_join)",
    "docs_extent_query": "envelope twin of docs_box_query",
    "docs_polygon_query": "holds green driver rows (r2+r3+r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "docs_zone_join": "J1 areal intersects join (green r03 row); the areal_join path stays driver-covered by zonal_stats + cql_docs_bbox, and track_od_flows drives the PIP localize stage on the r04 surface",
    "docs_zone_within": "CONTAINS twin of docs_zone_join (same areal_join path)",
    "domain_mixture_sample": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "events_asof_join": "holds a green r03 driver row; rotated out at the end of r04 so the closing wave's never-checked queries earn driver rows — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "events_rollup_cascade": "holds a green r03 driver row; rotated out at the end of r04 so the closing wave's never-checked queries earn driver rows — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "events_sessionization": "holds green driver rows (r1+r2+r3+r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "events_windowed_counts": "A5 tumbling-window twin of events_rollup_cascade (green r03 row; same calendar-window groupBy family, the cascade registers the general case)",
    "geohash_cell_counts": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "histogram_fixed_bins": "A6 fixed-bin histogram (green r01+r02+r03 rows); stats_summary + percentile_by_category keep the A-family driver coverage and the parity pin stays identical",
    "hot_cell_salting": "holds a green r03 driver row; rotated out at the end of r04 so the closing wave's never-checked queries earn driver rows — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "idw_grid": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "kde_resize": "tile re-decomposition of kde_tiles' cells (R7 invariance pytest + same oracle shape)",
    "kde_tiles": "holds green driver rows (r1+r2+r3+r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "kmeans_clusters": "holds green driver rows (r2+r3+r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "knn_haversine": "J3 broadcast-centroid kNN (green r03 row); the haversine refine and window top-k are the same exprs knn_join drives on the r04 surface, and the brute==bucketed equality pytest keeps the J3 pin",
    "knox_test": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "lang_id": "its argmax fold is computed verbatim inside training_data_filter AND train_split_stratified, both registered (green r03 row); rotated out for train_split_stratified",
    "lm_quality_score": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "local_morans_i": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "morans_i": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "percentile_by_category": "A7 quantile sketch (green r01+r02+r03 rows); the A-family stays driver-covered by stats_summary (A1-A5) + distinct_count_stats (A8) and the exact-quantile parity pin stays in tests/test_oracle_parity.py; rotated out for knox_test",
    "pii_redact": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "points_track_interval_join": "holds a green r03 driver row; rotated out at the end of r04 so the closing wave's never-checked queries earn driver rows — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "raster_pyramid": "holds a green r03 driver row; rotated out at the end of r04 so the closing wave's never-checked queries earn driver rows — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "repetition_signals": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "routed_box_temporal": "index-router twin (green r03 row) — cql_spatial_routed and st_biased_box_query drive the same layouts_for router with constraint extraction on the r04 surface; route-independence stays pinned in tests/test_index_select.py; rotated out for sequence_packing",
    "s2_cell_counts": "holds green driver rows (r2+r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "semdedup_prune": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "sequence_packing": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "spatial_box_query": "holds green driver rows (r1+r2+r3+r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "spatial_box_temporal_query": "routed_box_temporal runs the same constraints through index routing",
    "spatial_polygon_query": "S1/F2 polygon-scan twin of docs_polygon_query on the points table (green r03 row; box scan stays registered via spatial_box_query)",
    "spatiotemporal_bins": "single-entry case of tracks_st_insertion's ranged 3D bin contract (K6)",
    "split_contamination": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "stats_summary": "holds a green r03 driver row; rotated out at the end of r04 so the closing wave's never-checked queries earn driver rows — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "std_ellipse": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "subsample_resolution": "F7 twin of subsample_zorder (green r03 row; same bin-arithmetic family, zorder sibling stays registered)",
    "subsample_zorder": "K4/F7 Morton-key subsampling (green r03 row); geohash_cell_counts drives the identical bit-interleave family with text keys on the r04 surface, and subsample_resolution keeps the bin-arithmetic parity pin",
    "text_like_query": "native-filter twin of cql_attribute_filter",
    "text_quality": "its quality-signal expressions are the first stage of training_data_filter, which stays registered (green r03 row)",
    "tfidf_keywords": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "token_stats": "subword/token counting (green r03 row); bpe_pair_counts + lm_quality_score drive the tokenization family on the r04 surface and text_quality keeps the parity pin",
    "track_bearings": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "track_hausdorff": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "track_od_flows": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "track_simplify": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "track_stats": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "track_staypoints": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "tracks_box_temporal": "holds a green r03 driver row; rotated out at the end of r04 so the closing wave's never-checked queries earn driver rows — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "tracks_contains_box": "F2 contains-variant; spatial/docs_polygon_query cover the dispatch",
    "tracks_st_insertion": "K6 equal-bits ranged 3D insertion (green r03 row); st_insertion_biased + st_biased_box_query drive the K6 family with the harder unequal-bits keys on the r04 surface, the year-bin/fraction arithmetic is shared",
    "train_split_stratified": "holds green driver rows (r4); rotated out in r05 so every never-driver-checked query earns its first row — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "training_data_filter": "holds a green r03 driver row; rotated out at the end of r04 so the closing wave's never-checked queries earn driver rows — the identical oracle comparison continues in tests/test_oracle_parity.py",
    "visibility_filter": "holds a green r03 driver row; rotated out at the end of r04 so the closing wave's never-checked queries earn driver rows — the identical oracle comparison continues in tests/test_oracle_parity.py",
}

# r05 driver surface, front-loaded in priority order (the gate cuts at 50):
#  1. the 24 queries that had never earned a driver row through r04 (incl.
#     spatiotemporal_3d_cells, red in r01 and never re-graded since);
#  2. the 5 closing-wave queries whose r04 rows recorded hash_match=false in
#     a gate/tree race (they pass locally under three configs — re-earning
#     green rows is this round's top VERDICT item);
#  3. bench-headline queries with the fewest prior green rows, so the perf
#     and correctness surfaces stay aligned (pip_join is the headline
#     throughput metric; spans_preserved pins the north-rule span-sequence
#     invariant);
#  4. new round-5 operators are appended at the END as they land (the
#     remaining slots up to 50 are reserved for them).
_R05_SURFACE = [
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "cell_diversity",
    "colocation_cross_k",
    "colocation_pi",
    "convoy_pairs",
    "cotravel_pairs",
    "cql_areal_routed",
    "dsir_resample",
    "hourly_periodicity",
    "knn_geodesic",
    "lexicoder_rank",
    "lineitem_pricing_summary",
    "map_match_snap",
    "moving_clusters",
    "orders_by_region",
    "pip_join_hex",
    "ripley_k",
    "st_dbscan_clusters",
    "substring_dup_spans",
    "terrain_slope",
    "track_resample",
    "zonal_majority",
    "spatiotemporal_3d_cells",
    "bm25_search",
    "clark_evans",
    "contour_polylines",
    "emerging_hotspots",
    "region_label",
    "pip_join",
    "raster_tiling",
    "kde_comparison",
    "hex_cell_counts",
    "knn_hexring",
    "cql_spatial_routed",
    "st_insertion_biased",
    "st_biased_box_query",
    "cql_docs_bbox",
    "hotspot_gi_star",
    "geofence_transitions",
    "adaptive_quadtree",
    "pmi_collocations",
    "track_sssp",
    "spans_preserved",
    "dedup_minhash_lsh",
    # fill to the 50-row cap with bench-headline anchors (multi-round green)
    # so the perf and correctness surfaces stay aligned (r04 verdict item 7)
    "pip_join_tiered",
    "zonal_stats",
    "knn_join",
]
QUERIES = {n: ALL_QUERIES[n] for n in _R05_SURFACE}
QUERIES.update(
    {
        n: q
        for n, q in ALL_QUERIES.items()
        if n not in DRIVER_EXCLUDED and n not in QUERIES
    }
)
