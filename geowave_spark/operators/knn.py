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

from geowave_spark.plans.lineage import truncate_plan
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window

from geowave_spark.sfc import DEFAULT_CONFIG, SpatialConfig

from .indexing import cell_at_tier, with_point_cells


def tier_for_distance(
    distance_deg: float, cfg: SpatialConfig = DEFAULT_CONFIG, margin_bits: int = 0
) -> int:
    """Finest defined tier whose cell size >= 2*distance (the reference's
    partitioner grid rule, AbstractPartitioner.java:241-280: bits =
    log2(range / (2d))).

    ``margin_bits`` tightens the grid beyond the reference rule: each extra
    bit halves the cell size, shrinking the candidate set ~4x at the cost of
    more (still few) probe cells per query — worth it whenever the data is
    denser than one candidate page per 2d-cell (hot clusters)."""
    bits = int(np.floor(np.log2(360.0 / max(2.0 * distance_deg, 1e-12)))) + margin_bits
    usable = [t for t in cfg.tiers if 0 < t <= bits]
    return max(usable) if usable else min(t for t in cfg.tiers if t > 0)


def _split_rows(rows: np.ndarray, keys: np.ndarray, n: int) -> pd.Series:
    """Exploded (row, key) pairs (row-sorted) -> Series of per-row key lists."""
    counts = np.bincount(rows, minlength=n)
    return pd.Series([s.tolist() for s in np.split(keys, np.cumsum(counts)[:-1])])


def expansion_cells_udf(distance_deg: float, bits: int, cfg: SpatialConfig = DEFAULT_CONFIG):
    """pandas UDF: query point -> primary + ring expansion cells (its bbox
    inflated by the search distance, covered at the distance tier).  The
    whole Arrow batch covers in one vectorized pass
    (:func:`~geowave_spark.sfc.cells_covering_bboxes`) — no per-row Python."""

    @F.pandas_udf(ArrayType(LongType()))
    def _cells(lon: pd.Series, lat: pd.Series) -> pd.Series:
        from geowave_spark.sfc import cells_covering_bboxes

        x = lon.to_numpy(np.float64)
        y = lat.to_numpy(np.float64)
        rows, keys = cells_covering_bboxes(
            x - distance_deg, y - distance_deg, x + distance_deg, y + distance_deg, bits, cfg
        )
        return _split_rows(rows, keys, len(x))

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
    margin_bits: int = 2,
    salt_buckets: int = 16,
    broadcast_queries: bool | None = None,
    max_broadcast_queries: int = 50_000,
) -> DataFrame:
    """For each query point: its k nearest data points within max_distance.

    Output: (qid, fid, dist_sq, rank) — dist_sq is the exact squared planar
    degree distance (identical IEEE ops to the SQL oracle), rank 1..k ordered
    by (dist_sq, fid).

    Skew handling (hot clusters make some queries see 10^4+ in-distance
    candidates): top-k runs in two phases — a salted partial top-k over
    (qid, hash(fid) % salt_buckets), then a final top-k over the <=
    k*salt_buckets survivors per query.  This is the reference's per-cell
    ``upperBoundPerPartition`` bound (`NNProcessor.java:69,111-116`)
    re-expressed as bounded-depth windows, and keeps the heavy sort spread
    over salt_buckets x queries partitions instead of one per query.

    Broadcast planning: query sets defined as corpus fractions grow with the
    corpus, silently breaking a hard-coded broadcast.  ``broadcast_queries=
    None`` (default) probes the query side with a bounded limit+count and
    falls back to a cell-shuffle equi-join (both sides shuffle on the cell
    key — the correct plan once the query side outgrows executor memory)
    above ``max_broadcast_queries``.
    """
    # the candidate stage IS the epsilon-neighborhood join — one shared
    # implementation (distance_join) serves kNN, DBSCAN edges, and the raw
    # pair query; kNN adds only the salted two-phase top-k below
    joined = distance_join(
        queries,
        points,
        max_distance_deg,
        left_id_col=query_id_col,
        left_lon_col=query_lon_col,
        left_lat_col=query_lat_col,
        right_id_col=id_col,
        right_lon_col=lon_col,
        right_lat_col=lat_col,
        cfg=cfg,
        right_cell_col=point_cell_col,
        margin_bits=margin_bits,
        broadcast_left=broadcast_queries,
        max_broadcast_left=max_broadcast_queries,
    )
    if salt_buckets > 1:
        partial = Window.partitionBy(query_id_col, "_salt").orderBy("dist_sq", id_col)
        joined = (
            joined.withColumn("_salt", F.pmod(F.hash(F.col(id_col)), F.lit(salt_buckets)))
            .withColumn("_prank", F.row_number().over(partial))
            .filter(F.col("_prank") <= k)
        )
    w = Window.partitionBy(query_id_col).orderBy("dist_sq", id_col)
    out = (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "dist_sq", "rank")
    )
    return out


def distance_join(
    left: DataFrame,
    right: DataFrame,
    max_distance_deg: float,
    *,
    left_id_col: str = "qid",
    left_lon_col: str = "qlon",
    left_lat_col: str = "qlat",
    right_id_col: str = "fid",
    right_lon_col: str = "lon",
    right_lat_col: str = "lat",
    cfg: SpatialConfig = DEFAULT_CONFIG,
    right_cell_col: str | None = None,
    margin_bits: int = 2,
    broadcast_left: bool | None = None,
    max_broadcast_left: int = 50_000,
) -> DataFrame:
    """Every (left, right) pair within the planar distance — the full
    epsilon-neighborhood join (NNMapReduce's actual output before any top-k:
    `NNMapReduce.java:119-291`), of which kNN is the truncated special case
    and DBSCAN's edge set is the self-join special case.

    Same cell-bucketed shape as :func:`knn_join`: the left side explodes to
    expansion cells of its distance ball, the right side derives one
    ancestor cell per row by bit shift; pair-uniqueness holds (one home cell
    per right row), so no dedup shuffle.  Output: (left_id, right_id,
    dist_sq), unbounded per left row — callers own the output-sensitivity
    (bound the distance, not the result)."""
    if broadcast_left is None:
        broadcast_left = left.limit(max_broadcast_left + 1).count() <= max_broadcast_left
    bits = tier_for_distance(max_distance_deg, cfg, margin_bits)
    l = left.withColumn(
        "_qcell",
        F.explode(
            expansion_cells_udf(max_distance_deg, bits, cfg)(
                F.col(left_lon_col), F.col(left_lat_col)
            )
        ),
    )
    if right_cell_col is None:
        right = with_point_cells(
            right, right_lon_col, right_lat_col, cfg, cell_col="_pcell"
        ).drop("tier")
        right_cell_col = "_pcell"
    probe = right.withColumn(
        "_jcell", F.coalesce(cell_at_tier(F.col(right_cell_col), cfg.finest, bits), F.lit(-1))
    )
    dx = F.col(right_lon_col) - F.col(left_lon_col)
    dy = F.col(right_lat_col) - F.col(left_lat_col)
    build = F.broadcast(l) if broadcast_left else l
    return (
        probe.join(build, probe["_jcell"] == l["_qcell"], "inner")
        .withColumn("dist_sq", dx * dx + dy * dy)
        .filter(F.col("dist_sq") <= max_distance_deg * max_distance_deg)
        .select(left_id_col, right_id_col, "dist_sq")
    )


def knn_join_adaptive(
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
    start_fraction: float = 1.0 / 8.0,
    expansion_factor: float = 8.0,
    max_broadcast_queries: int = 50_000,
    pipeline=None,
    pipeline_config: dict | None = None,
    pre_encoded: bool = False,
) -> DataFrame:
    """Ring-expansion kNN: identical output to :func:`knn_join`, but the
    search radius starts at ``max_distance * start_fraction`` and expands
    geometrically, re-running only the queries that have not yet found k
    neighbors.

    ``pre_encoded=True`` means ``points`` already carries the finest-tier
    ``_pcell`` column (from :func:`with_point_cells`) and its persistence is
    the caller's responsibility — used by the streaming wrapper so a static
    point layer is encoded and cached ONCE across micro-batches instead of
    re-encoded per batch.

    Pass a :class:`geowave_spark.plans.lineage.Pipeline` as ``pipeline`` to
    checkpoint every round durably (parquet + manifest with per-partition
    row counters): a killed run re-invoked over the same checkpoint root
    resumes after the last completed round — the north rule's "every join
    stage checkpoints per-partition lineage ... so runs resume
    mid-pipeline" on the kNN join itself.  ``pipeline_config`` goes into
    each round's fingerprint, so changing inputs/parameters invalidates
    stale checkpoints instead of silently reusing them.

    Why: with a generous distance bound over skewed data, the fixed-radius
    join materializes every in-distance pair (10^4+ per hot-cluster query)
    only to keep k.  A query satisfied at radius r < d has its true top-k
    already (everything unseen is farther than r), so each round retires the
    dense queries while sparse-region queries escalate cheaply — total pair
    volume drops orders of magnitude.  This is the kNN analog of the
    reference's tier walk (finest tier first, coarsen until the entry fits,
    `TieredSFCIndexStrategy.java:162-195`).

    Driver-side loop cost: one count-aggregate job per round over <= |queries|
    rows; round outputs are <= k*|queries| rows and are cached before the
    final union.
    """
    # encode the big side once at the finest tier; per-round probe cells are
    # JVM bit-shifts of the cached key
    if pre_encoded:
        probe = points.select(id_col, lon_col, lat_col, "_pcell")
    else:
        probe = with_point_cells(points, lon_col, lat_col, cfg, cell_col="_pcell").drop("tier")
        probe = probe.select(id_col, lon_col, lat_col, "_pcell").cache()

    # resolve the broadcast decision once on the full query set (rounds only
    # shrink it, so a broadcastable start stays broadcastable)
    bq = queries.limit(max_broadcast_queries + 1).count() <= max_broadcast_queries

    def run_round(remaining: DataFrame, radius: float) -> DataFrame:
        return knn_join(
            remaining,
            probe,
            k,
            radius,
            query_id_col=query_id_col,
            query_lon_col=query_lon_col,
            query_lat_col=query_lat_col,
            id_col=id_col,
            lon_col=lon_col,
            lat_col=lat_col,
            cfg=cfg,
            point_cell_col="_pcell",
            broadcast_queries=bq,
        )

    result = _adaptive_rounds(
        run_round, queries, query_id_col, k, max_distance_deg,
        start_fraction, expansion_factor,
        pipeline=pipeline, pipeline_config=pipeline_config,
    )
    if not pre_encoded:  # a pre-encoded probe's cache belongs to the caller
        probe.unpersist()  # round outputs are checkpointed; the big cache can go
    return result


def _adaptive_rounds(
    run_round,
    queries: DataFrame,
    query_id_col: str,
    k: int,
    max_distance_deg: float,
    start_fraction: float,
    expansion_factor: float,
    pipeline=None,
    pipeline_config: dict | None = None,
) -> DataFrame:
    """The ring-expansion round loop shared by the square and hex kNN joins.

    ``run_round(remaining, radius)`` must return the exact top-k of every
    remaining query restricted to its radius-ball.  A query with >= k rows
    at radius r has its TRUE top-k (everything unseen is farther than r),
    so it retires; the rest escalate to the next radius.  Retirement is
    executor-side (the reference's NNProcessor.java:53-120 removes
    satisfied neighborhoods inside the task): per-query counts stay a
    DataFrame and retire via semi/anti joins — no query ids ever cross the
    driver, and the plan size stays O(1) per round regardless of |queries|.
    Round outputs are localCheckpoint-ed (<= k*|queries| rows) to cut
    lineage across rounds.

    With a :class:`~geowave_spark.plans.lineage.Pipeline`, each round's RAW
    output is instead a durable parquet stage (manifest with per-partition
    row counters); the semi/anti retirement joins then run over the
    read-back parquet, so a resumed run skips every completed round's join
    work and replays only the cheap retirement bookkeeping.  The round
    schedule is deterministic in the arguments, which is what makes the
    stage sequence replayable.
    """
    radii = []
    r = max_distance_deg * start_fraction
    while r < max_distance_deg:
        radii.append(r)
        r *= expansion_factor
    radii.append(max_distance_deg)

    remaining = queries
    chunks = []
    for i, radius in enumerate(radii):
        is_last = i == len(radii) - 1
        if pipeline is not None:
            rem = remaining  # bind loop variables for the build closure
            out = pipeline.stage(
                f"knn_round_{i:02d}",
                {"round": i, "radius": radius, "k": k, **(pipeline_config or {})},
                lambda rem=rem, radius=radius: run_round(rem, radius),
            )
        else:
            # stats-resetting round barriers (plans.lineage.truncate_plan)
            out = truncate_plan(run_round(remaining, radius))
        if is_last:
            chunks.append(out)
            break
        satisfied = (
            out.groupBy(query_id_col)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") >= k)
            .select(query_id_col)
        )
        satisfied = truncate_plan(satisfied)
        chunks.append(out.join(satisfied, query_id_col, "left_semi"))
        remaining = truncate_plan(remaining.join(satisfied, query_id_col, "left_anti"))
        if not remaining.take(1):  # scalar early-exit probe, not an id transfer
            break
    result = chunks[0]
    for c in chunks[1:]:
        result = result.unionByName(c)
    return result


def geodesic_expansion_cells_udf(
    radius_km: float, bits: int, cfg: SpatialConfig = DEFAULT_CONFIG
):
    """pandas UDF: query point -> expansion cells of its GEODESIC ball:
    the lat half-width is radius/111.19 km-per-degree; the lon half-width
    divides by cos(lat) (meridians converge), clamped near the poles where
    the ball wraps all longitudes.  Batched like :func:`expansion_cells_udf`
    — the per-row work is the numpy where/cos, not a Python loop."""

    @F.pandas_udf(ArrayType(LongType()))
    def _cells(lon: pd.Series, lat: pd.Series) -> pd.Series:
        from geowave_spark.functions.distance import KM_PER_DEG
        from geowave_spark.sfc import cells_covering_bboxes

        dlat = radius_km / KM_PER_DEG
        x = lon.to_numpy(np.float64)
        y = lat.to_numpy(np.float64)
        c = np.cos(np.radians(np.minimum(np.abs(y) + dlat, 89.9999)))
        dlon = radius_km / (KM_PER_DEG * np.maximum(c, 1e-9))
        # a ball wrapping the pole (or all longitudes) covers every meridian
        # explicitly — x +- 180 would wrap to a DEGENERATE range in
        # normalize_lon_range (full circle folds onto one line), silently
        # dropping candidates
        wraps = (dlon >= 180.0) | (np.abs(y) + dlat >= 90.0)
        lo = np.where(wraps, -180.0, x - dlon)
        hi = np.where(wraps, 180.0, x + dlon)
        rows, keys = cells_covering_bboxes(lo, y - dlat, hi, y + dlat, bits, cfg)
        return _split_rows(rows, keys, len(x))

    return _cells


def knn_join_geodesic(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    max_distance_km: float,
    *,
    query_id_col: str = "qid",
    query_lon_col: str = "qlon",
    query_lat_col: str = "qlat",
    id_col: str = "fid",
    lon_col: str = "lon",
    lat_col: str = "lat",
    cfg: SpatialConfig = DEFAULT_CONFIG,
    point_cell_col: str | None = None,
    margin_bits: int = 2,
    broadcast_queries: bool | None = None,
    max_broadcast_queries: int = 50_000,
) -> DataFrame:
    """Great-circle kNN at scale: the cell-bucketed shape of :func:`knn_join`
    with a geodesic candidate ball (lat-aware lon inflation) and an exact
    haversine refine + top-k — replacing the broadcast-NL `knn_haversine`
    baseline once the corpus or query set outgrows a crossJoin.  Output:
    (qid, fid, hav_km, rank), rank ordered by (distance, id)."""
    from geowave_spark.functions.distance import KM_PER_DEG, haversine_km

    if broadcast_queries is None:
        broadcast_queries = (
            queries.limit(max_broadcast_queries + 1).count() <= max_broadcast_queries
        )
    # grid resolution from the WORST-case degree extent of the ball (the
    # equatorial lat width; lon widths are handled per query in the cover)
    dist_deg = max_distance_km / KM_PER_DEG
    bits = tier_for_distance(dist_deg, cfg, margin_bits)
    q = queries.withColumn(
        "_qcell",
        F.explode(
            geodesic_expansion_cells_udf(max_distance_km, bits, cfg)(
                F.col(query_lon_col), F.col(query_lat_col)
            )
        ),
    )
    if point_cell_col is None:
        points = with_point_cells(points, lon_col, lat_col, cfg, cell_col="_pcell").drop("tier")
        point_cell_col = "_pcell"
    probe = points.withColumn(
        "_jcell", F.coalesce(cell_at_tier(F.col(point_cell_col), cfg.finest, bits), F.lit(-1))
    )
    build = F.broadcast(q) if broadcast_queries else q
    hav = haversine_km(F.col(lon_col), F.col(lat_col), F.col(query_lon_col), F.col(query_lat_col))
    joined = (
        probe.join(build, probe["_jcell"] == q["_qcell"], "inner")
        .filter(F.col(id_col) != F.col(query_id_col))
        .withColumn("hav_km", hav)
        .filter(F.col("hav_km") <= max_distance_km)
        .select(query_id_col, id_col, "hav_km")
    )
    w = Window.partitionBy(query_id_col).orderBy("hav_km", id_col)
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "hav_km", "rank")
    )


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


def knn_join_hexring(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    max_distance_deg: float,
    *,
    res: int | None = None,
    query_id_col: str = "qid",
    query_lon_col: str = "qlon",
    query_lat_col: str = "qlat",
    id_col: str = "fid",
    lon_col: str = "lon",
    lat_col: str = "lat",
    salt_buckets: int = 16,
    broadcast_queries: bool | None = None,
    max_broadcast_queries: int = 50_000,
) -> DataFrame:
    """H3-ring-expansion kNN (the north star's named variant): the square
    expansion grid of :func:`knn_join` swapped for hexagonal kRing cells
    (`sfc/hexgrid.py`) — same output contract (qid, fid, dist_sq, rank),
    same distance bound, same salted two-phase top-k.

    The hex win is that kRing offsets are translation-invariant in axial
    coordinates, so the candidate stage is 100% Catalyst: both sides bin
    with `with_hex_bins` (pure JVM expressions), the query side expands by
    a crossJoin with the literal |3r(r+1)+1|-row offset table (broadcast
    nested loop over a constant), and candidates come from one hash
    equi-join on (q, r) — no Python UDF anywhere, where the square-grid
    path needs an Arrow UDF to cover the inflated bbox.  Hexes also cover
    a disc with ~17% fewer cells than squares of equal area (the packing
    argument H3 documents), shrinking the candidate set.

    ``res`` defaults to the finest resolution keeping the ring table at
    most ~100 cells; ring count guarantees full coverage of the distance
    ball (bound + property test in sfc/hexgrid.py).
    """
    from geowave_spark.sfc.hexgrid import hex_size, kring_offsets, rings_for_distance

    from .indexing import with_hex_bins

    if res is None:
        # finest resolution whose ring table stays <= 128 cells: finer cells
        # shrink the candidate disc (converges to ~1.33x the ball area) while
        # the build-side explode factor stays trivially broadcastable
        res = 0
        while res < 20 and 3 * (rr := rings_for_distance(max_distance_deg, res)) * (rr + 1) + 1 <= 128:
            res += 1
        res = max(res - 1, 0)
    rings = rings_for_distance(max_distance_deg, res)
    spark = queries.sparkSession
    offsets = spark.createDataFrame(kring_offsets(rings), "dq: long, dr: long")

    if broadcast_queries is None:
        broadcast_queries = (
            queries.limit(max_broadcast_queries + 1).count() <= max_broadcast_queries
        )
    q = with_hex_bins(queries, query_lon_col, query_lat_col, res).crossJoin(
        F.broadcast(offsets)
    )
    q = q.withColumn("_jq", F.col("hex_q") + F.col("dq")).withColumn(
        "_jr", F.col("hex_r") + F.col("dr")
    ).drop("hex_q", "hex_r", "dq", "dr")
    p = with_hex_bins(points, lon_col, lat_col, res)
    build = F.broadcast(q) if broadcast_queries else q
    dx = F.col(lon_col) - F.col(query_lon_col)
    dy = F.col(lat_col) - F.col(query_lat_col)
    joined = (
        p.join(build, (p["hex_q"] == q["_jq"]) & (p["hex_r"] == q["_jr"]), "inner")
        .withColumn("dist_sq", dx * dx + dy * dy)
        .filter(F.col("dist_sq") <= max_distance_deg * max_distance_deg)
    )
    if salt_buckets > 1:
        partial = Window.partitionBy(query_id_col, "_salt").orderBy("dist_sq", id_col)
        joined = (
            joined.withColumn("_salt", F.pmod(F.hash(F.col(id_col)), F.lit(salt_buckets)))
            .withColumn("_prank", F.row_number().over(partial))
            .filter(F.col("_prank") <= k)
        )
    w = Window.partitionBy(query_id_col).orderBy("dist_sq", id_col)
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "dist_sq", "rank")
    )


def knn_join_hexring_adaptive(
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
    salt_buckets: int = 16,
    start_fraction: float = 1.0 / 8.0,
    expansion_factor: float = 8.0,
    max_broadcast_queries: int = 50_000,
    pipeline=None,
    pipeline_config: dict | None = None,
) -> DataFrame:
    """kRing-expansion kNN: identical output to :func:`knn_join_hexring`
    (and to :func:`knn_join`), but the search radius starts small and
    expands geometrically, re-running only unsatisfied queries — the hex
    twin of :func:`knn_join_adaptive`, sharing its round loop.

    Why this exists: the fixed hexring join materializes every query's FULL
    distance ball — over hot clusters (queries are sampled from the data,
    so they concentrate exactly where points do) that is quadratic in
    cluster size, measured 97 s at sf0.1 where the adaptive square join
    ran 6 s.  Each adaptive round shrinks the covered disc to the radius
    most queries actually need: a dense-cluster query retires at
    max_distance/8 having scanned ~1/64th of the ball area.

    Retirement is exact for the same reason as the square path: round r's
    candidate cells cover the full r-ball (``rings_for_distance`` bound,
    property-tested in tests/test_hexgrid.py), so >= k in-radius rows at
    radius r == the true top-k.  Every round's candidate stage stays pure
    Catalyst; the per-round res re-derives from the round radius, keeping
    the offset table <= 128 rows while the cells track the shrunken disc.
    """
    bq = queries.limit(max_broadcast_queries + 1).count() <= max_broadcast_queries

    # scan + project the big side once for the whole round loop (the square
    # twin caches its encoded probe the same way); per-round res means the
    # hex binning itself re-derives each round, but that is pure Catalyst
    # over this cached projection instead of a fresh source scan per round
    probe = points.select(id_col, lon_col, lat_col).cache()

    def run_round(remaining: DataFrame, radius: float) -> DataFrame:
        return knn_join_hexring(
            remaining,
            probe,
            k,
            radius,
            query_id_col=query_id_col,
            query_lon_col=query_lon_col,
            query_lat_col=query_lat_col,
            id_col=id_col,
            lon_col=lon_col,
            lat_col=lat_col,
            salt_buckets=salt_buckets,
            broadcast_queries=bq,
        )

    result = _adaptive_rounds(
        run_round, queries, query_id_col, k, max_distance_deg,
        start_fraction, expansion_factor,
        pipeline=pipeline, pipeline_config=pipeline_config,
    )
    probe.unpersist()  # round outputs are checkpointed; the big cache can go
    return result
