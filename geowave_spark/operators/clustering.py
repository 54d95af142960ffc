"""Clustering operators: K-means (J4) and DBSCAN (J5).

Mirrors the reference analytics suite re-expressed as DataFrame loops:

- **K-means** (`analytics/mapreduce/.../kmeans/KMeansMapReduce.java`,
  runners in `kmeans/runner/`): assignment is a broadcast nearest-centroid
  join (`NestedGroupCentroidAssignment` -> our crossJoin(broadcast) +
  min_by), update is one partial+final aggregation per iteration.  Init is
  deterministic (hash-ranked sample — the seeded analog of the k-means||
  sampler `KSamplerMapReduce.java`).
- **DBSCAN** (`analytics/mapreduce/.../dbscan/DBScanMapReduce.java:83-199`):
  the reference J1-partitions by cell, clusters locally with a minOwners
  density rule, then iteratively merges cross-cell clusters across job
  rounds (`DBScanIterationsJobRunner`).  Here: the epsilon-neighbor edge set
  comes from the same cell-bucketed self-join (each pair meets in exactly
  one cell — the finer-grid dedup trick), core points by degree, and the
  cross-cell merge is min-label propagation over core-core edges with a
  pointer-jumping step each round (every node also adopts its current
  label's label), so rounds are logarithmic in cluster hop diameter rather
  than linear; non-convergence within ``max_rounds`` raises instead of
  silently splitting clusters.

Determinism: cluster ids are the minimum member id of the component, ties in
assignment break on centroid index / neighbor id, so outputs are stable and
test-comparable against brute-force python.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geowave_spark.plans.lineage import truncate_plan
from geowave_spark.sfc import DEFAULT_CONFIG, SpatialConfig

from .indexing import cell_at_tier, with_point_cells
from .knn import expansion_cells_udf, tier_for_distance


def kmeans(
    points: DataFrame,
    k: int,
    max_iters: int = 10,
    id_col: str = "fid",
    lon_col: str = "lon",
    lat_col: str = "lat",
    init: list[tuple[float, float]] | None = None,
) -> tuple[DataFrame, list[tuple[float, float]]]:
    """Lloyd iterations with broadcast centroids.

    Returns (assignments DF: id, cluster, dist_sq; final centroids list).
    Deterministic: init = the k points with the smallest md5-prefix hash of
    their id (a seeded uniform sample without an RNG, reproducible in any
    engine), assignment ties -> lowest cluster index.  Each iteration is one
    crossJoin(broadcast(k rows)) + min_by and one groupBy(cluster).avg —
    partial aggregation keeps the shuffle at k rows per partition.
    """
    from geowave_spark.functions.text import md5_long

    pts = points.select(id_col, lon_col, lat_col).cache()
    if init is None:
        rows = (
            pts.withColumn("_h", md5_long(F.col(id_col)))
            .orderBy("_h")
            .limit(k)
            .select(lon_col, lat_col)
            .collect()
        )
        centroids = [(float(r[0]), float(r[1])) for r in rows]
    else:
        assert len(init) == k
        centroids = [(float(x), float(y)) for x, y in init]

    assign = None
    for _ in range(max_iters):
        spark = pts.sparkSession
        cdf = spark.createDataFrame(
            [(i, cx, cy) for i, (cx, cy) in enumerate(centroids)], "cluster int, cx double, cy double"
        )
        # explicit products (not **2 / pow): bit-identical IEEE ops to the
        # SQL oracle's (x)*(x), so cross-engine comparisons see the same d2
        ddx = F.col(lon_col) - F.col("cx")
        ddy = F.col(lat_col) - F.col("cy")
        d2 = ddx * ddx + ddy * ddy
        scored = pts.crossJoin(F.broadcast(cdf)).withColumn("dist_sq", d2)
        w = Window.partitionBy(id_col).orderBy("dist_sq", "cluster")
        assign = (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(id_col, "cluster", "dist_sq", lon_col, lat_col)
        )
        new_rows = (
            assign.groupBy("cluster")
            .agg(F.avg(lon_col).alias("cx"), F.avg(lat_col).alias("cy"))
            .collect()
        )
        new_centroids = list(centroids)
        for r in new_rows:
            new_centroids[r.cluster] = (float(r.cx), float(r.cy))
        moved = max(
            (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 for a, b in zip(centroids, new_centroids)
        )
        centroids = new_centroids
        # exact-zero test, not a tolerance: identical assignments reproduce
        # identical means bit-for-bit, so convergence is moved == 0.0 — and
        # the unrolled-iteration SQL oracle's no-op argument needs exactly
        # that (a sub-tolerance drift would keep moving in the oracle)
        if moved == 0.0:
            break
    pts.unpersist()
    return assign.select(id_col, "cluster", "dist_sq"), centroids


def kmeans_parallel_init(
    points: DataFrame,
    k: int,
    rounds: int = 5,
    oversample: float | None = None,
    id_col: str = "fid",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> list[tuple[float, float]]:
    """k-means|| initialization (Bahman et al., VLDB 2012) — the reference's
    KSamplerMapReduce + BahmanEtAlSampleProbabilityFn
    (`analytics/mapreduce/.../kmeans/runner/KMeansParallelJobRunner.java`):

    seed with one deterministic point, then for ``rounds`` passes sample
    each point independently with probability min(1, l * d^2(x, C) / cost)
    (l = oversample, default 2k), then weight the O(l * rounds) candidates by
    how many points they are closest to and Lloyd the candidates down to k
    on the driver (they are tiny).  Determinism: the sampling coin is the
    md5 hash of (round, id) — a seeded uniform, reproducible anywhere.
    """
    from geowave_spark.functions.text import md5_long

    if oversample is None:
        oversample = 2.0 * k
    pts = points.select(id_col, lon_col, lat_col).cache()
    first = (
        pts.withColumn("_h", md5_long(F.col(id_col))).orderBy("_h").limit(1).collect()[0]
    )
    centers: list[tuple[float, float]] = [(float(first[lon_col]), float(first[lat_col]))]

    HMOD = float(1 << 60)
    for r in range(rounds):
        spark = pts.sparkSession
        cdf = F.array(*[F.struct(F.lit(cx).alias("cx"), F.lit(cy).alias("cy")) for cx, cy in centers])
        d2 = F.aggregate(
            cdf,
            F.lit(float("inf")),
            lambda acc, c: F.least(
                acc,
                (F.col(lon_col) - c["cx"]) * (F.col(lon_col) - c["cx"])
                + (F.col(lat_col) - c["cy"]) * (F.col(lat_col) - c["cy"]),
            ),
        )
        scored = pts.withColumn("_d2", d2)
        cost = scored.agg(F.sum("_d2")).collect()[0][0] or 0.0
        if cost <= 0.0:
            break
        coin = md5_long(F.concat_ws(":", F.lit(r), F.col(id_col))) / F.lit(HMOD)
        picked = scored.filter(
            coin < F.lit(float(oversample)) * F.col("_d2") / F.lit(float(cost))
        ).select(lon_col, lat_col).collect()
        centers.extend((float(p[0]), float(p[1])) for p in picked)

    # weight candidates by |closest points| — one distributed pass (the
    # candidate array rides the closure; O(rounds * l) entries, tiny)
    import numpy as np

    cand = np.array(centers, dtype=np.float64)
    cdf = F.array(*[F.struct(F.lit(cx).alias("cx"), F.lit(cy).alias("cy")) for cx, cy in centers])
    dists = F.transform(
        cdf,
        lambda c: (F.col(lon_col) - c["cx"]) * (F.col(lon_col) - c["cx"])
        + (F.col(lat_col) - c["cy"]) * (F.col(lat_col) - c["cy"]),
    )
    idx = F.array_position(
        dists, F.array_min(dists)
    )  # 1-based index of the nearest candidate
    wrows = pts.withColumn("_ci", idx).groupBy("_ci").count().collect()
    weights = np.zeros(len(cand))
    for rw in wrows:
        weights[int(rw["_ci"]) - 1] = rw["count"]
    pts.unpersist()

    # reduce candidates to k: deterministic weighted k-means++-style greedy
    # (heaviest first, then argmax of weight * d^2 to the chosen set — the
    # MAP variant of the ++ sampling step), refined by weighted Lloyd.
    chosen = [int(np.argmax(weights))]
    for _ in range(1, k):
        d = ((cand[:, None, :] - cand[chosen][None, :, :]) ** 2).sum(axis=2).min(axis=1)
        score = weights * d
        score[chosen] = -1.0
        chosen.append(int(np.argmax(score)))
    cent = cand[chosen].copy()
    for _ in range(20):
        d = ((cand[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        new = np.array(
            [
                np.average(cand[a == j], axis=0, weights=weights[a == j])
                if (weights[a == j].sum() > 0)
                else cent[j]
                for j in range(k)
            ]
        )
        if np.allclose(new, cent):
            break
        cent = new
    return [(float(x), float(y)) for x, y in cent]


def strip_weak_centroids(
    assign: DataFrame, keep: int, cluster_col: str = "cluster"
) -> DataFrame:
    """StripWeakCentroidsRunner analog (`analytics/mapreduce/.../kmeans/
    runner/StripWeakCentroidsRunner.java`): keep only the ``keep`` largest
    clusters' assignments — the weakest centroids (fewest members) are
    dropped between iterations of the multi-level clustering driver."""
    strong = (
        assign.groupBy(cluster_col)
        .count()
        .orderBy(F.col("count").desc(), F.col(cluster_col))
        .limit(keep)
        .select(cluster_col)
    )
    return assign.join(F.broadcast(strong), cluster_col, "left_semi")


def kmeans_jump(
    points: DataFrame,
    k_range: tuple[int, int] = (2, 8),
    max_iters: int = 8,
    id_col: str = "fid",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> tuple[int, dict[int, float]]:
    """Choose k by the distortion jump method (Sugar & James), the
    reference's KMeansJumpJobRunner: run Lloyd for each k in range (seeded
    with the k-means|| sampler, exactly as the reference's jump runner runs
    the sampled pipeline per k), compute the average per-point distortion
    D_k = mean(min d^2)/dims, transform J_k = D_k^(-dims/2) (dims=2 ->
    1/D_k), and pick the k with the largest jump J_k - J_{k-1}.  Returns
    (best_k, transformed distortions)."""
    dims = 2.0
    js: dict[int, float] = {}
    for k in range(max(k_range[0] - 1, 1), k_range[1] + 1):
        init = kmeans_parallel_init(points, k, id_col=id_col, lon_col=lon_col, lat_col=lat_col)
        assign, _ = kmeans(points, k, max_iters=max_iters, id_col=id_col,
                           lon_col=lon_col, lat_col=lat_col, init=init)
        d = assign.agg(F.avg("dist_sq")).collect()[0][0] or 1e-300
        js[k] = float((d / dims) ** (-dims / 2.0))
    best_k, best_jump = k_range[0], -float("inf")
    for k in range(k_range[0], k_range[1] + 1):
        jump = js[k] - js.get(k - 1, 0.0)
        if jump > best_jump:
            best_k, best_jump = k, jump
    return best_k, js


def _eps_edges(
    points: DataFrame,
    eps: float,
    id_col: str,
    lon_col: str,
    lat_col: str,
    cfg: SpatialConfig,
) -> DataFrame:
    """Symmetric epsilon-neighborhood edges (a != b) via the cell-bucketed
    self-join: left side explodes to expansion cells of its eps-ball, right
    side sits in its single home cell -> each (a, b) pair meets exactly once,
    no dedup shuffle (J1 pair-uniqueness invariant)."""
    bits = tier_for_distance(eps, cfg, margin_bits=2)
    pts = with_point_cells(points.select(id_col, lon_col, lat_col), lon_col, lat_col, cfg, cell_col="_pc")
    home = pts.withColumn("_cell", F.coalesce(cell_at_tier(F.col("_pc"), cfg.finest, bits), F.lit(-1)))
    left = (
        pts.withColumn(
            "_cell", F.explode(expansion_cells_udf(eps, bits, cfg)(F.col(lon_col), F.col(lat_col)))
        )
        .select(
            F.col(id_col).alias("a"),
            F.col(lon_col).alias("ax"),
            F.col(lat_col).alias("ay"),
            "_cell",
        )
    )
    right = home.select(
        F.col(id_col).alias("b"), F.col(lon_col).alias("bx"), F.col(lat_col).alias("by"), "_cell"
    )
    d2 = (F.col("ax") - F.col("bx")) ** 2 + (F.col("ay") - F.col("by")) ** 2
    return (
        left.join(right, "_cell")
        .filter(F.col("a") != F.col("b"))
        .withColumn("d2", d2)
        .filter(F.col("d2") <= eps * eps)
        .select("a", "b")
    )


def dbscan(
    points: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "fid",
    lon_col: str = "lon",
    lat_col: str = "lat",
    cfg: SpatialConfig = DEFAULT_CONFIG,
    max_rounds: int = 30,
    checkpointer=None,
) -> DataFrame:
    """DBSCAN via cell-bucketed edges + min-label propagation.

    Returns (id, cluster, is_core) — cluster is the min core-point id of the
    component (noise points absent).  min_pts counts the point itself
    (standard DBSCAN).  Label propagation runs over core-core edges only;
    border points attach to their minimum core neighbor's final label.
    """
    edges = _eps_edges(points, eps, id_col, lon_col, lat_col, cfg)
    return _cluster_from_edges(
        edges, min_pts, id_col, max_rounds, checkpointer=checkpointer
    )


def _cluster_from_edges(
    edges: DataFrame,
    min_pts: int,
    id_col: str,
    max_rounds: int = 30,
    checkpointer=None,
) -> DataFrame:
    """Density clustering over symmetric directed neighbor edges (a, b):
    the shared core of :func:`dbscan` (spatial eps) and :func:`st_dbscan`
    (spatial + temporal eps) — degree-thresholded cores, min-label
    propagation with pointer jumping over core-core edges, border points
    attached to their minimum core neighbor.

    ``checkpointer`` (a ``plans.lineage.RoundCheckpointer``) lands the
    core-core edge set as durable static state and each propagation
    round's labels as durable round state, so a killed run resumes at the
    last committed round."""
    edges = edges.cache()
    deg = edges.groupBy("a").agg(F.count("*").alias("_deg"))
    core = deg.filter(F.col("_deg") >= min_pts - 1).select(F.col("a").alias("id"))
    core = core.cache()

    cc_edges = (
        edges.join(core.withColumnRenamed("id", "a"), "a")
        .join(core.withColumnRenamed("id", "b"), "b")
        .select("a", "b")
    )

    labels = core.withColumn("label", F.col("id"))
    converged = False
    start_round = 0
    if checkpointer is not None:
        static = checkpointer.load_static("cc_edges")
        if static is not None:
            cc_edges = static[0]
        else:
            cc_edges, _ = checkpointer.save_static("cc_edges", cc_edges)
        resumed = checkpointer.resume()
        if resumed is not None:
            rno, dfs, extras = resumed
            labels = dfs["labels"]
            start_round = rno + 1
            if extras.get("done"):
                converged = True
    else:
        cc_edges = cc_edges.cache()
    for rnd in range(start_round, max_rounds):
        if converged:
            break
        # one propagation round: every core takes min(own, neighbors' labels)
        neigh = (
            cc_edges.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("a", "id")
        )
        stepped = (
            labels.join(neigh, "id", "left")
            .withColumn("new", F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))))
            .select("id", F.col("new").alias("label"))
        )
        # pointer-jumping (path halving): adopt the current label of your
        # label, so label chains collapse geometrically — total rounds are
        # O(log hop-diameter), not O(hop-diameter)
        parent = stepped.select(F.col("id").alias("label"), F.col("label").alias("_plabel"))
        new_labels = (
            stepped.join(parent, "label", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("_plabel"), F.col("label"))).alias(
                    "label"
                ),
            )
        )
        if checkpointer is not None:
            old = labels.withColumnRenamed("label", "old")
            seen: dict = {}

            def _extras(dfs: dict) -> dict:
                ch = (
                    dfs["labels"]
                    .join(old, "id")
                    .filter(F.col("label") != F.col("old"))
                    .take(1)
                )
                seen["changed"] = bool(ch)
                return {"done": not ch}

            labels = checkpointer.save_round(
                rnd, {"labels": new_labels}, extras_fn=_extras
            )["labels"]
            if not seen["changed"]:
                converged = True
                break
        else:
            # truncate the iterative lineage each round (stats-resetting:
            # plain localCheckpoint compounds estimated sizeInBytes across
            # rounds — see plans.lineage.truncate_plan)
            new_labels = truncate_plan(new_labels)
            changed = (
                new_labels.join(labels.withColumnRenamed("label", "old"), "id")
                .filter(F.col("label") != F.col("old"))
                .take(1)
            )
            labels = new_labels
            if not changed:
                converged = True
                break
    if not converged:
        raise RuntimeError(
            f"dbscan label propagation did not converge within {max_rounds} rounds; "
            "raise max_rounds (components this deep are pathological at sane eps)"
        )

    core_out = labels.select("id", "label", F.lit(True).alias("is_core"))
    border = (
        edges.join(core.withColumnRenamed("id", "b"), "b")  # b is core
        .join(core.withColumnRenamed("id", "a"), "a", "left_anti")  # a is not
        .groupBy("a")
        .agg(F.min("b").alias("attach"))
        .join(labels.withColumnRenamed("id", "attach"), "attach")
        .select(F.col("a").alias("id"), "label", F.lit(False).alias("is_core"))
    )
    out = core_out.unionByName(border).select(
        F.col("id").alias(id_col), F.col("label").alias("cluster"), "is_core"
    )
    return out


def _st_edges(
    points: DataFrame,
    eps_s: float,
    eps_t_s: float,
    id_col: str,
    lon_col: str,
    lat_col: str,
    ts_col: str,
) -> DataFrame:
    """Symmetric spatio-temporal epsilon edges (a != b): neighbors within
    ``eps_s`` planar degrees AND ``eps_t_s`` seconds.  Grid at (eps_s cell,
    eps_t bin); the left side explodes to its 9 spatial neighbors x 3 time
    bins (27 bounded copies), the right side keeps its exact key, so each
    ORDERED pair meets exactly once — the J1 pair-uniqueness invariant with
    time as a third dimension (`operators/cotravel.py` uses the same key
    with a one-sided orientation; DBSCAN needs both directions for the
    degree count)."""
    tau_u = int(eps_t_s * 1_000_000)
    pts = points.select(
        F.col(id_col).alias("_pid"),
        F.col(lon_col).cast("double").alias("x"),
        F.col(lat_col).cast("double").alias("y"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("tu"),
    )
    keyed = pts.select(
        "*",
        F.floor(F.col("x") / F.lit(float(eps_s))).cast("long").alias("cx"),
        F.floor(F.col("y") / F.lit(float(eps_s))).cast("long").alias("cy"),
        F.floor(F.col("tu") / F.lit(tau_u)).cast("long").alias("tb"),
    )
    offsets = F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"), F.lit(dy).alias("dy"), F.lit(dt).alias("dt")
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dt in (-1, 0, 1)
        ]
    )
    left = keyed.withColumn("_o", F.explode(offsets)).select(
        F.col("_pid").alias("a"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.col("tu").alias("ta"),
        (F.col("cx") + F.col("_o.dx")).alias("jx"),
        (F.col("cy") + F.col("_o.dy")).alias("jy"),
        (F.col("tb") + F.col("_o.dt")).alias("jt"),
    )
    right = keyed.select(
        F.col("_pid").alias("b"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("tu").alias("tb_u"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
        F.col("tb").alias("jt"),
    )
    d2 = (F.col("ax") - F.col("bx")) ** 2 + (F.col("ay") - F.col("by")) ** 2
    return (
        left.join(right, ["jx", "jy", "jt"])
        .filter(F.col("a") != F.col("b"))
        .filter(F.abs(F.col("ta") - F.col("tb_u")) <= F.lit(tau_u))
        .filter(d2 <= F.lit(float(eps_s) * float(eps_s)))
        .select("a", "b")
    )


def st_dbscan(
    points: DataFrame,
    eps_s: float,
    eps_t_s: float,
    min_pts: int,
    id_col: str = "fid",
    lon_col: str = "lon",
    lat_col: str = "lat",
    ts_col: str = "event_ts",
    max_rounds: int = 30,
    checkpointer=None,
) -> DataFrame:
    """ST-DBSCAN (Birant & Kut, Data & Knowledge Engineering 2007):
    density clustering where a neighbor must be within ``eps_s`` degrees
    AND ``eps_t_s`` seconds — the standard algorithm for event outbreaks,
    burst detection, and moving-cluster seeding over timestamped points.
    The reference indexes spatial-temporal constraints
    (`core/geotime/.../SpatialTemporalQuery.java`) but has no ST
    clustering; this composes the 3D bucketed edge join with the shared
    :func:`_cluster_from_edges` label propagation.

    Returns (id_col, cluster, is_core); cluster = min core id of the
    spatio-temporally connected component, noise absent.

    100 TB shape: identical to :func:`dbscan` — one bounded-fan-out
    equi-join builds edges (27x map-side copies, uniform (cell, bin)
    keys), label propagation is O(log diameter) rounds of core-core
    min-agg, border attachment one more join."""
    if eps_s <= 0 or eps_t_s <= 0:
        raise ValueError("eps_s and eps_t_s must be positive")
    edges = _st_edges(points, eps_s, eps_t_s, id_col, lon_col, lat_col, ts_col)
    return _cluster_from_edges(
        edges, min_pts, id_col, max_rounds, checkpointer=checkpointer
    )
