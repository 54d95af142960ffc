"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"pip_join": sec, ...}, "sf": 0.1,
     "docs_per_sec": ..., "cpus": N}

Execution is forced with the noop datasource writer so every column of every
operator output is actually computed (no count-only column pruning), while
nothing is collected to the driver.

Scaling-efficiency protocol (BENCH/BASELINE.md): run this same script twice,
``SPARK_GRAFT_CPUS=8`` then ``SPARK_GRAFT_CPUS=32``, on the same sf dir; the
two-cluster-size criterion (N vs 4N executors) is evidenced by
throughput(32)/ (4 x throughput(8)) >= 0.8 for the join-heavy headliners.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

# the headline set: index/scan, PIP join (flagship), kNN, KDE tiling, docs
# pipeline, zonal agg — the surfaces BASELINE.json names
HEADLINE = [
    "spatial_box_query",
    "spatial_polygon_query",
    "pip_join",
    "pip_join_tiered",
    "zonal_stats",
    "knn_join",
    "kde_tiles",
    "docs_box_query",
    "spans_preserved",
    # training-data pipeline headliners (documents/embeddings tables)
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    # round-2 additions: raster ingest path + exact areal refine + s2 cells
    "raster_tiling",
    "docs_polygon_query",
    "s2_cell_counts",
    # round-3 additions: seasonal comparison KDE (R8) + the hex (H3-family)
    # cell backend and the north star's named H3-ring-expansion kNN
    "kde_comparison",
    "hex_cell_counts",
    "knn_hexring",
    # the north star's "encode to H3/S2 cells -> cell-bucketed PIP join",
    # bucketed on hex cells end to end (same refine, same result rows)
    "pip_join_hex",
    # round-4 additions: CQL string -> constraint extraction -> cost-based
    # routed scan, the K6 bias keys (compact Hilbert, unequal bits), the
    # K2 range scan over those keys, and the areal-binding CQL refine
    "cql_spatial_routed",
    "st_insertion_biased",
    "st_biased_box_query",
    "cql_docs_bbox",
    # round-4 continuation: spatial statistics (cells-only neighborhood
    # join, corpus scanned once) + the PIP-join-fed per-entity transition
    # window — both shapes a 100-TB movement corpus runs constantly
    "hotspot_gi_star",
    "geofence_transitions",
    # round-4 continuation: the movement/analytics/pipeline wave — pairwise
    # co-travel over the bucketed space-time self-join, regular-cadence
    # resampling, Horn terrain derivatives, colocation participation, the
    # sliding-k-gram dup-span audit, and DSIR importance resampling
    "cotravel_pairs",
    "track_resample",
    "terrain_slope",
    "colocation_pi",
    "substring_dup_spans",
    "dsir_resample",
    # round-4 final wave: raster->vector contouring chained through
    # connected components, BM25 ranked retrieval over the doc corpus,
    # and the density-adaptive quadtree layout (shrinking split frontier)
    "contour_polylines",
    "bm25_search",
    "adaptive_quadtree",
    # round-4 closing wave: PMI collocations (zero-join window pairs),
    # the snap-contracted track network's delta-frontier SSSP, and raster
    # regionization through the shared connected-components core
    "pmi_collocations",
    "track_sssp",
    "region_label",
]


def _force(df) -> int:
    """Materialize every output column without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _scaling_input(spark, replicas: int = 20):
    """Deterministic large input: sf0.1 points replicated `replicas` times
    with distinct fids (4.8M points), materialized once as `replicas` x 4
    parquet files so the scan parallelizes like any real multi-file table —
    identical bytes at every parallelism level, no in-job synthesis shuffle
    polluting the measurement."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from geowave_spark.datagen import GEO_DATA_ROOT, ensure_geo_tables

    d = ensure_geo_tables("sf0.1")
    out = GEO_DATA_ROOT / f"scaling_x{replicas}"
    marker = out / "_DONE"
    if not marker.exists():
        out.mkdir(parents=True, exist_ok=True)
        src = pq.read_table(d / "points.parquet")
        n = src.num_rows
        for rep in range(replicas):
            fid = pc.binary_join_element_wise(src["fid"], pa.scalar(f"#{rep}"), "")
            t = src.set_column(src.schema.get_field_index("fid"), "fid", fid)
            # 4 files per replica -> replicas*4 input splits
            q = n // 4
            for j in range(4):
                lo, hi = j * q, (j + 1) * q if j < 3 else n
                pq.write_table(t.slice(lo, hi - lo), out / f"part-{rep:03d}-{j}.parquet")
        marker.write_text("ok\n")
    return (
        spark.read.parquet(str(out)),
        spark.read.parquet(str(d / "zones.parquet")),
    )


def run_scaling_job(cpus: str, replicas: int = 80, repeats: int = 3) -> None:
    """One scaling measurement (invoked per parallelism level in a fresh
    process): Hilbert encode + cell-bucketed PIP join + KDE pyramid over the
    replicated corpus (replicas x sf0.1 = 19.2M points by default); prints
    one JSON line with docs/sec.

    Protocol notes (see BENCH/BASELINE.md):
    - warmup first (python worker fork + pandas import is a per-worker fixed
      cost a long-lived cluster amortizes; it must not sit inside the timed
      region of a scaling comparison);
    - best-of-`repeats`: the sandbox VM shows bimodal host interference
      (identical back-to-back runs vary 2.5s..24s), so the minimum is the
      engine's time, the rest is the neighbor's.
    """
    from pyspark.sql import functions as F

    from geowave_spark.operators.kde import kde_pyramid
    from geowave_spark.operators.spatial_join import pip_join
    from geowave_spark.session import get_spark

    from geowave_spark.datagen import GEO_DATA_ROOT
    from geowave_spark.operators.indexing import with_point_cells

    # shuffle on tmpfs: local-mode disk does not scale with cores the way a
    # cluster's N local disks do — memory-backed shuffle restores that
    extra = {}
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/geowave-spark-local"
    # 4 shuffle partitions per core AT EVERY LEVEL (same rule both runs):
    # multiple waves absorb stragglers, which otherwise dominate the
    # single-wave high-core run and corrupt the scaling ratio
    spark = get_spark(
        "geowave-scaling",
        master=f"local[{cpus}]",
        shuffle_partitions=4 * max(int(cpus), 1),
        extra=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    raw, zones = _scaling_input(spark, replicas=replicas)
    zones = zones.filter(F.col("zclass") == "convex")

    # ingest once (the deployment shape: tables carry their SFC key columns
    # from ingest; GeoWave likewise encodes at ingest, not per query) —
    # timed and reported separately as the ingest metric
    idx_path = GEO_DATA_ROOT / f"scaling_x{replicas}_indexed"
    # ingest writes to tmpfs: the sandbox's single virtual disk serializes
    # concurrent writers (a cluster has one local disk per executor)
    tmp_root = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    tmp_idx = f"{tmp_root}/geowave-ingest-{cpus}"
    # warm every python worker + the input page cache before timing ingest
    warm_raw = raw.limit(200_000).repartition(4 * max(int(cpus), 1))
    _force(with_point_cells(warm_raw, cell_col="cell").select("cell"))
    raw.count()
    t_ingest = min(
        _timed(
            lambda: with_point_cells(raw, cell_col="cell")
            .drop("tier")
            .write.mode("overwrite")
            .parquet(tmp_idx)
        )
        for _ in range(repeats)
    )
    if not (idx_path / "_SUCCESS").exists():
        import shutil as _sh

        _sh.move(tmp_idx, str(idx_path))
    else:
        import shutil as _sh

        _sh.rmtree(tmp_idx, ignore_errors=True)
    pts = spark.read.parquet(str(idx_path))
    n = pts.count()  # warms the input scan

    warm = pts.limit(200_000).repartition(4 * max(int(cpus), 1)).cache()
    warm.count()
    _force(pip_join(warm, zones, point_cell_col="cell").select("fid", "zone_id"))
    _force(kde_pyramid(warm, min_level=4, max_level=5, tile_size=4))
    warm.unpersist()

    t_join = min(
        _timed(
            lambda: _force(
                pip_join(pts, zones, point_cell_col="cell").select("fid", "zone_id")
            )
        )
        for _ in range(repeats)
    )
    t_kde = min(
        _timed(lambda: _force(kde_pyramid(pts, min_level=4, max_level=7, tile_size=4)))
        for _ in range(repeats)
    )

    total = t_join + t_kde
    print(
        json.dumps(
            {
                "job": "scaling",
                "cpus": int(cpus),
                "n_points": n,
                "ingest_index_sec": round(t_ingest, 3) if t_ingest else None,
                "pip_join_sec": round(t_join, 3),
                "kde_sec": round(t_kde, 3),
                "total_sec": round(total, 3),
                "docs_per_sec": round(n / total, 1),
                "repeats": repeats,
            }
        )
    )
    spark.stop()


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _burn(_):
    s = 0
    for i in range(12_000_000):
        s += i * i
    return s


def run_cpu_probe() -> None:
    """Engine-independent host-ceiling probe for the scaling protocol: an
    embarrassingly parallel pure-python workload (no Spark, no IO, no
    shuffle) at 8 and 32 processes.  Whatever weak-scaling efficiency THIS
    shows is the physical ceiling the sandbox VM grants any engine at that
    pair — Spark numbers are judged relative to it (BENCH/BASELINE.md)."""
    from multiprocessing import Pool

    out = {}
    for procs, tasks in ((8, 32), (32, 128)):
        with Pool(procs) as p:
            p.map(_burn, range(procs))  # warm forks
            t = min(_timed(lambda: p.map(_burn, range(tasks))) for _ in range(3))
        out[procs] = tasks / t
    print(
        json.dumps(
            {
                "job": "cpu-probe",
                "throughput_8": round(out[8], 2),
                "throughput_32": round(out[32], 2),
                "host_ceiling_8_to_32": round(out[32] / (4 * out[8]), 3),
            }
        )
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = Path(sf_dir).name.replace("sf", "")

    from geowave_spark.datagen import ensure_geo_tables, geo_dir_for
    from geowave_spark.queries import ALL_QUERIES as QUERIES
    from geowave_spark.session import get_spark

    geo_dir = geo_dir_for(sf_dir)  # generate fixtures outside the timed region
    n_docs = sum(1 for _ in ())  # placeholder; counted below via parquet meta
    import pyarrow.parquet as pq

    n_points = pq.read_metadata(geo_dir / "points.parquet").num_rows
    n_docs = pq.read_metadata(geo_dir / "docs.parquet").num_rows

    spark = get_spark("geowave-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/Arrow warmup on the smallest scale so per-query timings measure the
    # plan, not interpreter/codegen startup
    ensure_geo_tables("sf0.001")
    _force(QUERIES["pip_join"](spark, "/root/testdata/sf0.001"))

    # warmup + min-of-N per query: the sandbox VM shows bimodal host
    # interference (identical runs vary well over 2x in bad windows), so the
    # minimum is the engine's time and the rest is the neighbor's — one noisy
    # window must not define a round's number of record
    repeats = max(int(os.environ.get("SPARK_GRAFT_REPEATS", "3")), 1)
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        _force(fn(spark, sf_dir))  # warmup: page cache + python workers + codegen
        times[name] = round(
            min(_timed(lambda: _force(fn(spark, sf_dir))) for _ in range(repeats)), 3
        )

    total = round(sum(times.values()), 3)
    join_sec = times["pip_join"] + times["pip_join_tiered"] + times["zonal_stats"]
    print(
        json.dumps(
            {
                "metric": f"headline suite wall time ({len(HEADLINE)} queries)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": int(cpus) if cpus.isdigit() else cpus,
                "n_points": n_points,
                "n_docs": n_docs,
                "pip_join_docs_per_sec": round(3 * n_points / join_sec, 1),
                "timing": {"warmup": 1, "repeats": repeats, "stat": "min"},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-job":
        run_scaling_job(
            os.environ.get("SPARK_GRAFT_CPUS", "32"),
            replicas=int(os.environ.get("SPARK_GRAFT_REPLICAS", "80")),
        )
    elif len(sys.argv) > 1 and sys.argv[1] == "--cpu-probe":
        run_cpu_probe()
    else:
        main()
