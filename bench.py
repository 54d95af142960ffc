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
]


def _force(df) -> int:
    """Materialize every output column without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def _scaling_input(spark, replicas: int = 20):
    """Deterministic large input: sf0.1 points replicated `replicas` times
    with distinct fids (4.8M points) — same bytes at every parallelism level."""
    from pyspark.sql import functions as F

    from geowave_spark.datagen import ensure_geo_tables

    d = ensure_geo_tables("sf0.1")
    pts = spark.read.parquet(str(d / "points.parquet"))
    reps = spark.range(replicas).select(F.col("id").alias("_rep"))
    big = (
        pts.crossJoin(F.broadcast(reps))
        .withColumn("fid", F.concat_ws("#", "fid", F.col("_rep").cast("string")))
        .drop("_rep")
        # the 240k-row source is one parquet file -> one input split; a real
        # 4.8M-point table would arrive as many files.  Fix the partition
        # count (identical at every parallelism level) so the measurement
        # exercises the engine, not the synthetic input's file layout.
        .repartition(256)
    )
    return big, spark.read.parquet(str(d / "zones.parquet"))


def run_scaling_job(cpus: str) -> None:
    """One scaling measurement (invoked per parallelism level in a fresh
    process): Hilbert encode + cell-bucketed PIP join + KDE pyramid over the
    replicated corpus; prints one JSON line with docs/sec."""
    from pyspark.sql import functions as F

    from geowave_spark.operators.kde import kde_pyramid
    from geowave_spark.operators.spatial_join import pip_join
    from geowave_spark.session import get_spark

    spark = get_spark("geowave-scaling", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    pts, zones = _scaling_input(spark)
    zones = zones.filter(F.col("zclass") == "convex")
    n = pts.count()  # also warms the input scan

    t0 = time.perf_counter()
    _force(pip_join(pts, zones).select("fid", "zone_id"))
    t_join = time.perf_counter() - t0

    t0 = time.perf_counter()
    _force(kde_pyramid(pts, min_level=4, max_level=7, tile_size=4))
    t_kde = time.perf_counter() - t0

    total = t_join + t_kde
    print(
        json.dumps(
            {
                "job": "scaling",
                "cpus": int(cpus),
                "n_points": n,
                "pip_join_sec": round(t_join, 3),
                "kde_sec": round(t_kde, 3),
                "total_sec": round(total, 3),
                "docs_per_sec": round(n / total, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = Path(sf_dir).name.replace("sf", "")

    from geowave_spark.datagen import ensure_geo_tables, geo_dir_for
    from geowave_spark.queries import QUERIES
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

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        _force(QUERIES[name](spark, sf_dir))
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    join_sec = times["pip_join"] + times["pip_join_tiered"] + times["zonal_stats"]
    print(
        json.dumps(
            {
                "metric": "geo headline suite wall time (9 queries)",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": int(cpus) if cpus.isdigit() else cpus,
                "n_points": n_points,
                "n_docs": n_docs,
                "pip_join_docs_per_sec": round(3 * n_points / join_sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-job":
        run_scaling_job(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    else:
        main()
