"""Hot-cell skew demonstration at bench scale (K7 evidence).

Builds a deliberately skewed corpus — one cell holding ~20% of all points,
planted at a real zone's centroid so the hot rows survive the join and hit
the refine — and measures the shuffle-path PIP join three ways:

  1. plain shuffle join, AQE off        (the straggler baseline)
  2. explicit hot-cell salting, AQE off (pip_join salt_hot=...)
  3. plain shuffle join, AQE on         (skew-join split at runtime)

Broadcast joins don't suffer reducer skew (the probe side never shuffles),
so the demo forces broadcast_zones=False — the regime a 10^12-doc zone
layer actually lives in.  Results are recorded in BENCH/BASELINE.md.

Usage: python tools/skew_demo.py [n_points] [hot_frac]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
HOT_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.20
BUCKETS = 16


def _corpus_path() -> Path:
    from geowave_spark.datagen import GEO_DATA_ROOT

    return GEO_DATA_ROOT / f"skew_demo_{N_POINTS}_{int(HOT_FRAC * 100)}"


def build_corpus(spark, zones) -> str:
    """Deterministic skewed corpus: (1-hot_frac) uniform world, hot_frac in a
    sigma=0.005 deg blob at the largest convex zone's centroid."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from geowave_spark.geometry.wkt import geom_bbox, parse_wkt

    out = _corpus_path()
    if (out / "_DONE").exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)

    # hotspot: the point covered by the MOST zone bboxes — every covering
    # zone becomes a candidate pair for every hot row, so this is the
    # worst-case refine fan-out a skewed corpus can produce
    rows = zones.select("geom_wkt").collect()
    gw, gh = 720, 360
    grid = np.zeros((gh, gw), dtype=np.int32)
    for r in rows:
        minx, miny, maxx, maxy = geom_bbox(parse_wkt(r.geom_wkt))
        x0 = int(np.clip((minx + 180.0) / 360.0 * gw, 0, gw - 1))
        x1 = int(np.clip((maxx + 180.0) / 360.0 * gw, 0, gw - 1))
        y0 = int(np.clip((miny + 90.0) / 180.0 * gh, 0, gh - 1))
        y1 = int(np.clip((maxy + 90.0) / 180.0 * gh, 0, gh - 1))
        grid[y0 : y1 + 1, x0 : x1 + 1] += 1
    yy, xx = np.unravel_index(np.argmax(grid), grid.shape)
    hx = (xx + 0.5) / gw * 360.0 - 180.0
    hy = (yy + 0.5) / gh * 180.0 - 90.0
    print(f"hotspot ({hx:.2f}, {hy:.2f}) under {grid[yy, xx]} zone bboxes")

    rng = np.random.RandomState(42)
    n_hot = int(N_POINTS * HOT_FRAC)
    n_cold = N_POINTS - n_hot
    lon = np.concatenate(
        [rng.uniform(-179.9, 179.9, n_cold), hx + rng.normal(0.0, 0.005, n_hot)]
    )
    lat = np.concatenate(
        [rng.uniform(-89.9, 89.9, n_cold), hy + rng.normal(0.0, 0.005, n_hot)]
    )
    order = rng.permutation(N_POINTS)  # interleave hot/cold across files
    lon, lat = lon[order], lat[order]
    fid = np.array([f"s{i:08d}" for i in range(N_POINTS)])
    # ingest-time SFC encode (the deployment shape: tables carry their key
    # columns from ingest), so the measured region is the JOIN, not the
    # uniformly-parallel encode UDF
    from geowave_spark.sfc import DEFAULT_CONFIG, point_keys

    _, cells = point_keys(lon, lat, DEFAULT_CONFIG)
    files = 32
    step = N_POINTS // files
    for j in range(files):
        lo, hi = j * step, (j + 1) * step if j < files - 1 else N_POINTS
        pq.write_table(
            pa.table(
                {
                    "fid": fid[lo:hi],
                    "lon": lon[lo:hi],
                    "lat": lat[lo:hi],
                    "cell": cells[lo:hi],
                }
            ),
            out / f"part-{j:03d}.parquet",
        )
    (out / "_DONE").write_text("ok\n")
    return str(out)


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    import os

    from pyspark.sql import functions as F

    from geowave_spark.datagen import ensure_geo_tables
    from geowave_spark.operators.spatial_join import pip_join
    from geowave_spark.session import get_spark

    extra = {}
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/geowave-skew-local"
    spark = get_spark(
        "skew-demo", master="local[32]", shuffle_partitions=64, extra=extra
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = ensure_geo_tables("sf0.1")
    zones = spark.read.parquet(str(d / "zones.parquet")).filter(
        F.col("zclass") == "convex"
    )
    pts = spark.read.parquet(build_corpus(spark, zones))
    pts.count()  # page-cache warm

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def run(aqe: bool, salt: bool, skew_tuned: bool = False):
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        # AQE's skew split never fires at demo scale on DEFAULT thresholds
        # (256 MB skewedPartitionThresholdInBytes >> the hot partition);
        # the tuned variant sizes them to the corpus, as a cluster job would
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8m" if skew_tuned else "256m",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "4m" if skew_tuned else "64m",
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "2" if skew_tuned else "5",
        )
        # forbid AQE from silently converting to broadcast (the demo measures
        # the shuffle regime a 10^12-doc layer lives in)
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1" if aqe else "64m"
        )
        kw = dict(broadcast_zones=False, point_cell_col="cell")
        if salt:
            kw.update(salt_hot=(max(N_POINTS // 50, 10_000), BUCKETS), salt_id_col="fid")
        sel = lambda: force(pip_join(pts, zones, **kw).select("fid", "zone_id"))  # noqa: E731
        sel()  # warmup (python workers, codegen)
        return min(timed(sel) for _ in range(2))

    results = {
        "plain_aqe_off": round(run(aqe=False, salt=False), 2),
        "salted_aqe_off": round(run(aqe=False, salt=True), 2),
        "plain_aqe_tuned": round(run(aqe=True, salt=False, skew_tuned=True), 2),
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    print(
        json.dumps(
            {
                "job": "skew-demo",
                "n_points": N_POINTS,
                "hot_frac": HOT_FRAC,
                "buckets": BUCKETS,
                "shuffle_partitions": 64,
                **results,
                "salting_speedup": round(
                    results["plain_aqe_off"] / results["salted_aqe_off"], 2
                ),
                "aqe_speedup": round(
                    results["plain_aqe_off"] / results["plain_aqe_tuned"], 2
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
