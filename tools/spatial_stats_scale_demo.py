"""Spatial-statistics / movement operators at bench scale.

The hotspot/interpolation family's claims are (a) the corpus is scanned
exactly ONCE per query (the cell table is localCheckpoint-materialized and
everything downstream works on cells, not points) and (b) no stage's task
distribution degrades under a clustered corpus (the neighborhood join keys
on cells, which smooth the point-level skew).  The geofence claim is that
the transition scan is one PIP join plus one entity-keyed window whose
partitions stay uniform when entities are uniform.

This demo measures all of it on a deterministic corpus 20-80x the sf0.1
headline: a Gaussian-mixture world (so cells are genuinely non-uniform —
the Gi*/Moran statistics are non-trivial) with ENTITIES distributed
uniformly across pings.  Reports wall time, rows, throughput, and the
max/median task-time ratio of the heaviest stage (straggler check via the
Spark REST API, the dedup_scale_demo protocol).

Usage: python tools/spatial_stats_scale_demo.py [n_points] [n_entities]
Results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_800_000
N_ENTITIES = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000


def _corpus_path() -> Path:
    from geowave_spark.datagen import GEO_DATA_ROOT

    return GEO_DATA_ROOT / f"stats_demo_{N_POINTS}_{N_ENTITIES}"


def build_corpus(spark) -> str:
    """Deterministic clustered pings: 12 Gaussian metro blobs + a uniform
    background, entity ids uniform, timestamps uniform over 2 years."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = _corpus_path()
    if (out / "_DONE").exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(20260819)
    n_blob = int(N_POINTS * 0.7)
    centers = rng.uniform([-150, -50], [150, 50], size=(12, 2))
    which = rng.integers(0, 12, n_blob)
    lon = np.empty(N_POINTS)
    lat = np.empty(N_POINTS)
    lon[:n_blob] = centers[which, 0] + rng.normal(0, 3.0, n_blob)
    lat[:n_blob] = centers[which, 1] + rng.normal(0, 3.0, n_blob)
    lon[n_blob:] = rng.uniform(-179.9, 179.9, N_POINTS - n_blob)
    lat[n_blob:] = rng.uniform(-89.9, 89.9, N_POINTS - n_blob)
    lon = np.clip(lon, -179.9, 179.9)
    lat = np.clip(lat, -89.9, 89.9)
    ent = rng.integers(0, N_ENTITIES, N_POINTS)
    ts = np.sort(rng.integers(1_500_000_000_000, 1_563_000_000_000, N_POINTS))
    mag = rng.uniform(0.0, 10.0, N_POINTS)
    tbl = pa.table(
        {
            "fid": pa.array([f"p{i:09d}" for i in range(N_POINTS)]),
            "lon": lon,
            "lat": lat,
            "event_ts": pa.array(ts, type=pa.timestamp("ms")),
            "magnitude": mag,
            "category": pa.array([f"ent{e:06d}" for e in ent]),
        }
    )
    pq.write_table(tbl, out / "points.parquet", row_group_size=200_000)
    (out / "_DONE").touch()
    return str(out)


def straggler_ratio(spark) -> float:
    """max/median task time of the heaviest completed stage (REST API)."""
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
            stages = json.load(r)
        heavy = max(stages, key=lambda s: s.get("executorRunTime", 0))
        sid, att = heavy["stageId"], heavy["attemptId"]
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}/taskSummary"
            "?quantiles=0.5,1.0"
        ) as r:
            q = json.load(r)
        med, mx = q["executorRunTime"]
        return round(mx / max(med, 1.0), 2)
    except Exception as ex:  # UI disabled / endpoint drift: report, don't fail
        print(f"  straggler probe unavailable: {ex}")
        return float("nan")


def main() -> None:
    from pyspark.sql import functions as F

    from geowave_spark.operators.geofence import geofence_transitions
    from geowave_spark.operators.hotspot import gi_star, morans_i
    from geowave_spark.operators.interpolate import idw_grid
    from geowave_spark.session import get_spark

    spark = get_spark(extra={"spark.ui.enabled": "true"})
    corpus = build_corpus(spark)
    pts = spark.read.parquet(f"{corpus}/points.parquet")
    from geowave_spark.datagen import ensure_geo_tables

    zones = spark.read.parquet(
        str(ensure_geo_tables("sf0.01") / "zones.parquet")
    ).filter(F.col("zclass") == "convex")

    def run(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        n = df.count()
        dt = time.time() - t0
        print(
            f"{name}: {dt:.2f}s, {n} rows, {N_POINTS / dt:,.0f} pts/sec, "
            f"straggler max/med {straggler_ratio(spark)}"
        )

    print(f"corpus: {N_POINTS:,} pings, {N_ENTITIES:,} entities")
    run("gi_star      ", gi_star(pts, cell_deg=1.0))
    run("morans_i     ", morans_i(pts, cell_deg=1.0))
    run("idw_grid     ", idw_grid(pts, cell_deg=1.0))
    run("geofence     ", geofence_transitions(pts, zones))
    spark.stop()


if __name__ == "__main__":
    main()
