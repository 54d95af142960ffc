"""Movement-family operators at the spatial family's 4.8M-ping stress scale.

cotravel/convoy/moving-clusters were perf-tuned at sf0.1 (~0.5M pings) but —
unlike the hotspot and dedup families — never run at the 4.8M-point scale
with straggler ratios recorded.  This demo closes that gap with the same
protocol as tools/spatial_stats_scale_demo.py: a deterministic corpus ~10x
the sf0.1 headline, wall time + throughput per operator, and the max/median
task-time ratio of the heaviest stage via the Spark REST API.

The corpus is adversarial in the ways a real movement table is:
  - 30% of tracks start inside 8 dense metro blobs (spatial skew on the
    cotravel (cell, tau-bin) join keys and the snapshot-cluster cells);
  - 10% of tracks are planted companions — a twin of another track with
    <= 0.04 deg jitter and the same time window — so the co-travel joins
    produce real sustained pairs (output is never trivially empty);
  - the rest are independent random walks, so the candidate join stays
    output-sensitive instead of exploding.

Usage: python tools/movement_scale_demo.py [n_tracks] [verts_per_track]
Defaults 240_000 x 20 = 4.8M pings.  Results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from spatial_stats_scale_demo import straggler_ratio  # noqa: E402  (shared probe)

N_TRACKS = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
N_VERTS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
N_PINGS = N_TRACKS * N_VERTS


def _corpus_path() -> Path:
    from geowave_spark.datagen import GEO_DATA_ROOT

    return GEO_DATA_ROOT / f"movement_demo_{N_TRACKS}_{N_VERTS}"


def build_corpus() -> str:
    """Deterministic tracks table (fid, geom_wkt, start_ts, end_ts) matching
    the fixture schema the movement queries consume."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = _corpus_path()
    if (out / "_DONE").exists():
        return str(out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(20260820)

    n_blob = int(N_TRACKS * 0.3)
    centers = rng.uniform([-140, -45], [140, 45], size=(8, 2))
    which = rng.integers(0, 8, n_blob)
    sx = np.empty(N_TRACKS)
    sy = np.empty(N_TRACKS)
    sx[:n_blob] = centers[which, 0] + rng.normal(0, 2.0, n_blob)
    sy[:n_blob] = centers[which, 1] + rng.normal(0, 2.0, n_blob)
    sx[n_blob:] = rng.uniform(-149, 149, N_TRACKS - n_blob)
    sy[n_blob:] = rng.uniform(-49, 49, N_TRACKS - n_blob)

    # random-walk vertices: (n_tracks, n_verts)
    steps_x = rng.normal(0, 0.3, (N_TRACKS, N_VERTS - 1))
    steps_y = rng.normal(0, 0.3, (N_TRACKS, N_VERTS - 1))
    vx = np.cumsum(np.concatenate([sx[:, None], steps_x], axis=1), axis=1)
    vy = np.cumsum(np.concatenate([sy[:, None], steps_y], axis=1), axis=1)

    # time windows: start uniform over 2 years, duration 1-5 days
    t0 = rng.integers(1_500_000_000, 1_563_000_000, N_TRACKS)
    dur = rng.integers(86_400, 5 * 86_400, N_TRACKS)

    # plant companions: the last 10% of tracks shadow a random earlier track
    n_comp = N_TRACKS // 10
    host = rng.integers(0, N_TRACKS - n_comp, n_comp)
    tail = slice(N_TRACKS - n_comp, N_TRACKS)
    vx[tail] = vx[host] + rng.uniform(-0.04, 0.04, (n_comp, N_VERTS))
    vy[tail] = vy[host] + rng.uniform(-0.04, 0.04, (n_comp, N_VERTS))
    t0[tail] = t0[host]
    dur[tail] = dur[host]

    vx = np.clip(vx, -179.9, 179.9)
    vy = np.clip(vy, -89.9, 89.9)

    wkt = [
        "LINESTRING ("
        + ", ".join(f"{vx[i, j]:.6f} {vy[i, j]:.6f}" for j in range(N_VERTS))
        + ")"
        for i in range(N_TRACKS)
    ]
    tbl = pa.table(
        {
            "fid": pa.array([f"t{i:07d}" for i in range(N_TRACKS)]),
            "geom_wkt": pa.array(wkt),
            "start_ts": pa.array(t0 * 1_000_000, type=pa.timestamp("us")),
            "end_ts": pa.array((t0 + dur) * 1_000_000, type=pa.timestamp("us")),
        }
    )
    pq.write_table(tbl, out / "tracks.parquet", row_group_size=20_000)
    (out / "_DONE").touch()
    return str(out)


def main() -> None:
    from geowave_spark.operators.cotravel import (
        convoy_pairs,
        cotravel_pairs,
        moving_clusters,
    )
    from geowave_spark.operators.trajectory import resample_tracks
    from geowave_spark.session import get_spark

    spark = get_spark(extra={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    corpus = build_corpus()
    tracks = spark.read.parquet(f"{corpus}/tracks.parquet")

    def run(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        n = df.count()
        dt = time.time() - t0
        print(
            f"{name}: {dt:.2f}s, {n} rows, {N_PINGS / dt:,.0f} pings/sec, "
            f"straggler max/med {straggler_ratio(spark)}"
        )

    print(f"corpus: {N_TRACKS:,} tracks x {N_VERTS} verts = {N_PINGS:,} pings")
    run("track_resample ", resample_tracks(tracks, step_s=4 * 3600))
    run("cotravel_pairs ", cotravel_pairs(tracks, radius_deg=0.2, tau_s=14_400))
    run("convoy_pairs   ", convoy_pairs(tracks, radius_deg=0.2, tau_s=14_400, min_len=2))
    run(
        "moving_clusters",
        moving_clusters(
            tracks, eps_deg=0.5, bin_s=7 * 86_400, min_pts=3, theta_ppm=100_000
        ),
    )
    spark.stop()


if __name__ == "__main__":
    main()
