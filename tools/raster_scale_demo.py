"""The round-4 closing wave's iterative operators at bench scale.

The new family's scale claims:

- **marching_squares / contour_polylines**: the corpus is touched ONCE
  (the cell grid is the input to everything downstream); the iterative
  connected-components rounds operate on SEGMENT-sized data (thousands of
  rows however big the corpus), so their per-round fixed cost is constant
  in corpus size.
- **region_label**: same — edges live on the CELL table.
- **adaptive_quadtree**: the split frontier SHRINKS every round (points
  retire into leaves), so round t's shuffle moves at most the points
  under still-oversized cells.
- **bm25 / pmi / diversity / periodicity**: single-scan aggregations with
  bounded fan-out (measured in the headline bench; not repeated here).

This demo runs the contour chain, regionization and the quadtree on the
same deterministic 4.8M-ping Gaussian-mixture corpus the spatial-stats
demo uses (12 metro blobs + uniform background — dense clusters force
deep quadtree splits and non-trivial contour topology), reporting wall
time, output rows, throughput and the straggler ratio of the heaviest
stage (the dedup-demo REST protocol).

Usage: python tools/raster_scale_demo.py [n_points]
Results recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tools.spatial_stats_scale_demo as base  # noqa: E402

N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_800_000
base.N_POINTS = N_POINTS
base.N_ENTITIES = 20_000


def main() -> None:
    from geowave_spark.operators.contour import contour_polylines, marching_squares
    from geowave_spark.operators.hotspot import cell_counts
    from geowave_spark.operators.quadtree import adaptive_quadtree
    from geowave_spark.operators.regionize import region_label
    from geowave_spark.session import get_spark

    spark = get_spark(extra={"spark.ui.enabled": "true"})
    corpus = base.build_corpus(spark)
    pts = spark.read.parquet(f"{corpus}/points.parquet")

    def run(name, build):
        # time CONSTRUCTION + execution: the iterative operators do their
        # checkpointed rounds eagerly while the DataFrame is being built
        t0 = time.time()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        n = df.count()
        dt = time.time() - t0
        print(
            f"{name}: {dt:.2f}s, {n} rows, {N_POINTS / dt:,.0f} pts/sec, "
            f"straggler max/med {base.straggler_ratio(spark)}",
            flush=True,
        )

    print(f"corpus: {N_POINTS:,} pings")
    # θ at the blob shoulder (avg cell holds ~74 points; the 12 metro
    # blobs reach thousands) so the level set has real topology, and the
    # region grid thresholds the same way so regions = the dense blobs,
    # not one world-sized component
    grid = cell_counts(pts, 1.0).localCheckpoint()
    dense = grid.filter("x >= 200").localCheckpoint()
    run("marching_squares ", lambda: marching_squares(grid, theta=200.5))
    run(
        "contour_polylines",
        lambda: contour_polylines(marching_squares(grid, theta=200.5)),
    )
    run("region_label     ", lambda: region_label(dense))
    run("adaptive_quadtree", lambda: adaptive_quadtree(pts, 200, 3, 12))
    spark.stop()


if __name__ == "__main__":
    main()
