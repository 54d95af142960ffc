"""Resumable raster ingest pipeline: coverages -> tiles -> mosaic -> summary.

The raster twin of `docs_pipeline`: every stage is a checkpointed
`Pipeline.stage` (manifest-committed parquet, per-partition counters), so a
failed mosaic rerun resumes after the chop, and changing the pyramid flag
invalidates exactly the chop and everything downstream — the
MapReduceJobController chaining contract applied to the
RasterDataAdapter path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from geowave_spark.operators.raster import mosaic_summary, mosaic_tiles, raster_tiles
from geowave_spark.plans.lineage import Pipeline


def run_raster_pipeline(
    spark: SparkSession,
    coverages_path: str,
    checkpoint_root: str,
    build_pyramid: bool = False,
) -> tuple[Pipeline, DataFrame]:
    """Returns (pipeline with stage summaries, per-cell mosaic summary)."""
    pipe = Pipeline(spark, checkpoint_root)

    covs = spark.read.parquet(coverages_path)
    tiles = pipe.stage(
        "10_tiles",
        {"src": coverages_path, "pyramid": build_pyramid},
        lambda: raster_tiles(covs, build_pyramid=build_pyramid),
        partition_by=["tier"],
    )
    merged = pipe.stage(
        "20_mosaic",
        {"strategy": "nodata-latest-wins"},
        lambda: mosaic_tiles(tiles),
        partition_by=["tier"],
    )
    summary = pipe.stage(
        "30_summary",
        {},
        lambda: mosaic_summary(merged),
    )
    return pipe, summary
