"""The flagship end-to-end pipeline: interleaved docs -> indexed table ->
spatial join -> zonal rollup, with checkpointed lineage at every stage.

This is the composition the north rule describes: span->geometry extraction,
cell encoding, cell-bucketed PIP join, per-zone aggregation — each stage a
`Pipeline.stage` (manifest-committed parquet + per-partition row counters),
so a rerun resumes after the last completed stage and a config change
invalidates exactly the downstream stages.  The spans column travels intact
through every stage that carries documents (the per-row invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geowave_spark.extract import with_geometry
from geowave_spark.operators.indexing import with_point_cells
from geowave_spark.operators.spatial_join import pip_join
from geowave_spark.plans.lineage import Pipeline


def run_docs_pipeline(
    spark: SparkSession,
    docs_path: str,
    zones_path: str,
    checkpoint_root: str,
    box: tuple[float, float, float, float] | None = None,
) -> tuple[Pipeline, DataFrame]:
    """Returns (pipeline with stage summaries, zonal rollup DataFrame)."""
    pipe = Pipeline(spark, checkpoint_root)

    docs = spark.read.parquet(docs_path)
    extracted = pipe.stage(
        "10_extract",
        {"src": docs_path},
        lambda: with_geometry(docs),
    )

    indexed = pipe.stage(
        "20_index",
        {"backend": "hilbert", "point_only": True},
        lambda: with_point_cells(
            extracted.filter(F.col("cx").isNotNull()), lon_col="cx", lat_col="cy"
        ),
        partition_by=["tier"],
    )

    zones = spark.read.parquet(zones_path).filter(F.col("zclass") != "dateline")
    join_cfg = {"zones": zones_path, "box": list(box) if box else None}

    def _join() -> DataFrame:
        pts = indexed
        if box is not None:
            pts = pts.filter(
                (F.col("cx") >= box[0]) & (F.col("cx") <= box[2])
                & (F.col("cy") >= box[1]) & (F.col("cy") <= box[3])
            )
        return pip_join(
            pts, zones, lon_col="cx", lat_col="cy", point_cell_col="cell"
        ).select("doc_id", "zone_id", "cx", "cy", "spans")

    joined = pipe.stage("30_pip_join", join_cfg, _join)

    rollup = pipe.stage(
        "40_zonal_rollup",
        join_cfg,
        lambda: joined.groupBy("zone_id").agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("spans")).alias("n_spans"),
        ),
    )
    return pipe, rollup
