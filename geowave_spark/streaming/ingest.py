"""Structured Streaming ingest: the streaming twin of the batch index path.

The reference has no streaming engine — Kafka is a batch staging channel
(`core/ingest/kafka/IngestFromKafkaDriver.java`: consume Avro blobs, then
run the normal ingest).  A 100 TB engine wants true incremental ingest, so
this module wires the SAME batch transforms (span->geometry extraction,
SFC cell assignment) into a streaming plan:

    readStream (file source / kafka) -> with_geometry -> with_point_cells
      -> writeStream parquet sink, partitioned by tier, exactly-once via the
         sink's checkpoint + offset log
    plus event-time windowed per-cell counts with a watermark for late data.

Every transform is the exact batch code path (same UDFs, same columns), so
streaming output equals a batch run over the same files — asserted in
tests/test_streaming.py with trigger(availableNow) against the batch plan.

At scale: the file source lists incrementally (maxFilesPerTrigger), state in
the windowed agg is bounded by the watermark horizon x active cells, and the
sink layout matches the batch table layout (tier partitions, cell-sorted
within files) so downstream queries cannot tell the difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geowave_spark.extract import with_geometry
from geowave_spark.operators.indexing import cell_at_tier, with_point_cells
from geowave_spark.sfc import DEFAULT_CONFIG, SpatialConfig

DOCS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def read_docs_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Incremental file-source reader for the interleaved docs table."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def indexed_docs_stream(docs: DataFrame, cfg: SpatialConfig = DEFAULT_CONFIG) -> DataFrame:
    """Streaming extraction + indexing — the batch operators applied 1:1;
    spans pass through untouched (the per-row invariant)."""
    geo = with_geometry(docs)
    pts = geo.filter(F.col("cx").isNotNull())
    return with_point_cells(pts, lon_col="cx", lat_col="cy", cfg=cfg)


def write_indexed_stream(
    indexed: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Exactly-once parquet sink, partitioned by tier like the batch layout."""
    w = (
        indexed.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("tier")
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def windowed_cell_counts(
    indexed: DataFrame,
    ts_col: str = "event_ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    cell_bits: int = 11,
    cfg: SpatialConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Event-time tumbling per-cell counts with late-data watermark —
    the streaming version of the K6 temporal-bin + cell group-by.  State is
    bounded: watermark expires windows, cells are finite at the chosen tier.
    """
    coarse = cell_at_tier(F.col("cell"), cfg.finest, cell_bits)
    # watermarks require TIMESTAMP (tz-aware); fixtures are NTZ — with the
    # session tz pinned to UTC the cast is a no-op on the instant
    indexed = indexed.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        indexed.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), coarse.alias("cell"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "cell",
            "n",
        )
    )
