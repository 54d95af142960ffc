"""Continuous spatial joins: the batch PIP join run unchanged over a
Structured Streaming probe (stream-static join).

A 10^12-doc corpus is never ingested once — it arrives continuously, and
the reference answers that with live re-index + query against the stored
layer (core/store/.../query + the Kafka ingest driver,
core/ingest/src/main/java/org/locationtech/geowave/core/ingest/kafka/
IngestFromKafkaDriver.java).  Spark's native form is the stream-static
join: the zone layer is the static (broadcast) build side, each
micro-batch of arriving points is the probe.  Because
:func:`~geowave_spark.operators.spatial_join.pip_join` keeps every
driver-side planning job on the ZONE side and the probe side is pure
transformations (hex mode: pure Catalyst; fixed mode: one Arrow encode
UDF), the SAME operator — same planner, same broadcast gate, same
pure-JVM edge-fold refine — composes under ``readStream`` with zero
changes.  Stream-vs-batch bit-equality is pinned in
tests/test_streaming.py::TestStreamingPipJoin.

Unsupported under streaming (explicitly raised, never silently wrong):
``salt_hot`` (hot-cell detection is a counts pass over the probe — a
streaming agg feeding a join; per-micro-batch skew is bounded by the
batch size anyway).  mode='tiered' composes cleanly: the single-pass
packed (tier, ancestor_cell) probe explode is pure per-row work, so each
micro-batch encodes the probe exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from geowave_spark.operators.spatial_join import pip_join
from geowave_spark.sfc import DEFAULT_CONFIG, SpatialConfig


def pip_join_stream(
    points: DataFrame,
    zones: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
    zone_wkt_col: str = "geom_wkt",
    cfg: SpatialConfig = DEFAULT_CONFIG,
    mode: str = "hex",
    cover_bits: int | None = None,
    max_broadcast_zones: int = 65536,
) -> DataFrame:
    """Streaming point-in-polygon join: ``points`` is a streaming DataFrame,
    ``zones`` a static layer.  Returns a streaming DataFrame of refined
    (point, zone) rows — attach any sink via ``writeStream`` (or use
    :func:`write_pip_join_stream`).

    Defaults to mode='hex': the probe side bins with pure Catalyst
    expressions, so a micro-batch pays no Python at all between source and
    refine (the refine itself is the JVM edge-fold whenever the zone layer
    passes the broadcast gate).
    """
    if not points.isStreaming:
        raise ValueError("points must be a streaming DataFrame (readStream)")
    if zones.isStreaming:
        raise ValueError(
            "zones must be static: stream-stream PIP would need state "
            "eviction semantics the zone layer doesn't have (zones are "
            "slowly-changing — re-plan the query on zone-layer updates)"
        )
    return pip_join(
        points,
        zones,
        lon_col=lon_col,
        lat_col=lat_col,
        zone_wkt_col=zone_wkt_col,
        cfg=cfg,
        mode=mode,
        cover_bits=cover_bits,
        max_broadcast_zones=max_broadcast_zones,
    )


def write_pip_join_stream(
    joined: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
):
    """Exactly-once parquet sink for the joined rows (checkpointed source
    offsets + file-sink manifest = resume mid-pipeline, the north rule's
    recovery contract, same as write_indexed_stream)."""
    w = (
        joined.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
