"""Map-matching snap join: hand-derived snaps, radius exclusion, guard,
and the broadcast plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def _net(spark, wkt, fid="seg_a"):
    return spark.createDataFrame([Row(fid=fid, geom_wkt=wkt)])


def test_snap_projects_onto_segment(spark):
    from geowave_spark.operators.mapmatch import snap_join

    # horizontal segment y=0, x in [0, 10]; ping at (3, 0.04) projects to
    # t=0.3, snap (3, 0), d2 = 0.0016
    net = _net(spark, "LINESTRING (0 0, 10 0)")
    pts = spark.createDataFrame([Row(fid="p1", lon=3.0, lat=0.04)])
    out = snap_join(pts, net, radius_deg=0.1, cell_deg=0.25).collect()
    assert len(out) == 1
    r = out[0]
    assert r.pt_fid == "p1" and r.seg_fid == "seg_a" and r.seg_idx == 0
    assert r.t_q == 300_000  # floor(0.3 * 1e6)
    assert r.snap_x_q == 3_000_000 and r.snap_y_q == 0
    assert r.d2_q == int(0.04 * 0.04 * 1e9)


def test_endpoint_clamp_and_radius_cutoff(spark):
    from geowave_spark.operators.mapmatch import snap_join

    net = _net(spark, "LINESTRING (0 0, 1 0)")
    pts = spark.createDataFrame(
        [
            Row(fid="before", lon=-0.05, lat=0.0),  # clamps to t=0, d=0.05
            Row(fid="far", lon=-0.5, lat=0.0),  # d=0.5 > radius -> dropped
        ]
    )
    out = {r.pt_fid: r for r in snap_join(pts, net, radius_deg=0.1).collect()}
    assert set(out) == {"before"}
    assert out["before"].t_q == 0 and out["before"].snap_x_q == 0


def test_nearest_of_two_segments_wins(spark):
    from geowave_spark.operators.mapmatch import snap_join

    # two parallel segments; the ping sits 0.01 from b, 0.09 from a
    net = spark.createDataFrame(
        [
            Row(fid="seg_a", geom_wkt="LINESTRING (0 0.1, 1 0.1)"),
            Row(fid="seg_b", geom_wkt="LINESTRING (0 0, 1 0)"),
        ]
    )
    pts = spark.createDataFrame([Row(fid="p1", lon=0.5, lat=0.01)])
    out = snap_join(pts, net, radius_deg=0.1).collect()
    assert len(out) == 1 and out[0].seg_fid == "seg_b"


def test_zero_length_segment_snaps_to_vertex(spark):
    from geowave_spark.operators.mapmatch import snap_join

    net = _net(spark, "LINESTRING (5 5, 5 5)")
    pts = spark.createDataFrame([Row(fid="p1", lon=5.03, lat=5.0)])
    out = snap_join(pts, net, radius_deg=0.1).collect()
    assert len(out) == 1
    assert out[0].t_q == 0 and out[0].snap_x_q == 5_000_000


def test_cover_explosion_guard_refuses(spark):
    from geowave_spark.operators.mapmatch import snap_join

    # a hemisphere-spanning segment at a 0.01-degree grid: > 4096 cells
    net = _net(spark, "LINESTRING (-170 0, 170 0)")
    pts = spark.createDataFrame([Row(fid="p1", lon=0.0, lat=0.0)])
    with pytest.raises(Exception, match="cover explosion"):
        snap_join(pts, net, radius_deg=0.1, cell_deg=0.01).collect()


def test_network_is_broadcast_and_probe_scanned_once(spark, geo001):
    from geowave_spark.operators.mapmatch import snap_join

    pts = spark.read.parquet(f"{geo001}/points.parquet")
    tracks = spark.read.parquet(f"{geo001}/tracks.parquet")
    plan = (
        snap_join(pts, tracks, radius_deg=0.1, cell_deg=0.25)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert plan.count("points.parquet") == 1  # probe side read exactly once
