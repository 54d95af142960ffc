"""Storage-level bucketing: co-located, shuffle-free cell joins.

The claim under test is the 100-TB one: once two tables are written
bucketed on `cell` with the same bucket count, an equi-join on `cell`
plans with NO Exchange on either side (bucket co-location replaces the
shuffle), and its rows equal the plain path-read join's."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geowave_spark.sources.tables import read_bucketed, write_bucketed

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed")
    pts = spark.range(4000).select(
        F.col("id").alias("fid"),
        (F.col("id") % 97).alias("cell"),
        (F.col("id") * 1.5).alias("val"),
    )
    zones = spark.range(300).select(
        F.col("id").alias("zone_id"),
        (F.col("id") % 97).alias("cell"),
        (F.col("id") % 7).alias("kind"),
    )
    write_bucketed(pts, "bk_pts", N_BUCKETS, path=str(d / "pts"))
    write_bucketed(zones, "bk_zones", N_BUCKETS, path=str(d / "zones"))
    yield d, pts, zones
    spark.sql("DROP TABLE IF EXISTS bk_pts")
    spark.sql("DROP TABLE IF EXISTS bk_zones")


def _no_broadcast(spark):
    class _Ctx:
        def __enter__(self):
            self.prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def __exit__(self, *a):
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)

    return _Ctx()


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, bucketed_pair):
        with _no_broadcast(spark):
            j = read_bucketed(spark, "bk_pts").join(
                read_bucketed(spark, "bk_zones"), "cell"
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan, plan

    def test_unbucketed_join_does_exchange(self, spark, bucketed_pair):
        """Control: the same files read by PATH lose the bucket spec —
        proving the no-Exchange plan above comes from bucketing, and that
        read_bucketed's go-through-the-catalog rule is load-bearing."""
        d, _, _ = bucketed_pair
        with _no_broadcast(spark):
            j = spark.read.parquet(str(d / "pts")).join(
                spark.read.parquet(str(d / "zones")), "cell"
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan

    def test_rows_equal_plain_join(self, spark, bucketed_pair):
        _, pts, zones = bucketed_pair
        got = (
            read_bucketed(spark, "bk_pts")
            .join(read_bucketed(spark, "bk_zones"), "cell")
            .select("cell", "fid", "zone_id", "val", "kind")
        )
        want = pts.join(zones, "cell").select("cell", "fid", "zone_id", "val", "kind")
        assert got.count() == want.count() > 0
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_single_cell_scan_prunes_buckets(self, spark, bucketed_pair):
        """Bucket pruning: an equality filter on the bucket key scans 1 of
        N_BUCKETS buckets (the scan node advertises the selected count)."""
        prev = spark.conf.get("spark.sql.maxMetadataStringLength")
        prev_auto = spark.conf.get(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        )
        spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
        # filter-only queries need no clustering, so the planner falls back
        # to a plain scan unless auto-bucketed-scan dropout is turned off
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        try:
            df = read_bucketed(spark, "bk_pts").filter(F.col("cell") == 42)
            plan = df._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.maxMetadataStringLength", prev)
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev_auto
            )
        assert f"1 out of {N_BUCKETS}" in plan, plan
        assert df.count() == 4000 // 97 + (1 if 42 < 4000 % 97 else 0)
