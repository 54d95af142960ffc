"""Convex hulls per cluster vs python oracle; stateful streaming dedup."""

import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestHull:
    def test_matches_python_monotone_chain(self, spark, geo001):
        from geowave_spark.operators.hull import group_hulls, hull_wkt

        pts = (
            spark.read.parquet(str(geo001 / "points.parquet"))
            .limit(500)
            .withColumn("cluster", (F.xxhash64("fid") % 4).cast("int"))
        )
        got = {r.cluster: (r.hull_wkt, r.n_points) for r in group_hulls(pts).collect()}
        rows = pts.select("cluster", "lon", "lat").collect()
        by_c = {}
        for r in rows:
            by_c.setdefault(r.cluster, []).append((r.lon, r.lat))
        for c, members in by_c.items():
            expect = hull_wkt(np.array(members))
            assert got[c][0] == expect
            assert got[c][1] == len(members)

    def test_hull_contains_all_points(self, spark, geo001):
        from geowave_spark.geometry.predicates import PreparedGeometry
        from geowave_spark.operators.hull import group_hulls

        pts = (
            spark.read.parquet(str(geo001 / "points.parquet"))
            .limit(300)
            .withColumn("cluster", F.lit(0))
        )
        (row,) = group_hulls(pts).collect()
        pg = PreparedGeometry(row.hull_wkt)
        xy = np.array([(r.lon, r.lat) for r in pts.collect()])
        # hull boundary points count as inside for prepared-geometry ray cast
        # with jittered fixture data (no exact-edge points except vertices) —
        # allow vertices themselves to be reported either way
        inside = pg.contains_points(xy[:, 0], xy[:, 1])
        assert inside.sum() >= len(xy) - row.n_vertices


class TestStatefulDedup:
    def test_dedup_across_batches(self, spark, tmp_path):
        from geowave_spark.streaming.stateful import streaming_exact_dedup

        in_dir = tmp_path / "docs_in"
        in_dir.mkdir()
        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")

        # batch 1: ids 0..49 with 10 distinct texts; batch 2: 50..99 SAME texts
        df1 = spark.range(50).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), (F.col("id") % 10).cast("string")).alias("text"),
        )
        df1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b1"))
        shutil.copy(next((tmp_path / "b1").glob("*.parquet")), in_dir / "b1.parquet")

        schema = "doc_id long, text string"
        def run_once():
            stream = spark.readStream.schema(schema).parquet(str(in_dir))
            q = (
                streaming_exact_dedup(stream)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        run_once()
        n1 = spark.read.parquet(out).count()
        assert n1 == 10  # 10 distinct texts survive batch 1

        df2 = spark.range(50, 100).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text-"), (F.col("id") % 10).cast("string")).alias("text"),
        )
        df2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b2"))
        shutil.copy(next((tmp_path / "b2").glob("*.parquet")), in_dir / "b2.parquet")
        run_once()
        n2 = spark.read.parquet(out).count()
        assert n2 == 10  # nothing new: all batch-2 texts already seen (state)
