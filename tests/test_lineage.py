"""Resumable checkpointed pipeline: skip-on-match, rebuild-on-change,
downstream invalidation, per-partition counters from parquet footers."""

import json

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def root(tmp_path):
    return tmp_path / "ckpt"


def _build_pipeline(spark, geo001, root, box=(-75.0, 39.5, -72.0, 42.5)):
    from geowave_spark.plans.lineage import Pipeline

    pipe = Pipeline(spark, root)
    pts = spark.read.parquet(str(geo001 / "points.parquet"))
    filtered = pipe.stage(
        "10_filter",
        {"box": list(box)},
        lambda: pts.filter(
            (F.col("lon") >= box[0]) & (F.col("lon") <= box[2])
            & (F.col("lat") >= box[1]) & (F.col("lat") <= box[3])
        ),
    )
    agg = pipe.stage(
        "20_agg",
        {"by": "category"},
        lambda: filtered.groupBy("category").agg(F.count("*").alias("n")),
    )
    return pipe, agg


class TestLineage:
    def test_first_run_writes_manifests_and_counters(self, spark, geo001, root):
        pipe, agg = _build_pipeline(spark, geo001, root)
        rows = {r.category: r.n for r in agg.collect()}
        assert sum(rows.values()) > 0
        s = pipe.summary()
        assert [x["skipped"] for x in s] == [False, False]
        m = json.loads((root / "10_filter" / "_manifest.json").read_text())
        assert m["rows"] == sum(rows.values())
        assert sum(m["partitions"].values()) == m["rows"]  # per-partition counters

    def test_second_run_resumes_from_checkpoint(self, spark, geo001, root):
        pipe1, agg1 = _build_pipeline(spark, geo001, root)
        r1 = {(r.category, r.n) for r in agg1.collect()}
        pipe2, agg2 = _build_pipeline(spark, geo001, root)
        r2 = {(r.category, r.n) for r in agg2.collect()}
        assert r1 == r2
        assert [x["skipped"] for x in pipe2.summary()] == [True, True]

    def test_config_change_invalidates_downstream(self, spark, geo001, root):
        _build_pipeline(spark, geo001, root)
        pipe2, agg2 = _build_pipeline(spark, geo001, root, box=(-80.0, 30.0, -70.0, 45.0))
        s = pipe2.summary()
        assert [x["skipped"] for x in s] == [False, False]  # both rebuilt
        assert agg2.count() > 0

    def test_mid_pipeline_resume(self, spark, geo001, root):
        """Stage 1 checkpoint survives; only downstream rebuilds when its own
        config changes — the resumable-mid-pipeline contract."""
        from geowave_spark.plans.lineage import Pipeline

        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        pipe1 = Pipeline(spark, root)
        f1 = pipe1.stage("10_filter", {"v": 1}, lambda: pts.filter(F.col("lat") > 0))
        pipe1.stage("20_agg", {"by": "category"}, lambda: f1.groupBy("category").count())

        pipe2 = Pipeline(spark, root)
        f2 = pipe2.stage("10_filter", {"v": 1}, lambda: pts.filter(F.col("lat") > 0))
        pipe2.stage("20_agg", {"by": "cat2"}, lambda: f2.groupBy("category").count())
        assert [x["skipped"] for x in pipe2.summary()] == [True, False]
