"""End-to-end resumable docs pipeline: extraction -> index -> join ->
rollup, with spans preserved and mid-pipeline resume."""

import json

import pytest
from pyspark.sql import functions as F


class TestDocsPipeline:
    def test_end_to_end_and_resume(self, spark, geo001, tmp_path):
        from geowave_spark.plans.docs_pipeline import run_docs_pipeline

        root = tmp_path / "ckpt"
        pipe1, rollup1 = run_docs_pipeline(
            spark,
            str(geo001 / "docs.parquet"),
            str(geo001 / "zones.parquet"),
            str(root),
        )
        r1 = {(r.zone_id, r.n_docs, r.n_spans) for r in rollup1.collect()}
        assert len(r1) > 0
        assert [s["skipped"] for s in pipe1.summary()] == [False] * 4

        # every manifest carries per-partition counters that sum to rows —
        # and actually counted something (a glob that misses hive-partition
        # subdirectories would record 0 == 0 vacuously)
        for stage in ("10_extract", "20_index", "30_pip_join", "40_zonal_rollup"):
            m = json.loads((root / stage / "_manifest.json").read_text())
            assert m["rows"] > 0 and len(m["partitions"]) > 0
            assert sum(m["partitions"].values()) == m["rows"]
        # the partition_by stage records one counter per hive directory file
        m20 = json.loads((root / "20_index" / "_manifest.json").read_text())
        assert any("=" in k for k in m20["partitions"])

        # full resume: all four stages skip, same results
        pipe2, rollup2 = run_docs_pipeline(
            spark,
            str(geo001 / "docs.parquet"),
            str(geo001 / "zones.parquet"),
            str(root),
        )
        assert [s["skipped"] for s in pipe2.summary()] == [True] * 4
        assert {(r.zone_id, r.n_docs, r.n_spans) for r in rollup2.collect()} == r1

        # config change at stage 3: stages 1-2 still resume, 3-4 rebuild
        pipe3, rollup3 = run_docs_pipeline(
            spark,
            str(geo001 / "docs.parquet"),
            str(geo001 / "zones.parquet"),
            str(root),
            box=(-90.0, 20.0, -60.0, 55.0),
        )
        assert [s["skipped"] for s in pipe3.summary()] == [True, True, False, False]
        assert rollup3.count() > 0

    def test_spans_invariant_through_join(self, spark, geo001, tmp_path):
        from geowave_spark.plans.docs_pipeline import run_docs_pipeline

        pipe, _ = run_docs_pipeline(
            spark,
            str(geo001 / "docs.parquet"),
            str(geo001 / "zones.parquet"),
            str(tmp_path / "ckpt2"),
        )
        joined = spark.read.parquet(str(tmp_path / "ckpt2" / "30_pip_join"))
        src = spark.read.parquet(str(geo001 / "docs.parquet"))
        sig = F.sha2(
            F.concat_ws(
                "\x1e",
                F.transform(
                    F.col("spans"),
                    lambda s: F.concat_ws(
                        "\x1f", s["kind"], s["text"], s["media_ref"], s["offset"].cast("string")
                    ),
                ),
            ),
            256,
        )
        a = {(r.doc_id, r.sig) for r in joined.select("doc_id", sig.alias("sig")).distinct().collect()}
        b = {(r.doc_id, r.sig) for r in src.select("doc_id", sig.alias("sig")).collect()}
        assert a <= b and len(a) > 0  # every joined doc's span sequence is bit-identical
