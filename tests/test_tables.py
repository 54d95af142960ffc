"""Indexed table layout (S6 sink / S1 scan contract): tier partitions,
cell-sorted files, row-group pruning predicate reaches the scan."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


class TestIndexedLayout:
    def test_write_read_roundtrip_sorted(self, spark, geo001, tmp_path):
        from geowave_spark.sources.tables import ingest_points, read_indexed

        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        path = str(tmp_path / "pts_idx")
        ingest_points(pts, path)
        back = read_indexed(spark, path)
        assert back.count() == pts.count()
        # tier partition dirs exist
        assert any(p.name.startswith("tier=") for p in (tmp_path / "pts_idx").iterdir())
        # files are cell-sorted (parquet min/max usable for pruning)
        tier_dirs = [p for p in (tmp_path / "pts_idx").iterdir() if p.name.startswith("tier=")]
        f = next(iter(sorted(tier_dirs[0].glob("*.parquet"))))
        cells = pq.read_table(f, columns=["cell"])["cell"].to_pylist()
        assert cells == sorted(cells)

    def test_cell_predicate_prunes_and_matches(self, spark, geo001, tmp_path):
        from geowave_spark.operators.range_query import spatial_query_points
        from geowave_spark.sources.tables import ingest_points, read_indexed

        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        path = str(tmp_path / "pts_idx2")
        ingest_points(pts, path)
        back = read_indexed(spark, path)
        box = "POLYGON ((-75.0 39.5, -72.0 39.5, -72.0 42.5, -75.0 42.5, -75.0 39.5))"
        with_key = spatial_query_points(back, box, cell_col="cell")
        plain = spatial_query_points(pts, box)
        assert {r.fid for r in with_key.collect()} == {r.fid for r in plain.collect()}
        # the cell-range predicate reaches the parquet scan (PushedFilters);
        # raise the metadata string cap so the filter list isn't elided
        spark.conf.set("spark.sql.maxMetadataStringLength", "20000")
        try:
            plan = spatial_query_points(back, box, cell_col="cell")._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.unset("spark.sql.maxMetadataStringLength")
        pushed = plan.split("PushedFilters", 1)
        assert len(pushed) == 2 and "cell" in pushed[1][:20000]

    def test_extent_ingest_carries_dup_counts(self, spark, geo001, tmp_path):
        from geowave_spark.extract import with_geometry
        from geowave_spark.sources.tables import ingest_extents, read_indexed

        docs = with_geometry(spark.read.parquet(str(geo001 / "docs.parquet")))
        path = str(tmp_path / "docs_idx")
        ingest_extents(docs.select("doc_id", "minx", "miny", "maxx", "maxy"), path)
        back = read_indexed(spark, path)
        assert back.filter(F.col("num_duplicates") > 0).count() > 0  # coarse-tier extents
        # spans-equality invariant is upstream; here: every doc still present
        assert back.select("doc_id").distinct().count() == docs.count()

    def test_iceberg_ddl_text(self):
        from geowave_spark.sources.tables import iceberg_ddl

        ddl = iceberg_ddl("geo.points", {"fid": "string", "cell": "bigint", "tier": "int"})
        assert "PARTITIONED BY (tier)" in ddl
        assert "WRITE ORDERED BY (tier, cell)" in ddl

    def test_iceberg_write_refused_without_runtime(self, spark, geo001):
        """format='iceberg' without the runtime jar must refuse with the
        documented error (naming the jar and the parquet twin), not a
        ClassNotFoundException mid-write."""
        import pytest

        from geowave_spark.sources.tables import (
            iceberg_runtime_available,
            write_indexed,
        )

        assert not iceberg_runtime_available(spark)  # sandbox precondition
        pts = spark.read.parquet(str(geo001 / "points.parquet")).limit(10)
        from geowave_spark.operators.indexing import with_point_cells

        with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
            write_indexed(with_point_cells(pts), "cat.db.points", format="iceberg")
        with pytest.raises(ValueError, match="unsupported"):
            write_indexed(with_point_cells(pts), "p", format="orc")


class TestWkbStorage:
    def test_indexed_write_with_wkb_codec_roundtrips(self, spark, geo001, tmp_path):
        from pyspark.sql import functions as F

        from geowave_spark.extract import with_geometry
        from geowave_spark.geometry.wkb import wkb_to_wkt
        from geowave_spark.operators.indexing import with_insertion_cells
        from geowave_spark.sources.tables import read_indexed, write_indexed

        docs = with_geometry(spark.read.parquet(str(geo001 / "docs.parquet")).limit(400))
        indexed = with_insertion_cells(
            docs.select("doc_id", "geom_wkt", "minx", "miny", "maxx", "maxy")
        )
        path = str(tmp_path / "wkb_idx")
        write_indexed(indexed, path, geometry_codec="wkb")
        back = read_indexed(spark, path)
        assert "geom_wkb" in back.columns and "geom_wkt" not in back.columns
        decoded = back.withColumn("wkt", wkb_to_wkt(F.col("geom_wkb")))
        orig = docs.select("doc_id", F.col("geom_wkt").alias("wkt_orig"))
        bad = (
            decoded.select("doc_id", "wkt").distinct()
            .join(orig, "doc_id")
            .filter(F.col("wkt") != F.col("wkt_orig"))
            .count()
        )
        assert bad == 0


class TestIngestStats:
    def test_stats_sidecar_roundtrips_and_estimates(self, spark, geo001, tmp_path):
        from geowave_spark.sources.tables import ingest_points, read_index_stats

        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        path = str(tmp_path / "stat_idx")
        ingest_points(pts, path, stats=True)
        h = read_index_stats(spark, path)
        assert h.total_rows == pts.count()
        # full-key-space estimate recovers ~all rows
        full = h.cardinality([(int(h.bounds[0]), int(h.bounds[-1]) + 1)])
        assert full >= 0.9 * h.total_rows
        # a half-space range estimates roughly half (equi-depth bounds)
        mid = int(h.bounds[len(h.bounds) // 2])
        half = h.cardinality([(int(h.bounds[0]), mid)])
        assert 0.3 * h.total_rows <= half <= 0.7 * h.total_rows


class TestBiasedIndexedWrite:
    """The compact-Hilbert bias keys work as a WRITTEN index layout too:
    keys persisted sorted-within-files, scanned back with decomposed range
    predicates that reach the parquet scan (PushedFilters) — the 100-TB
    contract for the bias layouts, not just an in-memory column."""

    def test_biased_scan_pushes_key_ranges(self, spark, geo001, tmp_path):
        import datetime as dt

        import numpy as np

        from geowave_spark.operators.indexing import with_biased_st_cells
        from geowave_spark.plans.index_select import biased_key_ranges

        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        keyed = with_biased_st_cells(pts, "spatial", cell_col="bias_key")
        path = str(tmp_path / "biased_idx")
        (
            keyed.repartition(4, "time_bin")
            .sortWithinPartitions("time_bin", "bias_key")
            .write.partitionBy("time_bin")
            .parquet(path)
        )
        back = spark.read.parquet(path)

        bbox = (-75.0, 39.5, -72.0, 42.5)
        ranges = biased_key_ranges(*bbox, 0.0, 1.0, "spatial", max_ranges=64)
        pred = None
        for a, b in ranges:
            p = (F.col("bias_key") >= a) & (F.col("bias_key") <= b)
            pred = p if pred is None else (pred | p)
        exact = (
            (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
            & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
        )
        got = {r.fid for r in back.filter(pred).filter(exact).select("fid").collect()}
        want = {r.fid for r in pts.filter(exact).select("fid").collect()}
        assert got == want and got

        spark.conf.set("spark.sql.maxMetadataStringLength", "40000")
        try:
            plan = back.filter(pred)._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.unset("spark.sql.maxMetadataStringLength")
        pushed = plan.split("PushedFilters", 1)
        assert len(pushed) == 2 and "bias_key" in pushed[1][:40000]


class TestSplitStrategies:
    """split_partitions: the Accumulo split-strategy family
    (AccumuloSplitsOperationCLIProvider.java, AccumuloUtils.java:801-1040)
    re-expressed as write-split placement."""

    @pytest.fixture(scope="class")
    def pts(self, spark, geo001):
        return spark.read.parquet(str(geo001 / "points.parquet"))

    @staticmethod
    def _tier_files(root):
        tier_dirs = [p for p in root.iterdir() if p.name.startswith("tier=")]
        assert len(tier_dirs) == 1  # point table: single finest tier
        return sorted(tier_dirs[0].glob("*.parquet"))

    def test_quantile_contiguous_equal_row_share(self, spark, pts, tmp_path):
        from geowave_spark.sources.tables import ingest_points

        path = tmp_path / "q"
        ingest_points(pts, str(path), files_per_tier=4,
                      split_strategy="quantile")
        files = self._tier_files(path)
        assert len(files) == 4
        spans, counts = [], []
        for f in files:
            cells = pq.read_table(f, columns=["cell"])["cell"].to_pylist()
            assert cells == sorted(cells)  # still cell-sorted within file
            spans.append((cells[0], cells[-1]))
            counts.append(len(cells))
        # setSplitsByQuantile: contiguous, non-overlapping key ranges ...
        spans.sort()
        for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
            assert hi1 <= lo2
        # ... each holding ~an equal ROW share (sampled boundaries: loose 2x)
        assert max(counts) <= 2 * max(min(counts), 1)
        assert sum(counts) == pts.count()

    def test_equal_interval_buckets_never_straddle(self, spark, pts, tmp_path):
        from geowave_spark.sources.tables import ingest_points

        n = 4
        path = tmp_path / "ei"
        ingest_points(pts, str(path), files_per_tier=n,
                      split_strategy="equal_interval")
        files = self._tier_files(path)
        assert 1 < len(files) <= n
        # derive the fixed-stride bucket for every row the same way the
        # writer does; setSplitsByNumSplits semantics = a bucket (uniform
        # key interval) is never split across two files
        all_cells = [pq.read_table(f, columns=["cell"])["cell"].to_pylist()
                     for f in files]
        flat = [c for cs in all_cells for c in cs]
        lo, hi = min(flat), max(flat)
        width = max((hi - lo + n) // n, 1)
        bucket_to_files = {}
        for i, cs in enumerate(all_cells):
            for c in cs:
                b = min(n - 1, (c - lo) // width)
                bucket_to_files.setdefault(b, set()).add(i)
        assert all(len(fs) == 1 for fs in bucket_to_files.values())
        assert sum(map(len, all_cells)) == pts.count()

    def test_hash_even_files_any_skew(self, spark, pts, tmp_path):
        from geowave_spark.sources.tables import ingest_points

        # worst-case key skew: every row in one hot cell region
        skew = pts.withColumn("lon", F.lit(10.0)).withColumn("lat", F.lit(10.0))
        path = tmp_path / "h"
        ingest_points(skew, str(path), files_per_tier=4, split_strategy="hash")
        files = self._tier_files(path)
        # one cell -> one hash partition: all rows in a single file, but the
        # strategy itself never errors; with real spread files even out
        path2 = tmp_path / "h2"
        ingest_points(pts, str(path2), files_per_tier=4, split_strategy="hash")
        files2 = self._tier_files(path2)
        counts = [pq.read_metadata(f).num_rows for f in files2]
        assert len(files2) == 4 and max(counts) <= 3 * max(min(counts), 1)
        assert sum(counts) == pts.count()
        assert sum(pq.read_metadata(f).num_rows for f in files) == pts.count()

    def test_unknown_strategy_rejected(self, pts):
        from geowave_spark.sources.tables import split_partitions

        with pytest.raises(ValueError, match="split strategy"):
            split_partitions(pts, 4, "fibonacci")
