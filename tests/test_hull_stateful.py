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


class TestDedupTtl:
    """TTL expiry semantics of the stateful dedup function, driven through a
    GroupState stub (the interface contract applyInPandasWithState provides)."""

    class _State:
        def __init__(self, now=0):
            self._v = None
            self.now = now
            self.hasTimedOut = False
            self.timeout_set = None
            self.removed = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v, self.removed = None, True

        def getCurrentProcessingTimeMs(self):
            return self.now

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    def _batch(self, ids_hashes):
        import pandas as pd

        return pd.DataFrame(
            {"doc_id": [i for i, _ in ids_hashes], "text_md5": [h for _, h in ids_hashes]}
        )

    def test_ttl_expires_idle_hashes(self):
        from geowave_spark.streaming.stateful import make_dedup_fn

        fn = make_dedup_fn(ttl_ms=1000)
        st = self._State(now=0)
        out1 = list(fn(("a",), iter([self._batch([(1, "h1"), (2, "h2")])]), st))
        assert sorted(out1[0]["doc_id"]) == [1, 2]
        assert st.timeout_set == 1000

        # within TTL: h1 is a dup, its stamp refreshes
        st.now = 500
        out2 = list(fn(("a",), iter([self._batch([(3, "h1")])]), st))
        assert out2 == []

        # h2 idle past TTL -> re-emitted; h1 refreshed at 500 -> still a dup
        st.now = 1400
        out3 = list(fn(("a",), iter([self._batch([(4, "h2"), (5, "h1")])]), st))
        assert sorted(out3[0]["doc_id"]) == [4]

    def test_unbounded_mode_never_expires(self):
        from geowave_spark.streaming.stateful import make_dedup_fn

        fn = make_dedup_fn(ttl_ms=None)
        st = self._State()
        list(fn(("a",), iter([self._batch([(1, "h1")])]), st))
        assert st.timeout_set is None
        out = list(fn(("a",), iter([self._batch([(2, "h1")])]), st))
        assert out == []

    def test_group_timeout_drops_state(self):
        from geowave_spark.streaming.stateful import make_dedup_fn

        fn = make_dedup_fn(ttl_ms=1000)
        st = self._State()
        list(fn(("a",), iter([self._batch([(1, "h1")])]), st))
        st.hasTimedOut = True
        assert list(fn(("a",), iter([]), st)) == []
        assert st.removed


class TestConcaveHull:
    """Park-Oh dig hull (GeometryHullTool.concaveHullParkOhMethod port)."""

    def _c_shape(self):
        import numpy as np

        # dense ring segment (C shape): angles 45..315 degrees, two radii
        rng = np.random.RandomState(7)
        ang = rng.uniform(np.pi / 4, 7 * np.pi / 4, 400)
        rad = rng.uniform(0.8, 1.0, 400)
        return np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])

    @staticmethod
    def _area(ring):
        import numpy as np

        x, y = ring[:, 0], ring[:, 1]
        return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

    def test_digs_c_shape(self):
        from geowave_spark.operators.hull import concave_hull, monotone_chain

        xy = self._c_shape()
        conv = monotone_chain(xy)
        conc = concave_hull(xy, threshold=1.8)
        assert len(conc) > 2 * len(conv)  # boundary follows the rim points
        assert self._area(conc) < self._area(conv)

    def test_excavates_deep_slot(self):
        """The canonical Park-Oh case: a deep narrow notch with dense walls
        digs almost fully (each dig's candidate is close to the edge relative
        to edge length, so the N=1.8 ratio test keeps passing)."""
        import numpy as np

        from geowave_spark.operators.hull import concave_hull, monotone_chain

        from geowave_spark.geometry.predicates import PreparedGeometry
        from geowave_spark.operators.hull import concave_hull_wkt

        b = np.arange(0, 10.1, 1.0)
        border = np.vstack(
            [
                np.column_stack([b, np.zeros_like(b)]),
                np.column_stack([b, np.full_like(b, 10)]),
                np.column_stack([np.zeros_like(b), b]),
                np.column_stack([np.full_like(b, 10), b]),
            ]
        )
        wy = np.arange(2, 10.01, 0.25)
        walls = np.vstack(
            [
                np.column_stack([np.full_like(wy, 4.5), wy]),
                np.column_stack([np.full_like(wy, 5.5), wy]),
                np.column_stack([np.arange(4.5, 5.51, 0.25), np.full(5, 2.0)]),
            ]
        )
        xy = np.vstack([border, walls])
        conv = monotone_chain(xy)
        conc = concave_hull(xy, threshold=1.8)
        assert self._area(conc) < self._area(conv) * 0.92  # slot excavated
        # the slot interior is fully outside the concave hull
        pg = PreparedGeometry(concave_hull_wkt(xy))
        ty = np.arange(2.5, 10.0, 0.5)
        assert not pg.contains_points(np.full_like(ty, 5.0), ty).any()

    def test_all_points_inside_or_on(self):
        import numpy as np

        from geowave_spark.geometry.predicates import PreparedGeometry
        from geowave_spark.operators.hull import concave_hull, concave_hull_wkt

        xy = self._c_shape()
        pg = PreparedGeometry(concave_hull_wkt(xy))
        inside = pg.contains_points(xy[:, 0], xy[:, 1])
        hull_pts = {(x, y) for x, y in concave_hull(xy)}
        on_hull = np.array([(x, y) in hull_pts for x, y in xy])
        # hull invariant: every point is strictly inside or a hull vertex
        assert (inside | on_hull).all()

    def test_deterministic_and_simple(self):
        import numpy as np

        from geowave_spark.operators.hull import concave_hull

        xy = self._c_shape()
        a = concave_hull(xy)
        b = concave_hull(xy)
        assert np.array_equal(a, b)
        # ring is simple: no proper edge crossings
        from geowave_spark.operators.hull import _proper_cross

        ring = np.vstack([a, a[:1]])
        n = len(a)
        for i in range(n):
            for j in range(i + 2, n):
                if i == 0 and j == n - 1:
                    continue
                assert not _proper_cross(
                    ring[i, 0], ring[i, 1], ring[i + 1, 0], ring[i + 1, 1],
                    ring[j, 0], ring[j, 1], ring[j + 1, 0], ring[j + 1, 1],
                )

    def test_grouped_spark_matches_local(self, spark):
        import numpy as np

        from geowave_spark.operators.hull import concave_hull, group_concave_hulls

        xy = self._c_shape()
        rows = [(int(0), float(x), float(y)) for x, y in xy]
        df = spark.createDataFrame(rows, "cluster int, lon double, lat double")
        out = group_concave_hulls(df).collect()
        assert len(out) == 1
        assert out[0].n_vertices == len(concave_hull(xy))
        assert out[0].n_points == len(xy)

    def test_invariants_collinear_cluster(self, spark):
        """A 3+-point collinear cluster hulls to a 2-vertex segment whose
        interior members are NOT hull vertices — members_inside must still
        hold (on-segment counts as inside for the degenerate branch)."""
        from geowave_spark.operators.hull import group_concave_hull_invariants

        rows = [(0, float(i), float(i)) for i in range(4)]  # (0,0)..(3,3)
        rows += [(1, 5.0, 5.0)]  # single-point cluster stays exact-match
        df = spark.createDataFrame(rows, "cluster int, lon double, lat double")
        out = {r.cluster: r for r in group_concave_hull_invariants(df, group_col="cluster").collect()}
        assert out[0].members_inside and out[0].vertices_are_members
        assert out[1].members_inside and out[1].vertices_are_members
        # duplicated-coordinate point cluster: hull is a single point
        df2 = spark.createDataFrame(
            [(0, 0.0, 0.0), (0, 0.0, 0.0)], "cluster int, lon double, lat double"
        )
        out2 = group_concave_hull_invariants(df2, group_col="cluster").collect()
        assert out2[0].members_inside
