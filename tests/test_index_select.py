"""Cost-based index selection (ChooseBestMatchIndexQueryStrategy analog):
range-histogram cardinality estimates + min-cost layout choice, and the 3D
spatio-temporal range decomposition behind it."""

import numpy as np
import pytest
from pyspark.sql import functions as F


class TestStCellRanges:
    def test_ranges_cover_exactly_the_target_cells(self):
        """Octant descent == brute-force bin enumeration (small bits)."""
        from geowave_spark.operators.indexing import st_cell_ranges
        from geowave_spark.sfc import lat_bins, lon_bins, value_bins
        from geowave_spark.sfc.zorder import zorder_encode

        bits = 5
        bbox = (-20.0, 10.0, 35.0, 40.0)
        frac = (0.25, 0.4)
        ranges = st_cell_ranges(*bbox, *frac, bits, bits, max_ranges=100000)
        covered = set()
        for lo, hi in ranges:
            covered.update(range(lo, hi + 1))
        xlo = int(lon_bins(np.array([bbox[0]]), bits, is_min=True)[0])
        xhi = int(lon_bins(np.array([bbox[2]]), bits)[0])
        ylo = int(lat_bins(np.array([bbox[1]]), bits, is_min=True)[0])
        yhi = int(lat_bins(np.array([bbox[3]]), bits)[0])
        tlo = int(value_bins(np.array([frac[0]]), bits, True)[0])
        thi = int(value_bins(np.array([frac[1]]), bits, False)[0])
        want = set()
        for x in range(xlo, xhi + 1):
            for y in range(ylo, yhi + 1):
                for t in range(tlo, thi + 1):
                    want.add(
                        int(
                            zorder_encode(
                                [np.array([v], dtype=np.uint64) for v in (x, y, t)], bits
                            )[0]
                        )
                    )
        assert covered == want

    def test_budget_is_over_inclusive(self):
        from geowave_spark.operators.indexing import st_cell_ranges

        full = st_cell_ranges(-20, 10, 35, 40, 0.25, 0.4, 6, 6, max_ranges=100000)
        capped = st_cell_ranges(-20, 10, 35, 40, 0.25, 0.4, 6, 6, max_ranges=16)
        assert len(capped) <= 16 * 2  # merged post-cap
        fullset, capset = set(), set()
        for lo, hi in full:
            fullset.update(range(lo, hi + 1))
        for lo, hi in capped:
            capset.update(range(lo, hi + 1))
        assert fullset <= capset


class TestChooseBestIndex:
    def _candidates(self, spark, geo001):
        from geowave_spark.operators.indexing import (
            with_point_cells,
            with_spatiotemporal_cells,
        )
        from geowave_spark.plans.index_select import (
            CandidateIndex,
            build_range_histogram,
            spatial_2d_decomposer,
            spatiotemporal_3d_decomposer,
        )
        from geowave_spark.sfc import SpatialConfig

        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        cfg10 = SpatialConfig(tiers=(0, 10), backend="zorder")
        flat = with_point_cells(pts, cfg=cfg10, cell_col="cell2d")
        st = with_spatiotemporal_cells(pts, spatial_bits=10, time_bits=10)
        h2d = build_range_histogram(flat, "cell2d")
        h3d = build_range_histogram(st.filter(F.col("time_bin") == 2012), "st_cell")
        return (
            [
                CandidateIndex("spatial_2d", spatial_2d_decomposer(10, cfg=cfg10), h2d),
                CandidateIndex("spatiotemporal_3d", spatiotemporal_3d_decomposer(10, 10), h3d),
            ],
            flat,
            st,
        )

    def test_bbox_only_picks_2d(self, spark, geo001):
        from geowave_spark.plans.index_select import FULL_SCAN, choose_best_index

        cands, _, _ = self._candidates(spark, geo001)
        winner, est = choose_best_index(cands, {"bbox": (-75.0, 39.5, -72.0, 42.5)})
        # no time constraint -> the 3D layout is a full scan; 2D must win
        assert winner == "spatial_2d"
        assert est["spatiotemporal_3d"] == FULL_SCAN

    def test_tight_time_window_picks_3d(self, spark, geo001):
        from geowave_spark.plans.index_select import choose_best_index

        cands, _, _ = self._candidates(spark, geo001)
        # loose bbox + very tight time window: the 3D layout prunes harder
        winner, est = choose_best_index(
            cands, {"bbox": (-120.0, -60.0, 150.0, 70.0), "t_range": (0.10, 0.12)}
        )
        assert winner == "spatiotemporal_3d"
        assert est["spatiotemporal_3d"] < est["spatial_2d"]

    def test_estimates_track_true_counts(self, spark, geo001):
        """The histogram estimate is within 3x of the true matching rows for
        a selective box (uniform-within-bucket assumption holds loosely)."""
        from geowave_spark.plans.index_select import choose_best_index

        cands, flat, _ = self._candidates(spark, geo001)
        bbox = (-75.0, 39.5, -72.0, 42.5)
        _, est = choose_best_index(cands, {"bbox": bbox})
        true = flat.filter(
            (F.col("lon") >= bbox[0])
            & (F.col("lon") <= bbox[2])
            & (F.col("lat") >= bbox[1])
            & (F.col("lat") <= bbox[3])
        ).count()
        assert true > 0
        assert est["spatial_2d"] >= true * 0.33  # never wildly under


class TestRoutedQuery:
    def test_routes_agree_and_chooser_runs(self, spark, geo001):
        """The routed box+time query returns identical rows whichever layout
        wins (exact refine makes routing invisible in the output)."""
        import datetime as dt

        from pyspark.sql import functions as F

        from geowave_spark.plans.index_select import routed_points_query

        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        bbox = (-75.0, 39.5, -72.0, 42.5)
        lo, hi = dt.datetime(2012, 6, 1), dt.datetime(2013, 1, 1)
        out, winner = routed_points_query(pts, bbox, lo, hi)
        got = {r.fid for r in out.select("fid").collect()}
        want = {
            r.fid
            for r in pts.filter(
                (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
                & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
                & (F.col("event_ts") >= F.lit(lo)) & (F.col("event_ts") < F.lit(hi))
            ).select("fid").collect()
        }
        assert got == want and len(got) > 0
        assert winner in ("spatial_2d", "spatiotemporal_3d")

        # a razor-thin time window over a huge box must route 3D
        out2, winner2 = routed_points_query(
            pts, (-179.0, -85.0, 179.0, 85.0), dt.datetime(2012, 3, 1), dt.datetime(2012, 3, 3)
        )
        assert winner2 == "spatiotemporal_3d"
        assert out2.count() > 0

    def test_multi_year_window_unions_per_bin(self, spark, geo001):
        """A window crossing year bins scans one key-range set per bin
        (TemporalBinningStrategy semantics) and still matches the plain
        filter exactly — including rows from the later year."""
        import datetime as dt

        from pyspark.sql import functions as F

        from geowave_spark.plans.index_select import routed_points_query

        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        bbox = (-75.0, 39.5, -72.0, 42.5)
        lo, hi = dt.datetime(2012, 6, 1), dt.datetime(2013, 6, 1)
        out, _ = routed_points_query(pts, bbox, lo, hi)
        got = {r.fid for r in out.select("fid").collect()}
        want_df = pts.filter(
            (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
            & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
            & (F.col("event_ts") >= F.lit(lo)) & (F.col("event_ts") < F.lit(hi))
        )
        want = {r.fid for r in want_df.select("fid").collect()}
        assert got == want and len(got) > 0
        # both years genuinely contribute
        years = {r.y for r in want_df.select(F.year("event_ts").alias("y")).distinct().collect()}
        assert years == {2012, 2013}


class TestTemporalBinning:
    """TemporalBinningStrategyTest behavioral vectors
    (`TemporalBinningStrategyTest.java:50-140`), ported to datetimes."""

    def test_bins_match_expected_count(self):
        import datetime as dt

        from geowave_spark.functions.temporal import temporal_bin_ranges

        # epoch-aligned start, +N units, inclusive end -> exactly N bins,
        # all full extent (internalTestBinsMatchExpectedCount)
        for unit, n in (("day", 500), ("month", 240), ("year", 120)):
            start = {"day": dt.datetime(2003, 11, 2),
                     "month": dt.datetime(2003, 11, 1),
                     "year": dt.datetime(1903, 1, 1)}[unit]
            end = start
            for _ in range(n):
                from geowave_spark.functions.temporal import _next_bin
                end = _next_bin(end, unit)
            bins = temporal_bin_ranges(start, end - dt.timedelta(milliseconds=1), unit)
            assert len(bins) == n
            assert all(b.full_extent for b in bins)

    def test_full_extent_on_single_bin(self):
        import datetime as dt

        from geowave_spark.functions.temporal import temporal_bin_ranges

        bins = temporal_bin_ranges(
            dt.datetime(2007, 3, 1), dt.datetime(2007, 3, 31, 23, 59, 59, 999000), "month"
        )
        assert len(bins) == 1 and bins[0].full_extent

    def test_full_extent_on_multiple_bins(self):
        """The 3-bin day split: mid-day start -> [partial, full, partial];
        epoch-aligned start -> [full, full, partial]."""
        import datetime as dt

        from geowave_spark.functions.temporal import temporal_bin_ranges

        t = dt.datetime(2012, 7, 4, 13, 45, 7)
        bins = temporal_bin_ranges(t, t + dt.timedelta(days=2), "day")
        assert [b.full_extent for b in bins] == [False, True, False]
        t0 = dt.datetime(2012, 7, 4)
        bins2 = temporal_bin_ranges(t0, t0 + dt.timedelta(days=2), "day")
        assert [b.full_extent for b in bins2] == [True, True, False]


class TestStRangeInsertion:
    def test_cover_invariant(self):
        """The join correctness invariant for ranged 3D entries: any point
        event inside the entry's (bbox, time range) shares a cell with the
        entry at the entry's tier (ancestor-derived from the point's finest
        3D key)."""
        import datetime as dt

        import numpy as np

        from geowave_spark.operators.indexing import st_range_insertion_cells
        from geowave_spark.sfc import lat_bins, lon_bins, value_bins
        from geowave_spark.sfc.zorder import zorder_encode

        rng = np.random.RandomState(4)
        for _ in range(25):
            minx = rng.uniform(-170, 160)
            miny = rng.uniform(-80, 70)
            maxx = minx + rng.uniform(0.01, 8)
            maxy = miny + rng.uniform(0.01, 8)
            t0 = dt.datetime(2012, 1, 1) + dt.timedelta(seconds=int(rng.uniform(0, 3.0e7)))
            t1 = t0 + dt.timedelta(seconds=int(rng.uniform(3600, 2.0e7)))
            cells = st_range_insertion_cells(minx, miny, maxx, maxy, t0, t1)
            assert 1 <= len(cells) <= 8 * 3  # <= max_dup per touched bin
            have = {(y, t, k) for y, t, k in cells}
            # sample interior events and re-encode at the entry's tier(s)
            for _ in range(15):
                px = rng.uniform(minx, maxx)
                py = rng.uniform(miny, maxy)
                pt = t0 + dt.timedelta(
                    seconds=rng.uniform(0, (t1 - t0).total_seconds() * 0.999)
                )
                y0 = dt.datetime(pt.year, 1, 1)
                y1 = dt.datetime(pt.year + 1, 1, 1)
                frac = ((pt - y0) / dt.timedelta(microseconds=1)) / (
                    (y1 - y0) / dt.timedelta(microseconds=1)
                )
                tiers_here = {t for (y, t, k) in cells if y == pt.year}
                assert tiers_here, f"no bin for {pt.year}"
                for t in tiers_here:
                    if t == 0:
                        assert (pt.year, 0, 0) in have
                        continue
                    xb = int(lon_bins(np.array([px]), t)[0])
                    yb = int(lat_bins(np.array([py]), t)[0])
                    zb = int(value_bins(np.array([frac]), t, False)[0])
                    key = int(
                        zorder_encode(
                            [np.array([v], dtype=np.uint64) for v in (xb, yb, zb)], t
                        )[0]
                    )
                    assert (pt.year, t, key) in have


class TestBiasedLayoutRouting:
    """The compact-Hilbert BIAS layout as a third chooser candidate
    (round 4): prepared beside the 2D and 3D layouts, decomposed by the
    prefix-tree range descent, and — forced or chosen — always yielding
    the exact plain-filter rows."""

    def test_biased_route_is_exact(self, spark, geo001):
        import datetime as dt

        from pyspark.sql import functions as F

        from geowave_spark.plans.index_select import prepare_layouts, routed_points_query

        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        layouts = prepare_layouts(pts, bias="spatial")
        bbox = (-75.0, 39.5, -72.0, 42.5)
        lo, hi = dt.datetime(2012, 6, 1), dt.datetime(2013, 1, 1)
        want = {
            r.fid
            for r in pts.filter(
                (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
                & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3])
                & (F.col("event_ts") >= F.lit(lo)) & (F.col("event_ts") < F.lit(hi))
            ).select("fid").collect()
        }
        # forced through the biased layout: scan prunes on _bias_key ranges
        out, winner = routed_points_query(
            pts, bbox, lo, hi, layouts=layouts, force="spatiotemporal_biased"
        )
        assert winner == "spatiotemporal_biased"
        assert {r.fid for r in out.select("fid").collect()} == want and want
        # left to the chooser, whatever wins still matches
        out2, winner2 = routed_points_query(pts, bbox, lo, hi, layouts=layouts)
        assert winner2 in ("spatial_2d", "spatiotemporal_3d", "spatiotemporal_biased")
        assert {r.fid for r in out2.select("fid").collect()} == want

    def test_force_unknown_layout_refused(self, spark, geo001):
        import datetime as dt

        import pytest

        from geowave_spark.plans.index_select import routed_points_query

        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        with pytest.raises(ValueError, match="unknown layout"):
            routed_points_query(
                pts, (-75.0, 39.5, -72.0, 42.5),
                dt.datetime(2012, 6, 1), dt.datetime(2013, 1, 1),
                force="no_such_index",
            )


class TestLayoutRegistry:
    """layouts_for: the long-lived-DataStore analog — index metadata +
    row-range histograms built once per table per session, not per query."""

    def test_memoized_on_semantic_identity(self, spark, geo001):
        from geowave_spark.plans import index_select as isel

        isel.release_layouts()
        a = spark.read.parquet(str(geo001 / "points.parquet"))
        b = spark.read.parquet(str(geo001 / "points.parquet"))
        la = isel.layouts_for(a, 8, 8)
        # a SEPARATE read of the same files shares the entry (semantic key)
        assert isel.layouts_for(b, 8, 8) is la
        # different layout parameters are a different entry
        assert isel.layouts_for(a, 9, 8) is not la
        isel.release_layouts()
        assert isel.layouts_for(a, 8, 8) is not la  # released -> rebuilt

    def test_routed_query_plans_from_registry(self, spark, geo001, monkeypatch):
        from geowave_spark.plans import index_select as isel
        from geowave_spark.plans.cql_route import cql_routed_query

        isel.release_layouts()
        calls = []
        real = isel.prepare_layouts
        monkeypatch.setattr(
            isel, "prepare_layouts",
            lambda *a, **k: (calls.append(1), real(*a, **k))[1],
        )
        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        cql = "BBOX(geom, -75, 39.5, -72, 42.5)"
        r1, route1 = cql_routed_query(pts, cql)
        n1 = r1.count()
        r2, route2 = cql_routed_query(pts, cql)
        assert r2.count() == n1 > 0 and route1 == route2
        assert len(calls) == 1  # second query planned from cached layouts
        isel.release_layouts()

    def test_inplace_rewrite_misses(self, spark, geo001, tmp_path):
        """The key includes the resolved file list: overwriting a table at
        the same path MUST miss (semanticHash alone is path-based and would
        serve stale layouts — verified empirically in review)."""
        from geowave_spark.plans import index_select as isel

        isel.release_layouts()
        p = str(tmp_path / "pts")
        src = spark.read.parquet(str(geo001 / "points.parquet"))
        src.write.parquet(p)
        la = isel.layouts_for(spark.read.parquet(p), 8, 8)
        src.limit(100).write.mode("overwrite").parquet(p)
        lb = isel.layouts_for(spark.read.parquet(p), 8, 8)
        assert lb is not la
        assert lb["h2d"].total_rows == 100
        isel.release_layouts()
