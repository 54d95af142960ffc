"""Seasonal comparison KDE (R8): weight semantics, band structure, plan
selection.  Oracle equality runs through the driver gate (`kde_comparison`
in the registered query surface)."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from geowave_spark.operators.kde_compare import (
    WEIGHT_PPM,
    kde_comparison,
    seasonal_weight_cols,
)


def _expected_ppm(ts: datetime.datetime) -> tuple[str, int]:
    """Independent re-derivation of ComparisonGaussianCellMapper's month
    rules using datetime arithmetic (the engine uses epoch-us expressions)."""
    y, m = ts.year, ts.month
    d = lambda *a: datetime.datetime(*a)
    if m <= 3:
        base, hi = d(y - 1, 12, 31), d(y, 3, 31)
        t = (ts - base) / (hi - base) * 3.0
        season = "winter"
    elif m >= 10:
        base, lo = d(y, 12, 31), d(y, 9, 30)
        t = (base - ts) / (base - lo) * 3.0
        season = "winter"
    elif m == 4:
        lo, hi = d(y, 3, 31), d(y, 4, 30)
        t = (hi - ts) / (hi - lo) * 3.0
        season = "summer"
    elif m == 9:
        lo, hi = d(y, 8, 31), d(y, 9, 30)
        t = (ts - lo) / (hi - lo) * 3.0
        season = "summer"
    else:
        return "summer", WEIGHT_PPM
    return season, round(math.exp(-t * t) * WEIGHT_PPM)


CASES = [
    datetime.datetime(2012, 6, 15, 12, 0, 0),    # core summer -> 1.0
    datetime.datetime(2012, 1, 1, 0, 0, 0),      # winter fade-out start
    datetime.datetime(2012, 3, 30, 23, 59, 59),  # winter tail ~ exp(-9)
    datetime.datetime(2012, 4, 1, 0, 0, 0),      # summer ramp-in start ~ 0
    datetime.datetime(2012, 4, 29, 12, 0, 0),    # summer ramp-in end ~ 1
    datetime.datetime(2012, 9, 1, 6, 30, 0),     # summer ramp-out start ~ 1
    datetime.datetime(2012, 9, 29, 0, 0, 0),     # summer ramp-out tail
    datetime.datetime(2012, 10, 1, 0, 0, 0),     # winter fade-in start ~ 0
    datetime.datetime(2012, 12, 30, 23, 0, 0),   # winter fade-in end ~ 1
    datetime.datetime(2013, 2, 14, 3, 15, 27, 123456),  # mid-winter, sub-second
]


class TestSeasonalWeights:
    def test_weights_match_independent_derivation(self, spark):
        df = spark.createDataFrame([(ts,) for ts in CASES], "ts timestamp")
        season, wppm = seasonal_weight_cols(F.col("ts"))
        got = df.select(season.alias("s"), wppm.alias("w")).collect()
        for ts, row in zip(CASES, got):
            exp_season, exp_ppm = _expected_ppm(ts)
            assert row.s == exp_season, ts
            assert row.w == exp_ppm, ts

    def test_month_routing(self, spark):
        df = spark.createDataFrame(
            [(datetime.datetime(2012, m, 15),) for m in range(1, 13)], "ts timestamp"
        )
        season, _ = seasonal_weight_cols(F.col("ts"))
        got = [r.s for r in df.select(season.alias("s")).collect()]
        want = ["winter"] * 3 + ["summer"] * 6 + ["winter"] * 3
        assert got == want

    def test_transitional_months_stay_sub_unit(self, spark):
        """April/September and the winter ramps never exceed full weight and
        hit ~0 at the far edge (exp(-9) ~ 1.2e-4 -> 123 ppm)."""
        df = spark.createDataFrame([(ts,) for ts in CASES], "ts timestamp")
        _, wppm = seasonal_weight_cols(F.col("ts"))
        vals = [r.w for r in df.select(wppm.alias("w")).collect()]
        assert all(0 <= v <= WEIGHT_PPM for v in vals)
        assert vals[0] == WEIGHT_PPM        # core summer
        assert vals[3] < 1000               # April 1 ramp start ~ 0
        assert vals[7] < 1000               # Oct 1 fade-in start ~ 0


class TestComparisonBands:
    def test_band_structure(self, spark, geo001):
        pts = spark.read.parquet(str(geo001 / "points.parquet"))
        out = kde_comparison(pts, min_level=4, max_level=5, tile_size=2)
        rows = out.collect()
        assert rows
        for r in rows:
            assert 0.0 <= r.summer_percentile <= 1.0
            assert 0.0 <= r.winter_percentile <= 1.0
            assert -1.0 <= r.combined <= 1.0
            assert 0.0 < r.combined_percentile <= 1.0
            assert abs(r.combined - (r.summer_percentile - r.winter_percentile)) < 1e-12
        # both seasons genuinely contribute somewhere
        assert any(r.summer_percentile > 0 and r.winter_percentile == 0 for r in rows)
        assert any(r.winter_percentile > 0 and r.summer_percentile == 0 for r in rows)

    def test_approx_close_to_exact(self, spark, geo001):
        pts = spark.read.parquet(str(geo001 / "points.parquet")).limit(2000)
        exact = {
            (r.level, r.cell_id): r.combined_percentile
            for r in kde_comparison(
                pts, min_level=4, max_level=4, tile_size=2, percentile_mode="exact"
            ).collect()
        }
        approx = {
            (r.level, r.cell_id): r.combined_percentile
            for r in kde_comparison(
                pts, min_level=4, max_level=4, tile_size=2, percentile_mode="approx"
            ).collect()
        }
        assert exact.keys() == approx.keys()
        errs = [abs(exact[k] - approx[k]) for k in exact]
        assert max(errs) <= 0.05  # 1/buckets + sketch error band

    def test_auto_mode_switches_on_cell_bound(self, spark):
        """Same contract as the base KDE: above the occupied-cell bound the
        plan must carry no per-level rank window (the sketch path); under it
        the bit-exact windows stay (the oracle contract)."""
        import datetime

        pts = spark.createDataFrame(
            [
                (i * 0.7 - 90.0, i * 0.3 - 40.0, datetime.datetime(2012, 1 + i % 12, 15))
                for i in range(200)
            ],
            "lon double, lat double, event_ts timestamp",
        )

        def plan(df):
            return df._jdf.queryExecution().executedPlan().toString()

        deep = kde_comparison(pts, min_level=20, max_level=25, max_exact_cells=1000)
        assert "Window" not in plan(deep)
        shallow = kde_comparison(pts, min_level=4, max_level=6, tile_size=4)
        assert "Window" in plan(shallow)

    def test_unknown_mode_rejected(self, spark):
        pts = spark.createDataFrame(
            [(0.0, 0.0, datetime.datetime(2012, 6, 1))],
            "lon double, lat double, event_ts timestamp",
        )
        with pytest.raises(ValueError, match="percentile_mode"):
            kde_comparison(pts, min_level=4, max_level=4, percentile_mode="bogus")


class TestSplatPlanShape:
    def test_weight_arithmetic_stays_out_of_the_join_loop(self, spark):
        """Whole-stage codegen defers non-join-condition expressions into the
        innermost broadcast-join loop, so the seasonal-weight tree must be
        materialized behind the repartition barrier and the boundary dates
        must live in the broadcast year table — never inline per splat row
        (the regression this pins cost 22x on the sf0.1 bench)."""
        import datetime

        from geowave_spark.operators.kde_compare import _splat_cells_seasonal

        pts = spark.createDataFrame(
            [(1.0, 2.0, datetime.datetime(2012, 1 + i % 12, 15)) for i in range(24)],
            "lon double, lat double, event_ts timestamp",
        )
        cells = _splat_cells_seasonal(pts, 4, 6, 4, "lon", "lat", "event_ts")
        plan = cells._jdf.queryExecution().executedPlan().toString()
        # the barrier: a round-robin exchange between weights and the splat
        assert "roundrobin" in plan.lower()
        # boundary dates only in the (tiny, broadcast) year-bounds subtree:
        # after the barrier the splat side carries plain attributes, so the
        # pathological inline form "exp(" must not appear above the exchange
        above_barrier = plan.lower().split("roundrobin")[0]
        assert "make_date" not in above_barrier
        assert "exp(" not in above_barrier
