"""Geometry layer tests: WKT codec, PIP cross-validation, centroid hash."""

import duckdb
import numpy as np
import pytest

from geowave_spark.datagen import ensure_geo_tables
from geowave_spark.geometry.predicates import (
    PreparedGeometry,
    haversine_m,
    linestring_intersects_box,
    linestring_within_box,
)
from geowave_spark.geometry.wkt import (
    geom_bbox,
    geom_centroid,
    hash_centroid,
    parse_wkt,
    points_from_wkt,
)

RNG = np.random.RandomState(123)


class TestWkt:
    def test_point_roundtrip(self):
        k, (x, y) = parse_wkt("POINT (-73.98 40.75)")
        assert k == "point" and x == -73.98 and y == 40.75

    def test_linestring(self):
        k, arr = parse_wkt("LINESTRING (0 0, 1 1, 2 0.5)")
        assert k == "linestring" and arr.shape == (3, 2)

    def test_polygon_with_hole(self):
        k, rings = parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))")
        assert k == "polygon" and len(rings) == 2

    def test_multipolygon(self):
        k, polys = parse_wkt(
            "MULTIPOLYGON (((178 0, 180 0, 180 2, 178 2, 178 0)), ((-180 0, -178 0, -178 2, -180 2, -180 0)))"
        )
        assert k == "multipolygon" and len(polys) == 2

    def test_points_vectorized(self):
        import pandas as pd

        s = pd.Series(["POINT (1.5 -2.5)", "POINT (-180.0 90.0)"])
        x, y = points_from_wkt(s)
        np.testing.assert_array_equal(x, [1.5, -180.0])
        np.testing.assert_array_equal(y, [-2.5, 90.0])


class TestPip:
    def test_square(self):
        pg = PreparedGeometry("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        inside = pg.contains_points(np.array([5.0, 15.0, -1.0]), np.array([5.0, 5.0, 5.0]))
        np.testing.assert_array_equal(inside, [True, False, False])

    def test_hole(self):
        pg = PreparedGeometry(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
        )
        inside = pg.contains_points(np.array([5.0, 2.0]), np.array([5.0, 2.0]))
        np.testing.assert_array_equal(inside, [False, True])

    def test_cross_validate_vs_halfplanes(self):
        """Ray-cast PIP must agree with the independent half-plane oracle on
        every (point, convex zone) pair of the sf0.001 fixtures — this is the
        exact contract the driver's DuckDB comparison relies on."""
        d = ensure_geo_tables("sf0.001")
        con = duckdb.connect()
        pts = con.execute(f"SELECT fid, lon, lat FROM '{d}/points.parquet'").fetchnumpy()
        zones = con.execute(
            f"SELECT zone_id, geom_wkt FROM '{d}/zones.parquet' WHERE zclass='convex'"
        ).fetchall()
        hp = con.execute(
            f"SELECT zone_id, a, b, c FROM '{d}/zone_halfplanes.parquet'"
        ).fetchnumpy()
        lon, lat = pts["lon"], pts["lat"]
        mismatches = 0
        for zid, wkt in zones:
            pg = PreparedGeometry(wkt)
            ray = pg.contains_points(lon, lat)
            sel = hp["zone_id"] == zid
            a, b, c = hp["a"][sel], hp["b"][sel], hp["c"][sel]
            half = ((lon[:, None] * a + lat[:, None] * b) <= c).all(axis=1)
            mismatches += int((ray != half).sum())
        assert mismatches == 0

    def test_dateline_multipolygon(self):
        d = ensure_geo_tables("sf0.001")
        con = duckdb.connect()
        wkt, = con.execute(
            f"SELECT geom_wkt FROM '{d}/zones.parquet' WHERE zclass='dateline'"
        ).fetchone()
        pg = PreparedGeometry(wkt)
        minx, miny, maxx, maxy = pg.bbox
        # a point just inside the eastern part and one inside the western part
        inside = pg.contains_points(
            np.array([179.5, -179.5, 0.0]), np.array([(miny + maxy) / 2] * 3)
        )
        assert inside[0] and inside[1] and not inside[2]


class TestLinePredicates:
    def test_line_box(self):
        line = parse_wkt("LINESTRING (-5 -5, 5 5)")[1]
        assert linestring_intersects_box(line, -1, -1, 1, 1)  # passes through
        assert not linestring_intersects_box(line, 6, 6, 8, 8)
        assert not linestring_within_box(line, -1, -1, 1, 1)
        assert linestring_within_box(line, -6, -6, 6, 6)

    def test_line_crossing_box_without_vertex_inside(self):
        line = parse_wkt("LINESTRING (-10 0.5, 10 0.5)")[1]
        assert linestring_intersects_box(line, -1, -1, 1, 1)


class TestCentroid:
    def test_point(self):
        assert geom_centroid(parse_wkt("POINT (3 4)")) == (3.0, 4.0)

    def test_linestring_length_weighted(self):
        # L-shape: two segments len 10 each; centroid = mean of midpoints
        cx, cy = geom_centroid(parse_wkt("LINESTRING (0 0, 10 0, 10 10)"))
        assert cx == pytest.approx(7.5) and cy == pytest.approx(2.5)

    def test_polygon(self):
        cx, cy = geom_centroid(parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
        assert cx == pytest.approx(5.0) and cy == pytest.approx(5.0)

    def test_hash_centroid_reference_semantics(self):
        # doubleToLongBits(x) + doubleToLongBits(y*31) with int64 wrap
        import struct

        def java_bits(v: float) -> int:
            return struct.unpack(">q", struct.pack(">d", v))[0]

        x, y = -73.98, 40.75
        expect = (java_bits(x) + java_bits(y * 31.0)) & 0xFFFFFFFFFFFFFFFF
        expect = expect - 2**64 if expect >= 2**63 else expect
        got = hash_centroid(np.array([x]), np.array([y]))[0]
        assert int(got) == expect

    def test_bbox(self):
        assert geom_bbox(parse_wkt("LINESTRING (0 5, -3 2, 7 1)")) == (-3.0, 1.0, 7.0, 5.0)


class TestDistance:
    def test_haversine_known_value(self, spark):
        from geowave_spark.functions.distance import haversine_km
        from pyspark.sql import functions as F

        # Paris (2.3522, 48.8566) -> London (-0.1276, 51.5072) ~ 343.5 km
        df = spark.createDataFrame([(2.3522, 48.8566, -0.1276, 51.5072)],
                                   "lon1 double, lat1 double, lon2 double, lat2 double")
        (got,) = df.select(
            haversine_km(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d")
        ).collect()[0]
        assert abs(got - 343.5) < 1.0

    def test_haversine_symmetry_and_zero(self, spark):
        from geowave_spark.functions.distance import haversine_km
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(10.0, 20.0, -30.0, 45.0)],
                                   "lon1 double, lat1 double, lon2 double, lat2 double")
        row = df.select(
            haversine_km(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("ab"),
            haversine_km(F.col("lon2"), F.col("lat2"), F.col("lon1"), F.col("lat1")).alias("ba"),
            haversine_km(F.col("lon1"), F.col("lat1"), F.col("lon1"), F.col("lat1")).alias("aa"),
        ).collect()[0]
        assert row.ab == row.ba and row.aa == 0.0


class TestSpatioTemporalKeys:
    def test_same_cell_iff_same_bins(self, spark, geo001):
        """3D key equality must partition exactly like (xbin, ybin, tbin)."""
        import numpy as np
        from geowave_spark.operators.indexing import with_spatiotemporal_cells
        from geowave_spark.sfc import lat_bins, lon_bins

        pts = spark.read.parquet(str(geo001 / "points.parquet")).limit(500)
        rows = with_spatiotemporal_cells(pts).select(
            "lon", "lat", "event_ts", "time_bin", "st_cell"
        ).collect()
        lon = np.array([r.lon for r in rows]); lat = np.array([r.lat for r in rows])
        xb = lon_bins(lon, 10); yb = lat_bins(lat, 10)
        t64 = np.array([r.event_ts for r in rows], dtype="datetime64[us]")
        ys = t64.astype("datetime64[Y]").astype("datetime64[us]")
        ns = (t64.astype("datetime64[Y]") + np.timedelta64(1, "Y")).astype("datetime64[us]")
        frac = (t64 - ys).astype("int64").astype(float) / (ns - ys).astype("int64").astype(float)
        tb = np.floor(frac * 1024).astype(int)
        trip = {}
        for i, r in enumerate(rows):
            key = (r.time_bin, r.st_cell)
            bins = (int(t64[i].astype("datetime64[Y]").astype(int)), int(xb[i]), int(yb[i]), int(tb[i]))
            assert trip.setdefault(key, bins) == bins  # key -> one bin triple
        assert len({v for v in trip.values()}) == len(trip)  # bins -> one key


class TestArealPredicates:
    """Exact per-kind vs-box intersects (SpatialQueryFilter accept semantics
    for polygon/line-valued data) — cases chosen so the coarse bbox pass
    WOULD accept but the exact test must reject, and vice versa."""

    def test_diagonal_segment_bbox_overlaps_but_misses(self):
        from geowave_spark.geometry.predicates import geom_intersects_box

        # segment from (0,2.5) to (2.5,0): its bbox covers the unit box at
        # origin, but the segment passes outside the corner (x+y=2.5 > 2)
        assert not geom_intersects_box("LINESTRING (0.0 2.5, 2.5 0.0)", 0, 0, 1, 1)
        # pull it inward -> crosses
        assert geom_intersects_box("LINESTRING (0.0 1.5, 1.5 0.0)", 0, 0, 1, 1)
        # fully inside
        assert geom_intersects_box("LINESTRING (0.2 0.2, 0.8 0.9)", 0, 0, 1, 1)
        # crossing straight through without a vertex inside
        assert geom_intersects_box("LINESTRING (-1.0 0.5, 2.0 0.5)", 0, 0, 1, 1)

    def test_triangle_bbox_overlaps_but_misses(self):
        from geowave_spark.geometry.predicates import geom_intersects_box

        # CCW triangle whose bbox covers the box corner but whose hypotenuse
        # keeps the box outside
        tri = "POLYGON ((1.5 0.0, 3.0 3.0, 0.0 1.5, 1.5 0.0))"
        assert not geom_intersects_box(tri, 0, 0, 0.5, 0.5)
        assert geom_intersects_box(tri, 0, 0, 1.2, 1.2)  # corner pokes in
        # box entirely inside the polygon (no vertex of either in the other's
        # boundary cells)
        assert geom_intersects_box(tri, 1.2, 1.2, 1.4, 1.4)
        # polygon entirely inside the box
        assert geom_intersects_box(tri, -1, -1, 4, 4)
        # CW input must be normalized (engine side accepts either winding)
        tri_cw = "POLYGON ((1.5 0.0, 0.0 1.5, 3.0 3.0, 1.5 0.0))"
        assert not geom_intersects_box(tri_cw, 0, 0, 0.5, 0.5)
        assert geom_intersects_box(tri_cw, 0, 0, 1.2, 1.2)

    def test_concave_ring_routes_past_sat(self):
        from geowave_spark.geometry.predicates import (
            geom_intersects_box,
            ring_is_convex,
        )
        from geowave_spark.geometry.wkt import parse_wkt

        # concave single ring: SAT on edge normals false-negatives here (the
        # notch edge's half-plane excludes every box corner even though the
        # shapes overlap) — the dispatch must detect non-convexity and fall
        # through to the general even-odd polygon-polygon test
        notched = "POLYGON ((0.0 0.0, 4.0 0.0, 2.0 1.8, 4.0 4.0, 0.0 4.0, 0.0 0.0))"
        assert not ring_is_convex(parse_wkt(notched)[1][0])
        assert geom_intersects_box(notched, 3.5, -0.5, 4.5, 2.5)  # overlaps near (3.9, 0.05)
        # a box fully inside the notch (outside the polygon) must stay False
        assert not geom_intersects_box(notched, 2.6, 1.6, 2.9, 2.0)
        # convex rings still take the SAT fast path and agree
        square = "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))"
        assert ring_is_convex(parse_wkt(square)[1][0])
        assert geom_intersects_box(square, 3.5, -0.5, 4.5, 2.5)

    def test_duplicated_reflex_vertex_still_concave(self):
        from geowave_spark.geometry.predicates import (
            geom_intersects_box,
            ring_is_convex,
        )
        from geowave_spark.geometry.wkt import parse_wkt

        # valid WKT may repeat a vertex; the zero-length edge yields two zero
        # cross products that would mask the reflex turn's sign flip if the
        # convexity check didn't drop degenerate edges first
        dup = "POLYGON ((0.0 0.0, 4.0 0.0, 2.0 1.8, 2.0 1.8, 4.0 4.0, 0.0 4.0, 0.0 0.0))"
        assert not ring_is_convex(parse_wkt(dup)[1][0])
        assert geom_intersects_box(dup, 3.5, -0.5, 4.5, 2.5)  # overlaps near (3.9, 0.05)
        assert not geom_intersects_box(dup, 2.6, 1.6, 2.9, 2.0)  # inside the notch
        # a duplicated vertex on a genuinely convex ring stays convex
        sq_dup = "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))"
        assert ring_is_convex(parse_wkt(sq_dup)[1][0])

    def test_within_box(self):
        from geowave_spark.geometry.predicates import geom_within_box

        tri = "POLYGON ((1.5 0.0, 3.0 3.0, 0.0 1.5, 1.5 0.0))"
        assert geom_within_box(tri, 0, 0, 3, 3)
        assert not geom_within_box(tri, 0, 0, 2.9, 3)
        assert geom_within_box("LINESTRING (0.2 0.2, 0.8 0.9)", 0, 0, 1, 1)
        assert not geom_within_box("LINESTRING (0.2 0.2, 1.8 0.9)", 0, 0, 1, 1)

    def test_polygon_polygon_intersects_and_within(self):
        from geowave_spark.geometry.predicates import (
            PreparedGeometry,
            polygon_intersects_polygon,
            polygon_within_polygon,
        )

        q = PreparedGeometry("POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 4.0, 0.0 0.0))")
        inside = "POLYGON ((1.0 1.0, 2.0 1.0, 2.0 2.0, 1.0 2.0, 1.0 1.0))"
        overlap = "POLYGON ((3.0 3.0, 5.0 3.0, 5.0 5.0, 3.0 5.0, 3.0 3.0))"
        outside = "POLYGON ((6.0 6.0, 7.0 6.0, 7.0 7.0, 6.0 7.0, 6.0 6.0))"
        # data polygon CONTAINING the whole query (no vertex of data in q):
        around = "POLYGON ((-10.0 -10.0, 10.0 -10.0, 10.0 10.0, -10.0 10.0, -10.0 -10.0))"
        # edge-crossing plus-sign arm: crosses without containing vertices
        arm = "POLYGON ((1.0 -6.0, 3.0 -6.0, 3.0 6.0, 1.0 6.0, 1.0 -6.0))"
        assert polygon_intersects_polygon(inside, q)
        assert polygon_intersects_polygon(overlap, q)
        assert not polygon_intersects_polygon(outside, q)
        assert polygon_intersects_polygon(around, q)
        assert polygon_intersects_polygon(arm, q)
        assert polygon_within_polygon(inside, q)
        assert not polygon_within_polygon(overlap, q)
        assert not polygon_within_polygon(around, q)
        assert not polygon_within_polygon(arm, q)


class TestWkbCodec:
    """OGC WKB codec (GeometryUtils.java:221-253 analog): known-vector bytes,
    bit-exact round-trips, Spark column codecs."""

    def test_known_point_vector(self):
        from geowave_spark.geometry.wkb import wkb_dumps

        # canonical OGC little-endian POINT (1 2)
        assert wkb_dumps("POINT (1.0 2.0)").hex() == (
            "0101000000000000000000f03f0000000000000040"
        )

    def test_roundtrip_all_kinds(self):
        from geowave_spark.geometry.wkb import wkb_dumps, wkb_loads, wkb_to_wkt_str

        wkts = [
            "POINT (-73.98 40.75)",
            "LINESTRING (0.1 0.2, 1.5 -2.25, 3.125 4.0)",
            "POLYGON ((0.0 0.0, 4.0 0.0, 4.0 4.0, 0.0 0.0), (1.0 1.0, 2.0 1.0, 1.0 2.0, 1.0 1.0))",
            "MULTIPOLYGON (((175.0 -20.0, 180.0 -20.0, 180.0 20.0, 175.0 -20.0)), ((-180.0 -20.0, -175.0 -20.0, -180.0 20.0, -180.0 -20.0)))",
        ]
        for w in wkts:
            assert wkb_to_wkt_str(wkb_dumps(w)) == w
            kind, _ = wkb_loads(wkb_dumps(w))
            assert w.startswith(kind.upper().replace("STRING", "STRING"))

    def test_flagged_wkb_rejected_or_consumed(self):
        import struct

        import pytest as _pytest

        from geowave_spark.geometry.wkb import wkb_dumps, wkb_loads

        base = wkb_dumps("POINT (1.5 2.5)")
        # EWKB SRID flag: the 4-byte SRID word is consumed, not misparsed as
        # coordinate bytes
        ewkb = struct.pack("<bI", 1, 1 | 0x20000000) + struct.pack("<I", 4326) + base[5:]
        assert wkb_loads(ewkb) == ("point", (1.5, 2.5))
        # EWKB Z/M flags and ISO Z/M/ZM types: explicit rejection (silently
        # masking them would read garbage coordinates)
        for gtype in (1 | 0x80000000, 1 | 0x40000000, 1001, 2001, 3001):
            bad = struct.pack("<bI", 1, gtype) + base[5:]
            with _pytest.raises(ValueError):
                wkb_loads(bad)

    def test_spark_column_codec_roundtrip(self, spark, geo001):
        from pyspark.sql import functions as F

        from geowave_spark.extract import with_geometry
        from geowave_spark.geometry.wkb import wkb_to_wkt, with_wkb_geometry

        docs = with_geometry(spark.read.parquet(str(geo001 / "docs.parquet")).limit(300))
        coded = with_wkb_geometry(docs).withColumn("back", wkb_to_wkt(F.col("geom_wkb")))
        bad = coded.filter(F.col("back") != F.col("geom_wkt")).count()
        assert bad == 0
        # binary payload is materially narrower than the WKT for non-points
        rows = coded.select(
            F.length("geom_wkt").alias("lw"), F.length("geom_wkb").alias("lb"),
            F.col("geom_wkt").startswith("POINT").alias("is_pt"),
        ).collect()
        nonpt = [(r.lw, r.lb) for r in rows if not r.is_pt]
        assert nonpt and sum(lb for _, lb in nonpt) < sum(lw for lw, _ in nonpt)


class TestHoledPolygons:
    """Review-found gaps: interior rings must count everywhere."""

    HOLED = "POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0), (2.0 2.0, 8.0 2.0, 8.0 8.0, 2.0 8.0, 2.0 2.0))"

    def test_box_inside_hole_does_not_intersect(self):
        from geowave_spark.geometry.predicates import geom_intersects_box

        assert not geom_intersects_box(self.HOLED, 4, 4, 6, 6)  # inside the hole
        assert geom_intersects_box(self.HOLED, 0.5, 0.5, 1.5, 1.5)  # in the rim
        assert geom_intersects_box(self.HOLED, 1.0, 1.0, 3.0, 3.0)  # straddles
        assert geom_intersects_box(self.HOLED, -2, -2, 12, 12)  # contains all

    def test_query_hole_inside_data_breaks_within(self):
        from geowave_spark.geometry.predicates import (
            PreparedGeometry,
            polygon_within_polygon,
        )

        q = PreparedGeometry(self.HOLED)
        rim = "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))"
        swallows_hole = "POLYGON ((1.0 1.0, 9.0 1.0, 9.0 9.0, 1.0 9.0, 1.0 1.0))"
        assert polygon_within_polygon(rim, q)
        # all vertices inside the rim region, no boundary crossing... but the
        # hole sits inside the data polygon -> NOT within
        assert not polygon_within_polygon(swallows_hole, q)


class TestSpatioTemporalSingleEntry:
    def test_bin_prefix_contract(self, spark):
        """TieredSFCIndexStrategyTest.testSingleEntry ported to the engine's
        key shape: a point emits exactly one (time_bin, st_cell) id; the same
        point earlier in the SAME year shares the bin (and its spatial bits),
        while the prior year lands in a different bin."""
        import datetime as dt

        import numpy as np

        from geowave_spark.operators.indexing import with_spatiotemporal_cells
        from geowave_spark.sfc.zorder import zorder_decode

        rows = [
            (1, 45.0, 45.0, dt.datetime(2013, 6, 15, 11, 1, 1)),
            (2, 45.0, 45.0, dt.datetime(2013, 1, 1, 0, 0, 1)),   # same bin
            (3, 45.0, 45.0, dt.datetime(2012, 6, 15, 11, 1, 1)),  # prior bin
        ]
        df = spark.createDataFrame(rows, "fid long, lon double, lat double, event_ts timestamp")
        out = {r.fid: (r.time_bin, r.st_cell) for r in with_spatiotemporal_cells(df).collect()}
        assert len(out) == 3  # exactly one id per entry
        assert out[1][0] == out[2][0]          # same year -> same bin prefix
        assert out[1][0] != out[3][0]          # prior year -> different bin
        # the spatial bits inside the key are identical for the same point
        xs, ys, ts = zorder_decode(
            np.array([out[f][1] for f in (1, 2, 3)], dtype=np.uint64), 3, 10
        )
        assert xs[0] == xs[1] == xs[2] and ys[0] == ys[1] == ys[2]
        # within-year times land in different time slots for 1 vs 2
        assert ts[0] != ts[1]
