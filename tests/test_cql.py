"""CQL front-end (F4): parser vectors, constraint-extraction lattice, strict
boundary conventions, and route-independence of the routed scan.

The extraction vectors mirror the reference's visitor semantics
(`ExtractGeometryFilterVisitor.java`: AND intersects envelopes, OR unions,
NOT and non-spatial predicates contribute infinity;
`ExtractTimeFilterVisitor.java`: the same lattice over time ranges) — the
shapes its own ExtractGeometryFilterVisitorTest exercises, re-derived here
against this engine's AST."""

from __future__ import annotations

import datetime as dt

import pytest

from geowave_spark.functions.cql import (
    And,
    BBox,
    Between,
    Cmp,
    CqlBinding,
    During,
    In,
    IsNull,
    Like,
    Not,
    Or,
    Spatial,
    TCmp,
    extract_bbox,
    extract_time_range,
    parse_cql,
    to_column,
)

T0 = dt.datetime(2020, 1, 1)
T1 = dt.datetime(2020, 6, 1)


class TestParser:
    def test_comparisons_and_logic_precedence(self):
        # AND binds tighter than OR
        ast = parse_cql("a = 1 OR b < 2 AND c >= 'x'")
        assert isinstance(ast, Or)
        assert ast.children[0] == Cmp("a", "=", 1.0)
        assert isinstance(ast.children[1], And)

    def test_literal_first_comparison_flips(self):
        assert parse_cql("5 < magnitude") == Cmp("magnitude", ">", 5.0)
        assert parse_cql("5 >= magnitude") == Cmp("magnitude", "<=", 5.0)

    def test_between_in_like_null(self):
        assert parse_cql("m BETWEEN 1 AND 2") == Between("m", 1.0, 2.0)
        assert parse_cql("m NOT BETWEEN 1 AND 2") == Between("m", 1.0, 2.0, True)
        assert parse_cql("c IN ('a', 'b''s')") == In("c", ("a", "b's"))
        assert parse_cql("c LIKE 'x%'") == Like("c", "x%")
        assert parse_cql("c ILIKE 'x%'") == Like("c", "x%", True)
        assert parse_cql("c IS NULL") == IsNull("c")
        assert parse_cql("c IS NOT NULL") == IsNull("c", True)

    def test_spatial_and_temporal_ops(self):
        assert parse_cql("BBOX(geom, -10, -5, 10, 5)") == BBox("geom", -10, -5, 10, 5)
        ast = parse_cql("INTERSECTS(geom, POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0)))")
        assert isinstance(ast, Spatial) and ast.kind == "intersects"
        assert ast.wkt.startswith("POLYGON")
        assert parse_cql("ts DURING 2020-01-01T00:00:00/2020-06-01T00:00:00") == During(
            "ts", T0, T1
        )
        assert parse_cql("ts AFTER 2020-01-01T00:00:00") == TCmp("ts", "after", T0)
        assert parse_cql("ts BEFORE 2020-01-01") == TCmp("ts", "before", T0)

    def test_not_and_parens(self):
        ast = parse_cql("NOT (a = 1 OR b = 2)")
        assert isinstance(ast, Not) and isinstance(ast.child, Or)

    def test_errors(self):
        with pytest.raises(ValueError, match="tokenize"):
            parse_cql("a = #")
        with pytest.raises(ValueError, match="trailing"):
            parse_cql("a = 1 b = 2")
        with pytest.raises(ValueError, match="unbalanced|missing"):
            parse_cql("INTERSECTS(geom, POLYGON ((0 0, 1 0)")
        with pytest.raises(ValueError, match="units"):
            parse_cql("DWITHIN(geom, POINT (0 0), 5, furlongs)")
        with pytest.raises(ValueError, match="end of input"):
            parse_cql("a =")


class TestExtraction:
    def test_and_intersects_envelopes(self):
        ast = parse_cql("BBOX(geom, 0, 0, 10, 10) AND BBOX(geom, 5, 5, 20, 20)")
        assert extract_bbox(ast) == (5, 5, 10, 10)

    def test_or_unions_envelopes(self):
        ast = parse_cql("BBOX(geom, 0, 0, 1, 1) OR BBOX(geom, 5, 5, 6, 6)")
        assert extract_bbox(ast) == (0, 0, 6, 6)

    def test_or_with_nonspatial_is_unbounded(self):
        # reference rationale: one OR branch without a spatial bound means
        # the filter can match anywhere
        ast = parse_cql("BBOX(geom, 0, 0, 1, 1) OR magnitude > 5")
        assert extract_bbox(ast) is None

    def test_and_with_nonspatial_keeps_bound(self):
        ast = parse_cql("BBOX(geom, 0, 0, 1, 1) AND magnitude > 5")
        assert extract_bbox(ast) == (0, 0, 1, 1)

    def test_not_is_unbounded(self):
        assert extract_bbox(parse_cql("NOT BBOX(geom, 0, 0, 1, 1)")) is None
        assert extract_bbox(parse_cql("DISJOINT(geom, POINT (0 0))")) is None

    def test_intersects_extracts_polygon_bbox(self):
        ast = parse_cql("INTERSECTS(geom, POLYGON ((2 3, 8 3, 8 9, 2 9, 2 3)))")
        assert extract_bbox(ast) == (2, 3, 8, 9)

    def test_dwithin_pads_bbox(self):
        ast = parse_cql("DWITHIN(geom, POINT (10 50), 100, kilometers)")
        minx, miny, maxx, maxy = extract_bbox(ast)
        assert minx < 10 < maxx and miny < 50 < maxy
        # pad must cover the true 100 km ball: >= ~0.9 degrees of latitude
        assert 50 - miny >= 0.899 and maxy - 50 >= 0.899
        ast = parse_cql("DWITHIN(geom, POINT (10 50), 0.5, degrees)")
        assert extract_bbox(ast) == (9.5, 49.5, 10.5, 50.5)

    def test_time_during_and_hull(self):
        assert extract_time_range(
            parse_cql("ts DURING 2020-01-01T00:00:00/2020-06-01T00:00:00"), {"ts"}
        ) == (T0, T1)
        # AFTER + BEFORE conjunction intersects to a bounded range
        assert extract_time_range(
            parse_cql("ts AFTER 2020-01-01T00:00:00 AND ts BEFORE 2020-06-01T00:00:00"),
            {"ts"},
        ) == (T0, T1)
        # OR hulls
        assert extract_time_range(
            parse_cql(
                "ts DURING 2020-01-01T00:00:00/2020-02-01T00:00:00 "
                "OR ts DURING 2020-05-01T00:00:00/2020-06-01T00:00:00"
            ),
            {"ts"},
        ) == (T0, T1)
        # TEQUALS is the degenerate closed range
        assert extract_time_range(parse_cql("ts TEQUALS 2020-01-01T00:00:00"), {"ts"}) == (
            T0,
            T0,
        )

    def test_time_half_open_or_foreign_attr_is_unbounded(self):
        assert extract_time_range(parse_cql("ts AFTER 2020-01-01T00:00:00"), {"ts"}) is None
        assert extract_time_range(parse_cql("other < 2020-01-01T00:00:00"), {"ts"}) is None
        assert (
            extract_time_range(
                parse_cql("ts DURING 2020-01-01T00:00:00/2020-06-01T00:00:00 OR m > 5"),
                {"ts"},
            )
            is None
        )


@pytest.fixture(scope="module")
def pts(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    n = 3000
    rows = [
        (
            f"p{i:05d}",
            float(lon),
            float(lat),
            dt.datetime(2020, 1, 1) + dt.timedelta(seconds=int(s)),
            float(m),
            f"cat{i % 4}",
        )
        for i, (lon, lat, s, m) in enumerate(
            zip(
                rng.uniform(-20, 20, n),
                rng.uniform(-15, 15, n),
                rng.uniform(0, 364 * 86400, n),
                rng.uniform(0, 100, n),
            )
        )
    ]
    return spark.createDataFrame(
        rows, "fid string, lon double, lat double, event_ts timestamp, magnitude double, category string"
    ).cache()


class TestCompileAndRoute:
    def test_during_is_strict(self, spark):
        df = spark.createDataFrame(
            [(dt.datetime(2020, 1, 1),), (dt.datetime(2020, 3, 1),), (dt.datetime(2020, 6, 1),)],
            "event_ts timestamp",
        )
        col = to_column(parse_cql("event_ts DURING 2020-01-01T00:00:00/2020-06-01T00:00:00"))
        got = [r.event_ts for r in df.filter(col).collect()]
        assert got == [dt.datetime(2020, 3, 1)]  # both boundaries excluded

    def test_unbound_geometry_attr_refused(self):
        with pytest.raises(ValueError, match="geometry attribute"):
            to_column(parse_cql("BBOX(location, 0, 0, 1, 1)"))
        # but a custom binding admits it
        to_column(
            parse_cql("BBOX(location, 0, 0, 1, 1)"),
            CqlBinding(geom_attrs=frozenset({"location"})),
        )

    @pytest.mark.parametrize(
        "cql",
        [
            # spatio-temporal: both constraints bounded -> cost-based route
            "BBOX(geom, -5, -5, 5, 5) AND event_ts DURING 2020-02-01T00:00:00/2020-09-01T00:00:00 AND magnitude >= 20",
            # spatial only -> 2D tiered key ranges
            "INTERSECTS(geom, POLYGON ((-5 -5, 5 -5, 5 5, -5 5, -5 -5))) AND category IN ('cat1', 'cat2')",
            # OR with a non-spatial branch -> full scan, still exact
            "BBOX(geom, -5, -5, 5, 5) OR magnitude > 95",
            # DWITHIN geodesic ball + LIKE
            "DWITHIN(geom, POINT (0 0), 600, kilometers) AND category LIKE 'cat%'",
            # attribute-only -> full scan
            "magnitude BETWEEN 30 AND 60 AND category <> 'cat0'",
        ],
    )
    def test_route_independence(self, spark, pts, cql):
        """Whatever route the extracted constraints pick, the output equals
        the plain compiled filter over the raw table (the reference's
        contract: the CQL filter covers the baseQuery)."""
        from geowave_spark.plans.cql_route import cql_routed_query

        plain = sorted(r.fid for r in pts.filter(to_column(parse_cql(cql))).select("fid").collect())
        routed_df, route = cql_routed_query(pts, cql, xy_bits=8, t_bits=8)
        routed = sorted(r.fid for r in routed_df.select("fid").collect())
        assert routed == plain and len(plain) > 0

    def test_routes_taken(self, spark, pts):
        """The three route kinds actually engage for their constraint shapes
        (not everything silently falling back to full scan)."""
        from geowave_spark.plans.cql_route import cql_routed_query
        from geowave_spark.plans.index_select import prepare_layouts

        layouts = prepare_layouts(pts, 8, 8)
        _, r1 = cql_routed_query(
            pts,
            "BBOX(geom, -5, -5, 5, 5) AND event_ts DURING 2020-02-01T00:00:00/2020-03-01T00:00:00",
            xy_bits=8,
            t_bits=8,
            layouts=layouts,
        )
        assert r1 in ("spatial_2d", "spatiotemporal_3d")
        _, r2 = cql_routed_query(
            pts, "BBOX(geom, -5, -5, 5, 5)", xy_bits=8, t_bits=8, layouts=layouts
        )
        assert r2 == "spatial_2d"
        _, r3 = cql_routed_query(pts, "magnitude > 50", xy_bits=8, t_bits=8, layouts=layouts)
        assert r3 == "full_scan"

    def test_disjoint_and_contains_point(self, spark, pts):
        from geowave_spark.plans.cql_route import cql_routed_query

        n_all = pts.count()
        inside = pts.filter(
            to_column(parse_cql("INTERSECTS(geom, POLYGON ((-5 -5, 5 -5, 5 5, -5 5, -5 -5)))"))
        ).count()
        outside = pts.filter(
            to_column(parse_cql("DISJOINT(geom, POLYGON ((-5 -5, 5 -5, 5 5, -5 5, -5 -5)))"))
        ).count()
        assert inside + outside == n_all and inside > 0 and outside > 0
        row = pts.first()
        eq = pts.filter(
            to_column(parse_cql(f"CONTAINS(geom, POINT ({row.lon!r} {row.lat!r}))"))
        ).collect()
        assert [r.fid for r in eq] == [row.fid]


class TestArealBinding:
    """CQL against a WKT feature column (the reference's GeoTools feature
    case): spatial predicates run the exact per-kind refine, DISJOINT is
    the exact complement, DWITHIN is refused."""

    @pytest.fixture(scope="class")
    def feats(self, spark):
        rows = [
            ("pt_in", "POINT (2.0 2.0)", 4),
            ("pt_out", "POINT (20.0 2.0)", 4),
            ("line_cross", "LINESTRING (-5.0 2.5, 5.0 2.5)", 2),
            ("line_out", "LINESTRING (20.0 0.0, 30.0 5.0)", 2),
            ("poly_overlap", "POLYGON ((4.0 4.0, 12.0 4.0, 12.0 12.0, 4.0 12.0, 4.0 4.0))", 6),
            ("poly_inside", "POLYGON ((1.0 1.0, 2.0 1.0, 2.0 2.0, 1.0 2.0, 1.0 1.0))", 6),
            ("poly_out", "POLYGON ((30.0 30.0, 40.0 30.0, 40.0 40.0, 30.0 40.0, 30.0 30.0))", 6),
        ]
        return spark.createDataFrame(rows, "fid string, geom_wkt string, n_spans int")

    def _ids(self, df):
        return sorted(r.fid for r in df.select("fid").collect())

    def test_bbox_exact_per_kind(self, feats):
        from geowave_spark.functions.cql import CqlBinding, parse_cql, to_column

        col = to_column(
            parse_cql("BBOX(geom, 0, 0, 5, 5)"), CqlBinding(wkt_col="geom_wkt")
        )
        assert self._ids(feats.filter(col)) == [
            "line_cross", "poly_inside", "poly_overlap", "pt_in",
        ]

    def test_intersects_within_disjoint_partition(self, feats):
        from geowave_spark.functions.cql import CqlBinding, parse_cql, to_column

        b = CqlBinding(wkt_col="geom_wkt")
        q = "POLYGON ((0.0 0.0, 5.0 0.0, 5.0 5.0, 0.0 5.0, 0.0 0.0))"
        inter = self._ids(feats.filter(to_column(parse_cql(f"INTERSECTS(geom, {q})"), b)))
        within = self._ids(feats.filter(to_column(parse_cql(f"WITHIN(geom, {q})"), b)))
        disj = self._ids(feats.filter(to_column(parse_cql(f"DISJOINT(geom, {q})"), b)))
        assert inter == ["line_cross", "poly_inside", "poly_overlap", "pt_in"]
        assert within == ["poly_inside", "pt_in"]  # fully inside only
        assert sorted(inter + disj) == self._ids(feats)  # exact complement
        assert set(within) <= set(inter)

    def test_contains_point_literal(self, feats):
        from geowave_spark.functions.cql import CqlBinding, parse_cql, to_column

        b = CqlBinding(wkt_col="geom_wkt")
        got = self._ids(
            feats.filter(to_column(parse_cql("CONTAINS(geom, POINT (5.0 5.0))"), b))
        )
        assert got == ["poly_overlap"]
        # intersects with a point literal reduces to the same containment
        got2 = self._ids(
            feats.filter(to_column(parse_cql("INTERSECTS(geom, POINT (5.0 5.0))"), b))
        )
        assert got2 == ["poly_overlap"]

    def test_dwithin_refused_and_attrs_compose(self, feats):
        from geowave_spark.functions.cql import CqlBinding, parse_cql, to_column

        b = CqlBinding(wkt_col="geom_wkt")
        with pytest.raises(ValueError, match="point bindings only"):
            to_column(parse_cql("DWITHIN(geom, POINT (0 0), 5, degrees)"), b)
        col = to_column(parse_cql("BBOX(geom, 0, 0, 5, 5) AND n_spans >= 4"), b)
        assert self._ids(feats.filter(col)) == ["poly_inside", "poly_overlap", "pt_in"]

    def test_bias_layout_joins_the_route_choice(self, spark, pts):
        """With bias layouts prepared, the CQL router considers the
        compact-Hilbert layout too — and the output stays the plain
        filter's rows whichever wins."""
        from geowave_spark.plans.cql_route import cql_routed_query

        cql = (
            "BBOX(geom, -5, -5, 5, 5) AND "
            "event_ts DURING 2020-02-01T00:00:00/2020-03-01T00:00:00"
        )
        plain = sorted(
            r.fid for r in pts.filter(to_column(parse_cql(cql))).select("fid").collect()
        )
        routed, route = cql_routed_query(pts, cql, xy_bits=8, t_bits=8, bias="spatial")
        assert route in ("spatial_2d", "spatiotemporal_3d", "spatiotemporal_biased")
        assert sorted(r.fid for r in routed.select("fid").collect()) == plain and plain


class TestParserRoundtripHypothesis:
    """Generated-AST robustness: serialize with to_cql, re-parse, require
    node-exact equality — the parser/serializer pair cannot disagree on any
    construct the grammar admits."""

    @staticmethod
    def _strategies():
        import string

        from hypothesis import strategies as st

        from geowave_spark.functions import cql as C

        ident = st.text(string.ascii_lowercase, min_size=1, max_size=8).filter(
            lambda s: s.upper() not in C._KEYWORDS and s.upper() not in C._WKT_TYPES
        )
        num = st.floats(
            allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
        )
        text = st.text(
            string.ascii_letters + string.digits + " '%_-.", max_size=12
        )
        when = st.datetimes(
            min_value=dt.datetime(1000, 1, 1), max_value=dt.datetime(9000, 1, 1)
        )
        literal = st.one_of(num, text, when)

        def point():
            return num.flatmap(
                lambda x: num.map(lambda y: f"POINT ({x!r} {y!r})")
            )

        def polygon():
            def mk(vals):
                x0, y0, w, h = vals
                ring = (
                    f"{x0!r} {y0!r}, {x0 + abs(w) + 1!r} {y0!r}, "
                    f"{x0 + abs(w) + 1!r} {y0 + abs(h) + 1!r}, {x0!r} {y0 + abs(h) + 1!r}, "
                    f"{x0!r} {y0!r}"
                )
                return f"POLYGON (({ring}))"

            return st.tuples(num, num, num, num).map(mk)

        wkt = st.one_of(point(), polygon())
        leaf = st.one_of(
            st.builds(C.Cmp, ident, st.sampled_from(["=", "<>", "<", "<=", ">", ">="]), literal),
            st.builds(C.Between, ident, num, num, st.booleans()),
            st.builds(
                C.In, ident, st.lists(literal, min_size=1, max_size=4).map(tuple), st.booleans()
            ),
            st.builds(C.Like, ident, text, st.booleans(), st.booleans()),
            st.builds(C.IsNull, ident, st.booleans()),
            st.builds(C.BBox, ident, num, num, num, num),
            st.builds(
                C.Spatial,
                st.sampled_from(["intersects", "contains", "within", "disjoint"]),
                ident,
                wkt,
            ),
            st.builds(
                C.DWithin, ident, wkt, num.map(abs),
                st.sampled_from(["meters", "kilometers", "degrees"]),
            ),
            st.builds(C.During, ident, when, when),
            st.builds(
                C.TCmp, ident, st.sampled_from(["before", "after", "tequals"]), when
            ),
            st.just(C.Include()),
            st.just(C.Exclude()),
        )

        def extend(children):
            return st.one_of(
                st.lists(children, min_size=2, max_size=4).map(lambda c: C.And(tuple(c))),
                st.lists(children, min_size=2, max_size=4).map(lambda c: C.Or(tuple(c))),
                children.map(C.Not),
            )

        return st.recursive(leaf, extend, max_leaves=12)

    def test_to_cql_parse_roundtrip(self):
        from hypothesis import given, settings

        from geowave_spark.functions.cql import parse_cql, to_cql

        @settings(max_examples=300, deadline=None)
        @given(self._strategies())
        def run(ast):
            assert parse_cql(to_cql(ast)) == ast

        run()


class TestArealRoutedQuery:
    """CQL over a tiered-indexed extent table (the reference's CQL-over-
    feature-store path): tier+cell pruning, F5 dedup, full-CQL re-verify —
    identical doc sets to the plain filter."""

    def test_indexed_scan_matches_plain_filter(self, spark, geo001, tmp_path):
        from pyspark.sql import functions as F

        from geowave_spark.extract import with_geometry
        from geowave_spark.functions.cql import CqlBinding, parse_cql, to_column
        from geowave_spark.plans.cql_route import cql_areal_routed_query
        from geowave_spark.sources.tables import ingest_extents, read_indexed

        docs = with_geometry(spark.read.parquet(str(geo001 / "docs.parquet")))
        docs = docs.withColumn("n_spans", F.size("spans"))
        path = str(tmp_path / "docs_cql_idx")
        ingest_extents(
            docs.select("doc_id", "geom_wkt", "n_spans", "minx", "miny", "maxx", "maxy"),
            path,
        )
        back = read_indexed(spark, path)

        cql = (
            "BBOX(geom, -75.0, 39.5, -72.0, 42.5) AND n_spans >= 3"
        )
        routed, route = cql_areal_routed_query(back, cql)
        assert route == "tiered_extent"
        got = {r.doc_id for r in routed.select("doc_id").collect()}
        fine = to_column(parse_cql(cql), CqlBinding(wkt_col="geom_wkt"))
        want = {r.doc_id for r in docs.filter(fine).select("doc_id").collect()}
        assert got == want and got

        # a polygon INTERSECTS runs the same prune (envelope) + exact refine
        cql2 = (
            "INTERSECTS(geom, POLYGON ((-75.0 39.5, -72.0 39.5, -72.0 42.5, "
            "-75.0 42.5, -75.0 39.5)))"
        )
        routed2, _ = cql_areal_routed_query(back, cql2)
        got2 = {r.doc_id for r in routed2.select("doc_id").collect()}
        fine2 = to_column(parse_cql(cql2), CqlBinding(wkt_col="geom_wkt"))
        want2 = {r.doc_id for r in docs.filter(fine2).select("doc_id").collect()}
        assert got2 == want2 and got2

        # non-spatial CQL: full scan, still exact, still deduped
        routed3, route3 = cql_areal_routed_query(back, "n_spans = 4")
        assert route3 == "full_scan"
        assert routed3.count() == docs.filter("n_spans = 4").count()
