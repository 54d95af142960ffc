"""F9 visibility filtering: expression grammar pins (Accumulo
ColumnVisibility conventions), Catalyst fast path vs UDF fallback equality,
and plan-time field masking."""

import pytest
from pyspark.sql import functions as F

from geowave_spark.functions.visibility import (
    VisibilityParseError,
    evaluate_visibility,
    filter_by_visibility,
    mask_fields,
    visible_fields,
)

A = frozenset({"alpha", "bravo"})


class TestGrammar:
    def test_basic(self):
        assert evaluate_visibility("alpha", A)
        assert not evaluate_visibility("charlie", A)
        assert evaluate_visibility("alpha&bravo", A)
        assert not evaluate_visibility("alpha&charlie", A)
        assert evaluate_visibility("alpha|charlie", A)
        assert not evaluate_visibility("charlie|delta", A)

    def test_nesting(self):
        assert evaluate_visibility("(alpha|charlie)&(bravo|delta)", A)
        assert not evaluate_visibility("delta|(charlie&bravo)", A)
        assert evaluate_visibility("((alpha))", A)
        assert evaluate_visibility("charlie|(alpha&(bravo|echo))", A)

    def test_empty_is_public(self):
        assert evaluate_visibility("", A)
        assert evaluate_visibility(None, A)
        assert evaluate_visibility("", frozenset())

    def test_quoted_tokens(self):
        auths = frozenset({"a b", 'say"hi"'})
        assert evaluate_visibility('"a b"', auths)
        assert evaluate_visibility('"say\\"hi\\""', auths)
        assert not evaluate_visibility('"a b"&missing', auths)

    def test_mixed_ops_require_parens(self):
        # the grammar's documented restriction: a&b|c is malformed
        with pytest.raises(VisibilityParseError):
            evaluate_visibility("alpha&bravo|charlie", A)
        # parenthesized versions are fine
        assert evaluate_visibility("(alpha&bravo)|charlie", A)
        assert evaluate_visibility("alpha&(bravo|charlie)", A)

    def test_malformed(self):
        for bad in ["alpha&", "&alpha", "(alpha", "alpha)", "alpha bravo", '"open']:
            with pytest.raises(VisibilityParseError):
                evaluate_visibility(bad, A)


class TestFilter:
    def _df(self, spark):
        rows = [
            ("r0", "alpha"),
            ("r1", "charlie"),
            ("r2", "alpha&bravo"),
            ("r3", "delta|(charlie&bravo)"),
            ("r4", ""),
            ("r5", None),
            ("r6", "(alpha|charlie)&(bravo|delta)"),
        ]
        return spark.createDataFrame(rows, "id string, vis string")

    WANT = {"r0", "r2", "r4", "r5", "r6"}

    def test_catalyst_fast_path(self, spark):
        df = self._df(spark)
        got = {r.id for r in filter_by_visibility(df, "vis", A).collect()}
        assert got == self.WANT
        # the fast path ships as a native filter: no python eval in the plan
        plan = (
            filter_by_visibility(df, "vis", A)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_udf_fallback_matches_fast_path(self, spark):
        df = self._df(spark)
        got = {
            r.id for r in filter_by_visibility(df, "vis", A, max_distinct=2).collect()
        }
        assert got == self.WANT

    def test_no_auths_sees_only_public(self, spark):
        df = self._df(spark)
        got = {r.id for r in filter_by_visibility(df, "vis", set()).collect()}
        assert got == {"r4", "r5"}


class TestFieldMask:
    DEFN = {
        "magnitude": "charlie",       # exact key, unauthorized
        "geo.*": "alpha",             # regex: geom_wkt authorized
        ".*_ts": "alpha&charlie",     # regex: event_ts unauthorized
    }

    def test_visible_fields_precedence(self):
        fields = ["fid", "geom_wkt", "event_ts", "magnitude"]
        assert visible_fields(fields, self.DEFN, A) == ["fid", "geom_wkt"]
        # exact key beats a matching regex placed earlier
        defn = {"geo.*": "charlie", "geom_wkt": "alpha"}
        assert visible_fields(["geom_wkt"], defn, A) == ["geom_wkt"]

    def test_mask_nulls_unauthorized_columns(self, spark, geo001):
        pts = spark.read.parquet(str(geo001 / "points.parquet")).limit(50)
        out = mask_fields(pts, self.DEFN, A)
        assert out.columns == pts.columns  # schema shape preserved
        rows = out.collect()
        assert all(r.magnitude is None and r.event_ts is None for r in rows)
        assert all(r.fid is not None and r.geom_wkt is not None for r in rows)
