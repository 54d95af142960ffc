"""Every catalog query runs at sf0.001 (not just the driver's sf0.01):
catches accidental scale-factor hard-coding and keeps the whole surface
executable end-to-end.  Row counts are not asserted (fixtures differ per
sf); each query must build, execute, and return a stable schema."""

import pytest


def _all_queries():
    # the FULL surface, not just the driver's 50-entry dict — the
    # deregistered twins must stay executable too
    from geowave_spark.queries import ALL_QUERIES

    return sorted(ALL_QUERIES.items())


@pytest.mark.parametrize("name,fn", _all_queries(), ids=[n for n, _ in _all_queries()])
def test_query_runs_at_sf0001(spark, name, fn):
    df = fn(spark, "/root/testdata/sf0.001")
    n = df.count()
    assert n >= 0
    assert len(df.schema.fields) > 0
