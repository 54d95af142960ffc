"""Temporal joins Spark lacks as built-ins: as-of and interval (range) join.

The brief's custom-operator family ("as-of join, range join") expressed as
compositions of existing DataFrame ops — no Python anywhere:

- **as-of join**: for each probe (key, t), the latest build row with
  ``ts <= t`` on the same key.  Implemented with the union + ordered-window
  trick: tag both sides, union on (key, ts), carry build values forward
  with ``last_value(..., ignoreNulls)`` over the time order, keep probe
  rows.  One shuffle on the key; no inequality join, no explosion.
- **interval join**: probes with a timestamp against builds carrying
  [start, end] ranges — the 1D twin of the spatial cell join: intervals
  explode to fixed time buckets (bounded by span/bucket), probes derive one
  bucket, equi-join + exact refine.  Buckets play the role of SFC cells;
  AQE handles hot buckets.

Both are exactly SQL-expressible (DuckDB window / inequality join), so the
driver oracle checks them end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probes: DataFrame,
    builds: DataFrame,
    key_col: str,
    probe_ts_col: str = "ts",
    build_ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """For each probe row: the latest build row at or before its timestamp,
    per key.  Output = probe columns + build value columns (NULL when no
    prior build row exists).

    Ties: a build row AT the probe instant matches (``<=``); builds sort
    before probes at equal ts (side tag), so an equal-ts build IS visible to
    the probe.  Among several build rows with identical (key, ts) the one
    with the greatest value struct (field-wise lexicographic over
    ``value_cols``) wins — a deterministic tie-break independent of
    partition layout."""
    if value_cols is None:
        value_cols = [c for c in builds.columns if c not in (key_col, build_ts_col)]
    # the build row travels as ONE struct so the carried-forward values are
    # atomic: a build row whose value column is NULL still wins as the
    # latest row (the struct itself is non-null), and every asof_* column
    # comes from the SAME build row — last(ignorenulls) over separate
    # columns would stitch a composite row together and skip NULL values
    b = builds.select(
        F.col(key_col).alias("_k"),
        F.col(build_ts_col).alias("_t"),
        F.lit(0).alias("_side"),  # builds first at equal timestamps
        F.struct(*[F.col(c) for c in value_cols]).alias("_bv"),
    )
    p = probes.withColumn("_k", F.col(key_col)).withColumn(
        "_t", F.col(probe_ts_col)
    ).withColumn("_side", F.lit(1)).withColumn(
        "_bv", F.lit(None).cast(dict(b.dtypes)["_bv"])
    )
    u = p.select(b.columns + [c for c in p.columns if c not in b.columns]).unionByName(
        b, allowMissingColumns=True
    )
    # tertiary key: the build-value struct itself (field-wise lexicographic),
    # so duplicate (key, ts) build rows tie-break deterministically — the
    # LAST struct in sort order wins, matching an ORDER BY ... LAST_VALUE
    # oracle.  (Requires orderable value columns; maps are not.)  Probes sort
    # among themselves arbitrarily, which is harmless: their _bv is NULL and
    # last(ignorenulls) skips them.
    w = Window.partitionBy("_k").orderBy("_t", "_side", "_bv").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    u = u.withColumn("_bv", F.last("_bv", ignorenulls=True).over(w))
    out = u.filter(F.col("_side") == 1)
    keep = [c for c in probes.columns]
    return out.select(
        *keep, *[F.col("_bv")[c].alias(f"asof_{c}") for c in value_cols]
    )


def interval_join(
    probes: DataFrame,
    intervals: DataFrame,
    probe_ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket: str = "week",
) -> DataFrame:
    """Every (probe, interval) pair with ``start <= ts <= end`` — as an
    equi-join on time buckets plus exact refine, never an inequality join.

    ``bucket`` is a date_trunc unit ("day" | "week" | "month"): BOTH sides
    truncate to it and the interval side steps one calendar unit at a time
    (calendar-aware, so DST-shifted local-midnight boundaries still align
    in non-UTC sessions) — pick the unit near the median interval length,
    exactly like choose_cover_tier picks the cell size.  A pair meets in
    exactly one bucket (the probe's), so no dedup shuffle is needed.
    Malformed rows with ``end < start`` match nothing instead of crashing
    the sequence generator."""
    if bucket not in ("day", "week", "month"):
        raise ValueError("bucket must be one of day/week/month")
    ivals = intervals.filter(F.col(end_col) >= F.col(start_col)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(start_col)),
                F.date_trunc(bucket, F.col(end_col)),
                F.expr(f"INTERVAL 1 {bucket}"),
            )
        ),
    )
    p = probes.withColumn("_bucket", F.date_trunc(bucket, F.col(probe_ts_col)))
    joined = p.join(ivals, "_bucket").filter(
        (F.col(probe_ts_col) >= F.col(start_col)) & (F.col(probe_ts_col) <= F.col(end_col))
    )
    return joined.drop("_bucket")
