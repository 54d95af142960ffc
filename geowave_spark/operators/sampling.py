"""Deterministic splitting and sampling for the training-data pipeline.

Production pipelines never split with ``rand()``: a split must be a pure
function of the document id so that (a) re-runs, retries, and engine swaps
reproduce it bit-for-bit, (b) newly ingested documents land in a split
without re-shuffling the old ones, and (c) eval contamination is auditable.
Both operators here are single Catalyst expressions over the shared
cross-engine hash (md5-prefix bigint, ``functions/text.py``) — no shuffle,
no Python, no state; at 10^12 docs they are a map-only pass that fuses into
whatever scan feeds them.

The reference engine has no sampling surface; its nearest analog is the
deterministic row-id splits used for balanced scans
(`core/store/.../AccumuloMRUtils.java:77-130`), which hash_split
generalizes from byte-range placement to semantic subsets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions.text import md5_long, md5_long_sql

# hash buckets live in [0, 1) with 6-decimal resolution: coarse enough that
# the md5-prefix bigint is uniform in every slice, fine enough for per-mille
# split weights
_RES = 1_000_000


def _unit_hash(id_col: Column, salt: str) -> Column:
    """Deterministic uniform draw in [0, 1) from (salt, id) — the Spark side
    of the shared convention; :func:`unit_hash_sql` is the DuckDB twin."""
    return (md5_long(F.concat(F.lit(salt), id_col)) % _RES).cast("double") / _RES


def unit_hash_sql(expr: str, salt: str) -> str:
    salted = md5_long_sql(f"'{salt}' || {expr}")
    return f"CAST({salted} % {_RES} AS DOUBLE) / {_RES}"


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Assign every row to a named split by hashing its id: appends a
    ``split`` column.  ``weights`` maps split name -> fraction (must sum to
    ~1); assignment thresholds follow the dict's insertion order, so
    ``{"train": .8, "val": .1, "test": .1}`` puts hash < 0.8 in train.

    Changing ``salt`` rotates the whole assignment; adding documents later
    never moves an existing document between splits (the draw depends only
    on its own id).
    """
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    h = _unit_hash(F.col(id_col), salt)
    names = list(weights)
    expr = F.lit(names[-1])  # the last split absorbs the rounding tail
    upper = 0.0
    arms = []
    for name in names[:-1]:
        upper += weights[name]
        arms.append((upper, name))
    for bound, name in reversed(arms):
        expr = F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def hash_split_sql(weights: dict[str, float], id_expr: str, salt: str = "split-v1") -> str:
    """DuckDB CASE expression mirroring :func:`hash_split` bit-for-bit."""
    h = unit_hash_sql(id_expr, salt)
    names = list(weights)
    upper = 0.0
    cases = []
    for name in names[:-1]:
        upper += weights[name]
        cases.append(f"WHEN {h} < {upper!r} THEN '{name}'")
    return "CASE " + " ".join(cases) + f" ELSE '{names[-1]}' END"


def domain_mixture_sample(
    df: DataFrame,
    domain_col: str,
    c: float,
    id_col: str = "doc_id",
    salt: str = "mixture-v1",
) -> DataFrame:
    """Inverse-sqrt domain rebalancing: keep each row of domain ``d`` with
    probability ``min(1, c / sqrt(n_d))`` — common domains are downsampled
    toward ``c * sqrt(n_d)`` kept rows, rare domains pass through whole (the
    sqrt-temperature mixture every multi-source pretraining corpus applies;
    α = 0.5 in the usual ``w_d ∝ n_d^α`` notation, expressed without the
    normalizing sum so every arithmetic op is IEEE-exact and the DuckDB
    oracle reproduces the kept set bit-for-bit: sqrt, one division, one
    min — all correctly rounded, no order-dependent float summation).

    Plan shape at 10^12 rows: one partial-agg count per domain (domains are
    few), a broadcast join of the tiny rate table, and the same
    deterministic md5 draw as :func:`hash_split` — map-only over the corpus,
    reproducible across runs/engines/partitionings.  Appends ``_nd``
    (domain size) and ``_rate`` columns alongside the kept rows.
    """
    counts = df.groupBy(domain_col).agg(F.count("*").alias("_nd"))
    rates = counts.withColumn(
        "_rate",
        F.least(F.lit(1.0), F.lit(float(c)) / F.sqrt(F.col("_nd").cast("double"))),
    )
    joined = df.join(F.broadcast(rates), domain_col)
    return joined.filter(_unit_hash(F.col(id_col), salt) < F.col("_rate"))


def stratified_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    per_stratum: dict[str, float] | None = None,
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic sample: keep a row iff its (salt, id) draw falls below
    the stratum's fraction.  With ``per_stratum`` (strata value -> fraction,
    requires ``strata_col``), each stratum gets its own rate — the standard
    rebalancing move (e.g. downsample boilerplate-heavy languages); strata
    missing from the dict fall back to ``fraction``.

    Unlike ``DataFrame.sample`` this is reproducible across runs, engines,
    and partitionings, and composes with :func:`hash_split` (different salts
    are independent draws).
    """
    if per_stratum and strata_col is None:
        raise ValueError("per_stratum requires strata_col")
    h = _unit_hash(F.col(id_col), salt)
    if per_stratum:
        rate = F.lit(float(fraction))
        for value, frac in per_stratum.items():
            rate = F.when(F.col(strata_col) == value, F.lit(float(frac))).otherwise(rate)
    else:
        rate = F.lit(float(fraction))
    return df.filter(h < rate)
