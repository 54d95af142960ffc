"""Deferred-unpersist cache registry shared by operators that persist
intermediate DataFrames.

An operator that persists a DataFrame consumed by the LAZY plan it returns
cannot unpersist before returning (the cache must survive until the caller
materializes the plan).  The registry defers the release: each new call to
the operator family releases the previous call's caches, and a session can
drop everything via :func:`release_all`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_REGISTRIES: list["CacheRegistry"] = []


class CacheRegistry:
    def __init__(self) -> None:
        self._live: list[DataFrame] = []
        _REGISTRIES.append(self)

    def add(self, df: DataFrame) -> DataFrame:
        self._live.append(df)
        return df

    def release(self) -> None:
        while self._live:
            df = self._live.pop()
            try:
                df.unpersist()
            except Exception:
                pass


def release_all() -> None:
    """Drop every operator family's outstanding caches plus the layout
    registry (session cleanup)."""
    for r in _REGISTRIES:
        r.release()
    from geowave_spark.plans.index_select import release_layouts

    release_layouts()
