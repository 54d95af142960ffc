"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming (SURVEY §2.9); these are the
engine's scale additions for incremental pipelines:

- **streaming exact dedup**: keep the first doc per content hash across
  micro-batches; state = the seen hashes (with last-seen processing-time
  stamps) per hash-prefix group.  With ``ttl_ms`` set, hashes idle longer
  than the TTL are expired on every invocation and a processing-time timeout
  clears groups that stop receiving traffic entirely — state is bounded by
  the distinct-hash arrival rate times the TTL window.  With ``ttl_ms=None``
  state grows without bound (exact dedup over the full stream history); use
  only when the key space is known-bounded.  The grouping key is a hash
  prefix so state shards uniformly across executors (no hot keys by
  construction).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "doc_id long, text_md5 string"
DEDUP_STATE_SCHEMA = "seen array<string>, stamps array<long>"


def make_dedup_fn(ttl_ms: int | None):
    """Build the per-group dedup function.  Factored out (and state accessed
    only through the GroupState interface) so expiry semantics are unit-
    testable without a running stream."""

    def _dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # no traffic for a full TTL: drop the whole group's state
            state.remove()
            return
        if state.exists:
            seen_list, stamp_list = state.get
            stamps = dict(zip(seen_list, stamp_list))
        else:
            stamps = {}
        now = state.getCurrentProcessingTimeMs() if ttl_ms is not None else 0
        if ttl_ms is not None:
            stamps = {h: t for h, t in stamps.items() if now - t < ttl_ms}
        out = []
        for pdf in pdfs:
            # first occurrence within the batch AND across batches
            pdf = pdf.drop_duplicates(subset=["text_md5"], keep="first")
            fresh = pdf[~pdf["text_md5"].isin(stamps.keys())]
            for h in pdf["text_md5"]:
                stamps[h] = now  # refresh last-seen for live hashes
            if len(fresh):
                out.append(fresh[["doc_id", "text_md5"]])
        state.update((list(stamps.keys()), list(stamps.values())))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.concat(out)

    return _dedup_fn


def streaming_exact_dedup(
    docs_stream: DataFrame, prefix_len: int = 2, ttl_ms: int | None = None
) -> DataFrame:
    """Emit only first-seen documents (by md5(text)) across micro-batches.

    State shards on the md5 prefix (`16^prefix_len` groups) — uniform by
    construction; each group's state is the seen-hash list with last-seen
    stamps, TTL-bounded when ``ttl_ms`` is given (see module docstring)."""
    keyed = docs_stream.select(
        F.col("doc_id"),
        F.md5(F.col("text")).alias("text_md5"),
    ).withColumn("shard", F.substring("text_md5", 1, prefix_len))
    timeout = (
        GroupStateTimeout.NoTimeout if ttl_ms is None else GroupStateTimeout.ProcessingTimeTimeout
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        make_dedup_fn(ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# Streaming geofence: the batch transition scan with cross-batch state
# ---------------------------------------------------------------------------

GEOFENCE_OUT_SCHEMA = (
    "entity string, fid string, event_ms long, from_zone string, "
    "to_zone string, kind string"
)
# last known zone per entity; `primed` distinguishes "never seen" from
# "last seen outside every zone" (both have last_zone NULL)
GEOFENCE_STATE_SCHEMA = "last_zone string, primed boolean"


def make_geofence_fn():
    """Per-entity transition fold: batch rows sort by (event_ms, fid), each
    ping's zone is the MINIMUM containing zone_id (the batch operator's
    overlap convention — `operators/geofence.py`), and a row is emitted
    whenever consecutive pings disagree.  The first ping an entity EVER
    sends only primes the state (exactly the batch scan's rn > 1 guard), so
    an ordered replay of a static corpus reproduces the batch output
    bit-for-bit (pinned in tests/test_streaming.py)."""

    def _fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_zone, primed = state.get
        else:
            last_zone, primed = None, False
        out = []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            batch = pd.concat(frames)
            # one row per ping: min non-null zone across the PIP rows (the
            # all-null row from the raw branch keeps outside pings alive)
            per_ping = (
                batch.groupby(["event_ms", "fid"], sort=True)["zone"]
                .agg(lambda s: min((z for z in s if pd.notna(z)), default=None))
                .reset_index()
            )
            for row in per_ping.itertuples(index=False):
                zone = row.zone
                if primed and (zone or None) != (last_zone or None):
                    kind = (
                        "enter"
                        if last_zone is None
                        else ("exit" if zone is None else "switch")
                    )
                    out.append((key[0], row.fid, row.event_ms, last_zone, zone, kind))
                last_zone, primed = zone, True
        state.update((last_zone, primed))
        if out:
            yield pd.DataFrame(
                out,
                columns=["entity", "fid", "event_ms", "from_zone", "to_zone", "kind"],
            )

    return _fn


def streaming_geofence(
    points_stream: DataFrame,
    zones: DataFrame,
    *,
    entity_col: str = "category",
    id_col: str = "fid",
    ts_col: str = "event_ts",
    **pip_kwargs,
) -> DataFrame:
    """The geofence transition stream (`operators/geofence.py`) running
    continuously: zone resolution is the SAME stream-static PIP join the
    batch operator uses (zones broadcast, pings never exploded), unioned
    with a null-zone branch so outside pings survive the inner join, then
    one `applyInPandasWithState` keyed on the entity carries each entity's
    last zone across micro-batches.

    State is one (string, bool) per entity — bounded by the fleet size, not
    the stream length.  Ordering contract: within a micro-batch rows fold
    in (event_ms, fid) order; ACROSS batches the source must deliver each
    entity's pings in event order (the tracker-feed norm; a watermarked
    reorder buffer is the standard upstream fix otherwise)."""
    from geowave_spark.streaming.spatial import pip_join_stream

    if not points_stream.isStreaming:
        raise ValueError("points must be a streaming DataFrame (readStream)")
    base = points_stream.select(
        F.col(entity_col).alias("entity"),
        F.col(id_col).alias("fid"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("event_ms"),
        "lon",
        "lat",
    )
    located = pip_join_stream(base, zones, **pip_kwargs).select(
        "entity", "fid", "event_ms", F.col("zone_id").alias("zone")
    )
    raw = base.select(
        "entity", "fid", "event_ms", F.lit(None).cast("string").alias("zone")
    )
    return (
        located.unionByName(raw)
        .groupBy("entity")
        .applyInPandasWithState(
            make_geofence_fn(),
            outputStructType=GEOFENCE_OUT_SCHEMA,
            stateStructType=GEOFENCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
