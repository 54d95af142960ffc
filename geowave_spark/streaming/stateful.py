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
