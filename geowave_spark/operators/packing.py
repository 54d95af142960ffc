"""Sequence packing for the training-data pipeline.

Pretraining pipelines feed fixed-length token windows, not documents: the
corpus is concatenated (in a deterministic order) and chunked every
``budget`` tokens, with documents freely straddling chunk boundaries — the
classic concat-then-chunk regime.  :func:`pack_chunk_spans` computes, for
every document, exactly which chunks it lands in and which of its token
ranges feed each chunk, without materializing any token stream:

- **shard** = md5-hash bucket of the doc id (deterministic; packs never
  span shards, so shards are independently consumable splits and the
  computation is embarrassingly parallel across them),
- **order** = doc id within the shard (total, deterministic, engine-free),
- one window cumulative sum per shard gives each doc its token offset,
- a bounded explode (``ceil(n_tokens / budget) + 1`` rows max) emits the
  (chunk, token-range) spans.

Pure Catalyst end to end: one shuffle on the shard key, one sort, zero
Python — at 10^12 documents this is a repartition + running sum, the
cheapest shape a global ordering constraint allows.  Consumers join the
spans back to the payload and slice; the spans themselves are the packing
manifest (resume-able, auditable, engine-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geowave_spark.functions.text import md5_long, tokens


def pack_chunk_spans(
    docs: DataFrame,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Chunk-span manifest for concat-then-chunk packing at ``budget``
    tokens per chunk: ``(doc_id, shard, chunk_id, tok_start, tok_end)``
    with ``[tok_start, tok_end)`` the document's token range feeding that
    chunk (a straddling document emits one row per chunk it touches).

    ``chunk_id`` counts within the shard; ``(shard, chunk_id)`` is the
    global chunk key.  Pass ``n_tokens_col`` when token counts are already
    materialized; otherwise whitespace tokens of ``text_col`` are counted.
    Zero-token documents are dropped (they feed no chunk).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    n_toks = (
        F.col(n_tokens_col).cast("long")
        if n_tokens_col
        else F.size(tokens(F.col(text_col))).cast("long")
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (md5_long(F.col(id_col).cast("string")) % n_shards).alias("shard"),
        n_toks.alias("n_toks"),
    ).filter(F.col("n_toks") > 0)
    w = Window.partitionBy("shard").orderBy("doc_id")
    spans = base.select(
        "doc_id",
        "shard",
        "n_toks",
        (F.sum("n_toks").over(w) - F.col("n_toks")).alias("off"),
    )
    b = F.lit(int(budget))
    first = F.floor(F.col("off") / b)
    last = F.floor((F.col("off") + F.col("n_toks") - 1) / b)
    return spans.select(
        "doc_id",
        "shard",
        F.explode(F.sequence(first, last)).alias("chunk_id"),
        "off",
        "n_toks",
    ).select(
        "doc_id",
        "shard",
        "chunk_id",
        F.greatest(F.lit(0).cast("long"), F.col("chunk_id") * b - F.col("off")).alias("tok_start"),
        F.least(F.col("n_toks"), (F.col("chunk_id") + 1) * b - F.col("off")).alias("tok_end"),
    )
