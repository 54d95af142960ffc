"""Continuous ANN: IVF-PQ top-k served per micro-batch over a Structured
Streaming query-vector feed.

The embedding twin of :mod:`geowave_spark.streaming.knn` — and the same
scenario the reference serves with its continuous-ingest + stored-layer
loop (core/ingest/.../IngestFromKafkaDriver.java feeding the layer its
KNNQuery answers over): a STATIC pre-encoded corpus answers arriving
queries continuously.

``foreachBatch`` for the same reason the spatial stream uses it: the top-k
rank window per query id is a batch-plan construct the incremental planner
refuses, and each micro-batch is a bounded DataFrame where the UNCHANGED
batch operator runs with full semantics.

Exactly-once: deterministic ``batch_id=<n>/`` parquet output in overwrite
mode + checkpointed source offsets — identical recovery contract to the
spatial streams (pinned by kill/resume tests there and replicated here).

Scale notes: the quantizer trains and the corpus encodes ONCE at stream
construction (``pq_encode_corpus`` + cache) — per batch only the query
side runs its probe/LUT UDFs (|batch| rows) and the bounded candidate
equi-join.  At 100 TB the corpus's code columns are read from the table
(encoded at ingest) instead of cached, and the stream passes that
pre-encoded frame straight in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from geowave_spark.cache import CacheRegistry
from geowave_spark.operators.similarity import (
    ivf_train_centroids,
    ivfpq_topk,
    pq_encode_corpus,
    pq_train_codebooks,
)

# each new stream releases the previous stream's cached encode; a session
# can drop everything via geowave_spark.cache.release_all()
_CACHES = CacheRegistry()


def ann_topk_stream(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    output_dir: str,
    checkpoint_dir: str,
    *,
    centroids: list | None = None,
    codebooks: list | None = None,
    n_centroids: int = 64,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 256,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    available_now: bool = False,
    pre_encoded: bool = False,
):
    """Serve IVF-PQ top-k continuously: ``queries`` is a streaming DataFrame
    of (qid, qvec), ``corpus`` a static embedding layer.  Returns the
    started ``StreamingQuery``; results land under
    ``<output_dir>/batch_id=<n>/`` as parquet.

    ``pre_encoded=True`` is the 100 TB shape: ``corpus`` already carries
    the ``_list``/``_pq``/``_pq_norm`` columns (stored at ingest via
    :func:`pq_encode_corpus`) and ``centroids``/``codebooks`` are the ones
    it was encoded with — the stream then encodes NOTHING and caches
    nothing; otherwise the quantizer trains and the corpus encodes + caches
    once at stream construction (the cache is registered so a later stream
    or ``cache.release_all()`` releases it)."""
    if not queries.isStreaming:
        raise ValueError("queries must be a streaming DataFrame (readStream)")
    if corpus.isStreaming:
        raise ValueError(
            "corpus must be static: a streaming corpus under top-k would "
            "need retraction semantics (a better neighbor arriving later "
            "invalidates emitted rows) — re-plan on layer updates instead"
        )

    if pre_encoded:
        if centroids is None or codebooks is None:
            raise ValueError(
                "pre_encoded corpus needs the centroids + codebooks it was "
                "encoded with (the query side probes/LUTs from them)"
            )
        enc = corpus
    else:
        # train + encode + cache the static side once for the stream's life
        if centroids is None:
            centroids = ivf_train_centroids(
                corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
            )
        if codebooks is None:
            codebooks = pq_train_codebooks(
                corpus, m=m, n_codes=n_codes, id_col=id_col, vec_col=vec_col
            )
        _CACHES.release()
        enc = _CACHES.add(
            pq_encode_corpus(corpus, centroids, codebooks, id_col, vec_col)
            .select(id_col, vec_col, "_list", "_pq", "_pq_norm")
            .cache()
        )

    def _run_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = ivfpq_topk(
            enc,
            batch_df,
            k=k,
            centroids=centroids,
            codebooks=codebooks,
            nprobe=nprobe,
            rerank=rerank,
            id_col=id_col,
            vec_col=vec_col,
            qid_col=qid_col,
            qvec_col=qvec_col,
            pre_encoded=True,
        )
        # deterministic path + overwrite = idempotent under batch replay
        out.write.mode("overwrite").parquet(f"{output_dir}/batch_id={batch_id}")

    w = (
        queries.writeStream.foreachBatch(_run_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
