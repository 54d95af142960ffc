"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring the kNN design of the spatial engine
(`geowave_spark/operators/knn.py`, itself modeled on the reference's
partition-based NN join `analytics/mapreduce/.../nn/NNMapReduce.java`):

- **brute-force cosine top-k** — broadcast the (small) query set, score every
  corpus vector with a JVM-side ``zip_with``/``aggregate`` dot product
  (sequential left-to-right double accumulation: bit-identical to the
  DuckDB oracle's ``list_reduce`` fold), window top-k per query.  The
  baseline and the verification oracle for the bucketed variant.
- **sign-LSH bucketed top-k** — the scale path: an 8-bit coarse quantizer
  (sign of the first SIGN_BITS dimensions) buckets both sides; each query
  probes its own bucket plus all Hamming<=1 neighbors, so the candidate set
  shrinks ~2^SIGN_BITS/9-fold while recall stays high for clustered data.
  At 100 TB this turns the crossJoin into an equi-join on ``bucket`` —
  shuffle keys are uniform by construction (sign bits of float noise).

Scores are computed in double precision from the float inputs; ranking ties
are broken by vector id so results are deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SIGN_BITS = 8


def _dot(a, b):
    """Sequential double-precision dot product (order-stable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_sq(a):
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    max_broadcast_queries: int = 100_000,
) -> DataFrame:
    """Brute-force cosine top-k: (qid, vec_id, rank); self-matches excluded.

    cosine = dot / sqrt(|a|^2 * |b|^2); ranking on (-cosine, vec_id).  The
    score column is intentionally not emitted (rank is the contract — float
    formatting differs across engines; ordering does not).

    Scale guard: the broadcast-NL shape is only correct while the query side
    fits in executor memory.  Query sets defined as corpus fractions outgrow
    that silently, so the plan is refused (not silently degraded) above
    ``max_broadcast_queries`` — route large query sets through
    :func:`lsh_bucketed_topk`, whose bucket equi-join shuffles both sides."""
    n_q = queries.limit(max_broadcast_queries + 1).count()
    if n_q > max_broadcast_queries:
        raise ValueError(
            f"cosine_topk query side exceeds {max_broadcast_queries} rows; "
            "broadcast-NL would OOM executors — use lsh_bucketed_topk (or "
            "raise max_broadcast_queries deliberately)"
        )
    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(F.col(id_col) != F.col(qid_col))
        .withColumn(
            "cos",
            _dot(F.col(vec_col), F.col(qvec_col))
            / F.sqrt(_norm_sq(F.col(vec_col)) * _norm_sq(F.col(qvec_col))),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(qid_col), F.col(id_col), F.col("rank"))
    )


def sign_bucket(vec, bits: int = SIGN_BITS):
    """Coarse quantizer: bit j set iff vec[j] > 0 (first `bits` dims)."""
    b = F.lit(0)
    for j in range(bits):
        b = b + F.when(F.element_at(vec, j + 1) > 0, F.lit(1 << j)).otherwise(0)
    return b


def probe_masks(bits: int, hamming_radius: int) -> list[int]:
    """All XOR masks within the Hamming radius: identity, single-bit flips,
    and (radius 2) bit pairs — 1 + b + b(b-1)/2 probes.  Radius > 2 is
    refused rather than silently truncated: the probe count grows
    combinatorially and a wider radius usually means `bits` is too large for
    the corpus density."""
    if hamming_radius > 2:
        raise ValueError("hamming_radius > 2 unsupported; reduce bits instead")
    masks = [0]
    if hamming_radius >= 1:
        masks += [1 << j for j in range(bits)]
    if hamming_radius >= 2:
        masks += [(1 << i) | (1 << j) for i in range(bits) for j in range(i + 1, bits)]
    return masks


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    hamming_radius: int = 1,
    bits: int = SIGN_BITS,
) -> DataFrame:
    """Bucketed ANN: equi-join on sign-LSH bucket with Hamming<=radius
    multi-probe.  Output schema matches :func:`cosine_topk` (ranks are within
    the probed candidate set — approximate by design).  ``bits`` sizes the
    bucket space: pick ~log2(N / target_candidates_per_bucket).

    Measured recall (tests/test_ann_recall.py): high in the near-dup regime
    the sign family targets, but recall@10 is only ~0.33 (radius 2, 16 bits)
    when the true neighbors are near-orthogonal (cos 0.3-0.5 -> 5-7 expected
    bit flips).  For general-regime top-k use :func:`ivf_topk`."""
    c = corpus.withColumn("bucket", sign_bucket(F.col(vec_col), bits))
    probes = [F.lit(m) for m in probe_masks(bits, hamming_radius)]
    q = (
        queries.withColumn("qbucket", sign_bucket(F.col(qvec_col), bits))
        .withColumn("flip", F.explode(F.array(*probes)))
        .withColumn("bucket", F.col("qbucket").bitwiseXOR(F.col("flip")))
        .drop("qbucket", "flip")
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col(id_col) != F.col(qid_col))
        .withColumn(
            "cos",
            _dot(F.col(vec_col), F.col(qvec_col))
            / F.sqrt(_norm_sq(F.col(vec_col)) * _norm_sq(F.col(qvec_col))),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(qid_col), F.col(id_col), F.col("rank"))
    )


def embedding_dup_pairs_exact(
    embs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact: every unordered pair
    with cosine >= threshold.  All-pairs broadcast-NL self-join — the
    verification-grade twin of :func:`embedding_dup_pairs_lsh` (use that at
    corpus scale; this one is O(n^2) by definition and belongs on bounded
    candidate sets or small corpora)."""
    a = embs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / F.sqrt(
        _norm_sq(F.col("va")) * _norm_sq(F.col("vb"))
    )
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )


def embedding_dup_pairs_lsh(
    embs: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = SIGN_BITS,
    hamming_radius: int = 1,
) -> DataFrame:
    """Embedding-cosine near-dup pairs at corpus scale: sign-LSH bucket
    equi-join (Hamming <= radius multi-probe) + exact cosine verify.

    Recall: a pair at cosine c lands at expected sign-Hamming distance
    bits * acos(c) / pi (~1.6 of 16 bits in the near-dup regime).  MEASURED
    against the exact twin on a planted near-dup corpus (500 pairs at cos
    0.969-0.995, 16 bits — tests/test_ann_recall.py): radius 1 -> 0.926,
    radius 2 -> 0.992, precision 1.0 by construction (exact-cosine verify).
    At low thresholds this is NOT a substitute for the exact join.  The join
    key is the bucket (uniform for centered data): one shuffle, no driver
    traffic, candidates bounded by bucket occupancy."""
    c = embs.select(F.col(id_col), F.col(vec_col)).withColumn(
        "bucket", sign_bucket(F.col(vec_col), bits)
    )
    probes = [F.lit(m) for m in probe_masks(bits, hamming_radius)]
    probed = (
        c.withColumn("flip", F.explode(F.array(*probes)))
        .withColumn("bucket", F.col("bucket").bitwiseXOR(F.col("flip")))
        .select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket"
        )
    )
    left = c.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    cos = _dot(F.col("va"), F.col("vb")) / F.sqrt(
        _norm_sq(F.col("va")) * _norm_sq(F.col("vb"))
    )
    return (
        left.join(probed, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "va", "vb")
        .distinct()
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + nprobe search
# ---------------------------------------------------------------------------


def ivf_train_centroids(
    embs: DataFrame,
    n_centroids: int = 64,
    sample_size: int = 10_000,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train the IVF coarse quantizer: deterministic bounded sample (smallest
    md5-hashed ids — reproducible in any engine), driver-side numpy Lloyd.
    The sample is capped, so driver memory is bounded regardless of corpus
    size; at 100 TB the quantizer trains on the same fixed-size sample."""
    import numpy as np

    from geowave_spark.functions.text import md5_long

    rows = (
        embs.withColumn("_h", md5_long(F.col(id_col).cast("string")))
        .orderBy("_h")
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    k = min(n_centroids, len(X))
    cent = X[:k].copy()  # md5-order head: a deterministic uniform draw
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        new = np.array(
            [X[a == j].mean(axis=0) if (a == j).any() else cent[j] for j in range(k)]
        )
        if np.allclose(new, cent):
            break
        cent = new
    return [c.tolist() for c in cent]


def _nearest_centroids_udf(centroids: list, nprobe: int):
    """pandas UDF: vector -> the nprobe nearest centroid ids (vectorized
    matmul per Arrow batch; the centroid matrix rides the closure once per
    worker)."""
    from pyspark.sql.types import ArrayType, IntegerType

    C = np.array(centroids, dtype=np.float64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def _probe(vec: pd.Series) -> pd.Series:
        X = np.array(vec.tolist(), dtype=np.float64)
        d = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return _probe


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroids: list | None = None,
    n_centroids: int = 64,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """IVF ANN: corpus vectors live in their nearest-centroid list (one int
    key column — the inverted file); each query probes its nprobe nearest
    lists.  The search is an equi-join on the list id (shuffle both sides,
    no broadcast requirement, no driver traffic), exact cosine + window
    top-k inside the probed lists.  Output schema matches cosine_topk.

    Scale shape: candidates per query ~= nprobe/n_centroids of the corpus;
    list ids are balanced by construction (k-means cells); skew from hot
    lists is AQE's skew-join case.  Pass pre-trained ``centroids`` to share
    one quantizer across queries (train once at ingest, like the index)."""
    if centroids is None:
        centroids = ivf_train_centroids(
            corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
    assign1 = _nearest_centroids_udf(centroids, 1)
    probeN = _nearest_centroids_udf(centroids, nprobe)
    c = corpus.withColumn("_list", F.element_at(assign1(F.col(vec_col)), 1))
    q = queries.withColumn("_list", F.explode(probeN(F.col(qvec_col))))
    scored = (
        c.join(q, "_list")
        .filter(F.col(id_col) != F.col(qid_col))
        .withColumn(
            "cos",
            _dot(F.col(vec_col), F.col(qvec_col))
            / F.sqrt(_norm_sq(F.col(vec_col)) * _norm_sq(F.col(qvec_col))),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(qid_col), F.col(id_col), F.col("rank"))
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized ADC scoring inside the probed lists
# ---------------------------------------------------------------------------


def pq_train_codebooks(
    embs: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    sample_size: int = 10_000,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Product-quantization codebooks (Jegou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011): split the D dims into ``m``
    contiguous subspaces and run an independent k-means per subspace over
    the same bounded deterministic sample :func:`ivf_train_centroids` uses
    (smallest md5-hashed ids), driver-side numpy.  Returns an
    (m, n_codes, D/m) nested list.  D must be divisible by ``m``."""
    from geowave_spark.functions.text import md5_long

    rows = (
        embs.withColumn("_h", md5_long(F.col(id_col).cast("string")))
        .orderBy("_h")
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    X = np.array([r[0] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"embedding dim {d} not divisible by m={m} subspaces")
    sub = d // m
    books = []
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        k = min(n_codes, len(S))
        cent = S[:k].copy()  # md5-order head: deterministic uniform draw
        for _ in range(iters):
            dist = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = dist.argmin(axis=1)
            new = np.array(
                [S[a == c].mean(axis=0) if (a == c).any() else cent[c] for c in range(k)]
            )
            if np.allclose(new, cent):
                break
            cent = new
        books.append(cent.tolist())
    return books


def _pq_encode_udf(codebooks: list):
    """pandas UDF: vector -> (codes array<int>, |reconstruction|^2) — the
    corpus-side encode.  The reconstruction norm is a pure function of the
    codes, so it's precomputed here once instead of via a second lookup at
    query time.  Vectorized per Arrow batch: one argmin matmul per subspace."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType)

    B = [np.array(b, dtype=np.float64) for b in codebooks]
    sub = B[0].shape[1]
    schema = StructType([
        StructField("codes", ArrayType(IntegerType())),
        StructField("norm_sq", DoubleType()),
    ])

    @F.pandas_udf(schema)
    def _encode(vec: pd.Series) -> pd.DataFrame:
        X = np.array(vec.tolist(), dtype=np.float64)
        n = len(X)
        codes = np.empty((n, len(B)), dtype=np.int32)
        norm = np.zeros(n, dtype=np.float64)
        for j, C in enumerate(B):
            S = X[:, j * sub : (j + 1) * sub]
            dist = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
            c = dist.argmin(axis=1)
            codes[:, j] = c
            norm += (C[c] * C[c]).sum(axis=1)
        return pd.DataFrame({
            "codes": [row.tolist() for row in codes],
            "norm_sq": norm,
        })

    return _encode


def _pq_lut_udf(codebooks: list):
    """pandas UDF: query vector -> ADC lookup table, an (m x n_codes) nested
    array of q_subspace . codeword dot products.  One matmul per subspace
    per Arrow batch; the scoring join then needs ZERO Python — the ADC dot
    is a zip_with/element_at fold over (codes, lut) in Catalyst."""
    from pyspark.sql.types import ArrayType, DoubleType

    B = [np.array(b, dtype=np.float64) for b in codebooks]
    sub = B[0].shape[1]

    @F.pandas_udf(ArrayType(ArrayType(DoubleType())))
    def _lut(vec: pd.Series) -> pd.Series:
        X = np.array(vec.tolist(), dtype=np.float64)
        per_sub = [X[:, j * sub : (j + 1) * sub] @ C.T for j, C in enumerate(B)]
        return pd.Series([
            [per_sub[j][i].tolist() for j in range(len(B))]
            for i in range(len(X))
        ])

    return _lut


def adc_cosine(codes_col, lut_col, pq_norm_sq_col, q_norm_sq_col):
    """Asymmetric-distance cosine, pure Catalyst: dot(q, reconstruction) =
    sum_j lut[j][codes[j]], normalized by the true query norm and the
    precomputed reconstruction norm."""
    dot = F.aggregate(
        F.zip_with(codes_col, lut_col, lambda c, row: F.element_at(row, c + 1)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dot / F.sqrt(q_norm_sq_col * pq_norm_sq_col)


def pq_encode_corpus(
    corpus: DataFrame,
    centroids: list,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Ingest-time corpus encode: adds ``_list`` (IVF list id), ``_pq``
    (m int codes) and ``_pq_norm`` (reconstruction norm^2).  At 100 TB these
    three columns are STORED with the table (like the SFC cell columns) so
    query time reads codes instead of vectors for the candidate scan.
    Store the table partitioned/bucketed by ``_list``: bucketing makes the
    probe equi-join shuffle-free on the corpus side, and when the probed
    list set is known up front (small query batches), a static
    ``_list.isin(probed)`` filter partition-prunes the scan to
    nprobe/n_centroids of the files (the UDF-derived probe side defeats
    dynamic partition pruning — checked empirically, so the static filter
    is the honest path)."""
    assign1 = _nearest_centroids_udf(centroids, 1)
    enc = _pq_encode_udf(codebooks)(F.col(vec_col))
    return (
        corpus.withColumn("_list", F.element_at(assign1(F.col(vec_col)), 1))
        .withColumn("_enc", enc)
        .withColumn("_pq", F.col("_enc.codes"))
        .withColumn("_pq_norm", F.col("_enc.norm_sq"))
        .drop("_enc")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
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
    pre_encoded: bool = False,
    prune_scan: bool = False,
) -> DataFrame:
    """IVF-PQ ANN: IVF list pruning + ADC scoring on PQ codes + exact cosine
    rerank of the ``rerank`` best ADC candidates per query (Jegou et al.
    2011 — the standard RAM-resident billion-vector layout, e.g. the
    IndexIVFPQ shape).  Output schema matches :func:`cosine_topk`.

    Scale rationale: inside the probed lists each candidate is scored from
    ``m`` bytes of code via the query's lookup table instead of D floats —
    the candidate-scan payload drops ~4D/m-fold (32x at D=64, m=8), which is
    what lets a 100 TB embedding corpus's candidate stage live in memory.
    Exact vectors are touched only for the rerank winners
    (output-sensitive).  The scoring join is pure Catalyst (zip_with fold
    over the LUT); Python appears only in the per-batch encode/LUT UDFs.

    ``rerank=None`` reranks ALL probed candidates exactly, making the output
    definitionally identical to :func:`ivf_topk` for any trained codebook —
    and, at probe-all, to the exact top-k: the oracle mode.  Pruned-regime
    recall is measured in tests/test_ann_recall.py.

    ``pre_encoded=True`` means ``corpus`` already carries the
    ``_list``/``_pq``/``_pq_norm`` columns from :func:`pq_encode_corpus`
    (encoded + persisted at ingest — the 100 TB shape); ``centroids`` and
    ``codebooks`` must then be the SAME ones the encode used (they still
    drive the query side).

    ``prune_scan=True`` additionally collects the distinct probed list ids
    (one tiny job: <= nprobe x |queries| ints) and filters the corpus with
    a static ``_list IN (...)`` predicate BEFORE the join — on a corpus
    stored ``partitionBy("_list")`` that partition-prunes the scan to
    ~nprobe/n_centroids of the files.  The explicit filter exists because
    the UDF-derived probe side defeats dynamic partition pruning (checked
    empirically).  Use for bounded query batches; with corpus-sized query
    sets the probed-list set approaches all lists and the extra job buys
    nothing."""
    if pre_encoded:
        if centroids is None or codebooks is None:
            raise ValueError(
                "pre_encoded corpus needs the centroids + codebooks it was "
                "encoded with (the query side probes/LUTs from them)"
            )
        missing = {"_list", "_pq", "_pq_norm"} - set(corpus.columns)
        if missing:
            raise ValueError(f"pre_encoded corpus lacks {sorted(missing)}")
        c = corpus.select(id_col, vec_col, "_list", "_pq", "_pq_norm")
    else:
        if centroids is None:
            centroids = ivf_train_centroids(
                corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
            )
        if codebooks is None:
            codebooks = pq_train_codebooks(
                corpus, m=m, n_codes=n_codes, id_col=id_col, vec_col=vec_col
            )
        c = pq_encode_corpus(corpus, centroids, codebooks, id_col, vec_col).select(
            id_col, vec_col, "_list", "_pq", "_pq_norm"
        )
    probeN = _nearest_centroids_udf(centroids, nprobe)
    q = (
        queries.withColumn("_lut", _pq_lut_udf(codebooks)(F.col(qvec_col)))
        .withColumn("_qnorm", _norm_sq(F.col(qvec_col)))
        .withColumn("_list", F.explode(probeN(F.col(qvec_col))))
    )
    if prune_scan:
        probed = [r[0] for r in q.select("_list").distinct().collect()]
        c = c.filter(F.col("_list").isin(probed))
    exact_cos = _dot(F.col(vec_col), F.col(qvec_col)) / F.sqrt(
        _norm_sq(F.col(vec_col)) * _norm_sq(F.col(qvec_col))
    )
    if rerank is not None:
        # the candidate stage reads CODES ONLY: the corpus vector column
        # enters neither the probe join nor the ADC-rank window exchange
        # (which carries just (qid, id, adc) rows) — this projection IS the
        # 32x-payload claim; vectors are fetched by id for the winners only
        adc = adc_cosine(
            F.col("_pq"), F.col("_lut"), F.col("_pq_norm"), F.col("_qnorm")
        )
        wa = Window.partitionBy(qid_col).orderBy(F.col("_adc").desc(), F.col(id_col))
        top = (
            c.select(id_col, "_list", "_pq", "_pq_norm")
            .join(q.select(qid_col, "_list", "_lut", "_qnorm"), "_list")
            .filter(F.col(id_col) != F.col(qid_col))
            .select(qid_col, id_col, adc.alias("_adc"))
            .withColumn("_adc_rank", F.row_number().over(wa))
            .filter(F.col("_adc_rank") <= rerank)
            .select(qid_col, id_col)
        )
        scored = (
            top.join(c.select(id_col, vec_col), id_col)
            .join(queries.select(qid_col, qvec_col), qid_col)
            .withColumn("cos", exact_cos)
        )
    else:
        # rerank-all (oracle/validation mode == ivf_topk): every probed
        # candidate is exact-scored, so vectors necessarily flow here and
        # the PQ columns prune away — ADC itself is pinned by pytest
        scored = (
            c.select(id_col, vec_col, "_list")
            .join(q.select(qid_col, qvec_col, "_list"), "_list")
            .filter(F.col(id_col) != F.col(qid_col))
            .withColumn("cos", exact_cos)
        )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col(qid_col), F.col(id_col), F.col("rank"))
    )


# ---------------------------------------------------------------------------
# SemDeDup: cluster-then-prune semantic deduplication
# ---------------------------------------------------------------------------


def semdedup(
    embs: DataFrame,
    k: int = 8,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic dedup (Abbas et al. 2023, "SemDeDup"): cluster the embedding
    space coarsely, then drop every vector whose cosine to ANY earlier
    (lower-id) vector in the same cluster reaches ``threshold``.  Returns
    ``(vec_id, cluster, is_kept)`` for every input row.

    Engine-independent determinism (the whole design):

    - centroids are the ``k`` RAW corpus vectors with the smallest md5-hashed
      ids — a reproducible uniform draw with NO float averaging, so every
      number downstream is an IEEE product of stored floats that DuckDB
      reproduces bit-for-bit (the same trick as the kNN/ANN oracles);
    - assignment is argmax cosine with ties broken on centroid index;
    - the prune rule is the paper's upper-triangular sweep (drop x iff some
      y < x in x's cluster has cos(x, y) >= threshold — y itself need not
      survive), which needs no recursion: one within-cluster semi-join.

    100 TB shape: the assignment stage is a pure map-side projection — the
    k centroid vectors ride the plan as literals (one k-row driver fetch,
    the ivf_train_centroids budget), so NO shuffle touches the corpus until
    the prune; at k beyond literal-plan comfort (~10^3) the same argmax runs
    as the IVF assignment UDF closure.  The prune stage is a self-equi-join
    keyed on the cluster id,
    the candidate volume sum(c_i^2) bounded by cluster occupancy the same
    way IVF bounds its probe lists.  Hot clusters are AQE's skew-join case;
    a corpus whose mass collapses into one cluster needs a larger k, not a
    different operator.  Nothing touches the driver but the k centroid rows.
    (Reference analog: the reference's dedup layer is key-equality only —
    `core/store/.../DedupeFilter.java` — semantic dedup is beyond-reference
    scope per the round brief.)"""
    from geowave_spark.functions.text import md5_long

    # centroid fetch: ONE tiny job bounded by k rows (the same driver-side
    # budget as ivf_train_centroids' sample) so the assignment below can be
    # a literal expression — a pure map-side projection with NO shuffle of
    # the n x k pairs a crossJoin+window argmax would exchange
    cent_rows = (
        embs.withColumn("_h", md5_long(F.col(id_col).cast("string")))
        .orderBy("_h")
        .limit(k)
        .select(vec_col)
        .collect()
    )
    vec = F.col(vec_col)
    v_norm = _norm_sq(vec)
    scored = []
    for j, r in enumerate(cent_rows):
        cv = F.array(*[F.lit(float(x)) for x in r[0]])  # float32 -> double is exact
        cos_j = _dot(vec, cv) / F.sqrt(v_norm * _norm_sq(cv))
        # greatest over (cos, -j) structs = argmax with smallest-index ties
        scored.append(F.struct(cos_j.alias("c"), F.lit(-j).alias("n")))
    best = F.greatest(*scored) if len(scored) > 1 else scored[0]
    asg = embs.select(id_col, vec_col, (-best["n"]).alias("cluster"))
    a = asg.select(
        F.col(id_col).alias("_id_a"), F.col(vec_col).alias("_va"), "cluster"
    )
    b = asg.select(
        F.col(id_col).alias("_id_b"), F.col(vec_col).alias("_vb"), "cluster"
    )
    cos_pair = _dot(F.col("_va"), F.col("_vb")) / F.sqrt(
        _norm_sq(F.col("_va")) * _norm_sq(F.col("_vb"))
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("_id_a") < F.col("_id_b"))
        .withColumn("_cos", cos_pair)
        .filter(F.col("_cos") >= threshold)
        .select(F.col("_id_b").alias("_dropped_id"))
        .distinct()
    )
    return asg.join(
        dropped, asg[id_col] == dropped["_dropped_id"], "left"
    ).select(
        id_col,
        "cluster",
        F.col("_dropped_id").isNull().alias("is_kept"),
    )
