"""Measured recall for the sign-LSH approximate paths.

`operators/similarity.py` argues recall from the sign-Hamming geometry
(a pair at cosine c lands at expected distance bits * acos(c) / pi); this
module MEASURES it against the exact twins so the docstring claims are
pinned numbers, not arguments:

- near-dup pair recall at cosine >= 0.95 (the regime the LSH variant is
  shipped for) on a corpus with genuinely-planted near-duplicates;
- top-k neighbor recall of the bucketed ANN vs brute-force cosine on the
  sf0.001 fixture corpus.

Precision needs no measurement: both LSH paths verify exact cosine on the
candidates, so their output is a subset of the exact answer by construction
(asserted anyway).
"""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    """sf0.001 embeddings + one perturbed twin per base vector: noise sized
    so each planted pair sits at cosine ~0.96-0.99 — real near-dup geometry,
    unlike the near-orthogonal raw fixtures (max pairwise cos ~0.5)."""
    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = base.select("vec_id", "embedding").collect()
    rng = np.random.RandomState(7)
    out = []
    for r in rows:
        v = np.asarray(r.embedding, dtype=np.float64)
        v /= np.linalg.norm(v)
        out.append((int(r.vec_id), [float(x) for x in v]))
        noise = rng.normal(0.0, 1.0, v.shape)
        noise -= noise.dot(v) * v  # orthogonal component only
        noise /= np.linalg.norm(noise)
        theta = rng.uniform(0.10, 0.25)  # cos in [~0.969, ~0.995]
        twin = np.cos(theta) * v + np.sin(theta) * noise
        out.append((int(r.vec_id) + 1_000_000, [float(x) for x in twin]))
    return spark.createDataFrame(out, "vec_id long, embedding array<float>")


class TestSignLshRecall:
    def test_near_dup_pair_recall(self, spark, near_dup_corpus):
        from geowave_spark.operators.similarity import (
            embedding_dup_pairs_exact,
            embedding_dup_pairs_lsh,
        )

        exact = {
            (r.id_a, r.id_b)
            for r in embedding_dup_pairs_exact(near_dup_corpus, 0.95).collect()
        }
        assert exact, "corpus must contain planted near-dup pairs"
        # measured on the planted corpus (500 pairs at cos 0.969-0.995, 16
        # bits): radius 1 -> 0.926, radius 2 -> 0.992.  Floors sit just
        # under the measured values so a probe/bucketing regression trips.
        floors = {1: 0.90, 2: 0.97}
        for radius, floor in floors.items():
            got = {
                (r.id_a, r.id_b)
                for r in embedding_dup_pairs_lsh(
                    near_dup_corpus, 0.95, hamming_radius=radius
                ).collect()
            }
            assert got <= exact  # exact-cosine verify => perfect precision
            recall = len(got) / len(exact)
            assert recall >= floor, (
                f"near-dup recall {recall:.3f} at radius {radius} below {floor}"
            )

    def test_topk_neighbor_recall(self, spark):
        from geowave_spark.operators.similarity import cosine_topk, lsh_bucketed_topk

        embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = embs.selectExpr(
            "vec_id as qid", "embedding as qvec"
        ).limit(100)
        k = 10
        exact = {
            (r.qid, r.vec_id) for r in cosine_topk(embs, queries, k=k).collect()
        }
        got = {
            (r.qid, r.vec_id)
            for r in lsh_bucketed_topk(
                embs, queries, k=k, hamming_radius=2
            ).collect()
        }
        recall = len(got & exact) / len(exact)
        # general-regime recall@10 on near-orthogonal vectors: the HARD case
        # for sign-LSH — exact top-10 neighbors here sit at cos ~0.3-0.5,
        # i.e. 5-7 expected bits away, mostly beyond radius-2 multiprobe.
        # Measured 0.329; floor pins that band so a probe/bucketing
        # regression is visible.  For general-regime ANN the engine ships
        # IVF (ivf_topk) instead; sign-LSH is the near-dup-regime path
        # (recall 0.93-0.99 above).
        assert recall >= 0.30, f"top-k recall {recall:.3f} regressed"


class TestIvfPqRecall:
    """IVF-PQ: exact-equality contract, ADC plumbing fidelity, and measured
    recall in both regimes (near-dup = the shipped regime; near-orthogonal
    random vectors = the documented hard case, same discipline as sign-LSH's
    0.33 row above)."""

    def test_rerank_all_equals_ivf(self, spark):
        from geowave_spark.operators.similarity import (
            ivf_topk, ivf_train_centroids, ivfpq_topk, pq_train_codebooks)

        embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = embs.selectExpr("vec_id as qid", "embedding as qvec").limit(50)
        cents = ivf_train_centroids(embs, n_centroids=8)
        books = pq_train_codebooks(embs, m=8, n_codes=16)
        a = {(r.qid, r.vec_id, r.rank) for r in
             ivf_topk(embs, queries, k=10, centroids=cents, nprobe=3).collect()}
        b = {(r.qid, r.vec_id, r.rank) for r in
             ivfpq_topk(embs, queries, k=10, centroids=cents, codebooks=books,
                        nprobe=3, rerank=None).collect()}
        assert a == b and len(a) == 500  # codebook-independent equality

    def test_adc_fidelity(self, spark):
        """Pins the LUT/element_at plumbing: a broken code index would score
        random codewords (mae ~0.5); the measured mae is 0.081."""
        from pyspark.sql import functions as F

        from geowave_spark.operators.similarity import (
            _dot, _norm_sq, _pq_encode_udf, _pq_lut_udf, adc_cosine,
            pq_train_codebooks)

        embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        books = pq_train_codebooks(embs, m=8, n_codes=16)
        c = (embs.withColumn("_enc", _pq_encode_udf(books)(F.col("embedding")))
             .select("vec_id", "embedding",
                     F.col("_enc.codes").alias("_pq"),
                     F.col("_enc.norm_sq").alias("_pq_norm")))
        q = (embs.selectExpr("vec_id as qid", "embedding as qvec").limit(5)
             .withColumn("_lut", _pq_lut_udf(books)(F.col("qvec")))
             .withColumn("_qnorm", _norm_sq(F.col("qvec"))))
        both = (c.crossJoin(q)
                .withColumn("adc", adc_cosine(F.col("_pq"), F.col("_lut"),
                                              F.col("_pq_norm"), F.col("_qnorm")))
                .withColumn("exact", _dot(F.col("embedding"), F.col("qvec"))
                            / F.sqrt(_norm_sq(F.col("embedding"))
                                     * _norm_sq(F.col("qvec")))))
        mae = both.agg(F.avg(F.abs(F.col("adc") - F.col("exact")))).collect()[0][0]
        assert mae < 0.15, f"ADC mae {mae:.3f} — LUT plumbing broken?"

    def test_near_dup_twin_recall(self, spark, near_dup_corpus):
        """The regime PQ ships for (near-dup candidate scan at 100 TB): the
        planted twin sits at cos 0.969-0.995 vs ~0.5 for everything else —
        gaps far above the ADC mae.  Measured 1.000 at nprobe 2/16 and 4/16,
        rerank 5."""
        from pyspark.sql import functions as F

        from geowave_spark.operators.similarity import (
            ivf_train_centroids, ivfpq_topk, pq_train_codebooks)

        queries = (near_dup_corpus.filter(F.col("vec_id") < 1_000_000)
                   .selectExpr("vec_id as qid", "embedding as qvec"))
        n_q = queries.count()
        cents = ivf_train_centroids(near_dup_corpus, n_centroids=16)
        books = pq_train_codebooks(near_dup_corpus, m=8, n_codes=32)
        got = ivfpq_topk(near_dup_corpus, queries, k=1, centroids=cents,
                         codebooks=books, nprobe=4, rerank=5).collect()
        hits = sum(1 for r in got if r.vec_id == r.qid + 1_000_000)
        assert hits / n_q >= 0.99, f"twin recall {hits / n_q:.3f}"

    def test_general_regime_recall_band(self, spark):
        """The hard case: exact top-10 neighbors of near-orthogonal random
        vectors sit at cos 0.3-0.5 with gaps comparable to the ADC mae, so
        ADC ordering inside a bounded rerank loses ground.  Measured 0.634
        at probe-all + rerank 40 (16 codes); the floor pins the band so an
        encode/LUT regression is visible.  For exactness-critical
        general-regime top-k the engine ships ivf_topk (ADC-free)."""
        from geowave_spark.operators.similarity import (
            cosine_topk, ivf_train_centroids, ivfpq_topk, pq_train_codebooks)

        embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = embs.selectExpr("vec_id as qid", "embedding as qvec").limit(50)
        cents = ivf_train_centroids(embs, n_centroids=8)
        books = pq_train_codebooks(embs, m=8, n_codes=16)
        exact = {(r.qid, r.vec_id) for r in cosine_topk(embs, queries, k=10).collect()}
        got = {(r.qid, r.vec_id) for r in
               ivfpq_topk(embs, queries, k=10, centroids=cents, codebooks=books,
                          nprobe=8, rerank=40).collect()}
        recall = len(got & exact) / len(exact)
        assert recall >= 0.55, f"general-regime recall {recall:.3f} regressed"

    def test_pre_encoded_corpus_roundtrip(self, spark, tmp_path):
        """The 100 TB shape: codes encoded + persisted at ingest, read back,
        searched with pre_encoded=True — identical output to encode-per-call."""
        from geowave_spark.operators.similarity import (
            ivf_train_centroids, ivfpq_topk, pq_encode_corpus,
            pq_train_codebooks)

        embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = embs.selectExpr("vec_id as qid", "embedding as qvec").limit(20)
        cents = ivf_train_centroids(embs, n_centroids=8)
        books = pq_train_codebooks(embs, m=8, n_codes=16)
        path = str(tmp_path / "encoded")
        pq_encode_corpus(embs, cents, books).write.parquet(path)
        stored = spark.read.parquet(path)
        a = {(r.qid, r.vec_id, r.rank) for r in
             ivfpq_topk(stored, queries, k=5, centroids=cents, codebooks=books,
                        nprobe=3, rerank=20, pre_encoded=True).collect()}
        b = {(r.qid, r.vec_id, r.rank) for r in
             ivfpq_topk(embs, queries, k=5, centroids=cents, codebooks=books,
                        nprobe=3, rerank=20).collect()}
        assert a == b and a

    def test_pre_encoded_guards(self, spark):
        from geowave_spark.operators.similarity import ivfpq_topk

        embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = embs.selectExpr("vec_id as qid", "embedding as qvec").limit(2)
        with pytest.raises(ValueError, match="centroids"):
            ivfpq_topk(embs, q, pre_encoded=True)
        with pytest.raises(ValueError, match="lacks"):
            ivfpq_topk(embs, q, centroids=[[0.0] * 64], codebooks=[[[0.0] * 8]],
                       pre_encoded=True)

    def test_prune_scan_partition_prunes(self, spark, tmp_path):
        """prune_scan=True on a _list-partitioned store: identical output,
        and the static IN filter reaches the scan as a PartitionFilter."""
        from pyspark.sql import functions as F

        from geowave_spark.operators.similarity import (
            ivf_train_centroids, ivfpq_topk, pq_encode_corpus,
            pq_train_codebooks)

        embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = embs.selectExpr("vec_id as qid", "embedding as qvec").limit(10)
        cents = ivf_train_centroids(embs, n_centroids=8)
        books = pq_train_codebooks(embs, m=8, n_codes=16)
        path = str(tmp_path / "enc_by_list")
        pq_encode_corpus(embs, cents, books).write.partitionBy("_list").parquet(path)
        stored = spark.read.parquet(path)
        kw = dict(k=5, centroids=cents, codebooks=books, nprobe=2, rerank=20,
                  pre_encoded=True)
        plain = ivfpq_topk(stored, queries, **kw)
        pruned = ivfpq_topk(stored, queries, prune_scan=True, **kw)
        assert ({(r.qid, r.vec_id, r.rank) for r in pruned.collect()}
                == {(r.qid, r.vec_id, r.rank) for r in plain.collect()})
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        scan = [ln for ln in plan.splitlines()
                if "PartitionFilters" in ln and "_list" in ln.split("PartitionFilters")[1][:120]]
        assert scan, "the _list IN filter must reach the scan as a PartitionFilter"


class TestSemDeDup:
    """Invariants of the cluster-then-prune semantic dedup (the oracle pins
    exactness; these pin the semantics the oracle can't see by row-hash)."""

    def test_planted_twins_pruned(self, spark, near_dup_corpus):
        """Every planted near-dup twin (cos >= 0.95 to its base) must be
        dropped, every base must survive: twins share the base's cluster at
        this geometry, and the upper-triangular sweep keeps the lower id."""
        from geowave_spark.operators.similarity import semdedup

        out = semdedup(near_dup_corpus, k=4, threshold=0.95).collect()
        by_id = {r.vec_id: r for r in out}
        n = len(out)
        bases = [r for r in out if r.vec_id < 1_000_000]
        twins = [r for r in out if r.vec_id >= 1_000_000]
        assert len(bases) and len(twins) and len(bases) == len(twins)
        # a twin may only survive if it landed in a different cluster than
        # its base (possible at cluster boundaries); count those honestly
        escaped = [
            t for t in twins
            if t.is_kept and by_id[t.vec_id - 1_000_000].cluster == t.cluster
        ]
        assert not escaped, f"{len(escaped)} same-cluster twins survived"
        assert all(b.is_kept for b in bases), "a base vector was pruned"
        assert n == len(bases) + len(twins)

    def test_output_covers_input_exactly_once(self, spark):
        from geowave_spark.operators.similarity import semdedup

        embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = semdedup(embs, k=4, threshold=0.4)
        assert out.count() == embs.count()
        assert out.select("vec_id").distinct().count() == embs.count()

    def test_threshold_one_keeps_everything_distinct(self, spark):
        """threshold > max pairwise cosine => nothing is pruned."""
        from geowave_spark.operators.similarity import semdedup

        embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = semdedup(embs, k=4, threshold=1.0000001)
        assert out.filter(~out.is_kept).count() == 0
