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
