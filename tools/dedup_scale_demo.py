"""Scale-stress for the text dedup + ANN family: ~20x the headline corpus.

The 100-TB claim for `dedup_minhash_lsh` / `ann_lsh_topk` rests on every
candidate stage being a bounded equi-join on uniformly-hashed keys (band
hashes / sign buckets) with hot-key caps (`max_doc_freq` kills boilerplate
shingles).  This demo evidences that claim the way `tools/skew_demo.py`
does for the spatial join: run the SAME operators on a deterministic
corpus ~20x the sf0.1 headline (100k docs / 40k embeddings vs 5k / 2k),
with the pathologies that break naive implementations planted in:

- 30% of docs share a boilerplate preamble (the hot-shingle pathology: its
  shingles appear in 30k docs -> 4.5x10^8 candidate pairs if uncapped);
- 2% of docs have a planted near-dup twin (so the true-pair output is
  non-trivial and its size is known: ~n*0.02);
- embeddings: 2% planted near-dups + uniform background.

Reported per scale: wall seconds, docs(vecs)/sec, and the max/median task
time of the heaviest stages via the Spark UI REST API — a hot key would
show up as one task holding the stage (the skew demo's 64x signature).
Uniform keys => per-doc cost roughly flat (or better, as fixed overhead
amortizes) from 1x to 20x.

Usage: python tools/dedup_scale_demo.py [--docs 100000] [--vecs 40000]
Writes nothing to the repo; prints a markdown table row per scale.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_docs(n: int, seed: int = 42):
    """Deterministic corpus: zipf vocab, 40-60 words/doc, 30% boilerplate
    preamble, 2% near-dup twins (90% token overlap)."""
    rng = np.random.RandomState(seed)
    vocab = np.array([f"w{i:04d}" for i in range(5000)])
    zipf = rng.zipf(1.3, size=n * 70) % 5000
    boiler = " ".join(vocab[rng.randint(0, 5000, 15)])
    rows = []
    pos = 0
    for i in range(n):
        ln = 40 + (i * 7919) % 21
        words = vocab[zipf[pos : pos + ln]]
        pos += ln
        text = " ".join(words)
        if i % 10 < 3:  # 30% boilerplate prefix
            text = boiler + " " + text
        rows.append((f"d{i:07d}", text))
        if i % 50 == 0:  # 2% near-dup twin: drop ~10% of tokens
            keep = rng.rand(len(words)) > 0.1
            twin = " ".join(words[keep])
            if i % 10 < 3:
                twin = boiler + " " + twin
            rows.append((f"d{i:07d}_twin", twin))
    return rows


def make_vecs(n: int, dim: int = 64, seed: int = 7):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, dim).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    for i in range(0, n, 50):  # 2% planted near-dups
        j = (i + n // 2) % n
        v[j] = v[i] + rng.randn(dim).astype(np.float32) * 0.05
        v[j] /= np.linalg.norm(v[j])
    return v


def task_straggler_stats(spark, top_n: int = 3) -> list[dict]:
    """Max/median task duration for the heaviest completed stages, via the
    local UI REST API (no cluster needed — local mode serves it too)."""
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        stages = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=COMPLETE")
        )
        stages.sort(key=lambda s: -s.get("executorRunTime", 0))
        out = []
        for s in stages[:top_n]:
            q = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages/{s['stageId']}/"
                    f"{s['attemptId']}/taskSummary?quantiles=0.5,1.0"
                )
            )
            med, mx = q["duration"]
            out.append(
                {
                    "stage": s["stageId"],
                    "name": s.get("name", "")[:40],
                    "tasks": s.get("numCompleteTasks"),
                    "median_ms": med,
                    "max_ms": mx,
                    "ratio": round(mx / max(med, 1.0), 1),
                }
            )
        return out
    except Exception as e:  # UI disabled or API shape changed: report, don't fail
        return [{"error": str(e)[:80]}]


def run(spark, n_docs: int, n_vecs: int) -> dict:
    from pyspark.sql import functions as F

    from geowave_spark.operators.dedup import minhash_lsh_pairs, release_caches
    from geowave_spark.operators.similarity import lsh_bucketed_topk

    docs = spark.createDataFrame(make_docs(n_docs), "doc_id string, text string")
    docs = docs.repartition(32).persist()
    n_docs_actual = docs.count()

    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    n_pairs = pairs.count()
    t_dedup = time.time() - t0
    release_caches()
    docs.unpersist()

    v = make_vecs(n_vecs)
    vecs = spark.createDataFrame(
        [(f"v{i:06d}", row.tolist()) for i, row in enumerate(v)],
        "vec_id string, embedding array<float>",
    ).repartition(32).persist()
    n_vecs_actual = vecs.count()
    q = vecs.limit(200).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    t0 = time.time()
    topk = lsh_bucketed_topk(vecs, q, k=10)
    n_topk = topk.count()
    t_ann = time.time() - t0

    # IVF-PQ vs plain IVF at the SAME probe budget (nprobe 8/64): the PQ
    # candidate scan reads m=8 bytes of code per row instead of 64 floats
    # (32x payload), with exact rerank of the 40 best ADC candidates; twin
    # recall over the planted near-dups shows the ADC ordering holds in the
    # regime that matters.  Encode happens once (ingest-time shape).
    from geowave_spark.operators.similarity import (
        ivf_topk, ivf_train_centroids, ivfpq_topk, pq_encode_corpus,
        pq_train_codebooks)

    cents = ivf_train_centroids(vecs, n_centroids=64)
    books = pq_train_codebooks(vecs, m=8, n_codes=256)
    enc = pq_encode_corpus(vecs, cents, books).persist()
    enc.count()
    t0 = time.time()
    n_pq = ivfpq_topk(enc, q, k=10, centroids=cents, codebooks=books,
                      nprobe=8, rerank=40, pre_encoded=True).count()
    t_ivfpq = time.time() - t0
    t0 = time.time()
    ivf_topk(vecs, q, k=10, centroids=cents, nprobe=8).count()
    t_ivf = time.time() - t0
    # twin recall: query the planted bases, expect the twin at rank 1
    n = n_vecs_actual
    planted = [(f"v{i:06d}", f"v{(i + n // 2) % n:06d}") for i in range(0, 5000, 50)]
    qp = vecs.filter(F.col("vec_id").isin([p[0] for p in planted])).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = {
        r.qid: r.vec_id
        for r in ivfpq_topk(enc, qp, k=1, centroids=cents, codebooks=books,
                            nprobe=8, rerank=5, pre_encoded=True).collect()
    }
    twin_recall = sum(1 for a, b in planted if got.get(a) == b) / len(planted)
    enc.unpersist()
    vecs.unpersist()

    return {
        "ivfpq_s": round(t_ivfpq, 2),
        "ivf_s": round(t_ivf, 2),
        "ivfpq_rows": n_pq,
        "pq_twin_recall": round(twin_recall, 3),
        "docs": n_docs_actual,
        "dedup_s": round(t_dedup, 2),
        "docs_per_s": int(n_docs_actual / t_dedup),
        "true_pairs": n_pairs,
        "vecs": n_vecs_actual,
        "ann_s": round(t_ann, 2),
        "vecs_per_s": int(n_vecs_actual / t_ann),
        "topk_rows": n_topk,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--vecs", type=int, default=40_000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .appName("dedup-scale-demo")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = run(spark, 5_000, 2_000)  # headline-corpus scale (sf0.1 shape)
    print("1x :", json.dumps(base))
    big = run(spark, args.docs, args.vecs)
    print(f"{args.docs // 5000}x:", json.dumps(big))
    print("straggler check (heaviest stages):")
    for s in task_straggler_stats(spark):
        print("  ", json.dumps(s))
    ratio = (big["docs"] / big["dedup_s"]) / (base["docs"] / base["dedup_s"])
    print(f"dedup throughput at scale vs 1x: {ratio:.2f}x  (uniform keys => >= ~1)")
    spark.stop()


if __name__ == "__main__":
    main()
