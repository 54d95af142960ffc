"""Training-data pipeline query catalog: dedup / similarity / text analysis.

Runs over the driver's own ``documents`` and ``embeddings`` parquet tables
(pre-registered as DuckDB views for the oracle side).  Every oracle is an
independent SQL re-implementation of the same deterministic algorithm —
shared only through the cross-engine hash convention in
``geowave_spark/functions/text.py`` (md5-prefix bigint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geowave_spark.functions.text import (
    LANG_MARKERS,
    MOD,
    STOPWORDS,
    doc_fingerprint,
    doc_fingerprint_sql,
    lang_id,
    md5_long_sql,
    tokens,
    word_ngrams_sql,
)
from geowave_spark.operators.dedup import (
    _A,
    _B,
    BANDS,
    NUM_PERM,
    ROWS_PER_BAND,
    SHINGLE_N,
    SIMHASH_BITS,
    dup_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_dup_groups,
)
from geowave_spark.operators.similarity import SIGN_BITS, cosine_topk, lsh_bucketed_topk

JACCARD_THRESHOLD = 0.3
ANN_K = 10
ANN_QUERY_MOD = 25  # queries = vec_id % 25 == 0


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --- Spark side -------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_docs(spark, sf_dir))


def q_dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_signatures(_docs(spark, sf_dir))
    return sig.select(
        F.col("sid").alias("doc_id"),
        *[F.col(f"m{i}") for i in range(NUM_PERM)],
        *[F.col(f"band{b}") for b in range(BANDS)],
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(_docs(spark, sf_dir), threshold=JACCARD_THRESHOLD)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=JACCARD_THRESHOLD)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_dup_groups(_docs(spark, sf_dir))


SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}
SAMPLE_FRACTION = 0.2
SAMPLE_PER_STRATUM = {"en": 0.5}


def q_train_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test hash-split + per-language stratified
    sample, reported as per-(split, lang) stats: the reproducible-split
    contract every training pipeline needs (a pure function of doc_id —
    re-runs, engine swaps, and later ingests never move a document)."""
    from geowave_spark.operators.sampling import hash_split, stratified_sample

    docs = _docs(spark, sf_dir)
    base = hash_split(docs, SPLIT_WEIGHTS).select(
        "doc_id",
        "split",
        lang_id(tokens(F.col("text"))).alias("pred_lang"),
        F.size(tokens(F.col("text"))).alias("n_toks"),
    )
    full = base.groupBy("split", "pred_lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_toks").alias("sum_tokens")
    )
    samp = (
        stratified_sample(
            base,
            SAMPLE_FRACTION,
            strata_col="pred_lang",
            per_stratum=SAMPLE_PER_STRATUM,
        )
        .groupBy("split", "pred_lang")
        .agg(F.count("*").alias("n_sampled"))
    )
    return (
        full.join(samp, ["split", "pred_lang"], "left")
        .select(
            "split",
            "pred_lang",
            "n_docs",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            "sum_tokens",
        )
    )


MIN_SHARED_SHINGLES = 3
PACK_BUDGET = 256
PACK_SHARDS = 8


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk packing manifest at PACK_BUDGET tokens/chunk: the
    per-document chunk spans a pretraining loader needs (docs straddle
    chunk boundaries; ordering is deterministic hash-shard + doc id)."""
    from geowave_spark.operators.packing import pack_chunk_spans

    return pack_chunk_spans(_docs(spark, sf_dir), PACK_BUDGET, PACK_SHARDS)


def q_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage audit composed from the split + shingle operators: for
    every train-split document sharing >= MIN_SHARED_SHINGLES distinct
    3-gram shingles with some test-split document, report how many test
    docs it hits and the worst overlap."""
    from geowave_spark.operators.dedup import contamination_pairs
    from geowave_spark.operators.sampling import hash_split

    docs = hash_split(_docs(spark, sf_dir), SPLIT_WEIGHTS)
    train = docs.filter(F.col("split") == "train")
    test = docs.filter(F.col("split") == "test")
    return (
        contamination_pairs(train, test, min_shared=MIN_SHARED_SHINGLES)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_test_hits"),
            F.max("n_shared").alias("max_shared"),
        )
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters over the whole corpus: large-star /
    small-star connected components on the MinHash pair graph; the oracle
    re-derives the same labels with a recursive CTE (min reachable id)."""
    return dup_clusters(_docs(spark, sf_dir), threshold=JACCARD_THRESHOLD)


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("n_stopwords"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").alias("n_chars_actual"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", doc_fingerprint(tokens(F.col("text"))).alias("fingerprint"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", lang_id(tokens(F.col("text"))).alias("pred_lang"))


def _ann_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _embs(spark, sf_dir)
        .filter(F.col("vec_id") % ANN_QUERY_MOD == 0)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(_embs(spark, sf_dir), _ann_queries(spark, sf_dir), k=ANN_K)


# near-dup threshold: corpus-dependent; the synthetic embeddings are
# near-orthogonal (max pairwise cosine ~0.51 at sf0.01), so the exact query
# pins the tail above 0.44.  Real near-dup corpora run the LSH variant at
# >= 0.95 (see operators/similarity.py recall math).
EMB_DUP_THRESHOLD = 0.44

# BPE-ish subword tokenization regex: letter runs, digit runs, single
# non-alphanumeric marks — the pre-tokenizer split every byte-pair encoder
# applies before merges.  Pattern deliberately uses only constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB).
SUBWORD_RX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact twin; the LSH-bucketed variant
    is the 100 TB path, pytest-verified against this one on corpora that
    actually contain near-dups)."""
    from geowave_spark.operators.similarity import embedding_dup_pairs_exact

    return embedding_dup_pairs_exact(_embs(spark, sf_dir), EMB_DUP_THRESHOLD)


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways (brief §text-analysis): whitespace tokens +
    BPE-ish regex subword count + chars, all JVM-side."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(SUBWORD_RX)).alias("n_subwords"),
        F.length("text").alias("n_chars"),
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_bucketed_topk(_embs(spark, sf_dir), _ann_queries(spark, sf_dir), k=ANN_K)


# probe-all: every query searches every inverted list, so the IVF result is
# definitionally the exact top-k — the brute-force SQL is a true oracle of
# the IVF *mechanics* (list assignment, probe explode, equi-join, window
# top-k) that holds for ANY trained quantizer.  The pruned-nprobe regime
# (recall < 1 by design) is pinned separately in
# tests/test_text_pipeline.py::test_ivf_topk_recall (>= 0.9 at nprobe 4/16).
ANN_IVF_LISTS = 16


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (scale path for general-regime top-k) in its probe-all
    configuration — see ANN_IVF_LISTS comment for why the exact-top-k SQL
    is a valid oracle regardless of the k-means quantizer."""
    from geowave_spark.operators.similarity import ivf_topk

    return ivf_topk(
        _embs(spark, sf_dir),
        _ann_queries(spark, sf_dir),
        k=ANN_K,
        n_centroids=ANN_IVF_LISTS,
        nprobe=ANN_IVF_LISTS,
    )


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (the RAM-resident 100 TB path: PQ codes shrink the probed
    candidate payload ~32x) in its probe-all + rerank-all configuration —
    exact-rerank of every probed candidate makes the output the exact top-k
    for ANY trained codebook, so the brute-force SQL is a true oracle of
    the IVF mechanics (assign, probe explode, equi-join, window top-k).
    In rerank-all mode Catalyst prunes the unused PQ columns, so the
    encode/ADC plumbing is NOT on this oracle's path — it is pinned
    separately in tests/test_ann_recall.py (ADC fidelity mae, pruned-regime
    recall, pre-encoded round-trip)."""
    from geowave_spark.operators.similarity import ivfpq_topk

    return ivfpq_topk(
        _embs(spark, sf_dir),
        _ann_queries(spark, sf_dir),
        k=ANN_K,
        n_centroids=ANN_IVF_LISTS,
        nprobe=ANN_IVF_LISTS,
        m=8,
        n_codes=64,
        rerank=None,
    )


MIN_TOKENS = 5


def q_training_data_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data selection pipeline composed from the
    individual operators: keep documents that are (1) detected English,
    (2) above the token floor, (3) the canonical representative of their
    exact-duplicate group, and (4) not the dropped side of any MinHash
    near-duplicate pair.  Every stage is the already-oracle-checked
    operator; the composition itself is what this query verifies."""
    docs = _docs(spark, sf_dir)
    toks = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        lang_id(toks).alias("pred_lang"),
        F.size(toks).alias("n_tokens"),
    ).filter((F.col("pred_lang") == "en") & (F.col("n_tokens") >= MIN_TOKENS))
    reps = exact_dedup(docs).select(F.col("rep_id").alias("doc_id"))
    near_dropped = (
        minhash_lsh_pairs(docs, threshold=JACCARD_THRESHOLD)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    return (
        scored.join(reps, "doc_id", "left_semi")
        .join(near_dropped, "doc_id", "left_anti")
        .select("doc_id", "pred_lang", "n_tokens")
    )


BLOCK_TOKENS = 16
BLOCK_MAX_DOCS = 1
LM_TOP_K = 1000
BPE_TOP_N = 50
MIX_C = 4.0


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition quality signals (single corpus
    scan, sentinel-row explode keeps short docs in the output)."""
    from geowave_spark.operators.textclean import repetition_signals

    return repetition_signals(_docs(spark, sf_dir))


def q_boilerplate_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style boilerplate removal on fixed 16-token blocks: blocks
    appearing in >= 2 distinct docs are banned corpus-wide (broadcast
    anti-join), texts reassembled in order."""
    from geowave_spark.operators.textclean import block_dedup

    return block_dedup(_docs(spark, sf_dir), BLOCK_TOKENS, BLOCK_MAX_DOCS)


def q_lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality gate: add-one-smoothed bigram LM trained on the
    hash-split train slice (top-K capped, vocabulary-sized tables), every
    document scored via broadcast joins — micro-nat-quantized integer sums
    keep the oracle hash-exact."""
    from geowave_spark.operators.lm_score import lm_quality_score
    from geowave_spark.operators.sampling import hash_split

    docs = _docs(spark, sf_dir)
    train = hash_split(docs, SPLIT_WEIGHTS).filter(F.col("split") == "train").drop("split")
    return lm_quality_score(docs, train, LM_TOP_K)


SUBSTR_K = 12
SUBSTR_MIN_COUNT = 2


def q_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring audit (operators/textclean.py, Lee et
    al. ACL 2022): sliding 12-token windows occurring >= 2 times corpus-
    wide, merged to maximal per-document spans — the alignment-free
    companion to boilerplate_block_dedup."""
    from geowave_spark.operators.textclean import substring_dup_spans

    return substring_dup_spans(
        _docs(spark, sf_dir), k=SUBSTR_K, min_count=SUBSTR_MIN_COUNT
    )


DSIR_K = 120  # a strict subset of the sf0.01 corpus (500 docs), so the
# Gumbel top-k boundary is genuinely exercised
DSIR_BUCKETS = 4096
DSIR_TARGET = "source = 'src0'"


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/dsir.py): hashed unigram+bigram
    bucket models for target (source = 'src0') vs the whole corpus,
    micro-nat-quantized log-ratio importance per document, deterministic
    Gumbel top-k resample."""
    from geowave_spark.operators.dsir import dsir_resample

    docs = _docs(spark, sf_dir)
    return dsir_resample(
        docs, docs.filter(F.expr(DSIR_TARGET)), DSIR_K, DSIR_BUCKETS
    )


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE trainer inner loop: word-type-weighted adjacent
    character-pair counts, ranked by the greedy merge order."""
    from geowave_spark.operators.bpe import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf_dir), BPE_TOP_N)


def _plant_pii(doc_id: F.Column, text: F.Column) -> F.Column:
    """Deterministic PII planting: the corpus is synthetic word soup with no
    real PII, so the query seeds one finding per doc_id%5 class — the same
    concat both engines compute, per the round brief's synthesise-at-small-
    scale rule.  The operator itself never sees the planting logic."""
    m = (doc_id % 5).cast("int")
    return F.concat(
        text,
        F.when(m == 0, F.concat(F.lit(" contact user"), doc_id.cast("string"), F.lit("@example.com")))
        .when(m == 1, F.concat(F.lit(" call 555-"), F.lpad((doc_id % 1000).cast("string"), 3, "0"), F.lit("-4567")))
        .when(m == 2, F.concat(F.lit(" from 10.0."), (doc_id % 256).cast("string"), F.lit(".17")))
        .when(m == 3, F.concat(F.lit(" ssn 123-45-"), F.lpad((doc_id % 10000).cast("string"), 4, "0")))
        .otherwise(F.lit("")),
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the (PII-planted) documents: per-rule substitution
    counts + the md5 of the redacted text (the value contract — emitting
    megabytes of redacted text through the compare would test nothing
    more)."""
    from geowave_spark.operators.pii import pii_redact

    docs = _docs(spark, sf_dir).select(
        "doc_id", _plant_pii(F.col("doc_id"), F.col("text")).alias("text")
    )
    out = pii_redact(docs, "text")
    return out.select(
        "doc_id",
        "n_email",
        "n_ssn",
        "n_phone",
        "n_ipv4",
        F.md5("text_redacted").alias("redacted_md5"),
    )


def _pii_redact_sql() -> str:
    from geowave_spark.operators.pii import pii_rules_sql

    plant = """text || CASE CAST(doc_id % 5 AS INT)
          WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
          WHEN 1 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-4567'
          WHEN 2 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17'
          WHEN 3 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
          ELSE '' END"""
    counts, redacted = pii_rules_sql("t")
    return f"""
        WITH p AS (SELECT doc_id, {plant} AS t FROM documents)
        SELECT doc_id, {', '.join(counts)}, md5({redacted}) AS redacted_md5
        FROM p
    """


# SemDeDup knobs: k coarse clusters over the 64-dim embeddings; the prune
# threshold sits under the corpus's max pairwise cosine (~0.51 at sf0.01,
# near-orthogonal synthetic vectors) so the within-cluster sweep genuinely
# drops rows.  Real corpora run >= 0.95 like the LSH dedup.
SEMDEDUP_K = 8
SEMDEDUP_THRESHOLD = 0.38


def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (cluster-then-prune semantic dedup): every vector labeled
    with its coarse cluster and whether the upper-triangular within-cluster
    cosine sweep keeps it."""
    from geowave_spark.operators.similarity import semdedup

    return semdedup(
        _embs(spark, sf_dir), k=SEMDEDUP_K, threshold=SEMDEDUP_THRESHOLD
    )


def q_domain_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-sqrt domain-mixture rebalancing over the ``lang`` column:
    per-domain report (size, keep rate, deterministic kept count).  The kept
    set comes from the real operator (count -> broadcast rate -> md5 draw);
    the report recomputes the rate from the same exact expression so domains
    whose sample is empty still appear."""
    from geowave_spark.operators.sampling import domain_mixture_sample

    docs = _docs(spark, sf_dir)
    kept = domain_mixture_sample(docs, "lang", MIX_C)
    ks = kept.groupBy("lang").agg(F.count("*").cast("long").alias("n_sampled"))
    base = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))
    return base.join(ks, "lang", "left").select(
        F.col("lang").alias("domain"),
        "n_docs",
        F.least(F.lit(1.0), F.lit(MIX_C) / F.sqrt(F.col("n_docs").cast("double"))).alias("rate"),
        F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
    )


# --- oracle SQL -------------------------------------------------------------

_TOKS = "string_split(text, ' ')"
_SHINGLES = f"list_distinct({word_ngrams_sql(_TOKS, SHINGLE_N)})"


def _shingle_cte() -> str:
    h = md5_long_sql("shingle")
    return f"""
        sh AS (
          SELECT doc_id AS sid, {h} % {MOD} AS shv
          FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents))
    """


def _minhash_cte() -> str:
    mins = ",\n".join(
        f"COALESCE(MIN(({_A[i]} * shv + {_B[i]}) % {MOD}), {MOD}) AS m{i}"
        for i in range(NUM_PERM)
    )
    return f"""
        {_shingle_cte()},
        mins AS (
          SELECT d.doc_id AS sid, {mins}
          FROM documents d LEFT JOIN sh ON sh.sid = d.doc_id
          GROUP BY d.doc_id)
    """


def _band_exprs() -> list[str]:
    out = []
    for b in range(BANDS):
        parts = ", ".join(
            f"CAST(m{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        )
        out.append(md5_long_sql(f"concat_ws('_', {parts})") + f" AS band{b}")
    return out


def _train_split_sql(pred: str) -> str:
    """Oracle for q_train_split_stratified: the same md5-draw arithmetic
    (hash_split_sql / unit_hash_sql are the operators' own SQL twins, so the
    oracle independence lives in the aggregation + the DuckDB hash engine)."""
    from geowave_spark.operators.sampling import hash_split_sql, unit_hash_sql

    split = hash_split_sql(SPLIT_WEIGHTS, "doc_id")
    draw = unit_hash_sql("doc_id", "sample-v1")
    rate = f"CASE WHEN pred_lang = 'en' THEN {SAMPLE_PER_STRATUM['en']!r} ELSE {SAMPLE_FRACTION!r} END"
    return f"""
        WITH base AS (
          SELECT doc_id, {split} AS split, {pred} AS pred_lang,
                 len({_TOKS}) AS n_toks, {draw} AS draw
          FROM documents)
        SELECT split, pred_lang,
               COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN draw < {rate} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
               CAST(SUM(n_toks) AS BIGINT) AS sum_tokens
        FROM base GROUP BY split, pred_lang
    """


def _sequence_packing_sql() -> str:
    b, n = PACK_BUDGET, PACK_SHARDS
    h = md5_long_sql("CAST(doc_id AS VARCHAR)")
    return f"""
        WITH base AS (
          SELECT doc_id, {h} % {n} AS shard,
                 CAST(len({_TOKS}) AS BIGINT) AS n_toks
          FROM documents),
        pos AS (
          SELECT doc_id, shard, n_toks,
                 CAST(SUM(n_toks) OVER (PARTITION BY shard ORDER BY doc_id)
                      - n_toks AS BIGINT) AS off
          FROM base WHERE n_toks > 0)
        SELECT doc_id, shard, chunk_id,
               CAST(GREATEST(0, chunk_id * {b} - off) AS BIGINT) AS tok_start,
               CAST(LEAST(n_toks, (chunk_id + 1) * {b} - off) AS BIGINT) AS tok_end
        FROM pos, UNNEST(range(off // {b}, (off + n_toks - 1) // {b} + 1)) AS t(chunk_id)
    """


def _split_contamination_sql() -> str:
    from geowave_spark.operators.sampling import hash_split_sql

    split = hash_split_sql(SPLIT_WEIGHTS, "doc_id")
    return f"""
        WITH {_shingle_cte()},
        split AS (SELECT doc_id, {split} AS split FROM documents),
        pairs AS (
          SELECT a.sid AS doc_id, b.sid AS bench_id, count(*) AS n_shared
          FROM sh a
          JOIN split sa ON sa.doc_id = a.sid AND sa.split = 'train'
          JOIN sh b ON b.shv = a.shv
          JOIN split sb ON sb.doc_id = b.sid AND sb.split = 'test'
          GROUP BY a.sid, b.sid
          HAVING count(*) >= {MIN_SHARED_SHINGLES})
        SELECT doc_id, COUNT(*) AS n_test_hits, MAX(n_shared) AS max_shared
        FROM pairs GROUP BY doc_id
    """


def _repetition_signals_sql() -> str:
    bg2 = word_ngrams_sql("toks", 2)
    bg3 = word_ngrams_sql("toks", 3)
    frac = (
        lambda num, den: f"CASE WHEN {den} > 0 THEN CAST({num} AS DOUBLE) / "
        f"CAST({den} AS DOUBLE) ELSE CAST(0 AS DOUBLE) END"
    )
    return f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        bg AS (SELECT doc_id, g, count(*) AS c
               FROM (SELECT doc_id, unnest({bg2}) AS g FROM t) GROUP BY doc_id, g),
        b2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                      CAST(max(c) AS BIGINT) AS top_bigram_n,
                      CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_bigram_n
               FROM bg GROUP BY doc_id),
        tg AS (SELECT doc_id, g, count(*) AS c
               FROM (SELECT doc_id, unnest({bg3}) AS g FROM t) GROUP BY doc_id, g),
        b3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
                      CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_trigram_n
               FROM tg GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
               COALESCE(b2.n_bigrams, 0) AS n_bigrams,
               COALESCE(b2.top_bigram_n, 0) AS top_bigram_n,
               COALESCE(b2.dup_bigram_n, 0) AS dup_bigram_n,
               COALESCE(b3.n_trigrams, 0) AS n_trigrams,
               COALESCE(b3.dup_trigram_n, 0) AS dup_trigram_n,
               CASE WHEN len(toks) > 0 THEN CAST(1.0 AS DOUBLE)
                    - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                    ELSE CAST(0 AS DOUBLE) END AS dup_token_frac,
               {frac("COALESCE(b2.top_bigram_n, 0)", "COALESCE(b2.n_bigrams, 0)")} AS top_bigram_frac,
               {frac("COALESCE(b3.dup_trigram_n, 0)", "COALESCE(b3.n_trigrams, 0)")} AS dup_trigram_frac
        FROM t LEFT JOIN b2 USING (doc_id) LEFT JOIN b3 USING (doc_id)
    """


def _block_dedup_sql() -> str:
    B = BLOCK_TOKENS
    bh = md5_long_sql("blk")
    return f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        nb AS (SELECT doc_id, toks, CAST((len(toks) + {B - 1}) // {B} AS INT) AS n_blocks FROM t),
        hashed AS (
          SELECT doc_id, i, blk, {bh} AS bh
          FROM (SELECT doc_id, i,
                       array_to_string(toks[i * {B} + 1 : i * {B} + {B}], ' ') AS blk
                FROM nb, UNNEST(range(0, n_blocks)) AS u(i))),
        banned AS (
          SELECT bh FROM (SELECT bh, count(DISTINCT doc_id) AS df FROM hashed GROUP BY bh)
          WHERE df > {BLOCK_MAX_DOCS}),
        kept AS (
          SELECT doc_id, CAST(count(*) AS INT) AS n_blocks_kept,
                 string_agg(blk, ' ' ORDER BY i) AS clean_text
          FROM hashed WHERE bh NOT IN (SELECT bh FROM banned) GROUP BY doc_id)
        SELECT nb.doc_id, nb.n_blocks,
               COALESCE(k.n_blocks_kept, 0) AS n_blocks_kept,
               COALESCE(k.clean_text, '') AS clean_text
        FROM nb LEFT JOIN kept k USING (doc_id)
    """


def _lm_quality_score_sql() -> str:
    from geowave_spark.operators.lm_score import _Q
    from geowave_spark.operators.sampling import hash_split_sql

    split = hash_split_sql(SPLIT_WEIGHTS, "doc_id")
    return f"""
        WITH train AS (
          SELECT {_TOKS} AS toks FROM documents WHERE ({split}) = 'train'),
        trainpairs AS (
          SELECT toks[CAST(i AS INT) + 1] AS w1, toks[CAST(i AS INT) + 2] AS w2
          FROM train, UNNEST(range(0, len(toks) - 1)) AS u(i)),
        c2 AS (SELECT w1, w2, count(*) AS c FROM trainpairs GROUP BY w1, w2),
        lm AS (SELECT w1, w2, c FROM (
                 SELECT *, row_number() OVER (ORDER BY c DESC, w1, w2) AS rk FROM c2)
               WHERE rk <= {LM_TOP_K}),
        ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
        v AS (SELECT count(DISTINCT tok) AS nv
              FROM (SELECT unnest(toks) AS tok FROM train)),
        docpairs AS (
          SELECT doc_id, toks[CAST(i AS INT) + 1] AS w1, toks[CAST(i AS INT) + 2] AS w2
          FROM (SELECT doc_id, {_TOKS} AS toks FROM documents),
               UNNEST(range(0, len(toks) - 1)) AS u(i)),
        scored AS (
          SELECT d.doc_id,
                 CAST(floor(ln((COALESCE(lm.c, 0) + 1)
                               / (COALESCE(ctx.c1, 0) + (SELECT nv FROM v)))
                            * {_Q}) AS BIGINT) AS lpq
          FROM docpairs d
          LEFT JOIN lm ON lm.w1 = d.w1 AND lm.w2 = d.w2
          LEFT JOIN ctx ON ctx.w1 = d.w1),
        agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nb,
                       CAST(sum(lpq) AS BIGINT) AS s
                FROM scored GROUP BY doc_id)
        SELECT doc.doc_id,
               COALESCE(agg.nb, 0) AS n_bigrams,
               COALESCE(agg.s, 0) AS sum_logp_q6,
               CASE WHEN COALESCE(agg.nb, 0) > 0
                    THEN (CAST(agg.s AS DOUBLE) / {float(_Q)!r}) / agg.nb
                    ELSE CAST(0 AS DOUBLE) END AS avg_logp
        FROM documents doc LEFT JOIN agg ON agg.doc_id = doc.doc_id
    """


def _dsir_sql() -> str:
    from geowave_spark.operators.dsir import dsir_sql

    return dsir_sql("documents", DSIR_TARGET, DSIR_K, DSIR_BUCKETS)


def _substring_dup_sql() -> str:
    from geowave_spark.operators.textclean import substring_dup_spans_sql

    return substring_dup_spans_sql("documents", SUBSTR_K, SUBSTR_MIN_COUNT)


def _bpe_pair_counts_sql() -> str:
    return f"""
        WITH w AS (SELECT word, count(*) AS wf
                   FROM (SELECT unnest({_TOKS}) AS word FROM documents) GROUP BY word),
        p AS (SELECT substr(word, CAST(i AS INT), 2) AS pair, wf
              FROM w, UNNEST(range(1, length(word))) AS u(i)),
        c AS (SELECT pair, CAST(sum(wf) AS BIGINT) AS n FROM p GROUP BY pair),
        r AS (SELECT pair, n,
                     CAST(row_number() OVER (ORDER BY n DESC, pair) AS INT) AS rank
              FROM c)
        SELECT pair, n, rank FROM r WHERE rank <= {BPE_TOP_N}
    """


def _domain_mixture_sql() -> str:
    from geowave_spark.operators.sampling import unit_hash_sql

    draw = unit_hash_sql("doc_id", "mixture-v1")
    rate = f"LEAST(CAST(1.0 AS DOUBLE), CAST({MIX_C!r} AS DOUBLE) / sqrt(CAST(n_docs AS DOUBLE)))"
    return f"""
        WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
                     FROM documents GROUP BY lang),
        r AS (SELECT lang, n_docs, {rate} AS rate FROM cnt),
        k AS (SELECT d.lang, count(*) AS n_sampled
              FROM documents d JOIN r USING (lang)
              WHERE {draw} < r.rate GROUP BY d.lang)
        SELECT r.lang AS domain, r.n_docs, r.rate,
               CAST(COALESCE(k.n_sampled, 0) AS BIGINT) AS n_sampled
        FROM r LEFT JOIN k USING (lang)
    """


def _cos_sql(lx: str, rx: str) -> str:
    """DuckDB cosine between two 64-dim FLOAT[] column refs, same fold order
    as ``operators.similarity._dot``: sequential double accumulation."""

    def dot(a: str, b: str) -> str:
        return (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(range(1, 65), i -> "
            f"CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
            "(acc, v) -> acc + v)"
        )

    return f"{dot(lx, rx)} / sqrt({dot(lx, lx)} * {dot(rx, rx)})"


def _semdedup_sql() -> str:
    """Independent SemDeDup: same deterministic centroid draw (k smallest
    md5-hashed ids, raw vectors), argmax-cosine assignment, upper-triangular
    within-cluster prune — as one CTE chain."""
    h = md5_long_sql("CAST(vec_id AS VARCHAR)")
    return f"""
        WITH cent AS (
          SELECT ROW_NUMBER() OVER (ORDER BY h) - 1 AS cl, embedding AS cvec
          FROM (SELECT {h} AS h, embedding FROM embeddings ORDER BY 1
                LIMIT {SEMDEDUP_K})),
        asg AS (
          SELECT vec_id, embedding, cl FROM (
            SELECT e.vec_id, e.embedding, c.cl,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                     ORDER BY {_cos_sql('e.embedding', 'c.cvec')} DESC, c.cl
                   ) AS rn
            FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
        dropped AS (
          SELECT DISTINCT b.vec_id
          FROM asg a JOIN asg b ON a.cl = b.cl AND a.vec_id < b.vec_id
          WHERE {_cos_sql('a.embedding', 'b.embedding')} >= {SEMDEDUP_THRESHOLD})
        SELECT a.vec_id, CAST(a.cl AS INT) AS cluster,
               d.vec_id IS NULL AS is_kept
        FROM asg a LEFT JOIN dropped d USING (vec_id)
    """


def build_text_oracles() -> dict[str, str]:
    mins_cols = ", ".join(f"m{i}" for i in range(NUM_PERM))
    bands = ", ".join(_band_exprs())
    band_rows = " UNION ALL ".join(
        f"SELECT sid, {b} AS band, band{b} AS bh FROM sig" for b in range(BANDS)
    )
    jaccard_tail = f"""
        sizes AS (SELECT sid, count(*) AS n_sh FROM sh GROUP BY sid),
        inter AS (
          SELECT c.id_a, c.id_b, count(*) AS n_int
          FROM cands c
          JOIN sh a ON a.sid = c.id_a
          JOIN sh b ON b.sid = c.id_b AND b.shv = a.shv
          GROUP BY c.id_a, c.id_b)
        SELECT i.id_a, i.id_b,
               CAST(i.n_int AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.n_int AS DOUBLE) AS jaccard
        FROM inter i
        JOIN sizes sa ON sa.sid = i.id_a
        JOIN sizes sb ON sb.sid = i.id_b
        WHERE CAST(i.n_int AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - i.n_int AS DOUBLE)
              >= {JACCARD_THRESHOLD}
    """

    th = md5_long_sql("tok")
    lang_score = {
        lang: (
            "len(list_filter("
            + _TOKS
            + ", t -> list_contains(["
            + ", ".join(f"'{m}'" for m in markers)
            + "], t)))"
        )
        for lang, markers in LANG_MARKERS.items()
    }
    langs = sorted(LANG_MARKERS)
    # same strictly-greater argmax fold as functions.text.lang_id
    pred = f"'{langs[0]}'"
    best = lang_score[langs[0]]
    for lang in langs[1:]:
        pred = f"CASE WHEN {lang_score[lang]} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"GREATEST({best}, {lang_score[lang]})"

    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(range(1, 65), i -> "
        "CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))), "
        "(acc, v) -> acc + v)"
    )
    nsq = (
        lambda side: "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, 65), i -> "
        f"CAST({side}.embedding[i] AS DOUBLE) * CAST({side}.embedding[i] AS DOUBLE))), "
        "(acc, v) -> acc + v)"
    )
    cos = f"{dot} / sqrt({nsq('e')} * {nsq('q')})"
    bucket = lambda side: " + ".join(
        f"(CASE WHEN {side}.embedding[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(SIGN_BITS)
    )
    probe_masks = "[0" + "".join(f", {1 << j}" for j in range(SIGN_BITS)) + "]"

    stopword_list = ", ".join(f"'{w}'" for w in STOPWORDS)

    lsh_sql = f"""
            WITH {_minhash_cte()},
            sig AS (SELECT sid, {mins_cols}, {bands} FROM mins),
            bandrows AS ({band_rows}),
            cands AS (
              SELECT DISTINCT a.sid AS id_a, b.sid AS id_b
              FROM bandrows a JOIN bandrows b
                ON a.band = b.band AND a.bh = b.bh AND a.sid < b.sid),
            {jaccard_tail}
        """

    return {
        "dedup_exact": """
            SELECT md5(text) AS text_md5, MIN(doc_id) AS rep_id,
                   count(*) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "dedup_minhash_signatures": f"""
            WITH {_minhash_cte()},
            sig AS (SELECT sid, {mins_cols} FROM mins)
            SELECT sid AS doc_id, {mins_cols}, {bands} FROM sig
        """,
        "train_split_stratified": _train_split_sql(pred),
        "split_contamination": _split_contamination_sql(),
        "sequence_packing": _sequence_packing_sql(),
        "dedup_minhash_lsh": lsh_sql,
        # transitive closure of the SAME pair graph: recursive CTE floods
        # every reachable label, MIN picks the component id — the SQL
        # ground truth for the large-star/small-star operator
        "dedup_clusters": f"""
            WITH RECURSIVE
            pairs AS ({lsh_sql}),
            edges AS (
              SELECT id_a AS u, id_b AS v FROM pairs
              UNION
              SELECT id_b AS u, id_a AS v FROM pairs),
            reach(u, lbl) AS (
              SELECT u, u AS lbl FROM (SELECT DISTINCT u FROM edges)
              UNION
              SELECT e.u, r.lbl FROM edges e JOIN reach r ON r.u = e.v),
            labels AS (SELECT u AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY u),
            everydoc AS (
              SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
              FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id)
            SELECT doc_id, cluster_id,
                   COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
            FROM everydoc
        """,
        "training_data_filter": f"""
            WITH reps AS (
              SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep
              FROM documents),
            dropped AS (SELECT DISTINCT id_b FROM ({lsh_sql}) pairs)
            SELECT d.doc_id, {pred} AS pred_lang,
                   CAST(len({_TOKS}) AS INT) AS n_tokens
            FROM documents d
            JOIN reps r ON r.doc_id = d.doc_id AND r.doc_id = r.rep
            WHERE {pred} = 'en' AND len({_TOKS}) >= {MIN_TOKENS}
              AND d.doc_id NOT IN (SELECT id_b FROM dropped)
        """,
        "dedup_ngram_jaccard": f"""
            WITH {_shingle_cte()},
            cands AS (
              SELECT DISTINCT a.sid AS id_a, b.sid AS id_b
              FROM sh a JOIN sh b ON a.shv = b.shv AND a.sid < b.sid),
            {jaccard_tail}
        """,
        "dedup_simhash": f"""
            WITH toks AS (
              SELECT doc_id AS sid, {th} % {MOD} AS thv
              FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)),
            votes AS (
              SELECT sid, bit,
                     SUM(CASE WHEN (thv >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
              FROM toks, (SELECT unnest(range(0, {SIMHASH_BITS})) AS bit)
              GROUP BY sid, bit),
            hashes AS (
              SELECT sid, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
              FROM votes GROUP BY sid)
            SELECT sid AS doc_id, simhash,
                   count(*) OVER (PARTITION BY simhash) AS n_bucket,
                   MIN(sid) OVER (PARTITION BY simhash) AS rep_id
            FROM hashes
        """,
        "text_quality": f"""
            SELECT doc_id,
                   CAST(len({_TOKS}) AS INT) AS n_tokens,
                   CAST(len(list_filter({_TOKS},
                        t -> list_contains([{stopword_list}], t))) AS INT) AS n_stopwords,
                   CAST(len(list_distinct({_TOKS})) AS INT) AS n_distinct,
                   CAST(length(text) AS INT) AS n_chars_actual
            FROM documents
        """,
        "doc_fingerprint": f"""
            SELECT doc_id, {doc_fingerprint_sql(_TOKS)} AS fingerprint
            FROM documents
        """,
        "lang_id": f"""
            SELECT doc_id, {pred} AS pred_lang FROM documents
        """,
        "ann_cosine_topk": f"""
            SELECT qid, vec_id, rank FROM (
              SELECT q.vec_id AS qid, e.vec_id AS vec_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {cos} DESC, e.vec_id) AS rank
              FROM embeddings e,
                   (SELECT * FROM embeddings WHERE vec_id % {ANN_QUERY_MOD} = 0) q
              WHERE e.vec_id <> q.vec_id)
            WHERE rank <= {ANN_K}
        """,
        # probe-all IVF == exact top-k (see q_ann_ivf_topk) — same SQL as
        # ann_cosine_topk on purpose: that equality IS the contract
        "ann_ivf_topk": f"""
            SELECT qid, vec_id, rank FROM (
              SELECT q.vec_id AS qid, e.vec_id AS vec_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {cos} DESC, e.vec_id) AS rank
              FROM embeddings e,
                   (SELECT * FROM embeddings WHERE vec_id % {ANN_QUERY_MOD} = 0) q
              WHERE e.vec_id <> q.vec_id)
            WHERE rank <= {ANN_K}
        """,
        # probe-all + rerank-all IVF-PQ == exact top-k (see q_ann_ivfpq_topk)
        # — same SQL as ann_cosine_topk on purpose: that equality IS the
        # contract
        "ann_ivfpq_topk": f"""
            SELECT qid, vec_id, rank FROM (
              SELECT q.vec_id AS qid, e.vec_id AS vec_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {cos} DESC, e.vec_id) AS rank
              FROM embeddings e,
                   (SELECT * FROM embeddings WHERE vec_id % {ANN_QUERY_MOD} = 0) q
              WHERE e.vec_id <> q.vec_id)
            WHERE rank <= {ANN_K}
        """,
        "ann_lsh_topk": f"""
            WITH c AS (SELECT *, {bucket('e')} AS bucket FROM embeddings e),
            qp AS (
              SELECT q.vec_id, q.embedding, xor(qb.bucket, f.flip) AS bucket
              FROM (SELECT e.*, {bucket('e')} AS bucket
                    FROM embeddings e WHERE e.vec_id % {ANN_QUERY_MOD} = 0) qb,
                   (SELECT unnest({probe_masks}) AS flip) f,
                   LATERAL (SELECT qb.vec_id AS vec_id, qb.embedding AS embedding) q)
            SELECT qid, vec_id, rank FROM (
              SELECT q.vec_id AS qid, e.vec_id AS vec_id,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {cos} DESC, e.vec_id) AS rank
              FROM c e JOIN qp q ON e.bucket = q.bucket
              WHERE e.vec_id <> q.vec_id)
            WHERE rank <= {ANN_K}
        """,
        "dedup_embedding_cosine": f"""
            SELECT e.vec_id AS id_a, q.vec_id AS id_b
            FROM embeddings e, embeddings q
            WHERE e.vec_id < q.vec_id AND {cos} >= {EMB_DUP_THRESHOLD}
        """,
        "token_stats": f"""
            SELECT doc_id,
                   CAST(len({_TOKS}) AS INT) AS n_tokens,
                   CAST(len(regexp_extract_all(text, '{SUBWORD_RX}')) AS INT) AS n_subwords,
                   CAST(length(text) AS INT) AS n_chars
            FROM documents
        """,
        "repetition_signals": _repetition_signals_sql(),
        "boilerplate_block_dedup": _block_dedup_sql(),
        "lm_quality_score": _lm_quality_score_sql(),
        "dsir_resample": _dsir_sql(),
        "substring_dup_spans": _substring_dup_sql(),
        "bpe_pair_counts": _bpe_pair_counts_sql(),
        "domain_mixture_sample": _domain_mixture_sql(),
        "semdedup_prune": _semdedup_sql(),
        "pii_redact": _pii_redact_sql(),
    }


TEXT_QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_signatures": q_dedup_minhash_signatures,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_simhash": q_dedup_simhash,
    "dedup_clusters": q_dedup_clusters,
    "train_split_stratified": q_train_split_stratified,
    "split_contamination": q_split_contamination,
    "sequence_packing": q_sequence_packing,
    "text_quality": q_text_quality,
    "doc_fingerprint": q_doc_fingerprint,
    "lang_id": q_lang_id,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "training_data_filter": q_training_data_filter,
    "token_stats": q_token_stats,
    "repetition_signals": q_repetition_signals,
    "boilerplate_block_dedup": q_boilerplate_block_dedup,
    "lm_quality_score": q_lm_quality_score,
    "dsir_resample": q_dsir_resample,
    "substring_dup_spans": q_substring_dup_spans,
    "bpe_pair_counts": q_bpe_pair_counts,
    "domain_mixture_sample": q_domain_mixture_sample,
    "semdedup_prune": q_semdedup_prune,
    "pii_redact": q_pii_redact,
}
