"""BM25 full-text retrieval over the document corpus.

The reference's only text surface is the secondary text index
(`core/store/.../index/text/TextIndexStrategy.java` — n-gram key
decomposition for LIKE-style scans); ranked retrieval is the operation a
training-data / analytics user actually wants on a 10^12-doc corpus
(inspect-by-query, contamination triage, targeted sampling).  BM25
(Robertson & Spärck Jones's Okapi weighting) is implemented here
Spark-first:

1. one corpus scan explodes tokens and filters to the |Q| query terms
   IMMEDIATELY (map-side, before any shuffle — the exploded stream that
   reaches the (doc, term) aggregation is bounded by occurrences of query
   terms, not corpus size);
2. document frequencies per term aggregate to |Q| rows, joined back by
   broadcast;
3. corpus stats (N, total token count) come from one tiny agg — at scale
   these are maintained index statistics; recomputing them is one
   column-pruned pass and keeps the operator self-contained;
4. per-(doc, term) contributions are INTEGER-quantized (micro units,
   the IDW/DSIR discipline) so the cross-doc sum is order-independent and
   engine-exact, then one TakeOrdered top-k (score desc, doc_id asc) —
   no global sort materializes.

Integer scheme: with k1 = 1.2 = 6/5 and b = 0.75 = 3/4,

    tf_term = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
            = 22*tf*1e6 / (10e6*tf + 3e6 + 9*rel)          (exact)

where rel = floor(dl * N * 1e6 / sum_dl) is dl/avgdl in micro units —
computed in DECIMAL(38,0)/HUGEINT because the intermediate dl*N*1e6
exceeds int64 once dl*N > ~9.2e12 (any real corpus at the claimed
scale); the quotient itself fits a long for any dl within 9e12x the
average.  idf_micro = floor(ln(1 + (N - df + 0.5)/(df + 0.5)) * 1e6) —
always positive (the BM25+ form).  contrib = (idf_micro * 22 * tf * 1e6)
DIV den with tf saturated at 10^4 (the tf term is within 0.3% of its
k1+1 asymptote long before that; the cap keeps contrib's widest product
under 2^63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions.text import tokens

__all__ = ["bm25_topk", "bm25_topk_sql", "tfidf_top_terms", "tfidf_top_terms_sql"]

_TF_CAP = 10_000
_M = 1_000_000


def bm25_topk(docs: DataFrame, terms: list[str], k: int = 10) -> DataFrame:
    """Top-``k`` docs by BM25 (k1=1.2, b=0.75) for the literal query
    ``terms``.  Returns (doc_id, n_terms_hit, score_micro) ordered by
    (score_micro desc, doc_id asc)."""
    if not terms or len(set(terms)) != len(terms):
        raise ValueError("terms must be a non-empty list of distinct terms")
    if k <= 0:
        raise ValueError("k must be positive")

    toks = docs.select(F.col("doc_id"), tokens(F.col("text")).alias("toks"))
    # corpus stats: one column-pruned pass (at scale these are maintained
    # index statistics; recomputing keeps the operator self-contained)
    stats = toks.select(F.size("toks").alias("dl")).agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    # dl rides through the explode so no doc-length join is needed later;
    # the term filter runs map-side BEFORE the (doc, term) shuffle
    hits = (
        toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .where(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "term", "dl")
        .agg(F.least(F.count("*"), F.lit(_TF_CAP)).alias("tf"))
    )
    df_by_term = hits.groupBy("term").agg(F.count("*").alias("df"))

    n = F.col("n_docs").cast("double")
    dfreq = F.col("df").cast("double")
    scored = (
        hits.join(F.broadcast(df_by_term), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_micro",
            F.floor(
                F.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0) * _M
            ).cast("long"),
        )
        .withColumn(
            # decimal intermediate: dl * n_docs * 1e6 overflows int64 at
            # real corpus scale; the quotient is long-sized
            "rel",
            F.expr(
                f"CAST(CAST(dl AS DECIMAL(38,0)) * n_docs * {_M}"
                f" DIV sum_dl AS BIGINT)"
            ),
        )
        .withColumn(
            "contrib",
            F.expr(
                f"idf_micro * 22L * tf * {_M}L"
                f" DIV (10L * {_M} * tf + 3L * {_M} + 9L * rel)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum("contrib").alias("score_micro"),
        )
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(int(k))
    )


def bm25_topk_sql(docs_table: str, terms: list[str], k: int = 10) -> str:
    """DuckDB twin: GATHER formulation — per-doc ``list_filter`` counts
    over the token list (no explode/groupBy), df via ``list_contains``
    counts, same integer quantization, same (score, doc_id) order.
    ``docs_table`` is a table/view name or a quoted parquet path."""
    tlist = ", ".join(f"({t!r})" for t in terms)
    return f"""
        WITH docs AS (
          SELECT doc_id, string_split(text, ' ') AS toks,
                 len(string_split(text, ' ')) AS dl
          FROM {docs_table}),
        stats AS (
          SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM docs),
        hits AS (
          SELECT d.doc_id, q.term, d.dl,
                 LEAST(len(list_filter(d.toks, t -> t = q.term)),
                       {_TF_CAP}) AS tf
          FROM docs d, (VALUES {tlist}) q(term)
          WHERE list_contains(d.toks, q.term)),
        dfs AS (
          SELECT term, COUNT(*) AS df FROM hits GROUP BY term),
        scored AS (
          SELECT h.doc_id,
                 CAST(floor(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                            * {_M}) AS BIGINT)
                 * 22 * h.tf * {_M}
                 // (10 * {_M} * h.tf + 3 * {_M}
                     + 9 * CAST(CAST(h.dl AS HUGEINT) * s.n_docs * {_M}
                            // s.sum_dl AS BIGINT)) AS contrib
          FROM hits h JOIN dfs f USING (term) CROSS JOIN stats s)
        SELECT doc_id, COUNT(*) AS n_terms_hit,
               SUM(contrib) AS score_micro
        FROM scored GROUP BY doc_id
        ORDER BY score_micro DESC, doc_id ASC LIMIT {int(k)}
    """


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Per-document keyword extraction: top-``k`` terms by tf-idf.

    score_micro = tf * floor(ln(n_docs / df) * 1e6) — tf and df are exact
    integers, the idf is micro-nat-floored once per term, so the score is
    an exact integer product and the per-doc top-k (score desc, term asc)
    is engine-deterministic.  One corpus explode, a term-keyed df agg
    broadcast back, one row_number window per doc_id (uniform keys — each
    doc's candidate set is its own vocabulary).

    Returns (doc_id, term, tf, score_micro, rank), rank 1..k."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    tf = (
        docs.select(F.col("doc_id"), F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_micro",
            F.col("tf")
            * F.floor(
                F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
                * 1_000_000
            ).cast("long"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "score_micro", "rank")
    )


def tfidf_top_terms_sql(docs_table: str, k: int = 5) -> str:
    """DuckDB twin of :func:`tfidf_top_terms` (same aggregation algorithm
    — the idf/window arithmetic is what the comparison pins; QUALIFY
    replaces the window filter)."""
    return f"""
        WITH tf AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM {docs_table}),
        tfc AS (
          SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY 1, 2),
        dfc AS (
          SELECT term, COUNT(*) AS df FROM tfc GROUP BY 1),
        nd AS (SELECT COUNT(*) AS n_docs FROM {docs_table})
        SELECT doc_id, term, tf,
               tf * CAST(floor(ln(CAST(n.n_docs AS DOUBLE)
                                  / CAST(d.df AS DOUBLE)) * 1000000) AS BIGINT)
                 AS score_micro,
               CAST(row_number() OVER (
                 PARTITION BY doc_id
                 ORDER BY tf * CAST(floor(ln(CAST(n.n_docs AS DOUBLE)
                          / CAST(d.df AS DOUBLE)) * 1000000) AS BIGINT) DESC,
                          term ASC) AS INT) AS rank
        FROM tfc t JOIN dfc d USING (term) CROSS JOIN nd n
        QUALIFY rank <= {int(k)}
    """
