"""CCNet-style n-gram language-model quality scoring.

The standard web-corpus quality gate (CCNet / RedPajama): train a small
smoothed LM on an in-domain slice, score every document's per-token
log-likelihood, and filter/bucket on the score.  The reference engine has no
text surface at all; this is a first-class training-data operator.

Spark-first shape (survives 10^12 docs):

- **Train** is two aggregations over the (hash-split) train slice: bigram
  type counts and their per-context totals.  Both tables are *vocabulary*-
  sized, not corpus-sized — Zipf guarantees they are millions of rows when
  the corpus is trillions — and the bigram table is further capped to the
  ``top_k`` most frequent types (deterministic tie-break), mirroring CCNet's
  pruned KenLM.  Ranking the cap is a global window over the *type* table
  only, never the corpus.
- **Score** is one scan of the corpus: explode each document's adjacent
  token pairs, LEFT broadcast-join the capped LM + context tables, fold
  add-one-smoothed log-probs.  No UDFs, no Python — the whole pipeline is
  Catalyst columns.

Cross-engine determinism: every count is an exact integer; the smoothed
probability is a single IEEE division; the only libm call is ``ln``, whose
last-ulp variance between the JVM and DuckDB is absorbed by quantizing each
term to ``floor(ln(p) * 1e6)`` **before** the (exact, integer) per-document
sum — flip probability per term is ~1e-9, negligible at oracle scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions.text import tokens

__all__ = ["bigram_lm_tables", "lm_quality_score"]

_Q = 1_000_000  # log-prob quantization grid (micro-nats)


def _pairs(docs: DataFrame, text_col: str, *extra: str) -> DataFrame:
    """Adjacent token pairs, one row per occurrence: (*extra, _w1, _w2)."""
    toks = tokens(F.col(text_col))
    pair_arr = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return docs.select(*extra, F.explode(pair_arr).alias("_p")).select(
        *extra, F.col("_p.w1").alias("_w1"), F.col("_p.w2").alias("_w2")
    )


def bigram_lm_tables(
    train: DataFrame, top_k: int, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """(capped bigram counts, context totals, train vocabulary size).

    The context totals are derived from the *uncapped* bigram counts (exact
    sums), so the cap only prunes which numerators survive — the add-one
    denominator ``c(w1·) + V`` is always the true one.
    """
    pairs = _pairs(train, text_col)
    c2 = pairs.groupBy("_w1", "_w2").agg(F.count("*").alias("_c2"))
    ctx = c2.groupBy("_w1").agg(F.sum("_c2").alias("_c1"))
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.orderBy(F.col("_c2").desc(), F.col("_w1"), F.col("_w2"))
    )
    lm = c2.withColumn("_rk", rk).filter(F.col("_rk") <= top_k).drop("_rk")
    vocab = (
        train.select(F.explode(tokens(F.col(text_col))).alias("_t"))
        .agg(F.countDistinct("_t"))
        .collect()[0][0]
    )
    return lm, ctx, int(vocab)


def lm_quality_score(
    docs: DataFrame,
    train: DataFrame,
    top_k: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document under an add-one-smoothed bigram LM trained on
    ``train``: ``(doc_id, n_bigrams, sum_logp_q6, avg_logp)`` where
    ``sum_logp_q6`` is the exact integer sum of micro-nat-quantized terms
    and ``avg_logp = (sum/1e6)/n`` (0-bigram documents score 0).
    """
    lm, ctx, vocab = bigram_lm_tables(train, top_k, text_col)
    dp = _pairs(docs, text_col, id_col)
    scored = (
        dp.join(F.broadcast(lm), ["_w1", "_w2"], "left")
        .join(F.broadcast(ctx), ["_w1"], "left")
        .withColumn(
            "_lpq",
            F.floor(
                F.log(
                    (F.coalesce(F.col("_c2"), F.lit(0)) + F.lit(1))
                    / (F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(vocab))
                )
                * F.lit(_Q)
            ).cast("long"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"), F.sum("_lpq").alias("sum_logp_q6")
    )
    return docs.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("sum_logp_q6", F.lit(0)).cast("long").alias("sum_logp_q6"),
        F.when(
            F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
            (F.col("sum_logp_q6").cast("double") / F.lit(float(_Q))) / F.col("n_bigrams"),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_logp"),
    )
