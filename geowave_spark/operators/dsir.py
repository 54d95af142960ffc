"""DSIR-style data selection: hashed n-gram importance resampling.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023): score
every raw document by the log-likelihood ratio of a *target* (in-domain)
bag-of-hashed-ngrams model over the *raw* model, perturb with Gumbel noise,
and keep the top-k — selecting raw documents whose feature distribution
looks like the target.  The standard pretraining-corpus curation step next
to quality gating (`operators/lm_score.py`) and mixture rebalancing
(`operators/sampling.domain_mixture_sample`); the reference engine has no
text surface at all.

Spark-first shape (survives 10^12 docs):

- **Features** are unigrams + word bigrams hashed into ``n_buckets``
  (DSIR's hashed n-gram features): one explode per corpus scan.
- **Both models** are bucket-count aggregations — at most ``n_buckets``
  rows each regardless of corpus size — broadcast back.  The target slice
  is a predicate over the same corpus (or any second table).
- **Scoring** is one broadcast join + integer sum per document.  The
  Gumbel perturbation is a pure column over the shared md5 convention
  (`operators/sampling._unit_hash`), so re-runs and engine swaps reproduce
  the sample bit-for-bit.  Top-k is ``ORDER BY .. LIMIT k`` —
  TakeOrderedAndProject, never a single-partition global sort.

Cross-engine determinism (the `operators/lm_score.py` convention): bucket
counts are exact integers; the likelihood ratio is evaluated as
``((ct+1)/(cr+1)) * ((rawN+B)/(tgtN+B))`` — two IEEE divisions and one
multiply, never an integer product that could overflow at corpus scale —
and each ``ln`` is quantized to ``floor(ln(x) * 1e6)`` (micro-nats) BEFORE
the exact integer per-document sum, absorbing last-ulp libm variance
between the JVM and DuckDB (~1e-9 flip probability per term).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions.text import (
    md5_long,
    md5_long_sql,
    tokens,
    word_ngrams,
    word_ngrams_sql,
)

__all__ = ["dsir_importance", "dsir_resample", "dsir_sql"]

_Q = 1_000_000  # micro-nat quantization grid (shared with lm_score)
_RES = 1_000_000  # Gumbel draw resolution (shared with sampling._unit_hash)
_GUMBEL_SALT = "dsir-gumbel-v1"


def _features(docs: DataFrame, text_col: str, id_col: str, n_buckets: int) -> DataFrame:
    """One row per feature occurrence: (_id, _b) with _b in [0, n_buckets).
    Features are unigrams + word bigrams (every doc has >= 1 token, so no
    document vanishes here)."""
    toks = tokens(F.col(text_col))
    feats = F.concat(toks, word_ngrams(toks, 2))
    return docs.select(
        F.col(id_col).alias("_id"), F.explode(feats).alias("_f")
    ).select("_id", (md5_long(F.col("_f")) % F.lit(n_buckets)).alias("_b"))


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance weight: (id_col, imp_q6) where imp_q6
    is the exact integer sum of micro-nat-quantized per-feature log ratios
    ``ln(p_target(b) / p_raw(b))`` under add-one smoothing."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    # the tokenize+hash explode is the expensive map stage and feeds BOTH
    # the raw bucket model and the per-document scoring join: materialize it
    # once (eager=False — nothing runs unless the query does; the
    # hotspot-family single-corpus-scan discipline)
    fb_raw = _features(raw, text_col, id_col, n_buckets).localCheckpoint(eager=False)
    fb_tgt = _features(target, text_col, id_col, n_buckets)
    cr = fb_raw.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    ct = fb_tgt.groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    # feature totals fold from the <= n_buckets-row models — no extra
    # corpus pass for either total
    rn = cr.agg(F.coalesce(F.sum("_cr"), F.lit(0)).alias("_rn"))
    tn = ct.agg(F.coalesce(F.sum("_ct"), F.lit(0)).alias("_tn"))
    b = int(n_buckets)
    # bucket model: <= n_buckets rows however large the corpus; the totals
    # are 1-row cross joins.  ratio folds as two divisions (overflow-free).
    ratio = (
        (F.col("_ct_s") + F.lit(1)).cast("double") / (F.col("_cr") + F.lit(1))
    ) * ((F.col("_rn") + F.lit(b)).cast("double") / (F.col("_tn") + F.lit(b)))
    qlog = (
        cr.join(ct, "_b", "left")
        .select("_b", "_cr", F.coalesce("_ct", F.lit(0)).alias("_ct_s"))
        .crossJoin(F.broadcast(rn))
        .crossJoin(F.broadcast(tn))
        .select("_b", F.floor(F.log(ratio) * F.lit(_Q)).cast("long").alias("_qlog"))
    )
    scored = (
        fb_raw.join(F.broadcast(qlog), "_b")
        .groupBy("_id")
        .agg(F.sum("_qlog").alias("imp_q6"))
    )
    return raw.select(F.col(id_col)).join(
        scored.withColumnRenamed("_id", id_col), id_col, "left"
    ).select(id_col, F.coalesce("imp_q6", F.lit(0)).cast("long").alias("imp_q6"))


def _gumbel_q6(id_col: Column, salt: str) -> Column:
    """floor(Gumbel(0,1) * 1e6) from the deterministic md5 draw: the draw
    is (hash % RES + 0.5) / RES, strictly inside (0, 1) so both logs are
    finite."""
    u = (
        (md5_long(F.concat(F.lit(salt), id_col.cast("string"))) % F.lit(_RES)).cast(
            "double"
        )
        + F.lit(0.5)
    ) / F.lit(float(_RES))
    return F.floor(-F.log(-F.log(u)) * F.lit(_Q)).cast("long")


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = _GUMBEL_SALT,
) -> DataFrame:
    """Gumbel top-k importance resample: the k raw documents maximizing
    ``imp_q6 + gumbel_q6`` (deterministic ties broken by id).  Returns
    (id_col, imp_q6, key_q6).

    Gumbel-max over the softmax of importance weights == sampling without
    replacement proportional to exp(importance) — DSIR's resampling step —
    and the deterministic per-id draw makes the 'sample' a pure function of
    the corpus, re-runnable and auditable like `operators/sampling`."""
    if k < 1:
        raise ValueError("k must be >= 1")
    imp = dsir_importance(raw, target, n_buckets, text_col, id_col)
    keyed = imp.select(
        id_col,
        "imp_q6",
        (F.col("imp_q6") + _gumbel_q6(F.col(id_col), salt)).alias("key_q6"),
    )
    return keyed.orderBy(F.col("key_q6").desc(), F.col(id_col)).limit(int(k))


def dsir_sql(
    docs_rel: str,
    target_pred: str,
    k: int,
    n_buckets: int = 4096,
    salt: str = _GUMBEL_SALT,
) -> str:
    """DuckDB twin of :func:`dsir_resample` with target = raw filtered by
    ``target_pred`` (the driver-query shape).  Same quantized arithmetic,
    independent engine."""
    b = int(n_buckets)
    toks = "string_split(text, ' ')"
    ngrams = word_ngrams_sql("toks", 2)
    bh = md5_long_sql("f")
    salted = md5_long_sql(f"'{salt}' || CAST(doc_id AS VARCHAR)")
    u = f"(CAST({salted} % {_RES} AS DOUBLE) + 0.5) / {float(_RES)!r}"
    return f"""
        WITH t AS (SELECT doc_id, {toks} AS toks,
                          ({target_pred}) AS is_tgt FROM {docs_rel}),
        f AS (SELECT doc_id, is_tgt,
                     unnest(list_concat(toks, {ngrams})) AS f
              FROM t),
        fb AS (SELECT doc_id, is_tgt, {bh} % {b} AS bkt FROM f),
        cr AS (SELECT bkt, count(*) AS cr FROM fb GROUP BY bkt),
        ct AS (SELECT bkt, count(*) AS ct FROM fb WHERE is_tgt GROUP BY bkt),
        tot AS (SELECT (SELECT count(*) FROM fb) AS rn,
                       (SELECT count(*) FROM fb WHERE is_tgt) AS tn),
        q AS (SELECT cr.bkt,
                     CAST(floor(ln(
                       (CAST(COALESCE(ct.ct, 0) + 1 AS DOUBLE) / (cr.cr + 1))
                       * (CAST(tot.rn + {b} AS DOUBLE) / (tot.tn + {b}))
                     ) * {_Q}) AS BIGINT) AS qlog
              FROM cr LEFT JOIN ct USING (bkt), tot),
        imp AS (SELECT fb.doc_id, CAST(sum(q.qlog) AS BIGINT) AS imp_q6
                FROM fb JOIN q ON q.bkt = fb.bkt GROUP BY fb.doc_id),
        keyed AS (
          SELECT d.doc_id,
                 CAST(COALESCE(imp.imp_q6, 0) AS BIGINT) AS imp_q6,
                 CAST(COALESCE(imp.imp_q6, 0)
                      + CAST(floor(-ln(-ln({u})) * {_Q}) AS BIGINT)
                      AS BIGINT) AS key_q6
          FROM {docs_rel} d LEFT JOIN imp USING (doc_id))
        SELECT doc_id, imp_q6, key_q6 FROM keyed
        ORDER BY key_q6 DESC, doc_id LIMIT {int(k)}
    """
