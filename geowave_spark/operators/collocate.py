"""PMI collocation extraction over the document corpus.

The text-side twin of the spatial colocation PI (`hotspot.colocation_pi`):
instead of "which feature categories occur together within radius d", this
asks "which token pairs co-occur within a w-token window more than chance"
— pointwise mutual information (Church & Hanks 1990), the standard
collocation score every corpus-linguistics stack ships and a staple
training-data diagnostic (multi-word entities, boilerplate phrases,
tokenizer-merge candidates beyond raw BPE counts).

Spark-first shape: pair generation is ZERO-JOIN — for each offset
k = 1..w the pair list is a pure Catalyst array zip over the token array
(`transform(sequence(...), i -> (toks[i], toks[i+k]))`), emitting a
stream bounded by w * n_tokens; one groupBy on uniform (term_a, term_b)
keys counts pairs, unigram counts broadcast back, and the PMI top-k is
a TakeOrdered.  TWO corpus scans total: the pair-count aggregate is
checkpointed and serves both the min-support-filtered candidates and
the global pair total, and the unigram aggregate likewise yields the
token total as a sum of itself.  Nothing is all-pairs; the min-support
filter runs before the broadcast joins.

Determinism: PMI = ln((c_ab * T^2) / (P * c_a * c_b)) is computed as ONE
pinned float expression over exact integer counts (casts of the same
longs in both engines), floor-quantized to micro-nats; ties at the top-k
boundary break on the (term_a, term_b) pair.

Oracle: position self-join (tokens with ordinality, b.pos between
a.pos+1 and a.pos+w) — an independent pair-generation plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions.text import tokens

__all__ = ["pmi_collocations", "pmi_collocations_sql"]

_M = 1_000_000


def pmi_collocations(
    docs: DataFrame,
    window: int = 3,
    min_count: int = 5,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` unordered token pairs by PMI within a ``window``-token
    co-occurrence window, at support >= ``min_count``.  Returns
    (term_a, term_b, n_pair, pmi_micro) ordered by (pmi desc, pair asc)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    if min_count < 1 or k < 1:
        raise ValueError("min_count and k must be >= 1")

    toks = docs.select(tokens(F.col(text_col)).alias("toks"))
    # all within-window pairs as array zips: offset k pairs toks[i] with
    # toks[i+k]; unordered canonical form (least, greatest)
    def _pairs_at(off: int):
        # single-arg lambda: a two-parameter callable would make Spark
        # pass (element, index) and silently rebind the offset
        def f(i):
            return F.struct(
                F.least(
                    F.element_at(F.col("toks"), i + 1),
                    F.element_at(F.col("toks"), i + 1 + off),
                ).alias("a"),
                F.greatest(
                    F.element_at(F.col("toks"), i + 1),
                    F.element_at(F.col("toks"), i + 1 + off),
                ).alias("b"),
            )

        return F.when(
            F.size("toks") > off,
            F.transform(F.sequence(F.lit(0), F.size("toks") - off - 1), f),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))

    pair_arrays = [_pairs_at(off) for off in range(1, window + 1)]
    pairs = toks.select(
        F.explode(F.concat(*pair_arrays)).alias("p")
    ).select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))

    # two corpus scans total: the pair explode feeds BOTH the filtered
    # pair counts and the global pair total (one shuffle, two consumers of
    # its output); the unigram explode likewise yields n_tok as the sum of
    # its own aggregate — nothing re-reads the corpus beyond these two
    pc_all = pairs.groupBy("term_a", "term_b").agg(
        F.count(F.lit(1)).alias("n_pair")
    ).localCheckpoint()
    pair_counts = pc_all.filter(F.col("n_pair") >= min_count)
    npairs = pc_all.agg(F.sum("n_pair").alias("n_pairs"))
    unigrams = (
        toks.select(F.explode("toks").alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n_uni"))
        .localCheckpoint()
    )
    totals = unigrams.agg(F.sum("n_uni").alias("n_tok"))

    ud = F.col("n_uni").cast("double")
    scored = (
        pair_counts.join(
            F.broadcast(
                unigrams.select(F.col("t").alias("term_a"), ud.alias("ua"))
            ),
            "term_a",
        )
        .join(
            F.broadcast(
                unigrams.select(F.col("t").alias("term_b"), ud.alias("ub"))
            ),
            "term_b",
        )
        .crossJoin(F.broadcast(totals.select("n_tok")))
        .crossJoin(F.broadcast(npairs))
        .withColumn(
            "pmi_micro",
            F.floor(
                F.log(
                    (
                        F.col("n_pair").cast("double")
                        * F.col("n_tok").cast("double")
                        * F.col("n_tok").cast("double")
                    )
                    / (
                        F.col("n_pairs").cast("double")
                        * F.col("ua")
                        * F.col("ub")
                    )
                )
                * _M
            ).cast("long"),
        )
    )
    return (
        scored.select("term_a", "term_b", "n_pair", "pmi_micro")
        .orderBy(F.desc("pmi_micro"), F.asc("term_a"), F.asc("term_b"))
        .limit(int(k))
    )


def pmi_collocations_sql(
    docs_table: str, window: int = 3, min_count: int = 5, k: int = 50
) -> str:
    """DuckDB twin: tokens WITH ORDINALITY, pairs by position self-join
    (b.pos between a.pos+1 and a.pos+w) — an independent pair plan; same
    canonical pair order, pinned PMI expression, and tie-broken top-k."""
    w = int(window)
    return f"""
        WITH toks AS (
          SELECT row_number() OVER () AS did, string_split(text, ' ') AS ts
          FROM {docs_table}),
        pos AS (
          -- parallel unnest zips the token list with its 1-based positions
          SELECT did, unnest(ts) AS term,
                 unnest(range(1, len(ts) + 1)) AS p
          FROM toks),
        pairs AS (
          SELECT LEAST(a.term, b.term) AS term_a,
                 GREATEST(a.term, b.term) AS term_b
          FROM pos a JOIN pos b
            ON b.did = a.did AND b.p BETWEEN a.p + 1 AND a.p + {w}),
        pc AS (
          SELECT term_a, term_b, COUNT(*) AS n_pair FROM pairs
          GROUP BY 1, 2 HAVING COUNT(*) >= {int(min_count)}),
        uni AS (
          SELECT term, COUNT(*) AS n_uni FROM pos GROUP BY 1),
        tot AS (
          SELECT (SELECT COUNT(*) FROM pos) AS n_tok,
                 (SELECT COUNT(*) FROM pairs) AS n_pairs)
        SELECT p.term_a, p.term_b, p.n_pair,
               CAST(floor(ln(
                 (CAST(p.n_pair AS DOUBLE) * CAST(t.n_tok AS DOUBLE)
                    * CAST(t.n_tok AS DOUBLE))
                 / (CAST(t.n_pairs AS DOUBLE) * CAST(ua.n_uni AS DOUBLE)
                    * CAST(ub.n_uni AS DOUBLE))
               ) * {_M}) AS BIGINT) AS pmi_micro
        FROM pc p
        JOIN uni ua ON ua.term = p.term_a
        JOIN uni ub ON ub.term = p.term_b
        CROSS JOIN tot t
        ORDER BY pmi_micro DESC, p.term_a ASC, p.term_b ASC
        LIMIT {int(k)}
    """
