"""Distributed BPE tokenizer training primitives.

Training a byte-pair-encoding tokenizer over a 100 TB corpus is a canonical
pretraining-pipeline job the reference engine has no analog for.  The
scalable design (used by every production tokenizer trainer) hinges on one
observation: after a single distributed word-frequency count, **all further
work happens on the word-TYPE table**, which Zipf keeps vocabulary-sized
(millions of rows) no matter how large the corpus is.

- :func:`word_type_counts` — the one corpus-sized pass: whitespace words →
  ``(word, wf)`` via a partial-agg groupBy (uniform keys, map-side combine).
- :func:`bpe_pair_counts` — the trainer's inner loop as a single query:
  adjacent-symbol pair counts weighted by word frequency, ranked.  Explode +
  one partial-agg shuffle over the type table; the global rank window runs
  over *pair types* (bounded by alphabet², tiny).
- :func:`bpe_train` — the full greedy loop: ``n_merges`` iterations, each a
  small Spark job over the type table (count pairs → argmax → apply the
  merge with a pure-Catalyst left-to-right fold).  One driver-side
  ``collect`` of a single row per iteration — the same bounded pattern as
  broadcast-Lloyd k-means (`operators/clustering.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["word_type_counts", "bpe_pair_counts", "bpe_train"]


def word_type_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wf): corpus word-type frequencies — the only corpus-sized pass."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wf"))
    )


def _char_pairs(word: F.Column) -> F.Column:
    """Adjacent character pairs of a word (empty for length < 2)."""
    return F.when(
        F.length(word) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(word) - 1),
            lambda i: word.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bpe_pair_counts(docs: DataFrame, top_n: int = 50, text_col: str = "text") -> DataFrame:
    """Top-``top_n`` adjacent character pairs weighted by word frequency:
    ``(pair, n, rank)`` with the deterministic ``(n DESC, pair ASC)`` order
    every greedy BPE step uses to pick its merge."""
    from pyspark.sql import Window

    w = word_type_counts(docs, text_col)
    pairs = w.select(F.col("wf"), F.explode(_char_pairs(F.col("word"))).alias("pair"))
    counts = pairs.groupBy("pair").agg(F.sum("wf").alias("n"))
    rk = F.row_number().over(Window.orderBy(F.col("n").desc(), F.col("pair")))
    return (
        counts.withColumn("rank", rk.cast("int"))
        .filter(F.col("rank") <= top_n)
        .select("pair", "n", "rank")
    )


def _merge_symbols(syms: F.Column, a: str, b: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (a, b) → a+b, as a pure fold.

    Matches reference BPE exactly: after a merge the combined symbol cannot
    re-merge with the element it just consumed (the fold compares whole
    symbols, and the accumulator's last element is already ``a+b``).
    """
    merged = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Greedy BPE: returns ``[(left, right, count), ...]`` merge rules.

    Each iteration runs entirely on the word-type table (vocabulary-sized):
    count adjacent symbol pairs weighted by ``wf``, pick the most frequent
    (ties: lexicographic), rewrite every type's symbol sequence with the
    pure-Catalyst fold.  Stops early when no pair occurs twice.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    types = word_type_counts(docs, text_col).withColumn(
        "syms",
        F.filter(F.split(F.col("word"), ""), lambda c: c != F.lit("")),
    )
    types = types.persist()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            pair_rows = (
                types.select(
                    "wf",
                    F.explode(
                        F.when(
                            F.size("syms") >= 2,
                            F.zip_with(
                                F.slice("syms", 1, F.size("syms") - 1),
                                F.slice("syms", 2, F.size("syms") - 1),
                                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                            ),
                        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
                    ).alias("p"),
                )
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("wf").alias("n"))
                .orderBy(F.col("n").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not pair_rows or pair_rows[0]["n"] < 2:
                break
            a, b, n = pair_rows[0]["a"], pair_rows[0]["b"], int(pair_rows[0]["n"])
            merges.append((a, b, n))
            nxt = types.withColumn("syms", _merge_symbols(F.col("syms"), a, b)).persist()
            nxt.count()  # materialize before dropping the parent lineage
            types.unpersist()
            types = nxt
    finally:
        types.unpersist()
    return merges
