"""Corpus cleaning operators: repetition signals + boilerplate block dedup.

Two standard web-corpus curation stages the reference engine has no analog
for (its text surface stops at the secondary text index,
`core/store/.../index/text/TextIndexStrategy.java`), but which any 100 TB
training-data pipeline runs before tokenization:

- :func:`repetition_signals` — the Gopher-style intra-document repetition
  quality signals (duplicate-token fraction, top-bigram fraction, duplicate
  n-gram fraction).  One scan of the corpus: every document's 2- and 3-gram
  streams are exploded **once** behind a sentinel row that keeps empty/short
  documents in the output, then two partial-agg shuffles keyed by
  (doc_id, n, gram) and (doc_id) — both uniform keys, both map-side
  combinable.  All counters are exact integers; the emitted fractions are
  single IEEE divisions, so the DuckDB oracle reproduces them bit-for-bit.

- :func:`block_dedup` — RefinedWeb-style boilerplate removal re-expressed on
  fixed token blocks (the driver corpus is single-line, so the classic
  line-level pass is degenerate; a fixed-width block is the same contract
  with a deterministic segmentation).  The banned set (blocks appearing in
  more than ``max_doc_freq`` distinct documents) is small by construction —
  boilerplate is by definition repeated — so the plan is: one explode +
  distinct + count to build it, then a **broadcast anti-join** against the
  exploded corpus and an order-preserving reassembly.  The 100-TB side is
  read once and never shuffled on a skewed key (block hashes of repeated
  boilerplate are hot, but they only ever feed the *small* banned-set agg,
  where partial aggregation collapses them map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geowave_spark.functions.text import md5_long, tokens, word_ngrams

__all__ = ["repetition_signals", "block_dedup"]


def repetition_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition quality signals (Gopher §A1.1 style).

    Output columns (integers exact, fractions single divisions):
    ``n_tokens, n_distinct, n_bigrams, top_bigram_n, dup_bigram_n,
    n_trigrams, dup_trigram_n, dup_token_frac, top_bigram_frac,
    dup_trigram_frac``.

    ``dup_*gram_n`` counts gram *occurrences* whose gram appears >= 2 times
    in the document (the Gopher "fraction of characters in duplicated
    n-grams" numerator, counted in grams instead of characters so the
    arithmetic stays integer-exact cross-engine).
    """
    toks = tokens(F.col(text_col))
    empty_tag = F.array(F.struct(F.lit(0).alias("gn"), F.lit("").alias("g")))
    tag = lambda arr, n: F.transform(  # noqa: E731
        arr, lambda g: F.struct(F.lit(n).alias("gn"), g.alias("g"))
    )
    grams = F.concat(empty_tag, tag(word_ngrams(toks, 2), 2), tag(word_ngrams(toks, 3), 3))
    rows = docs.select(
        F.col(id_col),
        F.size(toks).alias("_nt"),
        F.size(F.array_distinct(toks)).alias("_ndis"),
        F.explode(grams).alias("_g"),
    ).select(id_col, "_nt", "_ndis", F.col("_g.gn").alias("_gn"), F.col("_g.g").alias("_gv"))

    per_gram = rows.groupBy(id_col, "_gn", "_gv").agg(
        F.count("*").alias("_c"), F.min("_nt").alias("_nt"), F.min("_ndis").alias("_ndis")
    )

    def _n(n: int) -> F.Column:
        return F.when(F.col("_gn") == n, F.col("_c"))

    agg = per_gram.groupBy(id_col).agg(
        F.min("_nt").alias("n_tokens"),
        F.min("_ndis").alias("n_distinct"),
        F.coalesce(F.sum(_n(2)), F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce(F.max(_n(2)), F.lit(0)).cast("long").alias("top_bigram_n"),
        F.coalesce(F.sum(F.when((F.col("_gn") == 2) & (F.col("_c") >= 2), F.col("_c"))), F.lit(0))
        .cast("long")
        .alias("dup_bigram_n"),
        F.coalesce(F.sum(_n(3)), F.lit(0)).cast("long").alias("n_trigrams"),
        F.coalesce(F.sum(F.when((F.col("_gn") == 3) & (F.col("_c") >= 2), F.col("_c"))), F.lit(0))
        .cast("long")
        .alias("dup_trigram_n"),
    )

    def _frac(num: str, den: str) -> F.Column:
        return F.when(
            F.col(den) > 0, F.col(num).cast("double") / F.col(den).cast("double")
        ).otherwise(F.lit(0.0))

    return agg.select(
        id_col,
        "n_tokens",
        "n_distinct",
        "n_bigrams",
        "top_bigram_n",
        "dup_bigram_n",
        "n_trigrams",
        "dup_trigram_n",
        F.when(
            F.col("n_tokens") > 0,
            F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_token_frac"),
        _frac("top_bigram_n", "n_bigrams").alias("top_bigram_frac"),
        _frac("dup_trigram_n", "n_trigrams").alias("dup_trigram_frac"),
    )


def block_dedup(
    docs: DataFrame,
    block_tokens: int = 16,
    max_doc_freq: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove corpus-duplicated token blocks from every document.

    Documents are segmented into fixed non-overlapping ``block_tokens``-token
    blocks; a block whose text appears in more than ``max_doc_freq``
    *distinct* documents is boilerplate and is dropped from all of them.
    Output: ``(doc_id, n_blocks, n_blocks_kept, clean_text)`` with
    ``clean_text`` the kept blocks re-joined in original order (empty string
    when everything was banned).

    Scale shape: the banned set is tiny (boilerplate is repeated by
    definition), so the corpus-side work is one explode feeding a partial-agg
    doc-frequency count plus one broadcast **anti**-join — the big side never
    shuffles on the (hot) block key.
    """
    if block_tokens < 1:
        raise ValueError(f"block_tokens must be >= 1, got {block_tokens}")
    toks = tokens(F.col(text_col))
    n_blocks = F.floor((F.size(toks) + F.lit(block_tokens - 1)) / F.lit(block_tokens)).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * block_tokens + 1, block_tokens)),
    )
    exploded = docs.select(
        F.col(id_col), F.posexplode(blocks).alias("_pos", "_blk")
    ).withColumn("_bh", md5_long(F.col("_blk")))

    banned = (
        exploded.select(id_col, "_bh")
        .distinct()
        .groupBy("_bh")
        .count()
        .filter(F.col("count") > max_doc_freq)
        .select("_bh")
    )
    kept = exploded.join(F.broadcast(banned), "_bh", "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.count("*").cast("int").alias("n_blocks_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("_pos"), F.col("_blk")))),
                lambda s: s["_blk"],
            ),
        ).alias("clean_text"),
    )
    base = docs.select(F.col(id_col), n_blocks.alias("n_blocks"))
    return base.join(reassembled, id_col, "left").select(
        id_col,
        "n_blocks",
        F.coalesce("n_blocks_kept", F.lit(0)).cast("int").alias("n_blocks_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def substring_dup_spans(
    docs: DataFrame,
    k: int = 16,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-substring audit (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022): every SLIDING
    k-token window whose exact text occurs >= ``min_count`` times anywhere
    in the corpus marks its span duplicated; overlapping marked spans merge
    into maximal intervals.  The sliding window catches duplicated passages
    at any alignment — the gap :func:`block_dedup`'s fixed segmentation
    leaves (a copied paragraph that straddles block boundaries dedups here).

    Returns per document: (doc_id, n_tokens, n_spans, dup_tokens) —
    maximal merged duplicated intervals and the token mass they cover
    (the ACL-2022 "fraction of corpus duplicated" audit, per doc).

    100 TB shape: one shingle explode; the occurrence count is a map-side
    combinable agg on the shingle hash (hot boilerplate shingles collapse
    in the combiner); positions re-join the >= min_count set on the same
    uniform hash key; the interval merge is one per-document window
    (bounded by document length).  Nothing quadratic, nothing collected.

    Exactness: positions and counts are integers end-to-end; the md5
    shingle hash is the shared cross-engine convention."""
    if k < 2:
        raise ValueError("k must be >= 2")
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    from pyspark.sql import Window

    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("_id"), F.size(toks).alias("n_tokens"), toks.alias("_t")
    )
    sh = base.select(
        "_id",
        F.posexplode(word_ngrams(F.col("_t"), k)).alias("_i", "_g"),
    ).select("_id", "_i", md5_long(F.col("_g")).alias("_h"))
    dup = (
        sh.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= F.lit(int(min_count)))
        .select("_h")
    )
    hits = sh.join(dup, "_h").select("_id", "_i")
    w = Window.partitionBy("_id").orderBy("_i")
    prev_end = F.max(F.col("_i") + F.lit(k)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = hits.withColumn(
        "_brk", F.when(prev_end.isNull() | (F.col("_i") > prev_end), 1).otherwise(0)
    ).withColumn("_isl", F.sum("_brk").over(w))
    spans = islands.groupBy("_id", "_isl").agg(
        F.min("_i").alias("_s"), (F.max("_i") + F.lit(k)).alias("_e")
    )
    per_doc = spans.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("_e") - F.col("_s")).cast("long").alias("dup_tokens"),
    )
    return (
        base.select("_id", "n_tokens")
        .join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        )
    )


def substring_dup_spans_sql(
    docs_rel: str, k: int = 16, min_count: int = 2
) -> str:
    """DuckDB twin of :func:`substring_dup_spans`: same shingle hash, same
    interval-merge arithmetic, window formulation independent of Spark's."""
    from geowave_spark.functions.text import md5_long_sql, word_ngrams_sql

    toks = "string_split(text, ' ')"
    grams = word_ngrams_sql("toks", k)
    h = md5_long_sql("g")
    return f"""
        WITH t AS (SELECT doc_id, {toks} AS toks FROM {docs_rel}),
        raw AS (
          SELECT doc_id, unnest(grams) AS g,
                 generate_subscripts(grams, 1) - 1 AS i0
          FROM (SELECT doc_id, {grams} AS grams FROM t)),
        sh AS (SELECT doc_id, CAST(i0 AS BIGINT) AS i, {h} AS h FROM raw),
        dup AS (SELECT h FROM sh GROUP BY h HAVING count(*) >= {int(min_count)}),
        hits AS (SELECT sh.doc_id, sh.i FROM sh JOIN dup USING (h)),
        brk AS (
          SELECT doc_id, i,
                 CASE WHEN max(i + {int(k)}) OVER (
                        PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      IS NULL
                   OR i > max(i + {int(k)}) OVER (
                        PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 THEN 1 ELSE 0 END AS b
          FROM hits),
        isl AS (SELECT doc_id, i, b,
                       sum(b) OVER (PARTITION BY doc_id ORDER BY i) AS isl
                FROM brk),
        spans AS (SELECT doc_id, isl, min(i) AS s, max(i) + {int(k)} AS e
                  FROM isl GROUP BY doc_id, isl),
        pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
                      CAST(sum(e - s) AS BIGINT) AS dup_tokens
               FROM spans GROUP BY doc_id)
        SELECT t2.doc_id,
               CAST(len(string_split(t2.text, ' ')) AS BIGINT) AS n_tokens,
               COALESCE(pd.n_spans, 0) AS n_spans,
               COALESCE(pd.dup_tokens, 0) AS dup_tokens
        FROM {docs_rel} t2 LEFT JOIN pd USING (doc_id)
    """
