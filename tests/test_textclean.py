"""Tests for the round-4 corpus-curation operators: repetition signals,
block-level boilerplate dedup, bigram-LM quality scoring, distributed BPE,
and domain-mixture sampling."""

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# --- repetition_signals -----------------------------------------------------


class TestRepetitionSignals:
    def test_hand_counts(self, spark):
        from geowave_spark.operators.textclean import repetition_signals

        # "a b a b c": bigrams [ab, ba, ab, bc] -> ab x2 (dup), trigrams
        # [aba, bab, abc] all unique
        out = repetition_signals(_docs(spark, [(1, "a b a b c")])).collect()[0]
        assert out.n_tokens == 5 and out.n_distinct == 3
        assert out.n_bigrams == 4 and out.top_bigram_n == 2 and out.dup_bigram_n == 2
        assert out.n_trigrams == 3 and out.dup_trigram_n == 0
        assert out.dup_token_frac == pytest.approx(1 - 3 / 5)
        assert out.top_bigram_frac == pytest.approx(2 / 4)
        assert out.dup_trigram_frac == 0.0

    def test_short_docs_survive(self, spark):
        from geowave_spark.operators.textclean import repetition_signals

        rows = repetition_signals(
            _docs(spark, [(1, "solo"), (2, "two tokens"), (3, "")])
        ).collect()
        by_id = {r.doc_id: r for r in rows}
        assert set(by_id) == {1, 2, 3}
        assert by_id[1].n_bigrams == 0 and by_id[1].top_bigram_frac == 0.0
        assert by_id[2].n_bigrams == 1 and by_id[2].n_trigrams == 0
        # empty string splits to [''] -> one token
        assert by_id[3].n_tokens == 1

    def test_pure_repetition(self, spark):
        from geowave_spark.operators.textclean import repetition_signals

        out = repetition_signals(_docs(spark, [(1, "x x x x x x")])).collect()[0]
        assert out.dup_token_frac == pytest.approx(1 - 1 / 6)
        assert out.top_bigram_frac == 1.0 and out.dup_trigram_frac == 1.0


# --- block_dedup -------------------------------------------------------------


class TestBlockDedup:
    def test_shared_block_banned_everywhere(self, spark):
        from geowave_spark.operators.textclean import block_dedup

        shared = " ".join(f"s{i}" for i in range(4))
        docs = _docs(
            spark,
            [
                (1, f"{shared} a1 a2 a3 a4"),
                (2, f"{shared} b1 b2 b3 b4"),
                (3, "c1 c2 c3 c4 c5 c6 c7 c8"),
            ],
        )
        out = {r.doc_id: r for r in block_dedup(docs, block_tokens=4, max_doc_freq=1).collect()}
        assert out[1].clean_text == "a1 a2 a3 a4" and out[1].n_blocks_kept == 1
        assert out[2].clean_text == "b1 b2 b3 b4"
        assert out[3].clean_text == "c1 c2 c3 c4 c5 c6 c7 c8" and out[3].n_blocks_kept == 2
        assert out[1].n_blocks == 2

    def test_fully_banned_doc_goes_empty(self, spark):
        from geowave_spark.operators.textclean import block_dedup

        docs = _docs(spark, [(1, "p q r s"), (2, "p q r s")])
        out = {r.doc_id: r for r in block_dedup(docs, block_tokens=4, max_doc_freq=1).collect()}
        assert out[1].clean_text == "" and out[1].n_blocks_kept == 0 and out[1].n_blocks == 1

    def test_order_preserved_and_ragged_tail(self, spark):
        from geowave_spark.operators.textclean import block_dedup

        # 5 tokens at block 2 -> blocks: "t0 t1", "t2 t3", "t4"
        docs = _docs(spark, [(1, "t0 t1 t2 t3 t4")])
        out = block_dedup(docs, block_tokens=2, max_doc_freq=1).collect()[0]
        assert out.n_blocks == 3 and out.clean_text == "t0 t1 t2 t3 t4"

    def test_higher_threshold_keeps(self, spark):
        from geowave_spark.operators.textclean import block_dedup

        docs = _docs(spark, [(1, "p q"), (2, "p q")])
        out = block_dedup(docs, block_tokens=2, max_doc_freq=2).collect()
        assert all(r.clean_text == "p q" for r in out)

    def test_bad_block_size(self, spark):
        from geowave_spark.operators.textclean import block_dedup

        with pytest.raises(ValueError, match="block_tokens"):
            block_dedup(_docs(spark, [(1, "a")]), block_tokens=0)


# --- lm_quality_score ---------------------------------------------------------


class TestLmScore:
    def test_hand_computed_score(self, spark):
        import math

        from geowave_spark.operators.lm_score import _Q, lm_quality_score

        train = _docs(spark, [(1, "a b a b"), (2, "a c")])
        # train bigrams: (a,b)x2, (b,a)x1, (a,c)x1; ctx: a->3, b->1; V=3
        docs = _docs(spark, [(10, "a b c")])
        out = lm_quality_score(docs, train, top_k=10).collect()[0]
        terms = [
            math.floor(math.log((2 + 1) / (3 + 3)) * _Q),  # (a,b)
            math.floor(math.log((0 + 1) / (1 + 3)) * _Q),  # (b,c) unseen pair
        ]
        assert out.n_bigrams == 2
        assert out.sum_logp_q6 == sum(terms)
        assert out.avg_logp == pytest.approx((sum(terms) / _Q) / 2)

    def test_unseen_context_and_short_doc(self, spark):
        import math

        from geowave_spark.operators.lm_score import _Q, lm_quality_score

        train = _docs(spark, [(1, "a b")])  # V=2, ctx a->1
        docs = _docs(spark, [(10, "z q"), (11, "solo")])
        out = {r.doc_id: r for r in lm_quality_score(docs, train, top_k=10).collect()}
        assert out[10].sum_logp_q6 == math.floor(math.log(1 / 2) * _Q)
        assert out[11].n_bigrams == 0 and out[11].avg_logp == 0.0

    def test_cap_prunes_rare_bigrams(self, spark):
        from geowave_spark.operators.lm_score import bigram_lm_tables

        train = _docs(spark, [(1, "a b a b c d")])
        lm, ctx, vocab = bigram_lm_tables(train, top_k=1)
        rows = lm.collect()
        assert len(rows) == 1 and (rows[0]._w1, rows[0]._w2) == ("a", "b")
        # context totals stay uncapped
        assert {r._w1: r._c1 for r in ctx.collect()}["b"] == 2
        assert vocab == 4


# --- BPE ----------------------------------------------------------------------


def _ref_bpe(word_freqs, n_merges):
    """Reference greedy BPE on a word-frequency dict (pure Python)."""
    seqs = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        if n < 2:
            break
        merges.append((a, b, n))
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


class TestBpe:
    def test_pair_counts_hand(self, spark):
        from geowave_spark.operators.bpe import bpe_pair_counts

        # words: "abab" x1, "ab" x2 -> pairs: ab:(2+1+2)=... per-occurrence:
        # abab -> ab, ba, ab ; ab -> ab.  weighted: ab = 2*1 + 1*2 = 4, ba = 1
        docs = _docs(spark, [(1, "abab ab"), (2, "ab")])
        rows = bpe_pair_counts(docs, top_n=10).collect()
        got = {r.pair: (r.n, r.rank) for r in rows}
        assert got["ab"] == (4, 1) and got["ba"] == (1, 2)

    def test_train_matches_reference(self, spark):
        from geowave_spark.operators.bpe import bpe_train, word_type_counts

        text = "low lower lowest low low newer new news wider wide low newer"
        docs = _docs(spark, [(1, text), (2, text.upper().lower())])
        wf = {r.word: r.wf for r in word_type_counts(docs).collect()}
        expected = _ref_bpe(wf, 6)
        got = bpe_train(docs, 6)
        assert got == expected
        assert len(got) >= 3  # the corpus genuinely yields merges

    def test_merge_greedy_overlap(self, spark):
        from geowave_spark.operators.bpe import _merge_symbols

        df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
        out = df.select(_merge_symbols(F.col("syms"), "a", "a").alias("m")).collect()[0].m
        assert out == ["aa", "a"]

    def test_train_validates(self, spark):
        from geowave_spark.operators.bpe import bpe_train

        with pytest.raises(ValueError, match="n_merges"):
            bpe_train(_docs(spark, [(1, "a")]), 0)


# --- domain_mixture_sample ------------------------------------------------------


class TestDomainMixture:
    def _docs(self, spark):
        rows = [(i, f"t{i}", "big" if i < 90 else "small") for i in range(100)]
        return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")

    def test_rare_domain_passes_whole(self, spark):
        from geowave_spark.operators.sampling import domain_mixture_sample

        docs = self._docs(spark)
        kept = domain_mixture_sample(docs, "lang", c=4.0)
        by = {r[0]: r[1] for r in kept.groupBy("lang").count().collect()}
        assert by.get("small") == 10  # rate = min(1, 4/sqrt(10)) = 1
        # big domain downsampled toward 4*sqrt(90) ~ 38
        assert 0 < by["big"] < 90

    def test_deterministic_and_exact_rate(self, spark):
        from geowave_spark.operators.sampling import domain_mixture_sample

        docs = self._docs(spark)
        a = sorted(r.doc_id for r in domain_mixture_sample(docs, "lang", 4.0).collect())
        b = sorted(r.doc_id for r in domain_mixture_sample(docs, "lang", 4.0).collect())
        assert a == b
        rate = domain_mixture_sample(docs, "lang", 4.0).select("_rate").distinct().collect()
        assert {round(r._rate, 12) for r in rate} == {
            round(min(1.0, 4.0 / 90**0.5), 12),
            1.0,
        }

    def test_salt_rotates(self, spark):
        from geowave_spark.operators.sampling import domain_mixture_sample

        docs = self._docs(spark)
        a = {r.doc_id for r in domain_mixture_sample(docs, "lang", 4.0).collect()}
        b = {
            r.doc_id
            for r in domain_mixture_sample(docs, "lang", 4.0, salt="mixture-v2").collect()
        }
        assert a != b


class TestPiiRedact:
    def test_planted_pii_found_and_scrubbed(self, spark):
        """Each rule fires on its planted class; the redacted text contains
        no residual match of ANY rule (re-running the scrub is a no-op)."""
        from pyspark.sql import functions as F

        from geowave_spark.operators.pii import PII_RULES, pii_redact
        from geowave_spark.queries_text import _plant_pii

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        planted = docs.select(
            "doc_id", _plant_pii(F.col("doc_id"), F.col("text")).alias("text")
        )
        out = pii_redact(planted, "text").cache()
        agg = out.agg(
            *[F.sum(f"n_{k}").alias(k) for k, _, _ in PII_RULES]
        ).first()
        for kind, _, _ in PII_RULES:
            assert agg[kind] > 0, f"rule {kind} never fired on planted corpus"
        residual = out.select(
            *[
                F.sum(F.regexp_count("text_redacted", F.lit(pat))).alias(kind)
                for kind, pat, _ in PII_RULES
            ]
        ).first()
        assert all(residual[k] == 0 for k, _, _ in PII_RULES), residual
        out.unpersist()

    def test_counts_equal_replacements(self, spark):
        """n_<kind> is the exact number of substitutions: planted docs carry
        one finding each, unplanted (doc_id%5==4) carry zero."""
        from pyspark.sql import functions as F

        from geowave_spark.operators.pii import pii_redact
        from geowave_spark.queries_text import _plant_pii

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        planted = docs.select(
            "doc_id", _plant_pii(F.col("doc_id"), F.col("text")).alias("text")
        )
        out = pii_redact(planted, "text").withColumn(
            "total",
            F.col("n_email") + F.col("n_ssn") + F.col("n_phone") + F.col("n_ipv4"),
        )
        bad = out.filter(
            ((F.col("doc_id") % 5 == 4) & (F.col("total") != 0))
            | ((F.col("doc_id") % 5 != 4) & (F.col("total") != 1))
        ).count()
        assert bad == 0


class TestSubstringDupSpans:
    """Sliding k-gram duplicated-substring audit (Lee et al. 2022 style)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_cross_alignment_duplicate_found(self, spark):
        from geowave_spark.operators.textclean import substring_dup_spans

        shared = " ".join(f"s{i}" for i in range(6))  # 6-token passage
        docs = self._docs(
            spark,
            [
                (1, "a b c " + shared + " x y"),  # passage at offset 3
                (2, shared + " p q r"),  # passage at offset 0
                (3, "u v w only unique tokens here"),
            ],
        )
        out = {r.doc_id: r for r in substring_dup_spans(docs, k=4).collect()}
        # windows of the shared passage: positions 3..5 in doc1, 0..2 in
        # doc2 -> merged single span of 6 tokens in each
        assert (out[1].n_spans, out[1].dup_tokens) == (1, 6)
        assert (out[2].n_spans, out[2].dup_tokens) == (1, 6)
        assert (out[3].n_spans, out[3].dup_tokens) == (0, 0)

    def test_within_doc_repeat_counts(self, spark):
        from geowave_spark.operators.textclean import substring_dup_spans

        rep = " ".join(f"r{i}" for i in range(4))
        docs = self._docs(spark, [(1, rep + " gap1 gap2 gap3 " + rep)])
        out = substring_dup_spans(docs, k=4).collect()[0]
        # the 4-token phrase occurs twice within one doc -> two disjoint
        # spans of 4 tokens each
        assert (out.n_spans, out.dup_tokens) == (2, 8)

    def test_adjacent_windows_merge(self, spark):
        from geowave_spark.operators.textclean import substring_dup_spans

        long = " ".join(f"t{i}" for i in range(10))
        docs = self._docs(spark, [(1, long), (2, long)])
        out = {r.doc_id: r for r in substring_dup_spans(docs, k=4).collect()}
        # every window duplicates -> one maximal span covering all 10 tokens
        assert (out[1].n_spans, out[1].dup_tokens) == (1, 10)

    def test_validation(self, spark):
        import pytest as _pt

        from geowave_spark.operators.textclean import substring_dup_spans

        docs = self._docs(spark, [(1, "a b")])
        with _pt.raises(ValueError):
            substring_dup_spans(docs, k=1)
        with _pt.raises(ValueError):
            substring_dup_spans(docs, k=4, min_count=1)
