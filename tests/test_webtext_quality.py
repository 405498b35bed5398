"""Webtext curation quality: Gopher/C4 repetition features and CCNet-style
bigram-LM perplexity, checked against hand-computed values."""

from __future__ import annotations

import contextlib
import io
import math

import pytest
from pyspark.sql import functions as F

from document_automation_spark.operators.webtext_quality import (
    repetition_features,
    score_with_bigram_lm,
    train_bigram_lm,
)

DOC_A = (
    "the cat sat\nthe cat sat\n- bullet line\nends with...\n"
    "the cat sat on the mat # tag"
)
DOC_B = "a b c d e f g a b c d e f g"


@pytest.fixture(scope="module")
def feats(spark):
    df = spark.createDataFrame(
        [(1, DOC_A), (2, DOC_B), (3, ""), (4, "single")],
        "doc_id long, text string",
    )
    return {r.doc_id: r for r in repetition_features(df).collect()}


class TestRepetitionFeatures:
    def test_duplicate_lines_hand_computed(self, feats):
        # DOC_A: 5 non-empty lines, 'the cat sat' twice -> 1 dup of 5;
        # dup chars 2*11=22 of 75 total line chars
        r = feats[1]
        assert r.n_lines == 5
        assert r.dup_line_frac == pytest.approx(1 / 5)
        assert r.dup_line_char_frac == pytest.approx(round(22 / 75, 6))

    def test_top_bigram_cover_hand_computed(self, feats):
        # 'the cat' x3 (len 7) covers 21 of 79 text chars — ties with
        # 'cat sat' x3 at the same cover, max unaffected
        assert feats[1].top_bigram_char_frac == pytest.approx(round(21 / 79, 6))

    def test_dup_5gram_positions(self, feats):
        # DOC_B: 10 5-gram positions, the first 3 repeat at 8..10 -> 6/10
        assert feats[2].dup_5gram_frac == pytest.approx(0.6)
        assert feats[1].dup_5gram_frac == 0.0

    def test_c4_line_heuristics(self, feats):
        r = feats[1]
        assert r.ellipsis_line_frac == pytest.approx(1 / 5)
        assert r.bullet_line_frac == pytest.approx(1 / 5)
        # one '#' + one '...' over 19 words
        assert r.symbol_word_ratio == pytest.approx(round(2 / 19, 6))

    def test_degenerate_docs_all_zero(self, feats):
        for doc_id in (3, 4):
            r = feats[doc_id]
            assert r.dup_line_frac == 0.0
            assert r.dup_line_char_frac == 0.0
            assert r.top_bigram_char_frac == 0.0
            assert r.dup_5gram_frac == 0.0
        assert feats[3].n_lines == 0
        assert feats[4].n_lines == 1

    def test_all_duplicate_lines(self, spark):
        df = spark.createDataFrame([(1, "x y\nx y\nx y")], "doc_id long, text string")
        r = repetition_features(df).collect()[0]
        assert r.dup_line_frac == pytest.approx(round(2 / 3, 6))
        assert r.dup_line_char_frac == 1.0

    def test_zero_shuffle_plan(self, spark):
        """The whole feature block must fuse into the scan — no Exchange."""
        df = spark.createDataFrame([(1, DOC_A)], "doc_id long, text string")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            repetition_features(df).explain("formatted")
        assert "Exchange" not in buf.getvalue()


class TestBigramLM:
    @pytest.fixture(scope="class")
    def lm(self, spark):
        train = spark.createDataFrame(
            [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
        )
        return train_bigram_lm(train)

    def test_counts(self, lm):
        assert lm.total_tokens == 6
        uni = {r.w: r.uc for r in lm.unigrams.collect()}
        assert uni == {"a": 3, "b": 2, "c": 1}
        bi = {(r.pw, r.w): r.bc for r in lm.bigrams.collect()}
        assert bi == {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1}

    def test_scores_hand_computed(self, spark, lm):
        docs = spark.createDataFrame(
            [(10, "a b x"), (11, "c a")], "doc_id long, text string"
        )
        got = {r.doc_id: r for r in score_with_bigram_lm(docs, lm).collect()}
        # doc 10: P(b|a)=2/3 seen; ('b','x') backs off to unseen unigram
        # -> 0.4*0.4/6
        lp = (math.log(2 / 3) + math.log(0.4 * 0.4 / 6)) / 2
        assert got[10].n_bigrams == 2
        assert got[10].avg_logprob == pytest.approx(lp, abs=1e-5)
        assert got[10].ppl == pytest.approx(math.exp(-lp), abs=1e-3)
        # doc 11: bigram ('c','a') unseen, unigram 'a' seen -> 0.4*3/6
        assert got[11].avg_logprob == pytest.approx(math.log(0.4 * 3 / 6), abs=1e-5)

    def test_broadcast_off_matches(self, spark, lm):
        docs = spark.createDataFrame(
            [(10, "a b x"), (11, "c a"), (12, "a b a b a")],
            "doc_id long, text string",
        )
        on = sorted(map(tuple, score_with_bigram_lm(docs, lm).collect()))
        off = sorted(
            map(tuple, score_with_bigram_lm(docs, lm, broadcast_lm=False).collect())
        )
        assert on == off

    def test_min_count_prunes(self, spark):
        train = spark.createDataFrame(
            [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
        )
        lm = train_bigram_lm(train, min_count=2)
        assert {r.w for r in lm.unigrams.collect()} == {"a", "b"}
        assert {(r.pw, r.w) for r in lm.bigrams.collect()} == {("a", "b")}
        # total is counted BEFORE pruning (the normalizer is the corpus)
        assert lm.total_tokens == 6

    def test_docs_without_bigrams_excluded(self, spark, lm):
        docs = spark.createDataFrame(
            [(20, "a"), (21, ""), (22, "a b")], "doc_id long, text string"
        )
        got = {r.doc_id for r in score_with_bigram_lm(docs, lm).collect()}
        assert got == {22}
