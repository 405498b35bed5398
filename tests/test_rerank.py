"""MaxSim reranker vs pure-Python oracle."""

from __future__ import annotations

import pytest

from document_automation_spark.operators.rerank import maxsim_rerank, maxsim_score, token_matrix


def test_token_matrix_shapes():
    m = token_matrix("three token text")
    assert m.shape == (3, 16)
    assert token_matrix("").shape == (1, 16)


def test_maxsim_self_similarity_highest():
    base = "spark distributed query engine optimizer"
    near = "spark distributed query engine planner"
    far = "bananas oranges apples pears kiwi"
    assert maxsim_score(base, base) > maxsim_score(base, near) > maxsim_score(base, far)


def test_maxsim_rerank_matches_kernel(spark):
    rows = [
        (0, "spark query engine", 1, "the spark query engine is fast and distributed"),
        (0, "spark query engine", 2, "cooking recipes for pasta and pizza at home"),
        (0, "spark query engine", 3, "query planning in a distributed spark engine"),
        (1, "pasta recipe", 2, "cooking recipes for pasta and pizza at home"),
        (1, "pasta recipe", 1, "the spark query engine is fast and distributed"),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, query_text string, doc_id long, doc_text string"
    )
    got = {(r.query_id, r.doc_id): (r.maxsim, r.rank) for r in maxsim_rerank(df, k=3).collect()}
    for qid, qtext, did, dtext in rows:
        expected = maxsim_score(qtext, dtext)
        assert got[(qid, did)][0] == pytest.approx(expected, abs=1e-6)
    # relevant docs outrank the off-topic one (query 0 has 3 exact token
    # matches; query 1's single-token overlap is not separable at dim 16
    # hashing, so only the exact score equality is asserted there)
    assert got[(0, 1)][1] < got[(0, 2)][1]
    assert got[(0, 3)][1] < got[(0, 2)][1]
