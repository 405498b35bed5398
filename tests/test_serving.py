"""Query-serving path (serving/retrieval.py) — the Haystack-API analogue."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_automation_spark.serving.retrieval import build_retrieval_state, retrieve


@pytest.fixture(scope="module")
def state(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_retrieval_state(docs)


@pytest.fixture(scope="module")
def probe(spark, sf_dir):
    """A 12-word slice of a real document — long enough to be BM25-unique
    on the templated corpus (6 words is not; 16-dim hash embeddings are
    deliberately weak discriminators, so dense-leg rank-1 is NOT asserted)."""
    row = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") == 41)
        .select("doc_id", "text")
        .first()
    )
    return row.doc_id, " ".join(row.text.lower().split()[2:14])


class TestRetrieve:
    @pytest.mark.parametrize("method", ["bm25", "embedding", "ensemble"])
    def test_wellformed_topk(self, spark, state, probe, method):
        _, qtext = probe
        hits = retrieve(spark, state, qtext, method=method, k=5).collect()
        assert sorted(r.rank for r in hits) == [1, 2, 3, 4, 5]
        by_rank = [r.score for r in sorted(hits, key=lambda r: r.rank)]
        assert by_rank == sorted(by_rank, reverse=True)

    def test_bm25_self_query_ranks_first(self, spark, state, probe):
        gold_id, qtext = probe
        hits = retrieve(spark, state, qtext, method="bm25", k=5).collect()
        assert next(r for r in hits if r.rank == 1).doc_id == gold_id

    def test_rerank_path(self, spark, state, probe):
        gold_id, qtext = probe
        hits = retrieve(spark, state, qtext, method="bm25", k=5, rerank=True).collect()
        assert len(hits) == 5
        best = min(hits, key=lambda r: r.rank)
        # every query token matches gold perfectly → maximal MaxSim, and
        # the lowest-id tie-break keeps doc 41 on top deterministically
        assert best.doc_id == gold_id
        assert best.score == pytest.approx(12.0)

    def test_unknown_method_raises(self, spark, state):
        with pytest.raises(ValueError, match="unknown method"):
            retrieve(spark, state, "q", method="faiss")

    def test_ensemble_is_weighted_sum_of_legs(self, spark, state, probe):
        """ensemble score == bm25 + 1.5·cos, verified on the overlap set."""
        _, qtext = probe
        bm25 = {r.doc_id: r.score
                for r in retrieve(spark, state, qtext, "bm25", k=10_000).collect()}
        ens = {r.doc_id: r.score for r in retrieve(spark, state, qtext, "ensemble", k=10).collect()}
        cos = {r.doc_id: r.score
               for r in retrieve(spark, state, qtext, "embedding", k=500).collect()}
        for doc_id, score in ens.items():
            expected = bm25.get(doc_id, 0.0) + 1.5 * cos.get(doc_id, 0.0)
            assert score == pytest.approx(expected, abs=1e-9)


class TestStateLifecycle:
    """Round-3 advice: cached state must be releasable (no silent leaks)."""

    def test_bm25_index_context_manager_unpersists(self, spark, sf_dir):
        from document_automation_spark.operators.bm25 import build_bm25_index

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
        with build_bm25_index(docs) as index:
            index.tf.count()
            assert index.tf.storageLevel.useMemory or index.tf.storageLevel.useDisk
        assert not (index.tf.storageLevel.useMemory or index.tf.storageLevel.useDisk)

    def test_retrieval_state_context_manager_unpersists(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
        with build_retrieval_state(docs) as st:
            st.documents.count()
        for df in (st.documents, st.embedded, st.bm25.tf):
            assert not (df.storageLevel.useMemory or df.storageLevel.useDisk)
