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


class TestHttpApi:
    """The HTTP surface (serving/api.py) — the reference's Haystack REST
    API slot, stdlib-only.  One server per class, ephemeral port."""

    @pytest.fixture(scope="class")
    def server(self, spark, sf_dir):
        import threading

        from document_automation_spark.serving.api import make_server

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
        srv = make_server(spark, docs, port=0)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        yield srv
        srv.shutdown()
        srv.retrieval_state.unpersist()

    @staticmethod
    def _post(server, payload, path="/query"):
        import json
        import urllib.error
        import urllib.request

        url = f"http://127.0.0.1:{server.server_address[1]}{path}"
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(), method="POST",
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as err:
            return err.code, json.loads(err.read())

    def test_health(self, server):
        import json
        import urllib.request

        url = f"http://127.0.0.1:{server.server_address[1]}/health"
        with urllib.request.urlopen(url, timeout=60) as resp:
            body = json.loads(resp.read())
        assert resp.status == 200 and body == {"status": "ok", "n_docs": 80}

    def test_query_self_retrieval(self, server, spark, sf_dir):
        row = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") == 41).first()
        )
        probe = " ".join(row.text.lower().split()[2:14])
        status, body = self._post(
            server, {"query": probe, "method": "bm25", "top_k": 5}
        )
        assert status == 200
        assert body["documents"][0]["doc_id"] == 41
        assert body["documents"][0]["rank"] == 1
        assert body["documents"][0]["text"] == row.text
        ranks = [d["rank"] for d in body["documents"]]
        assert ranks == sorted(ranks)

    def test_query_matches_retrieve_plan(self, server, spark, sf_dir):
        from document_automation_spark.serving.retrieval import retrieve

        status, body = self._post(
            server,
            {"query": "spark table scan", "method": "ensemble", "top_k": 7,
             "include_text": False},
        )
        assert status == 200
        direct = retrieve(
            spark, server.retrieval_state, "spark table scan", "ensemble", k=7
        ).collect()
        expected = {r.doc_id: (r.score, r.rank) for r in direct}
        got = {d["doc_id"]: (d["score"], d["rank"]) for d in body["documents"]}
        assert got == expected

    def test_errors_are_4xx_not_crashes(self, server):
        assert self._post(server, {"query": "x", "method": "faiss"})[0] == 400
        assert self._post(server, {"method": "bm25"})[0] == 400
        assert self._post(server, {"query": "x", "top_k": 0})[0] == 400
        assert self._post(server, {"query": "x"}, path="/nope")[0] == 404
        # server still alive after the 4xx storm
        assert self._post(server, {"query": "still works", "top_k": 1})[0] == 200
