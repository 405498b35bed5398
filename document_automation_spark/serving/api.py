"""Query-serving HTTP API — the reference's Haystack REST API, engine-side.

The reference serves retrieval over HTTP (scripts/run_haystack_api.sh →
Haystack's rest_api, queried by launch_query_retrieval_ui_pipeline.sh's
Streamlit UI).  This is the same surface on the Spark engine with ZERO new
dependencies: a stdlib ``ThreadingHTTPServer`` in front of
``serving.retrieval`` — the corpus-side state (persisted docs, embeddings,
BM25 postings) is built once at startup, each request is one Spark plan.

Endpoints (Haystack-rest_api-shaped):

* ``GET  /health``                → ``{"status": "ok", "n_docs": N}``
* ``POST /query`` with JSON body
  ``{"query": str, "method": "bm25"|"embedding"|"ensemble",
    "top_k": int, "rerank": bool, "include_text": bool}``
  → ``{"query": ..., "method": ..., "documents": [
        {"doc_id", "score", "rank", "text"?}, ...]}``

Malformed JSON / unknown method / missing query → 400 with an ``error``
body; anything else unexpected → 500 (logged, never a crash).

Scale note: one Spark session serves all requests (Spark jobs are
thread-safe to submit concurrently; the threaded server just overlaps
scheduling).  At production scale this process sits behind a normal HTTP
load balancer with one session per replica — corpus state is read-only.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from document_automation_spark.serving.retrieval import (
    RetrievalState,
    build_retrieval_state,
    retrieve,
)

_METHODS = ("bm25", "embedding", "ensemble")


def _make_handler(spark: SparkSession, state: RetrievalState, n_docs: int):
    texts: Optional[DataFrame] = state.documents  # (doc_id, text), persisted

    class Handler(BaseHTTPRequestHandler):
        server_version = "document-automation-spark/3"

        def log_message(self, fmt, *args):  # quiet by default; tests assert bodies
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib naming)
            if self.path.rstrip("/") in ("", "/health"):
                self._reply(200, {"status": "ok", "n_docs": n_docs})
            else:
                self._reply(404, {"error": f"unknown path {self.path!r}"})

        def do_POST(self):  # noqa: N802
            if self.path.rstrip("/") != "/query":
                self._reply(404, {"error": f"unknown path {self.path!r}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, json.JSONDecodeError) as err:
                self._reply(400, {"error": f"bad JSON body: {err}"})
                return
            query = req.get("query")
            method = req.get("method", "ensemble")
            top_k = req.get("top_k", 10)
            if not isinstance(query, str) or not query.strip():
                self._reply(400, {"error": "'query' must be a non-empty string"})
                return
            if method not in _METHODS:
                self._reply(400, {"error": f"method must be one of {_METHODS}"})
                return
            if (
                not isinstance(top_k, int)
                or isinstance(top_k, bool)  # JSON true/false are ints in Python
                or not (1 <= top_k <= 1000)
            ):
                self._reply(400, {"error": "'top_k' must be an int in [1, 1000]"})
                return
            try:
                out = retrieve(
                    spark,
                    state,
                    query,
                    method=method,
                    k=top_k,
                    rerank=bool(req.get("rerank", False)),
                )
                if req.get("include_text", True):
                    # k-row result side broadcast: attaching texts must
                    # never shuffle the whole corpus per request
                    from pyspark.sql import functions as F

                    out = texts.join(F.broadcast(out), "doc_id")
                rows = sorted(out.collect(), key=lambda r: r.rank)
                docs = [
                    {
                        "doc_id": r.doc_id,
                        "score": r.score,
                        "rank": r.rank,
                        **({"text": r.text} if hasattr(r, "text") else {}),
                    }
                    for r in rows
                ]
                self._reply(200, {"query": query, "method": method, "documents": docs})
            except Exception as err:  # noqa: BLE001 — a query must never kill the server
                self._reply(500, {"error": f"{type(err).__name__}: {err}"})

    return Handler


def make_server(
    spark: SparkSession,
    documents: DataFrame,
    host: str = "127.0.0.1",
    port: int = 8000,
) -> ThreadingHTTPServer:
    """Build corpus state and return a ready (not yet serving) HTTP server.

    ``port=0`` binds an ephemeral port (tests); call ``serve_forever()``
    (or ``handle_request()``) on the returned server, and ``shutdown()`` +
    unpersist the state when done (the server object carries the state as
    ``server.retrieval_state`` for that purpose)."""
    state = build_retrieval_state(documents)
    try:
        n_docs = state.documents.count()  # also materializes the persisted state
        server = ThreadingHTTPServer((host, port), _make_handler(spark, state, n_docs))
    except Exception:
        # bind failure (port in use) etc. must not leak three persisted
        # tables into the long-lived session with no handle to drop them
        state.unpersist()
        raise
    server.retrieval_state = state  # type: ignore[attr-defined]
    return server
