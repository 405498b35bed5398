"""Query-serving path: ad-hoc retrieval over the documents table.

The reference serves queries through a Haystack REST API in front of
Elasticsearch + FAISS (+ optional MaxSim reranker) —
/root/reference/scripts/run_haystack_api.sh and the pipeline YAMLs it
templates (`pipelines_{bm25,embedding,ensemble}.haystack-pipeline.yml`).
This module is the engine-side equivalent: the same three retrieval
methods as ONE composed DataFrame plan each, so "online" queries are just
small batch jobs against the governed tables — no extra serving
infrastructure to keep consistent with the offline pipeline.

Scale shape: the corpus legs reuse the batch operators (BM25 postings,
hashing embedder) unchanged; the query side is a tiny broadcast.  For a
true low-latency deployment you would persist the postings/embeddings
tables once and reuse them across calls — `build_retrieval_state` does
exactly that, so repeated queries pay only the broadcast-join cost.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from document_automation_spark.functions.embed import embed_documents
from document_automation_spark.operators.bm25 import (
    Bm25Index,
    bm25_scores_from_index,
    build_bm25_index,
)
from document_automation_spark.operators.rerank import maxsim_rerank
from document_automation_spark.operators.similarity import cosine_col

DENSE_WEIGHT = 1.5  # reference ensemble weight (scripts/run_retrieval_eval.sh)


@dataclass
class RetrievalState:
    """Reusable corpus-side state (persist once, query many times).

    Holding the BM25 index here (not rebuilding per query) is what makes
    ``retrieve`` leak-free: repeated calls add ZERO cached state.  The
    state pins three cached tables (documents, embeddings, BM25 postings)
    for its whole lifetime — call :meth:`unpersist` (or use the state as a
    context manager) when retiring it; one-shot ``bm25_scores`` calls that
    bypass this state leave their per-call index persisted (see the NOTE
    on operators.bm25.bm25_scores)."""

    documents: DataFrame  # (doc_id, text)
    embedded: DataFrame  # (doc_id, embedding)
    bm25: Bm25Index

    def unpersist(self) -> None:
        self.documents.unpersist()
        self.embedded.unpersist()
        self.bm25.unpersist()

    def __enter__(self) -> "RetrievalState":
        return self

    def __exit__(self, *exc) -> None:
        self.unpersist()


def build_retrieval_state(documents: DataFrame) -> RetrievalState:
    docs = documents.select("doc_id", "text").persist()
    emb = embed_documents(docs).persist()
    return RetrievalState(documents=docs, embedded=emb, bm25=build_bm25_index(docs))


def _query_df(spark: SparkSession, query_text: str) -> DataFrame:
    return spark.createDataFrame([(0, query_text)], "query_id long, query_text string")


def _query_terms(queries: DataFrame) -> DataFrame:
    return (
        queries.select(
            "query_id",
            F.explode(F.split(F.lower(F.trim("query_text")), r"\s+")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )


def retrieve(
    spark: SparkSession,
    state: RetrievalState,
    query_text: str,
    method: str = "ensemble",
    k: int = 10,
    rerank: bool = False,
) -> DataFrame:
    """Top-k (doc_id, score, rank) for one ad-hoc query.

    ``method``: 'bm25' | 'embedding' | 'ensemble' — the three pipeline
    YAMLs of the reference API, as plans.  ``rerank=True`` adds the MaxSim
    late-interaction pass over the candidates (the reference's optional
    ranker stage).
    """
    queries = _query_df(spark, query_text)

    sparse: Optional[DataFrame] = None
    dense: Optional[DataFrame] = None
    if method in ("bm25", "ensemble"):
        sparse = bm25_scores_from_index(state.bm25, _query_terms(queries))
    if method in ("embedding", "ensemble"):
        q_emb = embed_documents(
            queries.select(F.col("query_id").alias("doc_id"), F.col("query_text").alias("text"))
        ).select(F.col("doc_id").alias("query_id"), F.col("embedding").alias("q_embedding"))
        dense = state.embedded.crossJoin(F.broadcast(q_emb)).select(
            "query_id",
            "doc_id",
            cosine_col(F.col("q_embedding"), F.col("embedding")).alias("cos"),
        )

    if method == "bm25":
        scored = sparse.select("query_id", "doc_id", F.col("bm25").alias("score"))
    elif method == "embedding":
        scored = dense.select("query_id", "doc_id", F.col("cos").alias("score"))
    elif method == "ensemble":
        scored = sparse.join(dense, ["query_id", "doc_id"], "full_outer").select(
            "query_id",
            "doc_id",
            (
                F.coalesce("bm25", F.lit(0.0)) + DENSE_WEIGHT * F.coalesce("cos", F.lit(0.0))
            ).alias("score"),
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", F.col("rank").cast("long").alias("rank"))
    )
    if not rerank:
        return topk.drop("query_id")

    candidates = (
        topk.join(F.broadcast(queries), "query_id")
        .join(state.documents.select("doc_id", F.col("text").alias("doc_text")), "doc_id")
    )
    return maxsim_rerank(candidates, k=k).select(
        "doc_id", F.col("maxsim").alias("score"), "rank"
    )
