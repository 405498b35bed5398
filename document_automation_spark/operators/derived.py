"""Deterministic derived fixtures shared by Spark queries and DuckDB oracles.

The driver's correctness gate (CORRECTNESS_r{N}.json) runs each Spark query
AND its oracle SQL on the same parquet tables.  The fusion/metric operators
need a retriever-scores fixture (FIXTURES.md §4) that does not exist as a
parquet file — so it is DERIVED deterministically from the ``documents``
table with pure integer arithmetic that both engines evaluate identically:

* retriever membership:  (doc_id·a) % 10 < 7      (~70% of docs per side,
  overlapping but non-identical sets → exercises full-outer fusion)
* integer score numerator: (doc_id·m + c) % 1000003
* query assignment: doc_id % 20 ; image grouping: doc_id % 97

Everything stays in int64 (no doubles) until the final projection, so
cluster/oracle results are bit-exact.  ``SCORES_SQL`` is the single source
of truth for the constants; the Spark builder mirrors it 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_QUERIES = 20
N_IMAGES = 97
SCORE_DEN = 1_000_003

# DuckDB/ANSI CTE body — prepend as  WITH scores AS (...), gold AS (...)
SCORES_SQL = f"""
    SELECT doc_id % {N_QUERIES} AS query_id, 'bm25' AS retriever, doc_id,
           doc_id % {N_IMAGES} AS image_id,
           (doc_id * 2654435761) % {SCORE_DEN} AS score_num
    FROM documents WHERE (doc_id * 48271) % 10 < 7
    UNION ALL
    SELECT doc_id % {N_QUERIES} AS query_id, 'dpr' AS retriever, doc_id,
           doc_id % {N_IMAGES} AS image_id,
           (doc_id * 1103515245 + 12345) % {SCORE_DEN} AS score_num
    FROM documents WHERE (doc_id * 69621 + 7) % 10 < 7
"""

GOLD_SQL = f"""
    SELECT CAST(q AS BIGINT) AS query_id,
           CAST((q * 31 + 5) % {N_IMAGES} AS BIGINT) AS gold_image_id
    FROM (SELECT unnest(generate_series(0, {N_QUERIES - 1})) AS q)
"""

# Spark SQL needs explode(sequence(...)) instead of unnest(generate_series).
GOLD_SQL_SPARK = f"""
    SELECT CAST(q AS BIGINT) AS query_id,
           CAST((q * 31 + 5) % {N_IMAGES} AS BIGINT) AS gold_image_id
    FROM (SELECT explode(sequence(0, {N_QUERIES - 1})) AS q)
"""


def derived_scores(documents: DataFrame) -> DataFrame:
    """Spark mirror of ``SCORES_SQL`` over the documents DataFrame."""
    d = documents.select("doc_id")
    bm25 = d.filter((F.col("doc_id") * 48271) % 10 < 7).select(
        (F.col("doc_id") % N_QUERIES).alias("query_id"),
        F.lit("bm25").alias("retriever"),
        "doc_id",
        (F.col("doc_id") % N_IMAGES).alias("image_id"),
        ((F.col("doc_id") * 2654435761) % SCORE_DEN).alias("score_num"),
    )
    dpr = d.filter((F.col("doc_id") * 69621 + 7) % 10 < 7).select(
        (F.col("doc_id") % N_QUERIES).alias("query_id"),
        F.lit("dpr").alias("retriever"),
        "doc_id",
        (F.col("doc_id") % N_IMAGES).alias("image_id"),
        ((F.col("doc_id") * 1103515245 + 12345) % SCORE_DEN).alias("score_num"),
    )
    return bm25.unionByName(dpr)


def gold_labels(spark) -> DataFrame:
    """Per-query gold image ids (tiny dimension — always broadcastable)."""
    return spark.sql(GOLD_SQL_SPARK)
