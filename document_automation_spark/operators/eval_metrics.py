"""Retrieval evaluation operators: hit/rank, recall@k, MRR (SURVEY.md §2.5).

Parity targets:
* hit + 1-based rank vs gold, miss sentinel rank = 20000 —
  /root/reference/src/test_retrieval_pipeline.py:117-131 (sentinel at :121)
* recall@k = hits/num_queries — :163-164
* MRR = mean(1/rank) where misses contribute 1/20000 (NOT 0) — :166-169

The sentinel is reproduced exactly: it is a quirk (a miss still adds
1/20000 to the MRR numerator) and "fixing" it would break parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MISS_RANK_SENTINEL = 20000


def hits_and_ranks(ranked: DataFrame, gold: DataFrame, topk: int) -> DataFrame:
    """Join per-query ranked images against gold labels.

    ``ranked``: (query_id, image_id, img_rank) with img_rank 1-based;
    ``gold``:   (query_id, gold_image_id).
    Returns one row per query: (query_id, hit:int, rank:long) where rank is
    the gold image's 1-based rank within the top-k, or 20000 on a miss.

    The gold side is a per-query dimension — tiny next to the ranked fact
    table — so it is broadcast to avoid shuffling the big side.
    """
    matches = (
        ranked.filter(F.col("img_rank") <= topk)
        .join(
            F.broadcast(gold),
            (ranked["query_id"] == gold["query_id"])
            & (ranked["image_id"] == gold["gold_image_id"]),
            "inner",
        )
        .select(gold["query_id"].alias("query_id"), F.col("img_rank").alias("found_rank"))
        .groupBy("query_id")
        .agg(F.min("found_rank").alias("found_rank"))
    )
    return (
        gold.select("query_id")
        .join(matches, "query_id", "left")
        .select(
            "query_id",
            F.when(F.col("found_rank").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("hit"),
            F.coalesce(F.col("found_rank"), F.lit(MISS_RANK_SENTINEL))
            .cast("long")
            .alias("rank"),
        )
    )


def recall_and_mrr(hits: DataFrame) -> DataFrame:
    """(hit, rank) rows → single-row (recall, mrr) with the 20000 sentinel
    baked into ``rank`` upstream.  Rounded to 9 dp so double summation
    order (cluster vs oracle) cannot flip the comparison.
    """
    return hits.agg(
        F.round(F.avg(F.col("hit").cast("double")), 9).alias("recall"),
        F.round(F.avg(F.lit(1.0) / F.col("rank")), 9).alias("mrr"),
        F.count(F.lit(1)).alias("num_queries"),
    )
