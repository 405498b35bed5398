"""Driver-contract query registry: Spark callables + DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 gets a named entry here; the
driver runs the Spark callable and the oracle SQL side-by-side at sf=0.01
and compares row-count + schema + order-insensitive value hash
(CORRECTNESS_r{N}.json).  Conventions that make the comparison exact:

* integer arithmetic until the final projection wherever possible
  (bit-exact regardless of aggregation order — see operators/derived.py);
* double outputs rounded (6-9 dp) in BOTH engines so summation order can
  never flip the hash;
* all integer outputs cast to BIGINT on both sides (DuckDB's SUM/HUGEINT
  and Spark's int32 row_numbers would otherwise mismatch schemas);
* session timezone pinned to UTC inside every callable (DuckDB timestamps
  are UTC-naive);
* ranking windows order by ROUNDED values with explicit id tie-breaks, so
  near-equal doubles rank identically in both engines.

Python-kernel operators with no SQL equivalent (MinHash/SimHash signatures,
HTML extraction, model-style embedding) register WITHOUT an oracle → the
driver records the weaker rows-only check; their strong checks are the
pytest oracles (same kernel, byte-compare).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from document_automation_spark.operators.derived import (
    GOLD_SQL,
    SCORES_SQL,
    derived_scores,
    gold_labels,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# registry: name -> (spark_fn, oracle_sql | None | () -> oracle_sql | None).
# A CALLABLE oracle is resolved lazily on the first oracle_sql() call (and
# cached): the pinned-golden oracles (document_automation_spark/golden.py)
# run a pure kernel / read a parquet fixture to build their VALUES table,
# and that work shouldn't tax sessions that never read oracles (bench).
_REGISTRY: Dict[str, Tuple[QueryFn, object]] = {}


def register(name: str, oracle):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def queries() -> Dict[str, QueryFn]:
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> Dict[str, str]:
    out: Dict[str, str] = {}
    for name, (fn, sql) in _REGISTRY.items():
        if callable(sql):
            sql = sql()
            _REGISTRY[name] = (fn, sql)  # cache the resolved SQL (or None)
        if sql is not None:
            out[name] = sql
    return out


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =====================================================================
# Relational core (TPC-H-ish breadth)
# =====================================================================

@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_automation_spark.operators.relational import pricing_summary

    return pricing_summary(_t(spark, sf_dir, "lineitem"))


@register(
    "customer_order_semi_anti",
    """
    WITH revenue AS (
        SELECT o_custkey,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS num_orders
        FROM orders GROUP BY o_custkey
    )
    SELECT 'semi' AS relation, c_custkey, c_name,
           CAST(NULL AS VARCHAR) AS c_mktsegment,
           CAST(NULL AS DOUBLE) AS revenue, CAST(NULL AS BIGINT) AS num_orders
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    UNION ALL
    SELECT 'anti', c_custkey, c_name, NULL, NULL, NULL FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'topk', c_custkey, c_name, c_mktsegment, revenue, num_orders
    FROM (
        SELECT c_custkey, c_name, c_mktsegment, revenue, num_orders
        FROM revenue JOIN customer ON o_custkey = c_custkey
        ORDER BY revenue DESC, c_custkey LIMIT 10
    )
    """,
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join (F8: customers with open orders), anti-join (F10/J8:
    customers with no orders), and revenue top-k (T4, top_customers —
    folded here round 5 session 5, slot freed for dsir_selection) in
    one tagged union — all three relational operators from
    operators/relational.py, one registry slot."""
    from document_automation_spark.operators.relational import (
        customers_with_open_orders,
        customers_without_orders,
        top_customers_by_revenue,
    )

    cust, orders = _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    null_str = F.lit(None).cast("string")
    null_dbl = F.lit(None).cast("double")
    null_lng = F.lit(None).cast("long")
    semi = customers_with_open_orders(cust, orders).select(
        F.lit("semi").alias("relation"), "c_custkey", "c_name",
        null_str.alias("c_mktsegment"), null_dbl.alias("revenue"),
        null_lng.alias("num_orders"),
    )
    anti = customers_without_orders(cust, orders).select(
        F.lit("anti").alias("relation"), "c_custkey", "c_name",
        null_str.alias("c_mktsegment"), null_dbl.alias("revenue"),
        null_lng.alias("num_orders"),
    )
    topk = top_customers_by_revenue(orders, cust, k=10).select(
        F.lit("topk").alias("relation"), "c_custkey", "c_name",
        "c_mktsegment", "revenue", "num_orders",
    )
    return semi.unionAll(anti).unionAll(topk)


# (max_value_per_user no longer has its own registry seat: the per-user
# MAX/COUNT aggregation rides the sessionize_events seat as joined
# user_max_value / user_num_events columns — lossless, every value still
# hash-checked — slot freed for paragraph_dedup under the driver's
# 50-entry cap.  The operator relational.max_value_per_user is unchanged.)


# (distinct_sources no longer has its own registry entry: the DISTINCT
# check rides inside salted_event_type_stats — seat freed for ivf_topk
# under the driver's 50-entry report cap; the operator
# relational.distinct_sources remains available.)


# (hourly_event_rollup no longer has its own registry seat: the hourly
# rollup rides the salted_event_type_stats seat as kind='hourly' tagged-
# union rows — the operator runs in full and every (hour, type, count,
# sum) value stays hash-checked — slot freed for anchor_text_terms under
# the driver's 50-entry cap.  relational.hourly_event_rollup is unchanged
# and bench.py keeps its bare row.)


@register(
    "top_events_per_type",
    """
    SELECT event_type, event_id, ROUND(value, 6) AS value, rank FROM (
        SELECT event_type, event_id, value,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC NULLS LAST, event_id
               ) AS rank
        FROM events
    ) WHERE rank <= 5
    """,
)
def q_top_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_automation_spark.operators.relational import top_events_per_type

    out = top_events_per_type(_t(spark, sf_dir, "events"), k=5)
    return out.select("event_type", "event_id", "value", F.col("rank").cast("long").alias("rank"))


@register(
    "lineitem_running_total",
    """
    WITH per_line AS (
        SELECT l_orderkey, l_linenumber, SUM(l_quantity) AS line_qty
        FROM lineitem GROUP BY l_orderkey, l_linenumber
    )
    SELECT l_orderkey, l_linenumber,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS line_seq,
           ROUND(SUM(line_qty) OVER (
               PARTITION BY l_orderkey ORDER BY l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
    FROM per_line
    """,
)
def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_automation_spark.operators.relational import lineitem_running_order_total

    out = lineitem_running_order_total(_t(spark, sf_dir, "lineitem"))
    return out.select(
        "l_orderkey", "l_linenumber", F.col("line_seq").cast("long").alias("line_seq"), "running_qty"
    )


# =====================================================================
# Fusion + eval metrics (derived integer scores fixture)
# =====================================================================

@register(
    "rrf_fusion",
    f"""
    WITH scores AS ({SCORES_SQL}),
    ranked AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id, retriever
                   ORDER BY score_num DESC, doc_id
               ) - 1 AS rank0
        FROM scores
    ),
    rrf AS (
        SELECT query_id, doc_id,
               ROUND(SUM(1.0 / (61.0 + rank0)), 9) AS rrf_score
        FROM ranked GROUP BY query_id, doc_id
    ),
    concat_dedup AS (
        SELECT query_id, doc_id, score_num, retriever FROM (
            SELECT query_id, doc_id, score_num, retriever,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id, doc_id ORDER BY retriever DESC
                   ) AS rn
            FROM scores
        ) WHERE rn = 1
    ),
    comb AS (
        SELECT query_id, doc_id,
               CAST(SUM(score_num * CASE retriever WHEN 'bm25' THEN 2 ELSE 3 END) AS BIGINT)
                   / (1000003.0 * 5) AS fused_score
        FROM scores GROUP BY query_id, doc_id
    )
    SELECT r.query_id, r.doc_id, r.rrf_score, c.score_num, c.retriever,
           m.fused_score
    FROM rrf r JOIN concat_dedup c
      ON r.query_id = c.query_id AND r.doc_id = c.doc_id
    JOIN comb m
      ON r.query_id = m.query_id AND r.doc_id = m.doc_id
    """,
)
def q_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion + concatenate-dedup + weighted comb-sum in one seat
    (concatenate_dedup folded round 5 session 3, comb_sum_fusion folded
    round 5 session 5 — all three emit exactly one row per
    (query_id, doc_id) over the same scores, so the joins are 1:1
    lossless; slots freed for host_pagerank and bpe_train_encode under
    the driver's 50-entry cap)."""
    from document_automation_spark.operators.fusion import (
        comb_sum,
        concatenate_dedup,
        rrf,
    )

    scores = derived_scores(_t(spark, sf_dir, "documents"))
    return (
        rrf(scores)
        .join(concatenate_dedup(scores), ["query_id", "doc_id"])
        .join(comb_sum(scores, {"bm25": 2, "dpr": 3}, 5), ["query_id", "doc_id"])
    )


_HYBRID_SQL_BODY = f"""
    WITH scores AS ({SCORES_SQL}),
    per_image AS (
        SELECT query_id, image_id,
               2 * COALESCE(MAX(CASE WHEN retriever = 'bm25' THEN score_num END), 0)
             + 3 * COALESCE(MAX(CASE WHEN retriever = 'dpr' THEN score_num END), 0)
               AS final_num
        FROM scores GROUP BY query_id, image_id
    ),
    ranked AS (
        SELECT query_id, image_id, final_num,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY final_num DESC, image_id
               ) AS img_rank
        FROM per_image
    )
"""

@register(
    "hybrid_image_fusion",
    _HYBRID_SQL_BODY
    + """
    SELECT query_id, image_id, img_rank,
           final_num / (1000003.0 * 2) AS final_score
    FROM ranked WHERE img_rank <= 10
    """,
)
def q_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_automation_spark.operators.fusion import hybrid_image_fusion

    out = hybrid_image_fusion(
        derived_scores(_t(spark, sf_dir, "documents")), 3, 2, rerank_topk=10
    )
    return out.select(
        "query_id", "image_id", F.col("img_rank").cast("long").alias("img_rank"), "final_score"
    )


@register(
    "retrieval_error_analysis",
    _HYBRID_SQL_BODY
    + f""",
    gold AS ({GOLD_SQL}),
    hits AS (
        SELECT DISTINCT g.query_id
        FROM gold g JOIN ranked r
          ON r.query_id = g.query_id AND r.image_id = g.gold_image_id
             AND r.img_rank <= 10
    )
    SELECT g.query_id, g.gold_image_id,
           string_agg(CAST(r.image_id AS VARCHAR), '|' ORDER BY r.img_rank)
               AS top_retrieved
    FROM gold g
    JOIN ranked r ON r.query_id = g.query_id AND r.img_rank <= 10
    WHERE g.query_id NOT IN (SELECT query_id FROM hits)
    GROUP BY g.query_id, g.gold_image_id
    """,
)
def q_error_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Miss dump for error analysis (parity:
    /root/reference/src/test_retrieval_pipeline.py:321-327): one row per
    missed query with its gold image and the ordered retrieved top-10."""
    from document_automation_spark.operators.fusion import hybrid_image_fusion

    ranked = hybrid_image_fusion(
        derived_scores(_t(spark, sf_dir, "documents")), 3, 2, rerank_topk=10
    )
    gold = gold_labels(spark)
    joined = ranked.join(F.broadcast(gold), "query_id")
    hits = (
        joined.filter(F.col("image_id") == F.col("gold_image_id"))
        .select("query_id")
        .distinct()
    )
    misses = joined.join(hits, "query_id", "left_anti")
    # serialized as a '|'-joined string: the driver's canonicalizer sorts
    # column values, and array cells are unhashable/unsortable in pandas
    retrieved = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("img_rank", "image_id"))),
            lambda s: s["image_id"].cast("string"),
        ),
        "|",
    )
    return (
        misses.groupBy("query_id", "gold_image_id")
        .agg(retrieved.alias("top_retrieved"))
    )


@register(
    "retrieval_recall_mrr",
    _HYBRID_SQL_BODY
    + f""",
    gold AS ({GOLD_SQL}),
    found AS (
        SELECT g.query_id, MIN(r.img_rank) AS found_rank
        FROM gold g JOIN ranked r
          ON r.query_id = g.query_id AND r.image_id = g.gold_image_id
             AND r.img_rank <= 10
        GROUP BY g.query_id
    ),
    per_query AS (
        SELECT g.query_id,
               CASE WHEN f.found_rank IS NULL THEN 0 ELSE 1 END AS hit,
               CAST(COALESCE(f.found_rank, 20000) AS BIGINT) AS rank
        FROM gold g LEFT JOIN found f ON g.query_id = f.query_id
    )
    SELECT ROUND(AVG(CAST(hit AS DOUBLE)), 9) AS recall,
           ROUND(AVG(1.0 / rank), 9) AS mrr,
           COUNT(*) AS num_queries
    FROM per_query
    """,
)
def q_recall_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_automation_spark.operators.eval_metrics import hits_and_ranks, recall_and_mrr
    from document_automation_spark.operators.fusion import hybrid_image_fusion

    ranked = hybrid_image_fusion(
        derived_scores(_t(spark, sf_dir, "documents")), 3, 2, rerank_topk=10
    )
    gold = gold_labels(spark)
    return recall_and_mrr(hits_and_ranks(ranked, gold, topk=10))


@register(
    "weight_sweep_recall",
    f"""
    WITH scores AS ({SCORES_SQL}),
    weights(w_num, w_den) AS (VALUES (1, 2), (2, 2), (3, 2)),
    per_image AS (
        SELECT query_id, image_id,
               COALESCE(MAX(CASE WHEN retriever = 'bm25' THEN score_num END), 0) AS s1,
               COALESCE(MAX(CASE WHEN retriever = 'dpr' THEN score_num END), 0) AS s2
        FROM scores GROUP BY query_id, image_id
    ),
    ranked AS (
        SELECT w.w_num, w.w_den, p.query_id, p.image_id,
               ROW_NUMBER() OVER (
                   PARTITION BY w.w_num, p.query_id
                   ORDER BY p.s1 * w.w_den + p.s2 * w.w_num DESC, p.image_id
               ) AS img_rank
        FROM per_image p CROSS JOIN weights w
    ),
    gold AS ({GOLD_SQL}),
    found AS (
        SELECT r.w_num, g.query_id, MIN(r.img_rank) AS found_rank
        FROM gold g JOIN ranked r
          ON r.query_id = g.query_id AND r.image_id = g.gold_image_id
             AND r.img_rank <= 10
        GROUP BY r.w_num, g.query_id
    ),
    per_query AS (
        SELECT w.w_num, g.query_id,
               CASE WHEN f.found_rank IS NULL THEN 0 ELSE 1 END AS hit,
               CAST(COALESCE(f.found_rank, 20000) AS BIGINT) AS rank
        FROM gold g CROSS JOIN (SELECT DISTINCT w_num FROM weights) w
        LEFT JOIN found f ON f.query_id = g.query_id AND f.w_num = w.w_num
    )
    SELECT ROUND(w_num / 2.0, 2) AS weight,
           ROUND(AVG(CAST(hit AS DOUBLE)), 9) AS recall,
           ROUND(AVG(1.0 / rank), 9) AS mrr,
           COUNT(*) AS num_queries
    FROM per_query GROUP BY w_num
    """,
)
def q_weight_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble-weight HPO grid as ONE distributed plan: the reference
    loops the whole eval per weight on the driver
    (/root/reference/src/test_retrieval_pipeline.py:331-343, 395-397);
    here the weights dimension cross-joins into the ranking window, so
    every candidate weight is scored in a single pass over the scores."""
    from pyspark.sql import Window

    scores = derived_scores(_t(spark, sf_dir, "documents"))
    per_image = scores.groupBy("query_id", "image_id").agg(
        F.coalesce(
            F.max(F.when(F.col("retriever") == "bm25", F.col("score_num"))), F.lit(0)
        ).alias("s1"),
        F.coalesce(
            F.max(F.when(F.col("retriever") == "dpr", F.col("score_num"))), F.lit(0)
        ).alias("s2"),
    )
    weights = spark.createDataFrame([(1, 2), (2, 2), (3, 2)], "w_num int, w_den int")
    ranked = per_image.crossJoin(F.broadcast(weights)).withColumn(
        "img_rank",
        F.row_number().over(
            Window.partitionBy("w_num", "query_id").orderBy(
                F.desc(F.col("s1") * F.col("w_den") + F.col("s2") * F.col("w_num")),
                F.asc("image_id"),
            )
        ),
    )
    gold = gold_labels(spark)
    found = (
        ranked.filter(F.col("img_rank") <= 10)
        .join(
            F.broadcast(gold),
            (ranked["query_id"] == gold["query_id"])
            & (ranked["image_id"] == gold["gold_image_id"]),
        )
        .groupBy("w_num", gold["query_id"].alias("g_query_id"))
        .agg(F.min("img_rank").alias("found_rank"))
    )
    grid = gold.crossJoin(weights.select("w_num").distinct())
    per_query = grid.join(
        found,
        (grid["query_id"] == found["g_query_id"]) & (grid["w_num"] == found["w_num"]),
        "left",
    ).select(
        grid["w_num"].alias("w_num"),
        F.when(F.col("found_rank").isNotNull(), 1).otherwise(0).alias("hit"),
        F.coalesce(F.col("found_rank"), F.lit(20000)).cast("long").alias("rank"),
    )
    return per_query.groupBy("w_num").agg(
        F.round(F.avg(F.col("hit").cast("double")), 9).alias("recall"),
        F.round(F.avg(F.lit(1.0) / F.col("rank")), 9).alias("mrr"),
        F.count(F.lit(1)).alias("num_queries"),
    ).select(
        F.round(F.col("w_num") / 2.0, 2).alias("weight"), "recall", "mrr", "num_queries"
    )


# =====================================================================
# BM25 retrieval (the Elasticsearch leg, rebuilt as DataFrame algebra)
# =====================================================================

_QT_SQL = r"""
    SELECT DISTINCT CAST(d.doc_id / 41 AS BIGINT) AS query_id, u.term
    FROM documents d,
         LATERAL (SELECT unnest(list_slice(
             regexp_split_to_array(lower(trim(d.text)), '\s+'), 3, 6)) AS term) u
    WHERE d.doc_id % 41 = 0 AND d.doc_id < 410 AND u.term <> ''
"""



def _bm25_query_terms(docs: DataFrame) -> DataFrame:
    """Deterministic query-term derivation shared by all BM25 queries:
    queries 0..9, terms = word positions 3..6 of doc q*41 (mirrors _QT_SQL)."""
    return (
        docs.filter((F.col("doc_id") % 41 == 0) & (F.col("doc_id") < 410))
        .select(
            (F.col("doc_id") / 41).cast("long").alias("query_id"),
            F.explode(
                F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 3, 4)
            ).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )


_BM25_SCORED_SQL = rf"""
    qt AS ({_QT_SQL}),
    tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
        FROM documents
    ),
    tok2 AS (SELECT * FROM tok WHERE term <> ''),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok2 GROUP BY doc_id, term),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok2 GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    avgs AS (SELECT AVG(dl) AS avgdl FROM dl),
    idf AS (
        SELECT term, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf
        FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), stats
    ),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               ROUND(SUM(idf.idf * tf.tf * 2.2 /
                     (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / avgs.avgdl))), 6) AS bm25
        FROM qt
        JOIN tf ON qt.term = tf.term
        JOIN idf ON qt.term = idf.term
        JOIN dl ON tf.doc_id = dl.doc_id, avgs
        GROUP BY qt.query_id, tf.doc_id
    )
"""


# (bm25_topk no longer has its own registry seat: the scored top-10 rides
# the bm25_retrieval_eval seat as kind='topk' tagged-union rows — every
# (query, doc, bm25, rank) value stays hash-checked — slot freed for
# robots_exclusion under the driver's 50-entry cap.  operators/bm25.py is
# unchanged and bench.py keeps the bare row.)




@register(
    "bm25_retrieval_eval",
    f"""
    WITH {_BM25_SCORED_SQL},
    ranked2 AS (
        SELECT query_id, doc_id, bm25,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rank
        FROM scored
    ),
    ranked AS (SELECT query_id, doc_id, rank FROM ranked2),
    found AS (
        SELECT query_id, MIN(rank) AS found_rank FROM ranked
        WHERE doc_id = query_id * 41 AND rank <= 10
        GROUP BY query_id
    ),
    per_query AS (
        SELECT q.query_id,
               CASE WHEN f.found_rank IS NULL THEN 0 ELSE 1 END AS hit,
               CAST(COALESCE(f.found_rank, 20000) AS BIGINT) AS rank
        FROM (SELECT DISTINCT query_id FROM qt) q
        LEFT JOIN found f ON q.query_id = f.query_id
    )
    SELECT 'eval' AS kind, CAST(NULL AS BIGINT) AS query_id,
           CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS bm25,
           CAST(NULL AS BIGINT) AS rank,
           ROUND(AVG(CAST(hit AS DOUBLE)), 9) AS recall,
           ROUND(AVG(1.0 / rank), 9) AS mrr,
           COUNT(*) AS num_queries
    FROM per_query
    UNION ALL
    SELECT 'topk' AS kind, query_id, doc_id, bm25, CAST(rank AS BIGINT),
           CAST(NULL AS DOUBLE) AS recall, CAST(NULL AS DOUBLE) AS mrr,
           CAST(NULL AS BIGINT) AS num_queries
    FROM ranked2 WHERE rank <= 10
    """,
)
def q_bm25_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retrieval eval through the real BM25 scorer: queries are
    word-slices of known docs, gold = the source doc — the full reference
    eval loop (/root/reference/src/test_retrieval_pipeline.py:276-328) as
    one distributed plan, miss sentinel 20000 included."""
    from document_automation_spark.operators.bm25 import bm25_topk
    from document_automation_spark.operators.eval_metrics import hits_and_ranks, recall_and_mrr

    docs = _t(spark, sf_dir, "documents")
    query_terms = _bm25_query_terms(docs)
    topk = bm25_topk(docs.select("doc_id", "text"), query_terms, k=10)
    ranked = topk.select(
        "query_id", F.col("doc_id").alias("image_id"), F.col("rank").cast("int").alias("img_rank")
    )
    # gold from a fresh range (same ids as the qt derivation: 0..9) —
    # avoids an ambiguous self-join against the query_terms lineage
    gold = spark.range(10).select(
        F.col("id").alias("query_id"), (F.col("id") * 41).alias("gold_image_id")
    )
    ev = recall_and_mrr(hits_and_ranks(ranked, gold, topk=10)).select(
        F.lit("eval").alias("kind"),
        F.lit(None).cast("long").alias("query_id"),
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("double").alias("bm25"),
        F.lit(None).cast("long").alias("rank"),
        "recall",
        "mrr",
        "num_queries",
    )
    # bm25_topk folded in as kind='topk' rows (lossless — the full scored
    # top-10 stays hash-checked; its former standalone seat freed for
    # robots_exclusion)
    tk = topk.select(
        F.lit("topk").alias("kind"),
        "query_id",
        "doc_id",
        "bm25",
        F.col("rank").cast("long").alias("rank"),
        F.lit(None).cast("double").alias("recall"),
        F.lit(None).cast("double").alias("mrr"),
        F.lit(None).cast("long").alias("num_queries"),
    )
    return ev.unionByName(tk)


def _emb_list_cte(src: str, p: str) -> str:
    """CTE chain recomputing the md5 feature-hashing embeddings of relation
    ``src`` (columns doc_id, text) as 16-element DOUBLE lists in bucket
    order — the SQL twin of functions/embed.embed_text.  ``p`` prefixes
    every CTE name so two instances can coexist in one query."""
    return rf"""
    {p}toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\p{{L}}\p{{N}}_]+')) AS token
        FROM {src}
    ),
    {p}hashed AS (
        SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::UBIGINT AS h FROM {p}toks
    ),
    {p}buckets AS (
        SELECT doc_id, CAST(h % 16 AS INT) AS bucket,
               SUM(CASE WHEN (h >> 59) & 1 = 1 THEN 1 ELSE -1 END) AS val
        FROM {p}hashed GROUP BY doc_id, bucket
    ),
    {p}norms AS (
        SELECT doc_id, sqrt(SUM(CAST(val*val AS DOUBLE))) AS norm
        FROM {p}buckets GROUP BY doc_id
    ),
    {p}grid AS (
        SELECT d.doc_id, g.b
        FROM (SELECT DISTINCT doc_id FROM {src}) d
        CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) g
    ),
    {p}comps AS (
        SELECT grid.doc_id, grid.b,
               CASE WHEN COALESCE(n.norm, 0) = 0 THEN 0.0
                    ELSE trunc(CAST(COALESCE(bu.val, 0) AS DOUBLE) / n.norm * 1e6) / 1e6
               END AS comp
        FROM {p}grid grid
        LEFT JOIN {p}buckets bu ON bu.doc_id = grid.doc_id AND bu.bucket = grid.b
        LEFT JOIN {p}norms n ON n.doc_id = grid.doc_id
    ),
    {p}emb AS (
        SELECT doc_id, list(comp ORDER BY b) AS embv FROM {p}comps GROUP BY doc_id
    )
"""


_DOT16 = (
    "list_reduce(list_prepend(0.0, list_transform(generate_series(1, 16),"
    " i -> {a}[i] * {b}[i])), (x, y) -> x + y)"
)


@register(
    "ensemble_retrieval_eval",
    f"""
    WITH {_BM25_SCORED_SQL},
    {_emb_list_cte('documents', 'd')},
    {_emb_list_cte('(SELECT query_id AS doc_id, term AS text FROM qt)', 'q')},
    dense AS (
        SELECT q.doc_id AS query_id, d.doc_id,
               {_DOT16.format(a='d.embv', b='q.embv')}
               / (sqrt({_DOT16.format(a='d.embv', b='d.embv')})
                  * sqrt({_DOT16.format(a='q.embv', b='q.embv')})) AS cos
        FROM demb d, qemb q
    ),
    fused AS (
        SELECT COALESCE(s.query_id, de.query_id) AS query_id,
               COALESCE(s.doc_id, de.doc_id) AS doc_id,
               ROUND(COALESCE(s.bm25, 0) + 1.5 * COALESCE(de.cos, 0), 9) AS fused
        FROM scored s
        FULL OUTER JOIN dense de ON s.query_id = de.query_id AND s.doc_id = de.doc_id
    ),
    eranked AS (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY fused DESC, doc_id)
                   AS img_rank
        FROM fused
    ),
    efound AS (
        SELECT query_id, MIN(img_rank) AS found_rank FROM eranked
        WHERE doc_id = query_id * 41 AND img_rank <= 10
        GROUP BY query_id
    ),
    eper_query AS (
        SELECT g.query_id,
               CASE WHEN f.found_rank IS NULL THEN 0 ELSE 1 END AS hit,
               CAST(COALESCE(f.found_rank, 20000) AS BIGINT) AS rank
        FROM (SELECT DISTINCT query_id FROM qt) g
        LEFT JOIN efound f ON g.query_id = f.query_id
    )
    SELECT ROUND(AVG(CAST(hit AS DOUBLE)), 9) AS recall,
           ROUND(AVG(1.0 / rank), 9) AS mrr,
           COUNT(*) AS num_queries
    FROM eper_query
    """,
)
def q_ensemble_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's REAL dual-retriever ensemble, end to end: BM25 +
    embedding-cosine scores fused comb-sum style (weight 1.5 on the dense
    leg, scripts/run_retrieval_eval.sh:8-10), ranked, evaluated against the
    self-query gold.  Composes bm25.py + functions/embed.py +
    fusion-by-coalesce + eval_metrics in one plan.  The query embeddings
    come from the SAME distributed ``embed_documents`` kernel (no driver
    ``collect()`` loop); the whole thing — including both embedding legs —
    is recomputed by the DuckDB oracle."""
    from document_automation_spark.functions.embed import embed_documents
    from document_automation_spark.operators.bm25 import bm25_scores
    from document_automation_spark.operators.eval_metrics import hits_and_ranks, recall_and_mrr
    from document_automation_spark.operators.similarity import cosine_col
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    query_terms = _bm25_query_terms(docs)
    sparse = bm25_scores(docs.select("doc_id", "text"), query_terms)

    # distributed query embedding: same mapInPandas kernel as the corpus
    # (token order doesn't matter — the embedding is a bag-of-tokens sum)
    query_text = query_terms.groupBy("query_id").agg(
        F.concat_ws(" ", F.collect_list("term")).alias("text")
    )
    q_emb = embed_documents(
        query_text.select(F.col("query_id").alias("doc_id"), "text")
    ).select(F.col("doc_id").alias("query_id"), F.col("embedding").alias("q_embedding"))
    dense = (
        embed_documents(docs)
        .crossJoin(F.broadcast(q_emb))
        .select(
            "query_id",
            "doc_id",
            cosine_col(F.col("q_embedding"), F.col("embedding")).alias("cos"),
        )
    )
    fused = (
        sparse.join(dense, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.coalesce("bm25", F.lit(0.0)) + 1.5 * F.coalesce("cos", F.lit(0.0)), 9
            ).alias("fused"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("fused"), F.asc("doc_id"))
    ranked = (
        fused.withColumn("img_rank", F.row_number().over(w))
        .filter(F.col("img_rank") <= 10)
        .select("query_id", F.col("doc_id").alias("image_id"), "img_rank")
    )
    gold = spark.range(10).select(
        F.col("id").alias("query_id"), (F.col("id") * 41).alias("gold_image_id")
    )
    return recall_and_mrr(hits_and_ranks(ranked, gold, topk=10))


@register(
    "hard_negative_mining",
    f"""
    WITH {_BM25_SCORED_SQL},
    -- anti-join: drop candidates sharing the gold doc's image group
    -- (reference hard-negative rule, process_dataset.py:276-278)
    not_gold AS (
        SELECT s.query_id, s.doc_id, s.bm25
        FROM scored s
        WHERE s.doc_id % 97 <> (s.query_id * 41) % 97
    )
    SELECT query_id, doc_id, bm25, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rank
        FROM not_gold
    ) WHERE rank <= 5
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: BM25 candidates minus the gold image group
    (anti-filter F10/J8), top-5 per query — the reference's DPR negative
    miner (/root/reference/src/process_dataset.py:261-282) as one plan.
    Gold doc for query q is doc q*41, its image group (doc_id % 97)."""
    from document_automation_spark.operators.bm25 import bm25_scores
    from document_automation_spark.operators.topk import topk_per_group

    docs = _t(spark, sf_dir, "documents")
    query_terms = _bm25_query_terms(docs)
    scored = bm25_scores(docs.select("doc_id", "text"), query_terms)
    not_gold = scored.filter(
        (F.col("doc_id") % 97) != ((F.col("query_id") * 41) % 97)
    )
    out = topk_per_group(not_gold, ["query_id"], "bm25", k=5, tiebreak_col="doc_id")
    return out.select(
        "query_id", "doc_id", "bm25", F.col("rank").cast("long").alias("rank")
    )


# =====================================================================
# Passage split + positive passage (byte-exact kernel vs SQL re-derivation)
# =====================================================================

# The SQL below independently re-derives get_split's window math
# (max_len 500 / stride 490 / strict > 5 remainder gate) so the Python
# kernel and a second implementation cross-check each other.
_SPLIT_SQL = """
    SELECT doc_id, CAST(0 AS BIGINT) AS passage_idx, text AS passage
    FROM documents WHERE length(text) <= 500
    UNION ALL
    SELECT d.doc_id, g.w AS passage_idx,
           substring(d.text, CAST(g.w * 490 + 1 AS INT), 500) AS passage
    FROM documents d,
         LATERAL (SELECT unnest(generate_series(0,
                      CAST(floor(length(d.text) / 490.0) AS BIGINT) - 1)) AS w) g
    WHERE length(d.text) > 500
    UNION ALL
    SELECT doc_id,
           CAST(floor(length(text) / 490.0) AS BIGINT) AS passage_idx,
           substring(text,
               CAST(500 + (CAST(floor(length(text) / 490.0) AS BIGINT) - 1) * 490 + 1 AS INT),
               length(text)) AS passage
    FROM documents
    WHERE length(text) > 500
      AND length(text) - (500 + (CAST(floor(length(text) / 490.0) AS BIGINT) - 1) * 490) > 5
"""


@register("split_passages", _SPLIT_SQL)
def q_split_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_automation_spark.operators.positive_passage import explode_passages

    out = explode_passages(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", F.col("passage_idx").cast("long").alias("passage_idx"), "passage"
    )


@register(
    "assemble_lines",
    """
    WITH tok AS (
        SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS idx, toks[t.i] AS word0
        FROM (SELECT doc_id, list_slice(str_split(coalesce(text, ''), ' '), 1, 24) AS toks
              FROM documents),
             LATERAL unnest(generate_series(1, len(toks))) AS t(i)
    ),
    crafted AS (
        SELECT doc_id, idx,
               CASE WHEN (doc_id * 7 + idx) % 13 = 0 THEN word0 || '广告'
                    ELSE word0 END AS word
        FROM tok
    ),
    k6_in AS (
        SELECT doc_id, idx, word, idx // 3 AS line_num, idx // 7 AS block_num
        FROM crafted WHERE word <> ''
    ),
    runs AS (
        SELECT doc_id, idx, word,
               SUM(CASE WHEN line_num = prev_l AND block_num = prev_b
                        THEN 0 ELSE 1 END)
                   OVER (PARTITION BY doc_id ORDER BY idx) AS run_id
        FROM (
            SELECT *, LAG(line_num) OVER w AS prev_l,
                      LAG(block_num) OVER w AS prev_b
            FROM k6_in
            WINDOW w AS (PARTITION BY doc_id ORDER BY idx)
        )
    ),
    asm AS (
        SELECT doc_id, run_id, string_agg(word, '' ORDER BY idx) AS line,
               MAX(run_id) OVER (PARTITION BY doc_id) AS max_run
        FROM runs GROUP BY doc_id, run_id
    ),
    k6 AS (
        SELECT doc_id, line,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY run_id) - 1 AS idx
        FROM asm
        WHERE run_id < max_run
          AND NOT (line LIKE '%广告%' OR line LIKE '%热门%')
    ),
    k5 AS (
        SELECT doc_id,
               coalesce(string_agg(word, '' ORDER BY idx)
                   FILTER (WHERE NOT (word LIKE '%广告%' OR word LIKE '%热门%')),
                   '') AS joined
        FROM crafted GROUP BY doc_id
    )
    SELECT doc_id, 'k6' AS kind, CAST(idx AS BIGINT) AS idx, line AS value FROM k6
    UNION ALL
    SELECT doc_id, 'k5' AS kind, CAST(0 AS BIGINT) AS idx, joined AS value FROM k5
    """,
)
def q_assemble_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5/K6/F7 micro-seat (round-5 verdict #6): the OCR line-assembly
    kernels — word runs keyed by (block, line), ad-line drop, the
    reference's final-run-never-emitted quirk, the empty-word filter, and
    the strip→ad→separator-free join — replayed over a crafted
    deterministic word stream derived from every document, with a FULL
    relational SQL twin (windows + string_agg folds), so the quirks are
    pinned by the driver's hash gate, not just pytest."""
    from document_automation_spark.operators.text_analysis import line_assembly_table

    out = line_assembly_table(_t(spark, sf_dir, "documents"))
    return out.select("doc_id", "kind", F.col("idx").cast("long").alias("idx"), "value")


_QA_SQL = """
    SELECT doc_id % 20 AS query_id, doc_id,
           substring(text, 21, 10) AS answer
    FROM documents WHERE length(text) >= 40 AND doc_id % 5 = 0
"""


@register(
    "positive_passage",
    f"""
    WITH split AS ({_SPLIT_SQL}),
    qa AS ({_QA_SQL}),
    joined AS (
        SELECT qa.query_id, qa.doc_id, s.passage_idx, s.passage,
               COUNT(*) OVER (PARTITION BY qa.query_id, qa.doc_id) AS n_passages,
               CASE WHEN position(qa.answer IN s.passage) > 0 THEN 1 ELSE 0 END AS has_answer,
               length(list_intersect(list_distinct(str_split(s.passage, '')),
                                     list_distinct(str_split(qa.answer, '')))) AS char_overlap
        FROM qa JOIN split s ON qa.doc_id = s.doc_id
    ),
    picked AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY query_id, doc_id
                   ORDER BY has_answer DESC, char_overlap DESC, passage_idx
               ) AS pick
        FROM joined
    )
    SELECT query_id, doc_id,
           CASE WHEN n_passages > 1 AND has_answer = 0 AND char_overlap = 0
                THEN NULL ELSE CAST(passage_idx AS BIGINT) END AS passage_idx,
           CASE WHEN n_passages > 1 AND has_answer = 0 AND char_overlap = 0
                THEN '' ELSE passage END AS positive_passage
    FROM picked WHERE pick = 1
    """,
)
def q_positive_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_automation_spark.operators.positive_passage import find_positive_passages

    docs = _t(spark, sf_dir, "documents")
    qa = docs.filter((F.length("text") >= 40) & (F.col("doc_id") % 5 == 0)).select(
        (F.col("doc_id") % 20).alias("query_id"),
        "doc_id",
        F.col("text").substr(21, 10).alias("answer"),
    )
    out = find_positive_passages(docs, qa)
    return out.select(
        "query_id",
        "doc_id",
        F.col("passage_idx").cast("long").alias("passage_idx"),
        "positive_passage",
    )


# =====================================================================
# Dedup suite
# =====================================================================

# The sf0.01 documents fixture contains zero exact duplicates (500/500
# distinct texts), which made round 2's dedup checks VACUOUS: the queries
# passed without the min-id canonicalization or the n_dups>1 counting ever
# firing.  Both queries therefore union an id-remapped duplicate slice
# (doc_id + 10000, same text — 50 rows) into their input IN BOTH ENGINES,
# so the driver check exercises real duplicate groups: the copies must be
# dropped (higher id) and 50 groups with n_dups=2 must be reported.
_DOCS_WITH_DUPS_SQL = """docs_dup AS (
        SELECT doc_id, text, lang, source, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars
        FROM documents WHERE doc_id < 50)"""


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    copies = docs.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10000)
    )
    return docs.unionAll(copies)


@register(
    "exact_dedup",
    f"""
    WITH {_DOCS_WITH_DUPS_SQL},
    keep AS (
        SELECT doc_id, text, lang, source, n_chars FROM (
            SELECT *, MIN(doc_id) OVER (PARTITION BY text) AS keep_id FROM docs_dup
        ) WHERE doc_id = keep_id
    ),
    grp AS (
        SELECT CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id,
               COUNT(*) AS n_dups
        FROM docs_dup GROUP BY text HAVING COUNT(*) > 1
    )
    SELECT k.doc_id, k.text, k.lang, k.source, k.n_chars,
           CAST(COALESCE(g.n_dups, 1) AS BIGINT) AS n_dups
    FROM keep k LEFT JOIN grp g ON g.canonical_doc_id = k.doc_id
    """,
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup survivors annotated with their group sizes — both
    dedup.py operators in one seat (duplicate_groups merged here to free
    a slot under the driver's 50-entry cap): survivors left-join the
    >1-occurrence group table on canonical id, unique docs get
    n_dups = 1."""
    from document_automation_spark.operators.dedup import duplicate_groups, exact_dedup

    docs = _docs_with_dups(spark, sf_dir)
    groups = duplicate_groups(docs).withColumnRenamed("canonical_doc_id", "doc_id")
    return (
        exact_dedup(docs)
        .join(groups, "doc_id", "left")
        .withColumn("n_dups", F.coalesce(F.col("n_dups"), F.lit(1).cast("long")))
    )


@register(
    "ngram_jaccard_pairs",
    """
    WITH grams AS (
        SELECT doc_id, lang, n_chars,
               list_distinct(list_transform(
                   generate_series(1, GREATEST(length(text) - 2, 1)),
                   i -> substring(text, CAST(i AS INT), 3))) AS gs
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(length(list_intersect(a.gs, b.gs)) AS DOUBLE) /
                 (length(a.gs) + length(b.gs) - length(list_intersect(a.gs, b.gs))),
                 6) AS jaccard
    FROM grams a JOIN grams b
      ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
    WHERE ROUND(CAST(length(list_intersect(a.gs, b.gs)) AS DOUBLE) /
                (length(a.gs) + length(b.gs) - length(list_intersect(a.gs, b.gs))),
                6) >= 0.5
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_automation_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), n=3, threshold=0.5)


# MinHash/SimHash oracles: the kernels hash shingles with md5 (see
# kernels/fingerprint.py) and the permutation constants are pure functions
# of (num_perm, seed), so the ENTIRE signature → banding → candidate-pair
# construction is replayed in SQL with the (a, b) constants embedded as
# literals — the same constants-in-SQL trick as the LSH hyperplanes.
_MERSENNE_31 = 2147483647


def _shingle_cte(k: int, src: str = "documents") -> str:
    """Distinct character k-shingles per doc (len<k → the whole text, as
    kernels/fingerprint.char_shingles does; empty text excluded — the
    corpus has none, and the kernel's empty-text sentinel has no pairs)."""
    return f"""sh AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN length(text) < {k} THEN [text]
                 ELSE list_transform(generate_series(1, length(text) - {k - 1}),
                                     i -> substr(text, CAST(i AS INT), {k}))
            END)) AS s
        FROM {src} WHERE length(text) > 0)"""


def _minhash_cand_cte() -> str:
    """CTE chain: shingles → 60-bit md5 hash → 32 permutation minima →
    8 raw-string band keys → distinct candidate pairs (doc_a < doc_b)."""
    from document_automation_spark.kernels.fingerprint import _perm_params

    params = _perm_params(32, 42)
    sig_exprs = ",\n        ".join(
        f"MIN(({a}::BIGINT * hv + {b}) % {_MERSENNE_31}) AS s{i}"
        for i, (a, b) in enumerate(params)
    )
    band_case = (
        "CASE band "
        + " ".join(
            f"WHEN {b} THEN " + " || ',' || ".join(f"s{b*4+r}::VARCHAR" for r in range(4))
            for b in range(8)
        )
        + " END"
    )
    return f"""{_shingle_cte(5)},
    h AS (SELECT doc_id,
                 (('0x' || substr(md5(s), 1, 15))::UBIGINT % {_MERSENNE_31})::BIGINT AS hv
          FROM sh),
    sigs AS (SELECT doc_id, {sig_exprs} FROM h GROUP BY doc_id),
    banded AS (
        SELECT doc_id, band, {band_case} AS key
        FROM sigs CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS band)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )"""


@register(
    "minhash_lsh_candidates",
    f"""
    WITH {_minhash_cand_cte()}
    SELECT doc_a, doc_b FROM cand
    """,
)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash → LSH banding → candidate pairs, FULLY oracle-checked: the
    DuckDB twin recomputes every signature from md5 shingle hashes and the
    32 blake2b-seeded permutation constants embedded as SQL literals."""
    from document_automation_spark.operators.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(_t(spark, sf_dir, "documents"))


@register(
    "near_dup_dedup",
    f"""
    WITH {_minhash_cand_cte()},
    grams AS (
        SELECT doc_id, list_distinct(
            CASE WHEN length(text) < 5 THEN [text]
                 ELSE list_transform(generate_series(1, GREATEST(length(text) - 4, 1)),
                                     i -> substr(text, CAST(i AS INT), 5))
            END) AS g
        FROM documents
    ),
    dropped AS (
        SELECT DISTINCT c.doc_b
        FROM cand c
        JOIN grams ga ON ga.doc_id = c.doc_a
        JOIN grams gb ON gb.doc_id = c.doc_b
        WHERE len(list_intersect(ga.g, gb.g))
              / CAST(len(list_distinct(list_concat(ga.g, gb.g))) AS DOUBLE) >= 0.9
    )
    SELECT doc_id, text, lang, source, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT doc_b FROM dropped)
    """,
)
def q_near_dup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard verify →
    greedy canonical selection — every stage recomputed by the DuckDB
    oracle.  pytest additionally checks against a brute-force all-pairs
    ground truth on constructed near-dups."""
    from document_automation_spark.operators.dedup import near_dup_dedup

    out = near_dup_dedup(_t(spark, sf_dir, "documents"), jaccard_threshold=0.9)
    return out.select("doc_id", "text", "lang", "source", "n_chars")


def _simhash_fps_cte(k: int = 3, src: str = "documents") -> str:
    """CTE chain ending in ``fps(doc_id, simhash)``: 64 per-bit vote sums
    over md5 shingle hashes → signed-int64 reinterpreted fingerprint, for
    every non-empty-text doc in ``src``."""
    bit_exprs = ",\n        ".join(
        f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE 0 END) AS c{b}"
        for b in range(64)
    )
    val_terms = " + ".join(
        f"(CASE WHEN 2*c{b} - n > 0 THEN {1 << b}::HUGEINT ELSE 0::HUGEINT END)"
        for b in range(64)
    )
    return f"""{_shingle_cte(k, src)},
    h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 16))::UBIGINT AS hv FROM sh),
    bits AS (SELECT doc_id, COUNT(*) AS n, {bit_exprs} FROM h GROUP BY doc_id),
    vals AS (SELECT doc_id, {val_terms} AS v FROM bits),
    fps AS (
        SELECT doc_id,
               CAST(CASE WHEN v >= {1 << 63}::HUGEINT THEN v - {1 << 64}::HUGEINT
                         ELSE v END AS BIGINT) AS simhash
        FROM vals)"""


def _simhash_sql() -> str:
    return f"""
    WITH {_simhash_fps_cte(3)}
    SELECT doc_id, simhash FROM fps
    UNION ALL
    SELECT doc_id, CAST(0 AS BIGINT) AS simhash
    FROM documents WHERE length(text) = 0
    """


def _simhash_pairs_sql(max_hamming: int = 3, n_bands: int = 4) -> str:
    """Full SQL replay of the pigeonhole band join + popcount verify over
    the duplicate-enriched corpus (exact copies guarantee hamming-0 pairs,
    so the check can never pass vacuously)."""
    width = 64 // n_bands
    return f"""
    WITH {_DOCS_WITH_DUPS_SQL},
    {_simhash_fps_cte(3, "docs_dup")},
    banded AS (
        SELECT doc_id, simhash, band,
               (simhash >> (band * {width})) & {(1 << width) - 1} AS bits
        FROM fps CROSS JOIN (SELECT unnest(generate_series(0, {n_bands - 1})) AS band)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM banded a
    JOIN banded b ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def _golden_kmeans_oracle() -> Optional[str]:
    from document_automation_spark.golden import kmeans_golden_sql

    return kmeans_golden_sql()


# k-means++ + Lloyd iterations are not expressible as one SQL query, so the
# oracle is a pinned golden: the pure seeded kernel (the same function the
# mapInPandas batches call) run over the driver's sf0.01 documents in plain
# Python → VALUES table (golden.py; falls back to rows-only if the fixture
# parquet is unreadable).  pytest additionally pins distributed-vs-kernel
# parity + partition-count invariance (tests/test_cluster.py).
@register("kmeans_line_clusters", _golden_kmeans_oracle)
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9: deterministic seeded PCA+KMeans clustering of per-document line
    embeddings (reference: postprocess_ocr_by_clustering_line_embedding,
    /root/reference/src/utils.py:253-284, made retry-deterministic)."""
    from document_automation_spark.operators.cluster_lines import kmeans_line_clusters

    return kmeans_line_clusters(_t(spark, sf_dir, "documents"))


@register(
    "simhash_fingerprints",
    lambda: f"""
    SELECT 'fp' AS kind, doc_id AS id_a, CAST(NULL AS BIGINT) AS id_b,
           simhash AS value
    FROM ({_simhash_sql()})
    UNION ALL
    SELECT 'pair' AS kind, doc_a AS id_a, doc_b AS id_b, hamming AS value
    FROM ({_simhash_pairs_sql()})
    """,
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash leg of the dedup suite, both halves in one tagged union
    (each was its own seat through round 4 — merged to free a slot under
    the driver's 50-entry cap, every row still oracle-checked):

    * ``fp`` rows — the 64-bit fingerprint per doc; the DuckDB twin
      recomputes every fingerprint from md5 shingle hashes via 64 per-bit
      vote sums, assembling the (wrapped-to-signed) int64 in HUGEINT space.
    * ``pair`` rows — Hamming-≤3 near-dup pairs via pigeonhole bit-bands
      (4 bands of 16 bits: any pair within Hamming 3 must agree on ≥1
      whole band), verified JVM-side with ``bit_count`` over the
      duplicate-enriched corpus (exact copies guarantee hamming-0 pairs,
      never vacuous); the oracle replays band keys + popcount in SQL.
    """
    from document_automation_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_near_dup_pairs,
    )

    fps = simhash_fingerprints(_t(spark, sf_dir, "documents")).select(
        F.lit("fp").alias("kind"),
        F.col("doc_id").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.col("simhash").alias("value"),
    )
    pairs = simhash_near_dup_pairs(_docs_with_dups(spark, sf_dir), max_hamming=3).select(
        F.lit("pair").alias("kind"),
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        F.col("hamming").cast("long").alias("value"),
    )
    return fps.unionByName(pairs)


# =====================================================================
# Similarity search
# =====================================================================

_COSINE_PAIR_SQL = """
        SELECT q.vec_id AS query_vec_id, e.vec_id,
               ROUND(
                   list_reduce(list_prepend(0.0,
                       list_transform(generate_series(1, len(e.embedding)),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))),
                       (a, b) -> a + b)
                   / (sqrt(list_reduce(list_prepend(0.0,
                          list_transform(generate_series(1, len(e.embedding)),
                              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
                          (a, b) -> a + b))
                    * sqrt(list_reduce(list_prepend(0.0,
                          list_transform(generate_series(1, len(q.embedding)),
                              i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))),
                          (a, b) -> a + b))),
                   6) AS cosine
        FROM embeddings e, (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
"""


# (similarity_topk no longer has its own registry seat: the brute-force
# cosine top-k rides the embedding_near_dup seat as kind='topk' tagged-union
# rows — the operator runs in full and every (query, doc, cosine, rank)
# value stays hash-checked — slot freed for semantic_dedup under the
# driver's 50-entry cap.  bench.py keeps a bare similarity_topk row.)


@register(
    "embedding_near_dup",
    f"""
    WITH scored AS ({_COSINE_PAIR_SQL})
    SELECT 'near_dup' AS kind, vec_a AS id_a, vec_b AS id_b, cosine,
           CAST(NULL AS BIGINT) AS rank
    FROM (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(
               list_reduce(list_prepend(0.0,
                   list_transform(generate_series(1, len(a.embedding)),
                       i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
                   (x, y) -> x + y)
               / (sqrt(list_reduce(list_prepend(0.0,
                      list_transform(generate_series(1, len(a.embedding)),
                          i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))),
                      (x, y) -> x + y))
                * sqrt(list_reduce(list_prepend(0.0,
                      list_transform(generate_series(1, len(b.embedding)),
                          i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
                      (x, y) -> x + y))),
               6) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE cosine >= 0.3
    UNION ALL
    SELECT 'topk' AS kind, query_vec_id AS id_a, vec_id AS id_b, cosine, rank
    FROM (
        SELECT query_vec_id, vec_id, cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY query_vec_id ORDER BY cosine DESC, vec_id
               ) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tagged union of the two exact-cosine surfaces: kind='near_dup' =
    label-blocked near-duplicate pairs (threshold 0.3), kind='topk' =
    brute-force top-10 for the first 5 query vectors (similarity_topk's
    former seat, folded in losslessly — both operators run in full)."""
    from document_automation_spark.operators.similarity import (
        brute_force_topk,
        embedding_near_dup_pairs,
    )

    emb = _t(spark, sf_dir, "embeddings")
    nd = embedding_near_dup_pairs(emb, threshold=0.3).select(
        F.lit("near_dup").alias("kind"),
        F.col("vec_a").alias("id_a"),
        F.col("vec_b").alias("id_b"),
        "cosine",
        F.lit(None).cast("long").alias("rank"),
    )
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("embedding").alias("query_embedding"),
    )
    tk = brute_force_topk(emb, queries_df, k=10).select(
        F.lit("topk").alias("kind"),
        F.col("query_vec_id").alias("id_a"),
        F.col("vec_id").alias("id_b"),
        "cosine",
        F.col("rank").cast("long").alias("rank"),
    )
    return nd.unionByName(tk)


def _lsh_oracle_sql(
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    probe_bits: int = 0,
    n_tables: int = 1,
    candidates_only: bool = False,
) -> str:
    """DuckDB twin of the LSH bucketing: the deterministic hyperplane
    constants are embedded as literals; both engines compute each dot as
    the same left-fold in index order, so bucket ids are bit-identical.
    ``probe_bits`` replays the multiprobe fan-out as a lateral unnest of
    the same XOR masks the Spark side explodes; ``n_tables`` unions the
    per-table candidate sets (seed+t planes) with DISTINCT before
    ranking, mirroring the Spark dropDuplicates."""
    from document_automation_spark.operators.similarity import hyperplanes, probe_masks

    masks = ", ".join(str(m) for m in probe_masks(n_planes, probe_bits))

    def dot_sql(vec: str, plane: list) -> str:
        lits = ", ".join(repr(c) for c in plane)
        return (
            f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {dim}),"
            f" i -> CAST({vec}[i] AS DOUBLE) * ([{lits}])[i])), (a, b) -> a + b)"
        )

    def table_scored(t: int) -> str:
        planes = hyperplanes(dim, n_planes, seed + t)
        bucket_terms = " + ".join(
            f"(CASE WHEN {dot_sql('embedding', plane)} > 0 THEN {1 << p} ELSE 0 END)"
            for p, plane in enumerate(planes)
        )
        return f"""
        SELECT q.vec_id AS query_vec_id, e.vec_id,
               ROUND(
                   list_reduce(list_prepend(0.0,
                       list_transform(generate_series(1, len(e.embedding)),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))),
                       (a, b) -> a + b)
                   / (sqrt(list_reduce(list_prepend(0.0,
                          list_transform(generate_series(1, len(e.embedding)),
                              i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
                          (a, b) -> a + b))
                    * sqrt(list_reduce(list_prepend(0.0,
                          list_transform(generate_series(1, len(q.embedding)),
                              i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))),
                          (a, b) -> a + b))),
                   6) AS cosine
        FROM (SELECT vec_id, embedding, CAST({bucket_terms} AS BIGINT) AS bucket
              FROM embeddings) e
        JOIN (
            SELECT vec_id, embedding, xor(CAST({bucket_terms.replace("embedding", "q0.embedding")} AS BIGINT), m.mask) AS bucket
            FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q0,
                 LATERAL unnest([{masks}]) AS m(mask)
        ) q ON e.bucket = q.bucket"""

    union = "\n        UNION ALL\n".join(
        f"({table_scored(t)})" for t in range(n_tables)
    )
    dedup = "SELECT DISTINCT query_vec_id, vec_id, cosine FROM" if n_tables > 1 else "SELECT query_vec_id, vec_id, cosine FROM"
    if candidates_only:
        # the pre-ranking candidate set (the scanned cosines) — the
        # recall-eval seat ranks AND counts these itself
        return f"{dedup} ({union})"
    return f"""
    WITH scored AS (
        {dedup} ({union})
    )
    SELECT query_vec_id, vec_id, cosine, rank FROM (
        SELECT query_vec_id, vec_id, cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY query_vec_id ORDER BY cosine DESC, vec_id
               ) AS rank
        FROM scored
    ) WHERE rank <= 10
    """


def _ivf_oracle_sql(
    n_centroids: int = 8,
    n_probe: int = 3,
    k: int = 10,
    dim: int = 64,
    candidates_only: bool = False,
) -> Optional[str]:
    """DuckDB twin of the IVF ANN path: the seeded-kmeans centroids are
    embedded as literals (trained identically in golden.ivf_centroids from
    the same sample bytes), bucket assignment/probing replays the
    d = |c|² − 2x·c argmin with trunc-6 quantization + centroid-index
    tie-break, and the probed-bucket equi-join + exact cosine top-k follow
    the same rounded ordering as every other ANN oracle here."""
    from document_automation_spark.golden import ivf_centroids

    C = ivf_centroids(n_centroids=n_centroids)
    if C is None:
        return None
    c2 = (C * C).sum(axis=1)
    cent_vals = ",\n        ".join(
        f"({i}, {float(c2[i])!r}, [{', '.join(repr(float(v)) for v in C[i])}])"
        for i in range(n_centroids)
    )
    dot_c = (
        f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {dim}),"
        f" i -> CAST(e.embedding[i] AS DOUBLE) * c.cvec[i])), (a, b) -> a + b)"
    )

    def fold(x: str, y: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {dim}),"
            f" i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE))), (a, b) -> a + b)"
        )

    cosine = (
        f"{fold('a.embedding', 'p.query_embedding')}"
        f" / (sqrt({fold('a.embedding', 'a.embedding')})"
        f" * sqrt({fold('p.query_embedding', 'p.query_embedding')}))"
    )
    return f"""
    WITH cent AS (SELECT * FROM (VALUES {cent_vals}) AS c0(cid, c2, cvec)),
    dists AS (
        SELECT e.vec_id, e.embedding, c.cid,
               trunc((c.c2 - 2 * {dot_c}) * 1000000) / 1000000 AS d
        FROM embeddings e CROSS JOIN cent c
    ),
    assigned AS (
        SELECT vec_id, embedding, cid AS bucket FROM (
            SELECT vec_id, embedding, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
            FROM dists) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS query_vec_id, embedding AS query_embedding,
               cid AS bucket FROM (
            SELECT vec_id, embedding, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
            FROM dists WHERE vec_id < 5) WHERE rn <= {n_probe}
    ),
    scored AS (
        SELECT p.query_vec_id, a.vec_id, ROUND({cosine}, 6) AS cosine
        FROM assigned a JOIN probes p USING (bucket)
    )
    {"SELECT query_vec_id, vec_id, cosine FROM scored" if candidates_only else f'''
    SELECT query_vec_id, vec_id, cosine, rank FROM (
        SELECT query_vec_id, vec_id, cosine,
               ROW_NUMBER() OVER (
                   PARTITION BY query_vec_id ORDER BY cosine DESC, vec_id
               ) AS rank
        FROM scored) WHERE rank <= {k}'''}
    """


def _semantic_dedup_oracle_sql(
    n_clusters: int = 8, threshold: float = 0.3, dim: int = 64
) -> Optional[str]:
    """DuckDB twin of SemDeDup: the seeded-kmeans centroids (and their
    norms) are embedded as literals from golden.ivf_centroids — the same
    bytes ivf.train_centroids produces — cluster assignment replays the
    d = |c|² − 2x·c trunc-6 argmin with centroid-index tie-break (the
    proven IVF-oracle pattern), centroid similarity and pair cosines are
    ROUND(…, 6) in both engines, and the keep rule is the same pair-local
    (centroid_sim, vec_id) comparison the Spark side evaluates."""
    import numpy as np

    from document_automation_spark.golden import ivf_centroids

    C = ivf_centroids(n_centroids=n_clusters)
    if C is None:
        return None
    c2 = (C * C).sum(axis=1)
    cn = np.sqrt(c2)
    cent_vals = ",\n        ".join(
        f"({i}, {float(c2[i])!r}, {float(cn[i])!r},"
        f" [{', '.join(repr(float(v)) for v in C[i])}])"
        for i in range(n_clusters)
    )

    def fold(x: str, y: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, list_transform(generate_series(1, {dim}),"
            f" i -> CAST({x}[i] AS DOUBLE) * {y}[i])), (a, b) -> a + b)"
        )

    dot_c = fold("e.embedding", "c.cvec")
    pair_cos = (
        f"{fold('x.embedding', 'CAST(y.embedding AS DOUBLE[])')}"
        f" / (sqrt({fold('x.embedding', 'CAST(x.embedding AS DOUBLE[])')})"
        f" * sqrt({fold('y.embedding', 'CAST(y.embedding AS DOUBLE[])')}))"
    )
    return f"""
    WITH cent AS (SELECT * FROM (VALUES {cent_vals}) AS c0(cid, c2, cnorm, cvec)),
    dists AS (
        SELECT e.vec_id, e.embedding, c.cid,
               trunc((c.c2 - 2 * {dot_c}) * 1000000) / 1000000 AS d
        FROM embeddings e CROSS JOIN cent c
    ),
    assigned AS (
        SELECT vec_id, embedding, cid AS bucket FROM (
            SELECT vec_id, embedding, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
            FROM dists) WHERE rn = 1
    ),
    scored AS (
        SELECT a.vec_id, a.embedding, a.bucket,
               ROUND({fold('a.embedding', 'c.cvec')}
                     / (sqrt({fold('a.embedding', 'CAST(a.embedding AS DOUBLE[])')})
                        * c.cnorm), 6) AS centroid_sim
        FROM assigned a JOIN cent c ON c.cid = a.bucket
    ),
    losers AS (
        SELECT DISTINCT x.vec_id
        FROM scored x JOIN scored y
          ON x.bucket = y.bucket AND x.vec_id <> y.vec_id
        WHERE ROUND({pair_cos}, 6) >= {threshold}
          AND (y.centroid_sim < x.centroid_sim
               OR (y.centroid_sim = x.centroid_sim AND y.vec_id < x.vec_id))
    )
    SELECT s.vec_id, CAST(s.bucket AS INTEGER) AS bucket, s.centroid_sim,
           l.vec_id IS NULL AS kept
    FROM scored s LEFT JOIN losers l ON l.vec_id = s.vec_id
    """


@register("semantic_dedup", lambda: _semantic_dedup_oracle_sql())
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.semantic_dedup): embedding-cluster
    semantic dedup — seeded k-means clusters, within-cluster cosine pairs,
    keep-the-farthest-from-centroid greedy rule.  threshold 0.3 on the
    synthetic embeddings drops ~190 of 500 vectors, so the keep rule is
    exercised on real collisions; trunc-6 assignment quantization is the
    same cross-engine parity knob the IVF oracle uses."""
    from document_automation_spark.operators.similarity import semantic_dedup

    # the scored projection feeds three plan branches; persist it like
    # ann_recall_eval persists its knn graph (bench/driver sessions run the
    # query once — the ~n-row persist is reclaimed by their clearCache/exit;
    # measured 2.6x on the seat)
    out = semantic_dedup(
        _t(spark, sf_dir, "embeddings"),
        n_clusters=8,
        threshold=0.3,
        quantize_dp=6,
        cache_registry=[],
    )
    return out.select("vec_id", "bucket", "centroid_sim", "kept")


def _ann_recall_sql() -> Optional[str]:
    """Composite twin: the ANN oracles (brute / LSH / IVF — each
    hash-green as its own seat through round 3) as CANDIDATE CTEs, ranked
    and counted into per-query recall@10 AND scan budget (``n_scanned`` =
    candidate cosines evaluated) per approximate method — plus the
    graph-ANN rows as a pinned-golden VALUES table (graph traversal is
    iterative, not single-SQL-expressible; golden.graph_ann_rows runs the
    pure kernel mirror that tests/test_graph_ann.py pins the Spark twin
    against edge-for-edge)."""
    from document_automation_spark.golden import graph_ann_rows

    ivf = _ivf_oracle_sql(candidates_only=True)
    # round-5 sweep (pure mirror, BENCH/BASELINE.md): 3 NN-descent rounds
    # dominate 2 (recall 0.88 vs 0.84 at LOWER scan), and beam=8 on the
    # SAME graph buys the high-recall point 0.94 @ ~30% scanned
    graph_rows = graph_ann_rows(n_rounds=3)
    graph_hi_rows = graph_ann_rows(n_rounds=3, beam=8)
    if ivf is None or graph_rows is None or graph_hi_rows is None:
        return None
    graph_vals = ", ".join(
        f"({q}, {h}, {s})" for (q, h, s) in graph_rows
    )
    graph_hi_vals = ", ".join(
        f"({q}, {h}, {s})" for (q, h, s) in graph_hi_rows
    )
    return f"""
    WITH brute AS (
        SELECT query_vec_id, vec_id FROM (
            WITH scored AS ({_COSINE_PAIR_SQL})
            SELECT query_vec_id, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_vec_id ORDER BY cosine DESC, vec_id
                   ) AS rank
            FROM scored
        ) WHERE rank <= 10
    ),
    cands AS (
        SELECT 'lsh' AS method, * FROM ({_lsh_oracle_sql(candidates_only=True)})
        UNION ALL
        SELECT 'lsh_mp1' AS method, * FROM ({_lsh_oracle_sql(probe_bits=1, candidates_only=True)})
        UNION ALL
        SELECT 'lsh_2tables' AS method, * FROM ({_lsh_oracle_sql(n_tables=2, candidates_only=True)})
        UNION ALL
        SELECT 'ivf' AS method, * FROM ({ivf})
    ),
    scans AS (
        SELECT method, query_vec_id, CAST(COUNT(*) AS BIGINT) AS n_scanned
        FROM cands GROUP BY method, query_vec_id
    ),
    topk AS (
        SELECT method, query_vec_id, vec_id FROM (
            SELECT method, query_vec_id, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY method, query_vec_id
                       ORDER BY cosine DESC, vec_id
                   ) AS rank
            FROM cands) WHERE rank <= 10
    ),
    hits AS (
        SELECT m.method, m.query_vec_id,
               CAST(COUNT(b.vec_id) AS BIGINT) AS n_hits
        FROM topk m LEFT JOIN brute b
          ON m.query_vec_id = b.query_vec_id AND m.vec_id = b.vec_id
        GROUP BY m.method, m.query_vec_id
    ),
    bucket_methods AS (
        SELECT h.method, h.query_vec_id, h.n_hits, s.n_scanned
        FROM hits h JOIN scans s
          ON h.method = s.method AND h.query_vec_id = s.query_vec_id
    ),
    graph_method AS (
        SELECT 'graph' AS method,
               CAST(query_vec_id AS BIGINT) AS query_vec_id,
               CAST(n_hits AS BIGINT) AS n_hits,
               CAST(n_scanned AS BIGINT) AS n_scanned
        FROM (VALUES {graph_vals}) AS g(query_vec_id, n_hits, n_scanned)
    ),
    graph_hi_method AS (
        SELECT 'graph_hi' AS method,
               CAST(query_vec_id AS BIGINT) AS query_vec_id,
               CAST(n_hits AS BIGINT) AS n_hits,
               CAST(n_scanned AS BIGINT) AS n_scanned
        FROM (VALUES {graph_hi_vals}) AS g(query_vec_id, n_hits, n_scanned)
    )
    SELECT method, query_vec_id, n_hits,
           ROUND(n_hits / 10.0, 6) AS recall_at_10,
           n_scanned
    FROM (SELECT * FROM bucket_methods
          UNION ALL SELECT * FROM graph_method
          UNION ALL SELECT * FROM graph_hi_method)
    """


@register("ann_recall_eval", lambda: _ann_recall_sql())
def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality quantified (round-4 verdict #4): per-query recall@10 of
    the two approximate methods against exact brute force —

    * LSH (``similarity.lsh_bucketed_topk``: deterministic hyperplane
      buckets + equi-join; its own oracle-green seat in rounds 2-3), and
    * IVF (``ivf.ivf_topk``: seeded-kmeans centroids, distributed
      assignment + probing, bucket equi-join; oracle-green seat in r3 —
      pytest still pins full-probe == brute-force),

    merged into ONE seat under the driver's 50-entry cap: the eval runs
    the methods end to end AND scores them, so S10 coverage is preserved
    while adding the recall-vs-brute-force quantification the reference
    reports for its FAISS index (/root/reference/README.md:46).

    Every method row also carries its SCAN BUDGET (``n_scanned`` =
    candidate cosines that query evaluated), so the seat states the full
    trade.  Measured at sf0.01, mean recall@10 (scan fraction of 500):
    LSH base 0.20 (6%); LSH 2 tables 0.30 (13%); LSH multiprobe r=1
    0.48 (29%); IVF 3/8 0.64 (39%); **graph 0.88 (22.6%)** and
    **graph_hi 0.94 (29.8%)** — the graph-ANN tier
    (``operators/graph_ann``: LSH-init NN-descent kNN graph + fixed-hop
    beam search, the distributed re-expression of the reference's FAISS
    HNSW) is the only method meeting the production bar recall ≥ 0.8 at
    ≤ 25% scanned.  Round-5 sweep (pure mirror, 72 configs): 3
    NN-descent rounds dominate 2 (0.88 vs 0.84 at LOWER scan), and
    beam=8 on the SAME built graph buys the 0.94 high-recall point —
    both rows share one graph build.  The bucket methods' measured
    frontier caps near 0.6 under the 25% budget on these
    weakly-clustered vectors (sweep in tests/test_graph_ann.py +
    SCALE.md).
    """
    from document_automation_spark.operators.graph_ann import (
        graph_beam_search,
        knn_graph,
    )
    from document_automation_spark.operators.ivf import ivf_topk
    from document_automation_spark.operators.similarity import (
        brute_force_topk,
        lsh_bucketed_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_vec_id"),
        F.col("embedding").alias("query_embedding"),
    )
    brute = brute_force_topk(emb, queries_df, k=10).select("query_vec_id", "vec_id")
    sel = ["query_vec_id", "vec_id", "n_scanned"]
    lsh = lsh_bucketed_topk(
        emb, queries_df, k=10, n_planes=4, include_scanned=True
    ).select(*sel)
    lsh_mp = lsh_bucketed_topk(
        emb, queries_df, k=10, n_planes=4, probe_bits=1, include_scanned=True
    ).select(*sel)
    lsh_2t = lsh_bucketed_topk(
        emb, queries_df, k=10, n_planes=4, n_tables=2, include_scanned=True
    ).select(*sel)
    ivf = ivf_topk(
        emb, queries_df, n_centroids=8, n_probe=3, k=10, seed=42,
        quantize_dp=6, include_scanned=True,
    ).select(*sel)
    # the index build is a separate (re-used) artifact: persist it so the
    # H search hops read the built graph, not H rebuilds of its lineage.
    # n_rounds=3 (round-5 sweep): dominates 2 rounds — recall 0.88 vs
    # 0.84 at LOWER scan; both search rows share the ONE built graph
    graph_df = knn_graph(emb, k=12, n_rounds=3).persist()
    graph = graph_beam_search(
        emb, graph_df, queries_df, k=10, n_seeds=8, beam=6, n_hops=3
    ).select(*sel)
    graph_hi = graph_beam_search(
        emb, graph_df, queries_df, k=10, n_seeds=8, beam=8, n_hops=3
    ).select(*sel)
    methods = (
        lsh.withColumn("method", F.lit("lsh"))
        .unionByName(lsh_mp.withColumn("method", F.lit("lsh_mp1")))
        .unionByName(lsh_2t.withColumn("method", F.lit("lsh_2tables")))
        .unionByName(ivf.withColumn("method", F.lit("ivf")))
        .unionByName(graph.withColumn("method", F.lit("graph")))
        .unionByName(graph_hi.withColumn("method", F.lit("graph_hi")))
    )
    hits = (
        methods.join(
            brute.withColumn("_hit", F.lit(1)),
            ["query_vec_id", "vec_id"],
            "left",
        )
        .groupBy("method", "query_vec_id")
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hits"),
            F.first("n_scanned").cast("long").alias("n_scanned"),
        )
    )
    return hits.select(
        "method",
        "query_vec_id",
        "n_hits",
        F.round(F.col("n_hits") / F.lit(10.0), 6).alias("recall_at_10"),
        "n_scanned",
    )


# =====================================================================
# Text analysis
# =====================================================================

def _token_stats_sql() -> str:
    # n_tokens_bpe + the rolling-hash fingerprint folded in (each was its
    # own registry entry in earlier rounds — merged to free seats under
    # the driver's 50-entry report cap; the standalone operators
    # bpe_token_counts / rolling_fingerprint_col remain available).
    # Since round 5 session 3 the quality_features seat is folded in the
    # same way (doc_id join — both operators still run in full): the
    # DuckDB twin recomputes the entire Python scoring policy in the
    # qf CTE chain below, freeing a seat for data_mixing.
    return rf"""
    WITH ts AS (
        SELECT doc_id,
               length(text) AS n_chars_measured,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens_ws,
               ROUND(CAST(length(text) - length(replace(text, ' ', '')) AS DOUBLE)
                     / length(text), 6) AS space_ratio,
               CAST(len(regexp_extract_all(text, '{_BPE_RE_SQL}')) AS BIGINT)
                   AS n_tokens_bpe,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(str_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
                   (acc, c) -> (acc * 31 + c) % 140737488355213) AS fingerprint
        FROM documents
    ),
    base AS ({_QUAL_TOKS_SQL}),
    feats AS (
        SELECT doc_id,
          CAST(len(toks) AS DOUBLE) AS n_tokens,
          CASE WHEN length(text) = 0 THEN 0.0
               ELSE len(regexp_extract_all(text, '[^\p{{L}}\p{{N}}_\s]'))
                    / CAST(length(text) AS DOUBLE) END AS punct_ratio,
          CASE WHEN len(toks) = 0 THEN 0.0
               ELSE len(list_filter(toks, t -> list_contains({_STOPWORDS_SQL},
                        trim(lower(t), '.,!?;:'))))
                    / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
          CASE WHEN len(toks) = 0 THEN 0.0
               ELSE list_sum(list_transform(toks, t -> length(t)))
                    / CAST(len(toks) AS DOUBLE) END AS mean_word_len,
          length(text) AS n_chars
        FROM base
    ),
    qf AS (
        SELECT doc_id, n_tokens, punct_ratio, stopword_ratio, mean_word_len,
               greatest(1.0
                   - CASE WHEN n_chars < 50 THEN 0.5 ELSE 0.0 END
                   - CASE WHEN punct_ratio > 0.3 THEN 0.3 ELSE 0.0 END
                   - CASE WHEN mean_word_len > 15
                            OR (n_tokens > 0 AND mean_word_len < 2)
                          THEN 0.2 ELSE 0.0 END,
                   0.0) AS quality
        FROM feats
    )
    SELECT ts.*, qf.n_tokens, qf.punct_ratio, qf.stopword_ratio,
           qf.mean_word_len, qf.quality
    FROM ts JOIN qf USING (doc_id)
    """


@register("token_stats", lambda: _token_stats_sql())
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/length stats + the composite quality features in one seat
    (quality_features folded here round 5 session 3 — lossless doc_id
    join, both operators run in full; see _token_stats_sql)."""
    from document_automation_spark.operators.text_analysis import (
        quality_features,
        token_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    out = token_stats(docs, include_bpe=True, include_fingerprint=True)
    ts = out.select(
        "doc_id",
        F.col("n_chars_measured").cast("long").alias("n_chars_measured"),
        F.col("n_tokens_ws").cast("long").alias("n_tokens_ws"),
        "space_ratio",
        "n_tokens_bpe",
        "fingerprint",
    )
    return ts.join(quality_features(docs), "doc_id")


# (detect_language_script no longer has its own registry entry: its
# script CASE column rides the language_id_kernel seat — slot freed for
# repetition_features; the standalone operator remains available.)
_SCRIPT_CASE_SQL = """
           CASE WHEN regexp_matches(text, '[぀-ヿ]') THEN 'ja'
                WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
                WHEN regexp_matches(text, '[가-힯]') THEN 'ko'
                WHEN regexp_matches(text, '[Ѐ-ӿ]') THEN 'ru'
                ELSE 'latin' END AS detected_script
"""


# (rolling_fingerprint no longer has its own registry entry: the
# fingerprint column is checked inside token_stats — seat freed for
# duplicate_spans; rolling_fingerprint_col remains available.)


def _duplicate_spans_sql(k: int = 32, min_docs: int = 2) -> str:
    """Oracle twin of the exact-substring span dedup over the
    duplicate-enriched corpus.  Compares RAW k-gram strings where the
    Spark operator compares xxhash64 values — identical spans absent
    collisions, so this also guards against a collision ever surfacing at
    fixture scale."""
    return f"""
    WITH {_DOCS_WITH_DUPS_SQL},
    wins AS (
        SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
               substr(text, CAST(i AS INT), {k}) AS g
        FROM docs_dup, LATERAL unnest(generate_series(1, length(text) - {k - 1})) AS t(i)
        WHERE length(text) >= {k}
    ),
    dup AS (SELECT g FROM wins GROUP BY g HAVING COUNT(DISTINCT doc_id) >= {min_docs}),
    marked AS (SELECT doc_id, pos FROM wins JOIN dup USING (g)),
    flagged AS (
        SELECT doc_id, pos,
               CASE WHEN pos - LAG(pos, 1, 0) OVER (PARTITION BY doc_id ORDER BY pos) > {k}
                    THEN 1 ELSE 0 END AS gap
        FROM marked
    ),
    islands AS (
        SELECT doc_id, pos,
               SUM(gap) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM flagged
    )
    SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) + {k} AS BIGINT) AS span_end
    FROM islands GROUP BY doc_id, island
    """


# (duplicate_spans no longer has its own registry seat: span_cut_corpus'
# oracle embeds _duplicate_spans_sql as its spans CTE and its md5-per-doc
# output depends byte-exactly on every span, so the fold is lossless —
# slot freed for the round-5 PII/decontamination seats.  bench.py keeps a
# pinned bare-operator row so the number stays comparable across rounds.)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring duplicate spans (Lee et al. 2022
    span-level dedup) over the duplicate-enriched corpus: the id-remapped
    full-text copies guarantee whole-document spans, and any naturally
    shared 32-gram between distinct fixture docs surfaces as well.  The
    Spark side marks windows by xxhash64; the oracle re-derives the same
    spans from the raw gram strings (now the spans CTE of the
    span_cut_corpus seat)."""
    from document_automation_spark.operators.dedup import duplicate_spans

    return duplicate_spans(_docs_with_dups(spark, sf_dir), k=32, min_docs=2)


def _span_cut_sql(k: int = 32) -> str:
    """Twin of the span SURGERY (cut_spans): the spans CTE reuses the
    raw-gram oracle above, and the text rewrite is re-derived relationally
    — per-doc kept segments via lag(span_end) + the tail, concatenated in
    position order — where Spark runs a single JVM fold; identical output
    proves the fold.  Compared as md5 + lengths (registry outputs carry no
    full text)."""
    return f"""
    WITH {_DOCS_WITH_DUPS_SQL},
    spans AS (SELECT doc_id, span_start, span_end FROM ({_duplicate_spans_sql(k=k)})),
    w AS (
        SELECT s.doc_id, s.span_start, s.span_end, d.text,
               LAG(s.span_end, 1, 0) OVER (
                   PARTITION BY s.doc_id ORDER BY s.span_start
               ) AS prev_end
        FROM spans s JOIN docs_dup d USING (doc_id)
    ),
    segs AS (
        SELECT doc_id, span_start AS ord,
               CASE WHEN span_start > prev_end
                    THEN substring(text, CAST(prev_end + 1 AS INT),
                                   CAST(span_start - prev_end AS INT))
                    ELSE '' END AS seg
        FROM w
        UNION ALL
        SELECT t.doc_id, t.max_end AS ord,
               substring(d.text, CAST(t.max_end + 1 AS INT), length(d.text)) AS seg
        FROM (SELECT doc_id, MAX(span_end) AS max_end FROM spans GROUP BY doc_id) t
        JOIN docs_dup d USING (doc_id)
    ),
    cut AS (
        SELECT doc_id, string_agg(seg, '' ORDER BY ord) AS new_text
        FROM segs GROUP BY doc_id
    ),
    cut_chars AS (
        SELECT doc_id, SUM(span_end - span_start) AS cut FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(cc.cut, 0) AS BIGINT) AS n_cut_chars,
           CAST(length(COALESCE(c.new_text, d.text)) AS BIGINT) AS n_chars_after,
           md5(COALESCE(c.new_text, d.text)) AS content_md5
    FROM docs_dup d
    LEFT JOIN cut c USING (doc_id)
    LEFT JOIN cut_chars cc USING (doc_id)
    """


@register("span_cut_corpus", lambda: _span_cut_sql())
def q_span_cut_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus AFTER exact-substring span surgery (round-4 verdict #3:
    ``cut_spans`` gets a driver-visible seat now that it is also wired
    into the ingest CLI as ``--cut-dup-spans``).  Since round 5 this seat
    also carries the span-FINDING check: its oracle embeds
    ``_duplicate_spans_sql`` as the spans CTE, and the per-doc md5 output
    depends byte-exactly on every span, so the former ``duplicate_spans``
    seat folds in losslessly.  Spark cuts via one JVM
    ``F.aggregate`` fold over each doc's sorted span array; the oracle
    re-derives the rewrite relationally from raw-gram spans and compares
    md5 + lengths of every rewritten text — a byte-exact check on the
    surgery without shipping full text through the driver's canonicalizer.
    """
    from document_automation_spark.operators.dedup import cut_spans, duplicate_spans

    docs = _docs_with_dups(spark, sf_dir)
    spans = duplicate_spans(docs, k=32, min_docs=2)
    return cut_spans(docs, spans).select(
        "doc_id",
        F.col("n_cut_chars").cast("long").alias("n_cut_chars"),
        F.length("text").cast("long").alias("n_chars_after"),
        F.md5(F.col("text")).alias("content_md5"),
    )


# DuckDB twin of kernels/textstats._TOKEN_RE.  RE2 quirks accounted for:
# \x{4e00}-\x{9fff} spells the CJK range, '' escapes the quote inside the
# SQL string; \s is ASCII in RE2 vs unicode in Python — verified equivalent
# on the corpus (no non-ASCII whitespace in Common-Crawl-style testdata).
_BPE_RE_SQL = (
    r"[A-Za-z]+(?:''[A-Za-z]+)?|[0-9]+|[\x{4e00}-\x{9fff}]"
    r"|[^\sA-Za-z0-9\x{4e00}-\x{9fff}]"
)


# (bpe_token_counts no longer has its own registry entry: its column is
# checked inside token_stats — seat freed for simhash_near_dup_pairs under
# the driver's 50-entry report cap.)


# whitespace tokens of trim'd text, as the kernel's re.split(r"\s+") does
_QUAL_TOKS_SQL = r"""
    SELECT doc_id, text,
           CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []
                ELSE regexp_split_to_array(
                    trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+')
           END AS toks
    FROM documents
"""

_STOPWORDS_SQL = (
    "['the','a','an','and','or','of','to','in','is','are','was','were',"
    "'be','been','it','this','that','for','on','with','as','at','by']"
)


# (quality_features no longer has its own registry entry: its full
# output — Python scoring policy recomputed by the DuckDB qf CTE chain —
# rides the token_stats seat via a doc_id join; slot freed for
# data_mixing under the driver's 50-entry cap.  The standalone operator
# text_analysis.quality_features remains available and still runs in
# full inside that seat.)


# ---------------------------------------------------------------------
# Data mixing + sequence packing (LLM pretraining batcher stages)
# ---------------------------------------------------------------------

_MIX_U_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,15))::UBIGINT / POW(2.0,60)"


@register(
    "data_mixing",
    f"""
    WITH counts AS (SELECT lang, COUNT(*) AS n_group FROM documents GROUP BY lang),
    wt AS (SELECT lang, n_group, POW(CAST(n_group AS DOUBLE), 0.5) AS w FROM counts),
    rates AS (
        SELECT lang, n_group,
               ROUND(LEAST(1.0, 250.0 * (w / (SELECT SUM(w) FROM wt)) / n_group), 6)
                   AS rate
        FROM wt
    ),
    temp AS (
        SELECT 'temperature' AS strategy, d.doc_id, d.lang, r.rate AS detail
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE {_MIX_U_SQL} < r.rate
    ),
    u AS (SELECT doc_id, lang, {_MIX_U_SQL} AS u FROM documents),
    ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY u, doc_id) AS rk
        FROM u
    ),
    quota AS (
        SELECT 'quota' AS strategy, doc_id, lang, CAST(rk AS DOUBLE) AS detail
        FROM ranked WHERE rk <= 40
    ),
    uw AS (SELECT lang, n_group, POW(CAST(n_group AS DOUBLE), 0.3) AS w FROM counts),
    urates AS (
        SELECT lang, n_group,
               ROUND(600.0 * (w / (SELECT SUM(w) FROM uw)) / n_group, 6) AS rate
        FROM uw
    ),
    ucop AS (
        SELECT d.doc_id, d.lang,
               CAST(FLOOR(r.rate) AS BIGINT)
               + CASE WHEN {_MIX_U_SQL} < r.rate - FLOOR(r.rate)
                      THEN 1 ELSE 0 END AS n_copies
        FROM documents d JOIN urates r ON d.lang = r.lang
    ),
    upsample AS (
        SELECT 'upsample' AS strategy, doc_id, lang, CAST(c AS DOUBLE) AS detail
        FROM (SELECT * FROM ucop WHERE n_copies > 0),
             LATERAL unnest(generate_series(0, CAST(n_copies - 1 AS BIGINT))) AS t(c)
    )
    SELECT * FROM temp UNION ALL SELECT * FROM quota
    UNION ALL SELECT * FROM upsample
    """,
)
def q_data_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing (operators/mixing.py), three strategies as a tagged
    union: temperature-0.5 DOWNsampling to ~250 docs, exact 40-per-lang
    stratified quotas, and temperature-0.3 UPsampling to ~600 rows with
    repeats (detail = copy index).  The md5-hash uniform draw is a
    multiple of 2^-60 and rates are rounded to 6 dp, so ``u < rate`` /
    ``u < frac`` can never straddle a cross-engine pow ulp (see module
    docstring)."""
    from document_automation_spark.operators.mixing import (
        stratified_quota_sample,
        temperature_resample,
        upsample_with_repeats,
    )

    docs = _t(spark, sf_dir, "documents")
    temp = temperature_resample(docs, "lang", alpha=0.5, target_rows=250).select(
        F.lit("temperature").alias("strategy"),
        "doc_id",
        "lang",
        F.col("rate").alias("detail"),
    )
    quota = stratified_quota_sample(docs, "lang", quota=40).select(
        F.lit("quota").alias("strategy"),
        "doc_id",
        "lang",
        F.col("sample_rank").cast("double").alias("detail"),
    )
    ups = upsample_with_repeats(docs, "lang", alpha=0.3, target_rows=600).select(
        F.lit("upsample").alias("strategy"),
        "doc_id",
        "lang",
        F.col("copy_idx").cast("double").alias("detail"),
    )
    return temp.unionByName(quota).unionByName(ups)


@register(
    "sequence_packing",
    r"""
    WITH toks AS (
        SELECT doc_id, source,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
        FROM documents
    ),
    cum AS (
        SELECT doc_id, source, CAST(n AS BIGINT) AS n,
               CAST(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end
        FROM toks WHERE n > 0
    )
    SELECT source, CAST(c AS BIGINT) AS chunk_id, doc_id,
           CAST(GREATEST(c*256 - (cum_end - n), 0) AS BIGINT) AS doc_token_offset,
           CAST(GREATEST((cum_end - n) - c*256, 0) AS BIGINT) AS chunk_token_offset,
           CAST(LEAST(cum_end, (c+1)*256) - GREATEST(cum_end - n, c*256) AS BIGINT)
               AS seg_tokens
    FROM cum, LATERAL unnest(generate_series((cum_end - n) // 256,
                                             (cum_end - 1) // 256)) AS t(c)
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-chop sequence packing at 256 tokens per chunk, sharded by
    source (operators/packing.py) — the oracle replays the integer layout
    (per-shard cumulative sums + generate_series segment fold), so the
    full segment map is hash-exact."""
    from document_automation_spark.operators.packing import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), seq_len=256)


def _pagerank_leg_sql(edges_sql: str, n_iters: int = 5) -> str:
    """Oracle twin of operators/linkgraph.pagerank over an arbitrary
    ``edges_sql`` (columns src, dst): the power iteration unrolled as
    chained CTEs (standard SQL forbids aggregates in a recursive term),
    per-iteration ROUND(...,12) matching the Spark side exactly.
    Self-contained (own WITH) so two legs can union in one query."""
    iters = []
    for k in range(1, n_iters + 1):
        prev = f"r{k - 1}"
        iters.append(f"""
    r{k} AS (
        SELECT nodes.node,
               ROUND((1.0 - 0.85) / (SELECT n FROM nn)
                     + 0.85 * (COALESCE(inb.inbound, 0)
                         + (SELECT COALESCE(SUM(p.rank), 0) FROM {prev} p
                            LEFT JOIN deg ON p.node = deg.node
                            WHERE deg.node IS NULL) / (SELECT n FROM nn)),
                     12) AS rank
        FROM nodes LEFT JOIN (
            SELECT e.dst AS node, SUM(p.rank / d.out_deg) AS inbound
            FROM edges e JOIN {prev} p ON e.src = p.node
            JOIN deg d ON e.src = d.node
            GROUP BY e.dst
        ) inb ON nodes.node = inb.node
    )""")
    return f"""
    WITH edges AS ({edges_sql}),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
        )
    ),
    deg AS (SELECT src AS node, COUNT(*) AS out_deg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, ROUND(1.0 / (SELECT n FROM nn), 12) AS rank FROM nodes),
    {','.join(iters)}
    SELECT CAST(node AS VARCHAR) AS node, ROUND(rank, 9) AS rank FROM r{n_iters}
    """


_PAGERANK_NUM_EDGES_SQL = """SELECT DISTINCT (doc_id * 7 + 3) % 97 AS src,
                        (doc_id * 31 + 11) % 97 AS dst
        FROM documents"""


def _synth_host_sql(e: str) -> str:
    """Deterministic synthetic host for the domain-PageRank leg — covers
    every branch of the registrable-domain fold (www + bare on a 2-level
    ccTLD suffix, deep + bare on .com, an IPv4 literal)."""
    m13 = f"CAST(({e}) % 13 AS VARCHAR)"
    return (
        f"CASE ({e}) % 5 "
        f"WHEN 0 THEN 'www.site' || {m13} || '.co.uk' "
        f"WHEN 1 THEN 'site' || {m13} || '.co.uk' "
        f"WHEN 2 THEN 'a' || CAST(({e}) % 7 AS VARCHAR) || '.site' || {m13} || '.com' "
        f"WHEN 3 THEN 'site' || {m13} || '.com.' "  # trailing-dot FQDN
        f"ELSE '10.0.0.' || {m13} END"
    )


def _registrable_sql(h: str, s: str) -> str:
    """DuckDB replay of operators.domains.registrable_domain_col over a
    host column ``h`` with its pre-split label list ``s`` — SAME suffix
    list (imported, not copied).  Callers must strip trailing dots from
    ``h`` BEFORE splitting (mirroring the operator's FQDN handling)."""
    from document_automation_spark.operators.domains import TWO_LEVEL_SUFFIXES

    suffixes = ", ".join(f"'{x}'" for x in TWO_LEVEL_SUFFIXES)
    last2 = f"({s}[-2] || '.' || {s}[-1])"
    return (
        f"CASE WHEN regexp_matches({h}, '^[0-9]+(\\.[0-9]+){{3}}$') "
        f"OR len({s}) <= 2 THEN {h} "
        f"WHEN {last2} IN ({suffixes}) "
        f"THEN {s}[-3] || '.' || {last2} "
        f"ELSE {last2} END"
    )


def _pagerank_union_sql(n_iters: int = 5) -> str:
    dom_edges = f"""SELECT DISTINCT {_registrable_sql('h1', 's1')} AS src,
                        {_registrable_sql('h2', 's2')} AS dst
        FROM (SELECT h1, h2, string_split(h1, '.') AS s1,
                     string_split(h2, '.') AS s2
              FROM (SELECT regexp_replace({_synth_host_sql('doc_id * 7 + 3')},
                                          '\\.+$', '') AS h1,
                           regexp_replace({_synth_host_sql('doc_id * 17 + 5')},
                                          '\\.+$', '') AS h2
                    FROM documents))"""
    return (
        f"SELECT 'graph' AS leg, * FROM ({_pagerank_leg_sql(_PAGERANK_NUM_EDGES_SQL, n_iters)})"
        f" UNION ALL "
        f"SELECT 'domain' AS leg, * FROM ({_pagerank_leg_sql(dom_edges, n_iters)})"
    )


@register(
    "robots_exclusion",
    """
    WITH hosts AS (
        SELECT 'h' || CAST(doc_id AS VARCHAR) || '.example.com' AS host,
               CASE WHEN doc_id % 3 = 0 THEN
                 'User-agent: *' || chr(10) || 'Disallow: /g'
                 || CAST(doc_id AS VARCHAR)
               WHEN doc_id % 4 = 1 THEN
                 'User-agent: otherbot' || chr(10) || 'Disallow: /'
               WHEN doc_id = 4 THEN
                 -- CRLF line endings (RFC 9309 allows them; must gate
                 -- identically to LF)
                 'User-agent: *' || chr(13) || chr(10) || 'Disallow: /'
                 || chr(13)
               ELSE
                 '# snapshot' || chr(10) || 'User-agent: CCBot' || chr(10)
                 || '# ai crawlers' || chr(10) || chr(10)
                 || 'User-agent: extrabot' || chr(10)
                 || 'Disallow: /p' || CAST(doc_id AS VARCHAR) || chr(10)
                 || 'Allow: /p' || CAST(doc_id AS VARCHAR) || '/open'
                 || chr(10) || 'Disallow:' || chr(10) || chr(10)
                 || 'User-agent: *' || chr(10) || 'Disallow: /g'
                 || CAST(doc_id AS VARCHAR)
               END AS txt
        FROM documents WHERE doc_id < 11
    ),
    lines0 AS (
        -- CR stripped first (RFC 9309 allows CRLF; trim() only removes
        -- spaces), mirroring the Spark fold
        SELECT host, i,
               trim(regexp_replace(regexp_replace(s[i], chr(13), '', 'g'),
                                   '#.*$', '')) AS line FROM (
            SELECT host, string_split(txt, chr(10)) AS s,
                   unnest(generate_series(1, len(string_split(txt, chr(10))))) AS i
            FROM hosts)
    ),
    -- RFC 9309: blank/comment-only lines are skippable whitespace; drop
    -- them BEFORE indexing so they cannot split a User-agent island
    lines1 AS (
        SELECT host, line,
               ROW_NUMBER() OVER (PARTITION BY host ORDER BY i) AS i
        FROM lines0 WHERE line <> ''
    ),
    lines AS (
        SELECT host, i,
               lower(trim(split_part(line, ':', 1))) AS key,
               trim(substr(line, strpos(line, ':') + 1)) AS val
        FROM lines1 WHERE strpos(line, ':') > 0
    ),
    ua AS (
        SELECT host, i, lower(val) AS agent,
               i - ROW_NUMBER() OVER (PARTITION BY host ORDER BY i) AS isl
        FROM lines WHERE key = 'user-agent'
    ),
    rl AS (
        SELECT host, i, CASE WHEN key = 'allow' THEN 'A' ELSE 'D' END AS rule,
               val AS path_prefix
        FROM lines WHERE key IN ('allow', 'disallow') AND val <> ''
    ),
    gov AS (
        SELECT r.host, r.i, r.rule, r.path_prefix, MAX(u.i) AS last_ua
        FROM rl r JOIN ua u ON u.host = r.host AND u.i < r.i
        GROUP BY r.host, r.i, r.rule, r.path_prefix
    ),
    rules AS (
        SELECT DISTINCT g.host, a.agent, g.rule, g.path_prefix
        FROM gov g
        JOIN ua u ON u.host = g.host AND u.i = g.last_ua
        JOIN ua a ON a.host = g.host AND a.isl = u.isl
    ),
    mine AS (SELECT * FROM rules WHERE agent IN ('ccbot', '*')),
    sel AS (
        SELECT host,
               CASE WHEN bool_or(agent = 'ccbot') THEN 'ccbot' ELSE '*' END
                   AS chosen
        FROM mine GROUP BY host
    ),
    eff AS (
        SELECT m.host, m.rule, m.path_prefix
        FROM mine m JOIN sel s ON m.host = s.host AND m.agent = s.chosen
    ),
    pages AS (
        SELECT DISTINCT
               'h' || CAST(doc_id % 11 AS VARCHAR) || '.example.com' AS phost,
               CASE doc_id % 5
                 WHEN 0 THEN '/p' || CAST(doc_id % 11 AS VARCHAR)
                 WHEN 1 THEN '/p' || CAST(doc_id % 11 AS VARCHAR) || '/open/x'
                 WHEN 2 THEN '/g' || CAST(doc_id % 11 AS VARCHAR)
                 WHEN 3 THEN ''
                 ELSE '/p' || CAST(doc_id % 11 AS VARCHAR) || 'x' END AS path
        FROM documents
    ),
    best AS (
        SELECT p.phost, p.path, e.rule,
               ROW_NUMBER() OVER (
                   PARTITION BY p.phost, p.path
                   ORDER BY length(e.path_prefix) DESC, e.rule ASC
               ) AS rn
        FROM pages p
        LEFT JOIN eff e
          ON e.host = p.phost
         AND starts_with(CASE WHEN p.path = '' THEN '/' ELSE p.path END,
                         e.path_prefix)
    )
    SELECT 'http://' || phost || path AS url,
           (rule IS NULL OR rule = 'A') AS allowed
    FROM best WHERE rn = 1
    """,
)
def q_robots_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots-exclusion parse + retroactive opt-out gate
    (operators/robots.py) for agent CCBot over a deterministic
    doc-derived robots snapshot covering every REP branch: consecutive
    multi-agent groups, comments, empty Disallow (allow-all), exact
    group REPLACING '*', longest-prefix precedence, Allow-wins ties,
    group-less and rule-less hosts, a host-wide ``Disallow: /`` opt-out,
    bare URLs (no path — REP root, normalized to ``/`` so the opt-out
    blocks the homepage too), a comment + blank line inside a User-agent
    run (RFC 9309 skippable whitespace, must not split the group), and
    mixed-case snapshot hosts (normalized at parse time).  The DuckDB oracle re-parses the
    SAME snapshot (gaps-and-islands for the sequential User-agent
    grouping the Spark side does with one JVM fold) and replays the
    gate's precedence with a window."""
    from document_automation_spark.operators.robots import parse_robots, robots_gate

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    nl = F.lit("\n")
    txt = (
        F.when(
            d % 3 == 0,
            F.concat(F.lit("User-agent: *"), nl, F.lit("Disallow: /g"), d.cast("string")),
        )
        .when(
            d % 4 == 1,
            F.concat(F.lit("User-agent: otherbot"), nl, F.lit("Disallow: /")),
        )
        .when(
            d == 4,
            # CRLF endings — must gate identically to LF (RFC 9309)
            F.concat(F.lit("User-agent: *\r\nDisallow: /\r")),
        )
        .otherwise(
            F.concat(
                F.lit("# snapshot"), nl,
                F.lit("User-agent: CCBot"), nl,
                # comment + blank line INSIDE the User-agent run — RFC 9309
                # skippable whitespace, must not split the group
                F.lit("# ai crawlers"), nl, nl,
                F.lit("User-agent: extrabot"), nl,
                F.lit("Disallow: /p"), d.cast("string"), nl,
                F.lit("Allow: /p"), d.cast("string"), F.lit("/open"), nl,
                F.lit("Disallow:"), nl, nl,
                F.lit("User-agent: *"), nl,
                F.lit("Disallow: /g"), d.cast("string"),
            )
        )
    )
    robots = docs.where(d < 11).select(
        # mixed-case snapshot host: parse_robots must lowercase it or the
        # gate join (on the page's lowercased host) silently fails open
        F.concat(F.lit("H"), d.cast("string"), F.lit(".Example.COM")).alias("host"),
        txt.alias("robots_txt"),
    )
    hid = (d % 11).cast("string")
    path = (
        F.when(d % 5 == 0, F.concat(F.lit("/p"), hid))
        .when(d % 5 == 1, F.concat(F.lit("/p"), hid, F.lit("/open/x")))
        .when(d % 5 == 2, F.concat(F.lit("/g"), hid))
        .when(d % 5 == 3, F.lit(""))  # bare URL — REP root, must equal '/'
        .otherwise(F.concat(F.lit("/p"), hid, F.lit("x")))
    )
    pages = docs.select(
        F.concat(F.lit("http://h"), hid, F.lit(".example.com"), path).alias("url")
    ).distinct()
    out = robots_gate(pages, parse_robots(robots), agent="CCBot")
    return out.select("url", "allowed")


_ANCHOR_RE_SQL = '<a [^>]*href="([^"]+)"[^>]*>([^<]*)</a>'
_HOST_RE_SQL = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)"


@register(
    "anchor_text_terms",
    f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS ws0
        FROM documents
    ),
    corpus AS (
        SELECT 'http://s' || CAST(doc_id % 5 AS VARCHAR) || '.example.com/page'
                   AS url,
               '<a class="x" href="http://h' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.com/p">' || array_to_string(ws0[1:3], ' ')
               || '</a> filler <a href="/nav">Home Nav</a>'
               || CASE WHEN doc_id % 3 = 0
                  THEN '<a href="//h' || CAST((doc_id + 1) % 7 AS VARCHAR)
                       || '.example.com/q">Proto Rel</a>'
                  ELSE '<a href="mailto:x@y.example">Mail Me</a>' END AS html
        FROM toks
    ),
    anchors AS (
        SELECT lower(regexp_extract(url, '{_HOST_RE_SQL}', 1)) AS src,
               unnest(list_zip(
                   regexp_extract_all(html, '{_ANCHOR_RE_SQL}', 1),
                   regexp_extract_all(html, '{_ANCHOR_RE_SQL}', 2))) AS z
        FROM corpus
    ),
    resolved AS (
        SELECT CASE
                 WHEN starts_with(z[1], '//')
                 THEN lower(regexp_extract('https:' || z[1],
                                           '{_HOST_RE_SQL}', 1))
                 WHEN regexp_matches(z[1], '^[a-zA-Z][a-zA-Z0-9+.-]*:')
                 THEN lower(regexp_extract(z[1], '{_HOST_RE_SQL}', 1))
                 ELSE src END AS dst,
               z[2] AS atext
        FROM anchors WHERE src <> ''
    ),
    terms AS (
        SELECT dst, unnest(list_filter(
                   string_split_regex(lower(atext), '\\s+'), w -> w <> ''))
                   AS term
        FROM resolved WHERE dst <> ''
    )
    SELECT dst, term, CAST(COUNT(*) AS BIGINT) AS n_refs
    FROM terms GROUP BY dst, term
    """,
)
def q_anchor_text_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host anchor-text term aggregation
    (operators/linkgraph.anchor_text_terms — the off-page description
    signal web search and corpus-quality pipelines mine from the crawl's
    own hyperlinks) over a deterministic doc-derived HTML corpus covering
    every href-resolution branch: absolute http, relative (self-host),
    protocol-relative, and authority-less schemes (mailto — dropped).
    The DuckDB oracle rebuilds the identical corpus, replays the SAME
    anchor regex (Java∩RE2-identical subset, positional group zip) and
    re-derives host resolution with an authority regex that matches
    try_parse_url on exactly the href shapes the corpus contains."""
    from document_automation_spark.operators.linkgraph import anchor_text_terms
    from document_automation_spark.operators.webtext_quality import words_col

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id")
    html = F.concat(
        F.lit('<a class="x" href="http://h'),
        (m % 7).cast("string"),
        F.lit('.example.com/p">'),
        F.concat_ws(" ", F.slice(words_col(F.col("text")), 1, 3)),
        F.lit('</a> filler <a href="/nav">Home Nav</a>'),
        F.when(
            m % 3 == 0,
            F.concat(
                F.lit('<a href="//h'),
                ((m + 1) % 7).cast("string"),
                F.lit('.example.com/q">Proto Rel</a>'),
            ),
        ).otherwise(F.lit('<a href="mailto:x@y.example">Mail Me</a>')),
    )
    pages = docs.select(
        F.concat(
            F.lit("http://s"), (m % 5).cast("string"), F.lit(".example.com/page")
        ).alias("url"),
        html.alias("html"),
    )
    return anchor_text_terms(pages, html_is_binary=False)


def _synth_host_col(e: F.Column) -> F.Column:
    """Spark twin of _synth_host_sql (identical branch-by-branch)."""
    m13 = (e % 13).cast("string")
    return (
        F.when(e % 5 == 0, F.concat(F.lit("www.site"), m13, F.lit(".co.uk")))
        .when(e % 5 == 1, F.concat(F.lit("site"), m13, F.lit(".co.uk")))
        .when(
            e % 5 == 2,
            F.concat(
                F.lit("a"), (e % 7).cast("string"), F.lit(".site"), m13, F.lit(".com")
            ),
        )
        .when(e % 5 == 3, F.concat(F.lit("site"), m13, F.lit(".com.")))
        .otherwise(F.concat(F.lit("10.0.0."), m13))
    )


@register("host_pagerank", lambda: _pagerank_union_sql(5))
def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-graph PageRank (operators/linkgraph.py — the web-curation
    authority signal; Common Crawl publishes BOTH granularities of this
    ranking) as a tagged union: leg 'graph' runs 5 damped power
    iterations with uniform dangling-mass redistribution over a
    deterministic doc_id-derived 97-node graph (the round-5 original);
    leg 'domain' first folds synthetic hosts through
    ``operators.domains.registrable_domain_col`` (www/subdomain aliases
    onto their registration, 2-level ccTLD suffixes kept, IPv4 literals
    verbatim) and ranks the DOMAIN graph — the fold and the iteration
    both replayed by the DuckDB oracle with the same suffix list.  The
    production edge sources are :func:`linkgraph.host_link_edges` /
    :func:`linkgraph.domain_link_edges` over the extraction output —
    pinned against numpy power iteration in tests/test_linkgraph.py;
    this seat pins the distributed iteration cross-engine
    (per-iteration 12-dp rounding makes the doubles identical)."""
    from document_automation_spark.operators.domains import registrable_domain_col
    from document_automation_spark.operators.linkgraph import pagerank

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")

    def leg(tag: str, edges: DataFrame) -> DataFrame:
        out = pagerank(edges, n_iters=5, damping=0.85)
        return out.select(
            F.lit(tag).alias("leg"),
            F.col("node").cast("string").alias("node"),
            F.round("rank", 9).alias("rank"),
        )

    edges_num = docs.select(
        ((d * 7 + 3) % 97).alias("src"),
        ((d * 31 + 11) % 97).alias("dst"),
    ).distinct()
    edges_dom = docs.select(
        registrable_domain_col(_synth_host_col(d * 7 + 3)).alias("src"),
        registrable_domain_col(_synth_host_col(d * 17 + 5)).alias("dst"),
    ).distinct()
    return leg("graph", edges_num).unionByName(leg("domain", edges_dom))


def _hint_count_sql(hints: list) -> str:
    """Σ over hint n-grams of the non-overlapping occurrence count in
    ``padded`` (replace-based counting ≡ Python str.count)."""
    return " + ".join(
        f"(length(padded) - length(replace(padded, '{h}', ''))) // {len(h)}"
        for h in hints
    )


# deterministic mojibake synthesis for the encoding-repair leg of the
# language_id_kernel seat: every 7th doc gets this prefix in its
# UTF-8-as-cp1252 corrupted form (the real codec produces the literal at
# import time — covers 2-byte Latin-1 repairs, 3-byte punctuation repairs,
# and an adversarial repaired-chars-abut case via «…»).  No ASCII quote
# can appear in either form (all corruption bytes are >= 0x80), so both
# literals embed in single-quoted SQL verbatim.
_MOJI_CLEAN_PREFIX = "It’s a café — «naïve» über façade €99 ™ “quote… "
_MOJI_PREFIX = _MOJI_CLEAN_PREFIX.encode("utf-8").decode("cp1252")


def _mojibake_leg_sql() -> str:
    """DuckDB replay of operators.encoding.repair_mojibake over the
    synthesized corruption: same single-pass semantics (RE2 alternation is
    leftmost-first like Java's), same generated table — the CASE ladder is
    built from MOJIBAKE_TABLE, never hand-typed."""
    from document_automation_spark.operators.encoding import (
        MOJIBAKE_PATTERN,
        MOJIBAKE_TABLE,
    )

    whens = " ".join(f"WHEN '{m}' THEN '{r}'" for m, r in MOJIBAKE_TABLE)
    return f"""
    moji_in AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN '{_MOJI_PREFIX}' || text
                    ELSE text END AS mt
        FROM documents
    ),
    moji AS (
        SELECT doc_id, mt,
               array_to_string(list_transform(
                   string_split(
                       regexp_replace(replace(mt, chr(0), ''),
                                      '{MOJIBAKE_PATTERN}',
                                      chr(0) || '\\1' || chr(0), 'g'),
                       chr(0)),
                   t -> CASE t {whens} ELSE t END), '') AS repaired
        FROM moji_in
    )
    """


@register(
    "language_id_kernel",
    lambda: f"""
    WITH {_mojibake_leg_sql()},
    lang AS (
    SELECT doc_id,
      {_SCRIPT_CASE_SQL},
      CASE WHEN regexp_matches(text, '[\\x{{3040}}-\\x{{30ff}}]') THEN 'ja'
           WHEN regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') THEN 'zh'
           WHEN regexp_matches(text, '[\\x{{ac00}}-\\x{{d7af}}]') THEN 'ko'
           WHEN regexp_matches(text, '[\\x{{0400}}-\\x{{04ff}}]') THEN 'ru'
           WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
           WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_fr THEN 'es' ELSE 'fr' END AS detected_lang
    FROM (
        SELECT doc_id, text,
               {_hint_count_sql([' der ', ' die ', ' und ', ' ist ', ' von ', ' den '])} AS s_de,
               {_hint_count_sql([' the ', ' and ', ' of ', ' to ', ' in ', ' is '])} AS s_en,
               {_hint_count_sql([' el ', ' la ', ' los ', ' que ', ' de ', ' es '])} AS s_es,
               {_hint_count_sql([' le ', ' la ', ' les ', ' et ', ' des ', ' est '])} AS s_fr
        FROM (SELECT doc_id, text, ' ' || lower(text) || ' ' AS padded FROM documents)
    )
    )
    SELECT l.*,
           CAST(CASE WHEN m.repaired IS DISTINCT FROM replace(m.mt, chr(0), '')
                     THEN 1 ELSE 0 END
                AS BIGINT) AS was_mojibake,
           sha256(m.repaired) AS repaired_sha
    FROM lang l JOIN moji m USING (doc_id)
    """,
)
def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full language-ID kernel (script ranges + stopword-hint scoring with
    the sorted-lang tie-break, kernels/textstats.detect_language) — hint
    lists embedded as SQL literals so DuckDB replays the exact heuristic.
    The CASE ladder encodes the kernel's iterate-sorted-langs argmax:
    earliest lang in sorted order wins ties.  Also carries the JVM-side
    script CASE column (operators/text_analysis.detect_language_script,
    formerly its own seat — merged to free a slot under the driver's
    50-entry cap): same doc, kernel verdict and pure-SQL script verdict
    side by side.

    Round 5 adds the ENCODING-REPAIR leg (operators/encoding.py, the
    ftfy-style UTF-8-as-cp1252 mojibake fix every webtext pipeline runs):
    every 7th doc's text is deterministically corrupted with the real
    codec's mojibake prefix IN BOTH ENGINES, repaired by the single-pass
    JVM expression (Spark) vs the generated replace/tokenize replay
    (DuckDB), and pinned via was_mojibake + sha256 of the repaired text."""
    from document_automation_spark.operators.encoding import repair_mojibake
    from document_automation_spark.operators.text_analysis import (
        detect_language_script,
        language_id_kernel,
    )

    docs = _t(spark, sf_dir, "documents")
    corrupted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(_MOJI_PREFIX), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    moji = repair_mojibake(corrupted).select(
        "doc_id",
        F.col("was_mojibake").cast("long").alias("was_mojibake"),
        F.sha2(F.col("text"), 256).alias("repaired_sha"),
    )
    return (
        language_id_kernel(docs)
        .join(detect_language_script(docs), "doc_id")
        .join(moji, "doc_id")
    )


# --- webtext curation: Gopher/C4 repetition rules + CCNet LM perplexity ---
#
# The documents table is single-line word salad, so the repetition seat
# derives a deterministic multiline corpus IN BOTH ENGINES: wrap every 4
# words into a line, make every 5th line a '- ...' bullet ending in an
# ellipsis, then append the first two lines again (guaranteed duplicate
# lines).  Same trick as _DOCS_WITH_DUPS_SQL — synthesis is part of the
# oracle contract, the operator itself takes any (doc_id, text) frame.

_DOCS_MULTILINE_SQL = """
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS ws0
        FROM documents
    ),
    ml AS (
        SELECT doc_id,
               array_to_string(list_concat(ch, ch[1:2]), chr(10)) AS text
        FROM (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, (len(ws0) + 3) // 4),
                       i -> CASE WHEN i % 5 = 0
                            THEN '- ' || array_to_string(ws0[(i-1)*4+1 : i*4], ' ') || ' ...'
                            ELSE array_to_string(ws0[(i-1)*4+1 : i*4], ' ') END
                   ) AS ch
            FROM toks
        )
    )
"""


def _docs_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _DOCS_MULTILINE_SQL (identical wrap/bullet/append)."""
    from document_automation_spark.operators.webtext_quality import words_col

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", words_col(F.col("text")).alias("ws")
    )
    n_chunks = F.floor((F.size("ws") + F.lit(3)) / F.lit(4)).cast("int")

    def chunk(i):
        return F.concat_ws(
            " ", F.slice(F.col("ws"), (i - F.lit(1)) * F.lit(4) + F.lit(1), F.lit(4))
        )

    ch = F.when(
        n_chunks >= 1,
        F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda i: F.when(
                i % 5 == 0, F.concat(F.lit("- "), chunk(i), F.lit(" ..."))
            ).otherwise(chunk(i)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.select(
        "doc_id", F.array_join(F.concat(ch, F.slice(ch, 1, 2)), "\n").alias("text")
    )


@register(
    "repetition_features",
    f"""
    WITH {_DOCS_MULTILINE_SQL},
    feat AS (
        SELECT doc_id, text,
               list_filter(list_transform(string_split(text, chr(10)),
                                          l -> trim(l)), l -> l <> '') AS lines,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS ws
        FROM ml
    ),
    f2 AS (
        SELECT doc_id, text, lines, ws,
               len(lines) AS n_lines, len(ws) AS n_words,
               CASE WHEN len(ws) >= 2 THEN list_transform(
                        generate_series(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i+1])
                    ELSE []::VARCHAR[] END AS bigrams,
               CASE WHEN len(ws) >= 5 THEN list_transform(
                        generate_series(1, len(ws) - 4),
                        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                             || ws[i+3] || ' ' || ws[i+4])
                    ELSE []::VARCHAR[] END AS g5,
               COALESCE(list_sum(list_transform(lines, l -> length(l))), 0)
                   AS line_chars,
               COALESCE(list_sum(list_transform(list_distinct(lines),
                   l -> CASE WHEN len(list_filter(lines, x -> x = l)) = 1
                        THEN length(l) ELSE 0 END)), 0) AS once_chars
        FROM feat
    )
    SELECT doc_id,
      CAST(n_lines AS BIGINT) AS n_lines,
      ROUND(CASE WHEN n_lines > 0
            THEN (n_lines - len(list_distinct(lines))) / CAST(n_lines AS DOUBLE)
            ELSE 0.0 END, 6) AS dup_line_frac,
      ROUND(CASE WHEN line_chars > 0
            THEN (line_chars - once_chars) / CAST(line_chars AS DOUBLE)
            ELSE 0.0 END, 6) AS dup_line_char_frac,
      ROUND(LEAST(CASE WHEN length(text) > 0
            THEN COALESCE(list_max(list_transform(list_distinct(bigrams),
                     g -> len(list_filter(bigrams, x -> x = g)) * length(g))), 0)
                 / CAST(length(text) AS DOUBLE)
            ELSE 0.0 END, 1.0), 6) AS top_bigram_char_frac,
      ROUND(CASE WHEN len(g5) > 0
            THEN len(list_filter(g5,
                     g -> len(list_filter(g5, x -> x = g)) > 1))
                 / CAST(len(g5) AS DOUBLE)
            ELSE 0.0 END, 6) AS dup_5gram_frac,
      ROUND(((length(text) - length(replace(text, '#', '')))
             + (length(text) - length(replace(text, '...', ''))) / 3.0
             + (length(text) - length(replace(text, '…', ''))))
            / CAST(GREATEST(n_words, 1) AS DOUBLE), 6) AS symbol_word_ratio,
      ROUND(CASE WHEN n_lines > 0
            THEN len(list_filter(lines, l -> ends_with(l, '...')
                                             OR ends_with(l, '…')))
                 / CAST(n_lines AS DOUBLE)
            ELSE 0.0 END, 6) AS ellipsis_line_frac,
      ROUND(CASE WHEN n_lines > 0
            THEN len(list_filter(lines, l -> starts_with(l, '- ')
                                             OR starts_with(l, '* ')
                                             OR starts_with(l, '•')))
                 / CAST(n_lines AS DOUBLE)
            ELSE 0.0 END, 6) AS bullet_line_frac
    FROM f2
    """,
)
def q_repetition_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rules + C4 line heuristics
    (operators/webtext_quality.repetition_features) over the derived
    multiline corpus — duplicate-line fractions, dominant-bigram char
    coverage, duplicate-5-gram positions, symbol/ellipsis/bullet ratios.
    Every feature is a zero-shuffle JVM higher-order-function fold; the
    DuckDB oracle recomputes each with list lambdas on the identically
    derived corpus."""
    from document_automation_spark.operators.webtext_quality import (
        repetition_features,
    )

    return repetition_features(_docs_multiline(spark, sf_dir))


def _sql_quote(s: str) -> str:
    """Single-quoted DuckDB string literal (handles embedded quotes)."""
    return "'" + s.replace("'", "''") + "'"


def _ccnet_norm_sql(x: str) -> str:
    """DuckDB replay of operators.dedup.ccnet_normalize — the SAME
    translate maps (imported, not copied) and dialect-identical regex
    classes, so the normalized paragraph keys group identically."""
    from document_automation_spark.operators.dedup import CCNET_TR_DST, CCNET_TR_SRC

    return (
        "trim(regexp_replace(regexp_replace(translate(lower(" + x + "), "
        + _sql_quote(CCNET_TR_SRC) + ", " + _sql_quote(CCNET_TR_DST)
        + "), '[0-9]', '0', 'g'), '[ \\t\\n\\r\\f]+', ' ', 'g'))"
    )


#: per-parity paragraph suffix for the normalized-dedup leg: the two
#: variants differ in case, an accent, a curly quote, and digits — every
#: fold of the CCNet normalization — and agree AFTER it ("cafe's 00").
_NORM_SFX_EVEN = " Café’s 12"
_NORM_SFX_ODD = " CAFE'S 34"


@register(
    "paragraph_dedup",
    f"""
    WITH {_DOCS_MULTILINE_SQL},
    segs AS (
        SELECT doc_id, i - 1 AS pos, s[i] AS para FROM (
            SELECT doc_id, s, unnest(generate_series(1, len(s))) AS i
            FROM (SELECT doc_id, string_split(text, chr(10)) AS s FROM ml))
    ),
    cand AS (
        SELECT doc_id, pos, trim(para) AS pkey FROM segs WHERE trim(para) <> ''
    ),
    first_losers AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   ROW_NUMBER() OVER (PARTITION BY pkey ORDER BY doc_id, pos) AS rn
            FROM cand) WHERE rn > 1
    ),
    common_losers AS (
        SELECT doc_id, pos FROM cand WHERE pkey IN (
            SELECT pkey FROM cand GROUP BY pkey
            HAVING COUNT(DISTINCT doc_id) >= 3)
    ),
    agg_first AS (
        SELECT s.doc_id, string_agg(s.para, chr(10) ORDER BY s.pos) AS text
        FROM segs s LEFT JOIN first_losers l
          ON l.doc_id = s.doc_id AND l.pos = s.pos
        WHERE l.doc_id IS NULL GROUP BY s.doc_id
    ),
    agg_common AS (
        SELECT s.doc_id, string_agg(s.para, chr(10) ORDER BY s.pos) AS text
        FROM segs s LEFT JOIN common_losers l
          ON l.doc_id = s.doc_id AND l.pos = s.pos
        WHERE l.doc_id IS NULL GROUP BY s.doc_id
    ),
    nf AS (SELECT doc_id, COUNT(*) AS n FROM first_losers GROUP BY doc_id),
    nc AS (SELECT doc_id, COUNT(*) AS n FROM common_losers GROUP BY doc_id),
    ml2 AS (
        SELECT doc_id,
               array_to_string(list_transform(string_split(text, chr(10)),
                   x -> x || CASE WHEN doc_id % 2 = 0
                             THEN {_sql_quote(_NORM_SFX_EVEN)}
                             ELSE {_sql_quote(_NORM_SFX_ODD)} END), chr(10))
                   AS text
        FROM ml
    ),
    segs2 AS (
        SELECT doc_id, i - 1 AS pos, s[i] AS para FROM (
            SELECT doc_id, s, unnest(generate_series(1, len(s))) AS i
            FROM (SELECT doc_id, string_split(text, chr(10)) AS s FROM ml2))
    ),
    cand2 AS (
        SELECT doc_id, pos, {_ccnet_norm_sql('trim(para)')} AS pkey
        FROM segs2 WHERE trim(para) <> ''
    ),
    norm_losers AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   ROW_NUMBER() OVER (PARTITION BY pkey ORDER BY doc_id, pos) AS rn
            FROM cand2) WHERE rn > 1
    ),
    agg_norm AS (
        SELECT s.doc_id, string_agg(s.para, chr(10) ORDER BY s.pos) AS text
        FROM segs2 s LEFT JOIN norm_losers l
          ON l.doc_id = s.doc_id AND l.pos = s.pos
        WHERE l.doc_id IS NULL GROUP BY s.doc_id
    ),
    nn AS (SELECT doc_id, COUNT(*) AS n FROM norm_losers GROUP BY doc_id)
    SELECT 'first' AS mode, m.doc_id, md5(COALESCE(a.text, '')) AS text_md5,
           CAST(COALESCE(nf.n, 0) AS BIGINT) AS n_dropped_paragraphs
    FROM ml m LEFT JOIN agg_first a USING (doc_id) LEFT JOIN nf USING (doc_id)
    UNION ALL
    SELECT 'common' AS mode, m.doc_id, md5(COALESCE(a.text, '')) AS text_md5,
           CAST(COALESCE(nc.n, 0) AS BIGINT) AS n_dropped_paragraphs
    FROM ml m LEFT JOIN agg_common a USING (doc_id) LEFT JOIN nc USING (doc_id)
    UNION ALL
    SELECT 'first_norm' AS mode, m.doc_id, md5(COALESCE(a.text, '')) AS text_md5,
           CAST(COALESCE(nn.n, 0) AS BIGINT) AS n_dropped_paragraphs
    FROM ml2 m LEFT JOIN agg_norm a USING (doc_id) LEFT JOIN nn USING (doc_id)
    """,
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document paragraph dedup (operators/dedup.dedup_paragraphs) —
    the CCNet curation stage — over the derived multiline corpus, both
    policies as a tagged union: mode='first' keeps the globally-first copy
    of every duplicated paragraph (CCNet semantics, within-doc repeats
    included), mode='common' cuts every paragraph shared by >= 3 distinct
    docs (boilerplate removal).  A third leg replays mode='first' with
    ``normalize=True`` (the CCNet hash normalization) over a corpus whose
    paragraphs carry per-parity case/accent/quote/digit suffix variants —
    duplicates only the NORMALIZED key can see; the oracle recomputes the
    normalization with the same translate maps.  The DuckDB oracle replays
    winner selection (ROW_NUMBER over (paragraph, doc_id, pos)), the
    hot-paragraph cut, and the byte-exact text surgery on the identically
    derived corpus; per-doc rewritten text compared by md5."""
    from document_automation_spark.operators.dedup import dedup_paragraphs
    from document_automation_spark.partitioning import fan_out

    # the three legs below make ~6 passes over the derived corpus (each
    # dedup_paragraphs consumes its source twice); derive + fan out once,
    # persist, and let every leg read the cached copy (freed with the
    # session cache — the bench clears it between reps)
    ml = fan_out(_docs_multiline(spark, sf_dir)).persist()
    sfx = F.when(
        F.col("doc_id") % 2 == 0, F.lit(_NORM_SFX_EVEN)
    ).otherwise(F.lit(_NORM_SFX_ODD))
    ml2 = ml.select(
        "doc_id",
        F.array_join(
            F.transform(F.split(F.col("text"), "\\Q\n\\E"), lambda x: F.concat(x, sfx)),
            "\n",
        ).alias("text"),
    )

    def leg(src: DataFrame, tag: str, mode: str, **kw) -> DataFrame:
        return dedup_paragraphs(src, mode=mode, **kw).select(
            F.lit(tag).alias("mode"),
            "doc_id",
            F.md5(F.col("text")).alias("text_md5"),
            "n_dropped_paragraphs",
        )

    return (
        leg(ml, "first", "first")
        .unionByName(leg(ml, "common", "common", min_docs=3))
        .unionByName(leg(ml2, "first_norm", "first", normalize=True))
    )


@register(
    "lm_perplexity",
    """
    WITH tok AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS ws
        FROM documents
    ),
    uni AS (
        SELECT w, COUNT(*) AS uc
        FROM (SELECT unnest(ws) AS w FROM tok WHERE lang = 'en')
        GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(uc) AS DOUBLE) AS t FROM uni),
    bi AS (
        SELECT pw, w, COUNT(*) AS bc FROM (
            SELECT ws[i] AS pw, ws[i+1] AS w FROM (
                SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
                FROM tok WHERE lang = 'en')
        ) GROUP BY pw, w
    ),
    pairs AS (
        SELECT doc_id, ws[i] AS pw, ws[i+1] AS w FROM (
            SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
            FROM tok)
    ),
    scored AS (
        SELECT p.doc_id,
               ROUND(ln(CASE WHEN b.bc IS NOT NULL
                        THEN b.bc / CAST(u1.uc AS DOUBLE)
                        ELSE 0.4 * COALESCE(CAST(u2.uc AS DOUBLE), 0.4)
                             / (SELECT t FROM tot) END), 9) AS lp
        FROM pairs p
        LEFT JOIN bi b ON b.pw = p.pw AND b.w = p.w
        LEFT JOIN uni u1 ON u1.w = p.pw
        LEFT JOIN uni u2 ON u2.w = p.w
    ),
    base AS (
        SELECT doc_id, COUNT(*) AS n_bigrams,
               ROUND(AVG(lp), 6) AS avg_logprob,
               ROUND(exp(-ROUND(AVG(lp), 6)), 4) AS ppl
        FROM scored GROUP BY doc_id
    ),
    th AS (
        SELECT ROUND(quantile_cont(ppl, 0.3333333333), 6) AS t1,
               ROUND(quantile_cont(ppl, 0.6666666667), 6) AS t2
        FROM base
    )
    SELECT b.doc_id, b.n_bigrams, b.avg_logprob, b.ppl,
           CASE WHEN b.ppl <= th.t1 THEN 'head'
                WHEN b.ppl <= th.t2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM base b CROSS JOIN th
    """,
)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring
    (operators/webtext_quality.train_bigram_lm / score_with_bigram_lm):
    a Stupid-Backoff bigram LM fit on the lang='en' slice, every document
    scored by mean log-probability and perplexity, then tagged with
    CCNet's final corpus shape — head/middle/tail at the 1/3,2/3
    perplexity quantiles (``ccnet_ppl_buckets``: thresholds are a
    broadcast 2-double aggregate, tagging row-local, NO corpus-wide
    rank/window).  Train = two map-side-combined hash aggregations;
    score = pair explode + broadcast joins against the count tables.
    The oracle refits the identical LM in SQL (unigram/bigram CTEs),
    replays the backoff formula, and recomputes the thresholds with
    ``quantile_cont`` (same interpolation as Spark's exact
    ``percentile``; both rounded 6 dp)."""
    from document_automation_spark.operators.webtext_quality import (
        ccnet_ppl_buckets,
        score_with_bigram_lm,
        train_bigram_lm,
    )

    docs = _t(spark, sf_dir, "documents")
    # persist the LM-sized unigram table across its three consumers (same
    # run-once-session rationale as semantic_dedup / ann_recall_eval)
    lm = train_bigram_lm(docs.filter(F.col("lang") == "en"), cache_registry=[])
    return ccnet_ppl_buckets(score_with_bigram_lm(docs, lm))


@register(
    "event_pivot_unpivot",
    """
    SELECT user_id, metric, CAST(value AS BIGINT) AS value FROM (
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
                   AS purchase
        FROM events GROUP BY user_id
    ) UNPIVOT (value FOR metric IN (click, view, purchase))
    """,
)
def q_event_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide) via Spark's native ``.pivot()`` immediately
    unpivoted back (wide → long) via ``stack`` — both reshape operators in
    one driver-checked roundtrip (merged from round 2's two entries to free
    a report seat).  The oracle is the portable conditional-aggregation +
    UNPIVOT form; DuckDB's UNPIVOT drops no rows because counts are never
    NULL after COALESCE."""
    events = _t(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            F.coalesce(F.col("click"), F.lit(0)).cast("long").alias("click"),
            F.coalesce(F.col("view"), F.lit(0)).cast("long").alias("view"),
            F.coalesce(F.col("purchase"), F.lit(0)).cast("long").alias("purchase"),
        )
    )
    return wide.selectExpr(
        "user_id",
        "stack(3, 'click', click, 'view', view, 'purchase', purchase)"
        " AS (metric, value)",
    )


# (event_value_quantiles no longer has its own registry entry: the exact
# linear-interpolated p50/p95/min columns ride the salted_event_type_stats
# seat via an event_type join — slot freed for sequence_packing under the
# driver's 50-entry cap.  The exact-percentile aggregation below still
# runs in full inside that seat; `percentile_approx` remains the 100 TB
# variant, not oracle-comparable across engines.)
def _event_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
        F.round(F.min("value"), 6).alias("min_value"),
    )


@register(
    "sessionize_events",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN CAST(epoch(ts) AS BIGINT)
                         - LAG(CAST(epoch(ts) AS BIGINT)) OVER w > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT *, SUM(new_session) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
        FROM sess GROUP BY user_id, session_seq
    ),
    per_user AS (
        SELECT user_id, ROUND(MAX(value), 6) AS user_max_value,
               COUNT(*) AS user_num_events
        FROM events GROUP BY user_id
    )
    SELECT s.*, u.user_max_value, u.user_num_events
    FROM sessions s JOIN per_user u USING (user_id)
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization, with max_value_per_user folded in as a
    lossless user_id join (user_max_value / user_num_events): the per-user
    MAX/COUNT aggregation still runs in full and every value stays
    hash-checked — slot freed for paragraph_dedup under the driver's
    50-entry cap."""
    from document_automation_spark.operators.relational import (
        max_value_per_user,
        sessionize_events,
    )

    events = _t(spark, sf_dir, "events")
    per_user = max_value_per_user(events).select(
        "user_id",
        F.col("max_value").alias("user_max_value"),
        F.col("num_events").alias("user_num_events"),
    )
    return sessionize_events(events, gap_minutes=30).join(per_user, "user_id")


# =====================================================================
# Skew-aware aggregation (salted two-phase; result == plain GROUP BY)
# =====================================================================

@register(
    "salted_event_type_stats",
    """
    SELECT 'stats' AS kind, event_type,
           CAST(NULL AS TIMESTAMP) AS hour, COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS sum_value,
           ROUND(MAX(value), 6) AS max_value,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(MIN(value), 6) AS min_value,
           (SELECT string_agg(DISTINCT source, '|' ORDER BY source)
            FROM documents) AS distinct_sources
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'hourly' AS kind, event_type,
           date_trunc('hour', ts) AS hour, COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS sum_value,
           CAST(NULL AS DOUBLE) AS max_value, CAST(NULL AS DOUBLE) AS p50,
           CAST(NULL AS DOUBLE) AS p95, CAST(NULL AS DOUBLE) AS min_value,
           CAST(NULL AS VARCHAR) AS distinct_sources
    FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_type is the skewed key (few distinct values over many rows) —
    the salted two-phase plan must produce EXACTLY the plain GROUP BY
    result, which is what the oracle checks.  The A6 DISTINCT check (round
    2's standalone ``distinct_sources`` entry) rides along as a sorted
    '|'-joined constant column: the full distinct VALUE SET stays
    hash-checked while freeing a report seat."""
    from document_automation_spark.operators.skew import salted_agg

    events = _t(spark, sf_dir, "events")
    out = salted_agg(
        events,
        ["event_type"],
        {
            "n_events": ("count", "*"),
            "sum_value_raw": ("sum", "value"),
            "max_value_raw": ("max", "value"),
        },
        n_salt=16,
    )
    sources = (
        # collect_set already deduplicates — no pre-distinct shuffle
        _t(spark, sf_dir, "documents")
        .select("source")
        .agg(F.array_join(F.sort_array(F.collect_set("source")), "|").alias("distinct_sources"))
    )
    stats = (
        out.select(
            "event_type",
            "n_events",
            F.round("sum_value_raw", 6).alias("sum_value"),
            F.round("max_value_raw", 6).alias("max_value"),
        )
        # event_value_quantiles folded in (lossless event_type join — the
        # exact-percentile agg still runs in full; see comment above)
        .join(_event_quantiles(spark, sf_dir), "event_type")
        .crossJoin(F.broadcast(sources))
        .select(
            F.lit("stats").alias("kind"),
            "event_type",
            F.lit(None).cast("timestamp").alias("hour"),
            "n_events",
            "sum_value",
            "max_value",
            "p50",
            "p95",
            "min_value",
            "distinct_sources",
        )
    )
    # hourly_event_rollup folded in as kind='hourly' rows (lossless —
    # the full rollup runs and every value stays hash-checked)
    from document_automation_spark.operators.relational import hourly_event_rollup

    hourly = hourly_event_rollup(events).select(
        F.lit("hourly").alias("kind"),
        "event_type",
        "hour",
        "n_events",
        "sum_value",
        F.lit(None).cast("double").alias("max_value"),
        F.lit(None).cast("double").alias("p50"),
        F.lit(None).cast("double").alias("p95"),
        F.lit(None).cast("double").alias("min_value"),
        F.lit(None).cast("string").alias("distinct_sources"),
    )
    return stats.unionByName(hourly)


# =====================================================================
# Embedding stage + resume predicates
# =====================================================================

# (missing_embeddings no longer has its own registry seat: its anti-join
# rows ride the hash_embeddings seat as kind='missing' tagged-union rows —
# slot freed for the round-5 PII/decontamination seats under the driver's
# 50-entry cap.  The operator itself is unchanged: functions/embed.py.)


_UPSERT_SETUP_SQL = """
    existing AS (
        SELECT doc_id, text, lang FROM documents WHERE doc_id < 400
    ),
    incoming AS (
        SELECT doc_id, upper(text) AS text, lang FROM documents
        WHERE doc_id >= 300
    )
"""


@register(
    "upsert_policies",
    f"""
    WITH {_UPSERT_SETUP_SQL}
    SELECT 'skip' AS policy, * FROM existing
    UNION ALL
    SELECT 'skip' AS policy, i.* FROM incoming i
    WHERE i.doc_id NOT IN (SELECT doc_id FROM existing)
    UNION ALL
    SELECT 'overwrite' AS policy, * FROM incoming
    UNION ALL
    SELECT 'overwrite' AS policy, e.* FROM existing e
    WHERE e.doc_id NOT IN (SELECT doc_id FROM incoming)
    """,
)
def q_upsert_policies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both duplicate policies of the upsert sink (S7 MERGE emulation:
    skip-existing and overwrite-existing) as one tagged union — same
    operator, one registry slot each policy oracle-checked."""
    from document_automation_spark.operators.upsert import merge_documents

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    existing = docs.filter(F.col("doc_id") < 400)
    incoming = docs.filter(F.col("doc_id") >= 300).withColumn("text", F.upper("text"))
    skip = merge_documents(existing, incoming, policy="skip").select(
        F.lit("skip").alias("policy"), "doc_id", "text", "lang"
    )
    over = merge_documents(existing, incoming, policy="overwrite").select(
        F.lit("overwrite").alias("policy"), "doc_id", "text", "lang"
    )
    return skip.unionAll(over)


@register(
    "sink_roundtrips",
    """
    SELECT 'json' AS fmt, doc_id AS id, lang AS tag FROM documents
    UNION ALL
    SELECT 'csv' AS fmt, event_id AS id, event_type AS tag FROM events
    UNION ALL
    SELECT 'ids' AS fmt, e.vec_id AS id,
           CAST(p.pos AS VARCHAR) || ':' || CAST(e.label AS VARCHAR) AS tag
    FROM embeddings e
    JOIN (VALUES (42, 0), (7, 1), (99, 2), (3, 3)) AS p(vec_id, pos)
      ON e.vec_id = p.vec_id
    """,
)
def q_sink_roundtrips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines and CSV sink + scan round-trips in one tagged union
    (S4/S5/S6/S12 parity: the reference's json.dump training-sample sink
    and readlines scan, /root/reference/src/process_dataset.py:65-67,
    136-137, and its eval-set CSV path test_retrieval_pipeline.py:25 +
    convert_dev_json_to_csv.py:23-25) — distributed write then schema'd
    read must preserve every row of both formats.  A third tagged section
    folds in fetch-by-ids + order restore (S13/S14,
    ``operators/topk.restore_order_by_ids``; its own seat through round 4
    — merged to free a slot under the driver's 50-entry cap): the
    requested position rides ``tag`` as ``pos:label``."""
    import tempfile

    jdir = tempfile.mkdtemp(prefix="json_roundtrip_")
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.col("lang").alias("tag")
    )
    docs.write.mode("overwrite").json(jdir)
    jback = spark.read.json(jdir, schema="id long, tag string").select(
        F.lit("json").alias("fmt"), "id", "tag"
    )

    cdir = tempfile.mkdtemp(prefix="csv_roundtrip_")
    events = _t(spark, sf_dir, "events").select(
        F.col("event_id").alias("id"), F.col("event_type").alias("tag")
    )
    events.write.mode("overwrite").option("header", True).csv(cdir)
    cback = spark.read.csv(cdir, header=True, schema="id long, tag string").select(
        F.lit("csv").alias("fmt"), "id", "tag"
    )

    from document_automation_spark.operators.topk import restore_order_by_ids

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "label")
    fetched = restore_order_by_ids(emb, "vec_id", [42, 7, 99, 3]).select(
        F.lit("ids").alias("fmt"),
        F.col("vec_id").alias("id"),
        F.concat_ws(":", F.col("pos").cast("string"), F.col("label").cast("string")).alias("tag"),
    )
    return jback.unionAll(cback).unionAll(fetched)


def _learned_encoder_sql() -> Optional[str]:
    from document_automation_spark.golden import learned_encoder_rows

    rows = learned_encoder_rows()
    if rows is None:
        return None
    vals = ", ".join(f"('{m}', {d}, {r}, {rr!r})" for (m, d, r, rr) in rows)
    return f"""
    SELECT method, CAST(doc_id AS BIGINT) AS doc_id,
           CAST(true_rank AS BIGINT) AS true_rank,
           CAST(rr AS DOUBLE) AS rr
    FROM (VALUES {vals}) AS t(method, doc_id, true_rank, rr)
    """


@register("learned_encoder_eval", _learned_encoder_sql)
def q_learned_encoder_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real LEARNED encoder in the K8 slot, evaluated head-to-head with
    the hash embedder (round-5 verdict #3): a pure-numpy 2-layer dual
    encoder (``functions/encoder``) trained with symmetric InfoNCE on
    first-half/second-half positive pairs of the TRAIN docs, then frozen,
    broadcast, and run through the ``embed_with_model`` inference seam
    over held-out docs.  Task: given a held-out doc's first half, retrieve
    its second half among all held-out second halves.  Output per query:
    ``(method, doc_id, true_rank, rr)`` for method ∈ {learned16, hash16}
    — both 16-dimensional, so the lift is learned geometry alone.
    Measured at sf0.01: learned16 MRR 0.232 / r@5 0.30 vs hash16 0.086 /
    0.08 (2.7× MRR at the same budget).  Oracle = pinned golden from the
    pure mirror sharing the SAME cached trained weights
    (golden.learned_encoder_rows; training is seeded/deterministic and
    gradient-checked in tests/test_encoder.py)."""
    from document_automation_spark.functions.embed import (
        embed_documents,
        embed_with_model,
    )
    from document_automation_spark.functions.encoder import (
        load_eval_split,
        make_encoder_model_factory,
        split_halves,
        trained_eval_encoder,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    enc = trained_eval_encoder(sf_dir)
    _, test_rows = load_eval_split(sf_dir)
    halves = spark.createDataFrame(
        [
            (doc_id * 2 + side, text)
            for doc_id, t in test_rows
            for side, text in enumerate(split_halves(t))
        ],
        "hid long, text string",
    ).repartition(8)

    factory, key = make_encoder_model_factory(spark, enc)
    learned = embed_with_model(
        halves, factory, batch_size=50, id_col="hid", cache_key=key
    )
    hashed = embed_documents(halves.withColumnRenamed("hid", "doc_id")).select(
        F.col("doc_id").alias("hid"), "embedding"
    )

    def rank_rows(embedded: DataFrame, method: str) -> DataFrame:
        q = embedded.filter(F.col("hid") % 2 == 0).select(
            (F.col("hid") / 2).cast("long").alias("doc_id"),
            F.col("embedding").alias("q_emb"),
        )
        c = embedded.filter(F.col("hid") % 2 == 1).select(
            ((F.col("hid") - 1) / 2).cast("long").alias("cand_id"),
            F.col("embedding").alias("c_emb"),
        )
        from document_automation_spark.operators.similarity import cosine_col

        scored = q.crossJoin(F.broadcast(c)).select(
            "doc_id",
            "cand_id",
            F.round(cosine_col(F.col("q_emb"), F.col("c_emb")), 6).alias("cosine"),
        )
        w = Window.partitionBy("doc_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("cand_id") == F.col("doc_id"))
            .select(
                F.lit(method).alias("method"),
                "doc_id",
                F.col("rank").cast("long").alias("true_rank"),
                F.round(F.lit(1.0) / F.col("rank"), 6).alias("rr"),
            )
        )

    return rank_rows(learned, "learned16").unionByName(rank_rows(hashed, "hash16"))


# The embedding kernel (functions/embed.embed_text) is md5-based precisely
# so this SQL can recompute every vector independently: token hash = top 60
# bits of md5, ±1 integer bucket sums, L2 norm, trunc-at-6dp quantization.
# Components are compared in exact integer micro-units (component × 1e6).
@register(
    "hash_embeddings",
    f"""
    WITH {_emb_list_cte('documents', 'd')}
    SELECT 'emb' AS kind, doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS vector_id,
           array_to_string(
               list_transform(embv, c -> CAST(round(c * 1e6) AS BIGINT)), '|')
               AS emb_micro
    FROM demb
    UNION ALL
    SELECT 'missing' AS kind, d.doc_id, CAST(NULL AS BIGINT) AS vector_id,
           CAST(NULL AS VARCHAR) AS emb_micro
    FROM documents d
    LEFT JOIN (SELECT vec_id FROM embeddings WHERE vec_id % 7 <> 0) e
      ON d.doc_id = e.vec_id
    WHERE e.vec_id IS NULL
    """,
)
def q_hash_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding stage + dense vector ids (K8 + A9) plus the F3 resume
    predicate, one tagged union (``missing_embeddings`` had its own seat
    through round 5 — merged to free a slot under the driver's 50-entry
    cap, every row still oracle-checked):

    * ``emb`` rows — the md5 feature-hashing kernel recomputed in SQL by
      the oracle and compared in integer micro-units; vector_id density
      checked against ``row_number() - 1``.  The Spark side assigns ids
      via partition offsets (no global window).
    * ``missing`` rows — docs whose id is absent from the (mod-7
      decimated) embeddings table: the anti-join resume predicate of
      ``functions/embed.missing_embeddings``.
    """
    from document_automation_spark.functions.embed import (
        assign_dense_vector_ids,
        embed_documents,
        missing_embeddings,
    )

    docs = _t(spark, sf_dir, "documents")
    out = assign_dense_vector_ids(embed_documents(docs))
    serialize = F.array_join(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x * 1e6).cast("long").cast("string"),
        ),
        "|",
    )
    emb_rows = out.select(
        F.lit("emb").alias("kind"), "doc_id", "vector_id", serialize.alias("emb_micro")
    )
    embedded = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 7 != 0)
        .select(F.col("vec_id").alias("doc_id"))
    )
    missing_rows = missing_embeddings(docs, embedded).select(
        F.lit("missing").alias("kind"),
        "doc_id",
        F.lit(None).cast("long").alias("vector_id"),
        F.lit(None).cast("string").alias("emb_micro"),
    )
    return emb_rows.unionByName(missing_rows)


@register(
    "maxsim_rerank",
    f"""
    WITH {_BM25_SCORED_SQL},
    topk AS (
        SELECT query_id, doc_id FROM (
            SELECT query_id, doc_id, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS r
            FROM scored
        ) WHERE r <= 10
    ),
    queries AS (
        SELECT CAST(doc_id / 41 AS BIGINT) AS query_id,
               array_to_string(list_slice(
                   regexp_split_to_array(lower(trim(text)), '\\s+'), 3, 6), ' ')
                   AS qtext
        FROM documents WHERE doc_id % 41 = 0 AND doc_id < 410
    ),
    qtok AS (
        SELECT query_id, u.tok, u.pos
        FROM queries,
             LATERAL (SELECT unnest(ts) AS tok,
                             unnest(generate_series(1, len(ts))) AS pos
                      FROM (SELECT list_slice(list_filter(
                                regexp_split_to_array(lower(qtext), '\\s+'),
                                t -> t <> ''), 1, 128) AS ts)) u
    ),
    dtok AS (
        SELECT DISTINCT d.doc_id, u.tok
        FROM (SELECT DISTINCT t.doc_id, doc.text
              FROM topk t JOIN documents doc ON doc.doc_id = t.doc_id) d,
             LATERAL (SELECT unnest(list_slice(list_filter(
                          regexp_split_to_array(lower(d.text), '\\s+'),
                          t -> t <> ''), 1, 128)) AS tok) u
    ),
    vocab AS (
        SELECT tok AS doc_id, tok AS text FROM
            (SELECT tok FROM qtok UNION SELECT tok FROM dtok)
    ),
    {_emb_list_cte('vocab', 't0')},
    temb AS (
        SELECT doc_id AS tok,
               list_transform(embv, c -> CAST(round(c * 1e6) AS BIGINT)) AS mv
        FROM t0emb
    ),
    perq AS (
        SELECT t.query_id, t.doc_id, q.pos,
               MAX(list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(generate_series(1, 16),
                                      i -> qe.mv[i] * de.mv[i])),
                   (a, b) -> a + b)) AS best
        FROM topk t
        JOIN qtok q ON q.query_id = t.query_id
        JOIN dtok d ON d.doc_id = t.doc_id
        JOIN temb qe ON qe.tok = q.tok
        JOIN temb de ON de.tok = d.tok
        GROUP BY t.query_id, t.doc_id, q.pos
    ),
    sums AS (
        SELECT query_id, doc_id, SUM(best) AS micro2
        FROM perq GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, CAST(micro2 AS DOUBLE) / 1e12 AS maxsim, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY micro2 DESC, doc_id) AS rank
        FROM sums
    ) WHERE rank <= 5
    """,
)
def q_maxsim_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 candidates reranked by MaxSim late interaction — FULLY
    oracle-checked: token embeddings, the (query-token × doc-token) dot
    matrix, max-over-doc-tokens and sum-over-query-tokens are all replayed
    by the DuckDB twin in exact integer micro-units."""
    from document_automation_spark.operators.bm25 import bm25_topk
    from document_automation_spark.operators.rerank import maxsim_rerank

    docs = _t(spark, sf_dir, "documents")
    queries_df = docs.filter((F.col("doc_id") % 41 == 0) & (F.col("doc_id") < 410)).select(
        (F.col("doc_id") / 41).cast("long").alias("query_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 3, 4)
        ).alias("query_text"),
    )
    query_terms = queries_df.select(
        "query_id", F.explode(F.split("query_text", " ")).alias("term")
    ).filter(F.col("term") != "").distinct()
    candidates = (
        bm25_topk(docs.select("doc_id", "text"), query_terms, k=10)
        .join(F.broadcast(queries_df), "query_id")
        .join(docs.select("doc_id", F.col("text").alias("doc_text")), "doc_id")
    )
    return maxsim_rerank(candidates, k=5)


@register(
    "dpr_training_samples",
    f"""
    WITH split AS ({_SPLIT_SQL}),
    qa AS (
        SELECT doc_id % 20 AS query_id, doc_id,
               'what is ' || substring(text, 1, 12) AS question,
               substring(text, 21, 10) AS answer
        FROM documents WHERE length(text) >= 40 AND doc_id % 5 = 0
    ),
    joined AS (
        SELECT qa.query_id, qa.doc_id, qa.question, qa.answer,
               s.passage_idx, s.passage,
               COUNT(*) OVER (PARTITION BY qa.query_id, qa.doc_id) AS n_passages,
               CASE WHEN position(qa.answer IN s.passage) > 0 THEN 1 ELSE 0 END AS has_answer,
               length(list_intersect(list_distinct(str_split(s.passage, '')),
                                     list_distinct(str_split(qa.answer, '')))) AS char_overlap
        FROM qa JOIN split s ON qa.doc_id = s.doc_id
    ),
    picked AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY query_id, doc_id
                   ORDER BY has_answer DESC, char_overlap DESC, passage_idx
               ) AS pick
        FROM joined
    )
    SELECT query_id, question, answer AS answers,
           to_json([{{'title': '',
                      'text': CASE WHEN n_passages > 1 AND has_answer = 0
                                        AND char_overlap = 0
                                   THEN '' ELSE passage END,
                      'passage_id': ''}}])::VARCHAR AS positive_ctxs,
           '[]' AS negative_ctxs,
           '[]' AS hard_negative_ctxs
    FROM picked WHERE pick = 1
    """,
)
def q_dpr_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPR training samples (S12/K11), nested ctx structs serialized with
    ``to_json`` so the driver canonicalizer can sort them — Spark's Jackson
    and DuckDB's to_json produce byte-identical JSON for these shapes
    (escaping verified over quotes/backslashes/control chars/unicode)."""
    from document_automation_spark.operators.positive_passage import dpr_training_samples

    docs = _t(spark, sf_dir, "documents")
    qa = docs.filter((F.length("text") >= 40) & (F.col("doc_id") % 5 == 0)).select(
        (F.col("doc_id") % 20).alias("query_id"),
        "doc_id",
        F.concat(F.lit("what is "), F.col("text").substr(1, 12)).alias("question"),
        F.col("text").substr(21, 10).alias("answer"),
    )
    out = dpr_training_samples(docs, qa)
    return out.select(
        "query_id",
        "question",
        "answers",
        F.to_json("positive_ctxs").alias("positive_ctxs"),
        F.to_json("negative_ctxs").alias("negative_ctxs"),
        F.to_json("hard_negative_ctxs").alias("hard_negative_ctxs"),
    )


# =====================================================================
# Flagship extraction (HTML/PDF kernels).  Oracle = pinned golden: the
# pure kernel (kernels/page.extract_page — the SAME function the Spark
# mapInPandas batches iterate) is run once in plain Python over the same
# deterministic 250-page set and emitted as a VALUES table
# (document_automation_spark/golden.py), so the driver's rows+schema+hash
# gate covers the flagship.  content_md5 pins the exact passage bytes;
# byte-level span/text parity is additionally pytest-pinned
# (tests/test_extract_job.py).
# =====================================================================

def _golden_extraction_oracle() -> str:
    from document_automation_spark.golden import extraction_golden_sql

    return extraction_golden_sql()


def _extraction_projection(docs: DataFrame) -> DataFrame:
    """Compact driver-checkable projection of the documents output:
    the md5 stands in for the full passage text (hash-stable, no 500-char
    strings in the compare), spans/counters ride along verbatim."""
    return docs.select(
        "url",
        F.col("passage_idx").cast("long").alias("passage_idx"),
        F.md5(F.col("content")).alias("content_md5"),
        "char_start",
        "char_end",
        F.col("n_passages").cast("long").alias("n_passages"),
        "error",
    )


@register("extraction_pipeline", _golden_extraction_oracle)
def q_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_automation_spark.golden import N_GOLDEN_PAGES
    from document_automation_spark.operators.extract import ExtractConfig, extract_documents
    from document_automation_spark.sources.pages import pages_df

    pages = pages_df(spark, N_GOLDEN_PAGES)
    return _extraction_projection(extract_documents(pages, ExtractConfig(n_buckets=16)))


@register("warc_extraction_pipeline", _golden_extraction_oracle)
def q_warc_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real Common-Crawl container shape, end to end: the same 250
    deterministic pages are framed into WARC/1.0 segment files (HTTP
    response envelopes included), ingested back through the binaryFile →
    Arrow-parse source (sources/warc.py), and extracted.  The oracle is the
    SAME pinned golden as ``extraction_pipeline`` — WARC framing must be a
    byte-exact roundtrip (also pytest-pinned, tests/test_warc.py)."""
    import tempfile

    from document_automation_spark.golden import N_GOLDEN_PAGES
    from document_automation_spark.kernels.warc import build_warc
    from document_automation_spark.operators.extract import ExtractConfig, extract_documents
    from document_automation_spark.sources.pages import FIXTURE_VERSION, gen_rows
    from document_automation_spark.sources.warc import pages_from_warc

    warc_dir = os.path.join(
        tempfile.gettempdir(), f"warc_golden_v{FIXTURE_VERSION}_n{N_GOLDEN_PAGES}"
    )
    marker = os.path.join(warc_dir, "_COMPLETE")
    if not os.path.exists(marker):
        # cross-process-safe publish: build in a pid-unique dir, then one
        # atomic rename — two racing sessions can never interleave writes
        # into the shared cache path (the loser just discards its build)
        import shutil

        build_dir = f"{warc_dir}.build-{os.getpid()}"
        shutil.rmtree(build_dir, ignore_errors=True)
        os.makedirs(build_dir)
        per_file = 50  # several files → several binaryFile scan rows
        for part in range(0, N_GOLDEN_PAGES, per_file):
            pages = gen_rows(range(part, min(part + per_file, N_GOLDEN_PAGES)))
            with open(os.path.join(build_dir, f"part-{part:05d}.warc"), "wb") as fh:
                fh.write(build_warc(pages))
        with open(os.path.join(build_dir, "_COMPLETE"), "w") as fh:
            fh.write("ok")
        try:
            os.rename(build_dir, warc_dir)
        except OSError:  # lost the race — the winner's dir is complete
            shutil.rmtree(build_dir, ignore_errors=True)
    pages = pages_from_warc(spark, warc_dir)
    return _extraction_projection(extract_documents(pages, ExtractConfig(n_buckets=16)))


# =====================================================================
# Webtext hygiene: PII redaction + benchmark decontamination (round 5)
# =====================================================================

# PII fixture enrichment — ONE expression string evaluated by BOTH
# engines (Spark selectExpr and the DuckDB CTE; `CAST(.. AS STRING)`,
# `||` and `lpad` parse identically in the two dialects), appending
# deterministic synthetic PII to a doc_id-keyed subset of the corpus so
# the redaction check is never vacuous.
_PII_ENRICH_EXPR = (
    "text"
    " || CASE WHEN doc_id % 7 = 0 THEN ' Contact user' || CAST(doc_id AS STRING)"
    " || '@ex-ample.org today.' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' Server 10.' || CAST(doc_id % 256 AS STRING)"
    " || '.3.44 logged it.' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' Call +1 (415) 555-01'"
    " || lpad(CAST(doc_id % 100 AS STRING), 2, '0') || ' now.' ELSE '' END"
    " || CASE WHEN doc_id % 17 = 0 THEN ' SSN 123-45-6789 on file.' ELSE '' END"
)


def _pii_redaction_sql() -> str:
    """DuckDB twin of operators/pii.redact_pii over the enriched corpus:
    the same category chain replayed as nested regexp_replace CTEs (RE2's
    'g' flag = Spark's replace-all default), counts taken on each
    intermediate state exactly as the operator does, final text compared
    as md5 + length (registry outputs carry no full text)."""
    from document_automation_spark.operators.pii import PII_CATEGORIES

    ctes = [f"s0 AS (SELECT doc_id, {_PII_ENRICH_EXPR} AS text FROM documents)"]
    prev = "s0"
    for i, (name, pat, repl) in enumerate(PII_CATEGORIES, 1):
        carried = ", ".join(f"n_{c}" for c, _, _ in PII_CATEGORIES[: i - 1])
        carried = f"{carried}, " if carried else ""
        ctes.append(
            f"s{i} AS (SELECT doc_id, {carried}"
            f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}, "
            f"regexp_replace(text, '{pat}', '{repl}', 'g') AS text FROM {prev})"
        )
        prev = f"s{i}"
    counts = ", ".join(f"n_{c}" for c, _, _ in PII_CATEGORIES)
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT doc_id, {counts},
           md5(text) AS content_md5, CAST(length(text) AS BIGINT) AS n_chars
    FROM {prev}
    """
    )


@register("pii_redaction", lambda: _pii_redaction_sql())
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the PII-enriched corpus (operators/pii.redact_pii):
    email → ssn → ipv4 → phone chained regexp_replace, per-category
    counts taken at each category's turn, compared byte-exactly (md5 of
    every redacted text) against the DuckDB replay.  The plan is one
    Project — zero shuffles (pinned by tests/test_pii.py)."""
    from document_automation_spark.operators.pii import redact_pii

    docs = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_PII_ENRICH_EXPR} AS text"
    )
    red, _obs = redact_pii(docs)
    return red.select(
        "doc_id",
        "n_email",
        "n_ssn",
        "n_ipv4",
        "n_phone",
        F.md5(F.col("text")).alias("content_md5"),
        F.length("text").cast("long").alias("n_chars"),
    )


def _decontamination_sql(n: int = 13) -> str:
    """DuckDB twin of operators/decontaminate.ngram_contamination with the
    benchmark derived as token-slices (tokens 6..35) of every 13th doc —
    word-slice fixtures in the style of the BM25 query derivation, so
    contamination is guaranteed non-vacuous.  The oracle joins RAW gram
    strings where Spark joins xxhash64 values: a hash collision at
    fixture scale would surface as a mismatch (duplicate_spans pattern).
    """
    m = n - 1
    return f"""
    WITH dtoks AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+') AS toks
        FROM documents
    ),
    bench AS (
        SELECT array_to_string(list_slice(toks, 6, 35), ' ') AS text
        FROM dtoks WHERE doc_id % 13 = 0
    ),
    btoks AS (
        SELECT regexp_extract_all(lower(text), '[\\p{{L}}\\p{{N}}_]+') AS toks FROM bench
    ),
    bgrams AS (
        SELECT DISTINCT array_to_string(list_slice(toks, i, i + {m}), ' ') AS g
        FROM btoks, LATERAL unnest(generate_series(1, len(toks) - {m})) AS t(i)
        WHERE len(toks) >= {n}
    ),
    dgrams AS (
        SELECT doc_id, array_to_string(list_slice(toks, i, i + {m}), ' ') AS g
        FROM dtoks, LATERAL unnest(generate_series(1, len(toks) - {m})) AS t(i)
        WHERE len(toks) >= {n}
    ),
    hits AS (
        SELECT doc_id, COUNT(*) AS n_hit FROM dgrams JOIN bgrams USING (g)
        GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(greatest(len(d.toks) - {m}, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit_grams,
           ROUND(CASE WHEN len(d.toks) > {m}
                      THEN CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / (len(d.toks) - {m})
                      ELSE 0.0 END, 9) AS hit_frac,
           CAST(CASE WHEN COALESCE(h.n_hit, 0) >= 1 THEN 1 ELSE 0 END AS BIGINT)
               AS is_contaminated
    FROM dtoks d LEFT JOIN hits h USING (doc_id)
    """


@register("benchmark_decontamination", lambda: _decontamination_sql())
def q_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3-style 13-gram benchmark-overlap audit
    (operators/decontaminate.ngram_contamination): benchmark grams hashed
    + broadcast, corpus side explodes (doc_id, gram_hash) longs only, one
    map-side-combined shuffle for the hit counts.  Every per-doc stat —
    gram count, hit count, hit fraction, flag — recomputed by the oracle
    from raw gram strings."""
    from document_automation_spark.operators.decontaminate import (
        ngram_contamination,
        tokens_col,
    )

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 13 == 0).select(
        F.array_join(F.slice(tokens_col("text"), 6, 30), " ").alias("text")
    )
    out = ngram_contamination(docs, bench, n=13)
    return out.select(
        "doc_id",
        "n_grams",
        "n_hit_grams",
        "hit_frac",
        F.col("is_contaminated").cast("long").alias("is_contaminated"),
    )


_DSIR_SQL = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '') AS ws
        FROM documents
    ),
    grams AS (
        SELECT doc_id, unnest(ws) AS g FROM toks
        UNION ALL
        SELECT doc_id,
               unnest(list_transform(range(1, len(ws)),
                      i -> ws[i] || ' ' || ws[i + 1])) AS g
        FROM toks
    ),
    bg AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 15))::UBIGINT % 4096 AS BIGINT)
                   AS bucket
        FROM grams
    ),
    tc AS (SELECT bucket, COUNT(*) AS c FROM bg WHERE doc_id % 7 = 0 GROUP BY bucket),
    rc AS (SELECT bucket, COUNT(*) AS c FROM bg WHERE doc_id % 7 <> 0 GROUP BY bucket),
    tot AS (
        SELECT CAST((SELECT COALESCE(SUM(c), 0) FROM tc) AS DOUBLE) AS nt,
               CAST((SELECT COALESCE(SUM(c), 0) FROM rc) AS DOUBLE) AS nr
    ),
    spine AS (SELECT unnest(range(0, 4096)) AS bucket),
    w AS (
        SELECT spine.bucket,
               ROUND(ln((COALESCE(tc.c, 0) + 1.0) / (tot.nt + 4096.0))
                   - ln((COALESCE(rc.c, 0) + 1.0) / (tot.nr + 4096.0)), 9) AS lr
        FROM spine
        LEFT JOIN tc ON spine.bucket = tc.bucket
        LEFT JOIN rc ON spine.bucket = rc.bucket
        CROSS JOIN tot
    ),
    scores AS (
        SELECT bg.doc_id, ROUND(SUM(w.lr), 6) AS dsir_score
        FROM bg JOIN w ON bg.bucket = w.bucket
        GROUP BY bg.doc_id
    )
    SELECT doc_id, dsir_score,
           ROUND(dsir_score
                 + ROUND(-ln(-ln(
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#dsir'),
                                     1, 15))::UBIGINT / 1152921504606846976.0)),
                         9), 6) AS select_key
    FROM scores
    ORDER BY select_key DESC, doc_id LIMIT 50
    """


@register("dsir_selection", _DSIR_SQL)
def q_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling end to end (operators/dsir.py): fit
    hashed-ngram bucket models to a target slice (doc_id % 7 == 0) vs
    the rest, score every document by the per-bucket log-ratio sum, and
    Gumbel-top-50.  The oracle replays training (bucket counts +
    smoothed log-ratios on a full 4096-bucket spine), scoring, AND the
    salted-md5 Gumbel draw."""
    from document_automation_spark.operators.dsir import dsir_select

    docs = _t(spark, sf_dir, "documents")
    return dsir_select(docs, F.col("doc_id") % 7 == 0, k=50)


def _bpe_sql(n_merges: int) -> str:
    """DuckDB replay of the ENTIRE distributed BPE path
    (operators/bpe.py): whitespace pre-tokenization → word frequencies →
    ``n_merges`` training rounds (adjacent-pair count over freq>=2 words
    → (count DESC, a, b) argmax → greedy non-overlapping merge) → full
    corpus encode.  The greedy merge fold is replayed with
    ``list_reduce`` over a chr(31)-delimited accumulator string (symbols
    are \\S+ substrings plus the ▁ marker, so the delimiter can never
    collide); each round's argmax parameterizes the next round's lambda
    through a CROSS JOIN of the 1-row best-pair CTE.  When no pair
    reaches count 2 the best-pair CTE degrades to a ('','') sentinel
    that can never match — the SQL analogue of learn_bpe's
    min_pair_count early stop (once no pair qualifies, the words stop
    changing, so every later round re-derives the same sentinel)."""
    sql = """
    WITH words_pos AS (
        SELECT doc_id, p['pos'] AS pos, p['word'] AS word FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ws) + 1),
                          i -> {'pos': i, 'word': ws[i]})) AS p
            FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS ws
                  FROM documents)
        ) WHERE p['word'] <> ''
    ),
    wf AS (SELECT word, COUNT(*) AS freq FROM words_pos GROUP BY word),
    w0 AS (
        SELECT word, freq,
               list_append(
                 list_transform(range(1, length(word)),
                                i -> substring(word, i, 1)),
                 substring(word, length(word), 1) || '▁') AS syms
        FROM wf
    )"""
    for i in range(n_merges):
        sql += f""",
    p{i} AS (
        SELECT q['a'] AS a, q['b'] AS b, SUM(freq) AS n FROM (
            SELECT unnest(list_transform(range(1, len(syms)),
                          k -> {{'a': syms[k], 'b': syms[k + 1]}})) AS q,
                   freq
            FROM w{i} WHERE freq >= 2 AND len(syms) >= 2
        ) GROUP BY 1, 2
    ),
    b{i} AS (
        SELECT a, b FROM (
            SELECT a, b, 0 AS pri FROM (
                SELECT a, b FROM p{i} WHERE n >= 2
                ORDER BY n DESC, a, b LIMIT 1)
            UNION ALL SELECT '', '', 1
        ) ORDER BY pri LIMIT 1
    ),
    w{i + 1} AS (
        SELECT word, freq,
               string_split(
                 list_reduce(syms, (acc, x) ->
                   CASE WHEN x = b{i}.b
                         AND (acc = b{i}.a
                              OR ends_with(acc, chr(31) || b{i}.a))
                        THEN left(acc, length(acc) - length(b{i}.a))
                             || b{i}.a || b{i}.b
                        ELSE acc || chr(31) || x END),
                 chr(31)) AS syms
        FROM w{i}, b{i}
    )"""
    sql += f"""
    SELECT wp.doc_id,
           CAST(SUM(len(v.syms)) AS BIGINT) AS n_tokens,
           string_agg(array_to_string(v.syms, ' '), ' ' ORDER BY wp.pos)
               AS tokens
    FROM words_pos wp JOIN w{n_merges} v ON wp.word = v.word
    GROUP BY wp.doc_id
    """
    return sql


@register("bpe_train_encode", lambda: _bpe_sql(8))
def q_bpe_train_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full distributed BPE: train 8 merges on the freq>=2 word table,
    segment every distinct word, encode the corpus (operators/bpe.py).
    The oracle replays TRAINING too — argmax sequence included — so the
    hash pins merge selection, tie-breaks, fold semantics, and the
    encode join, not just the final token counts.  Merges applied to all
    words (vocab = every distinct corpus word) so the open-vocabulary
    fallback leg stays exercised by tests instead."""
    from document_automation_spark.operators.bpe import (
        encode_documents,
        learn_bpe,
        segment_vocabulary,
        word_frequencies,
    )

    docs = _t(spark, sf_dir, "documents")
    wf = word_frequencies(docs)
    merges = learn_bpe(wf.where(F.col("freq") >= 2), 8)
    vocab = segment_vocabulary(wf, merges)
    enc = encode_documents(docs, vocab, broadcast_vocab=True)
    return enc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.concat_ws(" ", "tokens").alias("tokens"),
    )


# The driver's CORRECTNESS report covers at most the FIRST 50 registry
# entries (observed in round 1: exactly 50 of 52 reported, positions 50/51
# absent).  The registry is sized to exactly 50, and the flagship queries
# are additionally moved to the front so they can never fall off the end.
_FRONT = ["extraction_pipeline", "dpr_training_samples", "hash_embeddings"]
_REGISTRY = {
    **{k: _REGISTRY[k] for k in _FRONT if k in _REGISTRY},
    **{k: v for k, v in _REGISTRY.items() if k not in _FRONT},
}
# loud overflow guard: a future @register pushing entry 51 out of the
# driver's report would otherwise silently drop coverage
assert len(_REGISTRY) <= 50, f"registry has {len(_REGISTRY)} entries (driver reports 50)"
