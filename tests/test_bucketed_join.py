"""Bucketed tables co-locate joins: the SCALE.md claim, proven on a plan.

Writing both sides bucketed by the join key lets a later join run with
ZERO Exchange on either side — at 100 TB this converts the dominant
shuffle of a documents ⋈ embeddings join into a local zipper.  The test
pins the plan property: bucketed join has no Exchange, the plain-parquet
control join does.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is a static conf; the default ./spark-warehouse is
    # fine (gitignored) — tables are dropped on teardown
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "doc_id", F.col("vec_id")
    )
    spark.sql("DROP TABLE IF EXISTS docs_bkt")
    spark.sql("DROP TABLE IF EXISTS emb_bkt")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("docs_bkt")
    emb.write.bucketBy(8, "doc_id").sortBy("doc_id").mode("overwrite").saveAsTable("emb_bkt")
    yield spark.table("docs_bkt"), spark.table("emb_bkt"), docs, emb
    spark.sql("DROP TABLE IF EXISTS docs_bkt")
    spark.sql("DROP TABLE IF EXISTS emb_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    docs_bkt, emb_bkt, docs, emb = bucketed_tables
    # disable auto-broadcast so the join strategy question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed_plan = plan_of(docs_bkt.join(emb_bkt, "doc_id").select("doc_id", "label"))
        control_plan = plan_of(docs.join(emb, "doc_id").select("doc_id", "label"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange" not in bucketed_plan, bucketed_plan
    assert "Exchange" in control_plan  # the shuffle bucketing removes


def test_bucketed_join_results_match_control(spark, bucketed_tables):
    docs_bkt, emb_bkt, docs, emb = bucketed_tables
    got = sorted(
        (r.doc_id, r.label) for r in docs_bkt.join(emb_bkt, "doc_id").select("doc_id", "label").collect()
    )
    expected = sorted(
        (r.doc_id, r.label) for r in docs.join(emb, "doc_id").select("doc_id", "label").collect()
    )
    assert got == expected
