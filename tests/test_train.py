"""Distributed DPR-style trainer (functions/train.py): loss decreases,
recall@1 goes untrained→perfect on a separable fixture, gradients are
parallelism-invariant, and the loop runs off the REAL dpr_training_samples
operator output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_automation_spark.functions.train import rank_eval, train_ranker

_CTX = "array<struct<title:string,text:string,passage_id:string>>"


def _samples(spark, n=60, parts=4):
    """Separable fixture: the positive passage shares the query's topic
    token, hard negatives talk about other topics."""
    rows = []
    for i in range(n):
        topic = f"topic{i % 7}"
        other1, other2 = f"topic{(i + 1) % 7}", f"topic{(i + 3) % 7}"
        rows.append(
            (
                i,
                f"what about {topic} please",
                [("", f"{topic} document body text here", "")],
                [
                    ("", f"{other1} unrelated body text", ""),
                    ("", f"{other2} another body entirely", ""),
                ],
            )
        )
    return spark.createDataFrame(
        rows,
        f"query_id long, question string, positive_ctxs {_CTX}, "
        f"hard_negative_ctxs {_CTX}",
    ).repartition(parts)


class TestTrainRanker:
    def test_loss_decreases_and_recall_reaches_one(self, spark):
        samples = _samples(spark).cache()
        # dim=1024: collision-free for this vocabulary (at 256, crc32
        # collides 'entirely' with 'topic4' — a realistic feature-hash
        # limit that caps recall at 0.87; the trainer itself is fine)
        dim = 1024
        before = rank_eval(samples, __import__("numpy").zeros(dim), dim=dim)
        assert before["recall_at_1"] == 0.0  # ties are misses untrained
        w, history = train_ranker(samples, dim=dim, epochs=16)
        assert history[-1] < history[0] * 0.5  # loss halved at least
        assert all(b <= a * 1.001 for a, b in zip(history, history[1:]))
        after = rank_eval(samples, w, dim=dim)
        assert after["n_samples"] == 60
        assert after["recall_at_1"] == 1.0  # separable → learns perfectly
        samples.unpersist()

    def test_parallelism_invariance(self, spark):
        """Full-batch GD: the same weights (to float-sum tolerance)
        whatever the partitioning — the determinism contract of the
        broadcast-weights / aggregated-gradients loop."""
        import numpy as np

        w1, h1 = train_ranker(_samples(spark, parts=1), epochs=3)
        w8, h8 = train_ranker(_samples(spark, parts=8), epochs=3)
        assert np.allclose(w1, w8, atol=1e-9)
        assert np.allclose(h1, h8, atol=1e-9)

    def test_unusable_samples_skipped_and_all_empty_raises(self, spark):
        empty = spark.createDataFrame(
            [(1, "q", [("", "pos text", "")], [])],
            f"query_id long, question string, positive_ctxs {_CTX}, "
            f"hard_negative_ctxs {_CTX}",
        )
        with pytest.raises(ValueError, match="no trainable samples"):
            train_ranker(empty, epochs=1)
        mixed = _samples(spark, n=10).unionByName(empty)
        _, hist = train_ranker(mixed, epochs=1)
        assert len(hist) == 1  # the empty-negatives row was skipped, not fatal

    def test_end_to_end_from_real_sample_operator(self, spark, sf_dir):
        """The trainer consumes the actual dpr_training_samples output
        (positive-passage mining + BM25-style hard negatives) — the full
        reference flow process_dataset -> train, on Spark end to end."""
        from document_automation_spark.operators.positive_passage import (
            dpr_training_samples,
        )

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .limit(40)
            .select("doc_id", F.col("text"))
        )
        # qa fixture: question = first 6 tokens of the doc, answer = a
        # mid-doc token (guarantees the positive-passage finder hits)
        qa = docs.select(
            F.col("doc_id").alias("query_id"),
            "doc_id",
            F.concat(F.lit("find "), F.substring("text", 1, 40)).alias("question"),
            F.element_at(F.split(F.trim("text"), "\\s+"), 3).alias("answer"),
        ).filter(F.col("answer").isNotNull() & (F.length("answer") > 2))
        # hard negatives: other docs' openings
        hn = (
            qa.select("query_id").crossJoin(
                docs.select(F.substring("text", 1, 120).alias("passage")).limit(3)
            )
        )
        samples = dpr_training_samples(docs, qa, hard_negatives=hn).cache()
        assert samples.count() > 5
        w, history = train_ranker(samples, epochs=4)
        assert history[-1] < history[0]  # it learns something real
        after = rank_eval(samples, w)
        assert after["recall_at_1"] > 0.5
        samples.unpersist()
