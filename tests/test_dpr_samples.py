"""DPR training-sample builder: nested shape + positive/hard-negative legs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_automation_spark.operators.positive_passage import dpr_training_samples


@pytest.fixture(scope="module")
def inputs(spark):
    text = "A" * 600 + "THEANSWER" + "B" * 600
    docs = spark.createDataFrame(
        [(1, text), (2, "short unrelated document")], "doc_id long, text string"
    )
    qa = spark.createDataFrame(
        [(0, 1, "what is the answer", "THEANSWER")],
        "query_id long, doc_id long, question string, answer string",
    )
    return docs, qa


def test_nested_sample_shape(spark, inputs):
    docs, qa = inputs
    rows = dpr_training_samples(docs, qa).collect()
    assert len(rows) == 1
    sample = rows[0]
    assert sample.question == "what is the answer"
    assert sample.answers == "THEANSWER"
    assert len(sample.positive_ctxs) == 1
    assert "THEANSWER" in sample.positive_ctxs[0].text
    assert sample.positive_ctxs[0].title == ""
    assert sample.negative_ctxs == []
    assert sample.hard_negative_ctxs == []


def test_hard_negatives_attached(spark, inputs):
    docs, qa = inputs
    hard = spark.createDataFrame(
        [(0, "a misleading passage"), (0, "another distractor")],
        "query_id long, passage string",
    )
    rows = dpr_training_samples(docs, qa, hard_negatives=hard).collect()
    assert len(rows) == 1
    texts = {c.text for c in rows[0].hard_negative_ctxs}
    assert texts == {"a misleading passage", "another distractor"}


def test_json_sink_roundtrip_of_samples(spark, inputs, tmp_path):
    docs, qa = inputs
    out = str(tmp_path / "dpr_json")
    dpr_training_samples(docs, qa).write.mode("overwrite").json(out)
    back = spark.read.json(out)
    row = back.collect()[0]
    assert row.question == "what is the answer"
    assert row.positive_ctxs[0].text  # nested struct survives the sink
