"""Duplicate-policy merge semantics (reference sql.py:405-427 parity)."""

from __future__ import annotations

import pytest

from document_automation_spark.operators.upsert import (
    DuplicateDocumentError,
    merge_documents,
)


@pytest.fixture(scope="module")
def tables(spark):
    existing = spark.createDataFrame(
        [(1, "old-one"), (2, "old-two"), (3, "old-three")], "doc_id long, text string"
    )
    incoming = spark.createDataFrame(
        [(3, "NEW-three"), (4, "NEW-four")], "doc_id long, text string"
    )
    return existing, incoming


def test_skip_keeps_existing(tables):
    existing, incoming = tables
    got = {r.doc_id: r.text for r in merge_documents(existing, incoming, "skip").collect()}
    assert got == {1: "old-one", 2: "old-two", 3: "old-three", 4: "NEW-four"}


def test_overwrite_incoming_wins(tables):
    existing, incoming = tables
    got = {r.doc_id: r.text for r in merge_documents(existing, incoming, "overwrite").collect()}
    assert got == {1: "old-one", 2: "old-two", 3: "NEW-three", 4: "NEW-four"}


def test_fail_raises_on_collision(tables):
    existing, incoming = tables
    with pytest.raises(DuplicateDocumentError, match="1 duplicate"):
        merge_documents(existing, incoming, "fail").collect()


def test_fail_passes_without_collision(spark, tables):
    existing, _ = tables
    fresh = spark.createDataFrame([(9, "nine")], "doc_id long, text string")
    got = merge_documents(existing, fresh, "fail")
    assert got.count() == 4


def test_unknown_policy(tables):
    existing, incoming = tables
    with pytest.raises(ValueError, match="unknown duplicate policy"):
        merge_documents(existing, incoming, "upsert-ish")
