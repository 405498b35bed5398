"""Fused native scan produces byte-identical output to the standard path."""

from __future__ import annotations

import pytest

from document_automation_spark.operators.extract import ExtractConfig, extract_documents
from document_automation_spark.sources.fast_scan import (
    extract_documents_native,
    parquet_work_units,
)
from document_automation_spark.sources.pages import pages_df


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages") / "pages_pq")
    pages_df(spark, 150, partitions=4).write.parquet(path)
    return path


def test_work_units_cover_all_row_groups(pages_path):
    units = parquet_work_units(pages_path)
    assert units
    assert all(rg >= 0 for _, rg in units)


def test_native_equals_standard(spark, pages_path):
    cfg = ExtractConfig(n_buckets=8)
    key = lambda r: (r.url, r.passage_idx if r.passage_idx is not None else -1)
    std = sorted(
        ((r.url, r.passage_idx, r.content, r.doc_id, r.bucket, r.error)
         for r in extract_documents(spark.read.parquet(pages_path), cfg).collect()),
    )
    nat = sorted(
        ((r.url, r.passage_idx, r.content, r.doc_id, r.bucket, r.error)
         for r in extract_documents_native(spark, pages_path, cfg).collect()),
    )
    assert std == nat


def test_native_empty_dir_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no parquet files"):
        extract_documents_native(spark, str(tmp_path))
