"""E2E extraction job: Spark mapInPandas output == pure-Python oracle, byte-for-byte.

This is the north-rule correctness gate (BASELINE.json input_hint): per-url
extracted text byte-identical between the distributed job and a row-by-row
pure-Python run of the same kernels.
"""

from __future__ import annotations

import pytest

from document_automation_spark.kernels.page import extract_page
from document_automation_spark.operators.extract import (
    ExtractConfig,
    extract_documents,
    passage_counts,
)
from document_automation_spark.sources.pages import gen_page, pages_df

N_PAGES = 300
SEED = 42


@pytest.fixture(scope="module")
def oracle_rows():
    """Pure-Python single-process reference run over the same input."""
    rows = {}
    for i in range(N_PAGES):
        page = gen_page(i, SEED)
        rows[page["url"]] = extract_page(page["url"], page["html"])
    return rows


@pytest.fixture(scope="module")
def spark_rows(spark):
    df = extract_documents(pages_df(spark, N_PAGES, SEED), ExtractConfig(n_buckets=8))
    collected = df.collect()
    by_url = {}
    for row in collected:
        by_url.setdefault(row.url, []).append(row)
    for url in by_url:
        by_url[url].sort(key=lambda r: (r.passage_idx if r.passage_idx is not None else -1))
    return by_url


def test_same_url_set(oracle_rows, spark_rows):
    oracle_urls = {u for u, rows in oracle_rows.items() if rows}
    assert set(spark_rows) == oracle_urls


def test_byte_identical_content_per_url(oracle_rows, spark_rows):
    for url, got in spark_rows.items():
        expected = oracle_rows[url]
        assert len(got) == len(expected), url
        for g, e in zip(got, expected):
            assert g.content == e.content, url  # byte-identical text
            assert g.char_start == e.char_start and g.char_end == e.char_end, url
            assert g.doc_id == e.doc_id, url
            assert g.link == e.link and g.n_passages == e.n_passages, url


def test_quarantine_rows_present_not_fatal(spark_rows):
    errors = [r for rows in spark_rows.values() for r in rows if r.error is not None]
    assert errors, "fixture guarantees ~1% malformed payloads"
    assert all(r.content is None and r.n_passages == 0 for r in errors)


def test_pdf_payloads_extracted(oracle_rows, spark_rows):
    pdf_urls = [
        u
        for u in spark_rows
        if gen_page(int(u.rsplit("/", 1)[-1].split(".")[0]), SEED)["html"][:5] == b"%PDF-"
    ]
    assert pdf_urls, "fixture guarantees ~5% PDF payloads"
    for u in pdf_urls:
        assert all(r.error is None for r in spark_rows[u])


def test_spans_reconstruct_extracted_text(spark_rows):
    for url, rows in spark_rows.items():
        ok_rows = [r for r in rows if r.error is None]
        if len(ok_rows) <= 1:
            continue
        # overlapping windows: next start < previous end (overlap 10)
        for a, b in zip(ok_rows, ok_rows[1:]):
            assert b.char_start <= a.char_end
            assert len(a.content) == a.char_end - a.char_start


def test_passage_counts_aggregate(spark, oracle_rows):
    df = extract_documents(pages_df(spark, 100, SEED), ExtractConfig(n_buckets=4))
    counts = {r.url: r for r in passage_counts(df).collect()}
    for i in range(100):
        page = gen_page(i, SEED)
        expected = extract_page(page["url"], page["html"])
        if not expected:
            assert page["url"] not in counts
            continue
        row = counts[page["url"]]
        assert row.n_passages == expected[0].n_passages


def test_parallelism_invariance(spark):
    """local partitioning must not change results (cluster-equivalence)."""
    a = extract_documents(pages_df(spark, 150, SEED, partitions=2), ExtractConfig(n_buckets=2))
    b = extract_documents(pages_df(spark, 150, SEED, partitions=8), ExtractConfig(n_buckets=16))
    rows_a = sorted(
        [(r.url, r.passage_idx, r.content, r.doc_id) for r in a.collect()],
        key=lambda t: (t[0], t[1] if t[1] is not None else -1),
    )
    rows_b = sorted(
        [(r.url, r.passage_idx, r.content, r.doc_id) for r in b.collect()],
        key=lambda t: (t[0], t[1] if t[1] is not None else -1),
    )
    assert rows_a == rows_b


def test_arrow_variant_byte_identical(spark):
    """extract_documents_arrow (mapInArrow) must emit exactly the rows of
    the default mapInPandas path — it's the swap-in integration point."""
    from document_automation_spark.operators.extract import (
        ExtractConfig,
        extract_documents,
        extract_documents_arrow,
    )
    from document_automation_spark.sources.pages import pages_df

    pages = pages_df(spark, 400)
    cfg = ExtractConfig(n_buckets=8)
    a = sorted(map(tuple, extract_documents(pages, cfg).collect()))
    b = sorted(map(tuple, extract_documents_arrow(pages, cfg).collect()))
    assert a == b
