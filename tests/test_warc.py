"""WARC kernel + source: Common-Crawl container round-trip."""

from __future__ import annotations

import datetime as dt

import pytest

from document_automation_spark.kernels.page import extract_page
from document_automation_spark.kernels.warc import WarcRecord, build_warc, iter_warc_records
from document_automation_spark.operators.extract import ExtractConfig, extract_documents
from document_automation_spark.sources.pages import gen_rows
from document_automation_spark.sources.warc import pages_from_warc


class TestWarcKernel:
    def test_roundtrip_records(self):
        pages = gen_rows(range(25))
        records, error = iter_warc_records(build_warc(pages))
        assert error is None
        responses = [r for r in records if r.record_type == "response"]
        assert len(responses) == 25
        for rec, page in zip(responses, pages):
            assert rec.uri == page["url"]
            assert rec.payload == page["html"]  # HTTP envelope stripped
            assert rec.http_status == 200
            assert rec.warc_date == page["warc_ts"].replace(microsecond=0)

    def test_all_record_types_surfaced(self):
        # since WET support, every record type is surfaced (readers filter
        # by type); the warcinfo header record leads each file
        records, _ = iter_warc_records(build_warc(gen_rows(range(2))))
        assert [r.record_type for r in records] == ["warcinfo", "response", "response"]

    def test_truncated_body_graceful(self):
        data = build_warc(gen_rows(range(3)))
        records, error = iter_warc_records(data[: len(data) - 40])
        assert error == "truncated record body"
        assert len(records) >= 1  # earlier records survive

    def test_garbage_graceful(self):
        records, error = iter_warc_records(b"not a warc at all")
        assert records == []
        assert error is not None

    def test_missing_content_length(self):
        bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
        records, error = iter_warc_records(bad)
        assert error == "missing or invalid Content-Length"


class TestWarcSource:
    def test_extraction_from_warc_equals_direct(self, spark, tmp_path):
        pages = gen_rows(range(60))
        warc_dir = tmp_path / "warcs"
        warc_dir.mkdir()
        for i in range(3):
            (warc_dir / f"part-{i}.warc").write_bytes(build_warc(pages[i * 20 : (i + 1) * 20]))

        cfg = ExtractConfig(n_buckets=4)
        via_warc = sorted(
            (r.url, r.passage_idx, r.content, r.doc_id)
            for r in extract_documents(pages_from_warc(spark, str(warc_dir)), cfg).collect()
        )
        direct = sorted(
            (row.url, row.passage_idx, row.content, row.doc_id)
            for page in pages
            for row in extract_page(page["url"], page["html"])
        )
        assert via_warc == direct

    def test_bad_file_quarantined_not_fatal(self, spark, tmp_path):
        warc_dir = tmp_path / "warcs2"
        warc_dir.mkdir()
        (warc_dir / "good.warc").write_bytes(build_warc(gen_rows(range(5))))
        (warc_dir / "bad.warc").write_bytes(b"garbage bytes, no framing")
        out = pages_from_warc(spark, str(warc_dir)).collect()
        marker = [r for r in out if r.url.startswith("warc:") and r.url.endswith("#error")]
        assert len(marker) == 1
        assert len([r for r in out if not r.url.startswith("warc:")]) == 5


class TestWarcGzipBodies:
    def test_gzip_http_body_extracts_identically(self):
        """Common-Crawl responses often carry Content-Encoding: gzip —
        after the WARC/HTTP envelope strip, the page kernel's gzip sniff
        must yield the same passages as the uncompressed payload."""
        import gzip

        page = next(iter(gen_rows(range(1))))
        plain = extract_page(page["url"], page["html"])
        assert plain and plain[0].error is None
        gz = extract_page(page["url"], gzip.compress(page["html"]))
        assert [(r.passage_idx, r.content, r.char_start, r.char_end) for r in plain] == [
            (r.passage_idx, r.content, r.char_start, r.char_end) for r in gz
        ]


class TestWetIngestion:
    """WET (Common-Crawl extracted-text container) source path."""

    def test_wet_roundtrip_records(self):
        from document_automation_spark.kernels.warc import build_wet

        pages = gen_rows(range(10))
        records, error = iter_warc_records(build_wet(pages))
        assert error is None
        conv = [r for r in records if r.record_type == "conversion"]
        assert len(conv) == 10
        for rec, page in zip(conv, pages):
            assert rec.uri == page["url"]
            assert rec.payload.decode("utf-8") == page["text"]

    def test_wet_end_to_end_matches_direct_text_path(self, spark, tmp_path):
        """pages → WET files → pages_from_wet → documents_from_text must be
        byte-identical to running documents_from_text on the original rows
        (the WET framing is a pure roundtrip)."""
        from document_automation_spark.kernels.warc import build_wet
        from document_automation_spark.operators.extract import (
            ExtractConfig,
            documents_from_text,
        )
        from document_automation_spark.sources.warc import pages_from_wet

        pages = gen_rows(range(60))
        wet_dir = tmp_path / "wet_in"
        wet_dir.mkdir()
        for i in range(3):
            (wet_dir / f"seg-{i}.wet").write_bytes(build_wet(pages[i * 20 : (i + 1) * 20]))

        cfg = ExtractConfig(n_buckets=8)
        via_wet = sorted(
            (r.url, r.passage_idx, r.content, r.char_start, r.char_end, r.doc_id)
            for r in documents_from_text(pages_from_wet(spark, str(wet_dir)), cfg).collect()
        )
        direct_rows = spark.createDataFrame(
            [(p["url"], p["warc_ts"], p["text"]) for p in pages],
            "url string, warc_ts timestamp, text string",
        )
        direct = sorted(
            (r.url, r.passage_idx, r.content, r.char_start, r.char_end, r.doc_id)
            for r in documents_from_text(direct_rows, cfg).collect()
        )
        assert via_wet == direct
        assert len(direct) > 50  # real passage volume, not a vacuous equality

    def test_wet_null_text_quarantines(self, spark, tmp_path):
        from document_automation_spark.operators.extract import documents_from_text

        rows = spark.createDataFrame(
            [("https://h/x.html", None, None)],
            "url string, warc_ts timestamp, text string",
        )
        out = documents_from_text(rows).collect()
        assert len(out) == 1
        assert out[0].error == "ValueError: null text"
        assert out[0].content is None
