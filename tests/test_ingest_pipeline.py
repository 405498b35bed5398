"""End-to-end crawl-ingest composition (jobs/ingest_pipeline.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from document_automation_spark.jobs.ingest_pipeline import run_ingest_pipeline
from document_automation_spark.operators.extract import ExtractConfig
from document_automation_spark.sources.pages import pages_df


class TestIngestPipeline:
    def test_end_to_end_with_recrawls_and_dups(self, spark, tmp_path):
        """120 fixture pages + 10 re-crawls of the same urls (newer ts) —
        url dedup keeps exactly one crawl per url, quarantine rows never
        reach the curated table, and exact passage dedup holds."""
        base = pages_df(spark, 120, partitions=4)
        recrawl = (
            base.filter(F.col("url").rlike("/p/42/1?[0-9]\\.html$")).limit(10)
            .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 30 DAYS"))
        )
        pages = base.unionAll(recrawl)
        out = str(tmp_path / "corpus")

        summary = run_ingest_pipeline(
            spark, pages, out, "test-cc", cfg=ExtractConfig(n_buckets=8)
        )
        # counters are consistent
        assert summary["rows_in"] == (
            summary["quarantined"] + summary["gated"]
            + summary["deduped"] + summary["rows_out"]
        )
        assert summary["rows_out"] > 100
        curated = spark.read.parquet(summary["curated_path"])
        assert curated.filter(F.col("error").isNotNull()).count() == 0
        # url dedup: at most one extraction per url survives upstream
        per_url = curated.groupBy("url", "passage_idx").count()
        assert per_url.filter(F.col("count") > 1).count() == 0
        # exact passage dedup: no duplicated content text remains
        per_content = curated.groupBy(F.sha2("content", 256)).count()
        assert per_content.filter(F.col("count") > 1).count() == 0

    def test_script_gate(self, spark, tmp_path):
        pages = pages_df(spark, 80, partitions=4)
        out = str(tmp_path / "corpus_latin")
        summary = run_ingest_pipeline(
            spark, pages, out, "test-gate",
            cfg=ExtractConfig(n_buckets=4), scripts=["latin"],
        )
        curated = spark.read.parquet(summary["curated_path"])
        assert curated.filter(F.col("content").rlike("[一-鿿]")).count() == 0
        assert summary["gated"] > 0  # the zh share actually got gated

    def test_wet_path(self, spark, tmp_path):
        from document_automation_spark.kernels.warc import build_wet
        from document_automation_spark.sources.pages import gen_rows
        from document_automation_spark.sources.warc import pages_from_wet

        rows = gen_rows(range(40))
        wet_dir = tmp_path / "wet"
        wet_dir.mkdir()
        (wet_dir / "seg-0.wet").write_bytes(build_wet(rows))
        out = str(tmp_path / "corpus_wet")
        summary = run_ingest_pipeline(
            spark, pages_from_wet(spark, str(wet_dir)), out, "test-wet",
            cfg=ExtractConfig(n_buckets=4), from_text=True,
        )
        assert summary["rows_out"] > 30
        curated = spark.read.parquet(summary["curated_path"])
        # WET payload is the pre-extracted text: passages must reconstruct
        texts = {r["url"]: r["text"] for r in rows}
        sample = curated.filter(F.col("passage_idx") == 0).limit(5).collect()
        for r in sample:
            assert texts[r.url].startswith(r.content[:50])
