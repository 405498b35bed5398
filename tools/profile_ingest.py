"""Phase-level profile of the composed ingest pipeline (round-4 perf work).

Replicates jobs/ingest_pipeline.run_ingest_pipeline with a timer around each
phase so the durable-path tuning (codec, write partitioning, curation plan
shape) is measured, not guessed.

    python tools/profile_ingest.py [n_pages] [cpus] [codec]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    codec = sys.argv[3] if len(sys.argv) > 3 else "snappy"

    from pyspark.sql import functions as F

    from document_automation_spark.operators.curate import curate_extracted
    from document_automation_spark.operators.extract import ExtractConfig
    from document_automation_spark.operators.urls import dedup_by_url
    from document_automation_spark.plans.checkpoint import (
        read_output,
        run_extraction_job,
    )
    from document_automation_spark.session import build_session
    from document_automation_spark.sources.pages import FIXTURE_VERSION, pages_df

    spark = build_session(
        app_name="profile-ingest",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "262144",
            "spark.sql.parquet.compression.codec": codec,
        },
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    pages_path = os.path.join(
        tempfile.gettempdir(), f"bench_pages_v{FIXTURE_VERSION}_sf0.1_n{n_pages}"
    )
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        pages_df(spark, n_pages, partitions=cpus * 2).write.mode("overwrite").parquet(
            pages_path
        )
    pages = spark.read.parquet(pages_path)
    cfg = ExtractConfig(n_buckets=max(64, cpus * 2))

    from document_automation_spark.jobs.ingest_pipeline import run_ingest_pipeline

    reps = int(os.environ.get("PROFILE_INGEST_REPS", "2"))
    for rep in range(reps):
        out = os.path.join(
            tempfile.gettempdir(), f"profile_ingest_{os.getpid()}_{rep}"
        )
        shutil.rmtree(out, ignore_errors=True)

        t_all = time.time()

        # codec flows through to the WRITERS (writer options override the
        # session conf, so setting only the conf would silently bench the
        # zstd-1 defaults no matter what was asked)
        codec_level = "1" if codec == "zstd" else None
        t0 = time.time()
        url_cache = []
        deduped = dedup_by_url(
            pages, shuffle_payloads=False, cache_registry=url_cache
        ).drop("canonical_url")
        summary = run_extraction_job(
            spark, deduped, out, "profile", cfg, codec=codec, codec_level=codec_level
        )
        for h in url_cache:
            h.unpersist()
        t_extract = time.time() - t0

        raw_docs = read_output(spark, out, with_sha=True)
        curated, collect_stats = curate_extracted(raw_docs)

        t0 = time.time()
        writer = curated.write.mode("overwrite").option("compression", codec)
        if codec_level:
            writer = writer.option(
                f"parquet.compression.codec.{codec}.level", codec_level
            )
        writer.parquet(os.path.join(out, "curated"))
        t_curated_write = time.time() - t0

        t0 = time.time()
        stats_row = collect_stats().first().asDict()
        t_stats = time.time() - t0

        total = time.time() - t_all
        du = 0
        for root, _, files in os.walk(out):
            du += sum(os.path.getsize(os.path.join(root, f)) for f in files)

        print(
            {
                "rep": rep,
                "n_pages": n_pages,
                "cpus": cpus,
                "codec": codec,
                "dedup_plus_durable_extract_s": round(t_extract, 2),
                "curate_stats_s": round(t_stats, 2),
                "curated_write_s": round(t_curated_write, 2),
                "total_s": round(total, 2),
                "pages_per_sec": round(n_pages / total, 1),
                "output_mb": round(du / 1e6, 1),
                "stats": stats_row,
                "summary": {
                    k: summary[k] for k in ("buckets_processed", "buckets_skipped")
                },
            }
        )
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
