"""spark-submit entry point for the extraction pipeline (north rule:
"packaged as a spark-submit --py-files application").

Cluster usage:

    zip -r dazspark.zip document_automation_spark
    spark-submit --py-files dazspark.zip \\
        document_automation_spark/jobs/extract_job.py \\
        --input  s3://bucket/pages/            (or an Iceberg table path) \\
        --output s3://bucket/documents/ \\
        --input-fingerprint warc-2024-08-snapshot \\
        --buckets 4096

Local smoke (synthesizes the deterministic pages fixture):

    spark-submit document_automation_spark/jobs/extract_job.py \\
        --synthesize 1000 --output /tmp/docs_out --input-fingerprint test

The job is resumable: re-running with the same --output and
--input-fingerprint skips manifest-completed buckets (plans/checkpoint.py);
`--buckets` should scale with cluster size (rule of thumb: ≥ 4× total
executor cores, so AQE and stragglers have room).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="pages → documents extraction")
    parser.add_argument("--input", help="pages parquet path (url, warc_ts, html, text, lang)")
    parser.add_argument("--synthesize", type=int, default=0,
                        help="generate N deterministic fixture pages instead of --input")
    parser.add_argument("--output", required=True)
    parser.add_argument("--input-fingerprint", required=True,
                        help="identifies the input snapshot for resume bookkeeping")
    parser.add_argument("--buckets", type=int, default=64)
    parser.add_argument("--max-len", type=int, default=500)
    parser.add_argument("--overlap", type=int, default=10)
    parser.add_argument("--min-chars", type=int, default=5)
    parser.add_argument("--no-split", action="store_true")
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession

    # spark-submit provides master/conf; fall back to local for direct runs.
    # Only stop the session on exit if this invocation created it (embedded
    # callers — tests, notebooks — keep theirs).
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("extract-job").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    from document_automation_spark.operators.extract import ExtractConfig
    from document_automation_spark.plans.checkpoint import run_extraction_job

    if args.synthesize:
        from document_automation_spark.sources.pages import pages_df

        pages = pages_df(spark, args.synthesize)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        parser.error("one of --input / --synthesize is required")

    cfg = ExtractConfig(
        max_len=args.max_len,
        overlap=args.overlap,
        min_chars=args.min_chars,
        split_doc=not args.no_split,
        n_buckets=args.buckets,
    )
    summary = run_extraction_job(
        spark, pages, args.output, args.input_fingerprint, cfg
    )
    print(json.dumps(summary))
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
