"""Per-bucket checkpoint manifests: idempotent, resumable extraction runs.

The reference's resume story is a re-run with a ``vector_id IS NULL``
filter plus a retry-once writer (/root/reference/src/sql.py:313-314,
/root/reference/src/gen-sods-doc-image-ray.py:158-165).  Rebuilt here as
explicit job-level bookkeeping that works with ANY number of concurrent
writers:

* output is hash-partitioned by ``bucket = pmod(xxhash64(url), n_buckets)``
  (the column the extraction operator already emits) and written with
  dynamic partition overwrite, so re-processing a bucket REPLACES its
  files — write idempotency;
* after the data commit, one manifest row per completed bucket is appended:
  ``(bucket, run_id, input_fingerprint, rows_in, rows_out, error_rows,
  wall_ms, committed_at)`` — lineage + counter metrics required by the
  north rule;
* on resume, pending work = input buckets ANTI-JOIN done manifest buckets
  (for the same input fingerprint).  A crash between data write and
  manifest append re-runs that bucket; overwrite makes that harmless.

On Iceberg the manifest append and data commit would share a transaction
(snapshot id recorded in the manifest); with plain parquet the
crash-window is closed by overwrite-idempotency instead.  Scale note: the
manifest is O(n_buckets) rows — thousands, not billions — so the anti-join
side is always broadcastable.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from document_automation_spark.operators.extract import (
    DOCUMENTS_SCHEMA,
    ExtractConfig,
    extract_documents,
)

MANIFEST_SCHEMA = (
    "bucket int, run_id string, input_fingerprint string, rows_in long, "
    "rows_out long, error_rows long, wall_ms long, committed_at timestamp"
)


def manifest_path(output_path: str) -> str:
    return os.path.join(output_path, "_manifest")


def data_path(output_path: str) -> str:
    return os.path.join(output_path, "data")


def read_manifest(spark: SparkSession, output_path: str) -> DataFrame:
    path = manifest_path(output_path)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except Exception:  # first run: no manifest yet
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def done_buckets(spark: SparkSession, output_path: str, input_fingerprint: str) -> list[int]:
    manifest = read_manifest(spark, output_path)
    return [
        r.bucket
        for r in manifest.filter(F.col("input_fingerprint") == input_fingerprint)
        .select("bucket")
        .distinct()
        .collect()
    ]


def run_extraction_job(
    spark: SparkSession,
    pages: DataFrame,
    output_path: str,
    input_fingerprint: str,
    cfg: ExtractConfig = ExtractConfig(),
    fail_buckets_above: int | None = None,
) -> dict:
    """Run (or resume) the extraction job with per-bucket checkpointing.

    Returns a summary dict with processed/skipped bucket counts and
    counter totals.  ``fail_buckets_above`` is a test hook: buckets with id
    >= the value raise mid-kernel, simulating a mid-job crash.
    """
    run_id = uuid.uuid4().hex[:12]
    already_done = set(done_buckets(spark, output_path, input_fingerprint))

    docs = extract_documents(pages, cfg)
    if already_done:
        # resume anti-filter: the done-set is tiny (O(n_buckets)) — an
        # isin literal keeps it a pushed-down scan predicate, no join.
        docs = docs.filter(~F.col("bucket").isin(sorted(already_done)))

    if fail_buckets_above is not None:
        # test hook: pretend the job died before these buckets were written
        docs = docs.filter(F.col("bucket") < fail_buckets_above)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    started = time.time()
    (
        # extraction is map-only; the shuffle happens HERE, on the extracted
        # rows (≪ raw payload size), yielding one file per bucket partition.
        docs.repartition(cfg.n_buckets, "bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(data_path(output_path))
    )
    wall_ms = int((time.time() - started) * 1000)

    # Post-commit accounting per bucket (a second tiny scan of what was
    # just written — cheap relative to extraction, and exact).
    written = spark.read.schema(DOCUMENTS_SCHEMA).parquet(data_path(output_path))
    if already_done:
        written = written.filter(~F.col("bucket").isin(sorted(already_done)))
    stats = (
        written.groupBy("bucket")
        .agg(
            # urls counted without DISTINCT: passage_idx==0 occurs exactly
            # once per extracted url, error rows once per failed url
            F.sum(
                F.when((F.col("passage_idx") == 0) | F.col("error").isNotNull(), 1).otherwise(0)
            ).alias("rows_in"),
            F.sum(F.when(F.col("error").isNull(), 1).otherwise(0)).alias("rows_out"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("error_rows"),
        )
        .select(
            "bucket",
            F.lit(run_id).alias("run_id"),
            F.lit(input_fingerprint).alias("input_fingerprint"),
            "rows_in",
            "rows_out",
            "error_rows",
            F.lit(wall_ms).alias("wall_ms"),
            F.current_timestamp().alias("committed_at"),
        )
    )
    stats.write.mode("append").parquet(manifest_path(output_path))

    processed = stats.count()
    return {
        "run_id": run_id,
        "buckets_processed": processed,
        "buckets_skipped": len(already_done),
    }


def read_output(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.schema(DOCUMENTS_SCHEMA).parquet(data_path(output_path))
