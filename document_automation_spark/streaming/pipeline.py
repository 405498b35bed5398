"""Structured Streaming extraction + event rollup.

The reference is batch-only (SURVEY.md §2.10 — Ray DatasetPipeline imported
but never used), but a Common-Crawl-style ingest is naturally continuous:
new WARC drops land as files.  The same extraction kernel runs unchanged —
``mapInPandas`` is stateless, so the batch operator IS the streaming
operator; only the source/sink change:

    readStream(parquet dir) → extract_documents(...) → writeStream(parquet)
    with per-micro-batch checkpointing (exactly-once via the streaming
    commit log — the streaming twin of plans/checkpoint.py).

``streaming_event_rollup`` adds the watermarked event-time aggregation
(late data handled by the watermark) matching the batch
``relational.hourly_event_rollup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from document_automation_spark.operators.extract import ExtractConfig, extract_documents
from document_automation_spark.sources.pages import PAGES_SCHEMA


def streaming_pages(spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over a directory of pages parquet drops."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def start_streaming_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractConfig = ExtractConfig(n_buckets=8),
) -> StreamingQuery:
    """Continuous extraction: the batch operator applied to a stream."""
    pages = streaming_pages(spark, input_dir)
    docs = extract_documents(pages, cfg)
    return (
        docs.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def streaming_user_totals(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user totals via
    ``applyInPandasWithState`` — the Structured Streaming extension point
    for operators the built-ins can't express (the task brief's
    "custom stateful operators" slot).

    State per user: (n_events, sum_value) carried across micro-batches;
    each batch emits the updated running totals for users seen in it.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    output_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n_events long, sum_value double"

    def update(key, batches, state):
        n, total = state.get if state.exists else (0, 0.0)
        for batch in batches:
            n += len(batch)
            total += float(batch["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [round(total, 6)]}
        )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_pages(
    pages_stream: DataFrame, watermark: str = "1 day"
) -> DataFrame:
    """Cross-micro-batch exact dedup — the continuous twin of
    ``dedup.exact_dedup`` for a training-data ingest (re-crawled URLs and
    mirror sites drop at the door).

    Key = sha256 of the raw payload (8-byte-ish state per page instead of
    the page itself); ``dropDuplicatesWithinWatermark`` bounds the dedup
    state by the event-time watermark, so state size is O(pages per
    watermark window), not O(corpus) — the property that keeps this
    runnable forever at crawl scale."""
    hashed = pages_stream.withColumn("content_hash", F.sha2(F.col("html"), 256))
    return hashed.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def streaming_event_rollup(events_stream: DataFrame) -> DataFrame:
    """Watermarked tumbling-hour rollup per event type (late data ≤ 2h)."""
    return (
        events_stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
