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


def start_streaming_quality_filter(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    rules=None,
) -> StreamingQuery:
    """The Gopher/C4 quality gate on a document stream — the same
    stateless expression gate as the batch ingest stage
    (``operators.webtext_quality.filter_by_quality``), so a corpus can be
    quality-filtered as it lands instead of in a nightly sweep.  Per-rule
    drop counters surface per micro-batch in
    ``query.lastProgress.observedMetrics['quality_filter']`` (the
    streaming twin of the batch Observation)."""
    from document_automation_spark.operators.webtext_quality import (
        QualityRules,
        filter_by_quality,
    )

    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    kept, _name = filter_by_quality(docs, rules=rules or QualityRules())
    return (
        kept.writeStream.outputMode("append")
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


def streaming_lsh_candidates(
    docs_stream: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 5,
    seed: int = 42,
    max_bucket_size: int | None = None,
    state_ttl_minutes: float | None = None,
) -> DataFrame:
    """Cross-micro-batch MinHash-LSH candidate pairs — the streaming twin
    of ``dedup.minhash_lsh_candidates``.

    Batch LSH self-joins the banded table; a stream can't (the matching
    doc may have arrived an hour ago).  Instead each band bucket keeps its
    member docs as STATE (``applyInPandasWithState``): when a new doc
    lands in a bucket, it pairs with every doc already stored there —
    exactly the pairs the batch self-join would emit, but incremental and
    regardless of which micro-batch each side arrived in.

    State per band bucket = the doc_ids seen (the band key already encodes
    the signature band, so ids suffice).  Two bounds keep a CONTINUOUS
    stream safe, mirroring the batch operator's guards and
    ``streaming_dedup_pages``' watermark:

    * ``max_bucket_size``: a bucket that reaches the cap SATURATES — it
      stops emitting pairs and stops growing.  NOTE this necessarily
      differs from the batch operator's whole-bucket drop: a stream cannot
      retro-drop pairs it already emitted, so the cap is a forward stop.
      Default ``None`` (uncapped) keeps exact batch parity; pairs are
      yielded per input micro-batch so peak task memory is bounded by
      ``batch × bucket`` even uncapped.
    * ``state_ttl_minutes``: processing-time TTL evicting idle buckets, so
      total state is O(arrivals per TTL window), not O(corpus).  ``None``
      (no eviction) is only sane for finite backfills.  Semantics to know:
      a bucket receiving new data in a batch is never ``hasTimedOut`` (its
      clock resets), and with the TTL armed an idle always-on query keeps
      scheduling micro-batches to process evictions — state hygiene in
      production; use ``trigger(availableNow=True)`` for finite drains.

    Input: (doc_id, text) stream; output: (doc_a, doc_b) with
    doc_a < doc_b, possibly duplicated across bands — dedup downstream per
    micro-batch (the batch operator's ``distinct`` slot).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from document_automation_spark.kernels.fingerprint import (
        lsh_band_keys,
        minhash_signature,
    )

    band_schema = "doc_id long, band_key string"

    def band_batches(batches):
        for batch in batches:
            ids, keys = [], []
            for doc_id, text in zip(batch["doc_id"], batch["text"]):
                if not text:
                    continue  # empty docs are exact dups — not LSH's job
                sig = minhash_signature(text, num_perm=num_perm, k=shingle_k, seed=seed)
                for key in lsh_band_keys(sig, bands=bands):
                    ids.append(doc_id)
                    keys.append(key)
            yield pd.DataFrame({"doc_id": ids, "band_key": keys})

    banded = docs_stream.select("doc_id", "text").mapInPandas(band_batches, band_schema)

    def pair_with_state(key, batches, state):
        if state.hasTimedOut:  # idle bucket evicted by the TTL
            state.remove()
            yield pd.DataFrame({"doc_a": [], "doc_b": []})
            return
        seen = list(state.get[0]) if state.exists else []
        # yield per input batch: peak memory stays O(batch × bucket), never
        # the full O(bucket²) pair set in one task
        for batch in batches:
            out_a, out_b = [], []
            for doc_id in batch["doc_id"]:
                if max_bucket_size is not None and len(seen) >= max_bucket_size:
                    break  # saturated: stop pairing AND stop growing state
                doc_id = int(doc_id)
                for other in seen:
                    lo, hi = (other, doc_id) if other < doc_id else (doc_id, other)
                    if lo != hi:
                        out_a.append(lo)
                        out_b.append(hi)
                seen.append(doc_id)
            if out_a:
                yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b})
        state.update((seen,))
        if state_ttl_minutes is not None:
            state.setTimeoutDuration(int(state_ttl_minutes * 60_000))
        yield pd.DataFrame({"doc_a": [], "doc_b": []})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return banded.groupBy("band_key").applyInPandasWithState(
        pair_with_state,
        outputStructType="doc_a long, doc_b long",
        stateStructType="ids array<long>",
        outputMode="append",
        timeoutConf=timeout,
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


def start_streaming_pii_redaction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    categories=None,
) -> StreamingQuery:
    """PII redaction on a document stream — the same stateless Project
    as the batch hygiene stage (``operators.pii.redact_pii``), so PII
    never lands un-scrubbed instead of waiting for a nightly sweep.
    Per-category match counts surface per micro-batch in
    ``query.lastProgress.observedMetrics['redact_pii']``."""
    from document_automation_spark.operators.pii import PII_CATEGORIES, redact_pii

    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    redacted, _name = redact_pii(
        docs, categories=categories or PII_CATEGORIES, count_cols=False
    )
    return (
        redacted.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_streaming_encoding_repair(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    passes: int = 2,
) -> StreamingQuery:
    """Mojibake repair on a document stream — the same stateless
    projection as the batch ``--fix-encoding`` stage
    (``operators.encoding.repair_mojibake``), so double-encoded pages are
    fixed the moment they arrive instead of waiting for a batch sweep.
    ``passes`` DEFAULTS TO 2 to match the batch stage exactly (depth-2
    heals generation-2 mojibake; a pass over clean text is a no-op) — a
    stream and a batch run over the same input must produce the same
    corpus.  The repaired-row count surfaces per micro-batch in
    ``query.lastProgress.observedMetrics['fix_encoding']``."""
    from pyspark.sql import functions as F

    from document_automation_spark.operators.encoding import repair_mojibake

    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    repaired = repair_mojibake(docs, passes=passes).observe(
        "fix_encoding",
        F.sum(F.col("was_mojibake").cast("long")).alias("n_repaired"),
    ).drop("was_mojibake")
    return (
        repaired.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_streaming_dsir_filter(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    weights: DataFrame,
    min_score: float,
    schema: str = "doc_id long, text string",
    hash_impl: str = "md5",
) -> StreamingQuery:
    """DSIR scoring on a document stream: score each arriving doc
    against a batch-trained weight table (``operators.dsir.
    train_dsir_weights``) and keep docs with ``dsir_score > min_score``.

    ``hash_impl`` MUST equal the value the weight table was trained
    with (both sides default to ``'md5'``; pass ``'xxhash64'`` to BOTH
    for the 100-TB fast path) — grams hash to buckets at score time, so
    a mismatched hash reads unrelated buckets' log-ratios and the gate
    silently keeps/drops noise.

    The batch scorer's explode → join → groupBy would be a streaming
    aggregation + stream self-join (unsupported in append mode), so the
    streaming twin restates the SAME sum as a stateless per-row JVM fold:
    the weight table (always n_buckets rows — bounded by construction,
    the IVF-centroid pattern) collapses to an array LITERAL indexed by
    bucket, and each row folds its own gram array.  Zero shuffles, zero
    state; score values match the batch scorer's (same grams, buckets,
    9-dp log-ratios, 6-dp final round; the fold sums in gram order while
    the batch agg sums in partition order, so agreement is up to float
    summation order under the final round — pinned in pytest).

    Streaming has no global top-k, so the gate is the threshold form of
    the selection rule — calibrate ``min_score`` from a batch quantile
    of historical scores (same scale by construction)."""
    from document_automation_spark.operators.dsir import _bucket, _grams

    rows = weights.collect()  # n_buckets rows, bounded by construction
    n_buckets = len(rows)
    lr = [0.0] * n_buckets
    for r in rows:
        lr[r["bucket"]] = r["lr"]
    lr_lit = F.array(*[F.lit(v) for v in lr])

    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    score = F.round(
        F.aggregate(
            _grams(F.col("text")),
            F.lit(0.0),
            lambda acc, g: acc
            + F.element_at(lr_lit, (_bucket(g, n_buckets, hash_impl) + 1).cast("int")),
        ),
        6,
    ).alias("dsir_score")
    kept = docs.select("*", score).where(F.col("dsir_score") > F.lit(min_score))
    return (
        kept.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_streaming_robots_gate(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    rules: DataFrame,
    agent: str,
    schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
) -> StreamingQuery:
    """The ingest pipeline's robots-exclusion front gate
    (``operators.robots.robots_gate``) on a page stream: pages whose host
    has opted ``agent`` out are dropped as they land.

    Unlike the DSIR/paragraph twins, no literal-collapse is needed:
    Structured Streaming natively supports joining an append stream
    against a STATIC DataFrame, and the gate is exactly that shape — the
    per-host rules table on the static side (AQE/broadcast-sized: one row
    per host), the REP longest-prefix decision a row-local fold after the
    join.  The static side therefore scales to |hosts| far past what a
    plan literal could hold.  ``rules`` is ``parse_robots(snapshot)``;
    robots snapshots move on crawl cadence, not per micro-batch — restart
    the query on a fresh snapshot to pick it up."""
    from document_automation_spark.operators.robots import robots_gate

    pages = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    kept = (
        robots_gate(pages, rules, agent=agent)
        .where(F.col("allowed"))
        .drop("allowed")
    )
    return (
        kept.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_streaming_paragraph_cut(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    hot_keys: DataFrame,
    schema: str = "doc_id long, text string",
    sep: str = "\n",
    normalize: bool = False,
) -> StreamingQuery:
    """The streaming twin of the batch common-paragraph cut
    (``operators.dedup.dedup_paragraphs(mode='common')``): cut every
    paragraph whose sha2 key is in a batch-trained hot set
    (``operators.dedup.hot_paragraph_keys``) from documents as they land.

    The batch operator's corpus-wide distinct-doc count is a streaming
    aggregation + self-join (unsupported in append mode), so — the
    streaming-DSIR pattern — the bounded artifact collapses to a plan
    LITERAL: ``hot_paragraph_keys`` caps the table (Zipfian boilerplate,
    the head is the cut), its keys become a sorted array literal, and
    every row rewrites itself with one indexed ``F.filter`` +
    ``array_contains`` probe per paragraph.  Zero shuffles, zero state;
    the surgery expression is byte-identical to the batch operator's, so
    stream output == batch common-cut for every paragraph inside the cap
    (pinned in pytest).

    ``normalize`` MUST match the flag ``hot_paragraph_keys`` was trained
    with (both default False) — the probe recomputes the key per segment,
    so a mismatched normalization would never hit the hot set.
    """
    from document_automation_spark.operators.dedup import _paragraph_key

    keys = sorted(r["pkey"] for r in hot_keys.collect())  # capped by contract
    hot_lit = F.array(*[F.lit(k) for k in keys])
    lit_sep = "\\Q" + sep + "\\E"

    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    segs = F.split(F.col("text"), lit_sep)
    kept_segs = F.filter(
        segs,
        lambda x: (F.trim(x) == "")
        | ~F.array_contains(hot_lit, _paragraph_key(F.trim(x), normalize)),
    )
    n_dropped = (F.size(segs) - F.size(kept_segs)).cast("long")
    rewritten = docs.select(
        "*",
        F.array_join(kept_segs, sep).alias("_text2"),
        n_dropped.alias("n_dropped_paragraphs"),
    ).withColumn("text", F.col("_text2")).drop("_text2")
    return (
        rewritten.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
