"""The flagship extraction operator: pages → documents (passages) table.

Spark shape of the reference's indexing pipeline
(/root/reference/src/gen-sods-doc-image-ray.py:203-231):

    scan pages → mapInPandas(extract kernel)            [map-only]
    → documents rows (+ bucket = pmod(xxhash64(url), n))
    → repartition(bucket) at the SINK → partitioned table + manifest

Key design points for 100 TB scale:

* **One lineage, no driver funnel** — the reference re-materializes all
  docs on the head node between stages (:240-242) and funnels writes
  through a single actor (:223-227); here extraction and write are one
  distributed plan with as many parallel writers as partitions.
* **Map-only extraction, shuffle only the output** — the Python stage runs
  directly over the (size-balanced) parquet scan partitions: shuffling raw
  HTML payloads before extraction would move the LARGEST column through
  the network for no benefit (measured 1.7× slower locally; at 100 TB it
  is the difference between shuffling 100 TB and shuffling the ~30 TB of
  extracted text — and the write-side repartition on ``bucket`` is what
  controls file layout + resume granularity).  Host-level Zipf skew does
  not stall the map stage because scan partitions are split by SIZE
  (``spark.sql.files.maxPartitionBytes``), not by host; the bucket key
  (uniform url hash) keeps the write shuffle balanced.
* **Arrow-vectorized kernel** — one Python dispatch per *batch* (1024 rows),
  not per row; the per-row pure kernel (`kernels.page.extract_page`) is the
  same function the pytest oracle calls, so distributed output is
  byte-identical to the oracle by construction.
* **Quarantine, never fail** — malformed payloads yield an ``error`` row
  (reference tolerance: /root/reference/src/gen-sods-doc-image-ray.py:102-106),
  so one bad page can't kill a 10^12-row job.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from document_automation_spark.kernels.page import extract_page
from document_automation_spark.kernels.textproc import (
    DEFAULT_MAX_LEN,
    DEFAULT_MIN_CHARS,
    DEFAULT_OVERLAP,
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("passage_idx", T.IntegerType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("char_start", T.LongType(), True),
        T.StructField("char_end", T.LongType(), True),
        T.StructField("link", T.StringType(), False),
        T.StructField("n_passages", T.IntegerType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


@dataclass(frozen=True)
class ExtractConfig:
    """Split/gate parameters (reference CLI defaults,
    /root/reference/src/gen-sods-doc-image-ray.py:292-296)."""

    max_len: int = DEFAULT_MAX_LEN
    overlap: int = DEFAULT_OVERLAP
    min_chars: int = DEFAULT_MIN_CHARS
    split_doc: bool = True
    n_buckets: int = 64  # resume granularity; scale with cluster size


def extract_documents(pages: DataFrame, cfg: ExtractConfig = ExtractConfig()) -> DataFrame:
    """pages ``(url, warc_ts, html, ...)`` → documents (one row per passage).

    Only ``(url, warc_ts, html)`` survive the scan (column pruning reaches
    the parquet reader); rows are redistributed by url hash before the
    Python stage so payload-size skew spreads uniformly.
    """
    import pandas as pd

    max_len, overlap, min_chars, split_doc = (
        cfg.max_len,
        cfg.overlap,
        cfg.min_chars,
        cfg.split_doc,
    )

    def extract_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            # columnar accumulation: building one list per column and a
            # dict-backed DataFrame is measurably cheaper than a
            # list-of-tuples DataFrame at these row counts
            c_url, c_ts, c_bucket = [], [], []
            c_doc_id, c_idx, c_content = [], [], []
            c_start, c_end, c_link, c_np, c_err = [], [], [], [], []
            for url, warc_ts, bucket, payload in zip(
                batch["url"], batch["warc_ts"], batch["bucket"], batch["html"]
            ):
                for row in extract_page(
                    url,
                    payload,
                    max_len=max_len,
                    overlap=overlap,
                    min_chars=min_chars,
                    split_doc=split_doc,
                ):
                    c_url.append(row.url)
                    c_ts.append(warc_ts)
                    c_bucket.append(bucket)
                    c_doc_id.append(row.doc_id)
                    c_idx.append(row.passage_idx)
                    c_content.append(row.content)
                    c_start.append(row.char_start)
                    c_end.append(row.char_end)
                    c_link.append(row.link)
                    c_np.append(row.n_passages)
                    c_err.append(row.error)
            yield pd.DataFrame(
                {
                    "url": c_url,
                    "warc_ts": c_ts,
                    "bucket": c_bucket,
                    "doc_id": c_doc_id,
                    "passage_idx": c_idx,
                    "content": c_content,
                    "char_start": c_start,
                    "char_end": c_end,
                    "link": c_link,
                    "n_passages": c_np,
                    "error": c_err,
                }
            )

    keyed = with_bucket(pages, cfg.n_buckets).select("url", "warc_ts", "html", "bucket")
    # map-only: no shuffle of the raw payloads (see module docstring);
    # callers that write partitioned output repartition the (smaller)
    # extracted rows on `bucket` at the sink.
    return keyed.mapInPandas(extract_batches, DOCUMENTS_SCHEMA)


def extract_documents_arrow(
    pages: DataFrame, cfg: ExtractConfig = ExtractConfig()
) -> DataFrame:
    """``extract_documents`` via ``mapInArrow`` — the pyarrow-level variant.

    Skips pandas on BOTH sides of the boundary: inputs come out of the
    Arrow RecordBatch as plain python lists (`to_pylist`, cheaper than
    Series construction for string/binary columns), the repeated
    ``warc_ts``/``bucket`` columns are gathered with ``pyarrow.compute.take``
    (no python datetime objects ever materialize), and the output batch is
    built directly with ``pa.array``.

    MEASURED (tools/bench_extract_variants.py, 200k pages, local[32],
    interleaved best-of-3): 52.5k docs/s vs the pandas path's 55.5k —
    0.95×.  The columnar-dict pandas path already avoids the Series
    overhead this variant targets, and `to_pylist` pays what pandas'
    `.values` iteration paid.  Kept (tested byte-identical) as the
    integration point for a future zero-copy kernel; the pandas path stays
    the default."""
    import pyarrow as pa
    import pyarrow.compute as pc

    max_len, overlap, min_chars, split_doc = (
        cfg.max_len,
        cfg.overlap,
        cfg.min_chars,
        cfg.split_doc,
    )

    def extract_batches(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            urls = batch.column(0).to_pylist()  # url
            ts_col = batch.column(1)  # warc_ts: stays Arrow end to end
            payloads = batch.column(2).to_pylist()  # html
            bucket_col = batch.column(3)
            src_idx: list = []  # input row index per OUTPUT row
            c_url, c_doc_id, c_idx, c_content = [], [], [], []
            c_start, c_end, c_link, c_np, c_err = [], [], [], [], []
            for i, (url, payload) in enumerate(zip(urls, payloads)):
                for row in extract_page(
                    url,
                    payload,
                    max_len=max_len,
                    overlap=overlap,
                    min_chars=min_chars,
                    split_doc=split_doc,
                ):
                    src_idx.append(i)
                    c_url.append(row.url)
                    c_doc_id.append(row.doc_id)
                    c_idx.append(row.passage_idx)
                    c_content.append(row.content)
                    c_start.append(row.char_start)
                    c_end.append(row.char_end)
                    c_link.append(row.link)
                    c_np.append(row.n_passages)
                    c_err.append(row.error)
            idx = pa.array(src_idx, type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(c_url, type=pa.string()),
                    pc.take(ts_col, idx),
                    pc.take(bucket_col, idx),
                    pa.array(c_doc_id, type=pa.string()),
                    pa.array(c_idx, type=pa.int32()),
                    pa.array(c_content, type=pa.string()),
                    pa.array(c_start, type=pa.int64()),
                    pa.array(c_end, type=pa.int64()),
                    pa.array(c_link, type=pa.string()),
                    pa.array(c_np, type=pa.int32()),
                    pa.array(c_err, type=pa.string()),
                ],
                names=[
                    "url", "warc_ts", "bucket", "doc_id", "passage_idx", "content",
                    "char_start", "char_end", "link", "n_passages", "error",
                ],
            )

    keyed = with_bucket(pages, cfg.n_buckets).select("url", "warc_ts", "html", "bucket")
    return keyed.mapInArrow(extract_batches, DOCUMENTS_SCHEMA)


def with_bucket(pages: DataFrame, n_buckets: int) -> DataFrame:
    """Attach the resume/layout bucket: ``pmod(xxhash64(url), n_buckets)``.

    Computed as a JVM expression on the input so resume filters prune rows
    BEFORE the Python stage ever sees them."""
    return pages.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(n_buckets)).cast("int")
    )


def passage_counts(documents: DataFrame) -> DataFrame:
    """Per-url passage accounting (reference print at
    /root/reference/src/utils.py:342 → a queryable metrics aggregate)."""
    return documents.groupBy("url").agg(
        F.max("n_passages").alias("n_passages"),
        F.count(F.col("doc_id")).alias("rows_emitted"),
        F.max(F.when(F.col("error").isNotNull(), F.col("error"))).alias("error"),
    )


def documents_from_text(
    pages: DataFrame, cfg: ExtractConfig = ExtractConfig()
) -> DataFrame:
    """WET-path twin of :func:`extract_documents`: documents built from the
    pre-extracted ``text`` column (Common-Crawl *.wet conversion payloads,
    or any corpus whose extraction happened upstream) — same gate/split
    kernel, same output schema, no HTML/PDF decode.  Map-only like the
    HTML path; null texts quarantine."""
    import pandas as pd

    from document_automation_spark.kernels.page import rows_from_text

    max_len, overlap, min_chars, split_doc = (
        cfg.max_len,
        cfg.overlap,
        cfg.min_chars,
        cfg.split_doc,
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in it:
            cols: dict = {name: [] for name in (
                "url", "warc_ts", "bucket", "doc_id", "passage_idx", "content",
                "char_start", "char_end", "link", "n_passages", "error")}
            for url, warc_ts, bucket, text in zip(
                batch["url"], batch["warc_ts"], batch["bucket"], batch["text"]
            ):
                for row in rows_from_text(
                    url, text, max_len=max_len, overlap=overlap,
                    min_chars=min_chars, split_doc=split_doc,
                ):
                    cols["url"].append(row.url)
                    cols["warc_ts"].append(warc_ts)
                    cols["bucket"].append(bucket)
                    cols["doc_id"].append(row.doc_id)
                    cols["passage_idx"].append(row.passage_idx)
                    cols["content"].append(row.content)
                    cols["char_start"].append(row.char_start)
                    cols["char_end"].append(row.char_end)
                    cols["link"].append(row.link)
                    cols["n_passages"].append(row.n_passages)
                    cols["error"].append(row.error)
            yield pd.DataFrame(cols)

    keyed = with_bucket(pages, cfg.n_buckets).select("url", "warc_ts", "text", "bucket")
    return keyed.mapInPandas(batches, DOCUMENTS_SCHEMA)
