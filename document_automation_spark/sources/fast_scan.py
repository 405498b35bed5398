"""Fused native scan + extract: pyarrow reads inside the Python stage.

The standard pipeline pays the payload twice at the JVM/Python boundary:
JVM parquet decode → Arrow IPC → pandas, then pandas → Arrow → JVM for the
output.  For a Python-kernel-bound job the input hop is pure overhead
(measured: the decode-only floor is ~40% of total stage time).  This
operator removes it: Spark distributes (file, row-group) work units as
ROWS, and each task reads its row group with pyarrow directly — executors
touch the payload bytes exactly once, in the process that parses them.

This is the classic "custom scan via mapInPandas" pattern (SURVEY.md
§2.11): Spark still owns scheduling, retries, speculative execution and
the downstream plan; only the leaf read is native.  Row-group granularity
keeps units size-bounded (write pages with ~4-16 MB row groups), and the
work-unit DataFrame doubles as the resume ledger at file granularity.

Trade-off vs the standard path: no JVM-side predicate pushdown into the
scan — this fused form is for full-corpus extraction passes where the job
reads everything anyway; selective scans should stay on `spark.read`.

MEASURED VERDICT (this sandbox, 400k pages, local[16]): the standard path
wins — 47.2k docs/s vs 39.9k fused.  Spark's vectorized JVM parquet reader
+ Arrow IPC is faster than pyarrow-read + to_pylist object conversion, and
size-split scan tasks schedule finer than row-group units.  The operator
stays as the pattern reference (and for sources Spark cannot read
natively: WARC files, custom container formats — swap the pq.ParquetFile
call for a WARC reader and everything else holds); the default pipeline
remains `operators.extract.extract_documents`.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from document_automation_spark.kernels.page import extract_page
from document_automation_spark.operators.extract import DOCUMENTS_SCHEMA, ExtractConfig

_UNIT_SCHEMA = "path string, row_group int"


def parquet_work_units(input_path: str) -> List[Tuple[str, int]]:
    """(file, row_group) work units from parquet footers (metadata-only)."""
    import pyarrow.parquet as pq

    units: List[Tuple[str, int]] = []
    for name in sorted(os.listdir(input_path)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(input_path, name)
        for rg in range(pq.ParquetFile(full).metadata.num_row_groups):
            units.append((full, rg))
    return units


def extract_documents_native(
    spark: SparkSession,
    input_path: str,
    cfg: ExtractConfig = ExtractConfig(),
) -> DataFrame:
    """pages parquet dir → documents, with the scan fused into the kernel."""
    import pandas as pd

    units = parquet_work_units(input_path)
    if not units:
        raise ValueError(f"no parquet files under {input_path}")
    unit_df = spark.createDataFrame(units, _UNIT_SCHEMA).repartition(len(units))

    max_len, overlap, min_chars, split_doc = (
        cfg.max_len,
        cfg.overlap,
        cfg.min_chars,
        cfg.split_doc,
    )
    out_fields = [f.name for f in DOCUMENTS_SCHEMA.fields if f.name != "bucket"]

    def scan_extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pyarrow.parquet as pq

        for batch in batches:
            for path, row_group in zip(batch["path"], batch["row_group"]):
                table = pq.ParquetFile(path).read_row_group(
                    int(row_group), columns=["url", "warc_ts", "html"]
                )
                urls = table.column("url").to_pylist()
                stamps = table.column("warc_ts").to_pylist()
                payloads = table.column("html").to_pylist()
                cols = {name: [] for name in out_fields}
                for url, warc_ts, payload in zip(urls, stamps, payloads):
                    for row in extract_page(
                        url,
                        payload,
                        max_len=max_len,
                        overlap=overlap,
                        min_chars=min_chars,
                        split_doc=split_doc,
                    ):
                        cols["url"].append(row.url)
                        cols["warc_ts"].append(warc_ts)
                        cols["doc_id"].append(row.doc_id)
                        cols["passage_idx"].append(row.passage_idx)
                        cols["content"].append(row.content)
                        cols["char_start"].append(row.char_start)
                        cols["char_end"].append(row.char_end)
                        cols["link"].append(row.link)
                        cols["n_passages"].append(row.n_passages)
                        cols["error"].append(row.error)
                yield pd.DataFrame(cols)

    narrow_schema = "url string, warc_ts timestamp, doc_id string, passage_idx int, " \
        "content string, char_start long, char_end long, link string, " \
        "n_passages int, error string"
    out = unit_df.mapInPandas(scan_extract, narrow_schema)
    # bucket computed JVM-side on the OUTPUT (same expression as the
    # standard path → identical resume/layout semantics)
    return out.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(cfg.n_buckets)).cast("int")
    ).select([f.name for f in DOCUMENTS_SCHEMA.fields])
