"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``document_automation_spark``; this module is the
thin wiring layer.  See ``document_automation_spark/queries.py`` for the
registry (one entry per implemented operator from SURVEY.md §2, plus the
training-data-pipeline operators: dedup, similarity, text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the package lives next to this file; make the import independent of the
# caller's working directory / sys.path setup
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from document_automation_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full extraction pipeline (pages → passages table).

    Loads sf0.001 parquet to size the run, synthesizes the deterministic
    Common-Crawl-style pages table (FIXTURES.md §1 — seed-pinned, no
    external data), and runs the mapInPandas extraction: HTML boilerplate
    strip / PDF parse → ad-filter → 500/10/5 passage split with char spans,
    quarantine rows for malformed payloads.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from document_automation_spark.operators.extract import ExtractConfig, extract_documents
    from document_automation_spark.sources.pages import pages_df

    sf_dir = "/root/testdata/sf0.001"
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    pages = pages_df(spark, max(200, n_docs))
    return extract_documents(pages, ExtractConfig(n_buckets=16))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 + pipeline extras)."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query."""
    return _registry.oracle_sql()
