"""SparkSession factory tuned for the extraction workload.

Settings chosen for 100 TB-scale behavior (and correct small-scale tests):

* AQE on (+ skew-join + partition coalescing) — runtime re-planning is the
  first line of defense against host-level Zipf skew;
* Arrow enabled with a bounded ``maxRecordsPerBatch`` so pandas-UDF batches
  of multi-KB HTML payloads stay comfortably in executor memory;
* ``spark.sql.session.timeZone=UTC`` so timestamps compare exactly against
  the DuckDB oracle (duckdb timestamps are UTC-naive);
* shuffle partitions default to the core count locally — on a real cluster
  set ``spark.sql.shuffle.partitions`` ≈ 2-3× total executor cores and let
  AQE coalesce.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "document-automation-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = os.cpu_count() if inner == "*" else int(inner)
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
