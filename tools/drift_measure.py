"""Calm-window re-measure protocol for flagged bench-row drift.

The shared host's load swings bench rows by ±40% (BENCH/BASELINE.md);
this tool makes a drift claim decidable: it interleaves a fixed pure-JVM
SENTINEL workload (whose true cost never changes across rounds) with the
flagged row, runs many reps, and reports each row's best-of over only the
CALM reps — reps whose sentinel time sat within 25% of the session's best
sentinel.  A regression that survives calm-window best-of is real; one
that disappears was host noise.

    python tools/drift_measure.py [reps] [row ...]

Rows default to the flagship trio.  Rows come from the same callables
bench.py times (tools/profile_queries.bench_callables), at
$SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS with the bench session confs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rows = sys.argv[2:] or ["extraction_pipeline", "extraction_durable", "ingest_durable"]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from document_automation_spark.session import build_session

    spark = build_session(
        app_name="drift-measure",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "262144",
        },
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def sink(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def sentinel() -> float:
        """Fixed pure-JVM workload: codegen'd aggregation over a range —
        no disk, no Python, so its time moves only with host load."""
        from pyspark.sql import functions as F

        t0 = time.time()
        sink(
            spark.range(30_000_000).select(
                (F.col("id") * 2654435761 % 1000003).alias("k")
            ).groupBy("k").count()
        )
        return time.time() - t0

    # bench-row callables, including the bare-operator overrides and the
    # durable/ingest flagship rows (reconstructed like bench.py does)
    import shutil
    import tempfile

    from document_automation_spark.operators.extract import (
        ExtractConfig,
        extract_documents,
    )
    from document_automation_spark.plans.checkpoint import run_extraction_job
    from document_automation_spark.jobs.ingest_pipeline import run_ingest_pipeline
    from tools.profile_queries import bench_callables

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", max(1000, int(2_000_000 * sf))))
    from document_automation_spark.sources.pages import FIXTURE_VERSION, pages_df

    pages_path = os.path.join(
        tempfile.gettempdir(), f"bench_pages_v{FIXTURE_VERSION}_sf{sf}_n{n_pages}"
    )
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        pages_df(spark, n_pages, partitions=cpus * 2).write.mode("overwrite").parquet(
            pages_path
        )
    pages = spark.read.parquet(pages_path)
    cfg = ExtractConfig(n_buckets=max(64, cpus * 2))

    def _flagship(spark_, _sf_dir):
        return extract_documents(pages, cfg)

    def _durable(spark_, _sf_dir):
        out = tempfile.mkdtemp(prefix="drift_durable_")
        shutil.rmtree(out, ignore_errors=True)
        run_extraction_job(spark_, pages, out, f"drift-{time.time_ns()}", cfg)
        shutil.rmtree(out, ignore_errors=True)
        return None

    def _ingest(spark_, _sf_dir):
        out = tempfile.mkdtemp(prefix="drift_ingest_")
        shutil.rmtree(out, ignore_errors=True)
        run_ingest_pipeline(spark_, pages, out, f"drift-{time.time_ns()}", cfg=cfg)
        shutil.rmtree(out, ignore_errors=True)
        return None

    qs = bench_callables(spark, sf_dir)
    qs["extraction_pipeline"] = _flagship
    qs["extraction_durable"] = _durable
    qs["ingest_durable"] = _ingest

    sink(extract_documents(pages, cfg))  # python-pool + codegen warm-up
    sentinel()  # sentinel codegen warm-up

    samples: dict = {name: [] for name in rows}
    sentinels: list = []
    for rep in range(reps):
        s = sentinel()
        sentinels.append(round(s, 3))
        for name in rows:
            t0 = time.time()
            result = qs[name](spark, sf_dir)
            if result is not None:
                sink(result)
            samples[name].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()

    best_sentinel = min(sentinels)
    calm = [i for i, s in enumerate(sentinels) if s <= best_sentinel * 1.25]
    report = {
        "sentinels": sentinels,
        "calm_reps": calm,
        "rows": {
            name: {
                "samples": vals,
                "best": min(vals),
                "calm_best": min(vals[i] for i in calm),
            }
            for name, vals in samples.items()
        },
        "n_pages": n_pages,
        "cpus": cpus,
        "sf": sf,
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
