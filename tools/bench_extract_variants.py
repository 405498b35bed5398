"""A/B the extraction boundary: mapInPandas (columnar dict) vs mapInArrow.

Same kernel, same input, best-of-N each, interleaved to cancel host drift.

    python tools/bench_extract_variants.py [--pages 200000] [--cpus 32] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--pages", type=int, default=200_000)
    parser.add_argument("--cpus", type=int, default=32)
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    sys.path.insert(0, "/root/repo")
    from document_automation_spark.operators.extract import (
        ExtractConfig,
        extract_documents,
        extract_documents_arrow,
    )
    from document_automation_spark.session import build_session
    from document_automation_spark.sources.pages import pages_df

    spark = build_session(
        app_name="ab-extract",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "262144",
        },
    )
    from document_automation_spark.sources.pages import FIXTURE_VERSION
    pages_path = os.path.join(
        tempfile.gettempdir(), f"bench_pages_v{FIXTURE_VERSION}_sf0.1_n{args.pages}"
    )
    if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
        pages_df(spark, args.pages, partitions=args.cpus * 2).write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    cfg = ExtractConfig(n_buckets=max(64, args.cpus * 2))

    variants = {"pandas": extract_documents, "arrow": extract_documents_arrow}

    def sink(df):
        df.write.mode("overwrite").format("noop").save()

    for fn in variants.values():  # warm both paths
        sink(fn(pages, cfg))

    best = {k: float("inf") for k in variants}
    for _ in range(args.reps):  # interleave to cancel host drift
        for name, fn in variants.items():
            t0 = time.time()
            sink(fn(pages, cfg))
            best[name] = min(best[name], time.time() - t0)

    out = {
        name: {"best_s": round(s, 3), "docs_per_sec": round(args.pages / s, 1)}
        for name, s in best.items()
    }
    out["arrow_speedup"] = round(best["pandas"] / best["arrow"], 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
