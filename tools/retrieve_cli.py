"""Ad-hoc retrieval CLI — the engine-side stand-in for the reference's
Haystack REST API (scripts/run_haystack_api.sh): same three retrieval
methods, served as one Spark plan per query.

Usage:
    python tools/retrieve_cli.py "some query text" \
        [--method bm25|embedding|ensemble] [--k 10] [--rerank] \
        [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    parser = argparse.ArgumentParser(description="ad-hoc retrieval over documents")
    parser.add_argument("query")
    parser.add_argument("--method", default="ensemble",
                        choices=["bm25", "embedding", "ensemble"])
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--rerank", action="store_true")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = parser.parse_args()

    sys.path.insert(0, "/root/repo")
    from document_automation_spark.serving.retrieval import build_retrieval_state, retrieve
    from document_automation_spark.session import build_session

    spark = build_session(app_name="retrieve", master="local[8]", shuffle_partitions=8)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    state = build_retrieval_state(docs)
    out = retrieve(spark, state, args.query, method=args.method, k=args.k,
                   rerank=args.rerank)
    hits = out.join(docs.select("doc_id", "text"), "doc_id").orderBy("rank").collect()
    for r in hits:
        print(f"#{r.rank:<3} doc {r.doc_id:<8} score {r.score:.6f}  {r.text[:90]!r}")
    spark.stop()


if __name__ == "__main__":
    main()
