"""Run the retrieval HTTP API (the reference's run_haystack_api.sh slot).

Usage:
    python tools/serve_api.py [--sf-dir /root/testdata/sf0.01] \
        [--host 127.0.0.1] [--port 8000] [--cpus 8]

Then:
    curl -s localhost:8000/health
    curl -s -XPOST localhost:8000/query \
         -d '{"query": "spark shuffle partition", "method": "ensemble", "top_k": 5}'
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    parser = argparse.ArgumentParser(description="retrieval HTTP API")
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--cpus", type=int, default=8)
    args = parser.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from document_automation_spark.serving.api import make_server
    from document_automation_spark.session import build_session

    spark = build_session(
        app_name="serve-api", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    server = make_server(spark, docs, host=args.host, port=args.port)
    print(f"serving retrieval API on http://{args.host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.retrieval_state.unpersist()
        spark.stop()


if __name__ == "__main__":
    main()
