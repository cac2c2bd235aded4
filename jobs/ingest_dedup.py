#!/usr/bin/env python
"""spark-submit entry point for the streaming ingest-dedup job.

Usage:
  spark-submit --py-files logmetrics_spark.zip jobs/ingest_dedup.py \
      --docs /path/to/doc_drops --out /path/to/corpus \
      --checkpoint /path/to/ck [--threshold 0.4] [--bucket-cap 64] \
      [--continuous] [--max-files 4]

Watches --docs for new parquet files (doc_id long, text string); each
micro-batch is deduped within itself (MinHash LSH), then against the
kept corpus through the persistent index under --out, then appended
(docs + index rows) idempotently per batch. Default drains the
current file set and exits (availableNow backfill); --continuous
keeps tailing. Restarts with the same --checkpoint resume from the
last committed micro-batch.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="input doc-drop directory")
    ap.add_argument("--out", required=True, help="corpus root (kept + index)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--threshold", type=float, default=0.4)
    ap.add_argument(
        "--bucket-cap", type=int, default=64,
        help="viral-bucket candidate cap on the index probe (0 disables)",
    )
    ap.add_argument(
        "--continuous", action="store_true",
        help="keep tailing --docs instead of draining once and exiting",
    )
    ap.add_argument("--max-files", type=int, default=4)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from logmetrics_spark.streaming.ingest_dedup import run_streaming_ingest_dedup

    builder = SparkSession.builder.appName("logmetrics_spark.ingest_dedup")
    builder = builder.config("spark.sql.session.timeZone", "UTC")
    builder = builder.config("spark.sql.adaptive.enabled", "true")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    q, sink = run_streaming_ingest_dedup(
        spark,
        args.docs,
        args.out,
        args.checkpoint,
        threshold=args.threshold,
        bucket_cap=args.bucket_cap or None,
        available_now=not args.continuous,
        max_files=args.max_files,
    )
    q.awaitTermination()
    try:
        n = sink.kept_docs(spark).count()
    except Exception:
        n = 0  # drained zero micro-batches: kept dir never created
    print(f"# kept corpus: {n} docs under {sink.kept_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
