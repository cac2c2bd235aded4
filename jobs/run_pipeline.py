#!/usr/bin/env python
"""spark-submit entry point (north_rule: run via spark-submit --py-files).

Usage:
  spark-submit --py-files logmetrics_spark.zip jobs/run_pipeline.py \
      --config configs/rest_api.toml --pages /path/to/pages \
      --out /path/to/out [--resume-dir /path/state] [--lookup hosts=/path]

Batch mode by default; --resume-dir switches to the per-partition
lineage/resume path (plans.lineage). At cluster scale set
--shuffle-partitions ~ 2-3x total executor cores.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config",
        required=True,
        action="append",
        help="TOML config; repeatable — multiple configs run all their "
        "log groups off ONE pages scan (run_pipeline_multi)",
    )
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "-D",
        "--do-not-send",
        action="store_true",
        help="print routed put lines to stdout instead of writing sink "
        "tables (reference tsdpusher.go:62-63 -D flag)",
    )
    ap.add_argument("--resume-dir", default=None)
    ap.add_argument("--lookup", action="append", default=[], help="name=path parquet")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from logmetrics_spark.config import load_config
    from logmetrics_spark.plans.lineage import run_resumable
    from logmetrics_spark.plans.pipeline import run_pipeline
    from logmetrics_spark.sources.tableio import TableIO

    builder = SparkSession.builder.appName("logmetrics_spark.pipeline")
    builder = builder.config("spark.sql.session.timeZone", "UTC")
    builder = builder.config("spark.sql.adaptive.enabled", "true")
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
    spark = builder.getOrCreate()

    cfgs = [load_config(c) for c in args.config]
    cfg = cfgs[0]
    lookups = {}
    for spec in args.lookup:
        name, path = spec.split("=", 1)
        lookups[name] = spark.read.parquet(path)

    def build(pages):
        if len(cfgs) == 1:
            return run_pipeline(spark, cfg, pages, io=None, lookups=lookups, write=False)
        from logmetrics_spark.plans.pipeline import run_pipeline_multi

        return run_pipeline_multi(spark, cfgs, pages, lookups=lookups)

    if args.resume_dir:
        if len(cfgs) > 1:
            ap.error("--resume-dir supports a single --config")
        stats = run_resumable(spark, cfg, args.pages, args.resume_dir, lookups)
        print(stats)
    elif args.do_not_send:
        from logmetrics_spark.operators.route import console_sink

        res = build(spark.read.parquet(args.pages))
        n = console_sink(res.routed)
        print(f"# {n} lines (not sent: -D)", file=sys.stderr)
    else:
        if not args.out:
            ap.error("--out is required unless -D/--do-not-send is set")
        pages = spark.read.parquet(args.pages)
        io = TableIO(root=args.out)
        if len(cfgs) == 1:
            res = run_pipeline(spark, cfg, pages, io=io, lookups=lookups, write=True)
            print({"routed_manifest": res.stats.get("routed_manifest", {}).get("snapshot_id")})
        else:
            from logmetrics_spark.operators.route import (
                pool_stats,
                pusher_stats,
                write_routed,
            )

            res = build(pages)
            manifest = write_routed(res.routed, io)
            routed_back = io.read(spark, "routed")
            io.write(pusher_stats(routed_back), "stats_pusher", manifest_extra={"kind": "stats"})
            io.write(pool_stats(res.emissions), "stats_pool",
                     manifest_extra={"kind": "stats"})
            print({"routed_manifest": manifest.get("snapshot_id")})
    spark.stop()


if __name__ == "__main__":
    main()
