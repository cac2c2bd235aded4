#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): noop-sink timing of
individual registry queries at an arbitrary SF dir, plus
``.explain("formatted")`` capture for the plan evidence in
plans/r06/. Mirrors the FROZEN bench.py query-phase session exactly
(local[min(CPUS,16)], shuffle=cores, arrow batch 8192, speculation)
so numbers here are comparable to the driver record.

Usage:
    python bench_extra.py [--sf DIR] [--runs N] [--explain-dir D]
                          [--tag SUFFIX] [query ...]

Prints one JSON line: {"sf_dir": ..., "runs": N, "queries": {...}}
(per-query min over N runs, cache cleared between runs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark(cores: int):
    from logmetrics_spark.session import get_spark

    return get_spark(
        f"benchx{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.execution.arrow.maxRecordsPerBatch": os.environ.get(
                "BENCH_ARROW_BATCH", "8192"
            ),
            "spark.speculation": "true",
            "spark.speculation.multiplier": "1.5",
            "spark.speculation.quantile": "0.75",
        },
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain-dir", default=None, help="dir for <query><tag>.txt plan dumps")
    ap.add_argument("--tag", default="", help="suffix for plan files, e.g. _before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from logmetrics_spark.entry_queries import REGISTRY

    names = args.queries or list(REGISTRY)
    spark = _spark(min(CPUS, 16))
    out: dict[str, float] = {}
    try:
        for name in names:
            fn, _ = REGISTRY[name]
            if args.explain_dir:
                os.makedirs(args.explain_dir, exist_ok=True)
                df = fn(spark, args.sf)
                txt = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
                with open(os.path.join(args.explain_dir, f"{name}{args.tag}.txt"), "w") as f:
                    f.write(txt)
                spark.catalog.clearCache()
            times = []
            for _ in range(args.runs):
                spark.sparkContext.setJobDescription(f"benchx:{name}")
                t0 = time.time()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                times.append(time.time() - t0)
                spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
            out[name] = round(min(times), 3)
            print(f"## {name}: {out[name]}s  (runs: {[round(t, 2) for t in times]})",
                  file=sys.stderr, flush=True)
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": args.sf, "runs": args.runs, "queries": out}))


if __name__ == "__main__":
    main()
