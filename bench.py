#!/usr/bin/env python
"""Benchmark runner (driver contract + BASELINE.md scaling evidence).

Prints ONE JSON line:
  {"metric": ..., "value": <sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>,
   "pages_per_sec": ..., "scaling": {...}}

Two parts:

1. **Pipeline throughput + scaling** — the BASELINE.json metric.
   Generates a deterministic synthetic pages table (cached parquet),
   runs the full parse->aggregate->route pipeline (both fixture
   grammars, throughput profile) at local[N/4] and local[N]
   (N = $SPARK_GRAFT_CPUS), reports pages/sec at both and
   efficiency = (pps_high / pps_low) / 4 — the sandbox stand-in for
   the N->4N executor scaling rule.

2. **Headline operator queries** — a representative subset of the
   __spark_entry__ registry timed at $SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import dataclasses

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("BENCH_PAGES", "100000"))
CACHE = os.environ.get("BENCH_CACHE", "/root/repo/.bench_cache")

HEADLINE = [
    "parse_extract",
    "meter_window_sum",
    "counter_running",
    "hist_moments",
    "hist_percentiles",
    "route_put_lines",
    "sink_routing",
    "enrich_broadcast_join",
    "gap_fill_windows",
    "watermark_late_rows",
    "pricing_summary",
    "star_join_counts",
    "topk_orders",
    "text_quality",
    "text_lang_id",
    "dedup_exact",
    "ann_cosine_topk",
]


def _spark(cores: int):
    from logmetrics_spark.session import get_spark

    return get_spark(
        f"bench{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _bench_configs():
    """Throughput profile: both grammars, no duplicate-heartbeat spam
    (dup emission is output-volume-bound, not compute-bound)."""
    from logmetrics_spark.config import load_config

    cfgs = []
    for path in ("configs/rest_api.toml", "configs/apache.toml"):
        cfg = load_config(os.path.join(os.path.dirname(os.path.abspath(__file__)), path))
        lgs = tuple(
            dataclasses.replace(lg, send_duplicates=False, stale_removal=False, interval=60)
            for lg in cfg.log_groups
        )
        cfgs.append(dataclasses.replace(cfg, log_groups=lgs))
    return cfgs


def ensure_pages(spark) -> str:
    from logmetrics_spark.sources.synth import SynthSpec, gen_pages_spark

    path = os.path.join(CACHE, f"pages_{N_PAGES}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        spec = SynthSpec(n_rows=N_PAGES, time_span_seconds=3600)
        gen_pages_spark(spark, spec, max(CPUS * 4, 64)).write.mode("overwrite").parquet(path)
    return path


def run_pipeline_once(cores: int, pages_path: str) -> float:
    from logmetrics_spark.plans.pipeline import run_pipeline
    from logmetrics_spark.sources.synth import gen_hosts_lookup_pdf

    spark = _spark(cores)
    try:
        pages = spark.read.parquet(pages_path)
        lookups = {"hosts": spark.createDataFrame(gen_hosts_lookup_pdf())}
        t0 = time.time()
        for cfg in _bench_configs():
            res = run_pipeline(spark, cfg, pages, io=None, lookups=lookups, write=False)
            res.routed.write.format("noop").mode("overwrite").save()
        return time.time() - t0
    finally:
        spark.stop()


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # --- part 1: scaling evidence (BASELINE metric) ---
    lo_cores = max(CPUS // 4, 1)
    warm = _spark(CPUS)
    pages_path = ensure_pages(warm)
    warm.stop()

    sec_lo = run_pipeline_once(lo_cores, pages_path)
    sec_hi = run_pipeline_once(CPUS, pages_path)
    pps_lo = N_PAGES / sec_lo
    pps_hi = N_PAGES / sec_hi
    efficiency = (pps_hi / pps_lo) / (CPUS / lo_cores)

    # --- part 2: headline operator queries at SF_DIR ---
    from logmetrics_spark.entry_queries import REGISTRY

    spark = _spark(CPUS)
    queries: dict[str, float] = {}
    try:
        for name in HEADLINE:
            fn, _ = REGISTRY[name]
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            queries[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()

    out = {
        "metric": "pipeline_e2e_sec_local%d" % CPUS,
        "value": round(sec_hi, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_val,
        "pages": N_PAGES,
        "pages_per_sec": round(pps_hi, 1),
        "scaling": {
            "cores_low": lo_cores,
            "cores_high": CPUS,
            "sec_low": round(sec_lo, 3),
            "sec_high": round(sec_hi, 3),
            "pages_per_sec_low": round(pps_lo, 1),
            "pages_per_sec_high": round(pps_hi, 1),
            "efficiency": round(efficiency, 3),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
