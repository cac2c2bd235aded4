"""Per-partition lineage + resumable execution (north_rule requirement).

The reference daemon never built persistence (its TODO:
"Persist file tailer position and datapool to disk",
``README.md:355``); this module is the Spark-native design for it:

- **work unit** = one input parquet file of the pages table (the
  analog of one tailed log file);
- **stage 1 (per-unit, resumable)**: parse -> transform -> fan-out ->
  phase-A partial aggregation, written to a staging table under
  ``unit=<id>/``. Partials are *associative* (per-tick sums, top-s
  reservoir candidates), so units are independent and a crashed run
  resumes by recomputing only units without a committed lineage entry;
- **stage 2 (global, idempotent)**: the per-key crunch + route runs
  over the union of all unit partials and overwrites the routed
  tables — cheap relative to stage 1 (partials are tiny), so it simply
  re-runs after resume.

Lineage entries are committed atomically (tmp + rename) AFTER the
unit's write succeeds, and carry row counts + an order-free checksum
for audit. This is the manifest-JSON stand-in for Iceberg snapshot
commits (see ``sources/tableio.py``).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import LogGroup, PipelineConfig
from ..operators.aggregate import crunch_emissions, partial_stage
from ..operators.route import route_stage
from ..plans.pipeline import build_datapoints
from ..sources.tableio import TableIO


def _unit_id(path: str) -> str:
    return hashlib.md5(path.encode()).hexdigest()[:16]


@dataclass
class LineageStore:
    state_dir: str

    def _path(self) -> str:
        return os.path.join(self.state_dir, "lineage.json")

    def load(self) -> dict:
        p = self._path()
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)
        return {}

    def commit(self, unit: str, entry: dict) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        state = self.load()
        state[unit] = entry
        tmp = self._path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh, indent=1)
        os.replace(tmp, self._path())  # atomic commit


def plan_units(spark: SparkSession, pages_path: str) -> list[str]:
    """Work units = input files (the 'filename glob' of the scan)."""
    return sorted(spark.read.parquet(pages_path).inputFiles())


def run_stage1_units(
    spark: SparkSession,
    cfg: PipelineConfig,
    pages_path: str,
    staging_dir: str,
    store: LineageStore,
    lookups: dict[str, DataFrame] | None = None,
) -> tuple[int, int]:
    """Compute + commit partials for every un-done unit.
    Returns (n_done_before, n_computed_now)."""
    lookups = lookups or {}
    units = plan_units(spark, pages_path)
    state = store.load()
    done = 0
    computed = 0
    for path in units:
        uid = _unit_id(path)
        if uid in state and state[uid].get("status") == "done":
            done += 1
            continue
        pages = spark.read.parquet(path)
        out_dir = os.path.join(staging_dir, f"u={uid}")
        total_rows = 0
        checksum = 0
        for lg in cfg.log_groups:
            dp = build_datapoints(pages, lg, lookups.get(lg.lookup or ""))
            part = partial_stage(dp, lg)
            part.write.mode("overwrite").parquet(os.path.join(out_dir, f"g={lg.name}"))
            back = spark.read.parquet(os.path.join(out_dir, f"g={lg.name}"))
            agg = back.agg(
                F.count(F.lit(1)).alias("n"),
                # order-free audit checksum, bounded to avoid ANSI
                # long-sum overflow on full-range xxhash64 values
                F.sum(F.pmod(F.xxhash64("key_id", "w", "t"), F.lit(1 << 31))).alias("chk"),
            ).collect()[0]
            total_rows += agg["n"]
            checksum ^= (agg["chk"] or 0) & ((1 << 63) - 1)
        store.commit(
            uid,
            {"status": "done", "path": path, "rows": int(total_rows), "checksum": int(checksum)},
        )
        computed += 1
    return done, computed


def run_stage2_global(
    spark: SparkSession,
    cfg: PipelineConfig,
    staging_dir: str,
    io: TableIO,
) -> DataFrame:
    """Global crunch + route over all unit partials (idempotent)."""
    routed_parts = []
    for lg in cfg.log_groups:
        part = spark.read.option("basePath", staging_dir).parquet(
            os.path.join(staging_dir, "u=*", f"g={lg.name}")
        )
        part = part.drop("u", "g")
        glw = part.agg(F.max("w")).collect()[0][0]
        if glw is None:
            continue
        emissions = crunch_emissions(part, lg, int(glw))
        routed_parts.append(route_stage(emissions, cfg.settings))
    routed = routed_parts[0]
    for p in routed_parts[1:]:
        routed = routed.unionByName(p)
    io.write(routed, "routed", mode="overwrite", partition_by=("sink",),
             manifest_extra={"kind": "routed_sink", "resumable": True})
    return routed


def run_resumable(
    spark: SparkSession,
    cfg: PipelineConfig,
    pages_path: str,
    work_dir: str,
    lookups: dict[str, DataFrame] | None = None,
) -> dict:
    """Full resumable run; call again after a crash to continue."""
    staging = os.path.join(work_dir, "staging")
    store = LineageStore(os.path.join(work_dir, "lineage"))
    done, computed = run_stage1_units(spark, cfg, pages_path, staging, store, lookups)
    io = TableIO(root=os.path.join(work_dir, "out"))
    routed = run_stage2_global(spark, cfg, staging, io)
    return {
        "units_skipped": done,
        "units_computed": computed,
        "routed_rows": routed.count(),
        "out": os.path.join(work_dir, "out"),
    }
