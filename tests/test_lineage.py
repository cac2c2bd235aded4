"""Resumable execution tests: per-unit lineage, crash-resume, and
resumable-vs-single-shot routed-row equality."""

import collections
import json
import os

import numpy as np
import pytest

from logmetrics_spark.plans.lineage import LineageStore, plan_units, run_resumable
from logmetrics_spark.plans.pipeline import run_pipeline
from logmetrics_spark.sources.synth import SynthSpec, gen_pages_pdf


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("lineage")
    path = str(base / "pages")
    spec = SynthSpec(n_rows=100, time_span_seconds=300)
    pdf = gen_pages_pdf(np.arange(100), spec)
    spark.createDataFrame(pdf).repartition(4).write.mode("overwrite").parquet(path)
    return {"path": path, "base": str(base)}


def test_resume_skips_done_units(spark, apache_cfg, pages_dir):
    work = f"{pages_dir['base']}/work1"
    r1 = run_resumable(spark, apache_cfg, pages_dir["path"], work)
    assert r1["units_computed"] == 4 and r1["units_skipped"] == 0
    r2 = run_resumable(spark, apache_cfg, pages_dir["path"], work)
    assert r2["units_computed"] == 0 and r2["units_skipped"] == 4
    assert r1["routed_rows"] == r2["routed_rows"] > 0


def test_crash_resume_recomputes_only_missing(spark, apache_cfg, pages_dir):
    work = f"{pages_dir['base']}/work2"
    run_resumable(spark, apache_cfg, pages_dir["path"], work)
    # simulate a crash that lost one unit's lineage commit
    lp = os.path.join(work, "lineage", "lineage.json")
    state = json.load(open(lp))
    victim = sorted(state)[0]
    del state[victim]
    json.dump(state, open(lp, "w"))
    r = run_resumable(spark, apache_cfg, pages_dir["path"], work)
    assert r["units_computed"] == 1 and r["units_skipped"] == 3


def test_resumable_equals_single_shot(spark, apache_cfg, pages_dir):
    work = f"{pages_dir['base']}/work3"
    run_resumable(spark, apache_cfg, pages_dir["path"], work)
    from logmetrics_spark.sources.tableio import TableIO

    io = TableIO(root=os.path.join(work, "out"))
    resumable_rows = collections.Counter(
        (r["line"], r["sink"]) for r in io.read(spark, "routed").collect()
    )
    single = run_pipeline(
        spark, apache_cfg, spark.read.parquet(pages_dir["path"]), io=None, write=False
    )
    single_rows = collections.Counter(
        (r["line"], r["sink"]) for r in single.routed.collect()
    )
    assert resumable_rows == single_rows


def test_lineage_entries_carry_audit_fields(spark, apache_cfg, pages_dir):
    work = f"{pages_dir['base']}/work1"  # already run
    store = LineageStore(os.path.join(work, "lineage"))
    state = store.load()
    assert len(state) == 4
    for entry in state.values():
        assert entry["status"] == "done"
        assert entry["rows"] >= 0 and "checksum" in entry and entry["path"]
