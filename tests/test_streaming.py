"""Structured Streaming stage tests: file-source stream, watermarked
partials (streaming result == batch result), stateful meter operator."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from logmetrics_spark.plans.pipeline import build_datapoints
from logmetrics_spark.sources.synth import SynthSpec, gen_pages_pdf
from logmetrics_spark.streaming.stream_pipeline import (
    read_pages_stream,
    run_stream_to_table,
    streaming_datapoints,
    streaming_meters,
    streaming_partials,
)


@pytest.fixture(scope="module")
def stream_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    src = str(base / "pages")
    os.makedirs(src, exist_ok=True)
    spec = SynthSpec(n_rows=80, time_span_seconds=300)
    pdf = gen_pages_pdf(np.arange(80), spec)
    # two "discovered files" (the glob-poller analog)
    spark.createDataFrame(pdf.iloc[:40]).coalesce(1).write.mode("overwrite").parquet(src + "/f1")
    spark.createDataFrame(pdf.iloc[40:]).coalesce(1).write.mode("overwrite").parquet(src + "/f2")
    # flatten: stream source reads a dir of parquet files
    flat = str(base / "flat")
    os.makedirs(flat, exist_ok=True)
    import glob as _g
    import shutil

    for i, f in enumerate(sorted(_g.glob(src + "/f*/part-*.parquet"))):
        shutil.copy(f, f"{flat}/file{i}.parquet")
    return {"flat": flat, "base": str(base), "pdf": pdf}


def test_streaming_partials_match_batch(spark, rest_cfg, stream_dirs):
    lg = rest_cfg.log_groups[0]
    stream = read_pages_stream(spark, stream_dirs["flat"], max_files=1)
    sp = streaming_partials(streaming_datapoints(stream, lg), lg, watermark="0 seconds")
    out = f"{stream_dirs['base']}/partials_out"
    ck = f"{stream_dirs['base']}/ck1"
    q = run_stream_to_table(sp, out, ck)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    batch_pages = spark.read.parquet(stream_dirs["flat"])
    bdp = build_datapoints(batch_pages, lg)
    expect = (
        bdp.withColumn("event_time", F.col("ts_sec").cast("timestamp"))
        .groupBy(
            "key_id",
            F.window("event_time", f"{lg.interval} seconds").alias("win"),
        )
        .agg(F.sum("value").alias("psum"))
        .select("key_id", F.unix_timestamp("win.start").cast("long").alias("w_start"), "psum")
    )
    g = {(r["key_id"], r["w_start"]): r["psum"] for r in got.select("key_id", "w_start", "psum").collect()}
    e = {(r["key_id"], r["w_start"]): r["psum"] for r in expect.collect()}
    # append-mode streaming emits only watermark-closed windows: subset
    assert g, "stream produced no partials"
    for k, v in g.items():
        assert e.get(k) == v, f"partial mismatch at {k}: {v} vs {e.get(k)}"
    # with watermark 0 and availableNow, all but the last window close
    assert len(g) >= len(e) - len({r["key_id"] for r in expect.collect()})


def test_streaming_meters_stateful(spark, rest_cfg, stream_dirs):
    lg = rest_cfg.log_groups[0]
    stream = read_pages_stream(spark, stream_dirs["flat"], max_files=2)
    sm = streaming_meters(streaming_datapoints(stream, lg), lg, watermark="0 seconds")
    out = f"{stream_dirs['base']}/meters_out"
    ck = f"{stream_dirs['base']}/ck2"
    q = run_stream_to_table(sm, out, ck)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    rows = got.collect()
    assert rows, "stateful meter stream produced no rows"
    batch_counts = {
        r["key_id"]: r["total"]
        for r in build_datapoints(spark.read.parquet(stream_dirs["flat"]), lg)
        .filter(F.col("metric_type") == "meter")
        .groupBy("key_id")
        .agg(F.sum("value").alias("total"))
        .collect()
    }
    # last state snapshot per key must equal the batch total
    latest = {}
    for r in rows:
        if r["key_id"] not in latest or r["ts"] >= latest[r["key_id"]]["ts"]:
            latest[r["key_id"]] = r
    for k, r in latest.items():
        assert batch_counts.get(k) == r["count"], f"meter count mismatch for {k}"
    assert all(r["rate_1min"] >= 0 for r in rows)


def test_streaming_routed_foreachbatch_resume(spark, apache_cfg, stream_dirs, tmp_path):
    """foreachBatch end-to-end: routed rows appear per micro-batch;
    restarting with the same checkpoint does NOT reprocess committed
    files (offset resume)."""
    from logmetrics_spark.streaming.stream_pipeline import run_streaming_routed

    out = str(tmp_path / "sroute")
    q = run_streaming_routed(spark, apache_cfg, stream_dirs["flat"], out)
    q.awaitTermination(120)
    routed1 = spark.read.parquet(out + "/routed")
    n1 = routed1.count()
    assert n1 > 0
    assert {r["sink"] for r in routed1.select("sink").distinct().collect()} == {"sink_0", "sink_1"}
    assert routed1.filter(routed1.line.startswith("put apache.")).count() > 0

    # restart with same checkpoint: no new input -> no new rows
    q2 = run_streaming_routed(spark, apache_cfg, stream_dirs["flat"], out)
    q2.awaitTermination(120)
    assert spark.read.parquet(out + "/routed").count() == n1


def test_streaming_equals_batch(spark, apache_cfg, stream_dirs, tmp_path):
    """North-rule parity: the streaming pipeline (2+ micro-batches,
    partials accumulated across batches, one global crunch) produces
    EXACTLY the batch pipeline's routed rows — cumulative counters,
    EWMAs, stale zero-outs and duplicate heartbeats included."""
    import collections

    from logmetrics_spark.plans.pipeline import run_pipeline
    from logmetrics_spark.streaming.stream_pipeline import run_streaming_routed

    out = str(tmp_path / "seq")
    run_streaming_routed(spark, apache_cfg, stream_dirs["flat"], out)
    got = collections.Counter(
        (r["line"], r["sink"])
        for r in spark.read.parquet(out + "/routed").select("line", "sink").collect()
    )
    batch = run_pipeline(
        spark, apache_cfg, spark.read.parquet(stream_dirs["flat"]), io=None, write=False
    )
    expect = collections.Counter(
        (r["line"], r["sink"]) for r in batch.routed.select("line", "sink").collect()
    )
    assert got == expect


def test_streaming_meter_timeout_emits_zero(spark, rest_cfg, tmp_path):
    """Stale eviction pushes one zeroed snapshot (datapool.go:315-334)
    before the state drops."""
    import dataclasses

    import pandas as pd

    from logmetrics_spark.sources.synth import PAGES_SCHEMA_DDL
    from logmetrics_spark.streaming.stream_pipeline import (
        read_pages_stream,
        run_stream_to_table,
        streaming_datapoints,
        streaming_meters,
    )

    lg = dataclasses.replace(rest_cfg.log_groups[0], stale_treshold_min=1)
    src = str(tmp_path / "pages")
    base_line = (
        "Jan  1 00:00:{s:02d} rest01.example rest_a.api: blah [c:q] (10) "
        "[bnt:1/2] [sql:1/2] [membase:1/2] [memcache:1/2] [other:1/2]"
    )
    early = pd.DataFrame(
        [("https://rest01.mynetwork/x", pd.Timestamp("2024-01-01 00:00:00"), b"",
          base_line.format(s=1), "en")],
        columns=["url", "warc_ts", "html", "text", "lang"],
    )
    late_line = (
        base_line.format(s=2)
        .replace("Jan  1 00:00:02", "Jan  1 01:00:00")
        .replace("rest01.example", "rest02.example")
    )
    late = early.assign(text=late_line, url="https://rest02.mynetwork/x")
    spark.createDataFrame(early).coalesce(1).write.parquet(src + "/b1")
    spark.createDataFrame(late).coalesce(1).write.parquet(src + "/b2")
    flat = str(tmp_path / "flat")
    import glob as _g
    import os as _os
    import shutil

    _os.makedirs(flat)
    for i, f in enumerate(sorted(_g.glob(src + "/b*/part-*.parquet"))):
        shutil.copy(f, f"{flat}/file{i}.parquet")

    stream = read_pages_stream(spark, flat, max_files=1)
    sm = streaming_meters(streaming_datapoints(stream, lg), lg, watermark="0 seconds")
    out = str(tmp_path / "zout")
    q = run_stream_to_table(sm, out, str(tmp_path / "zck"))
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    zeroed = [r for r in rows if r["count"] == 0 and r["rate_1min"] == 0.0]
    assert zeroed, f"no zeroed eviction snapshot emitted; rows={rows}"
    # the early key (rest01) is the one evicted
    assert any("host=rest01" in r["key_id"] for r in zeroed)


def test_streaming_incremental_growth_equals_batch(spark, apache_cfg, tmp_path):
    """Files arriving BETWEEN runs: first drain processes f0, a second
    drain (same checkpoint) processes only the new f1, and the
    re-finalized routed output equals the batch pipeline over both —
    the glob-poller discovery + incremental aggregation story."""
    import collections
    import glob as _g
    import shutil

    import numpy as np

    from logmetrics_spark.plans.pipeline import run_pipeline
    from logmetrics_spark.sources.synth import SynthSpec, gen_pages_pdf
    from logmetrics_spark.streaming.stream_pipeline import run_streaming_routed

    spec = SynthSpec(n_rows=80, time_span_seconds=300)
    pdf = gen_pages_pdf(np.arange(80), spec)
    stage = str(tmp_path / "stage")
    spark.createDataFrame(pdf.iloc[:40]).coalesce(1).write.parquet(stage + "/a")
    spark.createDataFrame(pdf.iloc[40:]).coalesce(1).write.parquet(stage + "/b")
    live = str(tmp_path / "live")
    import os as _os

    _os.makedirs(live)
    files = sorted(_g.glob(stage + "/*/part-*.parquet"))
    shutil.copy(files[0], live + "/f0.parquet")

    out = str(tmp_path / "inc")
    run_streaming_routed(spark, apache_cfg, live, out)  # drains f0, finalizes
    n_first = spark.read.parquet(out + "/routed").count()

    shutil.copy(files[1], live + "/f1.parquet")  # new file discovered
    run_streaming_routed(spark, apache_cfg, live, out)  # drains ONLY f1

    got = collections.Counter(
        (r["line"], r["sink"])
        for r in spark.read.parquet(out + "/routed").select("line", "sink").collect()
    )
    batch = run_pipeline(spark, apache_cfg, spark.read.parquet(live), io=None, write=False)
    expect = collections.Counter(
        (r["line"], r["sink"]) for r in batch.routed.select("line", "sink").collect()
    )
    assert got == expect
    assert sum(got.values()) > n_first  # the second drain extended the output


def test_streaming_histograms_converge_to_batch_reservoir(spark, rest_cfg, stream_dirs):
    """The live reservoir's final snapshot per key equals the
    deterministic top-s reservoir computed directly from all
    datapoints (state merge law == batch combiner law)."""
    import hashlib

    from logmetrics_spark.streaming.stream_pipeline import streaming_histograms
    from logmetrics_spark.timemetrics import (
        HistogramState,
        np_priorities,
        np_uniform_from_hash52,
    )

    lg = rest_cfg.log_groups[0]
    stream = read_pages_stream(spark, stream_dirs["flat"], max_files=1)
    sh = streaming_histograms(streaming_datapoints(stream, lg), lg, watermark="0 seconds")
    out = f"{stream_dirs['base']}/hist_out"
    q = run_stream_to_table(sh, out, f"{stream_dirs['base']}/ck_h")
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert rows, "stateful histogram stream produced no rows"
    latest = {}
    for r in rows:
        if r["key_id"] not in latest or r["ts"] >= latest[r["key_id"]]["ts"]:
            latest[r["key_id"]] = r

    dp = (
        build_datapoints(spark.read.parquet(stream_dirs["flat"]), lg)
        .filter(F.col("metric_type") == "histogram")
        .collect()
    )
    by_key: dict = {}
    for r in dp:
        by_key.setdefault(r["key_id"], []).append(r)
    import numpy as np

    for key, recs in by_key.items():
        hs = HistogramState(size=lg.histogram_size, alpha=lg.histogram_alpha_decay)
        from logmetrics_spark.contracts import h52_py, md5_52_py

        h52 = np.array(
            [h52_py(md5_52_py(key), r["record_id"]) for r in recs],
            dtype="float64",
        )
        pris = np_priorities(
            np.array([r["ts_sec"] for r in recs], dtype="float64"),
            np_uniform_from_hash52(h52),
            lg.histogram_alpha_decay,
        )
        hs.merge_candidates(
            [(float(p), int(r["record_id"]), int(r["value"])) for p, r in zip(pris, recs)],
            max(float(r["ts_sec"]) for r in recs),
        )
        snap = hs.snapshot()
        got = latest[key]
        assert got["sample_size"] == snap["sample_size"], key
        assert got["min"] == snap["min"] and got["max"] == snap["max"], key
        assert abs(got["mean"] - snap["mean"]) < 1e-9, key
        assert abs(got["p95"] - snap["p95"]) < 1e-9, key


def test_streaming_live_heartbeats_match_batch_dups(spark, rest_cfg, tmp_path):
    """send_duplicates parity for the LIVE view (r03): a key that goes
    quiet keeps re-emitting unchanged snapshots at every interval
    boundary the watermark passes, rendered through route_stage — and
    those heartbeat LINES are byte-identical to the batch crunch's dup
    rows for the same boundaries (meter decay included)."""
    import pandas as pd

    from logmetrics_spark.plans.pipeline import run_pipeline
    from logmetrics_spark.streaming.stream_pipeline import run_streaming_live

    line = (
        "Jan  1 00:{m:02d}:{s:02d} {host}.example rest_a.api: blah [c:q] (10) "
        "[bnt:1/2] [sql:3/4] [membase:1/2] [memcache:1/2] [other:1/2]"
    )

    def page(url, host, m, s):
        return (url, pd.Timestamp("2024-01-01"), b"", line.format(host=host, m=m, s=s), "en")

    cols = ["url", "warc_ts", "html", "text", "lang"]
    quiet = "https://rest01.mynetwork/q"
    active = "https://rest02.mynetwork/a"
    batches = [
        [page(quiet, "rest01", 0, 1), page(active, "rest02", 0, 5)],
        [page(active, "rest02", 1, 0)],
        [page(active, "rest02", 2, 0)],
        [page(active, "rest02", 3, 0)],
    ]
    src = str(tmp_path / "pages")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        spark.createDataFrame(pd.DataFrame(rows, columns=cols)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{tmp_path}/part{i}")
        import glob as _g
        import shutil

        for f in _g.glob(f"{tmp_path}/part{i}/part-*.parquet"):
            shutil.copy(f, f"{src}/file{i}.parquet")

    q = run_streaming_live(spark, rest_cfg, src, str(tmp_path / "out"))
    q.awaitTermination(180)
    live = spark.read.parquet(str(tmp_path / "out" / "routed_live")).collect()
    live_dups = {r["line"] for r in live if r["is_dup"] and "host=rest01.example" in r["tags"]}
    assert live_dups, "no heartbeat rows for the quiet key"

    all_pages = spark.createDataFrame(
        pd.DataFrame([p for b in batches for p in b], columns=cols)
    )
    batch = run_pipeline(spark, rest_cfg, all_pages, write=False).routed.collect()
    batch_dups = {r["line"] for r in batch if r["is_dup"] and "host=rest01.example" in r["tags"]}
    missing = live_dups - batch_dups
    assert not missing, f"live heartbeat lines not in batch dups: {sorted(missing)[:5]}"
    # the live view must have covered more than one heartbeat boundary
    assert len({r["boundary"] for r in live if r["is_dup"] and "host=rest01.example" in r["tags"]}) >= 2


def test_streaming_live_multi_group(spark, rest_cfg, apache_cfg, tmp_path):
    """A multi-group config fans out into one streaming query per
    group (Spark rejects multiple applyInPandasWithState ops in one
    query); both groups' routed lines land under per-group sink
    partitions readable as one table."""
    import dataclasses
    import glob as _g
    import shutil

    import pandas as pd

    from logmetrics_spark.streaming.stream_pipeline import run_streaming_live

    merged = dataclasses.replace(
        rest_cfg, log_groups=tuple(rest_cfg.log_groups) + tuple(apache_cfg.log_groups)
    )
    line_r = (
        "Jan  1 00:00:01 rest01.example rest_a.api: blah [c:q] (10) "
        "[bnt:1/2] [sql:3/4] [membase:1/2] [memcache:1/2] [other:1/2]"
    )
    line_a = "1.2.3.4\tx\ty\t01/Jan/2024:00:00:02 +0000\tGET\t/p\tHTTP/1.1\t200\t123\tr\tu\t456"
    rows = [
        ("https://rest01.mynetwork/q", pd.Timestamp("2024-01-01"), b"", line_r, "en"),
        ("https://www1.apache.example/httpd_access/", pd.Timestamp("2024-01-01"), b"", line_a, "en"),
    ]
    src = str(tmp_path / "pages")
    os.makedirs(src)
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    ).coalesce(1).write.parquet(str(tmp_path / "p0"))
    for f in _g.glob(str(tmp_path / "p0" / "part-*.parquet")):
        shutil.copy(f, f"{src}/f0.parquet")
    qs = run_streaming_live(spark, merged, src, str(tmp_path / "out"))
    assert isinstance(qs, list) and len(qs) == 2  # one query per log group
    out = spark.read.parquet(str(tmp_path / "out" / "routed_live"))
    groups = {r["group"] for r in out.select("group").distinct().collect()}
    assert "apache_reverse_proxy" in groups
    assert any(g.startswith("rest") for g in groups)
    assert all(r["line"].startswith("put ") for r in out.limit(20).collect())


def test_streaming_live_multi_group_concurrent(spark, rest_cfg, apache_cfg, tmp_path):
    """CONTINUOUS multi-group live run (available_now=False): both
    group queries run SIMULTANEOUSLY — put lines from both groups land
    under routed_live/lgroup=* while all queries are still active —
    and monitor_live provides the combined await/monitor (timeout path
    while active, clean False after stop, exception surfacing is
    covered by its failed-query branch)."""
    import dataclasses
    import glob as _g
    import shutil
    import time

    import pandas as pd

    from logmetrics_spark.streaming.stream_pipeline import (
        monitor_live,
        read_live_union,
        run_streaming_live,
    )

    merged = dataclasses.replace(
        rest_cfg, log_groups=tuple(rest_cfg.log_groups) + tuple(apache_cfg.log_groups)
    )
    line_r = (
        "Jan  1 00:00:01 rest01.example rest_a.api: blah [c:q] (10) "
        "[bnt:1/2] [sql:3/4] [membase:1/2] [memcache:1/2] [other:1/2]"
    )
    line_a = "1.2.3.4\tx\ty\t01/Jan/2024:00:00:02 +0000\tGET\t/p\tHTTP/1.1\t200\t123\tr\tu\t456"
    rows = [
        ("https://rest01.mynetwork/q", pd.Timestamp("2024-01-01"), b"", line_r, "en"),
        ("https://www1.apache.example/httpd_access/", pd.Timestamp("2024-01-01"), b"", line_a, "en"),
    ]
    src = str(tmp_path / "pages")
    os.makedirs(src)
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    ).coalesce(1).write.parquet(str(tmp_path / "p0"))
    for f in _g.glob(str(tmp_path / "p0" / "part-*.parquet")):
        shutil.copy(f, f"{src}/f0.parquet")

    qs = run_streaming_live(
        spark, merged, src, str(tmp_path / "out"), available_now=False
    )
    assert isinstance(qs, list) and len(qs) == 2
    try:
        # both queries must be live at once (the fan-out is
        # concurrent, not sequential drains)
        assert all(q.isActive for q in qs)
        deadline = time.time() + 180
        seen: set[str] = set()
        rows = []
        while time.time() < deadline and len(seen) < 2:
            assert monitor_live(spark, qs, timeout_sec=2.0), "queries died early"
            try:
                rows = read_live_union(spark, str(tmp_path / "out")).collect()
            except FileNotFoundError:
                continue  # no sink dir committed yet
            seen = {r["lgroup"] for r in rows}
        # committed put lines from BOTH groups observed while every
        # query was still running — concurrent fan-out, and the
        # committed-only union read is live-safe by construction
        assert len(seen) == 2, f"groups that produced output while live: {seen}"
        assert all(q.isActive for q in qs)
        groups = {r["group"] for r in rows}
        assert "apache_reverse_proxy" in groups and any(g.startswith("rest") for g in groups)
        assert all(r["line"].startswith("put ") for r in rows[:20])
    finally:
        for q in qs:
            if q.isActive:
                q.stop()
    for q in qs:
        q.awaitTermination(60)
    assert monitor_live(spark, qs, timeout_sec=1.0) is False


def test_streaming_ingest_dedup_grows_corpus(spark, tmp_path):
    """Streaming ingest dedup: a clone arriving in a LATER micro-batch
    of a doc kept in an EARLIER one is dropped (the index grows with
    every kept batch), within-batch clones collapse to the min-id doc,
    and restarts with the same checkpoint process only new files."""
    import pandas as pd

    from logmetrics_spark.streaming.ingest_dedup import (
        run_streaming_ingest_dedup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronauts calibrate the orbital telescope before dawn and the "
        "harbor lighthouse rotates its beam across the frozen bay"
    )
    fresh1 = "completely unrelated corpus content about spark physical plans"
    fresh2 = "a genuinely fresh document with brand new tokens entirely"
    docs_dir = str(tmp_path / "docs")
    os.makedirs(docs_dir)

    def drop_file(name: str, rows: list[tuple[int, str]]) -> None:
        import glob as _g
        import shutil

        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        ).coalesce(1).write.parquet(stage)
        for f in _g.glob(f"{stage}/part-*.parquet"):
            shutil.copy(f, f"{docs_dir}/{name}.parquet")

    # batch 1: 2 is a within-batch clone of 1; 3 is fresh
    drop_file("b1", [(1, base), (2, base + " tonight"), (3, fresh1)])
    out = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")
    q, sink = run_streaming_ingest_dedup(spark, docs_dir, out, ck, threshold=0.3)
    q.awaitTermination(120)
    assert sorted(r["doc_id"] for r in sink.kept_docs(spark).collect()) == [1, 3]

    # batch 2: 10 clones batch-1's KEPT doc 1 (cross-batch dup via the
    # grown index); 11 is fresh
    drop_file("b2", [(10, base + " again"), (11, fresh2)])
    q2, sink = run_streaming_ingest_dedup(spark, docs_dir, out, ck, threshold=0.3)
    q2.awaitTermination(120)
    kept = sorted(r["doc_id"] for r in sink.kept_docs(spark).collect())
    assert kept == [1, 3, 11], kept
    # the index grew with every kept batch: entries cover all kept docs
    idx_ids = {
        r["id"]
        for r in spark.read.parquet(sink.entries_dir).select("id").distinct().collect()
    }
    assert idx_ids == {1, 3, 11}


def test_ingest_dedup_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a batch re-delivered after a
    crash BETWEEN the partition writes and the checkpoint commit runs
    the sink again with the same batch_id. The replay must not see the
    batch's own previous output in the index (it would match every doc
    against its identical self and overwrite the partition EMPTY —
    permanently dropping the batch); it must rewrite bit-identical
    results. Also pins the cache hygiene: every RDD the sink pins per
    batch is unpersisted before it returns."""
    import pandas as pd

    from logmetrics_spark.streaming.ingest_dedup import IngestDedupSink

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronauts calibrate the orbital telescope before dawn"
    )
    fresh = "completely unrelated corpus content about spark physical plans"
    sink = IngestDedupSink(str(tmp_path / "corpus"), threshold=0.3)
    # other tests in the shared session may have left lazy caches;
    # assert the SINK adds none, not that the session is pristine
    cached_before = (
        spark._jsparkSession.sharedState().cacheManager().cachedData().size()
    )

    b0 = spark.createDataFrame(
        pd.DataFrame([(1, base), (3, fresh)], columns=["doc_id", "text"])
    )
    sink(b0, 0)
    # batch 1: doc 10 clones kept doc 1 (dropped), doc 11 is fresh
    b1 = spark.createDataFrame(
        pd.DataFrame(
            [(10, base + " again"), (11, fresh + " with brand new tokens")],
            columns=["doc_id", "text"],
        )
    )
    sink(b1, 1)
    kept_first = sorted(r["doc_id"] for r in sink.kept_docs(spark).collect())
    assert kept_first == [1, 3, 11], kept_first

    # replay batch 1 (same batch_id, same data): output unchanged —
    # in particular batch 1's partition is NOT emptied by self-matching
    sink(b1, 1)
    kept_replay = sorted(r["doc_id"] for r in sink.kept_docs(spark).collect())
    assert kept_replay == [1, 3, 11], kept_replay
    idx_ids = {
        r["id"]
        for r in spark.read.parquet(sink.entries_dir).select("id").distinct().collect()
    }
    assert idx_ids == {1, 3, 11}
    # no CacheManager-cached plan survives the batches (continuous
    # runs must not leak; localCheckpoint RDDs are excluded — those
    # are weakly held and reclaimed by the ContextCleaner on GC)
    cached_after = (
        spark._jsparkSession.sharedState().cacheManager().cachedData().size()
    )
    assert cached_after <= cached_before, (cached_before, cached_after)


def test_ingest_dedup_all_duplicate_batch_does_not_wedge(spark, tmp_path):
    """A micro-batch whose every doc duplicates the corpus keeps
    NOTHING; the sink must not write its three empty partition dirs
    (an empty parquet dir has no schema to infer, so the NEXT batch's
    index read would raise UNABLE_TO_INFER_SCHEMA — not the
    path-missing 'no corpus yet' condition — and permanently wedge
    the stream). The stream must keep ingesting afterwards."""
    import os

    import pandas as pd

    from logmetrics_spark.streaming.ingest_dedup import IngestDedupSink

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronauts calibrate the orbital telescope before dawn"
    )
    sink = IngestDedupSink(str(tmp_path / "corpus"), threshold=0.3)
    b0 = spark.createDataFrame(
        pd.DataFrame([(1, base)], columns=["doc_id", "text"])
    )
    sink(b0, 0)
    # batch 1: a pure clone — everything drops against the corpus
    b1 = spark.createDataFrame(
        pd.DataFrame([(10, base + " again")], columns=["doc_id", "text"])
    )
    sink(b1, 1)
    for d in (sink.kept_dir, sink.entries_dir, sink.shingles_dir):
        assert not os.path.exists(os.path.join(d, "ingest_batch=1")), d
    # batch 2 (fresh content) must still read the index and land
    b2 = spark.createDataFrame(
        pd.DataFrame(
            [(20, "completely unrelated corpus content about spark plans")],
            columns=["doc_id", "text"],
        )
    )
    sink(b2, 2)
    kept = sorted(r["doc_id"] for r in sink.kept_docs(spark).collect())
    assert kept == [1, 20], kept
