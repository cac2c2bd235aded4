"""Structured Streaming variant of the pipeline.

The reference is a streaming daemon (tail -> channels); this module is
its Spark-native counterpart:

- **source**: ``readStream`` file source over a pages directory — new
  parquet files play the role of newly-discovered/appended log files
  (the filename-glob poller, ``logtail.go:167-229``);
- **stateless stages**: the batch parse/transform/datapoint operators
  are reused verbatim — they are pure row-wise transformations and
  run unchanged on streaming DataFrames;
- **phase A streaming**: watermarked tumbling-window partial sums per
  key (``withWatermark`` = the per-file high-water mark,
  ``datapool.go:238-244``; append mode emits a window once the
  watermark passes it = the interval push trigger,
  ``datapool.go:280-307``). Partials land in a sink table; the tiny
  phase-B crunch runs as a periodic batch over it — at 100 TB/day the
  streaming job only ever holds per-(key, window) sums in state;
- **custom stateful operator**: :func:`streaming_meters` keeps live
  Meter state (count + EWMA 1/5/15) per key via
  ``applyInPandasWithState`` with event-time timeout for staleness —
  the direct analog of the reference's in-memory ``dp.data`` map
  (``datapool.go:40,251-279``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..config import LogGroup
from ..operators.datapoints import datapoint_stage
from ..operators.parse import parse_stage
from ..operators.transform import transform_stage
from ..sources.synth import PAGES_SCHEMA_DDL

METER_STATE_SCHEMA = (
    "count long, cur_tick long, pending long, r1 double, r5 double, r15 double, "
    "initialized boolean, last_update double"
)
METER_OUT_SCHEMA = (
    "key_id string, ts long, count long, rate_1min double, rate_5min double, "
    "rate_15min double"
)


def read_pages_stream(spark: SparkSession, path: str, max_files: int = 4) -> DataFrame:
    """File-source stream of pages (new parquet files are discovered
    per trigger — the poll_interval glob of the reference)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_datapoints(pages: DataFrame, lg: LogGroup) -> DataFrame:
    """Stateless stages reused from batch (streaming-safe)."""
    return datapoint_stage(transform_stage(parse_stage(pages, lg, observe=False), lg), lg)


def streaming_partials(dp: DataFrame, lg: LogGroup, watermark: str = "2 minutes") -> DataFrame:
    """Phase-A: watermarked tumbling-window partial sums (append mode
    emits once the watermark passes a window — the push trigger)."""
    with_ts = dp.withColumn("event_time", F.col("ts_sec").cast("timestamp"))
    return (
        with_ts.withWatermark("event_time", watermark)
        .groupBy(
            "key_id", "group", "metric_type", "key_prefix", "key_suffix",
            "tags", "ref_tag",
            F.window("event_time", f"{lg.interval} seconds").alias("win"),
        )
        .agg(
            F.sum("value").alias("psum"),
            F.count(F.lit(1)).alias("n"),
            F.max("ts_sec").alias("pmax_ts"),
        )
        .select(
            "key_id", "group", "metric_type", "key_prefix", "key_suffix",
            "tags", "ref_tag",
            F.unix_timestamp(F.col("win.start")).cast("long").alias("w_start"),
            "psum", "n", "pmax_ts",
        )
    )


def streaming_meters(dp: DataFrame, lg: LogGroup, watermark: str = "2 minutes") -> DataFrame:
    """Custom stateful operator: live per-key Meter (count + EWMA
    1/5/15min of log time) via applyInPandasWithState, event-time
    timeout evicts stale keys (``stale_treshold_min``)."""
    import math

    tick = lg.ewma_interval
    minutes = (1.0, 5.0, 15.0)
    alphas = [1.0 - math.exp(-tick / 60.0 / m) for m in minutes]
    stale_ms = lg.stale_treshold_min * 60 * 1000

    def update(key, pdfs, state: GroupState):
        (key_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            count, cur_tick, pending, r1, r5, r15, initialized, last_update = state.get
        else:
            count, cur_tick, pending = 0, -1, 0
            r1 = r5 = r15 = 0.0
            initialized = False
            last_update = -1.0
        rates = [r1, r5, r15]

        rows = []
        for pdf in pdfs:
            rows.append(pdf[["ts_sec", "value"]])
        if rows:
            data = pd.concat(rows).sort_values("ts_sec")
            for ts, v in zip(data["ts_sec"].to_numpy(), data["value"].to_numpy()):
                t = int(ts // tick)
                if cur_tick < 0:
                    cur_tick = t
                while cur_tick < t:
                    instant = pending / float(tick)
                    if not initialized:
                        rates = [instant] * 3
                        initialized = True
                    else:
                        rates = [r + a * (instant - r) for r, a in zip(rates, alphas)]
                    pending = 0
                    cur_tick += 1
                pending += int(v)
                count += int(v)
                last_update = max(last_update, float(ts))

        state.update((count, cur_tick, pending, rates[0], rates[1], rates[2], initialized, last_update))
        state.setTimeoutTimestamp(int(last_update * 1000) + stale_ms)
        yield pd.DataFrame(
            {
                "key_id": [key_id],
                "ts": [int(last_update)],
                "count": [count],
                "rate_1min": [rates[0]],
                "rate_5min": [rates[1]],
                "rate_15min": [rates[2]],
            }
        )

    meters = dp.filter(F.col("metric_type") == "meter").withColumn(
        "event_time", F.col("ts_sec").cast("timestamp")
    )
    return (
        meters.withWatermark("event_time", watermark)
        .groupBy("key_id")
        .applyInPandasWithState(
            update,
            outputStructType=METER_OUT_SCHEMA,
            stateStructType=METER_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_streaming_routed(
    spark: SparkSession,
    cfg,
    pages_path: str,
    out_dir: str,
    lookups: dict | None = None,
    available_now: bool = True,
):
    """End-to-end streaming: pages file-stream -> foreachBatch runs the
    batch pipeline incrementally and appends routed rows per
    micro-batch. The checkpoint directory makes the whole chain
    resumable (restart continues from the last committed offset — the
    streaming counterpart of plans/lineage.py).

    Semantics note: each micro-batch is aggregated independently
    (per-batch windows), so cumulative counts/EWMAs reset per batch —
    the production pattern for exact continuity is the
    streaming-partials -> periodic-batch-crunch split
    (:func:`streaming_partials`); this entry point exists for the
    route-to-sink plumbing and offset-resume story."""
    import os

    from ..plans.pipeline import run_pipeline

    stream = read_pages_stream(spark, pages_path)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = run_pipeline(spark, cfg, batch_df, io=None, lookups=lookups, write=False)
        (
            res.routed.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .partitionBy("sink")
            .parquet(os.path.join(out_dir, "routed"))
        )

    w = stream.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", os.path.join(out_dir, "checkpoint")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def run_stream_to_table(
    stream_df: DataFrame, out_path: str, checkpoint: str, available_now: bool = True
):
    """Write a streaming stage to parquet with checkpointed lineage
    (resume = restart with the same checkpoint dir)."""
    w = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
