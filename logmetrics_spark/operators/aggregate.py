"""Aggregate stage: datapoints -> per-key metric emissions (R4 rows).

Two-phase design (SURVEY.md §7.1 step 5) — the crux for both oracle
equality and the N->4N scaling target:

**Phase A — native, salt-safe partial aggregation.** Every reduction
is associative, so Spark's map-side partial aggregation (and AQE skew
splitting) applies before any shuffle:

- meters/counters: ``groupBy(key, window, tick).sum(value)`` — pure
  JVM; EWMA state depends only on per-tick sums, never intra-tick
  order (timemetrics.MeterState);
- histograms: the exp-decay reservoir equals the top-``s`` records by
  deterministic log-priority, so per-partition ``mapInPandas`` keeps at
  most ``s`` candidates per (key, window) locally (an exact combiner:
  top-s of a union == top-s of the union of per-part top-s), bounding
  shuffle volume to ``s * partitions`` rows per (key, window). The
  uniform draw is computed natively (md5/conv, whole-stage codegen);
  only ``log`` runs in numpy, shared bit-for-bit with the oracle.

**Phase B — per-key crunch.** ``groupBy(key).applyInPandas`` over the
*partials* (tiny: windows x ticks per key, reservoir candidates capped)
replays event-time order: EWMA ticking, reservoir merge, interval push
gating (``datapool.go:280-307``), stale zero-out + removal
(``datapool.go:315-334``), duplicate heartbeats (``datapool.go:336-355``).

Emission spec (epoch-aligned windows ``w = floor(ts / interval)``,
boundary ``B = (w+1)*interval``), per key per window from its first
update window through the globally last window:

1. fold this window's partials into the metric state; tick meters to B;
2. stale: if ``stale_removal`` and ``B - last_update >= threshold`` and
   not ``never_stale`` -> emit zeroed endings at ts=B, drop state (a
   later update recreates the key from scratch, like the reference's
   map delete);
3. push gate: emit a snapshot at ts=last_update iff the key's max
   update time advanced past the previous push (``PushKeysTime``,
   ``datapool.go:336``);
4. else if ``send_duplicates``: emit a duplicate snapshot at synthetic
   ts advanced ``interval`` per repetition (``datapool.go:336-355``;
   deviation: a real push resets the synthetic clock — the reference
   keeps stale bookkeeping forever).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import LogGroup
from ..timemetrics import (
    CounterState,
    HistogramState,
    MeterState,
    format_value,
    np_priorities,
    np_uniform_from_hash52,
)
from .datapoints import md5_52bit

KEY_COLS = ["key_id", "group", "metric_type", "key_prefix", "key_suffix", "tags", "ref_tag"]

PARTIAL_SCHEMA = (
    "key_id string, group string, metric_type string, key_prefix string, "
    "key_suffix string, tags string, ref_tag string, never_stale boolean, "
    "w long, t long, psum long, pmax_ts long, pri double, rid long, val long"
)

EMISSION_SCHEMA = (
    "key_id string, group string, metric_type string, key_prefix string, "
    "key_suffix string, tags string, ref_tag string, boundary long, "
    "ending string, ts long, value_num double, value_str string, "
    "is_dup boolean, is_zero boolean"
)


def partial_stage(dp: DataFrame, lg: LogGroup) -> DataFrame:
    """Phase A: associative pre-aggregation of raw datapoints."""
    interval = lg.interval
    ewma = lg.ewma_interval

    sums_src = dp.filter(F.col("metric_type") != "histogram")
    w = F.floor(F.col("ts_sec") / interval).cast("long")
    t = (
        F.when(
            F.col("metric_type") == "meter",
            F.floor(F.col("ts_sec") / ewma).cast("long"),
        ).otherwise(F.lit(0))
    )
    sums = (
        sums_src.withColumn("w", w)
        .withColumn("t", t)
        .groupBy(*KEY_COLS, "w", "t")
        .agg(
            F.max(F.col("never_stale").cast("int")).cast("boolean").alias("never_stale"),
            F.sum("value").alias("psum"),
            F.max("ts_sec").alias("pmax_ts"),
        )
        .select(
            *KEY_COLS, "never_stale", "w", "t", "psum", "pmax_ts",
            F.lit(None).cast("double").alias("pri"),
            F.lit(None).cast("long").alias("rid"),
            F.lit(None).cast("long").alias("val"),
        )
    )

    hist_src = dp.filter(F.col("metric_type") == "histogram")
    # deterministic uniform: 52-bit md5 prefix of "key|record_id"
    # (JVM-side codegen; identical to timemetrics.det_uniform)
    hist = (
        hist_src.withColumn("w", F.floor(F.col("ts_sec") / interval).cast("long"))
        .withColumn(
            "h52", md5_52bit(F.concat_ws("|", F.col("key_id"), F.col("record_id")))
        )
    )
    size = lg.histogram_size
    alpha = lg.histogram_alpha_decay

    def local_topk(batches):
        """Exact local combiner: per-batch top-s per (key, window)."""
        for pdf in batches:
            if pdf.empty:
                continue
            u = np_uniform_from_hash52(pdf["h52"].to_numpy())
            pdf = pdf.assign(pri=np_priorities(pdf["ts_sec"].to_numpy(), u, alpha))
            # rows dropped by the combiner still count as updates for
            # push gating / staleness: carry the group max ts on the
            # kept rows (top-s of a nonempty group keeps >=1 row)
            grp = pdf.groupby(["key_id", "w"], sort=False)
            pdf = pdf.assign(grp_max_ts=grp["ts_sec"].transform("max"))
            kept = (
                pdf.sort_values(["pri", "record_id"], ascending=False)
                .groupby(["key_id", "w"], sort=False)
                .head(size)
            )
            yield pd.DataFrame(
                {
                    "key_id": kept["key_id"],
                    "group": kept["group"],
                    "metric_type": kept["metric_type"],
                    "key_prefix": kept["key_prefix"],
                    "key_suffix": kept["key_suffix"],
                    "tags": kept["tags"],
                    "ref_tag": kept["ref_tag"],
                    "never_stale": kept["never_stale"],
                    "w": kept["w"],
                    "t": 0,
                    "psum": pd.array([None] * len(kept), dtype="Int64"),
                    "pmax_ts": kept["grp_max_ts"],
                    "pri": kept["pri"],
                    "rid": kept["record_id"],
                    "val": kept["value"],
                }
            )

    hist_partials = hist.mapInPandas(local_topk, schema=PARTIAL_SCHEMA)
    return sums.unionByName(hist_partials)


def _new_state(metric_type: str, lg: LogGroup):
    if metric_type == "counter":
        return CounterState()
    if metric_type == "meter":
        return MeterState(tick_seconds=lg.ewma_interval)
    return HistogramState(size=lg.histogram_size, alpha=lg.histogram_alpha_decay)


def make_crunch(lg: LogGroup, global_last_w: int):
    """Build the Phase-B applyInPandas function for one log group."""
    interval = lg.interval
    stale_secs = lg.stale_treshold_min * 60

    def crunch(key_tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        key_id, group, metric_type, key_prefix, key_suffix, tags, ref_tag = key_tuple
        never_stale = bool(pdf["never_stale"].max())
        pdf = pdf.sort_values(["w", "t", "rid"], kind="mergesort")

        by_w: dict[int, pd.DataFrame] = {int(w): g for w, g in pdf.groupby("w")}
        first_w = min(by_w)

        out: dict[str, list] = {
            "boundary": [], "ending": [], "ts": [], "value_num": [],
            "value_str": [], "is_dup": [], "is_zero": [],
        }

        def emit(boundary: int, ts: int, snap: dict, is_dup: bool, is_zero: bool):
            for ending, v in snap.items():
                if is_zero:
                    v = 0
                out["boundary"].append(boundary)
                out["ending"].append(ending)
                out["ts"].append(int(ts))
                out["value_num"].append(float(v))
                out["value_str"].append(format_value(v))
                out["is_dup"].append(is_dup)
                out["is_zero"].append(is_zero)

        state = None
        last_push_maxts = None
        dup_ts = None

        for W in range(first_w, global_last_w + 1):
            B = (W + 1) * interval
            wrows = by_w.get(W)
            if wrows is not None:
                if state is None:
                    state = _new_state(metric_type, lg)
                    last_push_maxts = None
                    dup_ts = None
                if metric_type == "meter":
                    for t, psum, pmax in zip(
                        wrows["t"].to_numpy(), wrows["psum"].to_numpy(), wrows["pmax_ts"].to_numpy()
                    ):
                        state.merge_partial(int(t), int(psum), float(pmax))
                elif metric_type == "counter":
                    for psum, pmax in zip(wrows["psum"].to_numpy(), wrows["pmax_ts"].to_numpy()):
                        state.update(float(pmax), int(psum))
                else:
                    cands = list(
                        zip(
                            wrows["pri"].to_numpy(),
                            (int(r) for r in wrows["rid"].to_numpy()),
                            (int(v) for v in wrows["val"].to_numpy()),
                        )
                    )
                    state.merge_candidates(cands, float(wrows["pmax_ts"].max()))
            if state is None:
                continue
            state.tick_to(float(B))

            if (
                lg.stale_removal
                and not never_stale
                and (B - state.last_update) >= stale_secs
            ):
                state.zero_out()
                emit(B, B, state.snapshot(), is_dup=False, is_zero=True)
                state = None
                continue

            if last_push_maxts is None or state.last_update > last_push_maxts:
                emit(B, int(state.last_update), state.snapshot(), is_dup=False, is_zero=False)
                last_push_maxts = state.last_update
                dup_ts = None
            elif lg.send_duplicates:
                dup_ts = (dup_ts if dup_ts is not None else int(state.last_update)) + interval
                emit(B, dup_ts, state.snapshot(), is_dup=True, is_zero=False)

        n = len(out["ending"])
        return pd.DataFrame(
            {
                "key_id": [key_id] * n, "group": [group] * n,
                "metric_type": [metric_type] * n, "key_prefix": [key_prefix] * n,
                "key_suffix": [key_suffix] * n, "tags": [tags] * n,
                "ref_tag": [ref_tag] * n, **out,
            }
        )

    return crunch


def aggregate_stage(
    dp: DataFrame, lg: LogGroup, global_last_w: int | None = None
) -> DataFrame:
    """datapoints -> emissions. If ``global_last_w`` is None it is
    computed from the (persisted) partials — one tiny action; pass it
    explicitly to keep the plan lazy (e.g. from source table stats)."""
    partials = partial_stage(dp, lg)
    if global_last_w is None:
        partials = partials.persist()
        row = partials.agg(F.max("w").alias("mw")).collect()[0]
        if row["mw"] is None:
            return partials.sparkSession.createDataFrame([], EMISSION_SCHEMA)
        global_last_w = int(row["mw"])
    crunch = make_crunch(lg, global_last_w)
    return partials.groupBy(*KEY_COLS).applyInPandas(crunch, schema=EMISSION_SCHEMA)
