"""Scale probe for line_dedup (r05): duplicate-span removal under a
viral boilerplate segment — the skew case the operator's window-free
plan exists for — in BOTH segmentation modes.

Modes per size n:

- **kword** (the registry mode): 60-token docs, 3-word segments →
  20 segments/doc, 20n exploded rows;
- **delim** (the real-corpus C4 mode, newly probed in r05 — the r04
  file only carried kword rows while the delim branch held the known
  double-evaluation): the same token stream laid out as 12
  newline-separated 5-token lines; viral docs additionally carry a
  BLANK line between the boilerplate line and the content (the
  structure-preservation path the single-pass left-join must carry
  without re-evaluating the segmentation).

Regimes per (n, mode):

- **linear**: every 7th doc an exact clone of its predecessor (its
  segments all dedup away) — background duplication only;
- **viral**: the linear corpus plus a shared boilerplate segment/line
  on 30% of docs — ONE segment key with 0.3n occurrences. A
  row_number-window plan would sort those rows in a single task; the
  min-(id,pos)-packed groupBy reduces them map-side to one row per
  input partition before the exchange.

The action is a noop WRITE (full materialization of the rebuilt
text), not count() — r04 measured count() letting Spark prune the
expensive rebuild column (7x difference). Every measurement runs
behind the shared bench throttle gate (scripts/probe_gate) and each
row records the accumulated gate wait. Results ->
BENCH/LINE_DEDUP_SCALE_r05.json (one JSON line per probe row).

Usage: python scripts/line_dedup_scale_probe.py [sizes...]
       (default 100000 300000 1000000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from probe_gate import gated, make_gate
from logmetrics_spark.functions import dedup as D
from logmetrics_spark.session import get_spark

N_TOKENS = 60
VOCAB = 5000
SEG_WORDS = 3
LINE_WORDS = 5  # delim mode: 12 lines of 5 tokens
BOILER = "wboiler1 wboiler2 wboiler3"  # one shared segment/line


def _tok_cols(n: int):
    return [
        F.concat(
            F.lit("w"),
            (D.md5_52(F.concat_ws(":", F.col("seed"), F.lit(str(j)))) % VOCAB).cast(
                "string"
            ),
        )
        for j in range(n)
    ]


def _base(spark, n: int):
    """Every 7th doc an exact clone of its predecessor."""
    return spark.range(n, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        F.when((F.col("id") % 7 == 0) & (F.col("id") > 0), F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("seed"),
    )


def gen_docs_kword(spark, n: int, viral: bool):
    """Single-line 60-token docs; ``viral`` prefixes the shared
    boilerplate segment onto doc_id % 10 in {0,1,2} (30% of the
    corpus), prefix-aligned so it is ONE hot segment key."""
    base = _base(spark, n)
    text = F.concat_ws(" ", *_tok_cols(N_TOKENS))
    if viral:
        hot = F.col("doc_id") % 10 < 3
        text = F.when(hot, F.concat_ws(" ", F.lit(BOILER), text)).otherwise(text)
    return base.select("doc_id", text.alias("text"))


def gen_docs_delim(spark, n: int, viral: bool):
    """The same token stream as 12 newline-separated 5-token lines.
    Viral docs get the boilerplate LINE prepended plus a BLANK line
    after it (empty segment -> the preserved-structure path)."""
    base = _base(spark, n)
    toks = _tok_cols(N_TOKENS)
    lines = [
        F.concat_ws(" ", *toks[i * LINE_WORDS : (i + 1) * LINE_WORDS])
        for i in range(N_TOKENS // LINE_WORDS)
    ]
    text = F.concat_ws("\n", *lines)
    if viral:
        hot = F.col("doc_id") % 10 < 3
        text = F.when(
            hot, F.concat_ws("\n", F.lit(BOILER), F.lit(""), text)
        ).otherwise(text)
    return base.select("doc_id", text.alias("text"))


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 300_000, 1_000_000]
    mode_env = os.environ.get("PROBE_LD_MODE", "both")  # kword|delim|both
    fmode = "a" if os.environ.get("PROBE_APPEND") == "1" else "w"
    os.makedirs("BENCH", exist_ok=True)
    out_fh = open("BENCH/LINE_DEDUP_SCALE_r05.json", fmode)
    gate = make_gate()
    spark = get_spark(
        "line_dedup_scale",
        master="local[16]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    try:
        for n in sizes:
            for mode in ("kword", "delim"):
                if mode_env not in ("both", mode):
                    continue
                for viral in (False, True):
                    regime = "viral" if viral else "linear"
                    gen = gen_docs_kword if mode == "kword" else gen_docs_delim
                    docs = gen(spark, n, viral).persist()
                    n_in = docs.count()
                    if mode == "kword":
                        out = D.line_dedup(docs, words_per_segment=SEG_WORDS)
                        segs_per_doc = N_TOKENS // SEG_WORDS
                        extra = 3 * n_in // 10 if viral else 0
                    else:
                        out = D.line_dedup(docs)  # newline mode
                        segs_per_doc = N_TOKENS // LINE_WORDS
                        # hot docs add the boiler line AND the blank line
                        extra = 2 * (3 * n_in // 10) if viral else 0

                    def run(o=out):
                        o.write.format("noop").mode("overwrite").save()

                    _, sec = gated(gate, run)
                    n_out, _ = gated(gate, out.count)
                    rec = {
                        "probe": "line_dedup",
                        "n": n,
                        "mode": mode,
                        "regime": regime,
                        "exploded_rows": n_in * segs_per_doc + extra,
                        "docs_in": n_in,
                        "docs_out": n_out,
                        "sec": sec,
                        "gate_wait_sec": round(gate.wait_s, 1),
                    }
                    if viral:
                        # invariant: the boilerplate survives exactly
                        # once — in the smallest hot doc (doc_id 0)
                        survivors = out.filter(
                            F.col("text").startswith(BOILER)
                        ).count()
                        rec["boiler_survivors"] = survivors
                        rec["boiler_ok"] = survivors == 1
                        if mode == "delim":
                            # blank lines are structure: every hot
                            # surviving doc keeps its blank line even
                            # after the boiler line dedups away
                            with_blank = out.filter(
                                F.col("text").contains("\n\n")
                                | F.col("text").startswith("\n")
                            ).count()
                            rec["blank_line_docs"] = with_blank
                    line = json.dumps(rec)
                    print(line, flush=True)
                    out_fh.write(line + "\n")
                    out_fh.flush()
                    docs.unpersist()
                    spark.catalog.clearCache()
    finally:
        spark.stop()
        out_fh.close()


if __name__ == "__main__":
    main()
