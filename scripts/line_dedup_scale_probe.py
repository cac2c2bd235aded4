"""Scale probe for line_dedup (r04): duplicate-span removal under a
viral boilerplate segment — the skew case the operator's window-free
plan exists for.

Regimes per size n (60-token docs, 5k vocabulary, 3-word segments →
20 segments/doc, 20n exploded rows):

- **linear**: every 7th doc an exact clone of its predecessor (its
  segments all dedup away) — background duplication only;
- **viral**: the linear corpus plus a shared 3-token boilerplate
  PREFIX on 30% of docs — ONE segment key with 0.3n occurrences.
  A row_number-window plan would sort those 0.3n rows in a single
  task; the min-(id,pos)-struct groupBy reduces them map-side to one
  row per input partition before the exchange, so the hot key costs
  O(partitions), not O(0.3n log 0.3n) in one straggler.

Recorded per (n, regime): wall time of the full rebuild (count of
surviving docs as the action), docs in/out, exploded segment rows,
and in the viral regime the boilerplate-survivor invariant (the
segment survives exactly once, in the smallest prefixed doc at pos
0). Results -> BENCH/LINE_DEDUP_SCALE_r04.json (one JSON line per
probe row).

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

from logmetrics_spark.functions import dedup as D
from logmetrics_spark.session import get_spark

N_TOKENS = 60
VOCAB = 5000
SEG_WORDS = 3
BOILER = "wboiler1 wboiler2 wboiler3"  # one 3-token segment, prefix-aligned


def gen_docs(spark, n: int, viral: bool):
    """n docs of 60 tokens from a 5k vocabulary; every 7th doc an
    exact clone of its predecessor. ``viral`` prefixes the shared
    boilerplate segment onto every doc_id % 10 in {0,1,2} (30% of the
    corpus) — prefix-aligned so it is ONE hot segment key, not three
    frame-shifted ones."""
    base = spark.range(n, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        F.when((F.col("id") % 7 == 0) & (F.col("id") > 0), F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("seed"),
    )
    toks = [
        F.concat(
            F.lit("w"),
            (D.md5_52(F.concat_ws(":", F.col("seed"), F.lit(str(j)))) % VOCAB).cast(
                "string"
            ),
        )
        for j in range(N_TOKENS)
    ]
    text = F.concat_ws(" ", *toks)
    if viral:
        hot = F.col("doc_id") % 10 < 3
        text = F.when(hot, F.concat_ws(" ", F.lit(BOILER), text)).otherwise(text)
    return base.select("doc_id", text.alias("text"))


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 300_000, 1_000_000]
    mode = "a" if os.environ.get("PROBE_APPEND") == "1" else "w"
    os.makedirs("BENCH", exist_ok=True)
    out_fh = open("BENCH/LINE_DEDUP_SCALE_r04.json", mode)
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
            for viral in (False, True):
                regime = "viral" if viral else "linear"
                docs = gen_docs(spark, n, viral).persist()
                n_in = docs.count()
                out = D.line_dedup(docs, words_per_segment=SEG_WORDS)
                t0 = time.time()
                n_out = out.count()
                sec = round(time.time() - t0, 2)
                rec = {
                    "probe": "line_dedup",
                    "n": n,
                    "regime": regime,
                    "seg_words": SEG_WORDS,
                    # hot docs carry 63 tokens -> 21 segments (sizes are
                    # multiples of 10, so 3n/10 is exact)
                    "exploded_rows": n_in * (N_TOKENS // SEG_WORDS)
                    + (3 * n_in // 10 if viral else 0),
                    "docs_in": n_in,
                    "docs_out": n_out,
                    "sec": sec,
                }
                if viral:
                    # invariant: the boilerplate survives exactly once —
                    # at pos 0 of the smallest hot doc (doc_id 0 is hot:
                    # 0 % 10 == 0)
                    survivors = out.filter(
                        F.col("text").startswith(BOILER)
                    ).count()
                    rec["boiler_survivors"] = survivors
                    rec["boiler_ok"] = survivors == 1
                line = json.dumps(rec)
                print(line, flush=True)
                out_fh.write(line + "\n")
                out_fh.flush()
                docs.unpersist()
    finally:
        spark.stop()
        out_fh.close()


if __name__ == "__main__":
    main()
