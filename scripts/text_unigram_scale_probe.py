"""Scale probe for unigram_lm_scores (r05): the skewed-token-join fix.

The r04 plan joined the full exploded token stream on the token key —
at web scale the "the" partition is a single-digit percent of the
corpus token stream in ONE shuffle key. The r05 plan pre-reduces to
per-doc (id, tok) counts BEFORE anything joins on the token, so the
hot key's join rows are bounded by distinct docs, not occurrences,
and the identical doc-level shuffle feeds both join sides
(ReuseExchange -> one corpus scan).

Corpus: 60-token docs; each token position is, with probability 1/5,
the SAME hot stopword ("wthe" — 20% of the whole token stream in one
key, hotter than English "the"), else one of a 5k vocabulary. Probes
n in {300k, 1M} (18M / 60M tokens, 3.6M / 12M of them the hot key).

Recorded per n: wall time of a noop write (full materialization),
rows out, the hot-key token share, plus two plan pins read from the
executed plan — the doc-level pre-aggregation sits BELOW the token
join, and the exchange is reused across the vocabulary/total
branches. Every measurement runs behind the shared bench throttle
gate. -> BENCH/TEXT_UNIGRAM_SCALE_r05.json.

Usage: python scripts/text_unigram_scale_probe.py [sizes...]
       (default 300000 1000000)
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from probe_gate import gated, make_gate
from logmetrics_spark.functions import dedup as D
from logmetrics_spark.functions.text import unigram_lm_scores
from logmetrics_spark.session import get_spark

N_TOKENS = 60
VOCAB = 5000
HOT = "wthe"


def gen_docs(spark, n: int):
    base = spark.range(n, numPartitions=64).select(F.col("id").alias("doc_id"))
    toks = []
    for j in range(N_TOKENS):
        h = D.md5_52(F.concat_ws(":", F.col("doc_id"), F.lit(str(j))))
        toks.append(
            F.when(h % 5 == 0, F.lit(HOT)).otherwise(
                F.concat(F.lit("w"), (h % VOCAB).cast("string"))
            )
        )
    return base.select("doc_id", F.concat_ws(" ", *toks).alias("text"))


def plan_pins(spark) -> dict:
    """Plan-shape pins on a small corpus (shape is size-independent):
    collect() executes the DataFrame's own QueryExecution, so the AQE
    FINAL plan — where ReusedExchange materializes — is what's read."""
    df = unigram_lm_scores(gen_docs(spark, 10_000))
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    # the doc-level pre-aggregation must sit BELOW the token join:
    # a HashAggregate keyed by (id, tok) on the join's probe side
    join_at = min(
        [s.find(t) for t in ("Join [tok", "Join tok", "BroadcastHashJoin [tok")
         if s.find(t) >= 0] or [-1]
    )
    preagg = re.search(r"HashAggregate\(keys=\[id#\d+L?, tok#\d+", s)
    return {
        "plan_preagg_below_join": bool(
            join_at >= 0 and preagg and preagg.start() > join_at
        ),
        "plan_reused_exchanges": s.count("ReusedExchange"),
    }


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [300_000, 1_000_000]
    mode = "a" if os.environ.get("PROBE_APPEND") == "1" else "w"
    os.makedirs("BENCH", exist_ok=True)
    out_fh = open("BENCH/TEXT_UNIGRAM_SCALE_r05.json", mode)
    gate = make_gate()
    spark = get_spark(
        "unigram_scale",
        master="local[16]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    try:
        pins = plan_pins(spark)
        for n in sizes:
            docs = gen_docs(spark, n).persist()
            n_in = docs.count()
            out = unigram_lm_scores(docs)

            def run(o=out):
                o.write.format("noop").mode("overwrite").save()

            _, sec = gated(gate, run)
            rows, _ = gated(gate, out.count)
            rec = {
                "probe": "text_unigram_lm",
                "n": n,
                "tokens": n_in * N_TOKENS,
                "hot_token_share": 0.2,
                "rows_out": rows,
                "sec": sec,
                "docs_per_sec": round(n_in / sec, 1),
                "gate_wait_sec": round(gate.wait_s, 1),
                **pins,
            }
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
