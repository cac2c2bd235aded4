"""r06 dedup-scale probe: the round's vectorized pair-expansion and
partition-wise bucket kernels at 1M inputs, against the r03/r05
records.

Comparables (same generators, same methodology, this machine):

- ``simhash_pairs`` 1M linear uncapped: r03 recorded 12.44s at the
  adopted 60-bit layout (`docs_simhash60`) and 164.7s at the original
  one; 1M viral (10k near-dup family) cap 64: r03 25.58s.
- ``embedding_neardup_lsh`` 1M viral (10k shared-direction family)
  cap 64: r05 recorded 98.18s at width 16 and 46.87s at width 20.

Every measurement runs behind the shared bench throttle gate and
records the accumulated gate wait. Results are APPENDED to
``BENCH/DEDUP_SCALE_r06.json`` (the r03-r05 files are round history —
never rewritten).

Usage: python scripts/dedup_scale_probe_r06.py [n]   (default 1000000)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedup_scale_probe import BUCKET_CAP, gen_docs, gen_embeddings
from probe_gate import gated, make_gate
from logmetrics_spark.functions import dedup as D
from logmetrics_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    os.makedirs("BENCH", exist_ok=True)
    out_fh = open("BENCH/DEDUP_SCALE_r06.json", "a")
    gate = make_gate()
    spark = get_spark(
        "dedup_scale_r06",
        master="local[16]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )

    def emit(rec: dict) -> None:
        rec["gate_wait_sec"] = round(gate.wait_s, 1)
        print(json.dumps(rec, default=int), flush=True)
        out_fh.write(json.dumps(rec, default=int) + "\n")
        out_fh.flush()

    try:
        # --- simhash_pairs: both expansion legs are now kernels ---
        for regime, viral, cap in (("linear", False, None), ("viral", True, BUCKET_CAP)):
            docs = gen_docs(spark, n, viral=viral).persist()
            docs.count()
            pairs, sec = gated(
                gate, lambda: D.simhash_pairs(docs, 3, bucket_cap=cap).count()
            )
            emit(
                {
                    "probe": "docs_run",
                    "n": n,
                    "regime": regime,
                    "op": "simhash",
                    "bucket_cap": cap,
                    "pairs": pairs,
                    "sec": round(sec, 2),
                }
            )
            docs.unpersist()
            spark.catalog.clearCache()

        # --- embedding_neardup_lsh: partition-wise bucket walk ---
        emb = gen_embeddings(spark, n, viral=True).persist()
        emb.count()
        first = True
        for width in (16, 20):
            if not first:
                spark.catalog.clearCache()
                emb.persist()
                emb.count()
            first = False
            n_bands = 4
            pairs, sec = gated(
                gate,
                lambda: D.embedding_neardup_lsh(
                    emb,
                    0.95,
                    n_planes=width * n_bands,
                    n_bands=n_bands,
                    bucket_cap=BUCKET_CAP,
                ).count(),
            )
            emit(
                {
                    "probe": "emb_run",
                    "n": n,
                    "regime": "viral",
                    "width": width,
                    "n_bands": n_bands,
                    "bucket_cap": BUCKET_CAP,
                    "pairs": pairs,
                    "sec": round(sec, 2),
                }
            )
    finally:
        out_fh.close()
        spark.stop()


if __name__ == "__main__":
    main()
