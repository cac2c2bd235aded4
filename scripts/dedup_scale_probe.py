"""Scale probe for the dedup/LSH paths: generate deterministic doc
corpora with planted duplicate clusters at several sizes and time the
scale-path operators. Linearity in n (vs the quadratic all-pairs
oracles) is the property that extrapolates to web-scale corpora —
results recorded in BENCH/BASELINE.md.

Usage: python scripts/dedup_scale_probe.py [sizes...]  (default 50k 100k 200k)
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


def gen_docs(spark, n: int):
    """n docs of 60 tokens from a 5k vocabulary, every 7th doc an exact
    clone of its predecessor (planted dup clusters exercise the
    candidate-verification path, not just the bucketing)."""
    base = spark.range(n, numPartitions=32).select(
        F.col("id").alias("doc_id"),
        F.when((F.col("id") % 7 == 0) & (F.col("id") > 0), F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("seed"),
    )
    toks = [
        F.concat(
            F.lit("w"),
            (D.md5_52(F.concat_ws(":", F.col("seed"), F.lit(str(j)))) % VOCAB).cast("string"),
        )
        for j in range(N_TOKENS)
    ]
    return base.select("doc_id", F.concat_ws(" ", *toks).alias("text"))


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [50_000, 100_000, 200_000]
    spark = get_spark(
        "dedup_scale",
        master="local[16]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out = {}
    ops = [
        ("minhash_lsh", lambda d: D.minhash_lsh_pairs(d, 0.4).count()),
        ("simhash", lambda d: D.simhash_pairs(d, 3).count()),
        ("exact", lambda d: D.exact_dedup(d).filter(F.col("n_docs") > 1).count()),
    ]
    try:
        # steady-state protocol (same rationale as bench.py part 2):
        # min of 2 runs per (op, size), cache cleared between runs —
        # run 1 of each plan shape pays one-time codegen/JIT, and this
        # VM's host throttling swings single runs 2-6x
        for n in sizes:
            rec = {}
            for name, op in ops:
                best, count = None, None
                for _ in range(2):
                    docs = gen_docs(spark, n).persist()
                    docs.count()
                    t0 = time.time()
                    count = op(docs)
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                    spark.catalog.clearCache()
                rec[f"{name}_pairs"] = count
                rec[f"{name}_sec"] = round(best, 2)
            out[n] = rec
            print(json.dumps({n: rec}))
    finally:
        spark.stop()
    print("RESULT", json.dumps(out))


if __name__ == "__main__":
    main()
