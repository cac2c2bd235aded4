"""Scale probe for the dedup/LSH paths (r03: the top remaining scale
evidence from VERDICT r02).

Generates deterministic corpora at several sizes with BOTH planted
duplicate regimes:

- **linear regime**: every 7th doc is an exact clone of its
  predecessor — candidate volume should grow ~linearly with n;
- **viral regime**: the linear corpus plus ONE 10k-member near-dup
  family (each member a light mutation of a shared base doc) — the
  adversarial case for any LSH banding: the family lands in the same
  buckets and contributes O(m^2) candidate pairs per band unless
  capped.

For each (size, regime, operator) the probe records wall time, result
pair count, and per-band occupancy telemetry (``band_bucket_stats``:
bucket count, max/p99 bucket size, exact candidate-pair volume). The
viral regime is *measured* uncapped (stats only — counting candidates
is cheap; generating them is the blowup) and *executed* with
``bucket_cap`` (star degradation), demonstrating the mitigation.

Embeddings get the same treatment at 64 dims with md5-free
deterministic vectors (cheap integer mixing — probe-local, not an
engine contract) and planted clone pairs + a 10k viral family.

Results land in BENCH/DEDUP_SCALE_r03.json (one JSON line per probe
row) — summarized in BENCH/BASELINE.md.

Usage: python scripts/dedup_scale_probe.py [sizes...]
       (default 100000 300000 1000000, docs and embeddings)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from logmetrics_spark.functions import dedup as D
from logmetrics_spark.session import get_spark

N_TOKENS = 60
VOCAB = 5000
VIRAL_M = 10_000
BUCKET_CAP = 64


def gen_docs(spark, n: int, viral: bool):
    """n docs of 60 tokens from a 5k vocabulary; every 7th doc an
    exact clone of its predecessor. ``viral`` adds a 10k-member
    near-dup family: members share one base doc (seed = -1) with a
    single member-specific token substitution — mutually ~0.9 Jaccard,
    so every member co-buckets with most others in every band."""
    base = spark.range(n, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        F.when((F.col("id") % 7 == 0) & (F.col("id") > 0), F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("seed"),
    )
    if viral:
        fam = F.col("doc_id") >= (n - VIRAL_M)
        base = base.withColumn("seed", F.when(fam, F.lit(-1)).otherwise(F.col("seed")))
    toks = [
        F.concat(
            F.lit("w"),
            (D.md5_52(F.concat_ws(":", F.col("seed"), F.lit(str(j)))) % VOCAB).cast("string"),
        )
        for j in range(N_TOKENS)
    ]
    if viral:
        # one member-specific token at position 30: family members are
        # near- (not exact-) duplicates of each other
        fam = F.col("doc_id") >= (n - VIRAL_M)
        toks[30] = F.when(
            fam, F.concat(F.lit("u"), F.col("doc_id").cast("string"))
        ).otherwise(toks[30])
    return base.select("doc_id", F.concat_ws(" ", *toks).alias("text"))


def gen_embeddings(spark, n: int, viral: bool, dim: int = 64):
    """n deterministic 64-dim vectors; every 13th a noisy clone of its
    predecessor; ``viral`` points the last 10k vectors at one shared
    base direction (cos ~0.999 within the family)."""

    def mapper(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            seeds = np.where((ids % 13 == 0) & (ids > 0), ids - 1, ids)
            if viral:
                seeds = np.where(ids >= n - VIRAL_M, -1, seeds)
            j = np.arange(dim, dtype=np.int64)
            # cheap deterministic mixing (probe-local, not a contract)
            m = (seeds[:, None] * 2654435761 + (j[None, :] + 1) * 40503) & 0xFFFFFFFF
            m = (m ^ (m >> 13)) * 1274126177 & 0xFFFFFFFF
            v = ((m % 2001) - 1000).astype(np.float64) / 1000.0
            # clone noise: tiny id-dependent perturbation
            v += ((ids[:, None] % 997) / 997.0 - 0.5) * 1e-3
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [row.astype(np.float32).tolist() for row in v]}
            )

    return spark.range(n, numPartitions=64).mapInPandas(
        mapper, "vec_id long, embedding array<float>"
    )


def band_stats(entries) -> list[dict]:
    return [r.asDict() for r in D.band_bucket_stats(entries).orderBy("band").collect()]


def emit(rec: dict, out_fh) -> None:
    line = json.dumps(rec, default=int)
    print(line, flush=True)
    out_fh.write(line + "\n")
    out_fh.flush()


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def _probe_session():
    # fresh JVM state per phase: a single session accumulates listener/
    # UI bookkeeping over the probe's hundreds of heavy stages and
    # eventually OOMs the driver heap even at 64g (observed at stage
    # ~594) — the probe phases are independent, so isolate them
    return get_spark(
        "dedup_scale",
        master="local[16]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
            "spark.sql.ui.retainedExecutions": "10",
        },
    )


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:] if not s.startswith("--")] or [
        100_000, 300_000, 1_000_000,
    ]
    phase = os.environ.get("PROBE_PHASE", "all")  # all | docs | emb
    mode = "a" if os.environ.get("PROBE_APPEND") == "1" else "w"
    os.makedirs("BENCH", exist_ok=True)
    out_fh = open("BENCH/DEDUP_SCALE_r03.json", mode)
    spark = None
    try:
        if phase in ("all", "docs"):
            spark = _probe_session()
            for n in sizes:
                for viral in (False, True):
                    docs = gen_docs(spark, n, viral).persist()
                    docs.count()
                    regime = "viral" if viral else "linear"

                    # --- telemetry first (cheap counts, no pair explosion)
                    shh = D.shingle_hashes(docs)
                    sig = D.minhash_signatures_from_hashes(shh)
                    mh_stats = band_stats(D._minhash_band_entries(sig))
                    sh_stats = band_stats(
                        D.simhash_band_entries(D.simhash(docs)).select("band", "bucket", "id")
                    )
                    emit(
                        {
                            "probe": "docs", "n": n, "regime": regime,
                            "minhash_bands": mh_stats, "simhash_bands": sh_stats,
                        },
                        out_fh,
                    )

                    # --- executions: uncapped only in the linear regime
                    # (the viral uncapped candidate volume is the recorded
                    # telemetry above — generating ~2e8 pairs is the
                    # failure mode, not the experiment)
                    runs = []
                    if not viral:
                        runs.append(("minhash_lsh", None))
                        runs.append(("simhash", None))
                    else:
                        runs.append(("minhash_lsh", BUCKET_CAP))
                        runs.append(("simhash", BUCKET_CAP))
                    runs.append(("exact", None))
                    for op, cap in runs:
                        if op == "minhash_lsh":
                            fn = lambda: D.minhash_lsh_pairs(docs, 0.4, bucket_cap=cap).count()
                        elif op == "simhash":
                            fn = lambda: D.simhash_pairs(docs, 3, bucket_cap=cap).count()
                        else:
                            fn = lambda: D.exact_dedup(docs).filter(F.col("n_docs") > 1).count()
                        pairs, sec = timed(fn)
                        emit(
                            {
                                "probe": "docs_run", "n": n, "regime": regime,
                                "op": op, "bucket_cap": cap, "pairs": pairs, "sec": sec,
                            },
                            out_fh,
                        )
                    docs.unpersist()
                    spark.catalog.clearCache()
            spark.stop()
            spark = None

        if phase not in ("all", "emb"):
            return
        spark = _probe_session()
        for n in sizes:
            for viral in (False, True):
                emb = gen_embeddings(spark, n, viral).persist()
                emb.count()
                regime = "viral" if viral else "linear"
                # band-width autoscaling: expected bucket occupancy
                # ~constant, so candidate volume stays ~linear in n
                n_planes, n_bands = D.emb_lsh_plan(n)
                planes = D.hyperplanes(64, n_planes)
                s = D.with_hyperplane_signature(emb, planes, n_bands)
                bands = [
                    F.struct(
                        F.lit(b).alias("band"),
                        F.col(f"sig_{b}").cast("string").alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
                entries = s.select("vec_id", F.explode(F.array(*bands)).alias("bb")).select(
                    "vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
                )
                emit(
                    {"probe": "emb", "n": n, "regime": regime,
                     "n_planes": n_planes, "n_bands": n_bands,
                     "bands": band_stats(entries)},
                    out_fh,
                )
                cap = BUCKET_CAP if viral else None
                pairs, sec = timed(
                    lambda: D.embedding_neardup_lsh(
                        emb, 0.95, n_planes=n_planes, n_bands=n_bands, bucket_cap=cap
                    ).count()
                )
                emit(
                    {
                        "probe": "emb_run", "n": n, "regime": regime,
                        "bucket_cap": cap, "pairs": pairs, "sec": sec,
                    },
                    out_fh,
                )
                emb.unpersist()
                spark.catalog.clearCache()
    finally:
        out_fh.close()
        spark.stop()


if __name__ == "__main__":
    main()
