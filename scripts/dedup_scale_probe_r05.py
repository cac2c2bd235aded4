"""r05 dedup-scale probe: the viral embedding regime at the LIFTED
band width.

r04 removed the packed-int64 width ceiling (per-band signature
columns) and proved the linear regime's width frontier at 1M vectors
(width 16: 784.9s -> width 20: 17.5s, candidates back to linear), but
the VIRAL row in BENCH/DEDUP_SCALE_r04.json still ran at the old
autoscaled width 16 (162.6s at cap 64). This probe completes the
story: the SAME 1M-vector viral corpus (10k-member shared-direction
family) at width 16 (reference point) and width 20 (the lifted
frontier), bucket_cap 64, with per-band candidate telemetry both
ways.

Every measurement runs behind the shared bench throttle gate
(scripts/probe_gate, VERDICT r04 "What's wrong" §3) and records the
accumulated gate wait. Results -> BENCH/DEDUP_SCALE_r05.json.

Usage: python scripts/dedup_scale_probe_r05.py [n]   (default 1000000)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dedup_scale_probe import BUCKET_CAP, band_stats, gen_embeddings
from probe_gate import gated, make_gate
from logmetrics_spark.functions import dedup as D
from logmetrics_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mode = "a" if os.environ.get("PROBE_APPEND") == "1" else "w"
    os.makedirs("BENCH", exist_ok=True)
    out_fh = open("BENCH/DEDUP_SCALE_r05.json", mode)
    gate = make_gate()
    spark = get_spark(
        "dedup_scale_r05",
        master="local[16]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    try:
        emb = gen_embeddings(spark, n, viral=True).persist()
        emb.count()
        first = True
        for width in (16, 20):
            if not first:
                # clearCache (needed to drop the LSH builder's
                # internal persists between widths) also drops the
                # shared corpus — rewarm it OUTSIDE any gated window
                # so every width measures against an
                # identically-cached input; doing this at loop TOP
                # skips a useless final regeneration pass
                spark.catalog.clearCache()
                emb.persist()
                emb.count()
            first = False
            n_bands = 4
            n_planes = width * n_bands
            planes = D.hyperplanes(64, n_planes)
            s = D.with_hyperplane_signature(emb, planes, n_bands)
            entries = s.select(
                "vec_id",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band"),
                                F.col(f"sig_{b}").cast("string").alias("bucket"),
                            )
                            for b in range(n_bands)
                        ]
                    )
                ).alias("bb"),
            ).select(
                "vec_id",
                F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"),
            )
            stats, stats_sec = gated(gate, lambda: band_stats(entries))
            rec = {
                "probe": "emb",
                "n": n,
                "regime": "viral",
                "n_planes": n_planes,
                "n_bands": n_bands,
                "width": width,
                "bands": stats,
                "stats_sec": stats_sec,
                "gate_wait_sec": round(gate.wait_s, 1),
            }
            print(json.dumps(rec, default=int), flush=True)
            out_fh.write(json.dumps(rec, default=int) + "\n")
            out_fh.flush()
            pairs, sec = gated(
                gate,
                lambda: D.embedding_neardup_lsh(
                    emb,
                    0.95,
                    n_planes=n_planes,
                    n_bands=n_bands,
                    bucket_cap=BUCKET_CAP,
                ).count(),
            )
            rec = {
                "probe": "emb_run",
                "n": n,
                "regime": "viral",
                "width": width,
                "n_bands": n_bands,
                "bucket_cap": BUCKET_CAP,
                "pairs": pairs,
                "sec": sec,
                "gate_wait_sec": round(gate.wait_s, 1),
            }
            print(json.dumps(rec, default=int), flush=True)
            out_fh.write(json.dumps(rec, default=int) + "\n")
            out_fh.flush()
        emb.unpersist()
    finally:
        spark.stop()
        out_fh.close()


if __name__ == "__main__":
    main()
