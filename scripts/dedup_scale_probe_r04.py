"""r04 scale probe: the three measurements VERDICT r03 asked for.

1. **emb** — embedding LSH at 1M vectors with the width ceiling
   LIFTED (per-band int64 signature columns): the autoscaled plan
   (width 16 at 1M) plus explicit width-17 and width-20 points, each
   with exact per-band candidate-volume telemetry. The number to beat
   is r03's 377.7s / ~28M candidates-per-band at the clamped 15-bit
   width (BENCH/DEDUP_SCALE_r03.json, emb linear n=1000000).

2. **parity** — the capped-vs-uncapped recall frontier at 100k viral
   docs (10k-member near-dup family): verified-pair counts both ways,
   the capped-is-subset check, and CONNECTED-COMPONENT parity — does
   bucket_cap's chain+skip degradation change the partition a
   training pipeline would dedup by? (Missing ids = singletons: a doc
   whose every pair was capped away must count as its own component.)

3. **cc** — connected_components on the 1M-doc viral capped pair
   graph (the chain-heavy shape bucket_cap emits): rounds to
   converge, wall time, component count, largest component.

Reuses the r03 probe's deterministic corpus generators (same seeds,
so numbers are comparable round-over-round). Results land in
BENCH/DEDUP_SCALE_r04.json, one JSON line per probe row.

Usage: python scripts/dedup_scale_probe_r04.py
       PROBE_PHASE=emb|parity|cc|all (env) selects phases.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from dedup_scale_probe import (  # r03 generators — identical corpora
    BUCKET_CAP,
    _probe_session,
    band_stats,
    gen_docs,
    gen_embeddings,
    timed,
)
from logmetrics_spark.functions import dedup as D

OUT = "BENCH/DEDUP_SCALE_r04.json"


def emit(rec: dict, out_fh) -> None:
    line = json.dumps(rec, default=int)
    print(line, flush=True)
    out_fh.write(line + "\n")
    out_fh.flush()


def probe_emb(spark, out_fh, n: int) -> None:
    regimes = os.environ.get("PROBE_EMB_REGIME", "both")
    for regime, viral in (("linear", False), ("viral", True)):
        if regimes not in ("both", regime):
            continue
        emb = gen_embeddings(spark, n, viral).persist()
        emb.count()
        plans = [D.emb_lsh_plan(n)]  # autoscaled (width 16 @ 1M)
        if not viral:
            plans += [(17 * 4, 4), (20 * 4, 4)]  # explicit frontier points
        for n_planes, n_bands in plans:
            width = n_planes // n_bands
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
                "vec_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
            )
            stats, stats_sec = timed(lambda: band_stats(entries))
            emit(
                {"probe": "emb", "n": n, "regime": regime, "n_planes": n_planes,
                 "n_bands": n_bands, "width": width, "bands": stats,
                 "stats_sec": stats_sec},
                out_fh,
            )
            cap = BUCKET_CAP if viral else None
            pairs, sec = timed(
                lambda: D.embedding_neardup_lsh(
                    emb, 0.95, n_planes=n_planes, n_bands=n_bands, bucket_cap=cap
                ).count()
            )
            emit(
                {"probe": "emb_run", "n": n, "regime": regime, "width": width,
                 "n_bands": n_bands, "bucket_cap": cap, "pairs": pairs, "sec": sec},
                out_fh,
            )
            spark.catalog.clearCache()
        emb.unpersist()


def _partition_parity(spark, capped, uncapped) -> dict:
    """Compare the dedup partitions induced by two pair tables:
    components over each, full-outer joined on id with missing ids as
    singletons (comp = own id). Partitions are identical iff the
    distinct (comp_capped, comp_uncapped) mapping is a bijection:
    n_distinct_pairs == n_distinct_capped == n_distinct_uncapped."""
    st_c: dict = {}
    st_u: dict = {}
    comp_c = D.connected_components(capped, stats=st_c).withColumnRenamed("comp", "cc")
    comp_u = D.connected_components(uncapped, stats=st_u).withColumnRenamed("comp", "cu")
    both = (
        comp_c.join(comp_u, "id", "full_outer")
        .select(
            F.coalesce("cc", F.col("id")).alias("cc"),
            F.coalesce("cu", F.col("id")).alias("cu"),
        )
    )
    agg = both.agg(
        F.countDistinct(F.struct("cc", "cu")).alias("n_pairs"),
        F.countDistinct("cc").alias("n_capped"),
        F.countDistinct("cu").alias("n_uncapped"),
    ).collect()[0]
    return {
        "components_capped": agg["n_capped"],
        "components_uncapped": agg["n_uncapped"],
        "distinct_comp_mappings": agg["n_pairs"],
        "partitions_identical": agg["n_pairs"] == agg["n_capped"] == agg["n_uncapped"],
        "rounds_capped": st_c.get("rounds"),
        "rounds_uncapped": st_u.get("rounds"),
    }


def probe_parity(spark, out_fh, n: int = 100_000) -> None:
    docs = gen_docs(spark, n, viral=True).persist()
    docs.count()
    for op, make in (
        ("minhash_lsh", lambda cap: D.minhash_lsh_pairs(docs, 0.4, bucket_cap=cap)),
        ("simhash", lambda cap: D.simhash_pairs(docs, 3, bucket_cap=cap)),
    ):
        capped = make(BUCKET_CAP).persist()
        uncapped = make(None).persist()
        n_capped, sec_c = timed(capped.count)
        n_uncapped, sec_u = timed(uncapped.count)
        # capped pairs are generated from the same buckets, so they
        # must be a subset of the uncapped verified set — count any
        # violations instead of assuming
        not_subset = capped.join(uncapped, ["id_a", "id_b"], "left_anti").count()
        parity, sec_p = timed(lambda: _partition_parity(spark, capped, uncapped))
        emit(
            {"probe": "parity", "n": n, "op": op, "bucket_cap": BUCKET_CAP,
             "pairs_capped": n_capped, "pairs_uncapped": n_uncapped,
             "pair_recall_capped": round(n_capped / max(n_uncapped, 1), 4),
             "capped_pairs_outside_uncapped": not_subset,
             "sec_capped": sec_c, "sec_uncapped": sec_u, "sec_parity": sec_p,
             **parity},
            out_fh,
        )
        capped.unpersist()
        uncapped.unpersist()
        spark.catalog.clearCache()
    docs.unpersist()


def probe_cc(spark, out_fh, n: int = 1_000_000) -> None:
    docs = gen_docs(spark, n, viral=True).persist()
    docs.count()
    pairs = D.minhash_lsh_pairs(docs, 0.4, bucket_cap=BUCKET_CAP).persist()
    n_pairs = pairs.count()
    st: dict = {}
    comp, sec = timed(lambda: D.connected_components(pairs, stats=st).persist())
    sizes = comp.groupBy("comp").count()
    agg = sizes.agg(
        F.count(F.lit(1)).alias("n_components"), F.max("count").alias("largest")
    ).collect()[0]
    emit(
        {"probe": "cc", "n": n, "pairs": n_pairs, "sec": sec,
         "rounds": st.get("rounds"), "converged": st.get("converged"),
         "n_components": agg["n_components"], "largest_component": agg["largest"]},
        out_fh,
    )
    comp.unpersist()
    pairs.unpersist()
    docs.unpersist()


def gen_batch(spark, n_corpus: int, m: int):
    """m new-batch docs (ids [n_corpus, n_corpus+m)), same token model
    as gen_docs: every 2nd doc is an exact clone of a hash-scattered
    CORPUS doc (the realistic recurring-crawl shape — roughly half a
    new snapshot is already in the kept corpus), the rest fresh."""
    from dedup_scale_probe import N_TOKENS, VOCAB

    base = spark.range(n_corpus, n_corpus + m, numPartitions=16).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, (F.col("id") * 2654435761) % n_corpus)
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
    return base.select("doc_id", F.concat_ws(" ", *toks).alias("text"))


def probe_incremental(spark, out_fh, m: int = 100_000) -> None:
    """The O(batch) claim behind dedup_incremental: matching the SAME
    100k batch against a 300k and a 1M corpus index should cost
    roughly the same (index probe + batch-sized verify), while the
    re-pay-the-corpus baseline (full LSH over corpus+batch) scales
    with the corpus. Index build time is recorded separately — it is
    the one-time per-snapshot cost the incremental path amortizes."""
    for n_corpus in (300_000, 1_000_000):
        docs = gen_docs(spark, n_corpus, viral=False).persist()
        docs.count()
        batch = gen_batch(spark, n_corpus, m).persist()
        batch.count()

        def build_index():
            entries, shh = D.minhash_index(docs)
            entries = entries.persist()
            shh = shh.persist()
            return entries, shh, entries.count(), shh.count()

        (entries, shh, n_entries, n_shh), sec_index = timed(build_index)
        pairs = D.minhash_lsh_incremental_pairs(batch, (entries, shh), 0.4)
        n_pairs, sec_inc = timed(pairs.count)
        matched = (
            pairs.select("id_new").distinct().count()
        )  # distinct batch docs with a corpus match
        n_full, sec_full = timed(
            lambda: D.minhash_lsh_pairs(docs.unionByName(batch), 0.4).count()
        )
        emit(
            {"probe": "incremental", "n_corpus": n_corpus, "n_batch": m,
             "index_entries": n_entries, "index_shingle_rows": n_shh,
             "sec_index_build": sec_index, "sec_incremental": sec_inc,
             "pairs": n_pairs, "batch_docs_matched": matched,
             "sec_full_lsh_baseline": sec_full, "pairs_full": n_full},
            out_fh,
        )
        for df in (entries, shh, batch, docs):
            df.unpersist()
        spark.catalog.clearCache()

    # viral corpus + capped index: per-new-doc candidates stay bounded
    n_corpus = 1_000_000
    docs = gen_docs(spark, n_corpus, viral=True).persist()
    docs.count()
    batch = gen_batch(spark, n_corpus, m).persist()
    batch.count()
    entries, shh = D.minhash_index(docs)
    entries = entries.persist()
    shh = shh.persist()
    entries.count()
    pairs_c = D.minhash_lsh_incremental_pairs(
        batch, (entries, shh), 0.4, bucket_cap=BUCKET_CAP
    )
    n_pairs_c, sec_c = timed(pairs_c.count)
    max_per_doc = (
        pairs_c.groupBy("id_new").count().agg(F.max("count")).collect()[0][0]
    )
    emit(
        {"probe": "incremental", "n_corpus": n_corpus, "n_batch": m,
         "regime": "viral", "bucket_cap": BUCKET_CAP, "pairs": n_pairs_c,
         "sec_incremental": sec_c, "max_pairs_per_new_doc": max_per_doc,
         "per_doc_bound": BUCKET_CAP * D.LSH_BANDS},
        out_fh,
    )
    for df in (entries, shh, batch, docs):
        df.unpersist()


def gen_emb_batch(spark, n_corpus: int, m: int, viral: bool = False, dim: int = 64):
    """m new-batch vectors (ids [n_corpus, n_corpus+m)), same mixing as
    gen_embeddings: every 2nd vector the near-clone of a hash-scattered
    CORPUS vector (seed = hash(id) % n_corpus, cos ~0.999+ against it
    through the shared seed->vector map plus the tiny id-dependent
    clone noise), the rest fresh. With ``viral``, every 101st vector
    joins the corpus's shared-base viral family (seed = -1)."""
    import numpy as np
    import pandas as pd

    def mapper(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            seeds = np.where(ids % 2 == 0, (ids * 2654435761) % n_corpus, ids)
            if viral:
                seeds = np.where(ids % 101 == 0, -1, seeds)
            j = np.arange(dim, dtype=np.int64)
            mm = (seeds[:, None] * 2654435761 + (j[None, :] + 1) * 40503) & 0xFFFFFFFF
            mm = (mm ^ (mm >> 13)) * 1274126177 & 0xFFFFFFFF
            v = ((mm % 2001) - 1000).astype(np.float64) / 1000.0
            v += ((ids[:, None] % 997) / 997.0 - 0.5) * 1e-3
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [r.astype(np.float32).tolist() for r in v]}
            )

    return spark.range(n_corpus, n_corpus + m, numPartitions=16).mapInPandas(
        mapper, "vec_id long, embedding array<float>"
    )


def probe_emb_incremental(spark, out_fh, m: int = 100_000) -> None:
    """The O(batch) claim behind embed_incremental: matching the SAME
    100k embedding batch against a 300k and a 1M corpus index should
    cost roughly the same (broadcast index probe + batch-sized cosine
    verify), while the re-pay-the-corpus baseline (full hyperplane LSH
    over corpus+batch) scales with the corpus. Index plans autoscale
    per corpus size (emb_lsh_plan — width 15 @ 300k, 16 @ 1M)."""
    for n_corpus in (300_000, 1_000_000):
        n_planes, n_bands = D.emb_lsh_plan(n_corpus)
        emb = gen_embeddings(spark, n_corpus, viral=False).persist()
        emb.count()
        batch = gen_emb_batch(spark, n_corpus, m).persist()
        batch.count()

        def build_index():
            entries, sig = D.embedding_index(
                emb, n_planes=n_planes, n_bands=n_bands
            )
            entries = entries.persist()
            sig = sig.persist()
            return entries, sig, entries.count(), sig.count()

        (entries, sig, n_entries, n_sig), sec_index = timed(build_index)
        pairs = D.embedding_incremental_pairs(
            batch, (entries, sig), 0.95, n_planes=n_planes, n_bands=n_bands
        )
        n_pairs, sec_inc = timed(pairs.count)
        matched = pairs.select("id_new").distinct().count()
        n_full, sec_full = timed(
            lambda: D.embedding_neardup_lsh(
                emb.unionByName(batch), 0.95, n_planes=n_planes, n_bands=n_bands
            ).count()
        )
        emit(
            {"probe": "emb_incremental", "n_corpus": n_corpus, "n_batch": m,
             "width": n_planes // n_bands, "n_bands": n_bands,
             "index_entries": n_entries, "index_sig_rows": n_sig,
             "sec_index_build": sec_index, "sec_incremental": sec_inc,
             "pairs": n_pairs, "batch_vecs_matched": matched,
             "sec_full_lsh_baseline": sec_full, "pairs_full": n_full},
            out_fh,
        )
        for df in (entries, sig, batch, emb):
            df.unpersist()
        spark.catalog.clearCache()

    # viral corpus (10k-member shared-base family) + capped index:
    # per-new-vector candidates stay bounded by cap x bands
    n_corpus = 1_000_000
    n_planes, n_bands = D.emb_lsh_plan(n_corpus)
    emb = gen_embeddings(spark, n_corpus, viral=True).persist()
    emb.count()
    batch = gen_emb_batch(spark, n_corpus, m, viral=True).persist()
    batch.count()
    entries, sig = D.embedding_index(emb, n_planes=n_planes, n_bands=n_bands)
    entries = entries.persist()
    sig = sig.persist()
    entries.count()
    pairs_c = D.embedding_incremental_pairs(
        batch, (entries, sig), 0.95, n_planes=n_planes, n_bands=n_bands,
        bucket_cap=BUCKET_CAP,
    )
    n_pairs_c, sec_c = timed(pairs_c.count)
    max_per_doc = (
        pairs_c.groupBy("id_new").count().agg(F.max("count")).collect()[0][0]
    )
    emit(
        {"probe": "emb_incremental", "n_corpus": n_corpus, "n_batch": m,
         "regime": "viral", "bucket_cap": BUCKET_CAP, "pairs": n_pairs_c,
         "sec_incremental": sec_c, "max_pairs_per_new_doc": max_per_doc,
         "per_doc_bound": BUCKET_CAP * n_bands},
        out_fh,
    )
    for df in (entries, sig, batch, emb):
        df.unpersist()


def main() -> None:
    phase = os.environ.get("PROBE_PHASE", "all")
    mode = "a" if os.environ.get("PROBE_APPEND") == "1" else "w"
    os.makedirs("BENCH", exist_ok=True)
    out_fh = open(OUT, mode)
    try:
        if phase in ("all", "emb"):
            spark = _probe_session()
            probe_emb(spark, out_fh, int(os.environ.get("PROBE_EMB_N", 1_000_000)))
            spark.stop()
        if phase in ("all", "parity"):
            spark = _probe_session()
            probe_parity(spark, out_fh, int(os.environ.get("PROBE_PARITY_N", 100_000)))
            spark.stop()
        if phase in ("all", "cc"):
            spark = _probe_session()
            probe_cc(spark, out_fh, int(os.environ.get("PROBE_CC_N", 1_000_000)))
            spark.stop()
        if phase in ("all", "incremental"):
            spark = _probe_session()
            probe_incremental(
                spark, out_fh, int(os.environ.get("PROBE_INC_M", 100_000))
            )
            spark.stop()
        if phase in ("all", "emb_inc"):
            spark = _probe_session()
            probe_emb_incremental(
                spark, out_fh, int(os.environ.get("PROBE_INC_M", 100_000))
            )
            spark.stop()
    finally:
        out_fh.close()


if __name__ == "__main__":
    main()
