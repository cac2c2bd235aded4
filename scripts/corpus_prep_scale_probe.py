"""Scale probe for the COMPOSED corpus-prep plan (r04): the full
line-dedup -> quality/lang gate -> exact dedup -> MinHash-LSH near-dup
-> per-domain cap -> decontamination -> PII mask -> split -> per-split
packing pipeline, end to end, at 100k/300k/1M docs.

The per-operator probes (DEDUP_SCALE, LINE_DEDUP_SCALE) pin each
stage's scale shape in isolation; this one pins the COMPOSITION — that
the stages' shuffles don't multiply (near-dup LSH remains the dominant
cost), that nothing in the glue collects to the driver, and that
wall-time stays ~linear in corpus size.

Corpus: 60-token docs from a 5k vocabulary (same generator family as
the other probes), every 7th doc an exact clone (exact-dedup load),
every 11th a one-token mutation of its predecessor (near-dup load),
30% of docs carrying a shared 3-token boilerplate prefix (line-dedup
load), doc source = "src" || (doc_id % 1000) with domain 0 inflated
10x (domain-cap load), plus a 5-doc benchmark set whose spans
contaminate every 13th doc (decontamination load).

r05: the composition now also exercises the two newest quality
axes — the Gopher repetition gate (max_dup_word_frac /
max_top_bigram_frac) and the CCNet unigram-LM gate (min_lm_logprob)
— and every measurement runs behind the shared bench throttle gate
(scripts/probe_gate; the r04 file's sec_corpus_only > sec rows were
throttle-epoch artifacts a reader could not tell from plan
problems). Records per n: wall time, docs in/out, packs rows, the
accumulated gate wait, and the per-stage survivor counts implied by
the final corpus. -> BENCH/CORPUS_PREP_SCALE_r05.json (one JSON
line per n).

Usage: python scripts/corpus_prep_scale_probe.py [sizes...]
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
from logmetrics_spark.plans.corpus_prep import CorpusPrepConfig, prepare_corpus
from logmetrics_spark.session import get_spark

N_TOKENS = 60
VOCAB = 5000
BOILER = "wboiler1 wboiler2 wboiler3"
BENCH_SPAN = "wb1 wb2 wb3 wb4 wb5 wb6 wb7 wb8"  # 8 tokens = decontam n-gram


def gen_docs(spark, n: int):
    base = spark.range(n, numPartitions=64).select(
        F.col("id").alias("doc_id"),
        F.when((F.col("id") % 7 == 0) & (F.col("id") > 0), F.col("id") - 1)
        .when((F.col("id") % 11 == 0) & (F.col("id") > 0), F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("seed"),
        # near-dup: %11 docs mutate ONE token of the predecessor's text
        ((F.col("id") % 11 == 0) & (F.col("id") > 0)).alias("mutate"),
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
    # mutation: token 30 becomes a doc-unique token
    toks[30] = (
        F.when(F.col("mutate"), F.concat(F.lit("u"), F.col("doc_id").cast("string")))
        .otherwise(toks[30])
    )
    text = F.concat_ws(" ", *toks)
    hot = F.col("doc_id") % 10 < 3
    text = F.when(hot, F.concat_ws(" ", F.lit(BOILER), text)).otherwise(text)
    contaminated = F.col("doc_id") % 13 == 0
    text = F.when(
        contaminated, F.concat_ws(" ", text, F.lit(BENCH_SPAN))
    ).otherwise(text)
    # domain skew: 10% of docs pile into source src0
    src = F.when(
        F.col("doc_id") % 10 == 0, F.lit("src0")
    ).otherwise(F.concat(F.lit("src"), (F.col("doc_id") % 1000).cast("string")))
    return base.select("doc_id", text.alias("text"), src.alias("source"))


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 300_000, 1_000_000]
    mode = "a" if os.environ.get("PROBE_APPEND") == "1" else "w"
    os.makedirs("BENCH", exist_ok=True)
    out_fh = open("BENCH/CORPUS_PREP_SCALE_r05.json", mode)
    gate = make_gate()
    master = os.environ.get("PROBE_MASTER", "local[16]")
    spark = get_spark(
        "corpus_prep_scale",
        # PROBE_MASTER lets the same composed job run at two
        # parallelism levels (e.g. local[4] vs local[16]) for the
        # north rule's N->4N scaling-efficiency evidence on the
        # corpus-prep surface
        master=master,
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "false",
        },
    )
    try:
        import pandas as pd

        bench = spark.createDataFrame(
            pd.DataFrame([(900, BENCH_SPAN)], columns=["doc_id", "text"])
        )
        cfg = CorpusPrepConfig(
            lang="und",  # synthetic vocab carries no language markers
            min_tokens=5,
            neardup_threshold=0.4,
            bucket_cap=64,
            decontam_ngram=8,
            line_dedup_words=3,
            # r05: the two newest quality axes ride the composition.
            # Thresholds are chosen to gate WITHOUT mass-dropping the
            # synthetic corpus: hash-token docs have near-zero word
            # repetition, and the unigram-LM floor sits well below the
            # 5k-vocabulary mean logprob (~ -log 5000 = -8.5).
            max_dup_word_frac=0.5,
            min_lm_logprob=-12.0,
            cap_per_source=200,
            pack_budget=2048,
            pack_groups=64,
        )
        for n in sizes:
            docs = gen_docs(spark, n).persist()
            n_in = docs.count()
            registry: list = []

            # prepare_corpus pins stage boundaries with EAGER
            # localCheckpoints — the stages execute inside the call —
            # so the honest e2e measurement wraps construction + the
            # packs action in ONE gated window. The follow-up corpus
            # count then reads the pinned table (~free) — recorded as
            # evidence the pin serves both outputs.
            stage_times: list = []

            def build_and_count():
                o = prepare_corpus(
                    docs,
                    bench,
                    cfg,
                    cache_registry=registry,
                    stage_times=stage_times,
                )
                return o, o["packs"].count()

            (out, packs), sec = gated(gate, build_and_count)
            n_out, sec_corpus = gated(gate, out["corpus"].count)
            rec = {
                "probe": "corpus_prep_e2e",
                "n": n,
                "docs_in": n_in,
                "docs_out": n_out,
                "pack_rows": packs,
                "sec": sec,
                "sec_corpus_only": sec_corpus,
                "docs_per_sec": round(n_in / sec, 1),
                "gate_wait_sec": round(gate.wait_s, 1),
                "master": master,
                "stage_sec": dict(stage_times),
                "stages": "line_dedup+quality+repetition+unigram_lm+"
                "dedup+neardup+cap+decontam+mask+split+pack",
            }
            line = json.dumps(rec)
            print(line, flush=True)
            out_fh.write(line + "\n")
            out_fh.flush()
            # unpersist frees the CacheManager entries (LSH
            # intermediates); checkpoint blocks are freed only when
            # the JVM GC collects the dropped RDD references — force
            # both collections so one size's ~6 pinned full-corpus
            # copies can't sit in block storage inside the NEXT
            # size's gated measurement window
            for df in registry:
                df.unpersist()
            registry.clear()
            del out  # the returned frames hold the checkpointed RDDs
            docs.unpersist()
            import gc as _gc

            _gc.collect()
            spark.sparkContext._jvm.System.gc()
    finally:
        spark.stop()
        out_fh.close()


if __name__ == "__main__":
    main()
