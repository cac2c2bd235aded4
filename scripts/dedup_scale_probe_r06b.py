"""Re-run the r04 INCREMENTAL scale scenarios (minhash + embedding
index probe, 300k/1M corpora, identical generators) against the r06
index builders, whose internal persist shares the corpus kernel pass
between the entries and verify legs.

Unlike the r04 originals these measurements run behind the shared
bench ThrottleGate (probe_gate) — an ungated first attempt of this
script recorded rows up to 5x apart for identical code across epochs
(paired A/B interleaving showed no code-attributable difference;
pair counts were identical in every run). Results APPEND to
BENCH/DEDUP_SCALE_r06.json with ``gate_wait_sec``; the r04 rows in
BENCH/DEDUP_SCALE_r04.json are the comparison baseline and stay
untouched.

Usage: PROBE_PHASE=incremental|emb_inc|all python scripts/dedup_scale_probe_r06b.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dedup_scale_probe import _probe_session, gen_docs, gen_embeddings
from dedup_scale_probe_r04 import gen_batch, gen_emb_batch
from logmetrics_spark.functions import dedup as D
from probe_gate import gated, make_gate

OUT = "BENCH/DEDUP_SCALE_r06.json"


def emit(rec: dict, out_fh) -> None:
    line = json.dumps(rec, default=int)
    print(line, flush=True)
    out_fh.write(line + "\n")
    out_fh.flush()


def probe_incremental(spark, gate, out_fh, m: int = 100_000) -> None:
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

        (entries, shh, n_entries, n_shh), sec_index = gated(gate, build_index)
        pairs = D.minhash_lsh_incremental_pairs(batch, (entries, shh), 0.4)
        n_pairs, sec_inc = gated(gate, pairs.count)
        emit(
            {"probe": "incremental", "n_corpus": n_corpus, "n_batch": m,
             "index_entries": n_entries, "index_shingle_rows": n_shh,
             "sec_index_build": sec_index, "sec_incremental": sec_inc,
             "pairs": n_pairs, "gate_wait_sec": round(gate.wait_s, 1)},
            out_fh,
        )
        for df in (entries, shh, batch, docs):
            df.unpersist()
        spark.catalog.clearCache()


def probe_emb_incremental(spark, gate, out_fh, m: int = 100_000) -> None:
    for n_corpus in (300_000, 1_000_000):
        n_planes, n_bands = D.emb_lsh_plan(n_corpus)
        emb = gen_embeddings(spark, n_corpus, viral=False).persist()
        emb.count()
        batch = gen_emb_batch(spark, n_corpus, m).persist()
        batch.count()

        def build_index():
            entries, sig = D.embedding_index(emb, n_planes=n_planes, n_bands=n_bands)
            entries = entries.persist()
            sig = sig.persist()
            return entries, sig, entries.count(), sig.count()

        (entries, sig, n_entries, n_sig), sec_index = gated(gate, build_index)
        pairs = D.embedding_incremental_pairs(
            batch, (entries, sig), 0.95, n_planes=n_planes, n_bands=n_bands
        )
        n_pairs, sec_inc = gated(gate, pairs.count)
        emit(
            {"probe": "emb_incremental", "n_corpus": n_corpus, "n_batch": m,
             "width": n_planes // n_bands, "n_bands": n_bands,
             "index_entries": n_entries, "index_sig_rows": n_sig,
             "sec_index_build": sec_index, "sec_incremental": sec_inc,
             "pairs": n_pairs, "gate_wait_sec": round(gate.wait_s, 1)},
            out_fh,
        )
        for df in (entries, sig, batch, emb):
            df.unpersist()
        spark.catalog.clearCache()


def main() -> None:
    phase = os.environ.get("PROBE_PHASE", "all")
    gate = make_gate()
    out_fh = open(OUT, "a")
    try:
        if phase in ("all", "incremental"):
            spark = _probe_session()
            probe_incremental(spark, gate, out_fh, int(os.environ.get("PROBE_INC_M", 100_000)))
            spark.stop()
        if phase in ("all", "emb_inc"):
            spark = _probe_session()
            probe_emb_incremental(
                spark, gate, out_fh, int(os.environ.get("PROBE_INC_M", 100_000))
            )
            spark.stop()
    finally:
        out_fh.close()


if __name__ == "__main__":
    main()
