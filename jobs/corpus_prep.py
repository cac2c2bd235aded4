#!/usr/bin/env python
"""spark-submit entry point for the batch corpus-preparation job.

Usage:
  spark-submit --py-files logmetrics_spark.zip jobs/corpus_prep.py \
      --docs /path/to/raw_docs --out /path/to/prepared \
      [--benchmark /path/to/eval_sets] [--lang en] [--min-tokens 5] \
      [--neardup-threshold 0.4] [--bucket-cap 64] \
      [--decontam-ngram 8] [--pack-budget 2048] [--pack-groups 64] \
      [--shuffle-partitions N]

Runs quality/lang filtering, exact + near-dup dedup, optional
benchmark decontamination, PII masking, deterministic splitting, and
per-split sequence packing over a (doc_id long, text string) parquet
dump; writes ``<out>/corpus`` partitioned by split and
``<out>/packs`` (the context-window manifest). Every stage is lazy —
the two writes at the end are the only actions.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="raw docs parquet dir")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument(
        "--benchmark", default=None,
        help="eval-set parquet dir (doc_id, text) for decontamination",
    )
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-punct-ratio", type=float, default=0.3)
    ap.add_argument("--neardup-threshold", type=float, default=0.4)
    ap.add_argument(
        "--bucket-cap", type=int, default=64,
        help="viral-bucket candidate cap for the LSH pass (0 disables)",
    )
    ap.add_argument("--decontam-ngram", type=int, default=8)
    ap.add_argument(
        "--line-dedup-delim", default=None,
        help="enable C4-style duplicate-span removal, splitting on this "
        "literal delimiter (e.g. $'\\n')",
    )
    ap.add_argument(
        "--line-dedup-words", type=int, default=None,
        help="duplicate-span removal with fixed k-word segments "
        "(single-line corpora)",
    )
    ap.add_argument(
        "--max-dup-word-frac", type=float, default=None,
        help="Gopher repetition gate: drop docs whose duplicate-word "
        "fraction exceeds this",
    )
    ap.add_argument(
        "--max-top-bigram-frac", type=float, default=None,
        help="Gopher repetition gate: drop docs whose most-frequent-"
        "bigram fraction exceeds this",
    )
    ap.add_argument(
        "--min-lm-logprob", type=float, default=None,
        help="unigram-LM gate: drop docs whose mean token log-prob "
        "under the post-gate corpus is below this (rare garble)",
    )
    ap.add_argument(
        "--max-lm-logprob", type=float, default=None,
        help="unigram-LM gate: drop docs above this (template text)",
    )
    ap.add_argument(
        "--cap-per-source", type=int, default=None,
        help="keep at most N docs per --source-col group after dedup",
    )
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--pack-groups", type=int, default=64)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from logmetrics_spark.plans.corpus_prep import (
        CorpusPrepConfig,
        prepare_corpus,
    )

    builder = SparkSession.builder.appName("logmetrics_spark.corpus_prep")
    builder = builder.config("spark.sql.session.timeZone", "UTC")
    builder = builder.config("spark.sql.adaptive.enabled", "true")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.getOrCreate()

    docs = spark.read.parquet(args.docs)
    benchmark = spark.read.parquet(args.benchmark) if args.benchmark else None
    cfg = CorpusPrepConfig(
        lang=args.lang,
        min_tokens=args.min_tokens,
        max_punct_ratio=args.max_punct_ratio,
        neardup_threshold=args.neardup_threshold,
        bucket_cap=args.bucket_cap or None,
        decontam_ngram=args.decontam_ngram,
        line_dedup_delim=args.line_dedup_delim,
        line_dedup_words=args.line_dedup_words,
        max_dup_word_frac=args.max_dup_word_frac,
        max_top_bigram_frac=args.max_top_bigram_frac,
        min_lm_logprob=args.min_lm_logprob,
        max_lm_logprob=args.max_lm_logprob,
        cap_per_source=args.cap_per_source,
        source_col=args.source_col,
        pack_budget=args.pack_budget,
        pack_groups=args.pack_groups,
    )
    registry: list = []
    out = prepare_corpus(docs, benchmark, cfg, cache_registry=registry)
    corpus_dir = os.path.join(args.out, "corpus")
    packs_dir = os.path.join(args.out, "packs")
    out["corpus"].write.mode("overwrite").partitionBy("split").parquet(corpus_dir)
    out["packs"].write.mode("overwrite").parquet(packs_dir)
    for df in registry:
        df.unpersist()
    n = spark.read.parquet(corpus_dir).count()
    print(f"# prepared corpus: {n} docs under {corpus_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
