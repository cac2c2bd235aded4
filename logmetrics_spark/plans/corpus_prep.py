"""End-to-end training-corpus preparation plan.

Composes the engine's corpus operators into the batch job a
training-data pipeline actually runs over a raw document dump:

0. optional C4-style duplicate-span removal (line_dedup — rewrites
   text first so every downstream feature sees the final form),
1. quality + language filter (pure Catalyst exprs fused into the
   scan projection — one pass, no shuffle), then two optional
   quality axes (default off): Gopher-style repetition gates
   (dup_word_frac narrow; top_bigram_frac adds one bounded
   two-level groupBy) and the CCNet-style unigram-LM gate (mean
   token log-prob under the post-gate survivors' own unigram
   distribution — one skew-safe corpus aggregation + broadcast
   join),
2. exact dedup (hash groupBy, min-id keeper),
3. near-dup dedup (MinHash LSH pairs -> connected components ->
   min-id survivor per near-dup family), then an optional per-domain
   cap over the survivors (skew-safe sketch-then-exact top-k),
4. optional benchmark decontamination (broadcast n-gram set,
   :func:`~logmetrics_spark.functions.dedup.decontaminate`),
5. PII masking (typed placeholder tokens, per-doc counts),
6. deterministic train/val/test split (hash assignment — stable
   under corpus growth and re-runs),
7. greedy sequence packing per split (shard-then-pack,
   :func:`~logmetrics_spark.functions.sampling.pack_sequences`).

Scale shape: stages 1-2 are one scan + one shuffle; stage 3 is the
LSH plan (one banding shuffle + narrow pair explode + hashed-shingle
verify joins); stage 4 adds a broadcast semi-join + one bounded
groupBy; stages 5-6 are pure projections/filters (zero shuffle);
stage 7 is one Exchange per split. Nothing in the composition is
quadratic or collects to the driver; every knob that guards skew
(``bucket_cap``) or recall (``threshold``, ``n``) is surfaced.

Graft plan — the reference (a log-metrics pipeline) has no corpus
counterpart; this is the LLM-training-data surface of SURVEY.md §2.
"""

from __future__ import annotations

import dataclasses

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import dedup as D
from ..functions import sampling as S
from ..functions import text as T


@dataclasses.dataclass(frozen=True)
class CorpusPrepConfig:
    lang: str = "en"
    min_tokens: int = 5
    max_punct_ratio: float = 0.3
    neardup_threshold: float = 0.4
    bucket_cap: int | None = 64
    decontam_ngram: int = 8
    decontam_min_hits: int = 1
    # optional C4-style duplicate-span removal BEFORE everything else
    # (all downstream features/dedup see the rewritten text): newline
    # mode when line_dedup_delim is set, k-word mode when
    # line_dedup_words is set (mutually exclusive; both None = off)
    line_dedup_delim: str | None = None
    line_dedup_words: int | None = None
    # optional Gopher-style repetition gates (default off): drop docs
    # whose duplicate-word fraction / most-frequent-bigram fraction
    # exceed the threshold (boilerplate and repeated-phrase spam)
    max_dup_word_frac: float | None = None
    max_top_bigram_frac: float | None = None
    # optional CCNet-style unigram-LM gate (default off): drop docs
    # whose mean token log-prob under the POST-GATE survivors' own
    # unigram distribution falls outside [min, max] — low = rare
    # garble, high = template text whose tokens dominate the corpus
    min_lm_logprob: float | None = None
    max_lm_logprob: float | None = None
    # optional per-domain cap AFTER dedup (cap counts kept docs)
    cap_per_source: int | None = None
    source_col: str = "source"
    split_ratios: tuple[tuple[str, float], ...] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    )
    pack_budget: int = 2048
    pack_groups: int = 64


def prepare_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    cfg: CorpusPrepConfig = CorpusPrepConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_registry: list | None = None,
    stage_times: list | None = None,
) -> dict[str, DataFrame]:
    """Build and stage-materialize the prep plan; returns the output
    tables (see the pinning note below — the expensive stages run
    inside this call, the returned frames are cheap reads over the
    final pins).

    ``docs`` columns are preserved through every stage (filters and
    left-antis only drop rows), plus the added feature/split columns —
    EXCEPT when the optional line-dedup stage is enabled: it REWRITES
    ``text_col`` (documents are reassembled from surviving segments)
    and drops fully-deduplicated docs via an inner join, so downstream
    features and the output corpus see the rewritten text.
    Returns ``{"corpus": ..., "packs": ...}``:

    - ``corpus``: surviving docs with quality features, lang_pred,
      PII counts, and ``split`` — the table written partitioned by
      split. ``text_col`` holds the PII-MASKED text (the raw
      unmasked string is dropped at the masking stage — it must not
      reach the written corpus or the packing manifest). Feature
      columns reflect the CONFIGURED gates: ``dup_word_frac`` /
      ``top_bigram_frac`` / ``lm_logprob6`` appear only when their
      gate is set, and ``top_bigram_frac`` specifically requires
      ``max_top_bigram_frac`` (a dup-word-only gate runs the cheap
      narrow projection and does not produce the bigram column) —
      pin gate configs per corpus if downstream readers schema-merge
      across runs;
    - ``packs``: (id, grp, bin_id, n_tokens, split) sequence-packing
      manifest, packed independently PER SPLIT (a bin must never mix
      train and test docs).

    Stage boundaries whose frame feeds BOTH sides of a self-join (the
    gate score joins, the LSH pair probe, the cap/decontam joins, the
    corpus->packs fan-out) are pinned with an eager ``localCheckpoint``.
    Two distinct blowups force this, and ``persist`` alone only fixes
    the first:

    - *runtime*: each self-joining stage re-EXECUTES its entire
      upstream plan once per consumer, so execution cost multiplies
      per stage (2^stages) instead of adding;
    - *planning*: each DataFrame reference textually duplicates the
      upstream LOGICAL plan, so the tree Catalyst must analyze grows
      multiplicatively per stage even when runtime results are
      cached. The r05 probe caught the gated composition spending
      >10 minutes of single-threaded DRIVER CPU in TreeNode
      transforms at 100k docs — executors idle — after persist()
      had already fixed the runtime side.

    An eager ``localCheckpoint`` truncates lineage to the
    materialized partitions, so each stage is planned exactly once
    against a leaf node and executed exactly once into block-manager
    storage — the plan therefore MATERIALIZES STAGE BY STAGE during
    this call; the returned tables are cheap projections over the
    last pins. Pinned frames are appended to ``cache_registry`` when
    given; checkpoint storage is freed by the ContextCleaner once the
    caller drops the references (a plain ``unpersist`` loop is a safe
    no-op on them). On a multi-executor cluster prefer a reliable
    checkpoint or a parquet stage-write for the same boundaries —
    local checkpoints do not survive executor loss.

    ``stage_times``, when given, collects ``(stage_label, seconds)``
    per pin — each entry is the wall time since the PREVIOUS pin
    completed, so a stage's construction-time jobs (the components
    iteration, the LSH builds) are attributed to it; because pins are
    eager and sequential, the entries sum to the prep's wall time up
    to the last pin — the per-stage breakdown an operator wants from
    any production pipeline.
    """
    import time as _time

    _t_last = [_time.monotonic()]

    def _pin(df: DataFrame, label: str) -> DataFrame:
        # eager: under AQE a "lazy" checkpoint already executes its
        # shuffle stages at plan-build time, so laziness buys nothing —
        # while computing the checkpoint RDD AFTER its SQL execution
        # closes spams benign-but-alarming "non-existent accumulator"
        # errors from every task's metric update (observed 52/run on
        # the CLI job). Eager keeps each stage inside its own live
        # execution: clean metrics, same work, failures surface at the
        # stage that caused them.
        p = df.localCheckpoint(eager=True)
        if stage_times is not None:
            # delta since the previous pin, so stages that run their
            # own jobs during CONSTRUCTION (the components iteration
            # inside near_dup, the LSH builds) are attributed to the
            # stage that ran them, not silently dropped
            now = _time.monotonic()
            stage_times.append((label, round(now - _t_last[0], 3)))
            _t_last[0] = now
        if cache_registry is not None:
            cache_registry.append(p)
        return p

    # (0) optional C4-style duplicate-span removal — rewrites text, so
    # it runs FIRST: every downstream feature/fingerprint sees the
    # final text. Docs whose every segment was seen earlier vanish.
    if cfg.line_dedup_delim is not None or cfg.line_dedup_words is not None:
        if cfg.line_dedup_delim is not None and cfg.line_dedup_words is not None:
            raise ValueError("set line_dedup_delim OR line_dedup_words, not both")
        if cfg.line_dedup_delim == "":
            # an empty delimiter (mis-expanded shell var) must not
            # silently coerce to newline mode
            raise ValueError("line_dedup_delim must be a non-empty string")
        rebuilt = D.line_dedup(
            docs,
            id_col,
            text_col,
            delim=cfg.line_dedup_delim if cfg.line_dedup_delim is not None else "\n",
            words_per_segment=cfg.line_dedup_words,
        ).select(id_col, text_col)
        docs = docs.drop(text_col).join(rebuilt, id_col)
    # (1) quality + lang gate: one fused projection
    feat = T.with_lang_id(T.with_quality_features(docs, text_col), text_col)
    kept = feat.filter(
        (F.col("lang_pred") == cfg.lang)
        & (F.col("n_tokens") >= cfg.min_tokens)
        & (F.col("punct_ratio") <= cfg.max_punct_ratio)
    )
    # (1b) optional repetition gate: dup_word_frac is a narrow array
    # expression (rides the same projection); top_bigram_frac adds
    # with_repetition_features' bounded two-level bigram groupBy
    if cfg.max_dup_word_frac is not None or cfg.max_top_bigram_frac is not None:
        # the bigram mode joins its aggregate back on id — `kept`
        # feeds both join sides, so pin it first. A dup_word_frac-only
        # gate is a pure narrow projection: no bigram machinery, no
        # pin, no top_bigram_frac column
        need_bigrams = cfg.max_top_bigram_frac is not None
        if need_bigrams:
            kept = _pin(kept, "pre_repetition")
        kept = T.with_repetition_features(
            kept, text_col, id_col, include_bigrams=need_bigrams
        )
        if cfg.max_dup_word_frac is not None:
            kept = kept.filter(F.col("dup_word_frac") <= cfg.max_dup_word_frac)
        if cfg.max_top_bigram_frac is not None:
            kept = kept.filter(F.col("top_bigram_frac") <= cfg.max_top_bigram_frac)
    # (1c) optional unigram-LM gate: scores are computed over the
    # post-gate survivors (the distribution a CCNet pass would fit on
    # the cleaned corpus), then joined back on id — one skew-safe
    # aggregation pass (per-doc token counts pre-reduce before any
    # join touches the Zipf-skewed token key)
    if cfg.min_lm_logprob is not None or cfg.max_lm_logprob is not None:
        # the LM score join consumes `kept` three ways (token counts,
        # vocabulary, and the join's left side) — pin it first
        kept = _pin(kept, "pre_unigram_lm")
        lm = T.unigram_lm_scores(kept, id_col, text_col).select(
            id_col, "lm_logprob6"
        )
        kept = kept.join(lm, id_col)
        if cfg.min_lm_logprob is not None:
            kept = kept.filter(F.col("lm_logprob6") >= cfg.min_lm_logprob)
        if cfg.max_lm_logprob is not None:
            kept = kept.filter(F.col("lm_logprob6") <= cfg.max_lm_logprob)
    # (2) exact dedup, min-id keeper. Pin the survivors: the LSH stage
    # persists its own shingle/signature intermediates, but `kept`
    # itself is still read twice (shingling + dedup_near_keep's left
    # side), and everything upstream of here re-runs per read
    kept = _pin(D.dedup_keep(kept, id_col, text_col), "exact_dedup")
    # (3) near-dup dedup over the survivors
    pairs = D.minhash_lsh_pairs(
        kept,
        cfg.neardup_threshold,
        id_col,
        text_col,
        bucket_cap=cfg.bucket_cap,
        cache_registry=cache_registry,
    )
    # near_keep's survivor anti-join, the cap's threshold semi-join,
    # and decontamination's hit anti-join each read their input twice;
    # pinning each stage output keeps the chain additive (2^stages
    # re-evaluation otherwise — the re-runs hit the persisted LSH
    # intermediates but still repeat the banding groupBy and verify
    # joins per consumer)
    kept = _pin(D.dedup_near_keep(kept, pairs, id_col), "near_dup")
    # (3b) optional per-domain cap over the dedup survivors (skew-safe
    # sketch-then-exact top-k — see sampling.cap_per_group)
    if cfg.cap_per_source is not None:
        kept = _pin(
            S.cap_per_group(kept, cfg.source_col, cfg.cap_per_source, id_col),
            "domain_cap",
        )
    # (4) benchmark decontamination (optional)
    if benchmark is not None:
        kept = _pin(
            D.decontaminate(
                kept,
                benchmark,
                id_col,
                text_col,
                n=cfg.decontam_ngram,
                min_hits=cfg.decontam_min_hits,
            ),
            "decontaminate",
        )
    # (5) PII mask + (6) split: pure projections. The masked text
    # REPLACES text_col — the raw unmasked string must not survive
    # into the split/pack stages or the written corpus (a "prepared"
    # corpus that still carries every email/phone/IP in a sibling
    # column has not been scrubbed). Per-pattern counts remain as
    # detection telemetry.
    kept = (
        T.with_pii_masked(kept, text_col)
        .withColumn(text_col, F.col("masked_text"))
        .drop("masked_text")
    )
    # corpus feeds both the returned table and the packing manifest;
    # pinning it stops the PII-regex pass from running once per reader
    corpus = _pin(S.with_split(kept, dict(cfg.split_ratios), id_col), "mask_split")
    # (7) pack per split — bins must not straddle splits, so split is
    # an extra packing-shard key: ONE applyInPandas pass over all
    # splits. (A filter-then-pack loop per split recomputes the whole
    # upstream corpus plan — dedup included — once per split: measured
    # 97.8s vs 18.9s for one corpus pass at 20k docs.)
    packs = S.pack_sequences(
        corpus,
        budget=cfg.pack_budget,
        n_groups=cfg.pack_groups,
        id_col=id_col,
        text_col=text_col,
        extra_group_cols=["split"],
    )
    return {"corpus": corpus, "packs": packs}
