"""Text-analysis operators over a documents/pages table.

Large-scale training-data pipeline primitives (graft requirement):
language-ID, quality scoring, token counting, document fingerprinting.
Every operator is a pure Catalyst expression (whole-stage codegen, no
UDF) built ONLY from functions with exact DuckDB equivalents, so each
has an ANSI-SQL oracle in ``__spark_entry__.oracle_sql``.

Portability conventions (Spark <-> DuckDB):

- "count of regex occurrences" is expressed as
  ``(length(x) - length(regexp_replace(x, pat, ''))) / len(repl_unit)``
  -> identical in DuckDB with the 'g' flag;
- tokenization collapses ALL whitespace runs to single spaces first
  (``trim(regexp_replace(x, '\\s+', ' '))``) then splits on ' ': both
  engines' bare ``trim`` strips only 0x20, so tab/newline edges would
  otherwise emit phantom empty tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small per-language stopword marker sets (token-membership heuristic)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "fr": ["le", "la", "et", "est"],
    "de": ["der", "die", "und", "ist"],
    "es": ["el", "los", "que", "es"],
}
STOPWORDS_EN = ["the", "a", "of", "and", "is", "to", "in"]


def ws_norm(col: Column) -> Column:
    """Whitespace-safe normalize: collapse runs to single spaces, then
    strip edges (trim alone strips only 0x20 in Spark AND DuckDB, so
    tab/newline edges survive a bare trim+split)."""
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def token_count(col: Column) -> Column:
    """Whitespace token count with empty-string guard."""
    t = ws_norm(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, " "))
    ).cast("long")


# GPT-2-style pre-tokenizer pattern, restricted to constructs RE2 and
# Java regex implement identically (no lookahead — RE2 has none):
# contraction suffixes, space-prefixed letter runs, space-prefixed
# digit runs, space-prefixed punctuation runs, whitespace runs.
# the punctuation class keeps the apostrophe (as GPT-2's does): the
# contraction alternation wins first where it applies, and bare
# apostrophes (possessive plurals, quoted text) must still count
BPE_TOKEN_RE = r"(?:'(?:[sdmt]|ll|ve|re))| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_count(col: Column) -> Column:
    """BPE-ish subword-boundary token count (the training-data-pipeline
    estimator: counts pre-tokenizer pieces, the quantity BPE vocab
    merges operate on). Same regex string runs in DuckDB:
    len(regexp_extract_all(text, pattern))."""
    return F.when(F.length(col) == 0, F.lit(0)).otherwise(
        F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), F.lit(0)))
    ).cast("long")


def occurrence_count(col: Column, pattern: str) -> Column:
    """Occurrences of a 1-char-class regex. r06: regexp_count replaces
    the length-difference trick (regexp_replace allocated a stripped
    copy of every row); for a 1-char class each match is exactly one
    char, so the count is identical. The DuckDB oracles keep the
    length-difference form (their regexp_count predates the 'g' flag
    contract) — values are equal by construction."""
    return F.regexp_count(col, F.lit(pattern)).cast("long")


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens (shared by lang-ID / stopword
    scoring — ONE split instead of one regex pass per marker word)."""
    return F.split(ws_norm(F.lower(col)), " ")


def word_hits(toks: Column, words: list[str]) -> Column:
    """Count of tokens equal to any of ``words`` (native array filter,
    no regex; DuckDB mirror: len(list_filter(toks, t -> t IN (...)))."""
    wset = set(words)
    return F.size(F.filter(toks, lambda t: t.isin(*wset))).cast("long")


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, ratios (length/punct/stopword)."""
    c = F.col(text_col)
    n_chars = F.length(c).cast("long")
    # n_tokens via the LOWERED normalization (value-identical: lower()
    # preserves whitespace, so the token count is the same) so the
    # ws_norm(lower(text)) subtree is shared with the stopword tokens
    # below by codegen subexpression elimination — one \s+ regex pass
    # instead of two (r06)
    lowered = ws_norm(F.lower(c))
    n_tokens = (
        F.when(F.length(lowered) == 0, F.lit(0))
        .otherwise(F.size(F.split(lowered, " ")))
        .cast("long")
    )
    punct = occurrence_count(c, r"[\.,;:!\?]")
    digits = occurrence_count(c, r"[0-9]")
    stop_hits = word_hits(F.split(lowered, " "), STOPWORDS_EN)  # one split, no regex
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "avg_token_len",
            F.round(
                F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(0.0), 6
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(F.when(n_chars > 0, punct / n_chars).otherwise(0.0), 6),
        )
        .withColumn(
            "digit_ratio",
            F.round(F.when(n_chars > 0, digits / n_chars).otherwise(0.0), 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(0.0), 6),
        )
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: argmax of per-language marker-token
    counts, deterministic tiebreak by language code, 'und' when all
    zero. ONE tokenize + one array filter per language (v1 ran 16
    regexp_replace passes per row — the slowest headline query after
    parse; token membership is also the cleaner heuristic: adjacent
    markers no longer shadow each other's shared spaces)."""
    c = F.col(text_col)
    langs = sorted(LANG_MARKERS)  # priority order on ties: alphabetical
    # materialize the token ARRAY as a column first (r06): the four
    # per-language score expressions each referenced the inline
    # lower+collapse+split chain, and codegen does not always collapse
    # the common subtree across separate projections — one split
    # feeds all four filters via the _toks column
    # (then the per-language scores as columns: the argmax CASE chain
    # references each score ~2x|langs| times, and inline expressions
    # re-evaluate per reference — see dedup.shingles)
    with_toks = df.withColumn("_toks", tokens(c))
    scored = with_toks.withColumns(
        {f"_s_{lang}": word_hits(F.col("_toks"), LANG_MARKERS[lang]) for lang in langs}
    )
    scores = {lang: F.col(f"_s_{lang}") for lang in langs}
    # CASE chain (portable argmax): first lang in priority order whose
    # score is maximal and nonzero
    expr = F.lit("und")
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs:
            if other != lang and langs.index(other) < langs.index(lang):
                cond = cond & (scores[lang] > scores[other])
            elif other != lang:
                cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return scored.withColumn("lang_pred", expr).drop(
        "_toks", *[f"_s_{lang}" for lang in langs]
    )


ROLL_B = 257
ROLL_M = 1_000_000_007  # fits the fold in int64: acc*B + cp < 2^40


def rolling_fingerprint(col: Column) -> Column:
    """Rabin-Karp polynomial rolling hash over the normalized text's
    codepoints: h = fold(h * B + cp) mod M. The windowed/streaming
    fingerprint primitive (content-defined chunking, winnowing) in its
    whole-document form; exact DuckDB mirror via list_reduce."""
    norm = ws_norm(F.lower(col))
    fold = F.aggregate(
        F.split(norm, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLL_B + F.ascii(c)) % ROLL_M,
    )
    return F.when(F.length(norm) == 0, F.lit(0).cast("long")).otherwise(fold)


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase
    text (exact-dedup key)."""
    norm = ws_norm(F.lower(F.col(text_col)))
    return df.withColumn("fingerprint", F.md5(norm))


# PII patterns restricted to constructs RE2 (DuckDB) and Java regex
# (Spark) implement identically: ASCII classes, bounded repetition,
# \b word boundaries (both engines: ASCII boundary on these classes).
# No lookahead (RE2 has none), no backreferences.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# masking order matters and is part of the contract: email first (an
# address with a numeric host would otherwise leave its digits to the
# IP pass), then phone, then IP. Replacement tokens contain no digits,
# so earlier passes cannot create later-pass matches.
_PII_PASSES: list[tuple[str, str, str]] = [
    ("n_emails", PII_EMAIL_RE, "<EMAIL>"),
    ("n_phones", PII_PHONE_RE, "<PHONE>"),
    ("n_ips", PII_IP_RE, "<IP>"),
]


def _match_count(col: Column, pattern: str) -> Column:
    """Occurrences of an arbitrary (variable-length) regex — the
    length-difference trick only works for 1-char classes. Empty-string
    guard keeps the DuckDB mirror exact
    (len(regexp_extract_all(x, pat))). r06: regexp_count replaces
    size(regexp_extract_all) — same non-overlapping match count, no
    per-row match-string array materialized."""
    return (
        F.when(F.length(col) == 0, F.lit(0))
        .otherwise(F.regexp_count(col, F.lit(pattern)))
        .cast("long")
    )


def with_pii_masked(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for web-corpus training data: mask emails, phone
    numbers, and IPv4 addresses with typed placeholder tokens, and
    report per-document match counts. Counts are measured on the INPUT
    text per pattern (detection telemetry), masking is sequential
    (email -> phone -> IP) on the running masked string. Pure Catalyst
    (regexp_replace / regexp_extract_all), no UDF; graft requirement —
    no reference counterpart."""
    c = F.col(text_col)
    masked = c
    out = df
    for count_col, pattern, token in _PII_PASSES:
        out = out.withColumn(count_col, _match_count(c, pattern))
        masked = F.regexp_replace(masked, pattern, token)
    return out.withColumn("masked_text", masked)


def with_repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_bigrams: bool = True,
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    public paper): per document,

    - ``dup_word_frac``   = 1 - distinct_tokens / n_tokens (the
      complement of the type-token ratio; high = boilerplate/spam),
    - ``top_bigram_frac`` = occurrences of the most frequent word
      bigram / total bigrams (high = repeated-phrase loops).

    Scale shape: the token-level stats are narrow array expressions
    fused into the scan projection (zero shuffle); the bigram mode is
    the one part that genuinely needs an aggregation — explode bigrams
    -> two-level groupBy (map-side partial combine on (id, bigram)) ->
    per-id max, joined back on the id. Linear in total tokens, never
    quadratic in document length (the naive per-row
    transform(distinct, count) is O(|bigrams|^2) per doc — wrong for
    web pages with 10^4+ tokens).

    ``include_bigrams=False`` skips the bigram aggregation AND the
    join back entirely (no ``top_bigram_frac`` column): a caller that
    only gates on ``dup_word_frac`` gets a pure narrow projection —
    zero shuffle — instead of paying the explode + two shuffles + join
    for a column it discards."""
    c = F.col(text_col)
    # n_tokens from the LOWERED normalization (value-identical —
    # lower() preserves whitespace) so the ws_norm(lower) subtree is
    # shared with the token array instead of a second \s+ pass (r06;
    # same trick as with_quality_features)
    lowered = ws_norm(F.lower(c))
    toks = F.split(lowered, " ")
    n_tokens = (
        F.when(F.length(lowered) == 0, F.lit(0)).otherwise(F.size(toks)).cast("long")
    )
    base = df.withColumn("_toks", toks).withColumn("n_tokens", n_tokens).withColumn(
        "dup_word_frac",
        F.round(
            F.when(
                n_tokens > 0,
                1.0 - F.size(F.array_distinct(F.col("_toks"))) / n_tokens.cast("double"),
            ).otherwise(0.0),
            6,
        ),
    )
    if not include_bigrams:
        return base.drop("_toks")

    # Bigram stats (r06, guide §4.2): the v1 plan exploded a concat-
    # built bigram string per token pair and ran two groupBy shuffles
    # ((id, bigram) then (id)) before joining back. But max-bigram-
    # count and bigram-total are PER-DOCUMENT quantities — one
    # mapInArrow pass over the JVM-normalized text computes them with
    # a per-doc Counter and emits only integers (id, max_bg, n_bg):
    # zero shuffle, no bigram strings ever materialized, and the float
    # division + round stay in the JVM exactly as before, so values
    # are bit-identical. Python tokenization is a plain split(' ')
    # because the JVM already collapsed whitespace runs (ws_norm).
    import pyarrow as pa

    def bg_gen(batches):
        schema = pa.schema(
            [("id", pa.int64()), ("_max_bg", pa.int64()), ("_n_bg", pa.int64())]
        )
        for batch in batches:
            ids = batch.column("id").to_pylist()
            texts = batch.column("_norm").to_pylist()
            out_id: list[int] = []
            out_max: list[int] = []
            out_n: list[int] = []
            for i, s in zip(ids, texts):
                if s is None:
                    continue
                toks = s.split(" ")
                if len(toks) < 2:
                    continue  # v1: where(size >= 2) left these null
                counts: dict[tuple[str, str], int] = {}
                prev = toks[0]
                for t in toks[1:]:
                    key = (prev, t)
                    counts[key] = counts.get(key, 0) + 1
                    prev = t
                out_id.append(i)
                out_max.append(max(counts.values()))
                out_n.append(len(toks) - 1)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, pa.int64()),
                    pa.array(out_max, pa.int64()),
                    pa.array(out_n, pa.int64()),
                ],
                schema=schema,
            )

    spread = df.sparkSession.sparkContext.defaultParallelism
    bg = (
        df.select(
            F.col(id_col).cast("long").alias("id"),
            ws_norm(F.lower(c)).alias("_norm"),
        )
        .repartition(spread)
        .mapInArrow(bg_gen, "id long, _max_bg long, _n_bg long")
        .withColumnRenamed("id", id_col)
    )
    return (
        base.join(bg, id_col, "left")
        .withColumn(
            "top_bigram_frac",
            F.round(
                F.coalesce(F.col("_max_bg").cast("double") / F.col("_n_bg"), F.lit(0.0)), 6
            ),
        )
        .drop("_toks", "_max_bg", "_n_bg")
    )


def corpus_clean(
    df: DataFrame,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    lang: str = "en",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The composed cleaning pass a training pipeline actually runs:
    quality features + language-ID + thresholds, then exact dedup
    (keeper = min id) over the SURVIVORS. One scan feeds all the
    filter features (pure Catalyst exprs — they fuse into the scan
    projection), and the only shuffle is the dedup groupBy."""
    from .dedup import dedup_keep

    feat = with_lang_id(with_quality_features(df, text_col), text_col)
    kept = feat.filter(
        (F.col("lang_pred") == lang)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
    )
    return dedup_keep(kept, id_col, text_col).select(id_col, "n_tokens")


def unigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style language-model quality signal: per-document mean
    log-probability of its tokens under the CORPUS'S OWN unigram
    distribution. Boilerplate/template text scores high (its tokens
    dominate the corpus), rare-garble scores low — the corpus-level
    quality axis per-doc features (text_quality, text_repetition)
    cannot see, and the cheap stand-in for the external KenLM pass the
    CCNet pipeline runs. Returns (id, n_tokens, lm_logprob6).

    Scale shape (skew-safe): the raw token stream is pre-reduced to
    per-doc counts — groupBy(id, tok) — BEFORE anything joins on the
    Zipf-skewed token key. The (id, tok) shuffle key is NOT skewed (id
    spreads every stopword across the cluster), and everything
    downstream of it is bounded by DISTINCT (doc, token) pairs, not
    token occurrences: the vocabulary count is a groupBy(tok) SUM of
    the per-doc partials (map-side combine absorbs "the"), and the
    join back on tok carries one row per (doc, token) — the hot key's
    row count is bounded by the number of docs containing it, smaller
    than the occurrence stream by the in-doc repetition factor. The
    identical doc_tok shuffle feeds both join sides, so ReuseExchange
    scans the corpus once. A 1-row total broadcast (lazy — no driver
    collect) closes the plan; the per-doc logprob is the exact
    occurrence-weighted mean sum(c_doc·log p)/sum(c_doc). Rounded to
    6dp so float summation order (Spark partial aggs vs the
    sequential oracle) cannot leak into equality — weighted sums of
    ~60 tokens carry ~1e-13 absolute error against a 1e-6 grid."""
    # Per-doc pre-reduce in ONE mapInArrow kernel (r06, guide §4.2):
    # the (id, tok) -> c_doc table used to be explode(tokens) + a
    # groupBy(id, tok) shuffle of the full occurrence stream; the
    # counts are per-document, so the kernel emits the already-reduced
    # rows directly — no explode, no occurrence-granularity shuffle.
    # Normalization (lower + whitespace collapse) stays in the JVM;
    # Python splits on the collapsed single spaces. The table is
    # persisted because both the vocabulary aggregation and the
    # join-back consume it (the v1 plan shared the (id, tok) exchange
    # via ReusedExchange; a lazy persist is the kernel-output
    # equivalent — materialized at first action, LRU-evictable,
    # cleared by the bench between runs). Skew contract unchanged:
    # nothing downstream touches the token key at occurrence
    # granularity (pinned by tests/test_functions.py's skew pin).
    import pyarrow as pa

    def doc_tok_gen(batches):
        schema = pa.schema(
            [("id", pa.int64()), ("tok", pa.string()), ("c_doc", pa.int64())]
        )
        for batch in batches:
            ids = batch.column("id").to_pylist()
            texts = batch.column("_norm").to_pylist()
            out_id: list[int] = []
            out_tok: list[str] = []
            out_c: list[int] = []
            for i, s in zip(ids, texts):
                if s is None:
                    continue
                counts_d: dict[str, int] = {}
                for t in s.split(" "):
                    if t:
                        counts_d[t] = counts_d.get(t, 0) + 1
                out_id.extend([i] * len(counts_d))
                out_tok.extend(counts_d.keys())
                out_c.extend(counts_d.values())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, pa.int64()),
                    pa.array(out_tok, pa.string()),
                    pa.array(out_c, pa.int64()),
                ],
                schema=schema,
            )

    spread = docs.sparkSession.sparkContext.defaultParallelism
    doc_tok = (
        docs.select(
            F.col(id_col).cast("long").alias("id"),
            ws_norm(F.lower(F.col(text_col))).alias("_norm"),
        )
        .repartition(spread)
        .mapInArrow(doc_tok_gen, "id long, tok string, c_doc long")
        .persist()
    )
    counts = doc_tok.groupBy("tok").agg(F.sum("c_doc").alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    return (
        doc_tok.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.sum("c_doc").alias("n_tokens"),
            F.round(
                F.sum(F.col("c_doc") * F.log(F.col("c") / F.col("total")))
                / F.sum("c_doc"),
                6,
            ).alias("lm_logprob6"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "lm_logprob6")
    )
