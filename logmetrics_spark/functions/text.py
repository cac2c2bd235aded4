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
    """Occurrences of a 1-char-class regex (length-difference trick —
    portable to DuckDB, unlike regexp_count)."""
    return (F.length(col) - F.length(F.regexp_replace(col, pattern, ""))).cast("long")


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
    n_tokens = token_count(c)
    punct = occurrence_count(c, r"[\.,;:!\?]")
    digits = occurrence_count(c, r"[0-9]")
    stop_hits = word_hits(tokens(c), STOPWORDS_EN)  # one split, no regex
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
    toks = tokens(c)
    langs = sorted(LANG_MARKERS)  # priority order on ties: alphabetical
    # materialize the per-language scores as columns FIRST: the argmax
    # CASE chain references each score ~2x|langs| times, and inline
    # expressions re-evaluate per reference (see dedup.shingles)
    scored = df.withColumns(
        {f"_s_{lang}": word_hits(toks, LANG_MARKERS[lang]) for lang in langs}
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
    return scored.withColumn("lang_pred", expr).drop(*[f"_s_{lang}" for lang in langs])


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
