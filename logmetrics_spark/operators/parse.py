"""Parse stage: pages -> matched log lines with capture-group columns.

Reimplements (Spark-first) the reference's tail/extract path
(``logtail.go:66-156``): line split, 2048-byte long-line guard,
multi-regex first-match capture extraction with the arity contract,
filename(url)-derived capture groups appended after the line groups,
and the ``line_read / line_matched / byte_read`` counters.

Physical design:

- line split + length guard + url filter are native Catalyst exprs
  (whole-stage codegen, pushdown-friendly);
- the multi-pattern first-match capture extraction is the one
  genuinely regex-suite-shaped step -> a vectorized pandas/Arrow UDF
  using ``pandas.Series.str.extract`` per pattern over the
  still-unmatched remainder (first-match-wins order preserved,
  ``logtail.go:124-140``), no per-row Python;
- the event-time parse is native ``to_timestamp`` (JVM) with the Go
  layout translated at config-compile time; the rfc3164 missing-year
  patch (``datapool.go:132-136``) is a native ``make_timestamp`` with
  the config's deterministic ``default_year``.

Output columns: ``url, warc_ts, lang, line_no, line, g0..gN`` (g0 =
full match), plus ``event_ts`` timestamp.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..config import LogGroup
from ..regexc import go_layout_to_java

# observation names (≈ logtail.go:52-64 internal stats)
OBS_LINES = "tail_lines"
OBS_MATCHED = "tail_matched"


def _make_extract_udf(patterns: tuple[str, ...]):
    """Vectorized first-match multi-regex extraction.

    Returns ``array<string>`` of [full_match, g1..gN] or null when no
    pattern matches (the implicit arity filter: a match always yields
    exactly N+1 groups because group counts are config-validated).
    """

    @F.pandas_udf(ArrayType(StringType()))
    def extract(lines: pd.Series) -> pd.Series:
        result = pd.Series([None] * len(lines), index=lines.index, dtype=object)
        pending = lines
        for pat in patterns:
            if pending.empty:
                break
            # wrap to capture the full match as group 0
            wrapped = f"({pat})"
            ext = pending.str.extract(wrapped, expand=True)
            hit = ext[0].notna()
            if hit.any():
                sub = ext.loc[hit].astype(object)
                filled = sub.where(sub.notna(), "")
                result.loc[hit[hit].index] = pd.Series(
                    filled.values.tolist(), index=filled.index, dtype=object
                )
                pending = pending.loc[~hit]
        return result

    return extract


def split_lines(pages: DataFrame, lg: LogGroup) -> DataFrame:
    """pages -> one row per text line (native split/posexplode)."""
    df = pages
    if lg.url_match:
        df = df.filter(F.col("url").rlike(lg.url_match))
    df = df.select(
        "url",
        "warc_ts",
        "lang",
        F.posexplode(F.split(F.col("text"), "\n")).alias("line_no", "line"),
    )
    # long-line guard (logtail.go:86,96-122: lines at the cap are dropped)
    return df.filter(F.length("line") < lg.max_line_size)


def extract_matches(lines_df: DataFrame, lg: LogGroup, observe: bool = True) -> DataFrame:
    """lines -> matched rows with g0..gN string columns."""
    if observe:
        lines_df = lines_df.observe(
            OBS_LINES,
            F.count(F.lit(1)).alias("line_read"),
            F.sum(F.length("line")).alias("byte_read"),
        )
    extract = _make_extract_udf(lg.regexes)
    df = lines_df.withColumn("m", extract(F.col("line")))
    df = df.filter(F.col("m").isNotNull())  # arity predicate (logtail.go:129)
    if observe:
        df = df.observe(OBS_MATCHED, F.count(F.lit(1)).alias("line_matched"))

    cols = [F.col("m").getItem(i).alias(f"g{i}") for i in range(lg.expected_matches + 1)]
    # filename(url)-derived groups appended after line groups (logtail.go:131-134)
    n_extra = 0
    if lg.filename_match:
        import re as _re

        n_extra = _re.compile(lg.filename_match).groups
        for j in range(1, n_extra + 1):
            cols.append(
                F.regexp_extract(F.col("url"), lg.filename_match, j).alias(
                    f"g{lg.expected_matches + j}"
                )
            )
    return df.select("url", "warc_ts", "lang", "line_no", *cols)


def with_event_ts(df: DataFrame, lg: LogGroup) -> DataFrame:
    """Parse the configured date group into ``event_ts`` (native JVM).

    ``date.position == -1`` uses the source ``warc_ts`` directly.
    Rows whose date fails to parse are dropped (the reference drops
    the line, ``datapool.go:126-129``).
    """
    if lg.date.position < 0:
        return df.withColumn("event_ts", F.col("warc_ts"))

    raw: Column = F.regexp_replace(F.col(f"g{lg.date.position}"), " +", " ")
    java_fmt = go_layout_to_java(lg.date.go_format)
    # try_to_timestamp: malformed dates yield null (then dropped) even
    # under ANSI mode, matching the reference's drop-the-line behavior.
    ts = F.try_to_timestamp(raw, F.lit(java_fmt))
    if not lg.date.has_year:
        # rfc3164: no year in the layout -> patch in the configured year
        year = lg.default_year if lg.default_year is not None else 1970
        ts = F.make_timestamp(
            F.lit(year), F.month(ts), F.dayofmonth(ts),
            F.hour(ts), F.minute(ts), F.second(ts),
        )
    df = df.withColumn("event_ts", ts)
    return df.filter(F.col("event_ts").isNotNull())


def parse_stage(pages: DataFrame, lg: LogGroup, observe: bool = True) -> DataFrame:
    """Full parse stage: pages -> matched lines with groups + event_ts."""
    return with_event_ts(extract_matches(split_lines(pages, lg), lg, observe), lg)
