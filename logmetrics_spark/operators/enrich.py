"""Enrich stage: broadcast lookup-table join (north_star extension).

The reference's nearest analogs are literal tags (``config.go:441``)
and filename-derived groups (``logtail.go:131-134``); the graft adds
"enrich matched fields via broadcast lookup tables": a left
broadcast-hash equi-join of the matched lines against a small
dimension table, whose columns then become additional tags (merged
into the same alphabetically-sorted tag namespace).

Explicit ``F.broadcast`` — at 100 TB the fact side must never shuffle
for a 100-row dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import LogGroup


def enrich_stage(
    matched: DataFrame, lg: LogGroup, lookup: DataFrame | None
) -> tuple[DataFrame, dict[str, Column]]:
    """Returns (joined df, extra tag columns to merge into the tag set).

    ``lookup`` schema: first column is the join key (e.g. ``host``),
    every other column becomes a tag named after the column.
    """
    if lookup is None or lg.lookup is None:
        return matched, {}
    key_col = lookup.columns[0]
    tag_cols = [c for c in lookup.columns[1:]]
    joined = matched.join(
        F.broadcast(lookup),
        matched[f"g{lg.lookup_key_position}"] == lookup[key_col],
        "left",
    ).drop(key_col)
    extra = {c: F.coalesce(F.col(c), F.lit("unknown")) for c in tag_cols}
    return joined, extra
