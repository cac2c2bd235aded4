"""Deterministic corpus splitting & sampling (training-data ops).

A large-scale training pipeline needs reproducible, shuffle-free
assignment of documents to train/val/test splits and deterministic
(re-runnable, resume-safe) down-sampling. Both are pure Catalyst
expressions over the engine-wide md5 convention — no randomness, no
state, no UDFs; identical assignments in DuckDB/any ANSI engine, on
any cluster size, across reruns.

- :func:`with_split` — proportional split by hashing the DOC ID:
  u = md5_52(id) / 2^52 in [0, 1), compared against cumulative ratio
  thresholds. Assignment is independent of partitioning and corpus
  growth (a doc keeps its split when the corpus is extended — the
  property period-resampling schemes lack).
- :func:`stratified_sample` — per-stratum deterministic sampling:
  keep iff md5_52(stratum || '|' || id) / 2^52 < fraction. Salting the
  hash with the stratum decorrelates it from the split hash, so
  sampling composes with splitting without bias.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_52

_U_DENOM = float(1 << 52)


def _unit(col: Column) -> Column:
    """md5-derived uniform in [0, 1) from any column (cast to string)."""
    return md5_52(col.cast("string")) / F.lit(_U_DENOM)


def with_split(
    docs: DataFrame,
    ratios: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a ``split`` column by deterministic hash assignment.

    ``ratios`` maps split name -> proportion (need not sum to 1; the
    LAST split absorbs the remainder). Ordering of the thresholds is
    the dict's insertion order — part of the contract, keep it
    stable."""
    ratios = ratios or {"train": 0.9, "val": 0.05, "test": 0.05}
    u = _unit(F.col(id_col))
    names = list(ratios)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += ratios[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return docs.withColumn("split", expr)


def stratified_sample(
    docs: DataFrame,
    fraction: float,
    strata_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic ~``fraction`` sample WITHIN each stratum: filter
    on a stratum-salted hash uniform. Shuffle-free (a plain filter the
    optimizer can push), reproducible across runs/cluster sizes, and
    per-stratum proportions hold in expectation regardless of strata
    skew (each stratum is sampled from its own hash stream)."""
    u = _unit(F.concat_ws("|", F.col(strata_col), F.col(id_col).cast("string")))
    return docs.filter(u < F.lit(fraction))
