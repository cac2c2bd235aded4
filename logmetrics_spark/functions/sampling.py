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


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    n_groups: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_group_cols: list[str] | None = None,
) -> DataFrame:
    """Greedy sequence packing: assign each document to a fixed
    token-budget bin ("context window") — the corpus-assembly step
    between cleaning and tokenized training shards. Returns
    (id, grp, bin_id, n_tokens); (grp, bin_id) is the window key.

    ``extra_group_cols`` (string columns, e.g. ``["split"]``) become
    additional packing-shard keys, carried through to the output: a
    bin never mixes values of an extra key, and EVERY partition packs
    in the same single applyInPandas pass — the caller must never loop
    filter-then-pack per partition value, which would recompute the
    upstream plan once per value.

    Exact greedy packing is inherently sequential (each bin decision
    depends on the running fill), so the corpus is first sharded
    deterministically — grp = pmod(id, n_groups) — and packed greedily in
    id order WITHIN each group: a doc joins the current bin while
    fill + n_tokens <= budget, else opens a new bin (an over-budget
    doc gets a bin of its own; downstream truncation is the trainer's
    call). This shard-then-pack shape is how production packers
    parallelize: groups pack independently (one applyInPandas task
    each, the only shuffle), sequential cost is O(group size), and
    results are bit-stable across cluster sizes because neither the
    sharding (pure modulo) nor the in-group order (sort by id) depends
    on partitioning. Size n_groups ~ a small multiple of cluster
    parallelism so each group streams through one task; packing
    efficiency loss vs global greedy is O(1) windows per group.

    Token counts are the engine-wide whitespace contract
    (:func:`~logmetrics_spark.functions.text.token_count`), replayed
    exactly by the DuckDB oracle (recursive-CTE fold over the same
    order). Graft op: no reference counterpart."""
    import pandas as pd

    from .text import token_count

    extra = list(extra_group_cols or [])
    # pmod, not %: Spark's % is sign-preserving, so a negative id
    # would land in a NEGATIVE group — outside the documented
    # [0, n_groups) shard domain and diverging from the oracle's
    # non-negative fold (line_dedup guards its packing domain the
    # same way; here pmod is total, so no guard is needed)
    toks = docs.select(
        F.col(id_col),
        *[F.col(c) for c in extra],
        F.pmod(F.col(id_col), F.lit(n_groups)).alias("grp"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    out_cols = [id_col, *extra, "grp", "bin_id", "n_tokens"]

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        t = pdf["n_tokens"].to_numpy()
        bins = [0] * len(t)
        b = -1
        fill = 0
        for i, tok in enumerate(t):
            if b < 0 or fill + int(tok) > budget:
                b += 1
                fill = int(tok)
            else:
                fill += int(tok)
            bins[i] = b
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[out_cols]

    schema = ", ".join(
        [f"{id_col} long"]
        + [f"{c} string" for c in extra]
        + ["grp long", "bin_id long", "n_tokens long"]
    )
    return toks.groupBy("grp", *extra).applyInPandas(pack, schema=schema)


def cap_per_group(
    docs: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    quantile_grid: int = 1024,
    accuracy: int = 10_000,
) -> DataFrame:
    """Keep at most ``cap`` documents per group — the per-domain cap a
    webtext pipeline applies so no single host dominates the corpus
    (content farms and mirror sites can contribute 10^8+ pages).
    Deterministic winners: the ``cap`` SMALLEST ids per group, so the
    kept set is stable across reruns and cluster sizes and shrinks
    monotonically as cap tightens.

    Skew is the whole problem here (the hot domain IS the reason the
    op exists), so no row_number window — a window sorts each group in
    ONE task and the hot domain becomes a straggler. And no buffer-all
    combiner either: an exact-but-collect_list phase (the r04 shape)
    holds O(group_rows / n_shards) ids in each aggregation buffer —
    for a 10^8-page domain that is millions of ids per buffer, not the
    bounded state the op promises. Instead, sketch-then-exact:

    1. ONE groupBy(group) computes count, max, and a bounded-memory
       quantile sketch of the ids (``percentile_approx`` at a
       ``quantile_grid``-point literal grid — the percentage argument
       must be foldable, so the grid stands in for the per-group rank
       fraction cap/N). Aggregation state is the sketch, O(accuracy),
       REGARDLESS of group size, and the shuffle carries sketches,
       not ids.
    2. From the sketch, a per-group threshold at the smallest grid
       point whose guaranteed rank covers cap: grid index
       ceil((cap/N + 1/accuracy) * grid). The sketch's rank error is
       at most N/accuracy, so every true winner has id <= threshold
       (no false negatives — the final result stays EXACT), and at
       most cap + N/grid + 2N/accuracy rows pass (the approximation
       only ever costs residual size, never correctness).
    3. The threshold (one row per group) joins back — broadcast-able,
       AQE's call — and the exact cap-smallest are taken from the
       small residual with a sort+slice whose state is bounded by the
       step-2 cap + N/grid + 2N/accuracy envelope (defaults: N/853 —
       a 10^8-page domain leaves ~120k residual ids, ~1 MB, vs the
       1.5M/buffer the salted combiner held).

    The final left-semi join is an equi-join on (group, id) —
    broadcast-able when groups * cap is small. Returns ``docs``
    filtered, columns untouched. Rows with a null id never win (the
    sketch and the threshold comparison both ignore nulls), matching
    the previous collect_list semantics."""
    if cap < 1:
        raise ValueError(f"cap={cap} must be >= 1")
    grid = int(quantile_grid)
    if grid < 2:
        raise ValueError(f"quantile_grid={grid} must be >= 2")
    # the quantile sketch orders NUMBERS — a string id (valid for the
    # r04 collect_list shape) would fail percentile_approx analysis
    # with an opaque error; fail loudly with the workaround instead
    from pyspark.sql.types import NumericType

    id_type = docs.schema[id_col].dataType
    if not isinstance(id_type, NumericType):
        raise TypeError(
            f"cap_per_group requires a numeric {id_col!r} (got "
            f"{id_type.simpleString()}); map string ids through "
            f"xxhash64() first, or keep a numeric surrogate id"
        )
    ids = docs.select(F.col(group_col), F.col(id_col))
    th_agg = ids.groupBy(group_col).agg(
        F.count(id_col).alias("_n"),
        F.max(id_col).alias("_max"),
        F.percentile_approx(
            id_col, [i / grid for i in range(grid + 1)], accuracy
        ).alias("_qs"),
    )
    # ceil() yields LONG — keep it long for the >= grid test (a
    # web-scale cap over a tiny group makes cap/N*grid exceed int32,
    # and a wrapped cast would skip the keep-everything branch and
    # index the sketch array with garbage); only the element_at
    # index, provably < grid after the least(), narrows to int
    idx = F.ceil(
        (F.lit(float(cap)) / F.greatest(F.col("_n"), F.lit(1)) + F.lit(1.0 / accuracy))
        * grid
    )
    safe_idx = F.least(idx, F.lit(grid)).cast("int")
    # at/above the top of the grid the sketch's q(1.0) is not trusted
    # for exactness — use the exact max (keep-everything threshold)
    th = th_agg.select(
        F.col(group_col).alias("_t_grp"),
        F.when(idx >= grid, F.col("_max"))
        .otherwise(F.element_at("_qs", safe_idx + 1))
        .alias("_th"),
    )
    residual = ids.join(
        th, F.col(group_col).eqNullSafe(F.col("_t_grp"))
    ).filter(F.col(id_col) <= F.col("_th"))
    winners = (
        residual.groupBy(group_col)
        .agg(F.slice(F.array_sort(F.collect_list(id_col)), 1, cap).alias("_ids"))
        .select(F.col(group_col).alias("_w_grp"), F.explode("_ids").alias("_w_id"))
    )
    # null group keys form their own capped group (groupBy already
    # treats them as one): the join must be null-SAFE on the group
    # column or every null-group row silently vanishes (null == null
    # is null under standard equality)
    return docs.join(
        winners,
        F.col(group_col).eqNullSafe(F.col("_w_grp"))
        & (F.col(id_col) == F.col("_w_id")),
        "left_semi",
    )
