"""As-of join — the event-time operator Spark's join zoo lacks.

For each left row, attach the LATEST right row with
``right.ts <= left.ts`` within the same key (the "most recent prior
observation" join: enrich each log event with the last-known config
push, price tick, session marker...).

Spark-first implementation — NOT a range join (which Catalyst plans as
a broadcast-nested-loop or an inequality sort-merge that degrades to
per-key quadratic when keys repeat): UNION the two streams with a
source marker, ONE shuffle on the key, and a running
``last(value, ignorenulls=True)`` over the event-time order. Cost is
O((|L|+|R|) log) per key partition — the classic log-merge shape, and
the window never holds more than the running last value per column.

Ties: a right row at exactly ``left.ts`` IS visible (<=, the ASOF JOIN
convention); among multiple right rows at the same (key, ts) the one
with the highest tiebreaker wins — pass ``right_order`` to make that
deterministic (defaults to the value columns themselves)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    on: str = "ts",
    value_cols: list[str] | None = None,
    right_order: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right``
    values at or before its ``on`` time, per ``by`` key (null when no
    prior right row exists).

    ``value_cols``: right columns to carry (default: every right
    column not in ``by``/``on``). Left columns pass through
    unchanged."""
    by = [by] if isinstance(by, str) else list(by)
    value_cols = value_cols or [c for c in right.columns if c not in set(by) | {on}]
    right_order = right_order or value_cols

    l = left
    for c in value_cols:
        if c in l.columns:
            raise ValueError(f"asof_join: left already has column {c!r}")
    # the right VALUES travel as ONE struct, and the running fill is
    # last(struct, ignorenulls): the whole latest right ROW wins
    # atomically. Filling each column independently would stitch
    # together fields from DIFFERENT right rows whenever a right
    # value column contains NULLs (a composite row that never existed
    # — and a divergence from merge_asof / SQL ASOF JOIN semantics).
    lm = l.select(
        *by, F.col(on).alias("_t"), F.lit(1).alias("_src"),
        F.lit(None).cast(
            right.select(F.struct(*value_cols).alias("_r")).schema["_r"].dataType
        ).alias("_rrow"),
        F.struct(*l.columns).alias("_lrow"),
    )
    rm = right.select(
        *by, F.col(on).alias("_t"), F.lit(0).alias("_src"),
        F.struct(*value_cols).alias("_rrow"),
        F.lit(None).cast(lm.schema["_lrow"].dataType).alias("_lrow"),
    )
    u = lm.unionByName(rm)
    # right rows sort BEFORE left rows at equal ts (_src 0 < 1), so a
    # same-instant observation is visible; right_order breaks same-ts
    # right-row ties deterministically
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col("_t").asc(),
            F.col("_src").asc(),
            *[F.col("_rrow")[c].asc_nulls_first() for c in right_order],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "_src", "_lrow", F.last("_rrow", ignorenulls=True).over(w).alias("_rfill")
    ).filter(F.col("_src") == 1)
    return filled.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rfill.{c}").alias(c) for c in value_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    start: str = "start",
    end: str = "end",
    by: str | list[str] | None = None,
    bucket: int = 3600,
) -> DataFrame:
    """Point-in-interval join (``start <= point.on <= end``, optionally
    also matching ``by`` keys) as an EQUI-join — never the
    BroadcastNestedLoopJoin Catalyst plans for a raw inequality join.

    Each interval explodes into the fixed-size time buckets it
    overlaps (``sequence(floor(start/b), floor(end/b))`` — intervals
    are typically short relative to ``bucket``, so the explosion
    factor is ~1-2), points map to their single bucket, and the exact
    BETWEEN predicate re-applies after the hash join. Pick ``bucket``
    near the typical interval length: cost is
    O(|points| + |intervals| x spans) shuffled on (bucket[, by]).
    Inclusive on both ends (the SQL BETWEEN convention)."""
    by = [by] if isinstance(by, str) else list(by or [])
    b = F.lit(bucket)
    ivals = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.floor(F.col(start) / b).cast("long"),
                F.floor(F.col(end) / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn("_bk", F.floor(F.col(on) / b).cast("long"))
    joined = pts.join(ivals, [*by, "_bk"]).filter(
        F.col(on).between(F.col(start), F.col(end))
    )
    return joined.drop("_bk")
