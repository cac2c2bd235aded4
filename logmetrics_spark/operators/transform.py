"""Transform stage: per-position match-group rewrites as Catalyst exprs.

Reimplements the reference's transform DSL (``transform.go:46-69``)
with *native column expressions only* — no UDFs, fully visible to
Catalyst/codegen:

- ``replace [pattern, template]``: if the pattern matches anywhere in
  the value, the ENTIRE value is replaced by the template, with
  ``@@n@@`` expanding to capture group n of the pattern (the reference
  builds the new value purely from the template via its replacer —
  observed at ``transform.go:50-59``; e.g. ``'^.*/bid' -> '/bid/'``
  maps ``/erronous/path/bid?params`` to ``/bid/``).
  Spark: ``when(rlike, concat(lit..., regexp_extract...))``.
- ``match_or_default [pattern, default]``: keep the value if it
  matches, else assign the literal default (``transform.go:62-69``).
  Spark: ``when(rlike, col).otherwise(lit(default))``.

``replace_only_one`` semantics (fixed; see CompatFlags): the first
*successful* replace ends the replace chain, but ``match_or_default``
ops still apply afterwards (preserving the whitelist-guard idiom of
the reference example config). The reference's actual code resets its
latch each op so the flag is a no-op there (``transform.go:48-60``);
``compat.transform_apply_all`` replays that.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import LogGroup, TransformDef, TransformOp
from ..regexc import clean_verbose_regex


def _template_expr(value: Column, pattern: str, template: str) -> Column:
    """Expand a ``@@n@@`` template into concat(lit, regexp_extract...)."""
    parts: list[Column] = []
    pos = 0
    for m in re.finditer(r"@@(\d+)@@", template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        parts.append(F.regexp_extract(value, pattern, int(m.group(1))))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def transform_expr(value: Column, tdef: TransformDef, apply_all_compat: bool = False) -> Column:
    """Compile one position's operation chain into a column expression."""
    ops = [
        TransformOp(op.kind, clean_verbose_regex(op.pattern), op.arg)
        for op in tdef.operations
    ]
    only_one = tdef.replace_only_one and not apply_all_compat

    if only_one:
        # First matching replace wins (evaluated against the original
        # value — earlier non-matching replaces leave it unchanged),
        # then match_or_default guards run on the result.
        expr: Column | None = None
        replace_chain = [op for op in ops if op.kind == "replace"]
        guards = [op for op in ops if op.kind == "match_or_default"]
        current = value
        for op in replace_chain:
            branch = _template_expr(value, op.pattern, op.arg)
            expr = (
                F.when(value.rlike(op.pattern), branch)
                if expr is None
                else expr.when(value.rlike(op.pattern), branch)
            )
        current = expr.otherwise(value) if expr is not None else value
        for op in guards:
            current = F.when(current.rlike(op.pattern), current).otherwise(F.lit(op.arg))
        return current

    # sequential application, each op on the previous op's output
    current = value
    for op in ops:
        if op.kind == "replace":
            current = F.when(
                current.rlike(op.pattern), _template_expr(current, op.pattern, op.arg)
            ).otherwise(current)
        else:  # match_or_default
            current = F.when(current.rlike(op.pattern), current).otherwise(F.lit(op.arg))
    return current


def transform_stage(df: DataFrame, lg: LogGroup) -> DataFrame:
    """Apply all configured per-position transforms (``datapool.go:102-114``)."""
    for tdef in lg.transforms:
        col = f"g{tdef.position}"
        df = df.withColumn(
            col, transform_expr(F.col(col), tdef, lg.compat.transform_apply_all)
        )
    return df
