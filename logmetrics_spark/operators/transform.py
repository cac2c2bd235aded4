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

``replace_only_one`` semantics (fixed; see CompatFlags): ops are
evaluated strictly in config order against the RUNNING value, with a
per-row "replaced" latch — the first *successful* replace ends the
replace chain, while ``match_or_default`` ops apply wherever they sit
in the chain (so a guard placed before a replace feeds its modified
value into that replace, exactly like the sequential oracle). The
reference's actual code resets its latch each op so the flag is a
no-op there (``transform.go:48-60``); ``compat.transform_apply_all``
replays that.
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
        # Config-order fold with a per-row 'replaced' latch: each
        # replace evaluates against the RUNNING value and only fires
        # while the latch is unset; guards apply in place (matching
        # oracle._apply_transform exactly). Catalyst CSE collapses the
        # repeated rlike/when subtrees.
        current = value
        done: Column = F.lit(False)
        for op in ops:
            if op.kind == "replace":
                hit = ~done & current.rlike(op.pattern)
                new_current = F.when(hit, _template_expr(current, op.pattern, op.arg)).otherwise(current)
                done = done | hit
                current = new_current
            else:  # match_or_default
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
