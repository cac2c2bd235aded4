"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the engine's parse->aggregate->route shape
over the sf0.001 events table (windowed meter sums rendered as OpenTSDB
put lines).
``queries()`` / ``oracle_sql()`` — one entry per operator family from
SURVEY.md §2 plus the training-data extras; registry lives in
``logmetrics_spark.entry_queries`` (Spark fn + DuckDB oracle pairs).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logmetrics_spark.entry_queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = REGISTRY["route_put_lines"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
