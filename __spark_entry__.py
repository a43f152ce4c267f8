"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over geoparquet_python_spark: the engine registers every
implemented operator query in geoparquet_python_spark.registry; this
module exposes them in the driver's shape (see SURVEY.md §5.2 for the
oracle-diff contract).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geoparquet_python_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL mirror for each oracle-strong query."""
    return dict(registry.ORACLES)
