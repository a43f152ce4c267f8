"""Query registry: the bridge between operator modules and the driver
contract in ``__spark_entry__.py``.

Each operator module registers queries with the :func:`query` decorator;
``__spark_entry__.queries()`` / ``oracle_sql()`` simply expose these
dicts. A query with ``oracle=None`` gets the driver's weaker rows-only
check (reserved for genuinely non-SQL-expressible ops).

Determinism contract (why oracles can hash-match bit-for-bit):

- double SUM/AVG go through ``DECIMAL(38,6)`` casts on both sides —
  decimal addition is exact and order-independent, so Spark's partial
  aggregation order vs DuckDB's single-threaded order cannot diverge;
- the final value is cast back to DOUBLE (same decimal → same double);
- remaining double arithmetic uses only IEEE-exact ops (+ - * / sqrt)
  applied identically on both sides, or is rounded where a
  transcendental function (sin/cos/atan2 for haversine) is involved;
- session time zone is pinned UTC (see session.prepare).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with an optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so its registrations run."""
    import geoparquet_python_spark.operators  # noqa: F401
    import geoparquet_python_spark.streaming  # noqa: F401
