"""Mirror of the driver's t2 gate: every registered query must match
its DuckDB oracle (row count + columns + order-insensitive values)."""

from __future__ import annotations

import pytest

from geoparquet_python_spark import registry
from geoparquet_python_spark.testing import run_compare

registry.load_all()

ALL = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", ALL)
def test_oracle_parity(spark, duck, sf_dir, name):
    fn = registry.QUERIES[name]
    oracle = registry.ORACLES.get(name)
    n = run_compare(spark, duck, name, fn, oracle, sf_dir)
    assert n >= 0
