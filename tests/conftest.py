from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geoparquet_python_spark import registry
from geoparquet_python_spark.session import get_spark
from geoparquet_python_spark.testing import duckdb_connect

registry.load_all()

# Correctness gate runs at sf0.01 (BASELINE.md t2); override for speed:
#   SPARK_GRAFT_TEST_SF=/root/testdata/sf0.001 pytest tests/
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("geoparquet-python-spark-tests")
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb_connect(SF_DIR)
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf_dir_small():
    return "/root/testdata/sf0.001"
