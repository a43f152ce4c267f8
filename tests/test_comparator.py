"""Engine-side value-hash comparator (testing.py, VERDICT r8 item 1).

The scale-safe compare path decides oracle equality from three scalars
computed inside each engine instead of materializing rows driver-side.
These tests pin the cross-engine canonicalization: every hash-safe type
family must produce the IDENTICAL (count, sum, xor) triple in Spark and
DuckDB, value tweaks must flip it, and unsupported types must fall back
(return None) rather than guess.
"""

from __future__ import annotations

import datetime

import pytest

from geoparquet_python_spark.testing import (
    duck_hash_summary,
    run_compare_engine_side,
    spark_hash_summary,
)


def _duck():
    import duckdb

    return duckdb.connect()


def test_hash_summary_cross_engine_agreement(spark):
    """ints (negative/zero/null), booleans, dates, unicode + separator-ish
    strings all canonicalize identically in both engines."""
    sdf = spark.createDataFrame(
        [
            (-5, True, datetime.date(2026, 2, 28), "plain"),
            (0, False, datetime.date(1999, 12, 31), "unié中"),
            (None, None, None, None),
            (9223372036854775807, True, datetime.date(2026, 2, 28), "a\x1fb|c"),
            (42, False, None, ""),
        ],
        "k bigint, flag boolean, d date, s string",
    )
    s = spark_hash_summary(sdf)
    assert s is not None
    con = _duck()
    d = duck_hash_summary(
        con,
        """
        SELECT * FROM (VALUES
          (CAST(-5 AS BIGINT), TRUE,  DATE '2026-02-28', 'plain'),
          (0,                  FALSE, DATE '1999-12-31', 'unié中'),
          (NULL,               NULL,  NULL,              NULL),
          (9223372036854775807, TRUE, DATE '2026-02-28', 'a' || chr(31) || 'b|c'),
          (42,                 FALSE, NULL,              '')
        ) AS t(k, flag, d, s)
        """,
    )
    assert d is not None
    assert s == d  # count, sum, xor, AND column->family map all equal


def test_hash_summary_detects_value_change(spark):
    sdf = spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, s string")
    s = spark_hash_summary(sdf)
    con = _duck()
    same = duck_hash_summary(
        con, "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a'), (2, 'b')) t(k, s)"
    )
    diff = duck_hash_summary(
        con, "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a'), (2, 'B')) t(k, s)"
    )
    assert s[:3] == same[:3]
    assert s[:3] != diff[:3]


def test_hash_summary_null_vs_literal_null_string(spark):
    """NULL and the string 'null' must hash differently (sentinel is
    outside the hex alphabet, not outside the value domain)."""
    a = spark_hash_summary(
        spark.createDataFrame([("null",)], "s string")
    )
    b = spark_hash_summary(
        spark.createDataFrame([(None,)], "s string")
    )
    assert a[:3] != b[:3]


def test_hash_summary_duplicate_multiplicity(spark):
    """{A,A,B,B} vs {A,B,B,B}: same count, XOR alone could collide on
    even multiplicities — SUM keeps the multiset faithful."""
    a = spark_hash_summary(
        spark.createDataFrame([(1,), (1,), (2,), (2,)], "k bigint")
    )
    b = spark_hash_summary(
        spark.createDataFrame([(1,), (2,), (2,), (2,)], "k bigint")
    )
    assert a[0] == b[0]
    assert a[:3] != b[:3]


def test_hash_summary_falls_back_on_floats(spark):
    sdf = spark.createDataFrame([(1.5,)], "x double")
    assert spark_hash_summary(sdf) is None
    con = _duck()
    assert duck_hash_summary(con, "SELECT 1.5 AS x") is None


def test_run_compare_engine_side_end_to_end(spark):
    con = _duck()
    fn = lambda s, _sf: s.createDataFrame(  # noqa: E731
        [(1, "a"), (2, None)], "k bigint, s string"
    )
    n, mode = run_compare_engine_side(
        spark, con, "t", fn,
        "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a'), (2, NULL)) t(k, s)",
        "_unused_",
    )
    assert (n, mode) == (2, "hash")
    with pytest.raises(AssertionError, match="row count"):
        run_compare_engine_side(
            spark, con, "t", fn,
            "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a')) t(k, s)",
            "_unused_",
        )
    with pytest.raises(AssertionError):
        run_compare_engine_side(
            spark, con, "t", fn,
            "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a'), (3, NULL)) t(k, s)",
            "_unused_",
        )
