"""Deterministic split/sample properties (operators/sampling.py): the
whole point of hash-bucket membership is stability — assignment must
not depend on partitioning, ordering, or which subset of rows is
present. rand()-based sampling fails all three."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.operators.sampling import hash_bucket


def _assignments(df):
    b = hash_bucket(F.col("doc_id"))
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    return {
        r["doc_id"]: r["split"]
        for r in df.select("doc_id", split.alias("split")).collect()
    }


def test_split_invariant_under_repartition(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    base = _assignments(d)
    shuffled = _assignments(d.repartition(17, "lang"))
    assert base == shuffled


def test_split_invariant_under_subsetting(spark, sf_dir):
    # Membership of a doc must not change when other docs are filtered
    # away (incremental corpus growth / partial reprocessing).
    d = load_table(spark, sf_dir, "documents")
    base = _assignments(d)
    subset = _assignments(d.where(F.col("doc_id") % 3 == 0))
    assert all(base[k] == v for k, v in subset.items())


def test_bucket_range_and_coverage(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    row = d.select(
        F.min(hash_bucket(F.col("doc_id"))).alias("lo"),
        F.max(hash_bucket(F.col("doc_id"))).alias("hi"),
    ).collect()[0]
    assert 0 <= row["lo"] and row["hi"] <= 99
