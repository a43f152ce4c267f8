"""Scale levers that sf0.01 correctness cannot see: salted joins for
hot keys, and bucketed co-located joins (the zero-shuffle fact⋈fact
path SCALE.md prescribes for a bucketed lake layout)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from geoparquet_python_spark.operators.skew import salted_join


def _skewed_frames(spark):
    # One celebrity key (0) with 5000 rows; uniform tail.
    skewed = spark.range(6000).select(
        F.when(F.col("id") < 5000, 0).otherwise(F.col("id") - 4999).alias("k"),
        F.col("id").alias("payload"),
    )
    modest = spark.range(1001).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("weight")
    )
    return skewed, modest


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equivalence(spark, how):
    skewed, modest = _skewed_frames(spark)
    plain = skewed.join(modest, ["k"], how)
    salted = salted_join(skewed, modest, ["k"], n_salt=8, how=how)
    assert salted.count() == plain.count()
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


def test_salted_join_distributes_hot_key(spark):
    """The hot key must actually scatter across salts (the point)."""
    skewed, modest = _skewed_frames(spark)
    salts = (
        skewed.withColumn(
            "s", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(8))
        )
        .where(F.col("k") == 0)
        .select("s")
        .distinct()
        .count()
    )
    assert salts == 8, "hot-key rows collapsed onto too few salts"


def test_salted_join_rejects_replicating_skewed_side(spark):
    skewed, modest = _skewed_frames(spark)
    with pytest.raises(ValueError):
        salted_join(skewed, modest, ["k"], how="right")


def test_bucketed_join_needs_no_exchange(spark, sf_dir, tmp_path):
    """Both sides bucketed by the join key into the same bucket count:
    the sort-merge join must read bucket-aligned splits with NO
    shuffle exchange on either side — the lake-layout lever that
    removes the orderkey shuffle from every lineitem⋈orders query."""
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/bucketdb'"
    )
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        od = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderstatus"
        )
        (
            li.write.mode("overwrite")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("bucketdb.li_b")
        )
        (
            od.write.mode("overwrite")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("bucketdb.od_b")
        )
        old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("bucketdb.li_b").join(
                spark.table("bucketdb.od_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, (
                "bucketed join still shuffles:\n" + plan
            )
            # And it still computes the right thing.
            expected = li.join(
                od, F.col("l_orderkey") == F.col("o_orderkey")
            ).count()
            assert j.count() == expected
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    finally:
        spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime bloom-filter join pruning (the 100 TB lever for
    selective fact⋈fact joins): with a selective filter on the
    creation side, Spark injects might_contain(bloom_filter_agg(...))
    onto the probe side, dropping most probe rows BEFORE the shuffle.
    Local tables sit under the default 10 GB application-side
    threshold, so the test lowers it to force the rewrite and then
    checks result equality against the unfiltered plan."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        od = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            F.col("o_totalprice") > 490000
        )
        j = li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "bloom runtime filter not injected"
        n = j.count()
        assert n > 0
        for k, v in confs.items():  # recompute without the rewrite
            spark.conf.unset(k)
        plain = li.join(od, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n == plain, "bloom filter changed the result"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
