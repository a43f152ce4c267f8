"""Lake-layout certifications the query gate can't see: hive-style
partitioned writes with partition pruning at read, and schema
evolution (mergeSchema) — both are how a 100 TB corpus is actually
laid out and read incrementally."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Write events hive-partitioned by event_type; a filtered read
    must show the predicate as a PartitionFilter (directory pruning —
    the scan never opens non-matching partitions) and return the same
    rows as filtering the unpartitioned table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / "events_by_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)

    back = spark.read.parquet(path).where(F.col("event_type") == "purchase")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the event_type predicate must be a partition filter, not a data filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf, f"partition pruning missed: {pf!r}"
    expected = ev.where(F.col("event_type") == "purchase").count()
    assert back.count() == expected


def test_merge_schema_reads_evolved_dataset(spark, tmp_path):
    """Old parts lack a column added later; mergeSchema reconciles and
    the missing column reads as NULL — append-only schema evolution,
    the contract an ever-growing corpus store relies on."""
    path = str(tmp_path / "evolving")
    spark.range(5).select(F.col("id"), F.lit("a").alias("v1")).write.mode(
        "overwrite"
    ).parquet(path + "/batch=0")
    spark.range(5, 8).select(
        F.col("id"), F.lit("b").alias("v1"), F.lit(1).alias("v2")
    ).write.mode("overwrite").parquet(path + "/batch=1")

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v1", "v2", "batch"}
    assert merged.count() == 8
    nulls = merged.where(F.col("v2").isNull()).count()
    assert nulls == 5, "old-batch rows must read v2 as NULL"


def test_python_datasource_partitioned_and_reproducible(spark):
    """The Spark-4 Python data source must (a) expose its
    InputPartitions as real scan parallelism, (b) produce identical
    content at any partitioning (content-addressed generation), (c)
    agree with the local generator byte-for-byte."""
    from geoparquet_python_spark.sources.synthetic import doc_text, register

    register(spark)

    def load(parts):
        return (
            spark.read.format("synthetic_docs")
            .option("rows", 100)
            .option("partitions", parts)
            .load()
        )

    df8 = load(8)
    assert df8.rdd.getNumPartitions() == 8
    rows8 = {(r.doc_id, r.text) for r in df8.collect()}
    rows1 = {(r.doc_id, r.text) for r in load(1).collect()}
    assert rows8 == rows1
    assert rows8 == {(i, doc_text(i)) for i in range(100)}


def test_pyds_writer_manifest_visibility(spark, tmp_path):
    """Only manifest-listed files are visible to a manifest-honoring
    reader: rogue files in the directory (the debris a failed task
    attempt would leave) change nothing, and abort() removes the files
    its commit messages name."""
    import json
    import os

    from geoparquet_python_spark.sources.synthetic import (
        ManifestJsonlWriter,
        register,
    )

    register(spark)
    df = spark.range(100).selectExpr(
        "id AS doc_id", "'en' AS lang", "CAST(id AS STRING) AS text",
        "CAST(1 AS BIGINT) AS n_chars"
    )
    path = str(tmp_path / "out")
    os.makedirs(path)
    df.write.format("synthetic_docs").mode("append").save(path)
    manifest = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert manifest["total_rows"] == 100
    listed = {f["name"] for f in manifest["files"]}
    on_disk = {f for f in os.listdir(path) if f.endswith(".jsonl")}
    assert listed == on_disk, "every jsonl on disk must be committed"

    # rogue file (uncommitted attempt debris) is invisible via manifest
    with open(os.path.join(path, "part-99999-deadbeef.jsonl"), "w") as fh:
        fh.write('{"doc_id": 424242, "lang": "xx", "text": "junk", "n_chars": 4}\n')
    files = [os.path.join(path, f["name"]) for f in manifest["files"]]
    back = spark.read.json(files)
    assert back.count() == 100
    assert back.where("doc_id = 424242").count() == 0

    # abort() deletes exactly the files its messages name
    w = ManifestJsonlWriter({"path": path}, overwrite=False)

    class _Msg:
        filename = "part-99999-deadbeef.jsonl"

    w.abort([_Msg()])
    assert not os.path.exists(os.path.join(path, "part-99999-deadbeef.jsonl"))

    # mode('overwrite') clears stale parts AND the old manifest before
    # any task writes — afterwards disk contents equal the NEW commit.
    df2 = df.where("doc_id < 7")
    df2.write.format("synthetic_docs").mode("overwrite").save(path)
    manifest2 = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert manifest2["total_rows"] == 7
    on_disk2 = {f for f in os.listdir(path) if f.endswith(".jsonl")}
    assert on_disk2 == {f["name"] for f in manifest2["files"]}

    # writer also works into a not-yet-existing directory
    fresh = str(tmp_path / "fresh" / "nested")
    df2.write.format("synthetic_docs").mode("overwrite").save(fresh)
    assert json.load(open(os.path.join(fresh, "_MANIFEST.json")))[
        "total_rows"
    ] == 7


def test_pyds_filter_pushdown_narrows_generation(spark):
    """pushFilters consumes doc_id range/point filters (narrowing the
    generation range and the partition plan) and yields everything
    else back as residual, by reference."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
        StringStartsWith,
    )

    from geoparquet_python_spark.sources.synthetic import SyntheticDocsReader

    r = SyntheticDocsReader({"rows": "1000", "partitions": "4"})
    unsupported = StringStartsWith(("text",), "ab")
    residual = list(
        r.pushFilters(
            [
                LessThan(("doc_id",), 300),
                GreaterThanOrEqual(("doc_id",), 100),
                unsupported,
            ]
        )
    )
    assert residual == [unsupported], "residual must be by-reference"
    assert (r.lo, r.hi) == (100, 300)
    parts = r.partitions()
    assert parts[0].start == 100 and parts[-1].end == 300
    assert sum(p.end - p.start for p in parts) == 200

    # point filter: EqualTo collapses the range to one id
    r2 = SyntheticDocsReader({"rows": "1000"})
    assert list(r2.pushFilters([EqualTo(("doc_id",), 42)])) == []
    assert (r2.lo, r2.hi) == (42, 43)

    # contradictory range -> empty scan, no crash
    r3 = SyntheticDocsReader({"rows": "1000"})
    list(r3.pushFilters([LessThan(("doc_id",), 10), GreaterThanOrEqual(("doc_id",), 500)]))
    assert sum(p.end - p.start for p in r3.partitions()) == 0

    # end-to-end with the session conf: result equals the unpushed scan
    from geoparquet_python_spark.sources.synthetic import register

    register(spark)
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        pushed = (
            spark.read.format("synthetic_docs")
            .option("rows", 1000)
            .load()
            .where("doc_id >= 100 AND doc_id < 300")
            .count()
        )
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", old)
    assert pushed == 200


# ---------------------------------------------------------------------------
# Hilbert-curve layout (operators/hilbert.py)
# ---------------------------------------------------------------------------


def _ref_xy2d(n: int, x: int, y: int) -> int:
    """Independent reference: the classic bit-op xy2d (full-grid n-1
    reflection), kept deliberately different in style from the SQL
    chain (bit tests + tuple swap vs DIV/% + CASE)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_curve_is_a_true_hilbert_curve():
    """Bijection + unit-step adjacency on the full 16x16 grid — the
    defining properties of a Hilbert curve — for the reference the
    SQL chain is tested against below."""
    n = 16
    cells = {}
    for x in range(n):
        for y in range(n):
            cells[_ref_xy2d(n, x, y)] = (x, y)
    assert len(cells) == n * n
    for d in range(n * n - 1):
        (x0, y0), (x1, y1) = cells[d], cells[d + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_spark_hilbert_chain_matches_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    from geoparquet_python_spark.operators.hilbert import (
        _QX,
        _QY,
        _spark_hilbert,
    )

    d = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    base = d.select(
        "c_custkey",
        F.expr(_QX.format(div="DIV")).alias("x0"),
        F.expr(_QY.format(div="DIV")).alias("y0"),
        F.lit(0).alias("d0"),
        F.expr(_QX.format(div="DIV")).alias("qx"),
        F.expr(_QY.format(div="DIV")).alias("qy"),
    )
    rows = _spark_hilbert(base, ["qx", "qy"]).collect()
    assert rows
    for r in rows:
        assert r.hval == _ref_xy2d(256, r.qx, r.qy)


def test_hilbert_beats_morton_on_file_skipping(spark, sf_dir):
    from geoparquet_python_spark.operators.hilbert import (
        q_curve_file_skipping,
    )

    rows = {r.curve: r for r in q_curve_file_skipping(spark, sf_dir).collect()}
    assert set(rows) == {"hilbert", "morton"}
    assert rows["hilbert"].n_files == rows["morton"].n_files
    # The Moon et al. clustering result, as an executable assertion.
    assert rows["hilbert"].files_hit < rows["morton"].files_hit
    assert rows["hilbert"].rows_scanned < rows["morton"].rows_scanned
