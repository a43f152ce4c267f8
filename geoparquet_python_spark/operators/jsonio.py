"""JSONL source/sink certification: round-trip the documents table
through newline-delimited JSON and prove fidelity with a checksum
aggregate against the parquet original.

Parquet is the primary format (io.py), but real pipelines ingest
JSONL constantly (crawl dumps, API exports). This certifies Spark's
JSON writer/reader path — string escaping included — the same way
geo/io.py certifies the GeoParquet footer path: write, read back
with an explicit schema (never schema inference at scale: one footer
pass over 100 TB of JSON is a full scan), aggregate, compare to the
oracle run on the ORIGINAL table. Any mangled character changes the
md5 checksum sum and the oracle catches it.

Scale notes: the JSON writer/reader are both partition-parallel
(one shard per task, splittable line format); the checksum aggregate
is the usual uniform-key rollup. Writing to local tmp here stands in
for object storage.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from geoparquet_python_spark.functions.text import SQL_MD5_LONG, md5_long
from geoparquet_python_spark.io import load_table, run_scratch_dir
from geoparquet_python_spark.registry import query

_CKSUM_MOD = 1_000_000_000

_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("text", StringType()),
        StructField("n_chars", LongType()),
    ]
)


@query(
    "q_jsonl_roundtrip_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM({SQL_MD5_LONG.format(expr="text")} % {_CKSUM_MOD})
                AS BIGINT) AS text_cksum
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_jsonl_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write documents as JSONL, read back (explicit schema), and
    aggregate per-lang counts + an order-independent md5 checksum of
    the text column. The oracle computes the same aggregate on the
    original parquet — equal results prove the JSON round-trip is
    byte-faithful."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    path = run_scratch_dir(spark, "jsonl", sf_dir)
    d.write.mode("overwrite").json(path)
    back = spark.read.schema(_SCHEMA).json(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(md5_long(F.col("text")) % _CKSUM_MOD).alias("text_cksum"),
        )
        .orderBy("lang")
    )


_FMT_ORACLE = f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM({SQL_MD5_LONG.format(expr="text")} % {_CKSUM_MOD})
                AS BIGINT) AS text_cksum
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """


def _roundtrip_stats(
    spark: SparkSession, sf_dir: str, fmt: str, **wopts
) -> DataFrame:
    """Shared write→read-with-schema→checksum-aggregate harness for
    the text/columnar format matrix; each format's query proves ITS
    writer+reader path byte-faithful against the parquet original."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text", "n_chars"
    )
    path = run_scratch_dir(spark, fmt, sf_dir)
    w = d.write.mode("overwrite")
    for k, v in wopts.items():
        w = w.option(k, v)
    w.format(fmt).save(path)
    back = spark.read.schema(_SCHEMA)
    for k, v in wopts.items():
        back = back.option(k, v)
    back = back.format(fmt).load(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(md5_long(F.col("text")) % _CKSUM_MOD).alias("text_cksum"),
        )
        .orderBy("lang")
    )


@query("q_csv_roundtrip_stats", oracle=_FMT_ORACLE)
def q_csv_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink certification — the header/quote/escape path
    (document text can contain anything): write with explicit
    quote-all so embedded delimiters survive, read back with the
    explicit schema (inference over 100 TB of CSV is a full scan),
    checksum against the parquet original. The explicit `nullValue`
    sentinel matters: with Spark's defaults an empty-string field
    parses back as NULL (verified live), silently corrupting any
    corpus with empty documents — the sentinel keeps '' and NULL
    distinct through the round trip. Splittable-format caveat
    noted: unlike JSONL, quoted multi-line CSV is NOT safely
    splittable — keep records single-line (ours are) or pay
    single-task reads per file; q_csv_splittable_roundtrip_stats
    below is the parallel-read scale path (base64-armored text)."""
    return _roundtrip_stats(
        spark,
        sf_dir,
        "csv",
        header="true",
        quoteAll="true",
        escape='"',
        nullValue="\\N",
    )


@query("q_csv_splittable_roundtrip_stats", oracle=_FMT_ORACLE)
def q_csv_splittable_roundtrip_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SCALE path for CSV: q_csv_roundtrip_stats documents that
    quoted multi-line CSV is not safely splittable (a newline inside
    quotes forces multiLine=true → one task per file). This variant
    keeps every record one-per-line by construction — text is
    base64-armored before the write (the base64 alphabet contains no
    newline, quote, or delimiter), so the read side uses the DEFAULT
    line-splittable reader: any byte offset is a safe split point and
    a 100 TB CSV lake reads with full input-split parallelism, at the
    cost of +33% bytes on the armored column. unbase64 restores the
    exact original text; checksum equality against the parquet
    original certifies the whole encode→write→split-read→decode chain
    byte-faithful. The `nullValue` sentinel is still required: even
    armored, an empty string field would otherwise read back NULL."""
    # translate strips the CRLFs Spark's base64 inserts every 76 chars
    # (MIME chunking — verified live on this build); without it the
    # armored column itself would smuggle newlines back into the CSV.
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.translate(
            F.base64(F.col("text").cast("binary")), "\r\n", ""
        ).alias("text_b64"),
        "n_chars",
    )
    path = run_scratch_dir(spark, "csvsplit", sf_dir)
    (
        d.write.mode("overwrite")
        .option("header", "true")
        .option("nullValue", "\\N")
        .csv(path)
    )
    back_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("text_b64", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    back = (
        spark.read.schema(back_schema)
        .option("header", "true")
        .option("nullValue", "\\N")
        .csv(path)
        .select(
            "doc_id",
            "lang",
            F.unbase64(F.coalesce("text_b64", F.lit("")))
            .cast("string")
            .alias("text"),
            "n_chars",
        )
    )
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(md5_long(F.col("text")) % _CKSUM_MOD).alias("text_cksum"),
        )
        .orderBy("lang")
    )


@query("q_orc_roundtrip_stats", oracle=_FMT_ORACLE)
def q_orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink certification — the other columnar format a
    lake migration meets; same stripe-level pushdown/pruning family
    as Parquet, exercised through Spark's native vectorized ORC
    reader. Checksum equality against the parquet original proves
    the type mapping (int64/string) round-trips exactly."""
    return _roundtrip_stats(spark, sf_dir, "orc")


@query(
    "q_schema_evolution_read",
    oracle=f"""
    WITH v1 AS (
      SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0
    ),
    v2 AS (
      SELECT doc_id, lang, text, n_chars FROM documents WHERE doc_id % 2 = 1
    ),
    unioned AS (
      SELECT doc_id, lang, text, NULL AS n_chars FROM v1
      UNION ALL
      SELECT doc_id, lang, text, n_chars FROM v2
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(COUNT(n_chars) AS BIGINT) AS n_with_chars,
           CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS total_chars,
           CAST(SUM({SQL_MD5_LONG.format(expr="text")} % {_CKSUM_MOD})
                AS BIGINT) AS text_cksum
    FROM unioned
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read path: two parquet generations of the
    same dataset — v1 written WITHOUT `n_chars`, v2 with it — land in
    one directory, and a `mergeSchema` read unifies them (v1 rows get
    NULL for the added column). The aggregate proves exactly the
    column-addition contract every long-lived lake relies on: counts
    split correctly by generation (`n_with_chars`), the added
    column's sum covers only v2 rows, and the text checksum shows no
    row was lost or duplicated across generations.

    Scale note: mergeSchema costs a footer read per FILE on the
    driver — fine for generation counts in the hundreds; a 100 TB
    lake pins the merged schema in a catalog (or reads with an
    explicit schema, as every other query here does) instead of
    re-merging per query.
    """
    d = load_table(spark, sf_dir, "documents")
    path = run_scratch_dir(spark, "evo", sf_dir)
    v1 = d.where(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "text")
    v2 = d.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "text", "n_chars"
    )
    v1.write.mode("overwrite").parquet(path)
    v2.write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return (
        back.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("n_chars").alias("n_with_chars"),
            F.sum(F.coalesce("n_chars", F.lit(0))).alias("total_chars"),
            F.sum(md5_long(F.col("text")) % _CKSUM_MOD).alias("text_cksum"),
        )
        .orderBy("lang")
    )


@query(
    "q_federated_format_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS dim_totalprice
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q_federated_format_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-format federation in ONE plan: the parquet `lineitem`
    fact joins an `orders` dimension that lives as JSONL (written
    here to stand in for the API-export / crawl-dump side of a real
    lake), keyed on orderkey, rolled up to priority revenue. The
    optimizer treats both scans uniformly — predicate pushdown and
    join planning don't care about the format boundary — which is
    exactly why a lake can migrate formats table by table. Revenue
    goes through DECIMAL(38,6) per the registry contract.

    JSON caveat exercised on purpose: o_totalprice (a DOUBLE) rides
    the JSON text form and is summed on the JSON side of the join,
    while the oracle sums it from the ORIGINAL parquet — so the
    shortest-round-trip double serialization is actually certified
    (a mangled last ulp would hash-fail). Timestamps are NOT pushed
    through JSON here; their format contract is a separate concern.
    """
    import pyspark.sql.types as T

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    path = run_scratch_dir(spark, "fedjson", sf_dir)
    o.write.mode("overwrite").json(path)
    oschema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    o_json = spark.read.schema(oschema).json(path)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o_json, li.l_orderkey == o_json.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(38,6)")
            )
            .cast("double")
            .alias("revenue"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("dim_totalprice"),
        )
        .orderBy("o_orderpriority")
    )
