"""Table loading for the driver-generated star schema.

Reference parity: the reference's only scan is ``pq.read_table(path)``
(geoparquet/__init__.py:50≈ — reads all columns eagerly, no pushdown).
Here every scan is a lazy ``spark.read.parquet`` DataFrame, so Catalyst
column pruning and Parquet row-group predicate pushdown apply for free
(SURVEY.md §4.2); at 100 TB that is the difference between reading the
footprint of the query and reading the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.session import prepare

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at ANY scale factor (they
# scale sublinearly or not at all in TPC-H-like schemas). Joins against
# these should never shuffle the fact side.
BROADCAST_TABLES = {"region", "nation", "supplier"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): Spark 4 can't type it,
        # so nanosAsLong surfaces raw int64 nanos; convert to µs
        # TimestampType here. Integer DIV (not double /): ns values
        # ~1.7e18 exceed double's 2^53 exact-integer range. (Truncation
        # toward zero == floor for post-1970 data; this table is 2024.)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
