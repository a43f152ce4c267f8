"""Streaming source for the events table.

Same adapter as the batch path (io.load_table): the raw ``ts`` column
(int64 nanos or TIMESTAMP_NTZ, depending on testdata generation) is
normalized to a µs TimestampType — the queries built on top are
identical batch/stream (the Structured Streaming promise: one
DataFrame program, two run modes).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from geoparquet_python_spark.io import normalize_event_ts
from geoparquet_python_spark.session import prepare


def read_table_stream(
    spark: SparkSession, sf_dir: str, table: str
) -> DataFrame:
    """readStream over ``{sf_dir}/{table}.parquet``, layout-aware.

    The driver testdata ships each table as a single FILE next to its
    siblings, so the file-stream source (which wants a directory) gets
    the parent dir + a pathGlobFilter. Spark-written corpora — e.g. the
    weak-scaling replica corpus — write the table as a DIRECTORY of
    part files; there the glob form matches nothing (pathGlobFilter
    filters leaf FILES, and the parts are named part-*.parquet), so the
    source loads the directory itself. Round 12: this split is what
    lets the q_stream_* family run on replica corpora at all — before
    it, every streaming super-scaling leg would silently time an empty
    stream (the reason streaming was excluded from DEFAULT_QUERIES).

    Streaming sources need an explicit schema: taken from one footer
    read of the same path (driver-side, metadata only).
    """
    prepare(spark)
    path = f"{sf_dir}/{table}.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).format("parquet")
    if os.path.isdir(path):
        return reader.load(path)
    return reader.option("pathGlobFilter", f"{table}.parquet").load(sf_dir)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents parquet (layout-aware — see
    read_table_stream)."""
    return read_table_stream(spark, sf_dir, "documents")


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the ns→µs conversion
    (layout-aware — see read_table_stream)."""
    return normalize_event_ts(read_table_stream(spark, sf_dir, "events"))


def run_to_memory_table(stream_df: DataFrame, output_mode: str = "append") -> str:
    """Drain a streaming DataFrame with trigger(availableNow) into a
    uniquely-named in-memory sink; returns the table name.

    availableNow processes everything present then stops — this is the
    batch-parity harness (same code path as a continuous run, bounded
    input). Production sinks swap format('memory') for parquet/kafka.
    """
    name = f"sink_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name
