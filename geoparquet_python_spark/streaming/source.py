"""Streaming source for the events table.

Same adapter as the batch path (io.load_table): the raw ``ts`` column
(int64 nanos or TIMESTAMP_NTZ, depending on testdata generation) is
normalized to a µs TimestampType — the queries built on top are
identical batch/stream (the Structured Streaming promise: one
DataFrame program, two run modes).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from geoparquet_python_spark.io import normalize_event_ts
from geoparquet_python_spark.session import prepare


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the ns→µs conversion.

    Streaming sources need an explicit schema: taken from one footer
    read of the same path (driver-side, metadata only).
    """
    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file-stream source wants a directory; pathGlobFilter narrows
    # it to the events file living alongside the other tables.
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_event_ts(stream)


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
