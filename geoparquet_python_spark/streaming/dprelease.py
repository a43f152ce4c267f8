"""Streaming differentially private release: per-window noisy event
counts published continuously from the ingest stream.

Composes the Laplace mechanism (operators/privacy.py — same epsilon,
lattice, and tail bound) with the tumbling-window aggregation (E1/E4):
the noise is a STATELESS post-aggregation decoration seeded from the
(window_start, event_type) cell key, so the streaming plan is the
windowed count plus one projection — no extra state store, and each
window's release is reproducible under retries/replays (the property
a deterministic seed buys; a production deployment would swap in a
CSPRNG draw per first-publication of a cell and persist it).

Privacy accounting: cells are disjoint in (window, event_type), so
one epsilon covers the whole release under parallel composition for
EVENT-level adjacency (add/remove one event, sensitivity 1). A USER
contributes to many windows; user-level guarantees would multiply
epsilon by the user's window count (or cap contributions) — the
standard caveat of continual-release DP, stated here rather than
hidden.

Batch≡stream: availableNow drains the whole events table through the
same plan; epoch-aligned windows equal date_trunc('hour') buckets, so
the DuckDB batch oracle reproduces every noisy cell bit-for-bit (ln
rounded on the 1e-6 lattice, the privacy-module contract).

Scale shape: the windowed count is the only corpus-sized work (state
bounded by watermark); the mechanism is O(live windows x event
types) arithmetic per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.operators.privacy import _EPS, _NOISE, _TAIL
from geoparquet_python_spark.registry import query
from geoparquet_python_spark.streaming.source import (
    read_events_stream,
    run_to_memory_table,
    table_rows,
)

_SEEDW = "dpw-v1:"

# Cell-keyed lattice draw: md5 of seed + epoch-seconds + type. The
# window start is keyed as INTEGER epoch seconds cast to string —
# timestamp FORMATTING differs across engines, epoch arithmetic does
# not (session TZ pinned UTC).
_SPARK_ULAT = (
    f"(CAST(conv(substring(md5(concat('{_SEEDW}',"
    f" CAST(unix_timestamp(window_start) AS STRING), ':', event_type)),"
    f" 1, 15), 16, 10) AS BIGINT) % 999999) - 499999"
)
_SQL_ULAT = (
    f"(CAST(('0x' || substr(md5('{_SEEDW}'"
    f" || CAST(CAST(epoch(window_start) AS BIGINT) AS VARCHAR)"
    f" || ':' || event_type), 1, 15)) AS BIGINT) % 999999) - 499999"
)


@query(
    "q_stream_dp_release",
    oracle=f"""
    WITH g AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    seeded AS (
      SELECT window_start, event_type, c, {_SQL_ULAT} AS ulat FROM g
    ),
    noised AS (
      SELECT window_start, event_type, c, {_NOISE} AS noise FROM seeded
    )
    SELECT window_start, event_type,
           CAST(c AS DOUBLE) + noise AS noisy_count,
           CAST({_EPS} AS DOUBLE) AS epsilon,
           (abs(noise) <= {_TAIL}) AS tail_ok
    FROM noised
    ORDER BY window_start, event_type
    """,
)
def q_stream_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously published epsilon-DP hourly event-type counts:
    tumbling 1h windows with a 2h watermark, the Laplace decoration
    applied inside the streaming plan (stateless projection after the
    windowed count), drained with availableNow. Exact counts never
    reach the sink — only the noisy release, epsilon, and the in-plan
    lattice tail certification. See the module docstring for the
    event-level adjacency caveat."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "c",
        )
    )
    rel = (
        agg.withColumn("ulat", F.expr(_SPARK_ULAT))
        .withColumn("noise", F.expr(_NOISE))
        .select(
            "window_start",
            "event_type",
            (F.col("c").cast("double") + F.col("noise")).alias(
                "noisy_count"
            ),
            F.lit(float(_EPS)).alias("epsilon"),
            (F.abs(F.col("noise")) <= _TAIL).alias("tail_ok"),
        )
    )
    name = run_to_memory_table(
        rel,
        output_mode="complete",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
    return spark.table(name).orderBy("window_start", "event_type")
