"""Streaming materialized views + batch serving queries on top.

The two-phase production pattern for "top-k / current-state over a
stream": Structured Streaming maintains the INCREMENTAL aggregate
(per-key counts, last-op-wins state) — that's the part that must be
streaming, because it folds unbounded input into bounded state — and
the serving-layer question (top-k per window, the current snapshot) is
a cheap batch query over the materialized aggregate. Rank-over-stream
directly would need flatMapGroupsWithState with a per-window heap;
pushing it to the serving layer is how production dashboards (and the
Kafka Streams / Materialize idiom) actually run it, and keeps the
streaming state store strictly additive per key.

Scale: streaming state is |windows × active keys| (counts) or
|keys| × one struct (snapshot) — both bounded by the key population,
not stream length; the serving query reads only the materialized
frame. The batch twins are `q_countmin_heavy_hitters` (sketched) and
`q_cdc_merge_upsert` (operators/cdc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.registry import query
from geoparquet_python_spark.streaming.source import (
    read_events_stream,
    run_to_memory_table,
)

_TOPK = 3
_TOMBSTONE = "error"


@query(
    "q_stream_topk_users_hourly",
    oracle=f"""
    WITH c AS (
      SELECT date_trunc('hour', ts) AS ws, user_id,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT *, row_number() OVER (
        PARTITION BY ws ORDER BY n DESC, user_id) AS rank
      FROM c
    )
    SELECT CAST(ws AS TIMESTAMP) AS window_start,
           user_id, n, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= {_TOPK}
    ORDER BY window_start, rank
    """,
)
def q_stream_topk_users_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly heavy hitters over the event stream: the stream
    maintains per-(hour-window, user) counts under a 2 h watermark;
    the serving query ranks the materialized counts and keeps the
    top-3 users per hour. Epoch-aligned windows make the batch oracle
    exact. complete mode for availableNow parity; a continuous run
    uses append + the watermark as the state bound."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "user_id",
            "n",
        )
    )
    name = run_to_memory_table(agg, output_mode="complete")
    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("user_id")
    )
    return (
        spark.table(name)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= _TOPK)
        .select("window_start", "user_id", "n", "rank")
        .orderBy("window_start", "rank")
    )


@query(
    "q_stream_cdc_snapshot",
    oracle=f"""
    WITH c AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ops,
             MAX(CASE WHEN rn = 1 THEN event_type END) AS last_op,
             MAX(CASE WHEN rn = 1 THEN value END) AS last_value,
             MAX(CASE WHEN rn = 1 THEN ts END) AS last_ts
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) GROUP BY user_id
    )
    SELECT user_id, CAST(last_ts AS TIMESTAMP) AS last_ts,
           last_value, n_ops
    FROM c WHERE last_op <> '{_TOMBSTONE}'
    ORDER BY user_id
    """,
)
def q_stream_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized current-state snapshot: per key,
    ``max_by`` over the total op order (ts, event_id) keeps the last
    op's payload incrementally — state is one struct per key no
    matter how long the stream runs — and the serving filter hides
    keys whose final op is the tombstone. This is the streaming twin
    of `q_cdc_merge_upsert`'s batch compaction (same last-op-wins
    recurrence, certified by the same-shaped oracle)."""
    stream = read_events_stream(spark, sf_dir)
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_ops"),
        F.max_by("event_type", ordkey).alias("last_op"),
        F.max_by("value", ordkey).alias("last_value"),
        F.max_by("ts", ordkey).alias("last_ts"),
    )
    name = run_to_memory_table(agg, output_mode="complete")
    return (
        spark.table(name)
        .where(F.col("last_op") != _TOMBSTONE)
        .select("user_id", "last_ts", "last_value", "n_ops")
        .orderBy("user_id")
    )
