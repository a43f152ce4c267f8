"""Streaming window aggregations over `events` (SURVEY.md §2.E rows
E1/E2/E4/E5/E7/E8): tumbling, sliding, watermarks, stream dedup,
stream-static join — each drained with trigger(availableNow) and
oracle-checked against batch SQL (windows align to the epoch, so
date_trunc arithmetic reproduces them exactly).

E3/E6 (session windows, arbitrary stateful) are in sessions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import broadcast_narrow
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query
from geoparquet_python_spark.streaming.source import (
    read_events_stream,
    run_to_memory_table,
    table_rows,
)


@query(
    "q_stream_tumbling_counts",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY window_start, event_type
    """,
)
def q_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1+E4+E8: tumbling 1h windows with a 2h watermark, availableNow.

    Epoch-aligned windows ≡ date_trunc('hour') buckets, so the batch
    oracle reproduces the stream output exactly. complete output mode:
    append would withhold windows newer than the final watermark; in a
    continuous production run the watermark + append sink is the
    state-bounding configuration.
    """
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    name = run_to_memory_table(
        agg,
        output_mode="complete",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
    return spark.table(name).orderBy("window_start", "event_type")


@query(
    "q_stream_sliding_avg",
    oracle="""
    WITH starts AS (
      SELECT value,
             TIMESTAMP '1970-01-01 00:00:00'
               + (CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800)
                 * INTERVAL 1 SECOND AS wr
      FROM events
    ),
    expanded AS (
      SELECT wr AS window_start, value FROM starts
      UNION ALL
      SELECT wr - INTERVAL 30 MINUTE AS window_start, value FROM starts
    )
    SELECT window_start,
           CAST(window_start + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(value)
             AS avg_value
    FROM expanded
    GROUP BY 1, 2
    ORDER BY window_start
    """,
)
def q_stream_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: sliding windows (1h length, 30m slide) — each event lands in
    exactly two windows; the oracle expands both epoch-aligned starts
    per event and re-aggregates."""
    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
                / F.count("value")
            ).alias("avg_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n",
            "avg_value",
        )
    )
    name = run_to_memory_table(
        agg,
        output_mode="complete",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
    return spark.table(name).orderBy("window_start")


def dedup_events_within_watermark(
    stream: DataFrame, delay: str = "2 hours"
) -> DataFrame:
    """Watermark-BOUNDED streaming dedup on the event key.

    ``dropDuplicates(["event_id"])`` under a watermark keeps every key
    ever seen when the event-time column is not part of the key set —
    the state store grows without bound over an unbounded stream (the
    round-4 verdict's E5 weakness). ``dropDuplicatesWithinWatermark``
    expires a key's state once the watermark passes its event time +
    delay, so state size is proportional to the delay window, not the
    stream history: duplicates are still dropped as long as they arrive
    within ``delay`` of the original (the real-world redelivery bound —
    at-least-once sources redeliver in seconds, not days). State
    boundedness is asserted by tests/test_streaming.py's multi-batch
    eviction test.
    """
    return stream.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


@query(
    "q_stream_dedup_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(DISTINCT event_id) AS n_unique_events
    FROM events
    GROUP BY 1
    ORDER BY day
    """,
)
def q_stream_dedup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: streaming dedup on the event key within the watermark bound,
    then a windowed count — the stream-dedup-then-aggregate shape."""
    stream = read_events_stream(spark, sf_dir)
    deduped = dedup_events_within_watermark(stream)
    agg = (
        deduped.groupBy(F.window("ts", "1 day"))
        .agg(F.count(F.lit(1)).alias("n_unique_events"))
        .select(
            F.col("window.start").alias("day"),
            "n_unique_events",
        )
    )
    name = run_to_memory_table(
        agg,
        output_mode="complete",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
    return spark.table(name).orderBy("day")


@query(
    "q_stream_static_join",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON c_custkey = user_id
    GROUP BY 1
    ORDER BY c_mktsegment
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: stream ⋈ static enrichment join (the static side is a plain
    batch DataFrame — broadcast per micro-batch), then aggregate."""
    stream = read_events_stream(spark, sf_dir)
    customers = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    agg = (
        stream.join(
            broadcast_narrow(customers), stream.user_id == customers.c_custkey
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "sum_value"
            ),
        )
    )
    name = run_to_memory_table(
        agg,
        output_mode="complete",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
    return spark.table(name).orderBy("c_mktsegment")


@query(
    "q_stream_stream_join",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             date_trunc('microseconds', ts) AS ts
      FROM events
    )
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           date_diff('microsecond', c.ts, p.ts) AS lag_us
    FROM e c JOIN e p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    ORDER BY click_id, purchase_id
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E: stream-stream interval inner join — clicks matched to the
    same user's purchases within the following hour.

    Both sides carry a 2h watermark and the join predicate bounds
    purchase.ts to [click.ts, click.ts + 1h], so Spark can expire
    join state: click state is held ~(watermark + 1h), purchase state
    ~watermark — bounded memory on an unbounded stream, the whole
    point of the interval-condition requirement. Drained with
    availableNow the result equals the batch join (the oracle);
    append is the only stream-stream inner-join output mode.
    """
    clicks = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )
    name = run_to_memory_table(
        joined,
        output_mode="append",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
    return spark.table(name).orderBy("click_id", "purchase_id")


@query(
    "q_stream_stream_left_join",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             date_trunc('microseconds', ts) AS ts
      FROM events
    ),
    clicks AS (SELECT * FROM e WHERE event_type = 'click'),
    purchases AS (SELECT * FROM e WHERE event_type = 'purchase'),
    -- the GLOBAL watermark is the MIN over both inputs of
    -- (per-stream max event time, floored to Spark's ms precision)
    mx AS (
      SELECT LEAST(
        (SELECT date_trunc('milliseconds', MAX(ts)) FROM clicks),
        (SELECT date_trunc('milliseconds', MAX(ts)) FROM purchases)
      ) AS m
    ),
    matched AS (
      SELECT c.user_id, c.event_id AS click_id, c.ts AS c_ts,
             p.event_id AS purchase_id,
             date_diff('microsecond', c.ts, p.ts) AS lag_us
      FROM clicks c JOIN purchases p
        ON p.user_id = c.user_id
       AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    )
    SELECT user_id, click_id, purchase_id, lag_us FROM matched
    UNION ALL
    SELECT c.user_id, c.event_id AS click_id,
           CAST(NULL AS BIGINT) AS purchase_id,
           CAST(NULL AS BIGINT) AS lag_us
    FROM clicks c CROSS JOIN mx
    WHERE NOT EXISTS (SELECT 1 FROM matched m WHERE m.click_id = c.event_id)
      AND c.ts + INTERVAL 1 HOUR < mx.m - INTERVAL 2 HOUR
    ORDER BY click_id, purchase_id
    """,
)
def q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: clicks with their
    within-the-hour purchases, plus NULL rows for clicks that
    provably have none.

    Outer semantics on streams are watermark-driven: a null-matched
    click can only be EMITTED once its match window is fully below
    the event-time watermark (c_ts + 1h < watermark) — unmatched
    clicks younger than that stay in state awaiting a possible future
    purchase, and a bounded availableNow drain never emits them. The
    GLOBAL watermark is min over ALL inputs of (per-stream max event
    time − delay), at Spark's millisecond watermark precision — here
    min(max click ts, max purchase ts) − 2h, which the oracle mirrors
    exactly (verified value-exact incl. every null row). This
    closed-world subtlety is why outer stream joins surprise people.
    """
    clicks = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")).alias("lag_us"),
    )
    name = run_to_memory_table(
        joined,
        output_mode="append",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
    return spark.table(name).orderBy("click_id", "purchase_id")
