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
    table_rows,
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
    name = run_to_memory_table(
        agg,
        output_mode="complete",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
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
    name = run_to_memory_table(
        agg,
        output_mode="complete",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
    return (
        spark.table(name)
        .where(F.col("last_op") != _TOMBSTONE)
        .select("user_id", "last_ts", "last_value", "n_ops")
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Streaming drift monitor: daily PSI vs a static reference histogram
# --------------------------------------------------------------------------


@query(
    "q_stream_psi_daily_drift",
    oracle=f"""
    WITH ref AS (
      SELECT event_type,
             CAST(LEAST(CAST(floor(value / 50.0) AS BIGINT), 9) AS BIGINT)
               AS b,
             CAST(COUNT(*) AS BIGINT) AS n_ref
      FROM events WHERE day(ts) <= 15
      GROUP BY 1, 2
    ),
    live AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
             event_type,
             CAST(LEAST(CAST(floor(value / 50.0) AS BIGINT), 9) AS BIGINT)
               AS b,
             CAST(COUNT(*) AS BIGINT) AS n_live
      FROM events WHERE day(ts) > 15
      GROUP BY 1, 2, 3
    ),
    days AS (SELECT DISTINCT day_start, event_type FROM live),
    cells AS (
      SELECT d.day_start, d.event_type, r.range AS b
      FROM days d CROSS JOIN range(10) r
    ),
    dense AS (
      SELECT c.day_start, c.event_type, c.b,
             COALESCE(rf.n_ref, 0) AS n_ref,
             COALESCE(lv.n_live, 0) AS n_live
      FROM cells c
      LEFT JOIN ref rf ON rf.event_type = c.event_type AND rf.b = c.b
      LEFT JOIN live lv ON lv.day_start = c.day_start
                       AND lv.event_type = c.event_type AND lv.b = c.b
    ),
    tots AS (
      SELECT day_start, event_type,
             CAST(SUM(n_ref) AS BIGINT) AS tot_ref,
             CAST(SUM(n_live) AS BIGINT) AS tot_live
      FROM dense GROUP BY 1, 2
    ),
    contribs AS (
      SELECT d.day_start, d.event_type,
             CAST(round(((d.n_ref + 1.0) / (t.tot_ref + 10)
                         - (d.n_live + 1.0) / (t.tot_live + 10))
                        * 1000000) AS BIGINT)
             * CAST(round(ln(((d.n_ref + 1.0) * (t.tot_live + 10))
                            / ((d.n_live + 1.0) * (t.tot_ref + 10)))
                          * 1000000) AS BIGINT) AS c_pico,
             d.n_live
      FROM dense d JOIN tots t
        ON t.day_start = d.day_start AND t.event_type = d.event_type
    )
    SELECT day_start, event_type,
           CAST(SUM(c_pico) AS BIGINT) AS psi_pico,
           CAST(SUM(n_live) AS BIGINT) AS n_live
    FROM contribs
    GROUP BY 1, 2
    ORDER BY day_start, event_type
    """,
)
def q_stream_psi_daily_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor: the live stream's per-day value
    histogram against the static first-half-of-month reference, scored
    as PSI per (day, event_type) — the continuous version of
    q_psi_value_drift (operators/dataquality.py), and the alarm a
    model-ops pipeline keeps on its features.

    Two-phase serving split (module docstring): the STREAMING piece is
    the daily tumbling-window (type, bucket) count — strictly
    additive, state = |windows × types × 10| rows, watermark-bounded
    — and the PSI composition (dense grid, reference join, smoothed
    fixed-point contributions) is a batch query over the materialized
    counts plus the tiny static reference histogram. Same determinism
    treatment as the batch PSI: both factors fixed-pointed separately,
    contributions exact int64 in 1e-12 units.
    """
    from geoparquet_python_spark.io import load_table

    bucket = lambda col: F.least(  # noqa: E731
        F.floor(col / 50.0).cast("bigint"), F.lit(9).cast("bigint")
    )
    stream = read_events_stream(spark, sf_dir).where(F.dayofmonth("ts") > 15)
    live_counts = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 day").alias("w"),
            "event_type",
            bucket(F.col("value")).alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("n_live"))
        .select(
            F.col("w.start").alias("day_start"), "event_type", "b", "n_live"
        )
    )
    name = run_to_memory_table(
        live_counts,
        output_mode="complete",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
    # Two independent scans of the materialized view: `days` feeds the
    # dense grid and `live` is the join side — reading the table twice
    # gives each branch its own attribute ids (a shared frame would
    # hit Spark's conflicting-reference error in the self-join).
    live = spark.table(name)
    days_src = spark.table(name)

    ref = (
        load_table(spark, sf_dir, "events")
        .where(F.dayofmonth("ts") <= 15)
        .groupBy("event_type", bucket(F.col("value")).alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ref"))
    )
    # Aliasing through fresh names mints new attribute ids for the
    # grid branch (two scans of the same temp view share expr ids,
    # which the later three-way join rejects as conflicting refs).
    days = days_src.select(
        F.col("day_start").alias("g_day"),
        F.col("event_type").alias("g_type"),
    ).distinct()
    cells = days.select(
        F.col("g_day").alias("day_start"),
        F.col("g_type").alias("event_type"),
        F.explode(
            F.array(*[F.lit(i).cast("bigint") for i in range(10)])
        ).alias("b"),
    )
    dense = (
        cells.join(ref, ["event_type", "b"], "left")
        .join(live, ["day_start", "event_type", "b"], "left")
        .select(
            "day_start",
            "event_type",
            "b",
            F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce("n_live", F.lit(0)).cast("bigint").alias("n_live"),
        )
    )
    tots = dense.groupBy("day_start", "event_type").agg(
        F.sum("n_ref").cast("bigint").alias("tot_ref"),
        F.sum("n_live").cast("bigint").alias("tot_live"),
    )
    j = dense.join(tots, ["day_start", "event_type"])
    dp = F.round(
        (
            (F.col("n_ref") + 1.0) / (F.col("tot_ref") + 10)
            - (F.col("n_live") + 1.0) / (F.col("tot_live") + 10)
        )
        * 1e6
    ).cast("bigint")
    lnr = F.round(
        F.log(
            ((F.col("n_ref") + 1.0) * (F.col("tot_live") + 10))
            / ((F.col("n_live") + 1.0) * (F.col("tot_ref") + 10))
        )
        * 1e6
    ).cast("bigint")
    return (
        j.select(
            "day_start", "event_type", (dp * lnr).alias("c_pico"), "n_live"
        )
        .groupBy("day_start", "event_type")
        .agg(
            F.sum("c_pico").cast("bigint").alias("psi_pico"),
            F.sum("n_live").cast("bigint").alias("n_live"),
        )
        .orderBy("day_start", "event_type")
    )
