"""Window-function operators (SURVEY.md §2.C rows C10–C13).

Window partitioning note for 100 TB: every window below partitions by a
high-cardinality key (user_id, group key) so state per partition stays
bounded; none uses a global (unpartitioned) window, which would funnel
the table through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query


# --------------------------------------------------------------------------
# C10: ranking functions with tie-aware semantics
# --------------------------------------------------------------------------


@query(
    "q_part_size_ranks",
    oracle="""
    SELECT p_partkey,
           p_brand,
           p_size,
           row_number()   OVER w_unique AS rn,
           rank()         OVER w_ties   AS rnk,
           dense_rank()   OVER w_ties   AS drnk,
           ntile(4)       OVER w_unique AS quartile,
           percent_rank() OVER w_ties   AS prank
    FROM part
    WINDOW w_unique AS (PARTITION BY p_brand ORDER BY p_size, p_partkey),
           w_ties   AS (PARTITION BY p_brand ORDER BY p_size)
    ORDER BY p_brand, p_size, p_partkey
    """,
)
def q_part_size_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile/percent_rank per brand.

    Two window specs on purpose: rank-family over the tie-ful key
    (p_size) exercises real tie semantics; row_number/ntile need a
    total order so p_partkey breaks ties deterministically.
    """
    p = load_table(spark, sf_dir, "part")
    w_unique = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    w_ties = Window.partitionBy("p_brand").orderBy("p_size")
    return p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.ntile(4).over(w_unique).alias("quartile"),
        F.percent_rank().over(w_ties).alias("prank"),
    ).orderBy("p_brand", "p_size", "p_partkey")


@query(
    "q_top3_orders_per_status",
    oracle="""
    SELECT o_orderstatus, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderstatus, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    )
    WHERE rn <= 3
    ORDER BY o_orderstatus, rn
    """,
)
def q_top3_orders_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: the canonical row_number ≤ k pattern.

    Tie-safe: the window order is (price DESC, key ASC) — a total
    order, so the same 3 rows surface on any engine/partitioning.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderstatus",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_orderstatus", "rn")
    )


# --------------------------------------------------------------------------
# C11: lag/lead analytics
# --------------------------------------------------------------------------


@query(
    "q_event_value_deltas",
    oracle="""
    SELECT user_id, event_id, value,
           value - lag(value) OVER w AS delta,
           lead(event_id) OVER w AS next_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    ORDER BY user_id, event_id
    """,
)
def q_event_value_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user deltas via lag/lead ordered by the unique event_id.

    (Ordering by event_id, not ts: the ns→µs truncation Spark applies
    to the events timestamps can never reorder an integer key.)
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.lead("event_id").over(w).alias("next_event_id"),
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# C12: explicit frame (moving aggregate, decimal-exact)
# --------------------------------------------------------------------------


@query(
    "q_moving_value_sum",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS moving_sum,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS frame_n
    FROM events
    ORDER BY user_id, event_id
    """,
)
def q_moving_value_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving sum per user (ROWS BETWEEN 2 PRECEDING AND CURRENT)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("moving_sum"),
        F.count(F.lit(1)).over(w).alias("frame_n"),
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------
# C13: cumulative aggregate over time
# --------------------------------------------------------------------------


@query(
    "q_cumulative_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(38,6))) OVER (
             ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS cum_revenue
    FROM daily
    ORDER BY month
    """,
)
def q_cumulative_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue + running total.

    The unpartitioned window is safe here because it runs over the
    *aggregated* series (≤ one row per month) — the pattern at scale:
    reduce first, window over the small result.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("revenue"))
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "month",
        "revenue",
        F.sum(F.col("revenue").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("cum_revenue"),
    ).orderBy("month")


# --------------------------------------------------------------------------
# C11 variant: first/last over an explicit full-partition frame
# --------------------------------------------------------------------------


@query(
    "q_first_last_event_per_user",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id)  OVER w AS last_event,
           first_value(value)    OVER w AS first_value,
           last_value(value)     OVER w AS last_value
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    ORDER BY user_id
    """,
)
def q_first_last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with the full-partition frame (the classic
    default-frame gotcha: without UNBOUNDED FOLLOWING, last_value is
    just the current row — both engines get the explicit frame)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        e.select(
            "user_id",
            F.first("event_id").over(w).alias("first_event"),
            F.last("event_id").over(w).alias("last_event"),
            F.first("value").over(w).alias("first_value"),
            F.last("value").over(w).alias("last_value"),
        )
        .distinct()
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Sequential funnel over events (view → click-after-view →
# purchase-after-click) — the event-analytics composition of
# conditional aggregates + stage joins.
# --------------------------------------------------------------------------


@query(
    "q_event_funnel",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts
      FROM events
    ),
    v AS (
      SELECT user_id, MIN(ts) AS tv FROM e
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS tc
      FROM e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.tv
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS tp
      FROM e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.tc
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel: first view, first click at-or-after it,
    first purchase at-or-after that. Each stage is an aggregate join of
    the previous stage's per-user frontier — stage tables shrink
    monotonically, so each join's build side is the (small) funnel
    survivors, broadcastable at any event volume."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        e.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") >= F.col("tv"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        e.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") >= F.col("tc"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("tp"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )


# --------------------------------------------------------------------------
# C12b: time-RANGE window frames (interval lookback, not row counts)
# --------------------------------------------------------------------------


@query(
    "q_range_frame_rolling_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(date_trunc('microseconds', ts) AS TIMESTAMP) AS ts,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY user_id
             ORDER BY epoch_us(date_trunc('microseconds', ts))
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_1h_sum
    FROM events
    WHERE user_id < 100
    ORDER BY user_id, ts, event_id
    """,
)
def q_range_frame_rolling_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour value sum with a RANGE frame over event
    time — the feature-engineering window row-count frames
    (q_moving_value_sum) cannot express: the lookback is an interval,
    so a burst of events widens the frame and a quiet hour empties it.

    RANGE frames need a numeric ordering key: event time as epoch
    microseconds (int64). State per partition is one running frame
    (two pointers) — O(frame) memory per user; user_id is the usual
    uniform high-cardinality partition key. The frame sum accumulates
    DECIMAL(38,6), so frame-merge order cannot produce float drift —
    same exactness contract as the grouped aggregates. Ties in ts:
    RANGE includes all peers — order-insensitive by construction.
    """
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 100)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            "ts",
            F.sum(F.col("value").cast("decimal(38,6)"))
            .over(w)
            .cast("double")
            .alias("rolling_1h_sum"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


_SQL_SCD2 = """
    e AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WHERE user_id < 50
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    v AS (
      SELECT *,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version_no
      FROM e
    ),
    runs AS (
      SELECT user_id, version_no,
             MIN(event_type) AS state,
             MIN(ts) AS valid_from,
             COUNT(*) AS n_events
      FROM v
      GROUP BY user_id, version_no
    ),
    vers AS (
      SELECT user_id, CAST(version_no AS BIGINT) AS version_no, state,
             valid_from,
             lead(valid_from) OVER (PARTITION BY user_id
                                    ORDER BY version_no) AS valid_to,
             n_events
      FROM runs
    )"""


def _scd2_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned user-state history (the vers CTE): one row per
    (user, state run) with [valid_from, valid_to) effective dating."""
    e = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        F.when(
            ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
        ).otherwise(0)
    )
    v = e.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.sum(chg).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("version_no"),
    )
    runs = v.groupBy("user_id", "version_no").agg(
        F.min("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version_no")
    return runs.select(
        "user_id",
        F.col("version_no").cast("bigint").alias("version_no"),
        "state",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
    )


@query(
    "q_scd2_user_state",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WHERE user_id < 50
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    v AS (
      SELECT *,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS version_no
      FROM e
    ),
    runs AS (
      SELECT user_id, version_no,
             MIN(event_type) AS state,
             MIN(ts) AS valid_from,
             COUNT(*) AS n_events
      FROM v
      GROUP BY user_id, version_no
    )
    SELECT user_id, CAST(version_no AS BIGINT) AS version_no, state,
           valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY version_no) AS valid_to,
           n_events
    FROM runs
    ORDER BY user_id, version_no
    """,
)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 state history via gaps-and-islands: consecutive
    events with the same event_type collapse into one version row with
    [valid_from, valid_to) effective dating (valid_to NULL on the open
    version) — the run-length/temporal-versioning pattern warehouses
    use for slowly changing dimensions, built from a change flag
    (lag), a cumulative version counter, a per-run rollup, and a lead
    over versions.

    Scale: every window/aggregate keys on user_id — ONE partition
    domain end to end, so AQE sees a single uniform shuffle; the runs
    relation is versions-sized (<= events), and nothing is collected.
    Ties in ts break on event_id in both engines, keeping the change
    flags — and therefore every version boundary — deterministic.
    """
    return _scd2_versions(spark, sf_dir).orderBy("user_id", "version_no")


_SNAPSHOT_TS = "2024-01-15 00:00:00"


@query(
    "q_scd2_asof_snapshot",
    oracle=f"""
    WITH {_SQL_SCD2}
    SELECT user_id, version_no, state, valid_from, n_events
    FROM vers
    WHERE valid_from <= TIMESTAMP '{_SNAPSHOT_TS}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_SNAPSHOT_TS}')
    ORDER BY user_id
    """,
)
def q_scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read over the SCD2 history: the state of every
    tracked user AS OF one instant — the version row whose
    [valid_from, valid_to) interval covers the snapshot timestamp.
    The warehouse "what did the dimension look like on the 15th"
    query; exactly one row per user active by then, by construction
    of the non-overlapping version intervals.

    Scale: at 100 TB the history table is valid_from-sorted per user;
    the snapshot predicate prunes to one version per user without a
    window re-scan (the filter sits above the version build here
    because the history is derived inline; a materialized SCD2 table
    makes this a pure scan + filter)."""
    v = _scd2_versions(spark, sf_dir)
    ts = F.lit(_SNAPSHOT_TS).cast("timestamp")
    return (
        v.where(
            (F.col("valid_from") <= ts)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
        )
        .select("user_id", "version_no", "state", "valid_from", "n_events")
        .orderBy("user_id")
    )
