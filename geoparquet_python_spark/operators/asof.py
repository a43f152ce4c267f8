"""As-of (nearest-time) join — SURVEY.md §2.B row B7, one of the few
operators Spark SQL lacks natively. Two implementations with identical
semantics (latest left-row at-or-before each right-row per key):

1. union + window `last(ignorenulls)` — pure built-ins, sort-based,
   scales to any size (shuffle on user key + per-partition sort).
2. `applyInPandas` + `pd.merge_asof` per key group — the grouped-map
   escape hatch (reference-style row-at-a-time logic, but Arrow-batched
   per group).

Oracle: DuckDB's native ASOF LEFT JOIN (timestamps truncated to µs on
both sides since Spark stores µs).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_ASOF_ORACLE = """
    WITH p AS (
      SELECT event_id, user_id, date_trunc('microseconds', ts) AS tsu
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id, user_id, date_trunc('microseconds', ts) AS tsu
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_event_id,
           p.user_id,
           c.event_id AS click_event_id,
           epoch_us(p.tsu) - epoch_us(c.tsu) AS lag_us
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.tsu <= p.tsu
    ORDER BY purchase_event_id
"""


def _backward_asof(
    spark: SparkSession, sf_dir: str, tie_lowest: bool = False
) -> DataFrame:
    """Backward as-of join via union + last(ignorenulls) window.

    Interleave clicks and purchases per user ordered by (ts, kind):
    each purchase row then reads the latest preceding click with
    last('click_id', ignorenulls) over an unbounded-preceding frame.
    One shuffle on user_id; no per-group Python. kind orders clicks
    before purchases at equal timestamps → inclusive (≤) semantics,
    matching ASOF and merge_asof defaults.

    `tie_lowest` controls which click wins when several share the
    nearest backward timestamp: False → highest event_id (the default
    last-in-window behavior, matching DuckDB's native ASOF JOIN on
    this data), True → lowest event_id (descending third sort key, so
    last() lands on the smallest id — what the NEAREST oracle's
    `ORDER BY abs(..), tsu, event_id LIMIT 1` rule requires).
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts"),
        F.lit(0).alias("kind"),
        F.col("event_id").alias("click_event_id"),
        F.lit(None).cast("long").alias("purchase_event_id"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("click_event_id"),
        F.col("event_id").alias("purchase_event_id"),
    )
    tie_key = (
        F.col("click_event_id").desc_nulls_last()
        if tie_lowest
        else F.col("click_event_id").asc_nulls_last()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("kind").asc(), tie_key)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = clicks.unionByName(purchases).select(
        "user_id",
        "ts",
        "purchase_event_id",
        F.last("click_event_id", ignorenulls=True).over(w).alias("click_event_id"),
        F.last(
            F.when(F.col("click_event_id").isNotNull(), F.col("ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("click_ts"),
    )
    return (
        merged.where(F.col("purchase_event_id").isNotNull())
        .select(
            "purchase_event_id",
            "user_id",
            "click_event_id",
            (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("lag_us"),
        )
        .orderBy("purchase_event_id")
    )


@query("q_asof_purchase_click", oracle=_ASOF_ORACLE)
def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via union + last(ignorenulls) window (the scale
    path) — see `_backward_asof` for mechanics."""
    return _backward_asof(spark, sf_dir)


_ASOF_SCHEMA = (
    "purchase_event_id bigint, user_id bigint, click_event_id bigint, lag_us bigint"
)


def _merge_asof_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-user merge_asof (backward, inclusive) on µs timestamps."""
    p = (
        pdf[pdf.event_type == "purchase"][["event_id", "user_id", "ts"]]
        .rename(columns={"event_id": "purchase_event_id"})
        .sort_values("ts")
    )
    c = (
        pdf[pdf.event_type == "click"][["event_id", "ts"]]
        .rename(columns={"event_id": "click_event_id", "ts": "click_ts"})
        .sort_values("click_ts")
    )
    if p.empty:
        return pd.DataFrame(columns=["purchase_event_id", "user_id", "click_event_id", "lag_us"])
    m = pd.merge_asof(
        p, c, left_on="ts", right_on="click_ts", direction="backward"
    )
    m["lag_us"] = ((m["ts"] - m["click_ts"]) // pd.Timedelta(microseconds=1)).astype(
        "Int64"
    )
    m["click_event_id"] = m["click_event_id"].astype("Int64")
    return m[["purchase_event_id", "user_id", "click_event_id", "lag_us"]]


@query("q_asof_purchase_click_grouped", oracle=_ASOF_ORACLE)
def q_asof_purchase_click_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of join via groupBy(user).applyInPandas(pd.merge_asof).

    The grouped-map form: each user's events arrive as one Arrow batch.
    Right for moderate per-key volumes / when the per-group logic is
    genuinely imperative; the window form above wins when groups are
    huge or skewed.
    """
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    out = e.groupBy("user_id").applyInPandas(
        lambda pdf: _merge_asof_group(pdf), _ASOF_SCHEMA
    )
    return out.orderBy("purchase_event_id")


@query(
    "q_asof_purchase_click_forward",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, date_trunc('microseconds', ts) AS tsu
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id, user_id, date_trunc('microseconds', ts) AS tsu
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_event_id,
           p.user_id,
           cc.event_id AS click_event_id,
           epoch_us(cc.tsu) - epoch_us(p.tsu) AS lead_us
    FROM p LEFT JOIN LATERAL (
      SELECT event_id, tsu FROM c
      WHERE c.user_id = p.user_id AND c.tsu >= p.tsu
      ORDER BY tsu, event_id LIMIT 1
    ) cc ON TRUE
    ORDER BY purchase_event_id
    """,
)
def q_asof_purchase_click_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward'):
    for each purchase, the EARLIEST click at-or-after it per user —
    the 'what happened next' enrichment (post-purchase behavior,
    next-heartbeat, retry attribution), completing the direction
    surface next to the backward form above.

    Same union + window mechanics mirrored: clicks sort AFTER
    purchases at equal timestamps (kind 1 vs 0 → inclusive >=), and
    each purchase reads first(click, ignorenulls) over the
    [current row, unbounded following] frame — still ONE shuffle on
    the user key, no Python. Ties at equal click ts break to the
    lowest event_id on both engines (the window's third sort key;
    the oracle's LATERAL ORDER BY ... LIMIT 1).
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("click_event_id"),
        F.col("event_id").alias("purchase_event_id"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts"),
        F.lit(1).alias("kind"),
        F.col("event_id").alias("click_event_id"),
        F.lit(None).cast("long").alias("purchase_event_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "click_event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    merged = purchases.unionByName(clicks).select(
        "user_id",
        "ts",
        "purchase_event_id",
        F.first("click_event_id", ignorenulls=True).over(w).alias(
            "click_event_id"
        ),
        F.first(
            F.when(F.col("click_event_id").isNotNull(), F.col("ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("click_ts"),
    )
    return (
        merged.where(F.col("purchase_event_id").isNotNull())
        .select(
            "purchase_event_id",
            "user_id",
            "click_event_id",
            (F.unix_micros("click_ts") - F.unix_micros("ts")).alias(
                "lead_us"
            ),
        )
        .orderBy("purchase_event_id")
    )


@query(
    "q_asof_purchase_click_nearest",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, date_trunc('microseconds', ts) AS tsu
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id, user_id, date_trunc('microseconds', ts) AS tsu
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id AS purchase_event_id,
           p.user_id,
           cc.event_id AS click_event_id,
           epoch_us(cc.tsu) - epoch_us(p.tsu) AS delta_us
    FROM p LEFT JOIN LATERAL (
      SELECT event_id, tsu FROM c
      WHERE c.user_id = p.user_id
      ORDER BY abs(epoch_us(c.tsu) - epoch_us(p.tsu)), tsu, event_id
      LIMIT 1
    ) cc ON TRUE
    ORDER BY purchase_event_id
    """,
)
def q_asof_purchase_click_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (merge_asof direction='nearest'): per
    purchase, the click with the smallest ABSOLUTE time distance,
    either side. Completes the direction trio; tie at equal distance
    breaks to the earlier click then lower event_id (documented —
    pandas leaves it unspecified).

    Composed from the two directional forms rather than re-derived:
    backward and forward candidates each come from their single-
    shuffle window pass, then one CASE picks the closer — the same
    user-key partitioning throughout, so composing adds joins on
    already-co-partitioned frames, not new corpus shuffles. The
    oracle's LATERAL is the spec, not the plan (it scans each user's
    clicks per purchase — fine at oracle scale, never run at corpus
    scale).

    The backward candidate uses the tie_lowest variant: among clicks
    sharing the nearest timestamp, the LOWEST event_id wins, matching
    the oracle's `ORDER BY abs(..), tsu, event_id LIMIT 1` rule (the
    plain backward query keeps DuckDB-ASOF's highest-id behavior).
    """
    back = _backward_asof(spark, sf_dir, tie_lowest=True).select(
        "purchase_event_id",
        "user_id",
        F.col("click_event_id").alias("b_click"),
        F.col("lag_us").alias("b_lag"),
    )
    fwd = q_asof_purchase_click_forward(spark, sf_dir).select(
        F.col("purchase_event_id"),
        F.col("click_event_id").alias("f_click"),
        F.col("lead_us").alias("f_lead"),
    )
    j = back.join(fwd, "purchase_event_id")
    # b_lag >= 0 measures backward distance; f_lead >= 0 forward.
    # Prefer backward on ties (the earlier click).
    pick_back = F.col("f_click").isNull() | (
        F.col("b_click").isNotNull() & (F.col("b_lag") <= F.col("f_lead"))
    )
    return j.select(
        "purchase_event_id",
        "user_id",
        F.when(pick_back, F.col("b_click"))
        .otherwise(F.col("f_click"))
        .alias("click_event_id"),
        F.when(pick_back, -F.col("b_lag"))
        .otherwise(F.col("f_lead"))
        .alias("delta_us"),
    ).orderBy("purchase_event_id")
