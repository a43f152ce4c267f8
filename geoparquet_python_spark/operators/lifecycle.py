"""User-lifecycle analytics over the event log: Kaplan-Meier
retention survival, RFM segmentation, and a right-to-be-forgotten
erasure-cascade audit.

Reference parity: none (SURVEY.md §0.2 — nil surface beyond
GeoParquet I/O); [N] extension scope — lifecycle readouts are the
standard product-analytics workload an engine of this shape serves,
and the erasure audit is the governance twin of the privacy module.

Exactness strategy per query:
- Kaplan-Meier: the product-limit estimator S(t) = prod(1 - d_i/n_i)
  is a cumulative PRODUCT — order-sensitive in floating point. We
  lattice each factor's ln to 1e-6 ppm int64 (the sigmoid/haversine
  rounding precedent) and take the cumulative INTEGER sum, which is
  exact and order-free; exp of the latticed sum (rounded back to the
  1e-6 grid) is the reported curve. Zero factors (everyone remaining
  dies at t_i) are tracked by an integer flag so ln never sees 0.
- RFM: pure integers (epoch-second arithmetic, cents, counts);
  quartile thresholds come from the distinct-value cumulative-count
  pattern (the Huber-median machinery), never a corpus sort.
- Erasure: set algebra on the md5-derived deletion cohort with the
  completeness check (no deleted user survives) certified in-plan.

Scale shapes: every query is user-keyed aggregation (map-side
combined) followed by arithmetic on BOUNDED frames — distinct
lifetime days (<= observation span), distinct metric values, or
|event_type| rows. Nothing pairwise, nothing driver-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import broadcast_narrow, materialize
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_CENSOR_S = 259_200  # 72h: users active this close to the data edge
# are censored (still alive), not churned


_SQL_KM_BASE = f"""
    gmax AS (
      SELECT CAST(epoch(MAX(ts)) AS BIGINT) AS ge FROM events
    ),
    per_u AS (
      SELECT user_id,
             CAST(epoch(MIN(ts)) AS BIGINT) AS ef,
             CAST(epoch(MAX(ts)) AS BIGINT) AS el
      FROM events GROUP BY user_id
    ),
    lif AS (
      SELECT (el - ef) // 86400 AS t,
             CASE WHEN el <= ge - {_CENSOR_S} THEN 1 ELSE 0 END AS ev
      FROM per_u CROSS JOIN gmax
    ),
    per_t AS (
      SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(COUNT(*) - SUM(ev) AS BIGINT) AS c
      FROM lif GROUP BY t
    ),
    nn AS (SELECT CAST(SUM(d + c) AS BIGINT) AS n FROM per_t),
    risk AS (
      SELECT t, d, c,
             n - CAST(COALESCE(SUM(d + c) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS n_risk
      FROM per_t CROSS JOIN nn
    ),
    fac AS (
      SELECT t, d, c, n_risk,
             CASE WHEN d < n_risk THEN
               CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                          * 1000000.0) AS BIGINT)
             ELSE 0 END AS lnppm,
             CASE WHEN d >= n_risk THEN 1 ELSE 0 END AS zf
      FROM risk
    ),
    curve AS (
      SELECT t, d, c, n_risk,
             CAST(SUM(lnppm) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(SUM(zf) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS zcum
      FROM fac
    )"""


@query(
    "q_survival_km_retention",
    oracle=f"""
    WITH {_SQL_KM_BASE}
    SELECT t AS t_days, n_risk, d AS churned, c AS censored,
           CASE WHEN zcum > 0 THEN 0.0
                ELSE round(exp(CAST(cum AS DOUBLE) / 1000000.0), 6)
           END AS survival
    FROM curve ORDER BY t_days
    """,
)
def q_survival_km_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention curve over user lifetimes (days from
    first to last event; users still active within 72h of the data
    edge are right-censored): at-risk counts, churn/censor counts and
    the product-limit survival estimate per distinct lifetime day.
    The estimator every retention dashboard plots, with censoring
    handled correctly instead of the naive cohort ratio
    (q_user_cohort_retention is the naive twin).

    Plan: ONE user-keyed min/max aggregate -> a distinct-lifetime
    frame bounded by the observation span in days (<= 30 here, <= a
    few thousand at any realistic horizon) -> windows on that tiny
    frame. The cumulative product runs as an exact integer ppm-log
    sum (module docstring), so the curve is bit-identical across
    engines and partitionings."""
    e = load_table(spark, sf_dir, "events")
    gmax = e.agg(
        F.expr("CAST(unix_timestamp(MAX(ts)) AS BIGINT)").alias("ge")
    )
    per_u = e.groupBy("user_id").agg(
        F.expr("CAST(unix_timestamp(MIN(ts)) AS BIGINT)").alias("ef"),
        F.expr("CAST(unix_timestamp(MAX(ts)) AS BIGINT)").alias("el"),
    )
    lif = per_u.crossJoin(broadcast_narrow(gmax)).select(
        F.expr("(el - ef) DIV 86400").alias("t"),
        F.expr(
            f"CASE WHEN el <= ge - {_CENSOR_S} THEN 1 ELSE 0 END"
        ).alias("ev"),
    )
    per_t = lif.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        (F.count(F.lit(1)) - F.sum("ev")).cast("bigint").alias("c"),
    )
    nn = per_t.agg(F.sum(F.col("d") + F.col("c")).cast("bigint").alias("n"))
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = per_t.crossJoin(broadcast_narrow(nn)).select(
        "t",
        "d",
        "c",
        (
            F.col("n")
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wprev), F.lit(0))
        )
        .cast("bigint")
        .alias("n_risk"),
    )
    fac = risk.select(
        "t",
        "d",
        "c",
        "n_risk",
        F.expr(
            "CASE WHEN d < n_risk THEN"
            " CAST(round(ln(1.0 - CAST(d AS DOUBLE) / n_risk)"
            " * 1000000.0) AS BIGINT) ELSE 0 END"
        ).alias("lnppm"),
        F.expr("CASE WHEN d >= n_risk THEN 1 ELSE 0 END").alias("zf"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    curve = fac.select(
        "t",
        "d",
        "c",
        "n_risk",
        F.sum("lnppm").over(wcum).cast("bigint").alias("cum"),
        F.sum("zf").over(wcum).cast("bigint").alias("zcum"),
    )
    return curve.select(
        F.col("t").alias("t_days"),
        "n_risk",
        F.col("d").alias("churned"),
        F.col("c").alias("censored"),
        F.expr(
            "CASE WHEN zcum > 0 THEN 0.0"
            " ELSE round(exp(CAST(cum AS DOUBLE) / 1000000.0), 6) END"
        ).alias("survival"),
    ).orderBy("t_days")


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------


def _sql_q_threshold(metric_rel: str, qnum: int) -> str:
    """Smallest distinct value whose cumulative user count reaches
    ceil(n * qnum / 4) — the exact ceil-rank quartile boundary."""
    return f"""(
      SELECT MIN(v) FROM (
        SELECT v, CAST(SUM(cnt) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS crun
        FROM {metric_rel}
      ) CROSS JOIN un
      WHERE crun >= (n * {qnum} + 3) // 4
    )"""


_SQL_RFM_BASE = """
    gmax AS (
      SELECT CAST(epoch(MAX(ts)) AS BIGINT) AS ge FROM events
    ),
    per_u AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS fr,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mo,
             CAST(MAX(epoch(ts)) AS BIGINT) AS el
      FROM events GROUP BY user_id
    ),
    rfm AS (
      SELECT user_id, (ge - el) // 86400 AS re, fr, mo
      FROM per_u CROSS JOIN gmax
    ),
    un AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rfm),
    vr AS (SELECT re AS v, COUNT(*) AS cnt FROM rfm GROUP BY 1),
    vf AS (SELECT fr AS v, COUNT(*) AS cnt FROM rfm GROUP BY 1),
    vm AS (SELECT mo AS v, COUNT(*) AS cnt FROM rfm GROUP BY 1)"""


@query(
    "q_rfm_segments",
    oracle=f"""
    WITH {_SQL_RFM_BASE},
    th AS (
      SELECT {_sql_q_threshold('vr', 1)} AS r1,
             {_sql_q_threshold('vr', 2)} AS r2,
             {_sql_q_threshold('vr', 3)} AS r3,
             {_sql_q_threshold('vf', 1)} AS f1,
             {_sql_q_threshold('vf', 2)} AS f2,
             {_sql_q_threshold('vf', 3)} AS f3,
             {_sql_q_threshold('vm', 1)} AS m1,
             {_sql_q_threshold('vm', 2)} AS m2,
             {_sql_q_threshold('vm', 3)} AS m3
    )
    SELECT CAST(1 + CAST(re > r1 AS INT) + CAST(re > r2 AS INT)
                + CAST(re > r3 AS INT) AS BIGINT) AS r_seg,
           CAST(1 + CAST(fr > f1 AS INT) + CAST(fr > f2 AS INT)
                + CAST(fr > f3 AS INT) AS BIGINT) AS f_seg,
           CAST(1 + CAST(mo > m1 AS INT) + CAST(mo > m2 AS INT)
                + CAST(mo > m3 AS INT) AS BIGINT) AS m_seg,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(mo) AS BIGINT) AS sum_cents
    FROM rfm CROSS JOIN th
    GROUP BY 1, 2, 3
    ORDER BY r_seg, f_seg, m_seg
    """,
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation: every user
    bucketed into exact quartiles of each metric, rolled up to
    segment counts + revenue — the classic lifecycle grid (4x4x4 max)
    marketing/retention systems key campaigns on. Quartile boundaries
    are exact ceil-rank order statistics from the DISTINCT-VALUE
    cumulative pattern (domains: <= span-days recency values,
    bounded frequency counts, distinct cent sums) — no corpus sort,
    no ntile window; the 9 thresholds broadcast onto the user frame
    as one narrow row. Pure integer arithmetic end to end."""
    e = load_table(spark, sf_dir, "events")
    gmax = e.agg(
        F.expr("CAST(unix_timestamp(MAX(ts)) AS BIGINT)").alias("ge")
    )
    per_u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("fr"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("mo"),
        F.expr("CAST(MAX(unix_timestamp(ts)) AS BIGINT)").alias("el"),
    )
    rfm = per_u.crossJoin(broadcast_narrow(gmax)).select(
        "user_id",
        F.expr("(ge - el) DIV 86400").alias("re"),
        "fr",
        "mo",
    )
    rfm = materialize(rfm)
    un = rfm.agg(F.count(F.lit(1)).cast("bigint").alias("n"))

    def thresholds(col: str, prefix: str) -> DataFrame:
        per_v = rfm.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        wc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
        cum = per_v.select(
            "v", F.sum("cnt").over(wc).cast("bigint").alias("crun")
        ).crossJoin(broadcast_narrow(un))
        aggs = [
            F.min(
                F.when(
                    F.col("crun") >= F.expr(f"(n * {q} + 3) DIV 4"),
                    F.col("v"),
                )
            ).alias(f"{prefix}{q}")
            for q in (1, 2, 3)
        ]
        return cum.agg(*aggs)

    th = (
        thresholds("re", "r")
        .crossJoin(broadcast_narrow(thresholds("fr", "f")))
        .crossJoin(broadcast_narrow(thresholds("mo", "m")))
    )
    seg = rfm.crossJoin(broadcast_narrow(th)).select(
        F.expr(
            "CAST(1 + CAST(re > r1 AS INT) + CAST(re > r2 AS INT)"
            " + CAST(re > r3 AS INT) AS BIGINT)"
        ).alias("r_seg"),
        F.expr(
            "CAST(1 + CAST(fr > f1 AS INT) + CAST(fr > f2 AS INT)"
            " + CAST(fr > f3 AS INT) AS BIGINT)"
        ).alias("f_seg"),
        F.expr(
            "CAST(1 + CAST(mo > m1 AS INT) + CAST(mo > m2 AS INT)"
            " + CAST(mo > m3 AS INT) AS BIGINT)"
        ).alias("m_seg"),
        "mo",
    )
    return (
        seg.groupBy("r_seg", "f_seg", "m_seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("mo").cast("bigint").alias("sum_cents"),
        )
        .orderBy("r_seg", "f_seg", "m_seg")
    )


# ---------------------------------------------------------------------------
# Right-to-be-forgotten erasure cascade
# ---------------------------------------------------------------------------

_DEL_MOD = 13  # content-addressed deletion cohort; non-empty
# at every driver scale (1 / 13 / 104 users at sf0.001/0.01/0.1)


@query(
    "q_user_erasure_cascade",
    oracle=f"""
    WITH dels AS (
      SELECT DISTINCT user_id FROM events
      WHERE CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % {_DEL_MOD} = 0
    ),
    tagged AS (
      SELECT e.event_type, e.user_id,
             CASE WHEN d.user_id IS NOT NULL THEN 1 ELSE 0 END AS del
      FROM events e LEFT JOIN dels d ON e.user_id = d.user_id
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(del) AS BIGINT) AS n_removed,
           CAST(COUNT(*) - SUM(del) AS BIGINT) AS n_remaining,
           CAST(COUNT(DISTINCT CASE WHEN del = 1 THEN user_id END)
                AS BIGINT) AS removed_users,
           TRUE AS residual_zero
    FROM tagged
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_user_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten audit: apply a content-addressed deletion
    cohort (~1% of users) to the event log and report, per event
    type, rows removed/remaining and distinct users erased — plus an
    in-plan completeness certificate: the ACTUAL post-delete frame
    (anti-join) is re-joined against the deletion list and must
    contain zero residual rows, so a broken cascade turns the TRUE
    column into a hash mismatch. This is the deletion-propagation job
    a governed 100 TB store runs on every erasure batch.

    Plan: the deletion cohort is a distinct-user frame broadcast into
    one semi/anti join pass; counts are one event_type-keyed
    aggregate. The certificate is a second broadcast join over the
    remaining rows — same pass shape, no shuffle growth."""
    e = load_table(spark, sf_dir, "events")
    dels = (
        e.select("user_id")
        .where(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % _DEL_MOD
            == 0
        )
        .distinct()
    )
    dels = materialize(dels)
    removed = e.join(broadcast_narrow(dels), "user_id", "left_semi")
    remaining = e.join(broadcast_narrow(dels), "user_id", "left_anti")
    residual = remaining.join(
        broadcast_narrow(dels), "user_id", "left_semi"
    ).agg(F.count(F.lit(1)).alias("resid"))
    rem_stats = removed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_removed"),
        F.countDistinct("user_id").cast("bigint").alias("removed_users"),
    )
    tot_stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    return (
        tot_stats.join(rem_stats, "event_type", "left")
        .crossJoin(broadcast_narrow(residual))
        .select(
            "event_type",
            "n_total",
            F.coalesce("n_removed", F.lit(0)).cast("bigint").alias(
                "n_removed"
            ),
            (F.col("n_total") - F.coalesce("n_removed", F.lit(0)))
            .cast("bigint")
            .alias("n_remaining"),
            F.coalesce("removed_users", F.lit(0)).cast("bigint").alias(
                "removed_users"
            ),
            (F.col("resid") == 0).alias("residual_zero"),
        )
        .orderBy("event_type")
    )
