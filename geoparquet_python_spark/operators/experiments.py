"""Experimentation analytics: CUPED variance-reduced A/B readout.

CUPED (Deng, Xu, Kohavi, Walker — WSDM 2013, "Improving the
Sensitivity of Online Controlled Experiments") is the workhorse of
every large experimentation platform: adjust each unit's experiment
metric y by its PRE-experiment covariate x,
``y_adj = y − θ·(x − x̄)`` with ``θ = Cov(x, y)/Var(x)``, which
preserves the treatment-effect estimate (assignment is independent
of pre-period behavior) while removing the variance x explains —
typically 30-70% narrower confidence intervals from data you already
have.

Variant assignment is the content-addressed split used everywhere in
this repo (md5 parity on user_id) — deterministic, reproducible,
balanced.

No reference equivalent (SURVEY.md §0 provenance) — [N] north-star
scope: offline experiment readout over event logs is a first-class
analytics-engine workload.

Exactness: per-user period sums are exact int64 cents; θ's numerator
``N·Σxy − Σx·Σy`` and denominator ``N·Σx² − (Σx)²`` accumulate in
DECIMAL(38,0) (the cents² second moments would crowd int64 past
~10× this event volume — decimal lanes are the documented headroom
plan, same as the bootstrap). The final means/θ are IEEE doubles
derived from those exact integers by correctly-rounded ops only
(convert, divide, multiply, subtract) applied identically in the
oracle — no float aggregation anywhere, so no order drift.

Scale shape (100 TB lens):
- ONE user-keyed conditional aggregate builds (x, y) per user — no
  pre/post self-join; partial aggregation is map-side.
- The pooled moments are a one-row aggregate broadcast back via
  crossJoin (the q_value_histogram shape); per-variant rollup is a
  2-group aggregate. After the user aggregate, nothing is larger
  than a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import broadcast_narrow
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_CUT = "2024-01-16 00:00:00"  # pre-period < cut <= experiment period


@query(
    "q_cuped_experiment_readout",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS variant,
             CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '{_CUT}'
                    THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS x,
             CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_CUT}'
                    THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))
               AS sxx,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
               AS sxy
      FROM per_user
    ),
    theta AS (
      SELECT n, sx,
             CAST(CAST(n AS DECIMAL(38,0)) * sxy
                  - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
             / CAST(CAST(n AS DECIMAL(38,0)) * sxx
                    - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) AS th
      FROM pooled
    )
    SELECT v.variant,
           v.n_users,
           v.sum_pre_cents,
           v.sum_post_cents,
           CAST(v.sum_post_cents AS DOUBLE) / v.n_users AS mean_post,
           CAST(v.sum_post_cents AS DOUBLE) / v.n_users
             - t.th * (CAST(v.sum_pre_cents AS DOUBLE) / v.n_users
                       - CAST(t.sx AS DOUBLE) / t.n) AS mean_adj
    FROM (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x) AS BIGINT) AS sum_pre_cents,
             CAST(SUM(y) AS BIGINT) AS sum_post_cents
      FROM per_user GROUP BY variant
    ) v CROSS JOIN theta t
    ORDER BY v.variant
    """,
)
def q_cuped_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-variant CUPED readout of the event-log 'experiment': raw
    and variance-adjusted mean post-period spend per user, with the
    pre-period covariate doing the adjusting. θ is fit POOLED (both
    variants — assignment independence makes that unbiased and is
    the platform convention); the adjustment moves each variant's
    mean by θ·(its pre-mean − the pooled pre-mean), so a variant
    that happened to randomize heavier spenders in gets pulled back
    — the bias-correction CIs alone can't give.

    All sufficient statistics are exact (int64 cents, DECIMAL(38,0)
    second moments); the reported means/θ are correctly-rounded
    double arithmetic on those integers, mirrored in the oracle."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts") < F.lit(_CUT).cast("timestamp"), cents)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("x"),
        F.coalesce(
            F.sum(
                F.when(F.col("ts") >= F.lit(_CUT).cast("timestamp"), cents)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("y"),
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant"),
        "x",
        "y",
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    th = (
        (
            F.col("n").cast("decimal(38,0)") * F.col("sxy")
            - F.col("sx").cast("decimal(38,0)") * F.col("sy")
        ).cast("double")
        / (
            F.col("n").cast("decimal(38,0)") * F.col("sxx")
            - F.col("sx").cast("decimal(38,0)") * F.col("sx")
        ).cast("double")
    ).alias("th")
    theta = pooled.select("n", "sx", th)
    v = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("x").cast("bigint").alias("sum_pre_cents"),
        F.sum("y").cast("bigint").alias("sum_post_cents"),
    )
    mean_post = F.col("sum_post_cents").cast("double") / F.col("n_users")
    mean_adj = mean_post - F.col("th") * (
        F.col("sum_pre_cents").cast("double") / F.col("n_users")
        - F.col("sx").cast("double") / F.col("n")
    )
    return (
        v.crossJoin(broadcast_narrow(theta))
        .select(
            "variant",
            "n_users",
            "sum_pre_cents",
            "sum_post_cents",
            mean_post.alias("mean_post"),
            mean_adj.alias("mean_adj"),
        )
        .orderBy("variant")
    )
