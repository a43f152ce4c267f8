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

from pyspark.sql import DataFrame, SparkSession, Window
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


# Shared oracle CTE chain: per-variant exact moments -> (n, sum,
# mean, s2) — the SQL mirror of _variant_stats below, spliced into
# the Welch and mSPRT oracles.
_SQL_VARIANT_STATS = f"""per_user AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS variant,
             CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_CUT}'
                    THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0))
               AS syy
      FROM per_user GROUP BY variant
    ),
    w AS (
      SELECT variant, n, sy,
             CAST(sy AS DOUBLE) / n AS mean,
             (CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * sy / n) / (n - 1) AS s2
      FROM v
    )"""


def _variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-variant (n, sum, mean, sample variance) of post-period user
    cents under the md5-parity assignment — the shared moment frame
    behind the Welch and mSPRT readouts (2 rows)."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = e.groupBy("user_id").agg(
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
        "y",
    )
    v = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    mean = F.col("sy").cast("double") / F.col("n")
    s2 = (
        F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy") / F.col("n")
    ) / (F.col("n") - 1)
    return v.select("variant", "n", "sy", mean.alias("mean"), s2.alias("s2"))


@query(
    "q_ab_welch_readout",
    oracle=f"""
    WITH {_SQL_VARIANT_STATS}
    SELECT a.n AS n0, b.n AS n1,
           a.sy AS sum_cents0, b.sy AS sum_cents1,
           a.mean AS mean0, b.mean AS mean1,
           b.mean - a.mean AS effect,
           (b.mean - a.mean)
             / sqrt(a.s2 / a.n + b.s2 / b.n) AS welch_t,
           CAST(a.n - b.n AS DOUBLE) * (a.n - b.n) / (a.n + b.n)
             AS srm_chi2
    FROM w a JOIN w b ON a.variant = 0 AND b.variant = 1
    """,
)


def q_ab_welch_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row A/B readout for the md5-parity experiment: per-variant
    user counts and post-period means, the effect, the Welch
    t-statistic (unequal-variance form — the platform default), and
    the sample-ratio-mismatch chi-square for the 50/50 design (SRM is
    the first guardrail every readout checks: an imbalanced split
    means the assignment itself is broken and no metric below it can
    be trusted).

    Exactness mirrors CUPED: counts/sums int64, Σy² in DECIMAL(38,0);
    mean/variance/t are correctly-rounded double ops on those exact
    integers, identical in the oracle. Plan: one user-keyed
    conditional aggregate, a 2-group rollup, and a self-join of two
    one-row frames — after the user aggregate everything is
    row-sized at any event volume."""
    w = _variant_stats(spark, sf_dir)
    a = w.where(F.col("variant") == 0).select(
        F.col("n").alias("n0"),
        F.col("sy").alias("sum_cents0"),
        F.col("mean").alias("mean0"),
        F.col("s2").alias("s20"),
    )
    b = w.where(F.col("variant") == 1).select(
        F.col("n").alias("n1"),
        F.col("sy").alias("sum_cents1"),
        F.col("mean").alias("mean1"),
        F.col("s2").alias("s21"),
    )
    eff = F.col("mean1") - F.col("mean0")
    t = eff / F.sqrt(
        F.col("s20") / F.col("n0") + F.col("s21") / F.col("n1")
    )
    srm = (
        (F.col("n0") - F.col("n1")).cast("double")
        * (F.col("n0") - F.col("n1"))
        / (F.col("n0") + F.col("n1"))
    )
    return a.crossJoin(b).select(
        "n0",
        "n1",
        "sum_cents0",
        "sum_cents1",
        "mean0",
        "mean1",
        eff.alias("effect"),
        t.alias("welch_t"),
        srm.alias("srm_chi2"),
    )


_EB = 32  # effect-CI bootstrap replicates

# Poisson(1) CDF thresholds on the 60-bit md5 lattice (the
# operators/bootstrap.py convention, duplicated as literals so the two
# modules stay independently readable).
import math as _math

_ECDF = [
    sum(_math.exp(-1.0) / _math.factorial(j) for j in range(k + 1))
    for k in range(6)
]
_ETHRESH = [int(c * (1 << 60)) for c in _ECDF]


def _sql_eweight(h: str) -> str:
    branches = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_ETHRESH)
    )
    return f"CASE {branches} ELSE 6 END"


@query(
    "q_bootstrap_effect_ci",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                  AS BIGINT) % 2 AS variant,
             CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '{_CUT}'
                    THEN CAST(round(value * 100) AS BIGINT) END), 0)
                  AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    rep AS (
      SELECT u.variant, u.y, r.r,
             {_sql_eweight("CAST(('0x' || substr(md5(CAST(u.user_id AS VARCHAR) || ':' || CAST(r.r AS VARCHAR)), 1, 15)) AS BIGINT)")} AS w
      FROM per_user u CROSS JOIN range({_EB}) r(r)
    ),
    boot AS (
      SELECT r,
             (SUM(CASE WHEN variant = 1 THEN w * y END) * 1000000)
               // SUM(CASE WHEN variant = 1 THEN w END)
             - (SUM(CASE WHEN variant = 0 THEN w * y END) * 1000000)
               // SUM(CASE WHEN variant = 0 THEN w END) AS eff_micro
      FROM rep
      GROUP BY r
      HAVING SUM(CASE WHEN variant = 0 THEN w END) > 0
         AND SUM(CASE WHEN variant = 1 THEN w END) > 0
    ),
    rk AS (
      SELECT eff_micro,
             row_number() OVER (ORDER BY eff_micro, r) AS rn,
             COUNT(*) OVER () AS m
      FROM boot
    ),
    pt AS (
      SELECT (SUM(CASE WHEN variant = 1 THEN y END) * 1000000)
               // SUM(CASE WHEN variant = 1 THEN 1 END)
             - (SUM(CASE WHEN variant = 0 THEN y END) * 1000000)
               // SUM(CASE WHEN variant = 0 THEN 1 END) AS point_micro
      FROM per_user
    )
    SELECT CAST(p.point_micro AS BIGINT) AS point_effect_micro,
           CAST(MAX(CASE WHEN rk.rn = 2 THEN rk.eff_micro END) AS BIGINT)
             AS effect_lo_micro,
           CAST(MAX(CASE WHEN rk.rn = {_EB - 1} THEN rk.eff_micro END)
             AS BIGINT) AS effect_hi_micro,
           CAST(MAX(rk.m) AS BIGINT) AS n_replicates
    FROM pt p CROSS JOIN rk
    GROUP BY p.point_micro
    """,
)
def q_bootstrap_effect_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The families composed: a ONE-PASS Poisson-bootstrap confidence
    interval for the A/B EFFECT itself (difference of per-variant
    mean post-period spend). Resampling USERS — the randomization
    unit — respects the experiment's dependence structure, which a
    per-event bootstrap would break; each replicate reweights every
    user by a deterministic Poisson(1) draw and all {B} replicate
    effects accumulate in one scan (conditional weighted sums per
    (variant, replicate), partial map-side). The interval is the
    trimmed (2nd, {B}-1th) order statistics of the replicate
    effects; replicate effects are differences of floored
    micro-means — subtraction AFTER the non-negative integer
    division, so no truncating-div sign hazard even for negative
    effects. Everything after the user aggregate is (2×{B})-sized."""
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    per_user = e.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(F.col("ts") >= F.lit(_CUT).cast("timestamp"), cents)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("y"),
    ).select(
        "user_id",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("variant"),
        "y",
    )
    rep = per_user.select(
        "user_id",
        "variant",
        "y",
        F.explode(F.sequence(F.lit(0), F.lit(_EB - 1))).alias("r"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit(":"),
                    F.col("r").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(6)
    for k in range(len(_ETHRESH) - 1, -1, -1):
        w = F.when(h < _ETHRESH[k], F.lit(k)).otherwise(w)
    boot = (
        rep.select("variant", "y", "r", w.alias("w"))
        .groupBy("r")
        .agg(
            F.sum(F.when(F.col("variant") == 1, F.col("w") * F.col("y")))
            .cast("bigint")
            .alias("swy1"),
            F.sum(F.when(F.col("variant") == 1, F.col("w")))
            .cast("bigint")
            .alias("sw1"),
            F.sum(F.when(F.col("variant") == 0, F.col("w") * F.col("y")))
            .cast("bigint")
            .alias("swy0"),
            F.sum(F.when(F.col("variant") == 0, F.col("w")))
            .cast("bigint")
            .alias("sw0"),
        )
        .where((F.col("sw0") > 0) & (F.col("sw1") > 0))
        .select(
            "r",
            F.expr(
                "(swy1 * 1000000) div sw1 - (swy0 * 1000000) div sw0"
            ).alias("eff_micro"),
        )
    )
    rk = boot.select(
        "eff_micro",
        F.row_number()
        .over(Window.orderBy("eff_micro", "r"))
        .alias("rn"),
    )
    ci = rk.agg(
        F.max(F.when(F.col("rn") == 2, F.col("eff_micro")))
        .cast("bigint")
        .alias("effect_lo_micro"),
        F.max(F.when(F.col("rn") == _EB - 1, F.col("eff_micro")))
        .cast("bigint")
        .alias("effect_hi_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
    )
    pt = per_user.agg(
        F.expr(
            "CAST((SUM(CASE WHEN variant = 1 THEN y END) * 1000000) div "
            "SUM(CASE WHEN variant = 1 THEN 1 END) - "
            "(SUM(CASE WHEN variant = 0 THEN y END) * 1000000) div "
            "SUM(CASE WHEN variant = 0 THEN 1 END) AS BIGINT)"
        ).alias("point_effect_micro")
    )
    return pt.crossJoin(broadcast_narrow(ci)).select(
        "point_effect_micro",
        "effect_lo_micro",
        "effect_hi_micro",
        "n_replicates",
    )


# ---------------------------------------------------------------------------
# Always-valid sequential readout: mixture SPRT (mSPRT)
# ---------------------------------------------------------------------------

_TAU2 = 2500.0  # normal-mixture prior scale tau = 50 cents
# Shared-text double chain over the one-row joined frame exposing
# n0 n1 mean0 mean1 s20 s21 (exact-moment-derived doubles).
_EFF = "(mean1 - mean0)"
_VHAT = "(s20 / n0 + s21 / n1)"
_LNL = (
    f"(0.5 * ln({_VHAT} / ({_VHAT} + {_TAU2}))"
    f" + (({_EFF} * {_EFF}) * {_TAU2})"
    f" / ((2.0 * {_VHAT}) * ({_VHAT} + {_TAU2})))"
)
_LNL_Q = f"round({_LNL}, 6)"
_AVP = f"round(least(1.0, exp(-{_LNL_Q})), 6)"


@query(
    "q_sequential_msprt_readout",
    oracle=f"""
    WITH {_SQL_VARIANT_STATS},
    j AS (
      SELECT a.n AS n0, b.n AS n1, a.mean AS mean0, b.mean AS mean1,
             a.s2 AS s20, b.s2 AS s21
      FROM w a JOIN w b ON a.variant = 0 AND b.variant = 1
    )
    SELECT n0, n1, {_EFF} AS effect, {_VHAT} AS vhat,
           {_LNL_Q} AS log_lambda,
           {_AVP} AS always_valid_p,
           ({_AVP} <= 0.05) AS reject_5pct
    FROM j
    """,
)
def q_sequential_msprt_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Always-valid sequential A/B readout via the mixture SPRT
    (Johari, Koomen, Pekelis, Walsh — "Peeking at A/B Tests", KDD
    2017): the likelihood ratio of the observed effect under a
    N(0, tau^2) effect mixture vs the null,
    ln(Lambda) = 0.5*ln(V/(V+tau^2)) + effect^2*tau^2/(2V(V+tau^2))
    with V the Welch plug-in variance of the effect, and the
    always-valid p-value min(1, 1/Lambda). Unlike the fixed-horizon
    Welch t (q_ab_welch_readout, whose moment frame this shares),
    this p-value stays valid under CONTINUOUS MONITORING — the
    experimentation-platform default, where dashboards are peeked at
    after every ingest batch.

    Exactness: the moment frame is exact int64/decimal; ln/exp are
    the transcendentals, rounded to the 1e-6 grid (the sigmoid
    precedent) with the p derived from the ROUNDED log-LR so both
    engines share every downstream comparison. Plan: one user-keyed
    conditional aggregate + a 2-row rollup + one-row math — the
    sequential correction costs nothing over the fixed-horizon
    readout at any event volume."""
    w = _variant_stats(spark, sf_dir)
    a = w.where(F.col("variant") == 0).select(
        F.col("n").alias("n0"),
        F.col("mean").alias("mean0"),
        F.col("s2").alias("s20"),
    )
    b = w.where(F.col("variant") == 1).select(
        F.col("n").alias("n1"),
        F.col("mean").alias("mean1"),
        F.col("s2").alias("s21"),
    )
    return a.crossJoin(b).select(
        "n0",
        "n1",
        F.expr(_EFF).alias("effect"),
        F.expr(_VHAT).alias("vhat"),
        F.expr(_LNL_Q).alias("log_lambda"),
        F.expr(_AVP).alias("always_valid_p"),
        F.expr(f"({_AVP} <= 0.05)").alias("reject_5pct"),
    )
