"""Model calibration for the learned quality classifier: reliability
bins / expected-calibration-error (ECE) and isotonic (PAV)
recalibration of the fr/de logistic score.

Reference parity: the reference engine (SURVEY.md §0.2 — nil surface
beyond GeoParquet I/O) has no modeling layer; calibration is part of
the mandated LLM-training-pipeline extension surface — a learned
quality gate is only as good as its threshold, and a threshold is
only meaningful if the score is calibrated (the step between
"trained a filter" and "can set a keep-probability target").

Why this shape wins at 100 TB: both queries reduce the corpus to a
FIXED-SIZE per-bin aggregate (one map-side-combinable pass over the
scored frame → ``_N_BINS`` rows), and everything downstream — the
ECE sum, the entire pool-adjacent-violators solve — runs on that
bin grid, never the corpus. The PAV solve uses the minimax identity
fitted[k] = max_{i<=k} min_{j>=k} mean(y[i..j]) (Robertson/Wright,
"Order Restricted Statistical Inference"), which turns the
inherently sequential stack algorithm into an O(B^2) self-join +
two windows on a 20-row frame — embarrassingly parallel corpus
pass, constant-size isotone solve.

Cross-engine exactness: the sigmoid is the one transcendental; it is
rounded to the 1e-6 grid and clamped exactly as the IRLS step-2
sigmoid (regression.py _MUQ precedent), then immediately latticed to
an int64 ppm value — so the ECE query is PURE INTEGER arithmetic end
to end (gaps, Brier, the ppm divisions all run in DECIMAL(38,0) /
HUGEINT), and the isotonic query's only doubles are single divisions
of exact int64 prefix sums (identical operands ⇒ identical IEEE
result) flowing through MIN/MAX/comparisons, which never create new
values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import broadcast_narrow, materialize
from geoparquet_python_spark.operators.regression import (
    _SQL_LOGISTIC_PREFIX,
    _irls2,
    _log_feats,
)
from geoparquet_python_spark.registry import query

_N_BINS = 20

# Final-model keep-probability on the 1e-6 grid (the _MUQ rounding
# contract applied to the step-2 score `pred`), then latticed to ppm.
_PQ = "least(greatest(round(1.0 / (1.0 + exp(-pred)), 6), 0.001), 0.999)"

_SQL_PROBS = f"""
    probs AS (
      SELECT CAST(CASE WHEN yv > 0.5 THEN 1 ELSE 0 END AS BIGINT) AS y_bit,
             CAST(round({_PQ} * 1000000.0) AS BIGINT) AS p_ppm
      FROM scored
    )"""

# Equi-width probability bins on the ppm lattice — pure int64, so the
# bin id is trivially cross-engine (clamp is belt-and-braces: the
# 0.999 sigmoid clamp already keeps p_ppm*20 under 20e6).
_SQL_BINS = f"""
    binned AS (
      SELECT LEAST(p_ppm * {_N_BINS} // 1000000, {_N_BINS - 1}) AS bin,
             y_bit, p_ppm
      FROM probs
    ),
    bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS cnt,
             CAST(SUM(y_bit) AS BIGINT) AS pos,
             CAST(SUM(p_ppm) AS DECIMAL(38,0)) AS sconf
      FROM binned GROUP BY bin
    )"""


def _probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, scored = _irls2(_log_feats(spark, sf_dir))
    return scored.select(
        F.expr("CAST(CASE WHEN yv > 0.5 THEN 1 ELSE 0 END AS BIGINT)").alias(
            "y_bit"
        ),
        F.expr(f"CAST(round({_PQ} * 1000000.0) AS BIGINT)").alias("p_ppm"),
    )


def _bins(probs: DataFrame) -> DataFrame:
    binned = probs.select(
        F.expr(f"LEAST(p_ppm * {_N_BINS} DIV 1000000, {_N_BINS - 1})").alias(
            "bin"
        ),
        "y_bit",
        "p_ppm",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("y_bit").cast("bigint").alias("pos"),
        F.sum(F.col("p_ppm").cast("decimal(38,0)")).alias("sconf"),
    )


@query(
    "q_calibration_bins_ece",
    oracle=f"""{_SQL_LOGISTIC_PREFIX},
    {_SQL_PROBS},
    {_SQL_BINS},
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM bins),
    briers AS (
      SELECT CAST(SUM(CAST(p_ppm - y_bit * 1000000 AS DECIMAL(38,0))
                       * (p_ppm - y_bit * 1000000)) AS DECIMAL(38,0)) AS sq
      FROM probs
    ),
    gaps AS (
      SELECT CAST(SUM(abs(CAST(pos AS DECIMAL(38,0)) * 1000000 - sconf))
                  AS HUGEINT) AS sgap,
             CAST(MAX(CAST(abs(CAST(pos AS DECIMAL(38,0)) * 1000000 - sconf)
                           AS HUGEINT) // cnt) AS BIGINT) AS mx,
             CAST(COUNT(*) AS BIGINT) AS n_bins
      FROM bins
    )
    SELECT n AS n_docs, n_bins,
           CAST(sgap // n AS BIGINT) AS ece_ppm,
           mx AS max_gap_ppm,
           CAST(CAST(sq AS HUGEINT) // (CAST(n AS HUGEINT) * 1000000)
                AS BIGINT) AS brier_ppm
    FROM tot CROSS JOIN gaps CROSS JOIN briers
    """,
)
def q_calibration_bins_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram summary of the trained fr/de logistic
    score: 20 equi-width probability bins, ECE (count-weighted mean
    |empirical rate − mean confidence|), worst-bin gap, and the Brier
    score — all on the ppm integer lattice, so every statistic is
    exact integer arithmetic (no double-summation contract needed at
    any corpus size; per-row terms are widened to decimal(38,0)
    before summation, the dsum/HUGEINT pattern). Plan: the model
    pipeline's scored pass → one 20-row binned aggregate + one
    squared-gap aggregate (both map-side-combinable over the SAME
    materialized probs frame) → constant-time ppm divisions. At
    100 TB the corpus passes are the entire cost."""
    probs = materialize(_probs(spark, sf_dir))
    bins = _bins(probs)
    tot = bins.agg(F.sum("cnt").cast("bigint").alias("n"))
    briers = probs.agg(
        F.sum(
            F.expr(
                "CAST(p_ppm - y_bit * 1000000 AS DECIMAL(38,0))"
                " * (p_ppm - y_bit * 1000000)"
            )
        )
        .cast("decimal(38,0)")
        .alias("sq")
    )
    gaps = bins.agg(
        F.sum(
            F.expr("abs(CAST(pos AS DECIMAL(38,0)) * 1000000 - sconf)")
        ).alias("sgap"),
        F.max(
            F.expr(
                "CAST(abs(CAST(pos AS DECIMAL(38,0)) * 1000000 - sconf)"
                " DIV cnt AS BIGINT)"
            )
        ).alias("mx"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
    )
    return (
        tot.crossJoin(broadcast_narrow(gaps))
        .crossJoin(broadcast_narrow(briers))
        .select(
            F.col("n").alias("n_docs"),
            "n_bins",
            F.expr("CAST(sgap DIV n AS BIGINT)").alias("ece_ppm"),
            F.col("mx").alias("max_gap_ppm"),
            F.expr(
                "CAST(sq DIV (CAST(n AS DECIMAL(38,0)) * 1000000)"
                " AS BIGINT)"
            ).alias("brier_ppm"),
        )
    )


@query(
    "q_isotonic_calibration",
    oracle=f"""{_SQL_LOGISTIC_PREFIX},
    {_SQL_PROBS},
    {_SQL_BINS},
    r AS (
      SELECT bin, cnt, pos, ROW_NUMBER() OVER (ORDER BY bin) AS rk
      FROM bins
    ),
    c AS (
      SELECT rk, bin, cnt, pos,
             CAST(SUM(cnt) OVER (ORDER BY rk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS ccnt,
             CAST(SUM(pos) OVER (ORDER BY rk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cpos
      FROM r
    ),
    pairs AS (
      SELECT i.rk AS irk, j.rk AS jrk,
             CAST(j.cpos - (i.cpos - i.pos) AS DOUBLE)
               / CAST(j.ccnt - (i.ccnt - i.cnt) AS DOUBLE) AS avgij
      FROM c i JOIN c j ON j.rk >= i.rk
    ),
    minov AS (
      SELECT irk, jrk AS krk,
             MIN(avgij) OVER (PARTITION BY irk ORDER BY jrk DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mn
      FROM pairs
    ),
    fit AS (SELECT krk, MAX(mn) AS fitted FROM minov GROUP BY krk),
    outp AS (
      SELECT c.rk, c.bin, c.cnt, c.pos,
             CAST(c.pos AS DOUBLE) / CAST(c.cnt AS DOUBLE) AS emp_rate,
             f.fitted
      FROM c JOIN fit f ON f.krk = c.rk
    )
    SELECT rk, bin, cnt, pos, emp_rate, fitted,
           (fitted >= COALESCE(lag(fitted) OVER (ORDER BY rk), fitted))
             AS mono_ok,
           (fitted >= 0.0 AND fitted <= 1.0) AS bounds_ok
    FROM outp ORDER BY rk
    """,
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) recalibration of the logistic score: the
    monotone step function mapping score bins to calibrated keep
    probabilities, via the minimax identity fitted[k] = max_{i<=k}
    min_{j>=k} pooled-rate(i..j) on exact integer prefix sums — the
    exact pool-adjacent-violators solution without the sequential
    stack. Monotonicity and [0,1] bounds are certified in-plan.
    Plan: one corpus pass → ≤20-row bin frame; the O(B^2)=210-row
    interval self-join and two windows run post-aggregation, so the
    isotone solve is CONSTANT cost regardless of corpus size (the
    100 TB shape: calibration is an aggregate, not a sort). The only
    doubles are divisions of identical int64 operands on both
    engines; MIN/MAX/LAG never create new values."""
    probs = _probs(spark, sf_dir)
    bins = _bins(probs)
    r = bins.select(
        "bin",
        "cnt",
        "pos",
        F.row_number().over(Window.orderBy("bin")).alias("rk"),
    )
    wcum = Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)
    c = r.select(
        "rk",
        "bin",
        "cnt",
        "pos",
        F.sum("cnt").over(wcum).cast("bigint").alias("ccnt"),
        F.sum("pos").over(wcum).cast("bigint").alias("cpos"),
    )
    # The bin frame is ≤20 rows but sits atop the whole model
    # pipeline; materialize so the interval self-join reuses it.
    c = materialize(c)
    ci = c.select(
        F.col("rk").alias("irk"),
        F.col("cnt").alias("icnt"),
        F.col("pos").alias("ipos"),
        F.col("ccnt").alias("iccnt"),
        F.col("cpos").alias("icpos"),
    )
    cj = c.select(
        F.col("rk").alias("jrk"),
        F.col("ccnt").alias("jccnt"),
        F.col("cpos").alias("jcpos"),
    )
    pairs = ci.join(cj, F.col("jrk") >= F.col("irk")).select(
        "irk",
        "jrk",
        F.expr(
            "CAST(jcpos - (icpos - ipos) AS DOUBLE)"
            " / CAST(jccnt - (iccnt - icnt) AS DOUBLE)"
        ).alias("avgij"),
    )
    wmin = (
        Window.partitionBy("irk")
        .orderBy(F.col("jrk").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    minov = pairs.select(
        "irk",
        F.col("jrk").alias("krk"),
        F.min("avgij").over(wmin).alias("mn"),
    )
    fit = minov.groupBy("krk").agg(F.max("mn").alias("fitted"))
    outp = c.join(fit, c.rk == fit.krk).select(
        "rk",
        "bin",
        "cnt",
        "pos",
        F.expr("CAST(pos AS DOUBLE) / CAST(cnt AS DOUBLE)").alias("emp_rate"),
        "fitted",
    )
    wlag = Window.orderBy("rk")
    return outp.select(
        "rk",
        "bin",
        "cnt",
        "pos",
        "emp_rate",
        "fitted",
        (
            F.col("fitted")
            >= F.coalesce(F.lag("fitted").over(wlag), F.col("fitted"))
        ).alias("mono_ok"),
        ((F.col("fitted") >= 0.0) & (F.col("fitted") <= 1.0)).alias(
            "bounds_ok"
        ),
    ).orderBy("rk")
