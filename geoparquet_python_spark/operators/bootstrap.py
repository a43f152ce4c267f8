"""Poisson bootstrap: one-pass resampling confidence intervals.

The classic bootstrap resamples the corpus B times — unrunnable at
100 TB. The Poisson bootstrap (Chamandy et al., "Estimating
Uncertainty for Massive Data Streams", Google 2012; also Kleiner et
al.'s bag-of-little-bootstraps lineage) observes that a size-n
multinomial resample is, per row, asymptotically Poisson(1) draws —
so EVERY replicate's sufficient statistics can be accumulated in ONE
streaming pass: each row contributes w(row, r)·x to replicate r,
where w ~ Poisson(1) is derived from a content hash. No shuffled
copies of the corpus, no driver-side resampling, embarrassingly
parallel, and mergeable across shards (the weighted sums are plain
associative sums).

Determinism: w(doc, r) inverts the Poisson(1) CDF at a 60-bit uniform
``md5_long(doc_id || ':' || r)`` — integer threshold compares against
precomputed ``floor(CDF_k · 2^60)`` literals, so Spark and DuckDB
compute the identical weight table with no float RNG anywhere.
Replicate means are exact int64 rationals reported in micro-units
(integer div, == DuckDB ``//`` on non-negatives).

No reference equivalent (SURVEY.md §0 provenance) — [N] north-star
scope: uncertainty quantification for corpus statistics is a
first-class need of a training-data pipeline (is source A's mean
length REALLY above source B's, or is that noise?).

Scale shape (100 TB lens):
- One corpus scan; the B-way explode is map-side and collapses to
  (lang × B) partial sums before the only shuffle — each partition
  emits ≤ |langs|·B rows regardless of corpus size.
- The order-statistic CI runs over a (langs × B)-row frame — a
  post-aggregation per-lang window on a vocabulary-sized input, the
  plan-guard-sanctioned pattern.
- int64 headroom: Σ w·n_chars ≤ 6·Σ n_chars; micro-scaling brings a
  corpus to ~6e13 per language at sf0.1 and ~1e20 only past ~1e14
  chars per language — switch the two weighted sums to
  DECIMAL(38,0) at that point (same plan, wider lanes).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_B = 32  # bootstrap replicates (one pass regardless)

# Poisson(1) CDF thresholds scaled to the md5_long 60-bit lattice:
# weight k iff T_{k-1} <= h < T_k; capped at 6 (P(w > 6) ~ 8e-5).
_CDF = [
    sum(math.exp(-1.0) / math.factorial(j) for j in range(k + 1))
    for k in range(6)
]
_THRESH = [int(c * (1 << 60)) for c in _CDF]


def _sql_weight(h: str) -> str:
    branches = " ".join(
        f"WHEN {h} < {t} THEN {k}" for k, t in enumerate(_THRESH)
    )
    return f"CASE {branches} ELSE 6 END"


@query(
    "q_bootstrap_mean_ci",
    oracle=f"""
    WITH rep AS (
      SELECT d.lang, d.n_chars, r.r,
             {_sql_weight("CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(r.r AS VARCHAR)), 1, 15)) AS BIGINT)")} AS w
      FROM documents d CROSS JOIN range({_B}) r(r)
    ),
    boot AS (
      SELECT lang, r,
             CAST(SUM(w) AS BIGINT) AS sum_w,
             CAST(SUM(w * n_chars) AS BIGINT) AS sum_wx
      FROM rep GROUP BY lang, r
    ),
    means AS (
      SELECT lang, r, (sum_wx * 1000000) // sum_w AS mean_micro,
             row_number() OVER (
               PARTITION BY lang ORDER BY (sum_wx * 1000000) // sum_w, r
             ) AS rk
      FROM boot WHERE sum_w > 0
    ),
    fstats AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST((SUM(n_chars) * 1000000) // COUNT(*) AS BIGINT)
               AS mean_chars_micro
      FROM documents GROUP BY lang
    )
    SELECT f.lang, f.n_docs, f.mean_chars_micro,
           CAST(MAX(CASE WHEN m.rk = 2 THEN m.mean_micro END) AS BIGINT)
             AS boot_lo_micro,
           CAST(MAX(CASE WHEN m.rk = {_B - 1} THEN m.mean_micro END)
             AS BIGINT) AS boot_hi_micro,
           CAST(COUNT(*) AS BIGINT) AS n_replicates
    FROM fstats f JOIN means m ON m.lang = f.lang
    GROUP BY f.lang, f.n_docs, f.mean_chars_micro
    ORDER BY f.lang
    """,
)
def q_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language bootstrap CI of mean document length via the
    ONE-PASS Poisson bootstrap: replicate r weighs each doc by a
    deterministic Poisson(1) draw (md5-inverted CDF, integer
    thresholds on the 60-bit hash lattice), so all {B} replicates'
    weighted sums accumulate in a single scan with map-side partial
    aggregation — the resample never materializes. The interval is
    the (2nd, {B}-1th) order statistics of the replicate means
    (a ~94% trimmed-percentile CI at B={B}), ranked over the tiny
    (lang × B) frame. Replicate means are exact int64 micro-unit
    rationals; nothing floats."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    rep = d.select(
        "lang",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("r"),
        "doc_id",
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
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
    for k in range(len(_THRESH) - 1, -1, -1):
        w = F.when(h < _THRESH[k], F.lit(k)).otherwise(w)
    boot = (
        rep.select("lang", "r", w.alias("w"), "n_chars")
        .groupBy("lang", "r")
        .agg(
            F.sum("w").cast("bigint").alias("sum_w"),
            F.sum(F.col("w") * F.col("n_chars"))
            .cast("bigint")
            .alias("sum_wx"),
        )
        .where(F.col("sum_w") > 0)
    )
    means = boot.select(
        "lang",
        "r",
        F.expr("(sum_wx * 1000000) div sum_w").alias("mean_micro"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("lang").orderBy("mean_micro", "r")
        ),
    )
    ci = means.groupBy("lang").agg(
        F.max(F.when(F.col("rk") == 2, F.col("mean_micro")))
        .cast("bigint")
        .alias("boot_lo_micro"),
        F.max(F.when(F.col("rk") == _B - 1, F.col("mean_micro")))
        .cast("bigint")
        .alias("boot_hi_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_replicates"),
    )
    full = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr(
            "(SUM(n_chars) * 1000000) div COUNT(*)"
        ).alias("mean_chars_micro"),
    )
    return (
        full.join(ci, "lang")
        .select(
            "lang",
            "n_docs",
            "mean_chars_micro",
            "boot_lo_micro",
            "boot_hi_micro",
            "n_replicates",
        )
        .orderBy("lang")
    )
