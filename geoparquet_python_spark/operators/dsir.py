"""Data Selection via Importance Resampling (DSIR-style selection,
SURVEY.md §2.F training-pipeline closure).

The data-selection method of Xie et al. (2023, "Data Selection for
Language Models via Importance Resampling"): score every RAW-pool
document by the log-likelihood ratio of a TARGET-domain n-gram LM vs
the raw-pool LM, then keep the top-weighted docs. The ratio rewards
documents that look like the curated target distribution and
penalizes generic pool text — the principled replacement for "train a
quality classifier" when all you have is a trusted subset.

Spark-first shape: ONE conditional-aggregation pass over the exploded
token stream builds BOTH unigram LMs (no second scan), a vocab-sized
ratio table joins back onto the pool tokens (broadcast when it fits,
shuffle equi-join with AQE skew-split for stopwords when it doesn't),
and selection is a TakeOrderedAndProject — never a global sort.

Determinism: ln() is fixed-pointed per FACTOR (1e-6 round → int64)
before differencing, per the PSI convention (see memory of
`q_psi_value_drift`): each engine rounds the same two doubles, and
the int64 sum is partition-order-independent.

No reference equivalent (the reference delegates analytics to pandas;
SURVEY.md §0 provenance) — [N] north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import broadcast_narrow, materialize
from geoparquet_python_spark.functions.text import tokens
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

# The trusted target subset: two curated sources. Everything else is
# the raw pool being selected from.
_TARGET_SOURCES = ("src0", "src1")
_SEL_K = 40  # documents kept by the selection


@query(
    "q_dsir_importance_selection",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             source IN {_TARGET_SOURCES} AS is_target,
             unnest(str_split(text, ' ')) AS term
      FROM documents
    ),
    freq AS (
      SELECT term,
             CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
               AS c_t,
             CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT)
               AS c_r
      FROM tok GROUP BY term
    ),
    tot AS (
      SELECT CAST(SUM(c_t) AS BIGINT) AS n_t,
             CAST(SUM(c_r) AS BIGINT) AS n_r,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM freq
    ),
    lp AS (
      SELECT term,
             CAST(round(ln((c_t + 1.0) / (n_t + v)) * 1000000) AS BIGINT)
           - CAST(round(ln((c_r + 1.0) / (n_r + v)) * 1000000) AS BIGINT)
               AS lpd
      FROM freq CROSS JOIN tot
    ),
    score AS (
      SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(l.lpd) AS BIGINT) AS llr_fp
      FROM tok t JOIN lp l ON l.term = t.term
      WHERE NOT t.is_target
      GROUP BY t.doc_id
    )
    SELECT d.doc_id, d.lang, d.source, s.n_tokens, s.llr_fp,
           s.llr_fp * 1.0 / s.n_tokens / 1000000.0 AS avg_llr
    FROM score s JOIN documents d ON d.doc_id = s.doc_id
    ORDER BY s.llr_fp * 1.0 / s.n_tokens DESC, d.doc_id
    LIMIT {_SEL_K}
    """,
)
def q_dsir_importance_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: per-pool-doc mean unigram log-likelihood ratio
    ln p_target(w) - ln p_raw(w) (add-one smoothing over the union
    vocabulary), top-{_SEL_K} docs kept (ties → lowest doc_id).

    Plan: one exploded-token scan feeds ONE conditional aggregation
    building both LMs (target counts and raw counts are columns of the
    same vocab-sized frame — no second corpus pass); totals ride along
    as a one-row crossJoin (no driver count()); the per-term ratio
    joins back onto the pool tokens term-keyed; per-doc int64 rollup;
    TakeOrderedAndProject for the top-K (never a global sort). At
    100 TB the only corpus-sized shuffles are the token groupBys —
    the same shape as q_unigram_logprob, which this extends with a
    second distribution and a selection head."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.col("source").isin(*_TARGET_SOURCES).alias("is_target"),
        F.explode(tokens("text")).alias("term"),
    )
    tok = materialize(tok)
    freq = tok.groupBy("term").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("bigint")
        .alias("c_t"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1))
        .cast("bigint")
        .alias("c_r"),
    )
    tot = freq.agg(
        F.sum("c_t").cast("bigint").alias("n_t"),
        F.sum("c_r").cast("bigint").alias("n_r"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    lp_t = F.round(
        F.log(
            (F.col("c_t") + F.lit(1.0))
            / (F.col("n_t") + F.col("v")).cast("double")
        )
        * 1e6
    ).cast("bigint")
    lp_r = F.round(
        F.log(
            (F.col("c_r") + F.lit(1.0))
            / (F.col("n_r") + F.col("v")).cast("double")
        )
        * 1e6
    ).cast("bigint")
    ratio = freq.crossJoin(broadcast_narrow(tot)).select(
        "term", (lp_t - lp_r).alias("lpd")
    )
    score = (
        tok.where(~F.col("is_target"))
        .join(broadcast_narrow(ratio), "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("lpd").cast("bigint").alias("llr_fp"),
        )
    )
    avg = F.col("llr_fp") * F.lit(1.0) / F.col("n_tokens")
    return (
        score.join(d.select("doc_id", "lang", "source"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_tokens",
            "llr_fp",
            (avg / 1e6).alias("avg_llr"),
        )
        .orderBy(F.desc(avg), "doc_id")
        .limit(_SEL_K)
    )
