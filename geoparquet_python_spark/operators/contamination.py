"""Benchmark decontamination: flag training documents that share
n-gram fingerprints with a held-out benchmark/eval set.

Standard practice for LLM training corpora (GPT-3 appendix C /
PaLM-style 8-gram overlap): any training doc sharing >= 1 distinct
k-gram with the eval set is "contaminated" and gets dropped or
down-weighted before training. Here the eval set is carved
deterministically from the same documents table (doc_id % 97 == 0)
so the query is self-contained and oracle-checkable; in production
the bench side is a separate small table.

Scale design (the part that matters at 100 TB):
- the BENCHMARK side is small by construction (eval sets are
  thousands of docs, not billions) — its distinct-shingle set is
  built once and BROADCAST, so probing is a map-side semi-join: the
  training corpus's exploded shingles never shuffle for the probe.
- the per-doc hit count aggregates on doc_id — uniform keys, full
  map-side combine; output is |contaminated docs|, not |shingles|.
- shingling is one in-row projection (functions/text.shingles:
  transform-with-index + array_distinct, no shuffle) followed by a
  single explode that stays map-local until the aggregation.
k=3 here because the synthetic corpus's near-dups perturb words every
few tokens (longer grams never collide at test scale); production
decontamination raises k to 8-13 — same plan, one parameter.

No reference equivalent (the reference delegates analytics to pandas;
SURVEY.md §0) — BASELINE.json north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.text import (
    shingles,
    sql_shingles_cte,
    tokens,
)
from geoparquet_python_spark.functions.exact import broadcast_narrow
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

# Eval-set membership: deterministic, engine-portable.
_BENCH_MOD = 97
_K = 3


@query(
    "q_decontaminate_overlap",
    oracle=f"""
    WITH {sql_shingles_cte(k=_K)},
    nsh AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
      FROM sh GROUP BY doc_id
    ),
    bench AS (
      SELECT DISTINCT s FROM sh WHERE doc_id % {_BENCH_MOD} = 0
    ),
    hits AS (
      SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
      FROM sh JOIN bench USING (s)
      WHERE sh.doc_id % {_BENCH_MOD} <> 0
      GROUP BY sh.doc_id
    )
    SELECT h.doc_id, h.n_hits, n.n_shingles,
           CAST(h.n_hits AS DOUBLE) / n.n_shingles AS hit_frac
    FROM hits h JOIN nsh n USING (doc_id)
    ORDER BY doc_id
    """,
)
def q_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing >=1 distinct 3-gram with the eval slice.

    Plan: per-doc distinct shingle array (one projection) -> explode
    -> broadcast-semi-join against the eval shingle set -> count by
    doc_id. hit_frac = n_hits / n_shingles is exact IEEE division of
    two int64s (identical in DuckDB), so no rounding is needed.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    with_sh = docs.select("doc_id", shingles("toks", _K).alias("sh_arr"))
    exploded = with_sh.select(
        "doc_id",
        F.size("sh_arr").alias("n_shingles"),
        F.explode("sh_arr").alias("s"),
    )
    is_bench = F.col("doc_id") % _BENCH_MOD == 0
    bench_set = exploded.where(is_bench).select("s").distinct()
    hits = (
        exploded.where(~is_bench)
        .join(broadcast_narrow(bench_set), "s")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_hits"))
    )
    return hits.select(
        "doc_id",
        "n_hits",
        "n_shingles",
        (F.col("n_hits").cast("double") / F.col("n_shingles")).alias("hit_frac"),
    ).orderBy("doc_id")
