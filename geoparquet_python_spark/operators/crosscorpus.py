"""Cross-corpus (incremental) dedup: screen a NEW batch of documents
against an EXISTING corpus before ingestion — the every-crawl-cycle
operation of a training-data pipeline, distinct from within-corpus
dedup (operators/dedup.py) because the corpus side is already clean
and only batch-vs-corpus pairs matter.

Batch membership is carved deterministically (doc_id % 10 == 0) so
the query is self-contained; in production the batch is its own
table and the corpus side is the accumulated store.

Scale design:
- exact screen: equi-join on the 60-bit content hash — the batch
  side is small relative to the corpus (it's one crawl increment),
  so Spark broadcasts it and the corpus is probed map-side; with
  both sides hash-bucketed by content hash on disk this is a
  shuffle-free merge at any scale.
- near screen: the bipartite inverted-index join (batch shingles x
  corpus shingles on the shingle key) — candidate volume is
  |batch| x (corpus docs sharing a shingle), never corpus², and the
  per-pair Jaccard refine aggregates on uniform (batch_doc,
  corpus_doc) keys. Same stop-shingle cap story as
  q_ngram_jaccard_pairs at corpus scale.
- verdicts are a left-join of two flag sets onto the batch — the
  kept subset (`verdict = 'keep'`) is the ingestible increment.

No reference equivalent (the reference delegates analytics to
pandas; SURVEY.md §0) — BASELINE.json north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.text import (
    SQL_MD5_LONG,
    md5_long,
    shingles,
    sql_shingles_cte,
    tokens,
)
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_BATCH_MOD = 10  # doc_id % 10 == 0 -> "new batch", else "corpus"
_JACCARD_T = 0.5

_SQL_TH = SQL_MD5_LONG.format(expr="text")


@query(
    "q_crosscorpus_dedup",
    oracle=f"""
    WITH {sql_shingles_cte(k=3)},
    h AS (SELECT doc_id, {_SQL_TH} AS th FROM documents),
    exact_dup AS (
      SELECT DISTINCT b.doc_id
      FROM h b JOIN h c ON c.th = b.th AND c.doc_id % {_BATCH_MOD} <> 0
      WHERE b.doc_id % {_BATCH_MOD} = 0
    ),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS bd, b.doc_id AS cd, COUNT(*) AS i
      FROM sh a JOIN sh b
        ON a.s = b.s
       AND a.doc_id % {_BATCH_MOD} = 0 AND b.doc_id % {_BATCH_MOD} <> 0
      GROUP BY 1, 2
    ),
    near_dup AS (
      SELECT DISTINCT bd AS doc_id
      FROM inter
      JOIN sz sa ON sa.doc_id = bd
      JOIN sz sb ON sb.doc_id = cd
      WHERE i * 1.0 / (sa.sz + sb.sz - i) >= {_JACCARD_T}
    )
    SELECT d.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'drop_exact'
                WHEN n.doc_id IS NOT NULL THEN 'drop_near'
                ELSE 'keep' END AS verdict
    FROM documents d
    LEFT JOIN exact_dup e ON e.doc_id = d.doc_id
    LEFT JOIN near_dup n ON n.doc_id = d.doc_id
    WHERE d.doc_id % {_BATCH_MOD} = 0
    ORDER BY d.doc_id
    """,
)
def q_crosscorpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion verdict per new-batch doc: drop_exact (content hash
    already in the corpus), drop_near (3-shingle Jaccard >= 0.5 with
    any corpus doc), else keep."""
    d = load_table(spark, sf_dir, "documents")
    is_batch = F.col("doc_id") % _BATCH_MOD == 0
    hashed = d.select("doc_id", md5_long(F.col("text")).alias("th"))
    exact_dup = (
        hashed.where(is_batch)
        .join(
            hashed.where(~is_batch).select("th").distinct(),
            "th",
            "left_semi",
        )
        .select("doc_id")
    )
    sh = d.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", F.explode(shingles("toks", 3)).alias("s")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    batch_sh = sh.where(is_batch)
    corpus_sh = sh.where(~is_batch)
    inter = (
        batch_sh.alias("a")
        .join(corpus_sh.alias("b"), F.col("a.s") == F.col("b.s"))
        .groupBy(
            F.col("a.doc_id").alias("bd"), F.col("b.doc_id").alias("cd")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = F.col("i") * F.lit(1.0) / (F.col("sza") + F.col("szb") - F.col("i"))
    near_dup = (
        inter.join(sizes.select(F.col("doc_id").alias("bd"), F.col("sz").alias("sza")), "bd")
        .join(sizes.select(F.col("doc_id").alias("cd"), F.col("sz").alias("szb")), "cd")
        .where(jac >= _JACCARD_T)
        .select(F.col("bd").alias("doc_id"))
        .distinct()
    )
    verdict = (
        F.when(F.col("is_exact"), "drop_exact")
        .when(F.col("is_near"), "drop_near")
        .otherwise("keep")
    )
    return (
        d.where(is_batch)
        .select("doc_id")
        .join(exact_dup.withColumn("is_exact", F.lit(True)), "doc_id", "left")
        .join(near_dup.withColumn("is_near", F.lit(True)), "doc_id", "left")
        .fillna(False, ["is_exact", "is_near"])
        .select("doc_id", verdict.alias("verdict"))
        .orderBy("doc_id")
    )
