"""Passage-level (sub-document) exact dedup: chunk each document into
fixed-size token passages, keep each distinct passage only for its
lowest-doc_id owner, and report per-document retention.

Whole-document dedup (operators/dedup.py) misses content duplicated
INSIDE otherwise-distinct documents (mirrored sections, quoted blocks,
syndicated fragments); passage dedup is the standard next pass in
training-data pipelines (e.g. C4/RefinedWeb line-dedup — here
10-token chunks, since the synthetic corpus has no line structure).

Scale design:
- chunking is one in-row projection (sequence + slice + concat_ws —
  no explode until the passage instances are needed, no Python);
- ownership = min(doc_id) per passage key: a single shuffle keyed on
  the 60-bit content hash (uniform by construction), with map-side
  partial min;
- the per-doc rollup joins instances back to owners on the same hash
  key — same partitioning, AQE reuses the exchange — then aggregates
  on doc_id (uniform).
At 100 TB the passage keyspace is the corpus token count / 10; both
shuffles are on uniform 60-bit keys, so there is no skew cliff. The
"keep" side (actual passage-pruned corpus) is the same plan with a
filter instead of the final count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.text import SQL_MD5_LONG, md5_long, tokens
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_P = 10  # tokens per passage

_SQL_PKEY = SQL_MD5_LONG.format(expr="passage")


@query(
    "q_passage_dedup_stats",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS w,
             generate_subscripts(str_split(text, ' '), 1) AS i
      FROM documents
    ),
    p AS (
      SELECT doc_id, (i - 1) // {_P} AS pidx,
             string_agg(w, ' ' ORDER BY i) AS passage
      FROM pos GROUP BY 1, 2
    ),
    pk AS (SELECT doc_id, {_SQL_PKEY} AS pkey FROM p),
    inst AS (
      SELECT doc_id, pkey, CAST(COUNT(*) AS BIGINT) AS n_inst
      FROM pk GROUP BY 1, 2
    ),
    own AS (SELECT pkey, MIN(doc_id) AS owner FROM pk GROUP BY 1)
    SELECT i.doc_id,
           CAST(SUM(i.n_inst) AS BIGINT) AS n_passages,
           CAST(COUNT(*) FILTER (o.owner = i.doc_id) AS BIGINT) AS n_kept
    FROM inst i JOIN own o USING (pkey)
    GROUP BY i.doc_id
    ORDER BY doc_id
    """,
)
def q_passage_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document passage retention after corpus-wide exact passage
    dedup (keep-first-owner, within-doc repeats collapse to one).

    n_passages counts every 10-token chunk the doc contributes
    (including the trailing partial); n_kept counts the distinct
    passages this doc owns (it is the corpus-wide minimum doc_id for
    the passage AND repeats within the doc count once).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    chunks = docs.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, CAST((size(toks) - 1) / {_P} AS INT)), "
            f"j -> concat_ws(' ', slice(toks, j * {_P} + 1, {_P})))"
        ).alias("passages"),
    )
    pk = chunks.select(
        "doc_id", F.explode("passages").alias("passage")
    ).select("doc_id", md5_long(F.col("passage")).alias("pkey"))
    inst = pk.groupBy("doc_id", "pkey").agg(F.count("*").alias("n_inst"))
    own = pk.groupBy("pkey").agg(F.min("doc_id").alias("owner"))
    return (
        inst.join(own, "pkey")
        .groupBy("doc_id")
        .agg(
            F.sum("n_inst").alias("n_passages"),
            F.sum(
                F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_kept"),
        )
        .orderBy("doc_id")
    )
