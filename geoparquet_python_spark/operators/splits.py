"""Leakage-safe train/val/test splitting (SURVEY.md §2.F closure).

A plain content-addressed split (operators/sampling.py) assigns each
DOC independently — so two near-duplicate documents can land in
different splits, leaking training text into eval. The leakage-safe
form splits by near-dup CLUSTER: every doc maps to its cluster
representative (docs outside any near-dup pair represent themselves),
and the md5 split decision is taken on the representative, so a whole
duplicate family moves between splits as one unit.

Plan shape at 100 TB: the pair graph lives on the near-dup candidate
set (orders smaller than the corpus), components contract in O(log n)
rounds (star contraction, operators/dedup.py), and the corpus-sized
work is one left join against the (doc -> rep) map plus a map-only
bucket projection. Nothing corpus-sized is ever broadcast.

No reference equivalent (SURVEY.md §0) — BASELINE.json north-star
scope ("deduplication" x "deterministic splits" composed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.text import sql_shingles_cte
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.operators.dedup import (
    _SQL_JACCARD_PAIRS,
    _exact_jaccard_pairs,
    star_contraction_components,
)
from geoparquet_python_spark.operators.sampling import hash_bucket, sql_hash_bucket
from geoparquet_python_spark.registry import query

_TRAIN_PCT = 80
_VAL_PCT = 90  # train < 80 <= val < 90 <= test

# Shared oracle CTE chain: near-dup pairs -> transitive closure ->
# per-doc representative (self for singleton docs).
_SQL_REPS = f"""
    {sql_shingles_cte(k=3)},
    {_SQL_JACCARD_PAIRS},
    edges AS (
      SELECT doc_a AS s, doc_b AS d FROM pairs
      UNION ALL
      SELECT doc_b AS s, doc_a AS d FROM pairs
    ),
    nodes AS (SELECT DISTINCT s FROM edges),
    reach(s, d) AS (
      SELECT s, s FROM nodes
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON e.s = r.d
    ),
    reps AS (SELECT s AS doc_id, MIN(d) AS rep FROM reach GROUP BY s),
    assign AS (
      SELECT doc.doc_id,
             COALESCE(r.rep, doc.doc_id) AS group_id
      FROM documents doc LEFT JOIN reps r ON r.doc_id = doc.doc_id
    )"""


def _doc_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, group_id): near-dup cluster representative per doc,
    self for docs in no near-dup pair. Star contraction bounds rounds
    at O(log n) regardless of chain length."""
    pairs = _exact_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    comps = star_contraction_components(pairs)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(
        comps.select(F.col("node").alias("doc_id"), "label"), "doc_id", "left"
    ).select(
        "doc_id", F.coalesce("label", "doc_id").alias("group_id")
    )


def _split_col(group_col: str) -> F.Column:
    b = hash_bucket(F.col(group_col))
    return (
        F.when(b < _TRAIN_PCT, "train")
        .when(b < _VAL_PCT, "val")
        .otherwise("test")
        .alias("split")
    )


@query(
    "q_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {_SQL_REPS}
    SELECT doc_id, group_id,
           CASE WHEN {sql_hash_bucket("group_id")} < {_TRAIN_PCT} THEN 'train'
                WHEN {sql_hash_bucket("group_id")} < {_VAL_PCT} THEN 'val'
                ELSE 'test' END AS split
    FROM assign
    ORDER BY doc_id
    """,
)
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc split assignment where the md5 bucket is taken on the
    near-dup cluster representative: near-duplicate docs are guaranteed
    the same split (no train->eval leakage through paraphrases), docs
    with no near-dup keep the plain content-addressed assignment, and
    adding new corpus data never moves an existing group.

    Oracle: recursive-CTE transitive closure for the representative +
    the same md5 bucket arithmetic.
    """
    return (
        _doc_groups(spark, sf_dir)
        .select("doc_id", "group_id", _split_col("group_id"))
        .orderBy("doc_id")
    )


@query(
    "q_split_leakage_audit",
    oracle=f"""
    WITH RECURSIVE {_SQL_REPS},
    split_of AS (
      SELECT doc_id,
             CASE WHEN {sql_hash_bucket("group_id")} < {_TRAIN_PCT} THEN 'train'
                  WHEN {sql_hash_bucket("group_id")} < {_VAL_PCT} THEN 'val'
                  ELSE 'test' END AS safe_split,
             CASE WHEN {sql_hash_bucket("doc_id")} < {_TRAIN_PCT} THEN 'train'
                  WHEN {sql_hash_bucket("doc_id")} < {_VAL_PCT} THEN 'val'
                  ELSE 'test' END AS naive_split
      FROM assign
    )
    SELECT COUNT(*) AS n_neardup_pairs,
           CAST(SUM(CASE WHEN sa.naive_split <> sb.naive_split
                         THEN 1 ELSE 0 END) AS BIGINT) AS naive_crossings,
           CAST(SUM(CASE WHEN sa.safe_split <> sb.safe_split
                         THEN 1 ELSE 0 END) AS BIGINT) AS safe_crossings
    FROM pairs p
    JOIN split_of sa ON sa.doc_id = p.doc_a
    JOIN split_of sb ON sb.doc_id = p.doc_b
    """,
)
def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit that justifies the operator: over every near-dup pair,
    count split-boundary crossings under (a) the naive per-doc split
    and (b) the cluster-keyed split. Safe crossings are structurally 0
    (both endpoints share a representative); the naive count is the
    leakage a per-doc split would have shipped.

    Plan: pair-set-sized joins only (the corpus never reshuffles); a
    single-row aggregate output.
    """
    pairs = _exact_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    groups = _doc_groups(spark, sf_dir)
    splits = groups.select(
        "doc_id",
        _split_col("group_id").alias("safe_split"),
        F.when(hash_bucket(F.col("doc_id")) < _TRAIN_PCT, "train")
        .when(hash_bucket(F.col("doc_id")) < _VAL_PCT, "val")
        .otherwise("test")
        .alias("naive_split"),
    )
    sa = splits.select(
        F.col("doc_id").alias("doc_a"),
        F.col("safe_split").alias("safe_a"),
        F.col("naive_split").alias("naive_a"),
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"),
        F.col("safe_split").alias("safe_b"),
        F.col("naive_split").alias("naive_b"),
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .agg(
            F.count(F.lit(1)).alias("n_neardup_pairs"),
            F.sum(
                F.when(F.col("naive_a") != F.col("naive_b"), 1).otherwise(0)
            ).cast("bigint").alias("naive_crossings"),
            F.sum(
                F.when(F.col("safe_a") != F.col("safe_b"), 1).otherwise(0)
            ).cast("bigint").alias("safe_crossings"),
        )
    )
