"""Record linkage: blocked fuzzy (edit-distance) matching
(SURVEY.md §2.F training-pipeline closure — entity resolution over
catalog/name columns).

The naive fuzzy join is O(n²) Levenshtein calls — the canonical
scale-killer. The production shape is BLOCK → PREFILTER → REFINE:
a cheap equi-join key that true matches almost surely share (here
the first name token; phonetic keys or q-gram bands generalize), a
necessary-condition prefilter that is free to evaluate (edit distance
≥ |length difference|, so |Δlen| ≤ t prunes before any DP), and the
exact Levenshtein DP only on surviving candidates — JVM codegen on
both engines, bit-identical integer results.

No reference equivalent (SURVEY.md §0 provenance) — [N] scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_MAX_DIST = 3  # match threshold (edit ops)


@query(
    "q_fuzzy_name_pairs",
    oracle=f"""
    WITH n AS (
      SELECT p_name, CAST(MIN(p_partkey) AS BIGINT) AS canonical_key
      FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           a.canonical_key AS key_a, b.canonical_key AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM n a
    JOIN n b
      ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
     AND a.p_name < b.p_name
     AND abs(length(a.p_name) - length(b.p_name)) <= {_MAX_DIST}
    WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
    ORDER BY name_a, name_b
    """,
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy match over part names: distinct-name entities
    (canonical key = lowest part key), blocked on the first name
    token, length-difference prefiltered (|Δlen| ≤ t is NECESSARY for
    edit distance ≤ t — zero false dismissals), refined by exact
    Levenshtein ≤ {_MAX_DIST}.

    Plan: one distinct-name aggregate (entity table ≪ row table),
    a block-keyed equi-join (the only shuffle — candidate volume is
    Σ|block|², governed by the blocking key's selectivity exactly
    like LSH bands govern MinHash), the Δlen prefilter inside the
    join condition so it evaluates before any DP, and codegen
    levenshtein on survivors only. At 100 TB the block key generalizes
    to phonetic/q-gram band keys with the same plan; a hot block
    (skewed common first token) is the AQE-skew/salting case the
    near-dup family already documents."""
    p = load_table(spark, sf_dir, "part")
    n = p.groupBy("p_name").agg(
        F.min("p_partkey").cast("bigint").alias("canonical_key")
    )
    a = n.select(
        F.col("p_name").alias("name_a"),
        F.col("canonical_key").alias("key_a"),
        F.expr("split_part(p_name, ' ', 1)").alias("blk_a"),
        F.length("p_name").alias("len_a"),
    )
    b = n.select(
        F.col("p_name").alias("name_b"),
        F.col("canonical_key").alias("key_b"),
        F.expr("split_part(p_name, ' ', 1)").alias("blk_b"),
        F.length("p_name").alias("len_b"),
    )
    cand = a.join(
        b,
        (F.col("blk_a") == F.col("blk_b"))
        & (F.col("name_a") < F.col("name_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= _MAX_DIST),
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("bigint")
        )
        .where(F.col("dist") <= _MAX_DIST)
        .select("name_a", "name_b", "key_a", "key_b", "dist")
        .orderBy("name_a", "name_b")
    )
