"""Graph analytics over the near-duplicate pair graph: triangle
counting.

Companion to the connected-components clustering (operators/dedup.py
q_neardup_clusters*): triangles measure how TRANSITIVE the near-dup
relation actually is. A cluster rich in triangles is a genuine
duplicate family (every member pairs with every other); a long
triangle-free path through the threshold graph is chained drift —
A≈B≈C with A̸≈C — where single-link clustering over-merges. The
triangle census is the standard cheap audit for that risk.

No reference equivalent (SURVEY.md §0 provenance) — [N] north-star
scope.

Spark-first shape (the node-iterator / edge-orientation algorithm MR
folklore settled on — Suri & Vassilvitskii 2011 "Counting triangles
and the curse of the last reducer"):
- edges come from the exact inverted-index Jaccard join (already
  candidate-bounded, operators/dedup.py) and are oriented low-id →
  high-id, so each triangle is generated exactly once as a < b < c;
- wedges = edges ⋈ edges on the middle vertex (one hash-partitioned
  equi-join of the PAIR-GRAPH-sized frame — never corpus-sized);
- closure = wedges ⋈ edges on the (a, c) pair key;
- per-vertex counts explode each closed triangle to its three
  corners and aggregate (map-side combinable).
At 100 TB the classic refinement (orient by degree instead of id to
bound the hot vertex's wedge fan-out) drops in by swapping the
orientation key for (degree, id) — noted, not needed at the bench
densities where max degree is small; the id orientation keeps the
oracle a three-line self-join.

Determinism: pure integer joins/counts on an exact edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import materialize
from geoparquet_python_spark.functions.text import sql_shingles_cte
from geoparquet_python_spark.operators.dedup import (
    _SQL_JACCARD_PAIRS,
    _exact_jaccard_pairs,
)
from geoparquet_python_spark.registry import query


@query(
    "q_neardup_triangles",
    oracle=f"""
    WITH {sql_shingles_cte(k=3)},
    {_SQL_JACCARD_PAIRS},
    tri AS (
      SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
      FROM pairs e1
      JOIN pairs e2 ON e2.doc_a = e1.doc_b
      JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
    ),
    corners AS (
      SELECT a AS doc_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q_neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle counts in the exact Jaccard >= t graph:
    how many fully-transitive (clique-of-3) duplicate relations each
    document participates in. Documents absent from the output sit in
    no triangle — their near-dup links are unconfirmed by any third
    witness, the single-link over-merge risk the audit exists to
    surface."""
    edges = materialize(
        _exact_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    )
    e1 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = edges.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    wedges = e1.join(e2, "b")
    tri = wedges.join(e3, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("doc_id"))
        .unionAll(tri.select(F.col("b").alias("doc_id")))
        .unionAll(tri.select(F.col("c").alias("doc_id")))
    )
    return (
        corners.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("doc_id")
    )
