"""k-core decomposition of the near-duplicate graph: iterative
peeling to the maximal subgraph of minimum degree k.

Connected components (operators/dedup.py) answer "what merges";
triangles (operators/graph.py) audit transitivity locally. The
k-core is the global density certificate in between: every vertex in
the k-core has >= k neighbors INSIDE the core, so a 2-core member is
never attached to its duplicate family by a single chained edge —
exactly the over-merge risk single-link clustering carries. Curation
use: treat 2-core membership as "strong duplicate", pendant vertices
as "weak/chained", and keep the pendant's text while deduping the
core.

Algorithm (Spark side): classic peeling — drop vertices with degree
< k, re-derive degrees, repeat to fixpoint. Each round is one
pair-graph-sized aggregate plus two semi-joins; the frame SHRINKS
monotonically, and the round count is bounded by the longest pendant
chain (O(log n) rounds for real near-dup graphs, whose components
are clique-ish). Driver-side loop with localCheckpoint per round —
the same bounded-iteration pattern as k-means/BPE: the driver holds
one integer (the surviving-edge count), never data.

Oracle: the peeling UNROLLED to {R} rounds of plain CTEs — exact
whenever peeling converges within {R} rounds, which the companion
pytest asserts at test scales (and the Spark side runs to TRUE
fixpoint, so an under-deep oracle would surface as a mismatch, not a
silent agreement).

No reference equivalent (SURVEY.md §0 provenance) — [N] north-star
scope.

Scale shape (100 TB lens): everything is pair-graph-sized (the
corpus never re-enters after the candidate join); each round's
degree aggregate is partial map-side; the semi-joins hash-partition
on vertex ids — skew-free for near-dup graphs once the boilerplate
df-cap (dedup.py stop_shingle_df) bounds hot buckets upstream. The
O(rounds) sequential barrier is inherent to exact coreness; the
standard at-scale refinement (compute FULL coreness in one pass via
h-index iteration, Montresor et al.) keeps the same per-round plan.
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

_K = 2  # core order: >= 2 neighbors inside the core
_R = 8  # oracle unroll depth (pytest asserts convergence within it)


def _sql_peel_rounds() -> str:
    """e0 (symmetrized) .. e{R}: one degree-filter round per CTE.

    Every round is MATERIALIZED: DuckDB inlines plain CTEs, and each
    round references its predecessor three times, so the un-hinted
    unroll expands 3^R copies of the base pair query — a
    file-handle/plan explosion, not just slowness."""
    ctes = [
        """
    e0 AS MATERIALIZED (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION ALL
      SELECT doc_b AS u, doc_a AS v FROM pairs
    )"""
    ]
    for r in range(1, _R + 1):
        ctes.append(
            f"""
    v{r} AS MATERIALIZED (
      SELECT u FROM e{r - 1} GROUP BY u HAVING COUNT(*) >= {_K}
    ),
    e{r} AS MATERIALIZED (
      SELECT e.u, e.v FROM e{r - 1} e
      JOIN v{r} a ON a.u = e.u
      JOIN v{r} b ON b.u = e.v
    )"""
        )
    return ",".join(ctes)


@query(
    "q_kcore_vertices",
    oracle=f"""
    WITH {sql_shingles_cte(k=3)},
    {_SQL_JACCARD_PAIRS},
    {_sql_peel_rounds()}
    SELECT u AS doc_id, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM e{_R}
    GROUP BY u
    ORDER BY doc_id
    """,
)
def q_kcore_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertices of the {K}-core of the exact Jaccard near-dup graph,
    with each vertex's degree INSIDE the core — the strong-duplicate
    certificate chained/pendant members never earn. Spark peels to
    true fixpoint (checkpointed pair-graph rounds, driver holds one
    count); the oracle unrolls {R} peeling rounds, so convergence
    depth is itself oracle-certified."""
    pairs = materialize(
        _exact_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    )
    edges = pairs.selectExpr("doc_a AS u", "doc_b AS v").unionAll(
        pairs.selectExpr("doc_b AS u", "doc_a AS v")
    )
    edges = materialize(edges)
    n_edges = edges.count()
    while True:
        deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= _K).select("u")
        nxt = edges.join(keep, "u", "left_semi").join(
            keep.select(F.col("u").alias("v")), "v", "left_semi"
        )
        nxt = materialize(nxt.select("u", "v"))
        n_next = nxt.count()
        if n_next == n_edges:
            break
        edges, n_edges = nxt, n_next
    return (
        edges.groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
        .select(F.col("u").alias("doc_id"), "core_degree")
        .orderBy("doc_id")
    )
