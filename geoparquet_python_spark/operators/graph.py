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

from geoparquet_python_spark.functions.exact import broadcast_narrow, materialize
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


# --------------------------------------------------------------------------
# PageRank over the near-dup graph (iterative algorithm, fixed-point)
# --------------------------------------------------------------------------

_PR_T = 3  # fixed power iterations
_PR_SCALE = 1_000_000_000_000  # 1e12 rank units
_PR_D_NUM, _PR_D_DEN = 85, 100  # damping 0.85 as an exact rational


def _sql_pagerank_ctes() -> str:
    """edges (symmetrized), deg, n, r0, then _PR_T unrolled
    (contrib -> rank) rounds ending in r{_PR_T}. All integer: ranks in
    1e12 units, truncating division (DuckDB `//` == Spark `div`)."""
    parts = [
        """edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    )""",
        "deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)",
        "n AS (SELECT COUNT(*) AS n FROM deg)",
        f"""r0 AS (
      SELECT src AS doc_id, CAST({_PR_SCALE} // n.n AS BIGINT) AS r
      FROM deg CROSS JOIN n
    )""",
    ]
    for t in range(_PR_T):
        parts.append(f"""c{t} AS (
      SELECT e.dst AS doc_id,
             CAST(SUM(r.r // d.d) AS BIGINT) AS s
      FROM edges e
      JOIN r{t} r ON r.doc_id = e.src
      JOIN deg d ON d.src = e.src
      GROUP BY e.dst
    )""")
        parts.append(f"""r{t + 1} AS (
      SELECT c.doc_id,
             CAST(({15 * _PR_SCALE} // ({_PR_D_DEN} * n.n))
                  + ({_PR_D_NUM} * c.s) // {_PR_D_DEN} AS BIGINT) AS r
      FROM c{t} c CROSS JOIN n
    )""")
    return ",\n    ".join(parts)


@query(
    "q_pagerank_neardup",
    oracle=f"""
    WITH {sql_shingles_cte(k=3)},
    {_SQL_JACCARD_PAIRS},
    {_sql_pagerank_ctes()}
    SELECT r.doc_id, r.r AS rank_fp, d.d AS degree,
           r.r / {float(_PR_SCALE)} AS rank
    FROM r{_PR_T} r JOIN deg d ON d.src = r.doc_id
    ORDER BY doc_id
    """,
)
def q_pagerank_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed power iterations, damping 0.85) over the
    symmetrized exact-Jaccard near-dup graph: which documents sit at
    the CENTER of duplication mass — the canonical-pick signal that
    degree alone misses (a doc bridging two duplicate families
    outranks an equally-connected doc inside one).

    The iterative-algorithm template on Spark: a fixed iteration
    count unrolls into T dataflow rounds — each one edge-keyed join +
    one dst-keyed aggregate, with the rank frame materialized per
    round so lineage stays flat (the 100 TB equivalent checkpoints
    the rank table; same idiom as functions/exact.materialize). No
    collect, no driver state: ranks never leave the cluster.

    Determinism: ranks are int64 1e12-unit fixed point; per-edge
    contribution is truncating `div` (== DuckDB `//`); damping is the
    exact rational 85/100 applied in integers. The undirected graph
    has no dangling nodes (every node of `edges` has out-degree >= 1),
    so no dangling-mass term — documented contract, mirrored exactly
    in the unrolled-CTE oracle.
    """
    edges = materialize(
        _exact_jaccard_pairs(spark, sf_dir)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    sym = edges.unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = materialize(sym)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    n = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = materialize(
        deg.crossJoin(broadcast_narrow(n)).select(
            F.col("src").alias("doc_id"),
            F.expr(f"{_PR_SCALE} div n").cast("bigint").alias("r"),
        )
    )
    for _ in range(_PR_T):
        contribs = (
            sym.join(ranks.withColumnRenamed("doc_id", "src"), "src")
            .join(deg, "src")
            .select("dst", F.expr("r div d").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = materialize(
            contribs.crossJoin(broadcast_narrow(n)).select(
                F.col("dst").alias("doc_id"),
                (
                    F.expr(f"{15 * _PR_SCALE} div ({_PR_D_DEN} * n)")
                    + F.expr(f"({_PR_D_NUM} * s) div {_PR_D_DEN}")
                )
                .cast("bigint")
                .alias("r"),
            )
        )
    return (
        ranks.join(deg, ranks.doc_id == deg.src)
        .select(
            "doc_id",
            F.col("r").alias("rank_fp"),
            F.col("d").alias("degree"),
            (F.col("r") / F.lit(float(_PR_SCALE))).alias("rank"),
        )
        .orderBy("doc_id")
    )
