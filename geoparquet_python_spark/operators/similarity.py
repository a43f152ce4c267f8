"""Similarity search over the `embeddings` table (SURVEY.md §2.F F3:
brute-force cosine top-k baseline + blocked/IVF-style scale path +
embedding-cosine near-dup).

All vector arithmetic is fixed-point int64 (functions/vector.py):
order-independent, oracle-exact, and entirely inside whole-stage
codegen (zip_with/aggregate higher-order functions — no Python).

Scale notes: brute force is O(Q·N) — correct baseline, used with a
bounded query set; the blocked variant restricts candidates to the
query's coarse cell (here the `label` column as the IVF assignment),
cutting candidates by the cell count. At 100 TB you'd precompute
cells with a trained quantizer; the operator shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.vector import (
    SQL_FLAT_EMBEDDINGS,
    cosine_from_scaled,
    dot_scaled,
    norm2_scaled,
)
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_SQL_COSINE_PAIRS = f"""
    flat AS ({SQL_FLAT_EMBEDDINGS}),
    norms AS (
      SELECT vec_id,
             CAST(SUM(CAST(floor(x * x * 1e12) AS BIGINT)) AS BIGINT) AS n2
      FROM flat GROUP BY vec_id
    ),
    dots AS (
      SELECT fa.vec_id AS qid, fb.vec_id AS cid,
             CAST(SUM(CAST(floor(fa.x * fb.x * 1e12) AS BIGINT)) AS BIGINT) AS d
      FROM flat fa JOIN flat fb ON fa.i = fb.i {{pair_cond}}
      GROUP BY 1, 2
    ),
    cos AS (
      SELECT qid, cid,
             (d / 1e12) / (sqrt(na.n2 / 1e12) * sqrt(nb.n2 / 1e12)) AS cosine
      FROM dots
      JOIN norms na ON na.vec_id = qid
      JOIN norms nb ON nb.vec_id = cid
    )"""


@query(
    "q_cosine_topk_brute",
    oracle=f"""
    WITH {_SQL_COSINE_PAIRS.format(pair_cond="AND fa.vec_id < 10 AND fb.vec_id <> fa.vec_id")}
    SELECT qid, cid, cosine, rank
    FROM (
      SELECT qid, cid, cosine,
             row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, cid) AS rank
      FROM cos
    )
    WHERE rank <= 5
    ORDER BY qid, rank
    """,
)
def q_cosine_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id < 10.

    Queries (10 rows) are broadcast against the full corpus; the
    per-pair dot is one fused zip_with/aggregate expression; top-k is
    the row_number pattern with (cosine DESC, cid) total order.
    """
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding", norm2_scaled("embedding").alias("n2"))
    q = base.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    c = base.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.col("n2").alias("c_n2"),
    )
    pairs = F.broadcast(q).join(c, F.col("qid") != F.col("cid"))
    cos = cosine_from_scaled(
        dot_scaled("q_emb", "c_emb"), F.col("q_n2"), F.col("c_n2")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        pairs.select("qid", "cid", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .orderBy("qid", "rank")
    )


@query(
    "q_ann_topk_blocked",
    oracle=f"""
    WITH lbl AS (SELECT vec_id, label FROM embeddings),
    {_SQL_COSINE_PAIRS.format(pair_cond="AND fa.vec_id < 50 AND fb.vec_id <> fa.vec_id")}
    SELECT qid, cid, cosine, rank
    FROM (
      SELECT c.qid, c.cid, c.cosine,
             row_number() OVER (PARTITION BY c.qid ORDER BY c.cosine DESC, c.cid) AS rank
      FROM cos c
      JOIN lbl la ON la.vec_id = c.qid
      JOIN lbl lb ON lb.vec_id = c.cid AND lb.label = la.label
    )
    WHERE rank <= 3
    ORDER BY qid, rank
    """,
)
def q_ann_topk_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style blocked ANN: candidates limited to the query's coarse
    cell (`label`), then exact cosine top-3 within the cell.

    The block equi-join replaces the cross join — candidate count
    drops by ~|cells|; this is the 100 TB path (cells from a trained
    coarse quantizer, same plan shape).
    """
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", "label", "embedding", norm2_scaled("embedding").alias("n2")
    )
    q = base.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    c = base.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        F.col("n2").alias("c_n2"),
    )
    pairs = q.join(
        c, (F.col("q_label") == F.col("c_label")) & (F.col("qid") != F.col("cid"))
    )
    cos = cosine_from_scaled(
        dot_scaled("q_emb", "c_emb"), F.col("q_n2"), F.col("c_n2")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        pairs.select("qid", "cid", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .orderBy("qid", "rank")
    )


@query(
    "q_embedding_neardup_pairs",
    oracle=f"""
    WITH {_SQL_COSINE_PAIRS.format(pair_cond="AND fa.vec_id < fb.vec_id")}
    SELECT qid AS vec_a, cid AS vec_b, cosine
    FROM cos
    WHERE cosine >= 0.45
    ORDER BY vec_a, vec_b
    """,
)
def q_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.45).

    Test-scale: all-pairs; scale path: LSH over random hyperplanes or
    the blocked join above. The threshold sits above the corpus noise
    floor (max off-diagonal ≈ 0.51 in the driver data) so the result
    is a small, meaningful pair set.
    """
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", "embedding", norm2_scaled("embedding").alias("n2"))
    a = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("a_emb"),
        F.col("n2").alias("a_n2"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("b_emb"),
        F.col("n2").alias("b_n2"),
    )
    cos = cosine_from_scaled(
        dot_scaled("a_emb", "b_emb"), F.col("a_n2"), F.col("b_n2")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= 0.45)
        .orderBy("vec_a", "vec_b")
    )
