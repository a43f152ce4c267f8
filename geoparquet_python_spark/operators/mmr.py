"""Maximal Marginal Relevance (MMR) diversified top-k selection.

Carbonell & Goldstein (1998): greedily pick items maximizing
``relevance − λ · max-similarity-to-already-selected`` — the standard
way to choose exemplars that are both close to a query and mutually
diverse. In a training-data pipeline this is diverse exemplar /
few-shot-pool selection per class; in retrieval it is the rerank that
stops the top-k from being k near-copies.

No reference equivalent (SURVEY.md §0 provenance) — [N] north-star
scope beside the ANN family (operators/similarity.py).

Spark-first shape: the greedy loop has a FIXED depth (k = 3), so it
unrolls into k dataflow steps — each an argmax window per label plus
one label-keyed join against the (labels-sized) selection frame via
``broadcast_bounded`` — no driver loop, no collect, no UDF. Candidate
relevance/similarity reuse the fixed-point dot machinery
(functions/vector.py), so every double here is bit-identical to the
DuckDB oracle's and the greedy argmax cannot diverge between engines.

Scale: candidates shuffle ONCE on label (the window partition); the
per-step selection frames are |labels| rows (broadcast). At 100 TB the
window partitions are per-label candidate sets — the same blocking
contract as q_ann_topk_blocked; a label too hot for one partition
would use the IVF route to pre-thin candidates first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import broadcast_bounded, materialize
from geoparquet_python_spark.functions.vector import (
    SQL_FLAT_EMBEDDINGS,
    cosine_from_scaled,
    dot_scaled,
    norm2_scaled,
)
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_LAMBDA = 0.5
_K = 3
_MAX_LABELS = 4096  # broadcast_bounded cap for per-label frames


def _sql_cos_to(sel: str, out: str) -> str:
    """CTE computing cosine of every candidate to its label's single
    row in ``sel(label, vec_id)`` — positional-join dot, fixed-point,
    identical formula to functions/vector.py."""
    return f"""
    {out} AS (
      SELECT c.label, c.vec_id,
             (CAST(SUM(CAST(floor(fa.x * fb.x * 1e12) AS BIGINT)) AS BIGINT)
               / 1e12)
             / (sqrt(na.n2 / 1e12) * sqrt(nb.n2 / 1e12)) AS c
      FROM cand c
      JOIN {sel} s ON s.label = c.label
      JOIN flat fa ON fa.vec_id = c.vec_id
      JOIN flat fb ON fb.vec_id = s.vec_id AND fb.i = fa.i
      JOIN norms na ON na.vec_id = c.vec_id
      JOIN norms nb ON nb.vec_id = s.vec_id
      GROUP BY c.label, c.vec_id, na.n2, nb.n2
    )"""


_MMR_ORACLE = f"""
    WITH el AS (SELECT vec_id, label FROM embeddings),
    seed AS (SELECT label, MIN(vec_id) AS sid FROM el GROUP BY label),
    flat AS ({SQL_FLAT_EMBEDDINGS}),
    norms AS (
      SELECT vec_id,
             CAST(SUM(CAST(floor(x * x * 1e12) AS BIGINT)) AS BIGINT) AS n2
      FROM flat GROUP BY vec_id
    ),
    cand AS (
      SELECT el.label, el.vec_id
      FROM el JOIN seed s ON s.label = el.label AND el.vec_id <> s.sid
    ),
    seedv AS (SELECT label, sid AS vec_id FROM seed),
    {_sql_cos_to("seedv", "relc")},
    rel AS (SELECT label, vec_id, c AS rel FROM relc),
    s1 AS (
      SELECT label, vec_id, rel AS score, rel FROM (
        SELECT *, row_number() OVER (
          PARTITION BY label ORDER BY rel DESC, vec_id) AS rn
        FROM rel) WHERE rn = 1
    ),
    s1v AS (SELECT label, vec_id FROM s1),
    {_sql_cos_to("s1v", "cos1")},
    r2 AS (
      SELECT r.label, r.vec_id, r.rel, c1.c AS maxsim,
             r.rel - {_LAMBDA} * c1.c AS score
      FROM rel r
      JOIN cos1 c1 ON c1.label = r.label AND c1.vec_id = r.vec_id
      JOIN s1 ON s1.label = r.label AND r.vec_id <> s1.vec_id
    ),
    s2 AS (
      SELECT label, vec_id, score, rel, maxsim FROM (
        SELECT *, row_number() OVER (
          PARTITION BY label ORDER BY score DESC, vec_id) AS rn
        FROM r2) WHERE rn = 1
    ),
    s2v AS (SELECT label, vec_id FROM s2),
    {_sql_cos_to("s2v", "cos2")},
    r3 AS (
      SELECT r.label, r.vec_id, r.rel,
             r.rel - {_LAMBDA} * GREATEST(r.maxsim, c2.c) AS score
      FROM r2 r
      JOIN cos2 c2 ON c2.label = r.label AND c2.vec_id = r.vec_id
      JOIN s2 ON s2.label = r.label AND r.vec_id <> s2.vec_id
    ),
    s3 AS (
      SELECT label, vec_id, score, rel FROM (
        SELECT *, row_number() OVER (
          PARTITION BY label ORDER BY score DESC, vec_id) AS rn
        FROM r3) WHERE rn = 1
    )
    SELECT label, 1 AS rank, vec_id, rel, score FROM s1
    UNION ALL SELECT label, 2, vec_id, rel, score FROM s2
    UNION ALL SELECT label, 3, vec_id, rel, score FROM s3
    ORDER BY label, rank
"""


def _argmax(df: DataFrame, score, keep: list) -> DataFrame:
    """Per-label argmax by (score desc, vec_id) — window over the
    label partition, the same blocking key every step shuffles on."""
    w = Window.partitionBy("label").orderBy(score.desc(), F.col("vec_id"))
    return (
        df.withColumn("score", score)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(*keep)
    )


@query("q_mmr_diverse_topk", oracle=_MMR_ORACLE)
def q_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-3 per label: relevance = cosine to the
    label's seed vector (its min vec_id member), diversity penalty =
    λ·max cosine to the already-selected set, greedy over 3 unrolled
    dataflow steps. Output: (label, rank, vec_id, rel, score) where
    score is the greedy objective at selection time.
    """
    base = load_table(spark, sf_dir, "embeddings").select(
        "label",
        "vec_id",
        F.col("embedding").alias("emb"),
        norm2_scaled("embedding").alias("n2"),
    )
    seed = _argmax(
        base, -F.col("vec_id"), ["label", "vec_id", "emb", "n2"]
    ).select(
        "label",
        F.col("vec_id").alias("s_vec"),
        F.col("emb").alias("s_emb"),
        F.col("n2").alias("s_n2"),
    )
    cand = materialize(
        base.join(broadcast_bounded(seed, max_rows=_MAX_LABELS), "label")
        .where(F.col("vec_id") != F.col("s_vec"))
        .select(
            "label",
            "vec_id",
            "emb",
            "n2",
            cosine_from_scaled(
                dot_scaled("emb", "s_emb"), F.col("n2"), F.col("s_n2")
            ).alias("rel"),
        )
    )

    def to_sel(picked: DataFrame) -> DataFrame:
        return picked.select(
            "label",
            F.col("vec_id").alias("s_vec"),
            F.col("emb").alias("s_emb"),
            F.col("n2").alias("s_n2"),
        )

    keep = ["label", "vec_id", "emb", "n2", "rel", "score"]
    s1 = _argmax(cand, F.col("rel"), keep)

    c1 = (
        cand.join(broadcast_bounded(to_sel(s1), max_rows=_MAX_LABELS), "label")
        .where(F.col("vec_id") != F.col("s_vec"))
        .select(
            "label",
            "vec_id",
            "emb",
            "n2",
            "rel",
            cosine_from_scaled(
                dot_scaled("emb", "s_emb"), F.col("n2"), F.col("s_n2")
            ).alias("maxsim"),
        )
    )
    s2 = _argmax(
        c1, F.col("rel") - _LAMBDA * F.col("maxsim"), [*keep, "maxsim"]
    )

    c2 = (
        c1.join(broadcast_bounded(to_sel(s2), max_rows=_MAX_LABELS), "label")
        .where(F.col("vec_id") != F.col("s_vec"))
        .select(
            "label",
            "vec_id",
            "rel",
            F.greatest(
                "maxsim",
                cosine_from_scaled(
                    dot_scaled("emb", "s_emb"), F.col("n2"), F.col("s_n2")
                ),
            ).alias("maxsim"),
        )
    )
    s3 = _argmax(
        c2, F.col("rel") - _LAMBDA * F.col("maxsim"), ["label", "vec_id", "rel", "score"]
    )

    out = (
        s1.select("label", F.lit(1).alias("rank"), "vec_id", "rel", "score")
        .unionByName(
            s2.select("label", F.lit(2).alias("rank"), "vec_id", "rel", "score")
        )
        .unionByName(
            s3.select("label", F.lit(3).alias("rank"), "vec_id", "rel", "score")
        )
    )
    return out.orderBy("label", "rank")
