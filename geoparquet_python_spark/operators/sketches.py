"""Count-min sketch: sub-linear-memory frequency estimation for
heavy-hitter queries over unbounded term streams.

Spark ships HLL (count-distinct) but no CMS; this builds one as a
plain aggregate — which is exactly why CMS works at 100 TB: the
sketch is a (depth x width) integer matrix, each cell a SUM, so the
map-side partial aggregates ARE partial sketches and the shuffle
merges them cell-wise (CMS is a linear sketch: merge = matrix add).
Memory is depth*width ints regardless of vocabulary size, vs the
vocabulary-sized exact frequency table.

The hash family is the same Kirsch-Mitzenmacher double hashing as the
MinHash signatures (h1 + j*h2 from ONE md5, [[spark-duckdb-oracle-
determinism]]), so the whole sketch is deterministic and the DuckDB
oracle reproduces it cell-for-cell — the estimate column is exact on
both engines, and est >= true (CMS never underestimates) is asserted
in the output itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.text import SQL_MD5_LONG, md5_long, tokens
from geoparquet_python_spark.functions.exact import broadcast_narrow
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_W = 1024  # sketch width (buckets per row)
_D = 4  # sketch depth (hash functions)
_TOP = 20

# h2: md5 hex chars 16-29 (56 bits) — j*h2 + h1 stays < 2^63 for j<4.
_SQL_H2 = "CAST(('0x' || substr(md5({expr}), 16, 14)) AS BIGINT)"


def _h2(col):
    return F.conv(F.substring(F.md5(col), 16, 14), 16, 10).cast("long")


@query(
    "q_countmin_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(str_split(text, ' ')) AS term FROM documents
    ),
    hashed AS (
      SELECT term, {SQL_MD5_LONG.format(expr="term")} AS h1,
             {_SQL_H2.format(expr="term")} AS h2
      FROM tok
    ),
    cells AS (
      SELECT j, (h1 + j * h2) % {_W} AS bucket, COUNT(*) AS cnt
      FROM hashed, (SELECT unnest(range({_D})) AS j)
      GROUP BY 1, 2
    ),
    freq AS (SELECT term, COUNT(*) AS true_count FROM tok GROUP BY term),
    top AS (
      SELECT term, true_count FROM freq
      ORDER BY true_count DESC, term LIMIT {_TOP}
    ),
    probes AS (
      SELECT t.term, t.true_count, j.j,
             ({SQL_MD5_LONG.format(expr="t.term")}
               + j.j * {_SQL_H2.format(expr="t.term")}) % {_W} AS bucket
      FROM top t, (SELECT unnest(range({_D})) AS j) j
    )
    SELECT p.term,
           CAST(p.true_count AS BIGINT) AS true_count,
           CAST(MIN(c.cnt) AS BIGINT) AS est_count
    FROM probes p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
    GROUP BY p.term, p.true_count
    ORDER BY true_count DESC, term
    """,
)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True top-{_TOP} terms with their count-min estimates
    (depth {_D} x width {_W}): est_count = min over rows of the
    sketch cell each hash lands in; est >= true by construction, and
    the gap audits the sketch's collision error at this width.

    Build: one explode x depth -> ({_D}*{_W})-key SUM aggregate (the
    mergeable sketch). Probe: the top-term list is tiny -> its probes
    broadcast against the sketch cells; min per term. The exact freq
    table exists here only to pick/verify the heavy hitters — a pure
    production pass keeps ONLY the sketch."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("term"))
    hashed = tok.select(
        "term", md5_long(F.col("term")).alias("h1"), _h2(F.col("term")).alias("h2")
    )
    cells = (
        hashed.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, {_D - 1}), "
                    f"j -> struct(CAST(j AS BIGINT) AS j, "
                    f"(h1 + j * h2) % {_W} AS bucket))"
                )
            ).alias("c")
        )
        .select(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    top = freq.orderBy(F.col("true_count").desc(), "term").limit(_TOP)
    probes = top.select(
        "term",
        "true_count",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_D - 1}), j -> struct("
                f"CAST(j AS BIGINT) AS j, "
                f"(CAST(conv(substring(md5(term), 1, 15), 16, 10) AS BIGINT) "
                f" + j * CAST(conv(substring(md5(term), 16, 14), 16, 10) AS BIGINT)"
                f") % {_W} AS bucket))"
            )
        ).alias("p"),
    ).select(
        "term", "true_count", F.col("p.j").alias("j"), F.col("p.bucket").alias("bucket")
    )
    return (
        broadcast_narrow(probes)
        .join(cells, ["j", "bucket"])
        .groupBy("term", "true_count")
        .agg(F.min("cnt").alias("est_count"))
        .orderBy(F.col("true_count").desc(), "term")
    )
