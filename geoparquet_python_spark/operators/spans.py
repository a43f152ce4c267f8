"""Exact duplicated-SPAN detection — substring-level dedup at n-gram
granularity (SURVEY.md §2.F2; the reference's near-dup surface covers
whole-document measures only, so this is [N]-scope pipeline coverage).

Whole-document dedup (Jaccard / MinHash / SimHash) misses the common
web-corpus failure mode where two mostly-different pages share one
long verbatim block (boilerplate, license text, quoted articles).
The exact-substring formulation of "Deduplicating Training Data Makes
Language Models Better" (Lee et al., 2022, public) builds a suffix
array — which does not distribute. The distributed-friendly
re-expression used here: fingerprint every POSITIONAL k-token shingle,
mark shingles seen in ≥2 distinct documents, and merge each document's
marked positions into maximal duplicated spans (gaps-and-islands).
Any cross-document verbatim run of ≥ k tokens is covered by at least
one marked shingle, and a run of length L yields L−k+1 consecutive
marked positions that merge back into exactly the [start, start+L−1]
span — so span boundaries are exact for runs ≥ k, with k the detection
floor (the same granularity/recall trade every fingerprint-based
system makes; MinHash banding is the analogous trade for whole docs).

Plan shape (the 100 TB story):
- positional shingling is one in-row projection + explode — map-only;
- "seen in ≥2 docs" is ONE shuffle keyed by shingle (count distinct
  doc_id, full map-side partial aggregation);
- marking is a shingle-keyed semi join (AQE handles boilerplate-skewed
  shingles; a df cap like the Jaccard stop-shingle lever applies when
  one shingle floods — dropped shingles only ever SPLIT a span, never
  invent one);
- island merge is a doc_id-keyed window — positions for one document
  are co-partitioned, state is one lag value.
No all-pairs stage exists anywhere: cost is linear in corpus token
count regardless of how many documents share a span (the pair-based
containment query is quadratic in the shared-block document count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import spread
from geoparquet_python_spark.functions.text import tokens
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_K = 5  # span-detection shingle width (tokens)


def positional_shingles_frame(d: DataFrame) -> DataFrame:
    """(doc_id, p, s) from a (doc_id, text) frame: every k-token
    shingle with its 1-based start position. Built in one projection
    (transform-with-index) and exploded; no joins, no shuffle — pure
    stateless transforms, so the same function serves batch AND
    structured streams (streaming/spans.py screens an ingest stream
    with it)."""
    parts = ", ".join(f"toks[i + {j}]" for j in range(_K))
    sh = F.expr(
        f"filter(transform(toks, (x, i) -> "
        f"CASE WHEN i <= size(toks) - {_K} THEN "
        f"struct(CAST(i + 1 AS BIGINT) AS p, concat_ws(' ', {parts}) AS s) "
        f"END), t -> t IS NOT NULL)"
    )
    return (
        d.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", F.explode(sh).alias("t"))
        .select("doc_id", F.col("t.p").alias("p"), F.col("t.s").alias("s"))
    )


def _positional_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return positional_shingles_frame(
        spread(load_table(spark, sf_dir, "documents"))
    )


def _sql_span_ctes() -> str:
    """DuckDB mirror: psh (positional shingles), dup (cross-doc
    shingles), isl (island ids over marked positions)."""
    joins = "\n".join(
        f"      JOIN pos t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.i = t0.i + {j}"
        for j in range(1, _K)
    )
    concat = " || ' ' || ".join(f"t{j}.w" for j in range(_K))
    return f"""
    pos AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS w,
             generate_subscripts(str_split(text, ' '), 1) AS i
      FROM documents
    ),
    psh AS (
      SELECT t0.doc_id, CAST(t0.i AS BIGINT) AS p, {concat} AS s
      FROM pos t0
{joins}
    ),
    dup AS (
      SELECT s FROM psh GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    marked AS (
      SELECT doc_id, p FROM psh WHERE s IN (SELECT s FROM dup)
    ),
    isl AS (
      SELECT doc_id, p,
             SUM(CASE WHEN prev_p IS NULL OR p - prev_p > {_K}
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY p) AS island
      FROM (
        SELECT doc_id, p,
               lag(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev_p
        FROM marked
      )
    ),
    spans AS (
      SELECT doc_id,
             CAST(MIN(p) AS BIGINT) AS span_start,
             CAST(MAX(p) + {_K} - 1 AS BIGINT) AS span_end,
             CAST(MAX(p) + {_K} - MIN(p) AS BIGINT) AS span_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_shingles
      FROM isl
      GROUP BY doc_id, island
    )"""


def _spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated spans per document (Spark side of the CTEs)."""
    psh = _positional_shingles(spark, sf_dir)
    # ONE shuffle keyed by shingle: cross-doc occurrence counts.
    dup = (
        psh.groupBy("s")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("s")
    )
    marked = psh.join(dup, "s", "left_semi").select("doc_id", "p")
    w = Window.partitionBy("doc_id").orderBy("p")
    brk = F.when(
        F.lag("p").over(w).isNull() | (F.col("p") - F.lag("p").over(w) > _K),
        F.lit(1),
    ).otherwise(F.lit(0))
    isl = marked.withColumn(
        "island",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("p").cast("bigint").alias("span_start"),
        (F.max("p") + _K - 1).cast("bigint").alias("span_end"),
        (F.max("p") + _K - F.min("p")).cast("bigint").alias("span_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
    )


@query(
    "q_duplicate_ngram_spans",
    oracle=f"""
    WITH {_sql_span_ctes()}
    SELECT doc_id, span_start, span_end, span_tokens, n_shingles
    FROM spans
    ORDER BY doc_id, span_start
    """,
)
def q_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every maximal cross-document duplicated span: (doc_id,
    span_start, span_end) in 1-based token positions, plus the span's
    token length and the count of marked shingles that merged into it.
    The per-document cut list an exact-substring dedup pass consumes
    (drop or trim the spans, keep the prose around them)."""
    return (
        _spans(spark, sf_dir)
        .select("doc_id", "span_start", "span_end", "span_tokens", "n_shingles")
        .orderBy("doc_id", "span_start")
    )


@query(
    "q_duplicate_span_doc_stats",
    oracle=f"""
    WITH {_sql_span_ctes()},
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(span_tokens) AS BIGINT) AS dup_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_spans
      FROM spans GROUP BY doc_id
    ),
    toks AS (
      SELECT doc_id,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT t.doc_id, t.n_tokens, p.dup_tokens, p.n_spans,
           CAST(p.dup_tokens * 1000000 // t.n_tokens AS BIGINT)
             AS dup_frac_micro
    FROM per_doc p JOIN toks t ON t.doc_id = p.doc_id
    ORDER BY t.doc_id
    """,
)
def q_duplicate_span_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication burden: total duplicated tokens, span
    count, and the duplicated fraction in exact micro-units — the
    curation signal that decides KEEP / TRIM / DROP per document
    (e.g. drop when >80% of a page is boilerplate shared elsewhere).
    Only documents owning at least one duplicated span appear."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.size(tokens("text")).cast("bigint").alias("n_tokens")
    )
    per_doc = (
        _spans(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.sum("span_tokens").cast("bigint").alias("dup_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        )
    )
    return (
        per_doc.join(toks, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "dup_tokens",
            "n_spans",
            F.expr("dup_tokens * 1000000 DIV n_tokens")
            .cast("bigint")
            .alias("dup_frac_micro"),
        )
        .orderBy("doc_id")
    )
