"""Content-defined chunking (CDC) dedup: shift-resistant chunk-level
duplicate detection.

Fixed n-gram spans (operators/spans.py) find repeated FIXED-length
windows; storage/corpus dedup wants variable chunks whose BOUNDARIES
move with the content (LBFS/rsync lineage: Muthitacharoen et al.
SOSP'01), so an insertion early in a document only re-chunks the
region around the edit — every later chunk keeps its hash and still
dedups. The boundary rule here is the classic one re-expressed on
whitespace tokens: position i closes a chunk iff the hash of the
4-token window ending at i is ≡ 0 (mod {M}) — a content-local
predicate, so chunking is embarrassingly parallel and needs no state
beyond a 4-token tail at partition edges (in-row here: each document
is one value).

No reference equivalent (SURVEY.md §0 provenance) — [N] north-star
scope: chunk-level dedup is how a 100 TB corpus finds shared
boilerplate/quotations that whole-doc hashing misses and fixed
n-grams only catch at one granularity.

Determinism: the rolling window hash is `md5_long` of the joined
4-gram (the repo's 60-bit ANSI-reproducible hash), so Spark and
DuckDB place byte-identical boundaries; chunk identity is the chunk
STRING itself (count-distinct), no float anywhere.

Scale shape (100 TB lens):
- Boundary placement + chunk assembly are ONE map-side projection
  (transform/filter/slice inside the row — no explode until chunks
  exist, no shuffle to find boundaries).
- The only shuffle is the per-source aggregate over chunk hashes —
  count-distinct on a key whose cardinality is ≤ chunk count, with
  partial aggregation map-side. At 100 TB you'd swap the exact
  distinct for the HLL sketch (same plan, mergeable counters).
- Expected chunk length is the modulus ({M} tokens), tunable; the
  md5-per-position cost is the same O(tokens) the shingle pipelines
  already pay and stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import spread
from geoparquet_python_spark.functions.text import SQL_MD5_LONG
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_M = 32  # boundary modulus == expected chunk length in tokens
_W = 4  # rolling window width (tokens)


@query(
    "q_cdc_chunk_dedup",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, str_split(text, ' ') AS ts FROM documents
    ),
    pos AS (
      SELECT doc_id, source,
             generate_subscripts(ts, 1) AS i,
             unnest(ts) AS w,
             len(ts) AS n
      FROM tok
    ),
    g AS (
      SELECT doc_id, source, i, w, n,
             lag(w, 3) OVER win || ' ' || lag(w, 2) OVER win || ' ' ||
               lag(w, 1) OVER win || ' ' || w AS gram
      FROM pos
      WINDOW win AS (PARTITION BY doc_id ORDER BY i)
    ),
    bnd AS (
      SELECT doc_id, source, i AS p FROM g
      WHERE i >= {_W} AND i < n AND {SQL_MD5_LONG.format(expr="gram")} % {_M} = 0
      UNION ALL
      SELECT doc_id, source, n FROM g WHERE i = n
    ),
    asg AS (
      SELECT t.doc_id, t.source, t.i, t.w, MIN(b.p) AS cend
      FROM pos t
      JOIN bnd b ON b.doc_id = t.doc_id AND b.p >= t.i
      GROUP BY t.doc_id, t.source, t.i, t.w
    ),
    chk AS (
      SELECT doc_id, source, cend,
             string_agg(w, ' ' ORDER BY i) AS chunk,
             CAST(COUNT(*) AS BIGINT) AS ctoks
      FROM asg GROUP BY doc_id, source, cend
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(ctoks) AS BIGINT) AS n_chunk_tokens,
           CAST(COUNT(DISTINCT chunk) AS BIGINT) AS n_distinct_chunks,
           CAST((COUNT(*) - COUNT(DISTINCT chunk)) * 1000000 // COUNT(*)
                AS BIGINT) AS dup_chunk_ppm
    FROM chk
    GROUP BY source
    ORDER BY source
    """,
)
def q_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source content-defined chunk dedup report: chunk count,
    token mass, distinct chunks, and the duplicated-chunk fraction in
    exact ppm. Boundaries are content-defined (md5 of the 4-token
    window ≡ 0 mod {M}, last position always closes), so identical
    passages chunk identically wherever they sit in a document —
    the shift-resistance fixed n-grams lack.

    Plan: boundary positions, then chunks, are built INSIDE one
    projection per document (transform with index → filter → slice),
    a single explode yields the chunk stream, and one source-keyed
    aggregate (count + count-distinct, partial map-side) finishes.
    The oracle re-derives the identical chunks relationally (lag
    windows → min-boundary assignment join → ordered string_agg) —
    a structurally different computation agreeing bit-for-bit."""
    d = spread(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
    ).select("doc_id", "source", F.split("text", " ").alias("toks"))
    gram = " || ' ' || ".join(f"toks[i - {_W - 1 - j}]" for j in range(_W))
    gram_hash = (
        f"CAST(conv(substring(md5({gram}), 1, 15), 16, 10) AS BIGINT)"
    )
    # 0-based transform index i == token position i+1; a window ends
    # at position i+1 when it is >= _W wide, interior, and hash-hits.
    ends = (
        f"concat(filter(transform(toks, (x, i) -> CASE WHEN i >= {_W - 1} "
        f"AND i + 1 < size(toks) AND {gram_hash} % {_M} = 0 "
        f"THEN i + 1 END), p -> p IS NOT NULL), array(size(toks)))"
    )
    # (start, end) per chunk: zip the boundary array against its
    # 0-prepended self (the null-pad tail where b IS NULL is dropped).
    # Two expression-layout traps steer this shape — both measured
    # ~10× on this query:
    # 1. No lambda may index ends[k-1]: Catalyst inlines a projected
    #    alias into EVERY lambda reference (no CSE inside interpreted
    #    higher-order functions), re-running the O(n)-md5 boundary
    #    scan per chunk — quadratic. The zip-with-shifted-self form
    #    mentions `ends` exactly twice per row.
    # 2. The chunk STRING is assembled ABOVE the explode, not inside
    #    the generator: everything except the generator itself sits in
    #    the Project over Generate and is evaluated once per OUTPUT
    #    row (see the k-means Lloyd-update fix) — per output row here
    #    means exactly once per chunk, so only the cheap (s, b) int
    #    pairs flow through the generator.
    bounds = F.expr(
        f"filter(zip_with({ends}, concat(array(0), {ends}), "
        "(b, s) -> named_struct('s', s, 'b', b)), p -> p.b IS NOT NULL)"
    )
    chunk_rows = d.select(
        "source", "toks", F.explode(bounds).alias("p")
    ).select(
        "source",
        F.expr("concat_ws(' ', slice(toks, p.s + 1, p.b - p.s))").alias(
            "chunk"
        ),
        F.expr("CAST(p.b - p.s AS BIGINT)").alias("ctoks"),
    )
    return (
        chunk_rows.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("ctoks").cast("bigint").alias("n_chunk_tokens"),
            F.countDistinct("chunk").cast("bigint").alias(
                "n_distinct_chunks"
            ),
        )
        .select(
            "source",
            "n_chunks",
            "n_chunk_tokens",
            "n_distinct_chunks",
            F.expr(
                "CAST((n_chunks - n_distinct_chunks) * 1000000 "
                "div n_chunks AS BIGINT)"
            ).alias("dup_chunk_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-8: sliding-window RAG chunker — fixed width, fixed stride, overlap
# ---------------------------------------------------------------------------

_RW = 128  # window width (tokens)
_RS = 96  # stride (tokens) => 32-token overlap between neighbors


@query(
    "q_rag_window_chunks",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, str_split(text, ' ') AS ws,
             len(str_split(text, ' ')) AS n
      FROM documents
    ),
    lim AS (
      SELECT doc_id, source, ws, n,
             CASE WHEN n > {_RW}
                  THEN (n - {_RW} + {_RS} - 1) // {_RS}
                  ELSE 0 END AS l
      FROM tok
    ),
    ch0 AS (
      SELECT doc_id, source, ws, n,
             unnest(generate_series(0, l)) AS k
      FROM lim
    ),
    ch AS (
      SELECT doc_id, source, n,
             LEAST({_RW}, n - k * {_RS}) AS ctoks,
             md5(array_to_string(
               list_slice(ws, k * {_RS} + 1,
                          k * {_RS} + LEAST({_RW}, n - k * {_RS})), ' '))
               AS chash
      FROM ch0
    ),
    corp AS (
      SELECT source, CAST(SUM(n) AS BIGINT) AS n_corpus_tokens
      FROM tok GROUP BY source
    )
    SELECT c.source,
           CAST(COUNT(DISTINCT c.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(c.ctoks) AS BIGINT) AS n_chunk_tokens,
           CAST(MIN(o.n_corpus_tokens) AS BIGINT) AS n_corpus_tokens,
           CAST((SUM(c.ctoks) - MIN(o.n_corpus_tokens)) * 1000000
                // SUM(c.ctoks) AS BIGINT) AS overlap_ppm,
           CAST(COUNT(DISTINCT c.chash) AS BIGINT) AS n_distinct_chunks
    FROM ch c JOIN corp o ON o.source = c.source
    GROUP BY c.source
    ORDER BY c.source
    """,
)
def q_rag_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window RAG chunker: every document splits into
    {_RW}-token windows at stride {_RS} (a {_RW - _RS}-token overlap so
    no retrieval-relevant span straddles a hard boundary — the
    standard retrieval-corpus preparation, vs the content-defined
    VARIABLE chunks above whose boundaries serve dedup). Per-source
    accounting: chunk and token counts, the overlap tax
    (chunk_tokens − corpus_tokens, as ppm of chunk tokens — the
    storage/compute multiplier the stride choice buys), and distinct
    chunk hashes (verbatim-repeated windows collapse at index time).

    Plan shape: chunk COUNT per doc is closed-form
    (ceil((n−W)/S) + 1, integer-exact on both engines), so the
    generator input is just sequence(0, l) off two small ints — the
    chunk text is sliced and hashed in the projection ABOVE the
    explode, i.e. once per OUTPUT chunk (the Generate-projection
    rule operators/chunking.py's CDC docstring documents); the token
    array is materialized below the explode so projection collapse
    cannot inline the str_split into every chunk row (measured 5×
    re-tokenization otherwise — the round-7 Generate note). One
    explode, one per-source aggregate with map-side combine; chunk
    rows never shuffle (the distinct-hash count aggregates md5s, not
    chunk strings)."""
    from geoparquet_python_spark.functions.exact import materialize
    from geoparquet_python_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tok = materialize(
        spread(
            d.select("doc_id", "source", tokens("text").alias("ws"))
        ).withColumn("n", F.size("ws"))
    )
    lim = tok.withColumn(
        "l",
        F.when(
            F.col("n") > _RW,
            F.expr(f"CAST((n - {_RW} + {_RS} - 1) DIV {_RS} AS BIGINT)"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    ch = lim.select(
        "doc_id",
        "source",
        "n",
        "ws",
        F.explode(F.expr("sequence(CAST(0 AS BIGINT), l)")).alias("k"),
    ).select(
        "doc_id",
        "source",
        F.expr(f"LEAST({_RW}, n - k * {_RS})").alias("ctoks"),
        F.expr(
            f"md5(array_join(slice(ws, CAST(k * {_RS} + 1 AS INT), "
            f"CAST(LEAST({_RW}, n - k * {_RS}) AS INT)), ' '))"
        ).alias("chash"),
    )
    corp = tok.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_corpus_tokens")
    )
    return (
        ch.join(corp, "source")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum("ctoks").cast("bigint").alias("n_chunk_tokens"),
            F.min("n_corpus_tokens").cast("bigint").alias("n_corpus_tokens"),
            F.expr(
                "CAST((SUM(ctoks) - MIN(n_corpus_tokens)) * 1000000 "
                "DIV SUM(ctoks) AS BIGINT)"
            ).alias("overlap_ppm"),
            F.countDistinct("chash").cast("bigint").alias("n_distinct_chunks"),
        )
        .orderBy("source")
    )
