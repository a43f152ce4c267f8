"""Text-processing primitives for the LLM-pipeline operators
(SURVEY.md §2.F): tokenization, shingling, content hashing — all
built-in JVM expressions (split/transform/md5/conv), no Python UDFs.

Hash convention: `md5_long(s)` = first 15 hex chars of md5(s) parsed
as int64 (60 bits). Chosen over xxhash64 because the DuckDB oracle can
compute the identical value (`('0x' || substr(md5(s),1,15))::BIGINT`),
making MinHash/SimHash pipelines oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (documents.text is single-spaced)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def md5_long(col: Column) -> Column:
    """60-bit integer content hash, reproducible in ANSI SQL."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


SQL_MD5_LONG = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def shingles(tokens_col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles via transform-with-index (no explode,
    no shuffle: the shingle set is built inside one projection).

    Spark SQL array indexing is 0-based; positions past len-k map to
    NULL and are filtered.
    """
    name = tokens_col if isinstance(tokens_col, str) else None
    if name is None:
        raise ValueError("pass a column name for shingles()")
    parts = ", ".join(f"{name}[i + {j}]" for j in range(k))
    return F.expr(
        f"array_distinct(filter(transform({name}, (x, i) -> "
        f"CASE WHEN i <= size({name}) - {k} THEN concat_ws(' ', {parts}) END), "
        f"s -> s IS NOT NULL))"
    )


def sql_shingles_cte(k: int = 3, source: str = "documents") -> str:
    """DuckDB mirror: positional self-join shingling (1-based subscripts).

    Yields CTEs `pos` and `sh(doc_id, s)` with distinct k-shingles.
    """
    joins = "\n".join(
        f"  JOIN pos t{j} ON t{j}.doc_id = t0.doc_id AND t{j}.i = t0.i + {j}"
        for j in range(1, k)
    )
    concat = " || ' ' || ".join(f"t{j}.w" for j in range(k))
    return f"""
    pos AS (
      SELECT doc_id,
             unnest(str_split(text, ' ')) AS w,
             generate_subscripts(str_split(text, ' '), 1) AS i
      FROM {source}
    ),
    sh AS (
      SELECT DISTINCT t0.doc_id, {concat} AS s
      FROM pos t0
{joins}
    )"""


def bigram_structs(tokens_col: str) -> "Column":
    """Adjacent-token bigrams as an array of (w1, w2) structs, built
    in-row (transform-with-index, no explode-join). Shared by the PMI
    and bigram-LM operators so "what is a bigram" has one definition.
    """
    t = tokens_col
    return F.expr(
        f"filter(transform({t}, (x, i) -> "
        f"CASE WHEN i < size({t}) - 1 THEN "
        f"struct(x AS w1, {t}[i + 1] AS w2) END), p -> p IS NOT NULL)"
    )
