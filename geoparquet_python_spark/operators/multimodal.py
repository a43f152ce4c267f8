"""Multimodal-column operators (SURVEY.md §2.F F5): treat media as
opaque `binary` payloads with typed metadata, decoded only inside
Arrow-batched Python stages.

The container has no image/audio libraries, so the *decode* step is a
deterministic fake (documented stub — same batch shape, schema and
partitioning as a real decoder); everything around it (schema
assembly, join, mapInPandas plumbing, partition sizing) is real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query


@query(
    "q_multimodal_assembly",
    oracle="""
    SELECT d.doc_id,
           d.lang,
           d.n_chars,
           e.label,
           octet_length(unhex(md5(d.text))) AS payload_len,
           substr(md5(d.text), 1, 8) AS payload_head_hex,
           len(e.embedding) AS embedding_dim
    FROM documents d
    JOIN embeddings e ON e.vec_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def q_multimodal_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble a multimodal record: text metadata ⋈ embedding + a
    binary payload column (synthesized here as unhex(md5(text)) — in
    production the bytes come off the lake as-is).

    The payload stays opaque `binary` end to end; only its length and
    head are projected — the 100 TB rule: never decode media you
    don't need (column pruning keeps payload bytes out of the scan
    when untouched).
    """
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    payload = F.unhex(F.md5("text"))
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "label",
            F.length(payload).alias("payload_len"),
            F.substring(F.md5("text"), 1, 8).alias("payload_head_hex"),
            F.size("embedding").alias("embedding_dim"),
        )
        .orderBy("doc_id")
    )


# Schema of the fake-decoded feature batch: mirrors what an image
# decoder would emit (dimensions + a small feature vector).
_DECODE_SCHEMA = (
    "doc_id bigint, payload_len int, width int, height int, mean_byte double"
)


def _fake_decode_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """STUB decoder (no image libs in this container).

    Deterministic fake: 'dimensions' and 'mean pixel' derived from the
    payload bytes themselves. A real implementation would replace the
    body with PIL/libvips calls — the signature, Arrow batching, and
    output schema are exactly what production uses.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_len": payloads.map(len).astype("int32"),
                "width": payloads.map(lambda b: b[0] % 64 + 1).astype("int32"),
                "height": payloads.map(lambda b: b[1] % 64 + 1).astype("int32"),
                "mean_byte": payloads.map(lambda b: sum(b) / len(b)),
            }
        )


@query("q_multimodal_decode_features")
def q_multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas media decode: binary payload → typed features.

    Arrow-batched partition-wise decode — the per-batch Python cost is
    amortized over thousands of rows, and partitions can be sized by
    payload bytes (repartition before decode) so executor memory holds
    one batch of decoded media at a time.

    rows-only check: the decode itself is the non-SQL-expressible part
    (tests/test_llm_ops.py pins exact expected values for a sample).
    """
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    return (
        with_payload.mapInPandas(_fake_decode_batches, _DECODE_SCHEMA)
        .orderBy("doc_id")
    )
