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


# --------------------------------------------------------------------------
# F5: frame sampling + resize (video/image-shaped ops over binary payloads)
# --------------------------------------------------------------------------

_FRAME_BYTES = 4
_FRAME_STRIDE = 2  # keep every 2nd frame
_RESIZE_TARGET = 6  # nearest-neighbor downsample 16 payload bytes -> 6


def _frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Frame sampler: chunk the payload into fixed-size frames, keep
    every `_FRAME_STRIDE`-th. Real video frame-sampling swaps the
    chunking for a container demuxer; batching/explode shape is
    identical."""
    for pdf in batches:
        out_doc, out_idx, out_frame = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // _FRAME_BYTES
            for fi in range(0, n_frames, _FRAME_STRIDE):
                out_doc.append(doc_id)
                out_idx.append(fi)
                out_frame.append(
                    payload[fi * _FRAME_BYTES : (fi + 1) * _FRAME_BYTES]
                )
        yield pd.DataFrame(
            {"doc_id": out_doc, "frame_idx": out_idx, "frame": out_frame}
        )


@query(
    "q_multimodal_frame_sample",
    oracle=f"""
    SELECT d.doc_id, t.fi * {_FRAME_STRIDE} AS frame_idx,
           substr(md5(d.text), t.fi * {_FRAME_STRIDE * _FRAME_BYTES * 2} + 1,
                  {_FRAME_BYTES * 2}) AS frame_hex
    FROM documents d
    CROSS JOIN range({16 // _FRAME_BYTES // _FRAME_STRIDE}) t(fi)
    WHERE d.doc_id < 100
    ORDER BY doc_id, frame_idx
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas frame sampling over binary payloads: every 2nd
    4-byte frame of the 16-byte synthetic payload. The sampled frames
    are hex-projected so the DuckDB oracle (which slices the md5 hex
    directly) verifies the byte-level chunk arithmetic exactly."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    frames = with_payload.mapInPandas(
        _frame_sample_batches, "doc_id bigint, frame_idx int, frame binary"
    )
    return frames.select(
        "doc_id", "frame_idx", F.lower(F.hex("frame")).alias("frame_hex")
    ).orderBy("doc_id", "frame_idx")


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Nearest-neighbor 'resize' of the payload byte-vector to a fixed
    target length — the 1-D stand-in for image thumbnailing (swap the
    body for PIL's resize on a real cluster; schema and batching hold)."""
    for pdf in batches:
        resized = [
            bytes(
                payload[(i * len(payload)) // _RESIZE_TARGET]
                for i in range(_RESIZE_TARGET)
            )
            for payload in pdf["payload"]
        ]
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "resized": resized})


@query(
    "q_multimodal_resize",
    oracle=f"""
    SELECT d.doc_id,
           (SELECT string_agg(
                     substr(md5(d.text), (CAST((i * 16) // {_RESIZE_TARGET} AS INT)) * 2 + 1, 2),
                     '' ORDER BY i)
            FROM range({_RESIZE_TARGET}) t(i)) AS resized_hex
    FROM documents d
    WHERE d.doc_id < 100
    ORDER BY doc_id
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas nearest-neighbor resize of binary payloads to a
    fixed 6-byte thumbnail, oracle-checked byte-for-byte via hex."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    with_payload = d.select("doc_id", F.unhex(F.md5("text")).alias("payload"))
    resized = with_payload.mapInPandas(
        _resize_batches, "doc_id bigint, resized binary"
    )
    return resized.select(
        "doc_id", F.lower(F.hex("resized")).alias("resized_hex")
    ).orderBy("doc_id")
