"""Multimodal-column operators (SURVEY.md §2.F F5): treat media as
opaque `binary` payloads with typed metadata, decoded only inside
Arrow-batched Python stages.

The container has no image/audio libraries, so the decode path uses an
UNCOMPRESSED format it can parse for real: each document carries a
genuine PPM (P6) image — ASCII header + raw RGB bytes — synthesized
deterministically from the doc's md5 so a SQL oracle can recompute
every pixel. The decoder (`_decode_ppm_batches`) is a real pure-numpy
binary parser (header scan, dimension read, frombuffer/reshape, pixel
stats); swapping it for PIL/libvips JPEG decode changes only the
per-payload body, not the schema, batching, or partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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


# Decoded feature schema: dimensions from the PPM header + channel
# statistics from the raw pixel plane.
_DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, n_pixels int, sum_bytes bigint, "
    "mean_r double, mean_g double, mean_b double, mean_byte double"
)


def _decode_ppm(b: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a binary P6 PPM: magic, whitespace-separated width/height,
    maxval, then the raw RGB plane via numpy frombuffer/reshape."""
    if b[:3] != b"P6\n":
        raise ValueError("not a P6 PPM payload")
    dims_end = b.index(b"\n", 3)
    w, h = (int(tok) for tok in b[3:dims_end].split())
    maxval_end = b.index(b"\n", dims_end + 1)
    if int(b[dims_end + 1 : maxval_end]) != 255:
        raise ValueError("only 8-bit PPM supported")
    px = np.frombuffer(b, dtype=np.uint8, offset=maxval_end + 1)
    if px.size != w * h * 3:
        raise ValueError(f"pixel plane {px.size} != {w}x{h}x3")
    return w, h, px.reshape(h, w, 3)


def _decode_ppm_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Real decoder over Arrow batches: per-payload header parse +
    vectorized channel sums. Integer sums are exact; each mean is a
    single IEEE division, so DuckDB reproduces the doubles bit-for-bit.
    """
    for pdf in batches:
        rows = {k: [] for k in (
            "doc_id", "width", "height", "n_pixels", "sum_bytes",
            "mean_r", "mean_g", "mean_b", "mean_byte",
        )}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, px = _decode_ppm(bytes(payload))
            plane = px.astype(np.int64)
            n = w * h
            rows["doc_id"].append(doc_id)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_pixels"].append(n)
            rows["sum_bytes"].append(int(plane.sum()))
            rows["mean_r"].append(int(plane[:, :, 0].sum()) / n)
            rows["mean_g"].append(int(plane[:, :, 1].sum()) / n)
            rows["mean_b"].append(int(plane[:, :, 2].sum()) / n)
            rows["mean_byte"].append(int(plane.sum()) / (n * 3))
        out = pd.DataFrame(rows)
        out["width"] = out["width"].astype("int32")
        out["height"] = out["height"].astype("int32")
        out["n_pixels"] = out["n_pixels"].astype("int32")
        out["sum_bytes"] = out["sum_bytes"].astype("int64")
        yield out


# SQL fragments shared by the payload synthesis and the oracle: pixel
# byte i of doc d is hex pair i of md5(text)||md5(text||'x').
_PIXELS_SQL = "unhex(concat(md5(text), md5(concat(text, 'x'))))"
_N_BYTES_SQL = "(doc_id % 3 + 2) * (doc_id % 2 + 1) * 3"


@query(
    "q_multimodal_decode_features",
    oracle="""
    WITH px AS (
      SELECT d.doc_id,
             CAST(d.doc_id % 3 + 2 AS INT) AS width,
             CAST(d.doc_id % 2 + 1 AS INT) AS height,
             CAST(t.i AS INT) AS i,
             CAST(('0x' || substr(md5(d.text) || md5(d.text || 'x'),
                                  CAST(t.i AS INT) * 2 + 1, 2)) AS INT) AS byte
      FROM documents d
      CROSS JOIN range(24) t(i)
      WHERE t.i < (d.doc_id % 3 + 2) * (d.doc_id % 2 + 1) * 3
    )
    SELECT doc_id, width, height,
           CAST(width * height AS INT) AS n_pixels,
           CAST(SUM(byte) AS BIGINT) AS sum_bytes,
           SUM(CASE WHEN i % 3 = 0 THEN byte END) * 1.0
             / (width * height) AS mean_r,
           SUM(CASE WHEN i % 3 = 1 THEN byte END) * 1.0
             / (width * height) AS mean_g,
           SUM(CASE WHEN i % 3 = 2 THEN byte END) * 1.0
             / (width * height) AS mean_b,
           SUM(byte) * 1.0 / (width * height * 3) AS mean_byte
    FROM px
    GROUP BY doc_id, width, height
    ORDER BY doc_id
    """,
)
def q_multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas media decode: binary PPM payload → typed features,
    via a REAL pure-numpy decoder (header parse + frombuffer pixel
    plane — not a stub; see `_decode_ppm`).

    Arrow-batched partition-wise decode — the per-batch Python cost is
    amortized over thousands of rows, and partitions can be sized by
    payload bytes (repartition before decode) so executor memory holds
    one batch of decoded media at a time. At 100 TB the synthesized
    payload column is replaced by the lake's real binary column and
    `_decode_ppm` by a codec call; the plan shape is unchanged.

    Oracle: DuckDB recomputes every pixel byte from the same md5
    construction and aggregates the identical channel stats (integer
    sums exact, one IEEE division per mean).
    """
    d = load_table(spark, sf_dir, "documents")
    payload = F.expr(
        "cast(concat('P6\\n', cast(doc_id % 3 + 2 as string), ' ', "
        "cast(doc_id % 2 + 1 as string), '\\n255\\n') as binary)"
    )
    body = F.expr(f"substring({_PIXELS_SQL}, 1, {_N_BYTES_SQL})")
    with_payload = d.select(
        "doc_id", F.concat(payload, body).alias("payload")
    )
    return (
        with_payload.mapInPandas(_decode_ppm_batches, _DECODE_SCHEMA)
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


# --------------------------------------------------------------------------
# F5: audio-shaped op — PCM frame energy over a binary waveform payload
# --------------------------------------------------------------------------

_AUD_FRAME = 8  # samples per frame
_AUD_SALTS = ("", "a1", "a2", "a3")  # 4 md5 blocks -> 64 bytes -> 32 samples


def _audio_energy_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Waveform feature extractor: parse the payload as big-endian
    signed PCM16 (a REAL numpy frombuffer parse, like the PPM decoder)
    and roll per-frame energies. Real audio swaps this for a
    soundfile/ffmpeg decode; schema, batching, and partitioning are
    unchanged."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            s = np.frombuffer(payload, dtype=">i2").astype(np.int64)
            n_frames = len(s) // _AUD_FRAME
            e = (
                (s[: n_frames * _AUD_FRAME] ** 2)
                .reshape(n_frames, _AUD_FRAME)
                .sum(axis=1)
            )
            peak = int(np.argmax(e))  # first max -> lowest frame index
            rows.append(
                (
                    doc_id,
                    len(s),
                    n_frames,
                    peak,
                    int(e[peak]),
                    int(e.sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_samples",
                "n_frames",
                "peak_frame",
                "peak_energy",
                "total_energy",
            ],
        )


_AUD_SCHEMA = (
    "doc_id bigint, n_samples int, n_frames int, "
    "peak_frame int, peak_energy bigint, total_energy bigint"
)
_AUD_HEX_SQL = " || ".join(
    f"md5(d.text{'' if s == '' else f' || {s!r}'})" for s in _AUD_SALTS
)


@query(
    "q_multimodal_audio_energy",
    oracle=f"""
    WITH smp AS (
      SELECT d.doc_id, CAST(t.i AS INT) AS i,
             CAST(t.i AS INT) // {_AUD_FRAME} AS frame,
             CAST(('0x' || substr({_AUD_HEX_SQL},
                                  CAST(t.i AS INT) * 4 + 1, 4)) AS INT) AS v
      FROM documents d CROSS JOIN range({len(_AUD_SALTS) * 8}) t(i)
    ),
    sgn AS (
      SELECT doc_id, frame,
             CAST(v - CASE WHEN v >= 32768 THEN 65536 ELSE 0 END
                  AS BIGINT) AS s
      FROM smp
    ),
    fe AS (
      SELECT doc_id, frame, CAST(SUM(s * s) AS BIGINT) AS energy
      FROM sgn GROUP BY doc_id, frame
    ),
    pk AS (
      SELECT doc_id, frame AS peak_frame, energy AS peak_energy FROM (
        SELECT doc_id, frame, energy,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY energy DESC, frame) AS rn
        FROM fe
      ) WHERE rn = 1
    )
    SELECT f.doc_id,
           CAST({len(_AUD_SALTS) * 8} AS INT) AS n_samples,
           CAST({len(_AUD_SALTS) * 8 // _AUD_FRAME} AS INT) AS n_frames,
           CAST(p.peak_frame AS INT) AS peak_frame,
           p.peak_energy,
           CAST(SUM(f.energy) AS BIGINT) AS total_energy
    FROM fe f JOIN pk p ON p.doc_id = f.doc_id
    GROUP BY f.doc_id, p.peak_frame, p.peak_energy
    ORDER BY f.doc_id
    """,
)
def q_multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped F5 op: per-document PCM16 frame energies — sample
    count, frame count, the loudest frame (ties → earliest) and its
    energy, and total energy. The silence-trim / voice-activity gate
    of an audio curation pipeline, as one Arrow-batched mapInPandas
    pass over opaque binary payloads (synthesized here as 4 md5
    blocks = 32 big-endian int16 samples, so the oracle recomputes
    every sample; a real corpus swaps the synthesis for the lake's
    bytes and numpy's frombuffer for a codec).

    All energies are int64 sums of int16 squares — exact on both
    engines; no float appears anywhere."""
    d = load_table(spark, sf_dir, "documents")
    hexes = F.concat(
        *[
            F.md5(F.col("text") if s == "" else F.concat(F.col("text"), F.lit(s)))
            for s in _AUD_SALTS
        ]
    )
    with_payload = d.select("doc_id", F.unhex(hexes).alias("payload"))
    return (
        with_payload.mapInPandas(_audio_energy_batches, _AUD_SCHEMA)
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# F5: image average-hash (aHash) dedup report
# --------------------------------------------------------------------------

_AHASH_SCHEMA = "doc_id bigint, width int, height int, ahash bigint"


def _ahash_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Real aHash over Arrow batches: decode the P6 payload, collapse
    RGB to per-pixel luma (integer channel sum), set bit p when pixel
    p's luma is strictly above the image mean — compared integer-side
    as luma*n > total so no division ever happens (ties → 0 on every
    engine). Bits pack row-major, bit p = pixel p."""
    for pdf in batches:
        out = {"doc_id": [], "width": [], "height": [], "ahash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            w, h, px = _decode_ppm(bytes(payload))
            luma = px.astype(np.int64).sum(axis=2).reshape(-1)
            n = luma.size
            tot = int(luma.sum())
            bits = (luma * n) > tot
            ahash = int((bits.astype(np.int64) << np.arange(n)).sum())
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["ahash"].append(ahash)
        pdf_out = pd.DataFrame(out)
        pdf_out["width"] = pdf_out["width"].astype("int32")
        pdf_out["height"] = pdf_out["height"].astype("int32")
        pdf_out["ahash"] = pdf_out["ahash"].astype("int64")
        yield pdf_out


@query(
    "q_image_ahash_dedup",
    oracle=f"""
    WITH px AS (
      SELECT d.doc_id,
             CAST(d.doc_id % 3 + 2 AS INT) AS width,
             CAST(d.doc_id % 2 + 1 AS INT) AS height,
             CAST(t.i AS INT) AS i,
             CAST(('0x' || substr(md5(d.text) || md5(d.text || 'x'),
                                  CAST(t.i AS INT) * 2 + 1, 2)) AS INT) AS byte
      FROM documents d
      CROSS JOIN range(24) t(i)
      WHERE t.i < {_N_BYTES_SQL}
    ),
    lum AS (
      SELECT doc_id, width, height, i // 3 AS p,
             CAST(SUM(byte) AS BIGINT) AS l
      FROM px GROUP BY doc_id, width, height, i // 3
    ),
    tot AS (
      SELECT doc_id, CAST(SUM(l) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lum GROUP BY doc_id
    ),
    hsh AS (
      SELECT l.doc_id, l.width, l.height,
             CAST(SUM(CASE WHEN l.l * o.n > o.t
                           THEN CAST(1 AS BIGINT) << CAST(l.p AS INT)
                           ELSE 0 END) AS BIGINT) AS ahash
      FROM lum l JOIN tot o ON o.doc_id = l.doc_id
      GROUP BY l.doc_id, l.width, l.height
    )
    SELECT width, height, ahash,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_doc
    FROM hsh
    GROUP BY width, height, ahash
    HAVING COUNT(*) >= 2
    ORDER BY width, height, ahash
    """,
)
def q_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE dedup by perceptual average-hash: decode every payload
    with the real PPM parser, compute the aHash (bit per pixel:
    luma strictly above the image mean, integer-compared — no
    division), and report duplicate fingerprint groups keyed by
    (width, height, ahash) with their canonical (lowest) doc_id.

    This is the linear exact-dedup-by-fingerprint shape — ONE
    groupBy on the hash, never a pair join (the md5-derived pixels
    make same-hash groups the candidate dup sets; a production corpus
    runs the same plan with a 64-bit aHash over 8×8 downsampled
    grays, where fingerprint collisions are vanishingly rare and a
    within-group byte-compare refines). At 100 TB: decode is
    Arrow-batched mapInPandas sized by payload bytes; the report is
    one uniform shuffle on the fingerprint.

    Oracle: DuckDB recomputes every pixel byte from the md5
    synthesis, folds the identical integer luma/threshold/bit-pack,
    and aggregates the same groups — all int64, no floats anywhere."""
    d = load_table(spark, sf_dir, "documents")
    header = F.expr(
        "cast(concat('P6\\n', cast(doc_id % 3 + 2 as string), ' ', "
        "cast(doc_id % 2 + 1 as string), '\\n255\\n') as binary)"
    )
    body = F.expr(f"substring({_PIXELS_SQL}, 1, {_N_BYTES_SQL})")
    with_payload = d.select("doc_id", F.concat(header, body).alias("payload"))
    return (
        with_payload.mapInPandas(_ahash_batches, _AHASH_SCHEMA)
        .groupBy("width", "height", "ahash")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.min("doc_id").cast("bigint").alias("canonical_doc"),
        )
        .where(F.col("n_images") >= 2)
        .orderBy("width", "height", "ahash")
    )


# --------------------------------------------------------------------------
# F5: video-shaped op — scene-cut (shot boundary) detection over frames
# --------------------------------------------------------------------------

_SC_FRAMES = 8  # frames per synthetic clip
_SC_FB = 4  # bytes per frame
_SC_T = 2  # Hamming cut threshold on the per-frame mean-hash


def _scene_cut_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Per clip: frame-wise mean hash (bit j set iff byte j is above
    the frame mean — the 1-D aHash), Hamming distance between
    consecutive frames, cut where distance >= _SC_T. Pure numpy over
    the Arrow batch — the real-decoder swap point (PyAV frame
    iterator + true 8x8 aHash) keeps this exact dataflow."""
    for pdf in batches:
        n_cuts = []
        for payload in pdf["payload"]:
            frames = np.frombuffer(payload, dtype=np.uint8).reshape(
                _SC_FRAMES, _SC_FB
            ).astype(np.int64)
            bits = (_SC_FB * frames) > frames.sum(axis=1, keepdims=True)
            ham = (bits[1:] != bits[:-1]).sum(axis=1)
            n_cuts.append(int((ham >= _SC_T).sum()))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_frames": _SC_FRAMES,
                "n_cuts": n_cuts,
            }
        )


@query(
    "q_multimodal_scene_cuts",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, md5(text) || md5(text || 'x') AS hex
      FROM documents WHERE doc_id < 100
    ),
    fb AS (
      SELECT doc_id, f.f, j.j,
             CAST(('0x' || substr(hex, (f.f * {_SC_FB} + j.j) * 2 + 1, 2))
                  AS INT) AS b
      FROM p
      CROSS JOIN range({_SC_FRAMES}) f(f)
      CROSS JOIN range({_SC_FB}) j(j)
    ),
    fsum AS (
      SELECT doc_id, f, SUM(b) AS s FROM fb GROUP BY doc_id, f
    ),
    bits AS (
      SELECT fb.doc_id, fb.f, fb.j,
             CASE WHEN {_SC_FB} * fb.b > fs.s THEN 1 ELSE 0 END AS bit
      FROM fb JOIN fsum fs ON fs.doc_id = fb.doc_id AND fs.f = fb.f
    ),
    ham AS (
      SELECT a.doc_id, a.f,
             SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS h
      FROM bits a
      JOIN bits b ON b.doc_id = a.doc_id AND b.f = a.f + 1 AND b.j = a.j
      GROUP BY a.doc_id, a.f
    )
    SELECT p.doc_id,
           CAST({_SC_FRAMES} AS INT) AS n_frames,
           CAST(COALESCE(SUM(CASE WHEN ham.h >= {_SC_T} THEN 1 ELSE 0 END),
                         0) AS BIGINT) AS n_cuts
    FROM p LEFT JOIN ham ON ham.doc_id = p.doc_id
    GROUP BY p.doc_id
    ORDER BY p.doc_id
    """,
)
def q_multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over synthetic {F}-frame clips: the
    video-curation primitive that decides where a clip gets split
    before frame-dedup/captioning. Per frame a mean-threshold hash
    (the 1-D aHash — bit j iff byte j above the frame mean), a cut
    wherever consecutive frames' hashes differ by >= {T} bits. The
    decode body is the documented deterministic fake (md5-derived
    32-byte payload — this container has no codec libs); the Spark
    plumbing is real and exact: binary payload column, Arrow-batched
    mapInPandas with a numpy kernel, byte-level arithmetic the hex
    oracle re-derives relationally (frame/byte unnest → per-frame
    sums → bit compare → consecutive-frame Hamming join).

    Scale shape: map-only until the final presentation sort — each
    clip's cut census is computed inside its Arrow batch, so the
    operator scales with input splits like every decode op here."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    with_payload = d.select(
        "doc_id",
        F.unhex(F.concat(F.md5("text"), F.md5(F.concat("text", F.lit("x"))))).alias(
            "payload"
        ),
    )
    cuts = with_payload.mapInPandas(
        _scene_cut_batches, "doc_id bigint, n_frames int, n_cuts bigint"
    )
    return cuts.orderBy("doc_id")
