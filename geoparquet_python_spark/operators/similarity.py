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

from geoparquet_python_spark.functions.exact import (
    broadcast_bounded,
    broadcast_narrow,
    materialize,
    spread,
)
from geoparquet_python_spark.functions.vector import (
    SQL_FLAT_EMBEDDINGS,
    SQL_NORMS,
    cosine_from_scaled,
    dot_scaled,
    dot_scaled_arrow,
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
    # Bounded-by-contract: the query set is vec_id < 10 — wide payload
    # (embeddings) is allowed through the runtime-asserted helper only.
    pairs = broadcast_bounded(q, max_rows=64).join(c, F.col("qid") != F.col("cid"))
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


# --------------------------------------------------------------------------
# F3b: random-hyperplane LSH near-dup (the un-labeled scale path)
# --------------------------------------------------------------------------

import hashlib

# 96 planes in 12 bands × 8 bits (round-1 had 16 planes / 2 bands —
# too few bands for recall AND too few distinct buckets). Collision
# p_bit = 1 − θ/π: unrelated vectors (θ≈π/2) collide on an 8-bit band
# at 2^-8, so noise candidates ≈ 12·n²/2⁹ ≈ n²/43 — a 6× cut vs
# round 1 per band-pair, while recall at the corpus's weak-pair regime
# (cosine≈0.5 ⇒ p_bit≈⅔) is 1−(1−(⅔)⁸)¹² ≈ 0.39 vs 0.076 before.
# Band WIDTH is the scale knob: it should track log₂(n) (w=16 at
# billion-vector scale collapses noise collisions to ~0); band COUNT
# buys recall linearly. Both engines mirror the banding exactly, so
# the oracle stays bit-for-bit at any setting.
_N_PLANES = 96
_BAND_BITS = 8
_COMPONENT_SCALE = 1e6
_COSINE_T = 0.45

# Round-11 fingerprint prefilter (VERDICT r10 item 2). Widening the BANDS
# was measured and rejected: at this corpus's tau=0.45 pair regime
# (p_bit ~ 0.65) an 8x12-bit banding drops recall 0.346 -> 0.054, and
# equal-recall wider bands need ~900 planes (noise ~ 0.42*n^2*0.864^w —
# the per-band selectivity gain barely beats the recall loss). What IS
# cheap is a WIDER FINGERPRINT for a post-banding hamming screen: 256
# md5-parity sign bits per vector (the first 96 are the banding planes),
# packed into 4 int64 words that replace the embedding as the bucket
# payload. Measured on the 8x weak-scaling corpus (16k vectors): the
# 12x8-bit banding emits 7.0M unique candidates at recall 0.346;
# hamming <= 102 of 256 keeps 714k (10x cut) at recall 0.340. The screen
# is mirrored bit-for-bit in the oracle (any packing works — hamming is
# packing-invariant), so the pair set stays oracle-exact.
_FP_PLANES = 256
_FP_WORDS = 4
_FP_HAMMING_MAX = 102


def _plane_components(n_planes: int = _N_PLANES) -> list[list[int]]:
    """±1 hyperplane components c[p][i] from md5 parity of "p_i" —
    reproducible in SQL (md5 is md5 everywhere), i is 1-based to align
    with DuckDB generate_subscripts."""
    return [
        [
            1
            if int(hashlib.md5(f"{p}_{i}".encode()).hexdigest()[:15], 16) & 1
            else -1
            for i in range(1, 65)
        ]
        for p in range(n_planes)
    ]


_BUCKET_CAP = 1024  # max payload structs per aggregation row


def _capped_bucket_pairs(
    narrow: DataFrame,
    payload: DataFrame,
    key_cols: list[str],
    cap: int = _BUCKET_CAP,
) -> DataFrame:
    """All in-bucket (vec_a < vec_b) pairs with payload attached.
    ``narrow``: (vec_id, *key_cols) membership rows; ``payload``:
    (vec_id, m) where m is a struct with leading unique vec_id plus
    embedding/n2. Output: key_cols + exploded pair struct ``p`` — with
    a HARD per-aggregation-row occupancy cap.

    The plain form (groupBy(bucket).collect_list(m)) concentrates a hot
    bucket's ENTIRE embedding payload into one aggregation row/task —
    reachable here because 8-bit bands saturate at ~2^8 values, putting
    ~n/256 vectors in one bucket (round-6 ADVICE: an executor OOM the
    round-6 broadcast-removal rewrite traded away rather than
    eliminated). Fix: a NARROW bucket-size count assigns each
    membership row a sub-bucket id g — 0 for at-or-under-cap buckets
    (virtually all of them), rank-windowed ``cap``-sized slices for
    oversized ones (the window runs on payload-free rows; its sort is
    spillable external sort — streaming, unlike an agg buffer row
    which cannot spill mid-row). The payload then joins ONCE and
    buckets collect on (key, g): every aggregation row holds <= cap
    members. Pairs = within-group expansions plus cross-group
    (g1 < g2) list×list expansions over the __bn > cap groups only —
    an empty frame in the common case, whose __bn filter prunes its
    lineage to near-nothing (a first cut that rank-windowed the
    payload frame itself cost the hyperplane query ~1.7 s at sf0.1).
    Sub-bucket ids follow vec_id rank order, so every cross pair
    already satisfies vec_a < vec_b — no normalization. The emitted
    pair set is bit-identical to the uncapped form (the split is a
    disjoint partition of each bucket); what changes is worst-case
    row memory, O(hot bucket) → O(cap).

    FAST PATH (round-8, VERDICT r7 item 1): one payload-free size
    aggregate runs FIRST and collects two scalars (max occupancy,
    key count). When no bucket exceeds the cap — the common case by
    the callers' own contracts (band width / K-scaling keep typical
    occupancy << cap) — the whole sub-bucket apparatus (size join,
    rank window, localCheckpoint barrier, two cross branches) is
    skipped and the plain (key)-grouped collect runs directly, safe
    because the precheck just PROVED every aggregation row ≤ cap.
    The precheck is a linear spillable aggregate over id+key rows —
    strictly cheaper than the window sort + checkpoint it replaces
    (the r7 bench's one flagged regression, ~1.4 s constant at
    sf0.1). The guard stays armed: any oversized bucket flips the
    run onto the sub-bucketed path unchanged.

    CONTRACT (ADVICE r8): the precheck is an EAGER collect at
    plan-BUILD time — constructing a query through this helper
    executes the narrow size aggregate once, and the fast/guarded
    branch choice is frozen from the data observed then. The returned
    plan is therefore valid only for that snapshot: build-then-run-
    once callers (every registered query; bench re-CONSTRUCTS per
    run) are exactly right, but a caller composing this into a
    long-lived pipeline over changing data must rebuild the plan per
    run, or an under-cap decision could meet over-cap data.
    """
    sizes = narrow.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__bn"))
    # Two scalars, one job: the max drives the fast/guarded branch,
    # the key count drives the sizes-join strategy below.
    stats = sizes.agg(
        F.max("__bn").alias("mx"), F.count(F.lit(1)).alias("nk")
    ).collect()[0]
    max_occupancy = int(stats["mx"] or 0)
    n_keys = int(stats["nk"] or 0)
    # Pair struct derived from the payload struct's own fields (round
    # 11): leading vec_id becomes vec_a/vec_b, every other field f is
    # emitted as a_<f>/b_<f> ("embedding" keeps its historical "emb"
    # alias). Lets callers choose what rides the bucket shuffle — the
    # hyperplane query now carries a 4-word fingerprint instead of the
    # full embedding; SemDeDup keeps (embedding, n2).
    m_fields = [
        f.name for f in payload.schema["m"].dataType.fields  # type: ignore[union-attr]
    ]
    assert m_fields[0] == "vec_id", "payload struct must lead with vec_id"
    _alias = {"embedding": "emb"}
    parts = ["a.vec_id AS vec_a", "b.vec_id AS vec_b"]
    for fname in m_fields[1:]:
        al = _alias.get(fname, fname)
        parts.append(f"a.{fname} AS a_{al}")
        parts.append(f"b.{fname} AS b_{al}")
    pair_struct = "struct(" + ", ".join(parts) + ")"
    within_expr = (
        "flatten(transform(ms, (a, i) -> "
        f"transform(slice(ms, i + 2, size(ms)), b -> {pair_struct})))"
    )
    if max_occupancy <= cap:
        groups = (
            narrow.join(payload, "vec_id")
            .groupBy(*key_cols)
            .agg(F.array_sort(F.collect_list("m")).alias("ms"))
        )
        return groups.where(F.size("ms") > 1).select(
            *key_cols, F.explode(F.expr(within_expr)).alias("p")
        )
    # sizes join strategy: the hyperplane caller's key domain is
    # constructively bounded (bands × 2^band_bits) but SemDeDup's K
    # now SCALES with the corpus (K = n / cell_target, r7), so the
    # broadcast is guarded by the MEASURED key count, not a domain
    # argument — past the bound, a shuffle join carries the sizes
    # (ADVICE r7: the bounded-driver-literal contract must not be
    # asserted for a corpus-proportional relation).
    sized = (
        broadcast_narrow(sizes) if n_keys <= 1_000_000 else sizes
    )
    wsub = Window.partitionBy(*key_cols).orderBy("vec_id")
    # materialize: sub feeds the within path AND both cross-branch
    # sides; without the barrier each one re-runs the size join +
    # window sort (the __bn filter cannot push below a window, so the
    # "empty" cross branches still paid the full narrow lineage —
    # measured 2× extra at the 8× weak-scaling leg).
    sub = materialize(
        narrow.join(sized, key_cols).withColumn(
            "g",
            F.when(F.col("__bn") <= cap, F.lit(0).cast("long")).otherwise(
                ((F.row_number().over(wsub) - F.lit(1)) / F.lit(cap)).cast(
                    "long"
                )
            ),
        )
    )
    keyed = sub.join(payload, "vec_id")
    groups = keyed.groupBy(*key_cols, "g", "__bn").agg(
        F.array_sort(F.collect_list("m")).alias("ms")
    )
    within = (
        groups.where(F.size("ms") > 1)
        .select(
            *key_cols,
            F.explode(F.expr(within_expr)).alias("p"),
        )
    )
    # Hot groups are re-derived from keyed.where(__bn > cap), NOT from
    # groups.where(...): the latter filters ABOVE the payload collect,
    # so the two cross-branch lineages would re-run the full corpus
    # groupBy just to throw it away (measured: the 8× weak-scaling leg
    # tripled, 6.8 s → 27 s). Filtering keyed pushes to the join input
    # — the cross branches collect only the oversized sliver.
    hot = keyed.where(F.col("__bn") > cap).groupBy(*key_cols, "g").agg(
        F.array_sort(F.collect_list("m")).alias("ms")
    )
    ga = hot.select(
        *key_cols, F.col("g").alias("g1"), F.col("ms").alias("ms1")
    )
    gb = hot.select(
        *[F.col(k).alias(f"__{k}2") for k in key_cols],
        F.col("g").alias("g2"),
        F.col("ms").alias("ms2"),
    )
    cond = F.col("g1") < F.col("g2")
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"__{k}2"))
    cross = ga.join(gb, cond).select(
        *key_cols,
        F.explode(
            F.expr(
                "flatten(transform(ms1, a -> "
                f"transform(ms2, b -> {pair_struct})))"
            )
        ).alias("p"),
    )
    return within.unionByName(cross)


# Signature CTE chain through `bands` — shared by the candidate
# pipeline below and the band-occupancy audit (round 12).
_SQL_HYPERPLANE_BANDS = f"""
    planes AS (
      SELECT p, i,
             CASE WHEN (CAST(('0x' || substr(md5(CAST(p AS VARCHAR) || '_' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) & 1) = 1
                  THEN 1 ELSE -1 END AS c
      FROM range({_FP_PLANES}) t(p) CROSS JOIN range(1, 65) u(i)
    ),
    qint AS (
      SELECT vec_id, i, CAST(floor(x * {_COMPONENT_SCALE}) AS BIGINT) AS xi
      FROM flat
    ),
    bits AS (
      SELECT q.vec_id, pl.p,
             CASE WHEN SUM(q.xi * pl.c) >= 0 THEN 1 ELSE 0 END AS bit
      FROM qint q JOIN planes pl ON pl.i = q.i
      GROUP BY 1, 2
    ),
    bands AS (
      SELECT vec_id, p // {_BAND_BITS} AS band,
             SUM(bit * CAST(power(2, p % {_BAND_BITS}) AS BIGINT)) AS bval
      FROM bits WHERE p < {_N_PLANES} GROUP BY 1, 2
    )"""

_SQL_HYPERPLANE_CAND = f"""{_SQL_HYPERPLANE_BANDS},
    fpw AS (
      SELECT vec_id, p // 32 AS w,
             SUM(bit * CAST(power(2, p % 32) AS BIGINT)) AS wv
      FROM bits GROUP BY 1, 2
    ),
    cand0 AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.bval = b.bval
                  AND a.vec_id < b.vec_id
    ),
    cand AS (
      SELECT c.vec_a, c.vec_b
      FROM cand0 c
      JOIN fpw fa ON fa.vec_id = c.vec_a
      JOIN fpw fb ON fb.vec_id = c.vec_b AND fb.w = fa.w
      GROUP BY 1, 2
      HAVING SUM(CAST(bit_count(xor(fa.wv, fb.wv)) AS INT)) <= {_FP_HAMMING_MAX}
    )"""


def _hyperplane_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, fp0..fp3, bv0..bv11) — one Arrow/numpy pass.

    All 256 sign bits per vector come from ONE BLAS matmul of the
    fixed-point components against the md5-parity plane matrix. The
    arithmetic is bit-identical to the SQL mirror: xi = floor(x·1e6)
    are exact integers in float64, every product |xi·c| ≤ ~1e8 and
    every 64-term sum ≤ ~1e10 stay far under 2^53, so the float64
    matmul computes the same integer sign sums as DuckDB's int64
    aggregate. (History: round 6-8 built the 96 bits as a
    constant-folded SQL array literal to dodge the py4j literal tax —
    still interpreted HOF math per vector; the numpy pass makes a
    256-plane fingerprint as cheap as 96 were, with the plane matrix a
    plain Python closure, no py4j at all.)

    Fingerprint packing (fp0..fp3, 64 bits/word) only needs to be
    consistent WITHIN Spark — hamming distance is packing-invariant,
    so the oracle's 32-bit-word packing mirrors it exactly. Band
    values bv0..bv11 pack the first 96 bits as 12 8-bit ints, same as
    the SQL bands CTE.
    """
    import numpy as np
    import pyarrow as pa

    plane_mat = np.array(_plane_components(_FP_PLANES), dtype=np.float64)
    n_bands = _N_PLANES // _BAND_BITS

    def _sig(batches):
        band_w = 1 << np.arange(_BAND_BITS, dtype=np.int64)
        word_w = np.arange(64, dtype=np.uint64)
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            vec_id = rb.column(rb.schema.get_field_index("vec_id")).to_numpy()
            arr = rb.column(rb.schema.get_field_index("embedding"))
            offs = arr.offsets.to_numpy()
            vals = arr.values.to_numpy(zero_copy_only=False)
            if (np.diff(offs) == 64).all():
                X = vals[offs[0]:offs[-1]].astype(np.float64).reshape(n, 64)
            else:  # ragged guard — contract says fixed 64 dims
                X = np.stack(
                    [vals[offs[i]:offs[i + 1]].astype(np.float64) for i in range(n)]
                )
            xi = np.floor(X * _COMPONENT_SCALE)
            bits = (xi @ plane_mat.T) >= 0  # n x 256, exact integer signs
            out = {"vec_id": vec_id.astype(np.int64)}
            for k in range(_FP_WORDS):
                w = (
                    bits[:, 64 * k:64 * (k + 1)].astype(np.uint64) << word_w
                ).sum(axis=1)
                out[f"fp{k}"] = np.ascontiguousarray(w).view(np.int64)
            for j in range(n_bands):
                out[f"bv{j}"] = (
                    bits[:, _BAND_BITS * j:_BAND_BITS * (j + 1)].astype(np.int64)
                    @ band_w
                )
            yield pa.RecordBatch.from_pydict(out)

    e = load_table(spark, sf_dir, "embeddings")
    schema = "vec_id bigint, " + ", ".join(
        [f"fp{k} bigint" for k in range(_FP_WORDS)]
        + [f"bv{j} bigint" for j in range(n_bands)]
    )
    # No spread(): the per-vector work is one row of a BLAS matmul —
    # never compute-bound — and repartitioning a small input to 32
    # partitions costs 32 Python-worker spin-ups per run (measured ~2 s
    # of the 1x wall). At scale, input splits parallelize the pass.
    return e.select("vec_id", "embedding").mapInArrow(_sig, schema)



@query(
    "q_hyperplane_lsh_neardup",
    oracle=f"""
    WITH flat AS ({SQL_FLAT_EMBEDDINGS}),
    {_SQL_HYPERPLANE_CAND},
    norms AS ({SQL_NORMS}),
    dots AS (
      SELECT c.vec_a, c.vec_b,
             CAST(SUM(CAST(floor(fa.x * fb.x * 1e12) AS BIGINT)) AS BIGINT) AS d
      FROM cand c
      JOIN flat fa ON fa.vec_id = c.vec_a
      JOIN flat fb ON fb.vec_id = c.vec_b AND fb.i = fa.i
      GROUP BY 1, 2
    )
    SELECT vec_a, vec_b,
           (d / 1e12) / (sqrt(na.n2 / 1e12) * sqrt(nb.n2 / 1e12)) AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = vec_a
    JOIN norms nb ON nb.vec_id = vec_b
    WHERE (d / 1e12) / (sqrt(na.n2 / 1e12) * sqrt(nb.n2 / 1e12)) >= {_COSINE_T}
    ORDER BY vec_a, vec_b
    """,
)
def q_hyperplane_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) LSH near-duplicates:
    96 sign bits per vector from deterministic ±1 hyperplanes, grouped
    into 12 8-bit bands; candidates agree on a whole band (equi-join on
    (band, value) — never a cross join); a 256-bit fingerprint hamming
    screen (≤ {_FP_HAMMING_MAX} of {_FP_PLANES} sign bits — round 11,
    see the constants' measured rationale) drops ~90% of band-collision
    noise before the exact fixed-point cosine ≥ 0.45 refine. Banding
    AND screen are mirrored bit-for-bit in the oracle (integer sign
    sums, md5-derived planes, packing-invariant hamming), so the
    probabilistic pipeline is still exactly checked.

    Scale shape (round-11 rewrite): the bucket shuffle carries ONLY
    vec_id + 4 packed fingerprint words (40 B — the round-6 form
    shipped the full embedding, and the pair stream then pushed both
    embeddings per candidate through Arrow: ~7 GB at the 8x leg).
    Because the rows are this narrow, candidates come from a plain
    self-EQUI-join on (band, bval) — whole-stage-codegen, streaming,
    no aggregation buffer anywhere (the round-6/7 collect_list bucket
    apparatus and its occupancy cap existed to keep hot buckets'
    EMBEDDING payload out of single agg rows; a 40 B row join buffers
    one bucket's key group at ~40 B/member and AQE skew-split balances
    oversized partitions). The hamming screen is codegen xor/bit_count
    on scalars; only the ~10% survivors are distinct-ed and joined
    back to the corpus for the exact refine — pair-stream-sized joins
    with no broadcast hints (AQE may pick broadcast at test scale by
    MEASURED size; at 100 TB both sides shuffle, linear in
    survivors). Band width sets candidate volume (it should track
    log2(n) — SCALE.md), band count sets recall, fingerprint width
    sharpens the screen at fixed banding recall; each knob is
    mirrored in the oracle so any parameter change stays exactly
    checked.
    """
    sig = materialize(_hyperplane_signatures(spark, sf_dir))
    band_structs = ", ".join(
        f"struct({j}L AS band, bv{j} AS bval)"
        for j in range(_N_PLANES // _BAND_BITS)
    )
    fps = [f"fp{k}" for k in range(_FP_WORDS)]
    banded = sig.select(
        "vec_id", *fps, F.expr(f"explode(array({band_structs}))").alias("bb")
    ).select(
        "vec_id", *fps,
        F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"),
    )
    # Fresh column names per side: two scans of one frame share expr
    # ids, so the self-join renames through SELECTs before joining.
    la = banded.select(
        F.col("vec_id").alias("vec_a"),
        F.col("band").alias("band_a"),
        F.col("bval").alias("bval_a"),
        *[F.col(f).alias(f"a_{f}") for f in fps],
    )
    lb = banded.select(
        F.col("vec_id").alias("vec_b"),
        F.col("band").alias("band_b"),
        F.col("bval").alias("bval_b"),
        *[F.col(f).alias(f"b_{f}") for f in fps],
    )
    ham = sum(
        F.expr(f"bit_count(a_fp{k} ^ b_fp{k})") for k in range(_FP_WORDS)
    )
    cand = (
        la.join(
            lb,
            (F.col("band_a") == F.col("band_b"))
            & (F.col("bval_a") == F.col("bval_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .where(ham <= F.lit(_FP_HAMMING_MAX))
        .select("vec_a", "vec_b")
        .distinct()
    )
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
        dot_scaled_arrow("a_emb", "b_emb"), F.col("a_n2"), F.col("b_n2")
    )
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= _COSINE_T)
        .orderBy("vec_a", "vec_b")
    )


# --------------------------------------------------------------------------
# F3d: int8 embedding quantization (storage-scale path) with error audit
# --------------------------------------------------------------------------


@query(
    "q_embedding_quantize_int8",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
             CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx,
             embedding
      FROM embeddings
    ),
    lv AS (
      SELECT vec_id, mn, mx, embedding,
             CASE WHEN mx = mn
                  THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                  ELSE list_transform(embedding, x ->
                    CAST(floor(((CAST(x AS DOUBLE) - mn) * 255.0) / (mx - mn))
                         AS BIGINT)) END AS qv
      FROM q
    )
    SELECT vec_id, mn, mx,
           CAST(len(list_distinct(qv)) AS BIGINT) AS n_levels,
           CASE WHEN mx = mn THEN 0.0 ELSE
             list_aggregate(
               list_transform(list_zip(embedding, qv), s ->
                 abs(CAST(s[1] AS DOUBLE)
                     - (((s[2] * (mx - mn)) / 255.0) + mn))),
               'max')
           END AS max_abs_err
    FROM lv
    ORDER BY vec_id
    """,
)
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max int8 quantization of every embedding (the 4x storage /
    bandwidth cut an ANN index takes at 100 TB), plus the per-vector
    audit a pipeline needs before committing to it: quantization level
    count and max absolute reconstruction error.

    Everything is a per-row projection over the vector — transform /
    zip_with / array_max inside one stage, no shuffle except the
    terminal presentation sort. The quantize and dequantize arithmetic
    is IEEE double with an identical operation tree on the oracle side,
    so even max_abs_err compares bit-for-bit.
    """
    e = load_table(spark, sf_dir, "embeddings")
    mn = F.array_min("embedding").cast("double")
    mx = F.array_max("embedding").cast("double")
    base = e.select("vec_id", "embedding", mn.alias("mn"), mx.alias("mx"))
    flat_q = F.when(
        F.col("mx") == F.col("mn"),
        F.transform("embedding", lambda x: F.lit(0).cast("bigint")),
    ).otherwise(
        F.transform(
            "embedding",
            lambda x: F.floor(
                ((x.cast("double") - F.col("mn")) * F.lit(255.0))
                / (F.col("mx") - F.col("mn"))
            ),
        )
    )
    withq = base.select("vec_id", "embedding", "mn", "mx", flat_q.alias("qv"))
    err = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        F.array_max(
            F.zip_with(
                "embedding",
                "qv",
                lambda x, q: F.abs(
                    x.cast("double")
                    - (
                        ((q * (F.col("mx") - F.col("mn"))) / F.lit(255.0))
                        + F.col("mn")
                    )
                ),
            )
        )
    )
    return withq.select(
        "vec_id",
        "mn",
        "mx",
        F.size(F.array_distinct("qv")).cast("bigint").alias("n_levels"),
        err.alias("max_abs_err"),
    ).orderBy("vec_id")


@query(
    "q_embedding_label_stats",
    oracle="""
    WITH xf AS (
      SELECT label,
             unnest(list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS v,
             generate_subscripts(embedding, 1) - 1 AS d
      FROM embeddings
    )
    SELECT label, CAST(d AS BIGINT) AS d,
           COUNT(*) AS n_vecs,
           CAST(CAST(SUM(v) AS BIGINT) // COUNT(*) AS BIGINT) AS mean_fp,
           CAST(MIN(v) AS BIGINT) AS min_fp,
           CAST(MAX(v) AS BIGINT) AS max_fp
    FROM xf
    GROUP BY label, d
    ORDER BY label, d
    """,
)
def q_embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label, per-dimension embedding statistics (fixed-point
    mean/min/max) — the drift audit an embedding store runs when a
    new encoder version lands: compare this table across snapshots
    and alert on shifted dimensions. |labels|x64 output rows.

    One posexplode + one (label, d) aggregate — uniform small key
    space, full map-side combine; int64 fixed point keeps the means
    bit-stable under any partitioning (truncating division, same as
    the k-means update)."""
    e = load_table(spark, sf_dir, "embeddings")
    xf = e.select(
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding, x -> "
                "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
            )
        ).alias("d", "v"),
    )
    return (
        xf.groupBy("label", F.col("d").cast("bigint").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.expr("sum(v) DIV count(1)").alias("mean_fp"),
            F.min("v").alias("min_fp"),
            F.max("v").alias("max_fp"),
        )
        .orderBy("label", "d")
    )


# --------------------------------------------------------------------------
# F3: hyperplane-LSH recall audit (vector-side sketch-quality gate)
# --------------------------------------------------------------------------


@query(
    "q_hyperplane_recall_audit",
    oracle=f"""
    WITH {_SQL_COSINE_PAIRS.format(pair_cond="AND fa.vec_id < fb.vec_id")},
    {_SQL_HYPERPLANE_CAND},
    exact AS (
      SELECT qid AS vec_a, cid AS vec_b FROM cos WHERE cosine >= {_COSINE_T}
    ),
    lshp AS (
      SELECT e.vec_a, e.vec_b FROM exact e
      JOIN cand c ON c.vec_a = e.vec_a AND c.vec_b = e.vec_b
    )
    SELECT CAST((SELECT COUNT(*) FROM exact) AS BIGINT) AS n_true_pairs,
           CAST((SELECT COUNT(*) FROM lshp) AS BIGINT) AS n_lsh_pairs,
           CAST((SELECT COUNT(*) FROM exact) AS BIGINT)
             - CAST((SELECT COUNT(*) FROM lshp) AS BIGINT) AS n_missed,
           CASE WHEN (SELECT COUNT(*) FROM exact) > 0
                THEN CAST((SELECT COUNT(*) FROM lshp) AS BIGINT) * 1.0
                     / (SELECT COUNT(*) FROM exact)
           END AS recall
    """,
)
def q_hyperplane_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-side twin of q_lsh_recall_audit: how much of the exact
    cosine >= 0.45 pair set does the 96-plane/12-band hyperplane LSH
    recover? Precision is 1.0 by construction (the refine recomputes
    exact cosine on candidates), so recall is the whole quality story
    — ship this with every plane/band parameter change. Both pair
    sets are pair-graph sized; the intersection is one equi-join on
    the pair key. An 8-bit band collides for vectors at angle θ with
    P = (1 - θ/π)^8, so recall at cosine 0.45 (θ ≈ 63°) is set by
    the 12-band union — parameter changes move it sharply, which is
    exactly why the audit exists."""
    exact = q_embedding_neardup_pairs(spark, sf_dir).select("vec_a", "vec_b")
    lsh = q_hyperplane_lsh_neardup(spark, sf_dir).select("vec_a", "vec_b")
    found = exact.join(lsh, ["vec_a", "vec_b"], "left_semi")
    nt = exact.agg(F.count(F.lit(1)).alias("n_true_pairs"))
    nl = found.agg(F.count(F.lit(1)).alias("n_lsh_pairs"))
    return nt.crossJoin(nl).select(
        "n_true_pairs",
        "n_lsh_pairs",
        (F.col("n_true_pairs") - F.col("n_lsh_pairs")).alias("n_missed"),
        # NULL when the exact pair set is empty (possible at tiny
        # scale factors or after a threshold change) — a bare divide
        # would produce engine-dependent NaN/div-by-zero vs DuckDB.
        F.when(
            F.col("n_true_pairs") > 0,
            F.col("n_lsh_pairs") * F.lit(1.0) / F.col("n_true_pairs"),
        ).alias("recall"),
    )


@query(
    "q_hyperplane_band_occupancy_audit",
    oracle=f"""
    WITH flat AS ({SQL_FLAT_EMBEDDINGS}),
    {_SQL_HYPERPLANE_BANDS},
    occ AS (
      SELECT band, bval, CAST(COUNT(*) AS BIGINT) AS occ
      FROM bands GROUP BY 1, 2
    )
    SELECT CAST(band AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(occ) AS BIGINT) AS max_occupancy,
           CAST(SUM(CAST(occ AS HUGEINT) * (occ - 1) // 2) AS BIGINT)
             AS cand_pairs,
           COUNT(*) = {2 ** _BAND_BITS} AS saturated
    FROM occ
    GROUP BY band
    ORDER BY band
    """,
)
def q_hyperplane_band_occupancy_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LSH banding health check — the pre-flight a 100 TB pipeline runs
    BEFORE committing to the hyperplane path. Per band: how many of the
    2^{_BAND_BITS} possible values are occupied, the hottest bucket,
    and the exact candidate-pair volume the band would contribute to
    the self-join (Σ C(occ, 2)). The round-12 64× adjudication
    (SCALE.md) measured candidate volume degenerating to
    r·n²/2^(b+1) once every bval is occupied — `saturated = true`
    across bands is precisely that regime's signature, and the router
    decision it feeds is "use the K-scaled cell paths instead".
    Runs on the signature frame only (one numpy pass + a (band, bval)
    aggregate over 12·n narrow rows — no pair materialization, so the
    audit stays linear even when the join it predicts would not be).
    cand_pairs is emitted as int64 (sums are HUGEINT/decimal-widened
    in-plan; an int64 overflow here would mean >4.6e18 predicted
    pairs — the audit's own verdict long before the cast matters).
    Oracle-exact: the sign bits, band packing, and occupancy math are
    mirrored bit-for-bit (md5-derived planes, integer sign sums)."""
    sig = _hyperplane_signatures(spark, sf_dir)
    band_structs = ", ".join(
        f"struct({j}L AS band, bv{j} AS bval)"
        for j in range(_N_PLANES // _BAND_BITS)
    )
    membership = sig.select(
        F.expr(f"explode(array({band_structs}))").alias("bb")
    ).select(F.col("bb.band").alias("band"), F.col("bb.bval").alias("bval"))
    occ = membership.groupBy("band", "bval").agg(
        F.count(F.lit(1)).cast("bigint").alias("occ")
    )
    return (
        occ.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.max("occ").cast("bigint").alias("max_occupancy"),
            F.sum(
                F.expr(
                    "CAST(CAST(occ AS DECIMAL(38,0)) * (occ - 1) DIV 2"
                    " AS DECIMAL(38,0))"
                )
            )
            .cast("bigint")
            .alias("cand_pairs"),
            (F.count(F.lit(1)) == F.lit(2 ** _BAND_BITS)).alias("saturated"),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# F3e: hard-negative mining for contrastive training
# --------------------------------------------------------------------------


@query(
    "q_hard_negative_mining",
    oracle=f"""
    WITH lbl AS (SELECT vec_id, label FROM embeddings),
    {_SQL_COSINE_PAIRS.format(pair_cond="AND fa.vec_id < 50 AND fb.vec_id <> fa.vec_id")}
    SELECT qid, rank, cid AS neg_id, cosine,
           CAST(neg_label AS BIGINT) AS neg_label
    FROM (
      SELECT c.qid, c.cid, c.cosine, lb.label AS neg_label,
             row_number() OVER (
               PARTITION BY c.qid ORDER BY c.cosine DESC, c.cid
             ) AS rank
      FROM cos c
      JOIN lbl la ON la.vec_id = c.qid
      JOIN lbl lb ON lb.vec_id = c.cid AND lb.label <> la.label
    )
    WHERE rank <= 3
    ORDER BY qid, rank
    """,
)
def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: per query
    (vec_id < 50 — the same query set as q_ann_topk_blocked, whose
    in-cell results are the POSITIVE candidates), the 3 most
    cosine-similar vectors whose label DIFFERS from the query's — the
    highest-loss negatives a contrastive objective (InfoNCE/triplet)
    wants in the batch, which random negatives almost never supply.

    Test-scale plan: bounded query broadcast against the corpus with a
    label-mismatch residual, exact fixed-point cosine, per-query top-3
    window — the q_cosine_topk_brute shape plus the label filter. The
    100 TB path mines negatives from the ANN index instead (IVF probe
    + label-mismatch residual, the q_ann_topk_ivf plan with the filter
    pushed into the candidate join); the brute form here is the
    recall-1.0 baseline the index-mined variant would be audited
    against, exactly like the ANN/LSH pairs."""
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
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.col("embedding").alias("c_emb"),
        F.col("n2").alias("c_n2"),
    )
    pairs = broadcast_bounded(q, max_rows=64).join(
        c, F.col("q_label") != F.col("neg_label")
    )
    cos = cosine_from_scaled(
        dot_scaled("q_emb", "c_emb"), F.col("q_n2"), F.col("c_n2")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("neg_id")
    )
    return (
        pairs.select(
            "qid",
            "neg_id",
            cos.alias("cosine"),
            F.col("neg_label").cast("bigint").alias("neg_label"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("qid", "rank", "neg_id", "cosine", "neg_label")
        .orderBy("qid", "rank")
    )


@query(
    "q_ann_topk_filtered",
    oracle=f"""
    WITH lbl AS (SELECT vec_id, label FROM embeddings),
    ok AS (
      SELECT e.vec_id FROM embeddings e
      JOIN documents d ON d.doc_id = e.vec_id
      WHERE d.lang <> 'en'
    ),
    {_SQL_COSINE_PAIRS.format(pair_cond="AND fa.vec_id < 10 AND fb.vec_id <> fa.vec_id")}
    SELECT qid, cid, cosine, rank
    FROM (
      SELECT c.qid, c.cid, c.cosine,
             row_number() OVER (PARTITION BY c.qid ORDER BY c.cosine DESC, c.cid) AS rank
      FROM cos c
      JOIN lbl la ON la.vec_id = c.qid
      JOIN lbl lb ON lb.vec_id = c.cid AND lb.label = la.label
      JOIN ok ON ok.vec_id = c.cid
    )
    WHERE rank <= 3
    ORDER BY qid, rank
    """,
)
def q_ann_topk_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search: top-3 within the query's coarse cell
    AMONG candidates passing a metadata predicate (here: the paired
    document's lang <> 'en' — "find similar non-English docs").

    The semantics every production filtered-ANN call needs and
    post-filtering gets wrong: filtering a top-k AFTER ranking
    returns < k (or zero) rows when the neighborhood is dominated by
    filtered-out candidates; the correct result ranks INSIDE the
    eligible set. Plan: eligibility is a vec_id-keyed semi join
    applied to the candidate side BEFORE the cell-blocked cosine —
    at 100 TB metadata lives columnar beside the codes, so the
    predicate prunes at the scan and the ANN plan is unchanged
    (the IVF/IVFADC variants compose the same way: filter the
    cell-local candidate stream before scoring)."""
    e = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    eligible = (
        e.join(
            docs.where(F.col("lang") != "en").select(
                F.col("doc_id").alias("vec_id")
            ),
            "vec_id",
            "left_semi",
        )
    )
    base_cols = lambda df: df.select(  # noqa: E731
        "vec_id", "label", "embedding", norm2_scaled("embedding").alias("n2")
    )
    q = base_cols(e).where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    c = base_cols(eligible).select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        F.col("n2").alias("c_n2"),
    )
    pairs = broadcast_bounded(q, max_rows=64).join(
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


_KNN_K = 2


@query(
    "q_vector_knn_graph",
    oracle=f"""
    WITH lbl AS (SELECT vec_id, label FROM embeddings),
    {_SQL_COSINE_PAIRS.format(pair_cond="AND fb.vec_id <> fa.vec_id")}
    SELECT qid AS vec_id, cid AS nbr, cosine, rank
    FROM (
      SELECT c.qid, c.cid, c.cosine,
             row_number() OVER (PARTITION BY c.qid
                                ORDER BY c.cosine DESC, c.cid) AS rank
      FROM cos c
      JOIN lbl la ON la.vec_id = c.qid
      JOIN lbl lb ON lb.vec_id = c.cid AND lb.label = la.label
    )
    WHERE rank <= {_KNN_K}
    ORDER BY vec_id, rank
    """,
)
def q_vector_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-GRAPH construction: EVERY corpus vector's top-{_KNN_K}
    neighbors within its coarse cell — not a few-query search but the
    all-corpus build that graph-based curation consumes (label
    propagation over the graph, kNN-density quality scoring, graph
    connectivity dedup à la the near-dup pair graph).

    Plan: a cell-keyed self-join (each vector meets only its cell's
    members — the IVF blocking argument applied corpus-wide), exact
    fixed-point cosine, and a per-vector top-k window whose
    rank <= {_KNN_K} filter compiles to Partial/Final WindowGroupLimit
    (each task ships ~k rows per vector into the window shuffle). At
    100 TB the cells come from the trained quantizer and multi-probe
    widens recall — the same composition as q_ann_topk_ivf with the
    query side replaced by the whole corpus; candidate volume is
    Σ|cell|², the quantity K is tuned to bound (|cell| ≈ n/K)."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", "label", "embedding", norm2_scaled("embedding").alias("n2")
    )
    a = base.select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    b = base.select(
        F.col("vec_id").alias("cid"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        F.col("n2").alias("c_n2"),
    )
    pairs = a.join(
        b, (F.col("q_label") == F.col("c_label")) & (F.col("qid") != F.col("cid"))
    )
    cos = cosine_from_scaled(
        dot_scaled("q_emb", "c_emb"), F.col("q_n2"), F.col("c_n2")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        pairs.select("qid", "cid", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _KNN_K)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("cid").alias("nbr"),
            "cosine",
            "rank",
        )
        .orderBy("vec_id", "rank")
    )


_LP_K = 4  # neighbors consulted per vector for label propagation


def _sql_cell_knn_ctes(k: int) -> str:
    """Oracle CTE chain ending in knn(qid, cid): top-k cosine
    neighbors within each vector's TRAINED k-means cell. Shared by
    the label-propagation and 2-hop-homophily oracles so the graph
    definition can never de-synchronize between them."""
    from geoparquet_python_spark.operators import kmeans as km

    return f"""{km._sql_kmeans_ctes()},
    lbl AS (SELECT vec_id, label FROM embeddings),
    cellof AS (SELECT vec_id, cid AS cell FROM a{km._T}),
    {_SQL_COSINE_PAIRS.format(pair_cond="AND fb.vec_id <> fa.vec_id")}
    , knn AS (
      SELECT qid, cid FROM (
        SELECT c.qid, c.cid,
               row_number() OVER (PARTITION BY c.qid
                                  ORDER BY c.cosine DESC, c.cid) AS rank
        FROM cos c
        JOIN cellof ca ON ca.vec_id = c.qid
        JOIN cellof cb ON cb.vec_id = c.cid AND cb.cell = ca.cell
      ) WHERE rank <= {k}
    )"""


_KNN_EDGE_CACHE: dict[tuple[str, str, int], DataFrame] = {}


def _cell_knn_kernel(k: int):
    """mapInArrow kernel: exact within-cell top-k cosine neighbors.

    The caller repartitions by cell, so every cell's rows land wholly
    in one task. Per task: buffer the task's rows, then per cell
    compute every in-cell pair's FIXED-POINT cosine with the identical
    IEEE arithmetic the JVM expressions spelled — per-term
    floor((x·y)·1e12) accumulated as int64 (dot_scaled), then
    (dot/1e12) / (sqrt(na/1e12)·sqrt(nb/1e12)) in double
    (cosine_from_scaled) — and keep each row's top-k by
    (cosine DESC, cid ASC). float32→float64 widening, f64
    multiplication, floor, int64 summation, sqrt and division are all
    exactly specified by IEEE 754, so the numpy batch computes
    bit-identical cosines to the JVM form it replaced (pinned:
    tests/test_llm_ops.py::test_cell_knn_kernel_matches_jvm_form).
    Tie-breaking: candidates are sorted cid-ascending and the top-k
    argsort on -cosine is STABLE, which is exactly row_number() over
    (cosine DESC, cid ASC); −0.0 == 0.0 in both engines' sort
    comparators, so signed zeros tie-break identically too.

    Why (optimization r13, guide §4.2): the previous form self-joined
    the cell-assigned corpus and evaluated dot_scaled as an
    interpreted higher-order function per pair — ~50 µs per 64-dim
    pair (the dot_scaled_arrow measurement), ~500 k in-cell pairs at
    sf0.1 ⇒ ~25 core-seconds spread over only |cells| join tasks; the
    whole build was 5–7 s of the exposed 7.7 s q_knn_label_propagation
    wall. The numpy form computes the same pair count as one
    vectorized broadcast per cell (chunked so the temp stays ~32 MB).
    Task memory is O(cell rows × dim); parallelism is |cells| — the
    same bound the 8-key self-join had, and K grows with the corpus
    (kmeans module contract) so cluster scale widens, not narrows."""

    def kernel(it):
        import numpy as np
        import pyarrow as pa

        ids_l: list = []
        cell_l: list = []
        emb_l: list = []
        for batch in it:
            if batch.num_rows == 0:
                continue
            ids_l.append(
                batch.column("vec_id").to_numpy(zero_copy_only=False)
            )
            cell_l.append(
                batch.column("cell").to_numpy(zero_copy_only=False)
            )
            col = batch.column("embedding")
            off = col.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(off)
            if len(widths) and not (widths == widths[0]).all():
                raise ValueError("_cell_knn_kernel: ragged embedding widths")
            vals = col.values.to_numpy(zero_copy_only=False)
            emb_l.append(
                vals[off[0] : off[-1]]
                .astype(np.float64)
                .reshape(len(col), int(widths[0]) if len(widths) else 0)
            )
        if not ids_l:
            return
        ids = np.concatenate(ids_l).astype(np.int64)
        cells = np.concatenate(cell_l).astype(np.int64)
        emb = np.vstack(emb_l)
        # exact fixed-point squared norms (norm2_scaled twin)
        n2 = np.floor((emb * emb) * 1e12).astype(np.int64).sum(axis=1)
        if not (n2 > 0).all():
            # cosine is undefined and the JVM/numpy NaN sort orders
            # would diverge — fail loudly instead of silently differing
            raise ValueError("_cell_knn_kernel: zero-norm embedding")
        order = np.argsort(cells, kind="stable")
        ids, cells, emb, n2 = ids[order], cells[order], emb[order], n2[order]
        starts = np.flatnonzero(np.r_[True, cells[1:] != cells[:-1]])
        bounds = np.r_[starts, len(cells)]
        out_q: list = []
        out_c: list = []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            m = int(b1 - b0)
            if m < 2:
                continue  # singleton cell: no neighbors
            cid = ids[b0:b1]
            ec = emb[b0:b1]
            # candidates cid-ascending so stable -cos argsort ties to
            # the lowest cid
            cord = np.argsort(cid, kind="stable")
            cid, ec = cid[cord], ec[cord]
            sq = np.sqrt(n2[b0:b1][cord] / 1e12)
            take = min(k, m - 1)
            # chunk queries so the (chunk × m × dim) f64 temp stays
            # bounded (~32 MB)
            chunk = max(1, 4_000_000 // max(m * ec.shape[1], 1))
            for q0 in range(0, m, chunk):
                q1 = min(m, q0 + chunk)
                terms = np.floor((ec[q0:q1, None, :] * ec[None, :, :]) * 1e12)
                dots = terms.astype(np.int64).sum(axis=2)
                cos = (dots / 1e12) / (sq[q0:q1, None] * sq[None, :])
                # self-exclusion: rank self strictly last
                cos[np.arange(q1 - q0), np.arange(q0, q1)] = -np.inf
                idx = np.argsort(-cos, axis=1, kind="stable")[:, :take]
                out_q.append(np.repeat(cid[q0:q1], take))
                out_c.append(cid[idx].ravel())
        if out_q:
            yield pa.RecordBatch.from_pydict(
                {
                    "qid": np.concatenate(out_q),
                    "cid": np.concatenate(out_c),
                }
            )

    return kernel


def _cell_knn_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, embedding, cell): the trained-cell-assigned corpus the
    kNN edge builders consume."""
    from geoparquet_python_spark.operators import kmeans as km

    cents = km._train(spark, sf_dir)
    return km._fixed_points(spark, sf_dir).select(
        "vec_id", "embedding", km._assign_expr(cents).alias("cell")
    )


def _cell_knn_edges(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    """(qid, cid) edge frame of each vector's top-k cosine neighbors
    within its trained k-means cell — the Spark twin of
    _sql_cell_knn_ctes, computed by the vectorized per-cell kernel
    (optimization r13; see _cell_knn_kernel for the exactness
    argument; the replaced self-join + row_number form is kept as
    _cell_knn_edges_reference and pinned equal by pytest).

    Materialized (localCheckpoint) and cached per (session, corpus, k):
    the kNN graph is built once and consumed by label propagation,
    mutual-kNN, and the 2-hop homophily audit — round-6 bench paid the
    identical build three times per suite (VERDICT r6 item 2). The
    cached frame is k-bounded (n×k edge rows), the 100 TB equivalent
    of checkpointing the edge table to parquet between pipeline
    stages. (Benchmarks clear this cache before every timed rep —
    registry.clear_derived_caches — so recorded times pay the build.)"""
    cache_key = (spark.sparkContext.applicationId, sf_dir, k)
    if cache_key in _KNN_EDGE_CACHE:
        return _KNN_EDGE_CACHE[cache_key]
    base = _cell_knn_base(spark, sf_dir)
    edges = materialize(
        base.repartition("cell").mapInArrow(
            _cell_knn_kernel(k), "qid bigint, cid bigint"
        )
    )
    _KNN_EDGE_CACHE[cache_key] = edges
    return edges


def _cell_knn_edges_reference(
    spark: SparkSession, sf_dir: str, k: int
) -> DataFrame:
    """The pre-r13 JVM form (cell self-join + interpreted dot_scaled +
    row_number top-k), kept UNCACHED as the equivalence reference for
    the kernel's pin test."""
    base = _cell_knn_base(spark, sf_dir).withColumn(
        "n2", norm2_scaled("embedding")
    )
    a = base.select(
        F.col("vec_id").alias("qid"),
        F.col("cell").alias("q_cell"),
        F.col("embedding").alias("q_emb"),
        F.col("n2").alias("q_n2"),
    )
    b = base.select(
        F.col("vec_id").alias("cid"),
        F.col("cell").alias("c_cell"),
        F.col("embedding").alias("c_emb"),
        F.col("n2").alias("c_n2"),
    )
    pairs = a.join(
        b, (F.col("q_cell") == F.col("c_cell")) & (F.col("qid") != F.col("cid"))
    )
    cos = cosine_from_scaled(
        dot_scaled("q_emb", "c_emb"), F.col("q_n2"), F.col("c_n2")
    )
    wk = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return (
        pairs.select("qid", "cid", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("qid", "cid")
    )


def _sql_lp_oracle() -> str:
    return f"""
    WITH {_sql_cell_knn_ctes(_LP_K)},
    votes AS (
      SELECT k.qid, nl.label AS nbr_label, COUNT(*) AS n_votes
      FROM knn k JOIN lbl nl ON nl.vec_id = k.cid
      GROUP BY k.qid, nl.label
    ),
    prop AS (
      SELECT qid, nbr_label AS propagated FROM (
        SELECT qid, nbr_label,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY n_votes DESC, nbr_label) AS rn
        FROM votes
      ) WHERE rn = 1
    )
    SELECT l.vec_id, CAST(l.label AS INT) AS label,
           CAST(p.propagated AS INT) AS propagated,
           l.label = p.propagated AS agree
    FROM lbl l JOIN prop p ON p.qid = l.vec_id
    ORDER BY l.vec_id
    """


@query("q_knn_label_propagation", oracle=_sql_lp_oracle())
def q_knn_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One label-propagation round over the kNN graph: each vector's
    PROPAGATED label is the majority label among its {_LP_K} nearest
    neighbors within its TRAINED k-means cell (ties → lowest label),
    compared against the stored label. Disagreements are label-ERROR
    candidates — the Confident-Learning-style audit a labeled set runs
    before the labels are trusted. Blocking MUST come from the
    quantizer, not from the audited label (label-blocked neighbors
    make the vote circular and the audit vacuous).

    Plan: trained-cell self-join (the kNN-graph build) + WindowGroupLimit
    top-k, one (vector, neighbor-label) vote aggregate, one argmax
    window over ≤|labels| rows per vector, one map-side compare."""
    e = load_table(spark, sf_dir, "embeddings")
    knn = _cell_knn_edges(spark, sf_dir, _LP_K)
    nbr_lbl = e.select(
        F.col("vec_id").alias("cid"), F.col("label").alias("nbr_label")
    )
    votes = (
        knn.join(nbr_lbl, "cid")
        .groupBy("qid", "nbr_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    # Optimization r12 (guide §2.3): majority label per vector as one
    # max_by aggregate ordered on (n_votes, -nbr_label) — the same
    # total order the row_number window spelled (n_votes DESC,
    # nbr_label ASC; labels are distinct within a qid group so no
    # ties). No per-partition sort; map-side partials on the already
    # label-sized votes frame.
    prop = votes.groupBy("qid").agg(
        F.max_by(
            "nbr_label",
            F.struct(F.col("n_votes"), (-F.col("nbr_label")).alias("nl")),
        ).alias("propagated")
    )
    return (
        e.select("vec_id", "label")
        .join(prop, F.col("vec_id") == F.col("qid"))
        .select(
            "vec_id",
            F.col("label").cast("int").alias("label"),
            F.col("propagated").cast("int").alias("propagated"),
            (F.col("label") == F.col("propagated")).alias("agree"),
        )
        .orderBy("vec_id")
    )


_HOP_K = 2  # out-degree of the kNN graph for the 2-hop expansion


def _sql_hop2_oracle() -> str:
    return f"""
    WITH {_sql_cell_knn_ctes(_HOP_K)},
    nb2 AS (
      SELECT a.qid, b.cid
      FROM knn a JOIN knn b ON b.qid = a.cid
      WHERE b.cid <> a.qid
    ),
    nbhd AS (
      SELECT DISTINCT qid, cid FROM (
        SELECT qid, cid FROM knn
        UNION ALL
        SELECT qid, cid FROM nb2
      )
    )
    SELECT l.vec_id, CAST(l.label AS INT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_nbrs,
           CAST(SUM(CASE WHEN nl.label = l.label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same,
           CAST(SUM(CASE WHEN nl.label = l.label THEN 1000000 ELSE 0 END)
                AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS homophily_ppm
    FROM nbhd h
    JOIN lbl l ON l.vec_id = h.qid
    JOIN lbl nl ON nl.vec_id = h.cid
    GROUP BY l.vec_id, l.label
    ORDER BY l.vec_id
    """


@query("q_knn_two_hop_homophily", oracle=_sql_hop2_oracle())
def q_knn_two_hop_homophily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style 2-HOP neighborhood aggregation over the kNN
    graph: expand each vector's distinct ≤2-hop neighborhood (out-
    degree {_HOP_K}, self excluded) and measure label HOMOPHILY — the
    fraction of neighborhood members sharing the vector's stored
    label. High homophily certifies the embedding/label pair for
    graph-based curation (label propagation converges, kNN-density
    scoring is meaningful); low homophily flags embedding-label
    disagreement before anything trains on it.

    Plan: one kNN edge build (trained-cell self-join + WindowGroupLimit,
    shared with q_knn_label_propagation via _cell_knn_edges), one
    edge⋈edge self-join for hop 2 (output ≤ k² rows per vector — the
    bounded fan-out every GNN sampler relies on), a distinct union,
    one label join each side, one per-vector conditional aggregate.
    The edge frame is materialized once so the self-join reuses one
    computation (and avoids shared expr-ids). At 100 TB: every stage
    keys on vec_id or the edge — uniform k-bounded shuffles; nothing
    corpus-quadratic."""
    e = load_table(spark, sf_dir, "embeddings")
    knn = _cell_knn_edges(spark, sf_dir, _HOP_K)  # checkpointed by the cache
    e1 = knn.select(F.col("qid"), F.col("cid").alias("mid"))
    e2 = knn.select(F.col("qid").alias("mid"), F.col("cid").alias("cid2"))
    nb2 = (
        e1.join(e2, "mid")
        .where(F.col("cid2") != F.col("qid"))
        .select("qid", F.col("cid2").alias("cid"))
    )
    nbhd = knn.select("qid", "cid").unionByName(nb2).distinct()
    own = e.select(F.col("vec_id").alias("qid"), F.col("label").alias("l_own"))
    nbr = e.select(F.col("vec_id").alias("cid"), F.col("label").alias("l_nbr"))
    same = F.col("l_nbr") == F.col("l_own")
    return (
        nbhd.join(own, "qid")
        .join(nbr, "cid")
        .groupBy("qid", "l_own")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nbrs"),
            F.sum(F.when(same, 1).otherwise(0)).cast("bigint").alias("n_same"),
            F.expr(
                "CAST(sum(CASE WHEN l_nbr = l_own THEN 1000000 ELSE 0 END)"
                " AS BIGINT) div count(*)"
            ).alias("homophily_ppm"),
        )
        .select(
            F.col("qid").alias("vec_id"),
            F.col("l_own").cast("int").alias("label"),
            "n_nbrs",
            "n_same",
            "homophily_ppm",
        )
        .orderBy("vec_id")
    )


_MNN_K = 4  # out-degree of the kNN graph for the mutual filter


def _sql_mnn_oracle() -> str:
    return f"""
    WITH {_sql_cell_knn_ctes(_MNN_K)},
    mutual AS (
      SELECT k1.qid AS vec_a, k1.cid AS vec_b
      FROM knn k1 JOIN knn k2 ON k2.qid = k1.cid AND k2.cid = k1.qid
      WHERE k1.qid < k1.cid
    )
    SELECT m.vec_a, m.vec_b,
           CAST(la.label AS INT) AS label_a,
           CAST(lb.label AS INT) AS label_b,
           la.label = lb.label AS same_label
    FROM mutual m
    JOIN lbl la ON la.vec_id = m.vec_a
    JOIN lbl lb ON lb.vec_id = m.vec_b
    ORDER BY vec_a, vec_b
    """


@query("q_mutual_knn_pairs", oracle=_sql_mnn_oracle())
def q_mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECIPROCAL nearest-neighbor pairs: (a, b) kept only when b is in
    a's top-{_MNN_K} AND a is in b's top-{_MNN_K} — the mutual-kNN
    filter that turns a directed kNN graph into high-precision
    candidate pairs (one-sided neighbors are dominated by hubness:
    a hub vector appears in thousands of top-k lists without any of
    them being near-duplicates of each other; mutuality is the
    standard symmetric-evidence gate in dedup and RNN-clustering).

    Plan: the shared trained-cell kNN build (_cell_knn_edges,
    materialized once so the self-join below reuses one computation),
    then an edge⋈edge equi-join on the REVERSED key pair — output is
    a subset of the k·n edge frame, never corpus-quadratic — and two
    label lookups for the same_label quality signal. At 100 TB every
    stage keys on vec_id pairs with k-bounded fan-out; the mutual join
    shuffles at most k rows per vector."""
    e = load_table(spark, sf_dir, "embeddings")
    knn = _cell_knn_edges(spark, sf_dir, _MNN_K)  # checkpointed by the cache
    rev = knn.select(
        F.col("qid").alias("r_qid"), F.col("cid").alias("r_cid")
    )
    mutual = (
        knn.join(
            rev,
            (F.col("qid") == F.col("r_cid")) & (F.col("cid") == F.col("r_qid")),
        )
        .where(F.col("qid") < F.col("cid"))
        .select(F.col("qid").alias("vec_a"), F.col("cid").alias("vec_b"))
    )
    la = e.select(F.col("vec_id").alias("vec_a"), F.col("label").alias("la"))
    lb = e.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"))
    return (
        mutual.join(la, "vec_a")
        .join(lb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.col("la").cast("int").alias("label_a"),
            F.col("lb").cast("int").alias("label_b"),
            (F.col("la") == F.col("lb")).alias("same_label"),
        )
        .orderBy("vec_a", "vec_b")
    )


# --------------------------------------------------------------------------
# F3f: Matryoshka truncated-dimension recall audit
# --------------------------------------------------------------------------

_MRL_D = 16  # leading dims of the 64 kept by the coarse ranking
_MRL_K = 5  # top-k audited


@query(
    "q_matryoshka_recall_audit",
    oracle=f"""
    WITH flat AS ({SQL_FLAT_EMBEDDINGS}),
    nf AS (
      SELECT vec_id,
             CAST(SUM(CAST(floor(x * x * 1e12) AS BIGINT)) AS BIGINT) AS n2
      FROM flat GROUP BY vec_id
    ),
    nt AS (
      SELECT vec_id,
             CAST(SUM(CAST(floor(x * x * 1e12) AS BIGINT)) AS BIGINT) AS n2
      FROM flat WHERE i <= {_MRL_D} GROUP BY vec_id
    ),
    df AS (
      SELECT fa.vec_id AS qid, fb.vec_id AS cid,
             CAST(SUM(CAST(floor(fa.x * fb.x * 1e12) AS BIGINT)) AS BIGINT) AS d
      FROM flat fa JOIN flat fb ON fa.i = fb.i
        AND fa.vec_id < 10 AND fb.vec_id <> fa.vec_id
      GROUP BY 1, 2
    ),
    dt AS (
      SELECT fa.vec_id AS qid, fb.vec_id AS cid,
             CAST(SUM(CAST(floor(fa.x * fb.x * 1e12) AS BIGINT)) AS BIGINT) AS d
      FROM flat fa JOIN flat fb ON fa.i = fb.i AND fa.i <= {_MRL_D}
        AND fa.vec_id < 10 AND fb.vec_id <> fa.vec_id
      GROUP BY 1, 2
    ),
    topf AS (
      SELECT qid, cid FROM (
        SELECT d.qid, d.cid,
               row_number() OVER (PARTITION BY d.qid ORDER BY
                 (d.d / 1e12) / (sqrt(na.n2 / 1e12) * sqrt(nb.n2 / 1e12))
                 DESC, d.cid) AS rank
        FROM df d
        JOIN nf na ON na.vec_id = d.qid
        JOIN nf nb ON nb.vec_id = d.cid
      ) WHERE rank <= {_MRL_K}
    ),
    topt AS (
      SELECT qid, cid FROM (
        SELECT d.qid, d.cid,
               row_number() OVER (PARTITION BY d.qid ORDER BY
                 (d.d / 1e12) / (sqrt(na.n2 / 1e12) * sqrt(nb.n2 / 1e12))
                 DESC, d.cid) AS rank
        FROM dt d
        JOIN nt na ON na.vec_id = d.qid
        JOIN nt nb ON nb.vec_id = d.cid
      ) WHERE rank <= {_MRL_K}
    )
    SELECT f.qid,
           CAST(COUNT(t.cid) AS BIGINT) AS n_overlap,
           CAST(COUNT(t.cid) AS BIGINT) / {_MRL_K}.0 AS recall
    FROM topf f
    LEFT JOIN topt t ON t.qid = f.qid AND t.cid = f.cid
    GROUP BY f.qid
    ORDER BY f.qid
    """,
)
def q_matryoshka_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-representation audit (Kusupati et al. 2022): how
    much of the exact full-dimension cosine top-{K} does ranking on
    only the LEADING {D} of 64 dimensions recover, per query? This is
    the quality gate for the coarse-to-fine serving plan — rank with
    a {D}-dim prefix (4× fewer bytes scanned and FLOPs), refine the
    shortlist at full width — the vector twin of the IVF-PQ and LSH
    recall audits, and it makes dimension-truncation a MEASURED
    trade, not a hope.

    Both rankings use the exact fixed-point dot/norm lattice, so the
    audit is oracle-exact; the prefix ranking needs no second table —
    `slice(embedding, 1, {D})` reuses the same scan. recall is the
    exact rational n/{K} (int over constant, IEEE-exact). Scale: two
    bounded-query broadcasts against the corpus (the brute-force
    baseline shape); at index scale both sides come from the ANN
    path instead and this audit certifies the swap."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        "embedding",
        F.slice("embedding", 1, _MRL_D).alias("emb_t"),
        norm2_scaled("embedding").alias("n2f"),
        norm2_scaled(F.slice("embedding", 1, _MRL_D)).alias("n2t"),
    )
    q = base.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("emb_t").alias("q_emb_t"),
        F.col("n2f").alias("q_n2f"),
        F.col("n2t").alias("q_n2t"),
    )
    c = base.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("c_emb"),
        F.col("emb_t").alias("c_emb_t"),
        F.col("n2f").alias("c_n2f"),
        F.col("n2t").alias("c_n2t"),
    )
    pairs = broadcast_bounded(q, max_rows=64).join(
        c, F.col("qid") != F.col("cid")
    )

    def topk(cos: F.Column) -> DataFrame:
        w = Window.partitionBy("qid").orderBy(
            F.col("cosine").desc(), F.col("cid")
        )
        return (
            pairs.select("qid", "cid", cos.alias("cosine"))
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= _MRL_K)
            .select("qid", "cid")
        )

    topf = topk(
        cosine_from_scaled(
            dot_scaled("q_emb", "c_emb"), F.col("q_n2f"), F.col("c_n2f")
        )
    )
    topt = topk(
        cosine_from_scaled(
            dot_scaled("q_emb_t", "c_emb_t"), F.col("q_n2t"), F.col("c_n2t")
        )
    )
    ov = topf.join(topt, ["qid", "cid"], "left_semi")
    return (
        topf.groupBy("qid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .join(
            ov.groupBy("qid").agg(
                F.count(F.lit(1)).cast("bigint").alias("n_overlap")
            ),
            "qid",
            "left",
        )
        .select(
            "qid",
            F.coalesce("n_overlap", F.lit(0)).cast("bigint").alias(
                "n_overlap"
            ),
            (
                F.coalesce("n_overlap", F.lit(0)).cast("bigint")
                / F.lit(float(_MRL_K))
            ).alias("recall"),
        )
        .orderBy("qid")
    )
