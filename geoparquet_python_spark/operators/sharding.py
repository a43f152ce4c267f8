"""Rendezvous (highest-random-weight) sharding: stable shard
assignment with certified minimal movement under resharding.

Hash-mod sharding (`hash(key) % S`) remaps ~(S-1)/S of ALL keys when
S changes — at 100 TB that is a full-corpus rewrite to add one
shard. Rendezvous hashing (Thaler & Ravishankar 1996; the family
consistent hashing belongs to) assigns each key to
``argmax_s h(key, s)`` — adding shard S+1 moves exactly the keys
whose new hash wins, an expected 1/(S+1) fraction, and NOTHING else
ever moves. This query computes both assignments (S={S0} and
S={S1}) and reports per-new-shard counts and the moved fraction —
the minimal-movement property as a checked result, not a slogan.

No reference equivalent (SURVEY.md §0 provenance) — [N] north-star
scope: every long-lived 100 TB corpus reshards eventually; the
engine should make "what moves" a one-scan query.

Determinism: h(key, s) = md5_long(doc_id || ':' || s) — the repo's
60-bit ANSI-reproducible lattice; the argmax tie-break (impossible
in practice at 60 bits, pinned anyway) is lowest s, enforced by an
explicit (h DESC, s ASC) total order on both engines.

Scale shape (100 TB lens):
- Assignment is ONE in-row expression: array_max over the S
  (hash, -s) pairs built by transform — no explode, no join, no
  shuffle; a row never leaves its input partition until the final
  |shards|-group aggregate (partial map-side, output bounded by S).
- Both epochs' assignments come from the same projection, so the
  movement audit costs one corpus scan total.
- S scales the per-row compute linearly (S md5s); for S in the
  thousands the standard refinement is two-level rendezvous (shard
  groups, then shards within the winning group) — same expression,
  log-depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import broadcast_narrow
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_S0 = 16  # current shard count
_S1 = 17  # after adding one shard

_SQL_H = (
    "CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || "
    "CAST(r.s AS VARCHAR)), 1, 15)) AS BIGINT)"
)


def _sql_assign(n: int, name: str) -> str:
    """CTE ``{name}(doc_id, shard)``: rendezvous winner among n shards
    via an explicit (h DESC, s ASC) row_number — the tie rule both
    engines share."""
    return f"""
    {name} AS (
      SELECT doc_id, s AS shard FROM (
        SELECT d.doc_id, r.s,
               row_number() OVER (
                 PARTITION BY d.doc_id ORDER BY {_SQL_H} DESC, r.s
               ) AS rn
        FROM documents d CROSS JOIN range({n}) r(s)
      ) WHERE rn = 1
    )"""


@query(
    "q_rendezvous_resharding",
    oracle=f"""
    WITH {_sql_assign(_S0, "a0")},
    {_sql_assign(_S1, "a1")}
    SELECT a1.shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (a0.shard <> a1.shard) AS BIGINT)
             AS n_moved,
           CAST(COUNT(*) FILTER (a0.shard <> a1.shard) * 1000000
                // COUNT(*) AS BIGINT) AS moved_ppm
    FROM a1 JOIN a0 ON a0.doc_id = a1.doc_id
    GROUP BY a1.shard
    ORDER BY a1.shard
    """,
)
def q_rendezvous_resharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard census of a {S0} → {S1} rendezvous resharding: for
    each NEW shard, how many docs live there and how many of them
    MOVED (changed shard when the {S1}th shard appeared). Rendezvous
    guarantees the moved docs are exactly the new shard's wins —
    every other doc's argmax is untouched — so n_moved is zero on
    shards 0..{S0}-1 and the global moved fraction is ~1/{S1}; the
    query certifies both facts as data.

    Plan: both epochs' assignments are in-row array_max expressions
    over the per-shard hash lattice (one projection, no explode, no
    join); the only shuffle is the final {S1}-group aggregate."""

    def assign(n: int) -> F.Column:
        return F.expr(
            f"array_max(transform(sequence(0, {n - 1}), s -> "
            "named_struct("
            "'h', CAST(conv(substring(md5(CAST(doc_id AS STRING) || ':' "
            "|| CAST(s AS STRING)), 1, 15), 16, 10) AS BIGINT), "
            "'negs', -s))).negs * -1"
        )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        assign(_S0).alias("shard0"),
        assign(_S1).alias("shard"),
    )
    return (
        d.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.col("shard0") != F.col("shard"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_moved"),
        )
        .select(
            "shard",
            "n_docs",
            "n_moved",
            F.expr("CAST(n_moved * 1000000 div n_docs AS BIGINT)").alias(
                "moved_ppm"
            ),
        )
        .orderBy("shard")
    )


_G = 4  # shard groups (two-level rendezvous)
_KPG = 5  # shards per group → _G × _KPG total


@query(
    "q_rendezvous_two_level",
    oracle=f"""
    WITH g AS (
      SELECT doc_id, s AS grp FROM (
        SELECT d.doc_id, r.s,
               row_number() OVER (
                 PARTITION BY d.doc_id ORDER BY
                 CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':g:'
                      || CAST(r.s AS VARCHAR)), 1, 15)) AS BIGINT) DESC, r.s
               ) AS rn
        FROM documents d CROSS JOIN range({_G}) r(s)
      ) WHERE rn = 1
    ),
    sh AS (
      SELECT doc_id, grp, s AS sub FROM (
        SELECT g.doc_id, g.grp, r.s,
               row_number() OVER (
                 PARTITION BY g.doc_id ORDER BY
                 CAST(('0x' || substr(md5(CAST(g.doc_id AS VARCHAR) || ':s:'
                      || CAST(g.grp AS VARCHAR) || '.'
                      || CAST(r.s AS VARCHAR)), 1, 15)) AS BIGINT) DESC, r.s
               ) AS rn
        FROM g CROSS JOIN range({_KPG}) r(s)
      ) WHERE rn = 1
    ),
    counts AS (
      SELECT grp * {_KPG} + sub AS shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM sh GROUP BY grp * {_KPG} + sub
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM counts)
    SELECT c.shard, c.n_docs,
           CAST(c.n_docs * 1000000 // t.n AS BIGINT) AS load_ppm
    FROM counts c CROSS JOIN tot t
    ORDER BY c.shard
    """,
)
def q_rendezvous_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level rendezvous — the flat census's docstring promise as
    checked code: pick the GROUP by HRW over {G} group hashes, then
    the shard WITHIN the winning group by HRW over {K} shard hashes
    — {G}+{K} hashes per key instead of {G}·{K}, which is how
    rendezvous stays per-row-cheap when S reaches the thousands
    (log-depth levels). Still minimal-movement level-wise: adding a
    group moves ~1/(G+1) of keys; adding a shard to ONE group moves
    ~1/(K+1) of THAT group only. The census reports per-shard load
    in exact ppm — the balance certificate (HRW within level keeps
    the multinomial balance the flat form has).

    Plan: both argmax levels are in-row array_max expressions in ONE
    projection (the group winner feeds the second level's hash
    string); the only shuffle is the {G}×{K}-group aggregate."""
    grp = (
        f"array_max(transform(sequence(0, {_G - 1}), s -> named_struct("
        "'h', CAST(conv(substring(md5(CAST(doc_id AS STRING) || ':g:' "
        "|| CAST(s AS STRING)), 1, 15), 16, 10) AS BIGINT), "
        "'negs', -s))).negs * -1"
    )
    sub = (
        f"array_max(transform(sequence(0, {_KPG - 1}), s -> named_struct("
        "'h', CAST(conv(substring(md5(CAST(doc_id AS STRING) || ':s:' "
        "|| CAST(grp AS STRING) || '.' || CAST(s AS STRING)), 1, 15), "
        "16, 10) AS BIGINT), "
        "'negs', -s))).negs * -1"
    )
    d = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(grp).alias("grp"))
        .select(
            "doc_id",
            (F.col("grp") * _KPG + F.expr(sub)).alias("shard"),
        )
    )
    counts = d.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = counts.agg(F.sum("n_docs").cast("bigint").alias("n"))
    return (
        counts.crossJoin(broadcast_narrow(tot))
        .select(
            "shard",
            "n_docs",
            F.expr("CAST(n_docs * 1000000 div n AS BIGINT)").alias(
                "load_ppm"
            ),
        )
        .orderBy("shard")
    )
