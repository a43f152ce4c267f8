"""BPE merge induction as pure dataflow (SURVEY.md §2.F4 [N]-scope):
the iterative core of byte-pair-encoding tokenizer training — count
adjacent symbol pairs, merge the most frequent pair corpus-wide,
repeat — expressed as an unrolled chain of window/aggregate stages
with NO driver-side state and NO UDFs.

Word-level symbols here (documents.text is whitespace-tokenized);
the recurrence is the same one a byte-level trainer runs. Each round:

1. pair counts: one shuffle keyed by (w, next_w) — full map-side
   combine, vocab²-bounded output;
2. winning pair: a 1-ROW frame (count DESC, then lexicographic
   tie-break) broadcast back over the corpus — the BM25-stats
   pattern, no collect();
3. merge application: candidate positions are marked with lead();
   overlapping candidates (possible only when the pair is doubled,
   "a a" inside "a a a") resolve by BPE's left-to-right greedy rule,
   computed declaratively as run-parity — consecutive candidate runs
   keep even offsets only (island id = p − running candidate count,
   a gaps-and-islands key);
4. re-sequencing: drop consumed positions, row_number new positions.

Every stage keys on doc_id or the pair — uniform shuffles, nothing
corpus-quadratic, state bounded by one row per token. A production
trainer amortizes rounds by applying the top-M non-conflicting pairs
per pass (same plan, top-M frame instead of top-1) — thousands of
merges in tens of passes, each a linear corpus scan; this query keeps
M=1 and 3 rounds so the recurrence is oracle-checkable bit-for-bit.

Merged symbols join with a space ("a b"), which cannot collide with
any single token (tokens are space-free by construction), so round
N+1's pair space remains unambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import materialize, spread
from geoparquet_python_spark.functions.text import tokens
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_ROUNDS = 3


def _merge_round(seq: DataFrame, rnd: int) -> tuple[DataFrame, DataFrame]:
    """One BPE round over seq(doc_id, p, w): returns (new_seq, stats).

    stats is one row: (round, merged_l, merged_r, n_pair, n_merged).
    """
    wdoc = Window.partitionBy("doc_id").orderBy("p")
    pr = seq.withColumn("wn", F.lead("w").over(wdoc))
    counts = (
        pr.where(F.col("wn").isNotNull())
        .groupBy("w", "wn")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    top = (
        counts.orderBy(F.desc("n_pair"), "w", "wn")
        .limit(1)
        .select(
            F.col("w").alias("m1"),
            F.col("wn").alias("m2"),
            F.col("n_pair").alias("n_pair"),
        )
    )
    c = pr.crossJoin(F.broadcast(top)).withColumn(
        "cand",
        F.coalesce(
            (F.col("w") == F.col("m1")) & (F.col("wn") == F.col("m2")),
            F.lit(False),
        ),
    )
    run = F.col("p") - F.sum(F.col("cand").cast("int")).over(
        wdoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = c.withColumn("ik", run)
    woff = Window.partitionBy("doc_id", "cand", "ik").orderBy("p")
    e = d.withColumn("off", F.row_number().over(woff) - 1)
    f = e.withColumn(
        "merge_at", F.col("cand") & (F.col("off") % 2 == 0)
    ).withColumn(
        "dropped",
        F.coalesce(F.lag("merge_at").over(wdoc), F.lit(False)),
    )
    stats = (
        f.agg(
            F.sum(F.col("merge_at").cast("bigint")).alias("n_merged"),
            F.min("m1").alias("merged_l"),
            F.min("m2").alias("merged_r"),
            F.min("n_pair").alias("n_pair"),
        )
        .select(
            F.lit(rnd).cast("bigint").alias("round"),
            "merged_l",
            "merged_r",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            "n_merged",
        )
    )
    new_seq = (
        f.where(~F.col("dropped"))
        .select(
            "doc_id",
            F.row_number().over(wdoc).cast("bigint").alias("p"),
            F.when(
                F.col("merge_at"), F.concat_ws(" ", "w", "wn")
            ).otherwise(F.col("w")).alias("w"),
        )
    )
    return new_seq, stats


def _sql_round(t: int) -> str:
    """DuckDB mirror of one round: seq{t} -> stat{t}, seq{t+1}."""
    return f"""pr{t} AS (
      SELECT doc_id, p, w,
             lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS wn
      FROM seq{t}
    ),
    top{t} AS (
      SELECT w AS m1, wn AS m2, COUNT(*) AS n_pair
      FROM pr{t} WHERE wn IS NOT NULL
      GROUP BY w, wn
      ORDER BY n_pair DESC, m1, m2 LIMIT 1
    ),
    c{t} AS (
      SELECT s.doc_id, s.p, s.w, s.wn, t.m1, t.m2, t.n_pair,
             COALESCE(s.w = t.m1 AND s.wn = t.m2, FALSE) AS cand
      FROM pr{t} s CROSS JOIN top{t} t
    ),
    d{t} AS (
      SELECT *,
             p - SUM(CASE WHEN cand THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY p
                         ROWS UNBOUNDED PRECEDING) AS ik
      FROM c{t}
    ),
    e{t} AS (
      SELECT *,
             row_number() OVER (PARTITION BY doc_id, cand, ik
                                ORDER BY p) - 1 AS off
      FROM d{t}
    ),
    f{t} AS (
      SELECT *,
             (cand AND off % 2 = 0) AS merge_at,
             COALESCE(lag(cand AND off % 2 = 0)
                        OVER (PARTITION BY doc_id ORDER BY p),
                      FALSE) AS dropped
      FROM e{t}
    ),
    stat{t} AS (
      SELECT CAST({t} AS BIGINT) AS round,
             MIN(m1) AS merged_l, MIN(m2) AS merged_r,
             CAST(MIN(n_pair) AS BIGINT) AS n_pair,
             CAST(SUM(CASE WHEN merge_at THEN 1 ELSE 0 END) AS BIGINT)
               AS n_merged
      FROM f{t}
    ),
    seq{t + 1} AS (
      SELECT doc_id,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY p)
                  AS BIGINT) AS p,
             CASE WHEN merge_at THEN w || ' ' || wn ELSE w END AS w
      FROM f{t} WHERE NOT dropped
    )"""


_SQL_BPE = (
    """
    seq0 AS (
      SELECT doc_id,
             CAST(generate_subscripts(str_split(text, ' '), 1) AS BIGINT)
               AS p,
             unnest(str_split(text, ' ')) AS w
      FROM documents
    ),
    """
    + ",\n    ".join(_sql_round(t) for t in range(_ROUNDS))
)


@query(
    "q_bpe_merge_rounds",
    oracle=f"""
    WITH {_SQL_BPE}
    {" UNION ALL ".join(f"SELECT * FROM stat{t}" for t in range(_ROUNDS))}
    ORDER BY round
    """,
)
def q_bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first {_ROUNDS} BPE merges learned from the corpus: per
    round, the winning pair, its pre-merge adjacency count, and how
    many occurrences actually merged (fewer than the count exactly
    when the pair is doubled and overlaps resolve left-to-right —
    the "a a a" → "(a a) a" rule)."""
    d = load_table(spark, sf_dir, "documents")
    seq = (
        spread(d.select("doc_id", tokens("text").alias("toks")))
        .select("doc_id", F.posexplode("toks").alias("i", "w"))
        .select(
            "doc_id", (F.col("i") + 1).cast("bigint").alias("p"), "w"
        )
    )
    stats = []
    for t in range(_ROUNDS):
        seq, st = _merge_round(seq, t)
        # Materialize the re-sequenced corpus between rounds: round
        # t+1 reads seq twice (pair counts + merge application), and
        # without a barrier each read re-executes every prior round's
        # window chain — multiplicative in rounds. A production BPE
        # trainer checkpoints the re-paired corpus each pass for the
        # same reason.
        seq = materialize(seq)
        stats.append(st)
    out = stats[0]
    for st in stats[1:]:
        out = out.unionAll(st)
    return out.orderBy("round")


@query(
    "q_bpe_compression_stats",
    oracle=f"""
    WITH {_SQL_BPE},
    before AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n0 FROM seq0 GROUP BY doc_id
    ),
    after AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n{_ROUNDS}
      FROM seq{_ROUNDS} GROUP BY doc_id
    )
    SELECT d.lang,
           CAST(SUM(b.n0) AS BIGINT) AS tokens_before,
           CAST(SUM(a.n{_ROUNDS}) AS BIGINT) AS tokens_after,
           CAST((SUM(b.n0) - SUM(a.n{_ROUNDS})) * 1000000 // SUM(b.n0)
                AS BIGINT) AS saved_micro
    FROM documents d
    JOIN before b ON b.doc_id = d.doc_id
    JOIN after a ON a.doc_id = d.doc_id
    GROUP BY d.lang
    ORDER BY d.lang
    """,
)
def q_bpe_compression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the learned merges BUY: per-language corpus token counts
    before and after applying the {_ROUNDS} merges, with the saving in
    exact micro-units — the sequence-length-reduction metric that
    justifies a tokenizer (shorter sequences = fewer training FLOPs
    at identical content). Reuses the full merge chain; the only
    additions are two doc-keyed counts and a lang rollup."""
    d = load_table(spark, sf_dir, "documents")
    seq = (
        spread(d.select("doc_id", tokens("text").alias("toks")))
        .select("doc_id", F.posexplode("toks").alias("i", "w"))
        .select("doc_id", (F.col("i") + 1).cast("bigint").alias("p"), "w")
    )
    before = seq.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n0")
    )
    for t in range(_ROUNDS):
        seq, _ = _merge_round(seq, t)
        seq = materialize(seq)
    after = seq.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("nN")
    )
    return (
        d.select("doc_id", "lang")
        .join(before, "doc_id")
        .join(after, "doc_id")
        .groupBy("lang")
        .agg(
            F.sum("n0").cast("bigint").alias("tokens_before"),
            F.sum("nN").cast("bigint").alias("tokens_after"),
        )
        .select(
            "lang",
            "tokens_before",
            "tokens_after",
            F.expr(
                "CAST((tokens_before - tokens_after) * 1000000"
                " DIV tokens_before AS BIGINT)"
            ).alias("saved_micro"),
        )
        .orderBy("lang")
    )
