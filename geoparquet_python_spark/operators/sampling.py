"""Deterministic dataset splitting & sampling (SURVEY.md §2.F
training-pipeline closure).

A 100 TB training pipeline needs REPRODUCIBLE splits and samples:
`df.sample()` / `rand()` are seed-and-partitioning dependent, so a
retry or a repartition silently reshuffles the split. The robust form
is content-addressed: bucket = md5(stable id) mod 100, then assign by
bucket range. Every engine that can md5 a string computes the same
assignment — which also makes it oracle-checkable row-for-row, and at
scale means a re-run of a failed stage cannot leak val docs into train.

No reference equivalent (the reference delegates analytics to pandas;
see SURVEY.md §0 provenance) — this is [N] north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import broadcast_narrow, materialize
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query


def hash_bucket(col, buckets: int = 100):
    """Deterministic bucket in [0, buckets) from the md5 of a column's
    string form. 16 hex chars = 64 bits, but conv() returns signed —
    use 4 hex chars (16 bits, unsigned-safe) like the SQL mirror.

    The 16-bit domain is for SMALL, fixed bucket counts (percent-style
    splits, buckets ≤ ~1000, where the mod bias is ≤1.6%). For a
    modulus that scales with data size — packing shards — use
    hash_bucket_wide: 16 bits saturate at 65536 buckets."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
        .cast("int")
        % buckets
    )


def sql_hash_bucket(expr: str, buckets: int = 100) -> str:
    return (
        f"(CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 4)) AS INT)"
        f" % {buckets})"
    )


def hash_bucket_wide(col, buckets) -> "F.Column":
    """Deterministic bucket in [0, buckets) from 60 bits of md5 —
    the scale-proof variant for data-sized moduli (packing shards:
    shard_count grows with the corpus, so a 16-bit hash would leave
    every shard ≥ 65536 permanently empty and cap parallelism at ~4.2M
    docs). 15 hex chars = 60 bits < 63, so the signed BIGINT conv is
    non-negative and plain % stays in range; mod bias at 2^60 is
    negligible for any realistic shard count. Mirrors md5_long
    (functions/text.py) and sql_hash_bucket_wide exactly."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("long")
        % buckets
    )


def sql_hash_bucket_wide(expr: str, buckets) -> str:
    return (
        f"(CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" % {buckets})"
    )


# Shard count scales with corpus size: ceil(n_docs / _DOCS_PER_SHARD),
# floored at _MIN_SHARDS. A fixed shard count would pin per-shard
# parallelism (8 tasks doing ALL the packing at 100 TB); this formula
# keeps each group ~_DOCS_PER_SHARD docs no matter the scale, so
# parallelism grows linearly with input. The doc count feeding it
# comes from Parquet footer metadata on the driver (io.parquet_row_count
# — zero Spark jobs; a count()-before-plan at 100 TB is an extra table
# pass), and the shard bucket uses the 60-bit hash (hash_bucket_wide —
# a 16-bit hash would cap effective parallelism at 65536 shards). The
# SAME formula is embedded in each oracle as a scalar subquery over
# `documents`, so Spark and DuckDB always agree on the shard domain at
# any sf. Consumers: packing.py (next-fit / curriculum / batching) and
# q_global_sample_index below.
_DOCS_PER_SHARD = 64
_MIN_SHARDS = 4


def shard_count(n_docs: int) -> int:
    """max(_MIN_SHARDS, ceil(n_docs / _DOCS_PER_SHARD))."""
    import math

    return max(_MIN_SHARDS, math.ceil(n_docs / _DOCS_PER_SHARD))


# SQL mirror of shard_count(): a scalar subquery usable as the modulus
# of sql_hash_bucket. Kept out of window PARTITION BY clauses (computed
# once in a CTE column instead).
_SQL_N_SHARDS = (
    f"(SELECT GREATEST({_MIN_SHARDS}, "
    f"CAST(CEIL(COUNT(*) * 1.0 / {_DOCS_PER_SHARD}) AS INT)) FROM documents)"
)


_B = sql_hash_bucket("doc_id")


@query(
    "q_hash_split_stats",
    oracle=f"""
    SELECT CASE WHEN {_B} < 80 THEN 'train'
                WHEN {_B} < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY 1
    ORDER BY split
    """,
)
def q_hash_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by md5(doc_id) bucket, with
    per-split corpus stats. The assignment is a pure projection (no
    shuffle); only the 3-group stats aggregate shuffles. Adding data
    never moves an existing doc between splits."""
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    )
    return (
        d.select(split, "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


@query(
    "q_stratified_sample_rates",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_total,
           SUM(CASE WHEN {_B} < (CASE WHEN lang = 'en' THEN 10 ELSE 50 END)
                    THEN 1 ELSE 0 END)::BIGINT AS n_sampled
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q_stratified_sample_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: downsample the dominant
    language to 10%, keep 50% of the rest (the rebalancing move every
    corpus-mixing pipeline makes). Membership is the same md5 bucket as
    the split op, so the sample is stable under retries/repartitions;
    counting sampled vs total per stratum verifies the realized rates."""
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    rate = F.when(F.col("lang") == "en", 10).otherwise(50)
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(b < rate, 1).otherwise(0)).alias("n_sampled"),
        )
        .orderBy("lang")
    )


@query(
    "q_domain_mixture_resample",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_total,
           SUM(CASE WHEN {_B} < 25 * ((CAST(substr(source, 4) AS INT) % 4) + 1)
                    THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           CAST((CAST(substr(source, 4) AS INT) % 4) + 1 AS DOUBLE) / 4
             AS target_rate
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q_domain_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: each source gets a target sampling
    rate (here derived from the source id: 25/50/75/100%; in production
    a small weights table joined by broadcast), membership decided by
    the same content-addressed md5 bucket as the split op.

    The keep/drop decision is a stateless per-row projection — the
    actual resampled corpus is a map-only `.where(...)` with no
    shuffle at any scale; this audit query adds one 20-key aggregate
    (map-side combined) to verify realized vs target rates.
    """
    d = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    m = F.expr("CAST(substring(source, 4) AS INT) % 4")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(b < 25 * (m + 1), 1).otherwise(0)).alias("n_kept"),
        )
        .select(
            "source",
            "n_total",
            "n_kept",
            ((m + 1).cast("double") / 4).alias("target_rate"),
        )
        .orderBy("source")
    )


@query(
    "q_train_order_sample",
    oracle=f"""
    SELECT doc_id, shuffle_key, rank FROM (
      SELECT doc_id,
             {sql_hash_bucket("doc_id", 65536)} AS shuffle_key,
             row_number() OVER (
               ORDER BY {sql_hash_bucket("doc_id", 65536)}, doc_id
             ) AS rank
      FROM documents
    )
    WHERE rank <= 50
    ORDER BY rank
    """,
)
def q_train_order_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: order the corpus
    by a content-addressed hash key (md5 bucket, ties by doc_id) and
    take the first 50 — the reproducible alternative to
    `orderBy(rand())` that survives retries and re-runs byte-for-byte
    (16-bit key space; ties resolve by doc_id, still a total order).

    The top-50 plans as TakeOrderedAndProject (per-partition heaps +
    driver merge), so sampling the head of the shuffle order never
    global-sorts. The full training-order MATERIALIZATION at 100 TB
    is `repartitionByRange(shuffle_key).sortWithinPartitions(
    shuffle_key, doc_id)` + write — one range shuffle, and every
    epoch reader sees the same order.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    key = hash_bucket(F.col("doc_id"), 65536)  # full 16-bit md5 prefix
    return (
        d.select("doc_id", key.alias("shuffle_key"))
        .orderBy("shuffle_key", "doc_id")
        .limit(50)
        .withColumn(
            "rank", F.row_number().over(Window.orderBy("shuffle_key", "doc_id"))
        )
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# F6: weighted sample (Efraimidis-Spirakis priority sampling, A-ES)
# --------------------------------------------------------------------------

from pyspark.sql import Window  # noqa: E402

from geoparquet_python_spark.functions.text import SQL_MD5_LONG, md5_long  # noqa: E402

_WS_K = 100
SQL_MD5_LONG_DOC = SQL_MD5_LONG.format(expr="CAST(doc_id AS VARCHAR)")


@query(
    "q_weighted_priority_sample",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, lang, n_chars,
             CAST(round((ln((({SQL_MD5_LONG_DOC} ) + 1.0)
                            / {float((1 << 60) + 1)})
                         / greatest(n_chars, 1)) * 1000000) AS BIGINT)
               AS priority_micro
      FROM documents
    )
    SELECT row_number() OVER (ORDER BY priority_micro DESC, doc_id)
             AS rank,
           doc_id, lang, n_chars, priority_micro
    FROM pri
    ORDER BY priority_micro DESC, doc_id
    LIMIT {_WS_K}
    """,
)
def q_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted random sample without replacement, deterministic:
    Efraimidis-Spirakis priority sampling — each doc gets key
    u^(1/w) for u ~ U(0,1), and the k largest keys are a weighted
    sample. Ranking on ln(u)/w (monotone in the key) avoids pow();
    u comes from the 60-bit md5 of doc_id, so the sample is
    content-addressed: retries, repartitions, and incremental corpus
    growth never reshuffle previously-sampled membership (the same
    contract as q_hash_split_stats). Weight = n_chars: longer docs
    proportionally likelier — the "sample by token budget" shape.

    Shape: one map-only projection + a distributed top-k
    (TakeOrderedAndProject) — no shuffle of the corpus at any size.
    The per-doc ln is rounded to 1e-6 and compared as int64 with a
    doc_id tie-break, the same cross-engine transcendental treatment
    as q_unigram_logprob.
    """
    d = load_table(spark, sf_dir, "documents")
    u = (md5_long(F.col("doc_id").cast("string")) + F.lit(1.0)) / F.lit(
        float((1 << 60) + 1)
    )
    # greatest(n_chars, 1): an empty document (n_chars = 0 is legal
    # corpus content — see tests' edge-doc fixture) must not divide by
    # zero; ln(u)/0 would yield -inf/NaN with engine-divergent BIGINT
    # casts between Spark and DuckDB. Clamping to 1 gives empties the
    # minimum weight, identically on both sides.
    pri = F.round(
        (F.log(u) / F.greatest(F.col("n_chars"), F.lit(1))) * 1e6
    ).cast("bigint")
    # Distributed top-k (orderBy+limit => TakeOrderedAndProject — per-
    # partition heaps, no global sort); the row_number window then runs
    # over the k-row RESULT frame only, never the corpus.
    top = (
        d.select("doc_id", "lang", "n_chars", pri.alias("priority_micro"))
        .orderBy(F.col("priority_micro").desc(), "doc_id")
        .limit(_WS_K)
    )
    w = Window.orderBy(F.col("priority_micro").desc(), F.col("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "lang", "n_chars", "priority_micro")
        .orderBy(F.col("priority_micro").desc(), "doc_id")
    )


# --------------------------------------------------------------------------
# F6b: temperature-scaled language-mixture weights (UniMax/mT5 style)
# --------------------------------------------------------------------------

_MIX_BUDGET = 1_000_000_000  # token budget the weights allocate


@query(
    "q_mixture_temperature_weights",
    oracle=f"""
    WITH per_lang AS (
      SELECT lang, CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per_lang),
    s AS (
      SELECT p.lang, p.n_tokens, t.total,
             CAST(round(sqrt(p.n_tokens * 1.0 / t.total) * 1000000)
                  AS BIGINT) AS s_fp
      FROM per_lang p CROSS JOIN tot t
    ),
    den AS (SELECT CAST(SUM(s_fp) AS BIGINT) AS denom FROM s)
    SELECT s.lang AS lang,
           s.n_tokens AS n_tokens,
           (s.n_tokens * 1000000) // s.total AS natural_ppm,
           (s.s_fp * 1000000) // d.denom AS weight_ppm,
           (s.s_fp * {_MIX_BUDGET}) // d.denom AS alloc_tokens
    FROM s CROSS JOIN den d
    ORDER BY lang
    """,
)
def q_mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language-mixture weights (the mT5/UniMax
    rebalancing: sample language l proportional to p_l^(1/T)): per-lang
    token counts give natural proportions p_l; at T = 2 the sampling
    weight is sqrt(p_l) normalized — low-resource languages are
    up-sampled, head languages down-sampled — and the query also
    allocates a 1e9-token training budget under those weights. The
    companion to q_domain_mixture_resample (which APPLIES rates
    content-addressed); this computes the principled rates.

    T = 2 is deliberate: sqrt is IEEE-correctly-rounded in both
    engines, so sqrt(p_l) is bit-exact cross-engine with no
    transcendental drift (a general p^1/T would ride the exp/ln
    rounding convention instead). Normalization avoids double-sum
    order-dependence entirely: sqrt values round to 1e-6 fixed point
    FIRST, the denominator is an exact int64 sum, and weights/
    allocations are integer divisions (DIV == DuckDB //).

    Scale shape: one lang-keyed aggregate with full map-side combine
    (the only corpus pass), then two one-row broadcasts (total,
    denominator) over the |langs|-row frame — nothing driver-sized,
    no window, no shuffle beyond the |langs|-key aggregate."""
    d = load_table(spark, sf_dir, "documents")
    per_lang = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens")
    )
    tot = per_lang.agg(F.sum("n_tokens").cast("bigint").alias("total"))
    s = per_lang.crossJoin(broadcast_narrow(tot)).select(
        "lang",
        "n_tokens",
        "total",
        F.round(
            F.sqrt(F.col("n_tokens") * F.lit(1.0) / F.col("total")) * 1e6
        )
        .cast("bigint")
        .alias("s_fp"),
    )
    den = s.agg(F.sum("s_fp").cast("bigint").alias("denom"))
    return (
        s.crossJoin(broadcast_narrow(den))
        .select(
            "lang",
            "n_tokens",
            F.expr("n_tokens * 1000000 DIV total").alias("natural_ppm"),
            F.expr("s_fp * 1000000 DIV denom").alias("weight_ppm"),
            F.expr(f"s_fp * {_MIX_BUDGET} DIV denom").alias("alloc_tokens"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# F6c: quality-ranked token-budget selection (two-phase cutoff)
# --------------------------------------------------------------------------

_QB_WIDTH = 10_000  # quality_fp micro-units per coarse bucket (<=101 buckets)


@query(
    "q_token_budget_selection",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(str_split(text, ' '))) * 1000000
                  // len(str_split(text, ' ')) AS BIGINT) AS quality_fp
      FROM documents
    ),
    b AS (SELECT CAST(SUM(n_tokens) * 2 // 5 AS BIGINT) AS budget FROM t),
    sel AS (
      SELECT t.*,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY quality_fp DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM t
    )
    SELECT doc_id, lang, quality_fp, n_tokens
    FROM sel CROSS JOIN b
    WHERE cum_before < b.budget
    ORDER BY doc_id
    """,
)
def q_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked corpus selection under a token budget: order docs
    by (type-token-ratio quality DESC, doc_id), keep each doc while
    the tokens BEFORE it total less than the budget (40% of corpus
    tokens — data-derived so the query is scale-invariant). The "fill
    the training budget with the best data first" curation op.

    The oracle is the obvious global cumulative-sum window — which is
    exactly the plan you must NOT run at 100 TB (one unpartitioned
    corpus-wide sort+window task). The engine runs the distributed
    TWO-PHASE CUTOFF instead:

    1. map-only scoring, then a <=101-key coarse-bucket aggregate
       (quality_fp DIV {_QB_WIDTH}) with full map-side combine;
    2. a cumulative window over the <=101 BUCKET rows (post-agg frame
       — the plan-guarded exception) classifies each bucket as fully
       in (cum_before + btok <= budget), fully out (cum_before >=
       budget), or THE boundary bucket (at most one, by
       monotonicity);
    3. only the boundary bucket's docs get a per-doc running-sum
       window (partitioned on the bucket key), offset by the bucket's
       cum_before.

    The corpus-wide work is one aggregate and one semi-join; the only
    per-doc window runs over a single bucket's docs. Caveat at scale:
    a degenerate score distribution can make the boundary bucket
    corpus-sized — production refines with a second bucket digit
    (same two-phase step recursively) before falling back to a sort;
    the coarse width here already bounds the boundary at ~1% of the
    score range."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    t = materialize(
        d.select(
            "doc_id",
            "lang",
            F.size(toks).cast("bigint").alias("n_tokens"),
            (F.size(F.array_distinct(toks)) * F.lit(1_000_000))
            .cast("bigint")
            .alias("nd_scaled"),
        ).select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr("nd_scaled DIV n_tokens").alias("quality_fp"),
        )
    )
    budget = t.agg(
        F.expr("CAST(SUM(n_tokens) * 2 DIV 5 AS BIGINT)").alias("budget")
    )
    t2 = t.withColumn("qb", F.expr(f"quality_fp DIV {_QB_WIDTH}"))
    buckets = t2.groupBy("qb").agg(F.sum("n_tokens").alias("btok"))
    wb = (
        Window.orderBy(F.col("qb").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # <=101 post-aggregation rows: the plan-guarded global-window
    # exception (same class as q_cumulative_daily_revenue).
    bcum = buckets.withColumn(
        "cum_before_bucket",
        F.coalesce(F.sum("btok").over(wb), F.lit(0).cast("bigint")),
    ).crossJoin(broadcast_narrow(budget))
    full = bcum.where(
        F.col("cum_before_bucket") + F.col("btok") <= F.col("budget")
    ).select("qb")
    boundary = bcum.where(
        (F.col("cum_before_bucket") < F.col("budget"))
        & (F.col("cum_before_bucket") + F.col("btok") > F.col("budget"))
    ).select("qb", "cum_before_bucket", "budget")
    kept_full = t2.join(broadcast_narrow(full), "qb")
    wdoc = (
        Window.partitionBy("qb")
        .orderBy(F.col("quality_fp").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    kept_boundary = (
        t2.join(broadcast_narrow(boundary), "qb")
        .withColumn(
            "cum_in_bucket",
            F.coalesce(F.sum("n_tokens").over(wdoc), F.lit(0).cast("bigint")),
        )
        .where(
            F.col("cum_before_bucket") + F.col("cum_in_bucket")
            < F.col("budget")
        )
        .select("qb", "doc_id", "lang", "n_tokens", "quality_fp")
    )
    return (
        kept_full.select("qb", "doc_id", "lang", "n_tokens", "quality_fp")
        .unionByName(kept_boundary)
        .select("doc_id", "lang", "quality_fp", "n_tokens")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# F6d: global contiguous sample indices (two-phase offsets, no global sort)
# --------------------------------------------------------------------------

@query(
    "q_global_sample_index",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST({sql_hash_bucket_wide("doc_id", _SQL_N_SHARDS)} AS BIGINT)
               AS shard
      FROM documents
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (ORDER BY shard, doc_id) - 1 AS BIGINT)
             AS global_idx
    FROM t
    ORDER BY doc_id
    """,
)
def q_global_sample_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic CONTIGUOUS global sample indices 0..n-1 in
    (shard, doc_id) order — what a training job needs to address
    examples stably across epochs, resumable checkpoints, and
    re-shards (zipWithIndex's job, but content-addressed and
    partitioning-invariant: the index depends only on the data).

    The oracle is the global row_number window — the plan you must
    NOT run at 100 TB (one corpus-wide sort task). The engine uses
    the same TWO-PHASE shape as q_token_budget_selection: per-shard
    counts (map-side combined, shard domain = ceil(n/64) keys),
    exclusive-prefix offsets via a window over the SHARD-COUNT-sized
    aggregate only, then a per-shard (partitioned) row_number joined
    to its shard's offset. No corpus-wide sort or unpartitioned
    window anywhere; the shard count grows with the corpus so the
    per-shard window stays ~64 rows."""
    from geoparquet_python_spark.io import parquet_row_count

    n_shards = shard_count(parquet_row_count(spark, sf_dir, "documents"))
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        hash_bucket_wide(F.col("doc_id"), n_shards)
        .cast("bigint")
        .alias("shard"),
    )
    sizes = d.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    woff = (
        Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "shard",
        F.coalesce(F.sum("n").over(woff), F.lit(0).cast("bigint")).alias(
            "offset"
        ),
    )
    win = Window.partitionBy("shard").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(win).cast("bigint"))
        .join(broadcast_narrow(offsets), "shard")
        .select(
            "doc_id",
            "shard",
            (F.col("offset") + F.col("rn") - 1).alias("global_idx"),
        )
        .orderBy("doc_id")
    )


_QUOTA_N = 8  # docs kept per (lang, source) stratum — below the
# largest sf0.01 stratum (16 docs), so the cutoff is exercised at the
# driver gate scale, not just at sf0.1


@query(
    "q_stratified_quota_sample",
    oracle=f"""
    SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS rn FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (
               PARTITION BY lang, source
               ORDER BY {SQL_MD5_LONG.format(expr="CAST(doc_id AS VARCHAR)")},
                        doc_id) AS rn
      FROM documents
    )
    WHERE rn <= {_QUOTA_N}
    ORDER BY lang, source, rn
    """,
)
def q_stratified_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact N-per-stratum quota sample: the first {N} documents of
    every (lang, source) stratum under a content-addressed order
    (md5 of the doc id) — deterministic under retries and
    repartitioning, and rate-free: every stratum contributes the SAME
    count regardless of its population (the balanced-eval-set /
    per-domain-cap move, where rate-based sampling over- or
    under-fills small strata).

    Scale: declaratively this is row_number() <= N, and Spark inserts
    a WindowGroupLimit below the exchange — each map task keeps only
    its local top-N per stratum BEFORE the shuffle, so a stratum with
    a billion rows ships ~N rows per task, not a billion, and no
    stratum can skew the window stage (plan-asserted in
    tests/test_plans.py)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        md5_long(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang", "source")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .where(F.col("rn") <= _QUOTA_N)
        .orderBy("lang", "source", "rn")
    )


# --------------------------------------------------------------------------
# F6c: per-stratum weighted sample (A-ES keys under a group limit)
# --------------------------------------------------------------------------

_WSS_K = 10  # docs kept per language


@query(
    "q_weighted_stratified_sample",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, lang, n_chars,
             CAST(round((ln((({SQL_MD5_LONG_DOC} ) + 1.0)
                            / {float((1 << 60) + 1)})
                         / greatest(n_chars, 1)) * 1000000) AS BIGINT)
               AS priority_micro
      FROM documents
    )
    SELECT lang, CAST(rank AS BIGINT) AS rank,
           doc_id, n_chars, priority_micro
    FROM (
      SELECT lang, doc_id, n_chars, priority_micro,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY priority_micro DESC, doc_id) AS rank
      FROM pri
    )
    WHERE rank <= {_WSS_K}
    ORDER BY lang, rank
    """,
)
def q_weighted_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample without replacement PER STRATUM: the A-ES
    priority keys of q_weighted_priority_sample (content-addressed
    u^(1/w), w = n_chars, ranked as ln(u)/w in 1e-6 fixed point) under
    a per-language row_number() <= {_WSS_K} — the balanced variant
    where every language contributes exactly k length-weighted docs,
    however skewed the corpus (the global top-k would be dominated by
    the majority language's long documents).

    Scale: the same two-part shape as the quota sample — a map-only
    priority projection, then a lang-keyed window whose rank filter
    compiles to Partial/Final WindowGroupLimit: each map task keeps
    its local top-k per language BEFORE the exchange, so the shuffle
    carries ~k rows per (task, lang) regardless of corpus size, and
    membership is retry/repartition-stable because the priorities are
    content-addressed, never rand()."""
    d = load_table(spark, sf_dir, "documents")
    u = (md5_long(F.col("doc_id").cast("string")) + F.lit(1.0)) / F.lit(
        float((1 << 60) + 1)
    )
    pri = F.round(
        (F.log(u) / F.greatest(F.col("n_chars"), F.lit(1))) * 1e6
    ).cast("bigint")
    w = Window.partitionBy("lang").orderBy(
        F.col("priority_micro").desc(), F.col("doc_id")
    )
    return (
        d.select("doc_id", "lang", "n_chars", pri.alias("priority_micro"))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= _WSS_K)
        .select("lang", "rank", "doc_id", "n_chars", "priority_micro")
        .orderBy("lang", "rank")
    )


# --------------------------------------------------------------------------
# Round-8: epoch-aware repeat planning under a token budget
# --------------------------------------------------------------------------

_EPOCH_CAP_MICRO = 4_000_000  # max 4 epochs per source (micro-units)
_EPOCH_BUDGET_X = 3  # train budget = 3x the corpus (forces repeats)


@query(
    "q_epoch_repeat_plan",
    oracle=f"""
    WITH per_src AS (
      SELECT source,
             CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS avail_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(avail_tokens) AS BIGINT) AS total FROM per_src),
    s AS (
      SELECT p.source, p.avail_tokens, t.total,
             CAST(round(sqrt(p.avail_tokens * 1.0 / t.total) * 1000000)
                  AS BIGINT) AS s_fp
      FROM per_src p CROSS JOIN tot t
    ),
    den AS (SELECT CAST(SUM(s_fp) AS BIGINT) AS denom FROM s),
    plan AS (
      SELECT s.source, s.avail_tokens,
             (s.s_fp * s.total * {_EPOCH_BUDGET_X}) // d.denom AS alloc_tokens
      FROM s CROSS JOIN den d
    )
    SELECT source, avail_tokens, alloc_tokens,
           CAST(LEAST(alloc_tokens * 1000000 // avail_tokens,
                      {_EPOCH_CAP_MICRO}) AS BIGINT) AS epochs_micro,
           CAST(LEAST(alloc_tokens,
                      avail_tokens * {_EPOCH_CAP_MICRO} // 1000000)
                AS BIGINT) AS effective_tokens,
           CAST(alloc_tokens
                - LEAST(alloc_tokens,
                        avail_tokens * {_EPOCH_CAP_MICRO} // 1000000)
                AS BIGINT) AS shortfall_tokens,
           (alloc_tokens * 1000000 > avail_tokens * {_EPOCH_CAP_MICRO})
             AS epoch_capped
    FROM plan
    ORDER BY source
    """,
)
def q_epoch_repeat_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-aware mixture planning — the data-constrained accounting
    (Muennighoff et al. 2023, "Scaling data-constrained language
    models": repeating a source beyond ~4 epochs yields rapidly
    decaying returns): allocate a {_EPOCH_BUDGET_X}x-corpus token
    budget across SOURCES by temperature-scaled weights (T = 2 —
    sqrt is IEEE-exact cross-engine, the q_mixture_temperature_weights
    convention), then convert each source's allocation into a repeat
    factor (micro-epochs), cap it at 4 epochs, and report the
    effective tokens and the shortfall the cap leaves unfilled — the
    number the mixture designer must re-spread over uncapped sources
    or fresh data. Companion to q_mixture_temperature_weights (rates)
    and q_token_budget_selection (which documents to keep): this is
    the REPEAT dimension of the same planning problem.

    Determinism: sqrt rounds to 1e-6 fixed point before the exact
    int64 denominator sum; every downstream number is integer
    multiply/DIV (== DuckDB //, all operands non-negative). Scale
    shape: one source-keyed corpus aggregate with map-side combine,
    then two one-row broadcasts over the |sources|-row frame —
    nothing driver-sized beyond |sources| rows."""
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("avail_tokens")
    )
    tot = per_src.agg(F.sum("avail_tokens").cast("bigint").alias("total"))
    s = per_src.crossJoin(broadcast_narrow(tot)).select(
        "source",
        "avail_tokens",
        "total",
        F.round(
            F.sqrt(F.col("avail_tokens") * F.lit(1.0) / F.col("total")) * 1e6
        )
        .cast("bigint")
        .alias("s_fp"),
    )
    den = s.agg(F.sum("s_fp").cast("bigint").alias("denom"))
    plan = s.crossJoin(broadcast_narrow(den)).select(
        "source",
        "avail_tokens",
        F.expr(f"s_fp * total * {_EPOCH_BUDGET_X} DIV denom").alias(
            "alloc_tokens"
        ),
    )
    cap_tokens = f"avail_tokens * {_EPOCH_CAP_MICRO} DIV 1000000"
    return plan.select(
        "source",
        "avail_tokens",
        "alloc_tokens",
        F.expr(
            f"CAST(LEAST(alloc_tokens * 1000000 DIV avail_tokens, "
            f"{_EPOCH_CAP_MICRO}) AS BIGINT)"
        ).alias("epochs_micro"),
        F.expr(f"CAST(LEAST(alloc_tokens, {cap_tokens}) AS BIGINT)").alias(
            "effective_tokens"
        ),
        F.expr(
            f"CAST(alloc_tokens - LEAST(alloc_tokens, {cap_tokens}) AS BIGINT)"
        ).alias("shortfall_tokens"),
        F.expr(
            f"alloc_tokens * 1000000 > avail_tokens * {_EPOCH_CAP_MICRO}"
        ).alias("epoch_capped"),
    ).orderBy("source")
