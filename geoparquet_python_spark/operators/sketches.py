"""Count-min sketch: sub-linear-memory frequency estimation for
heavy-hitter queries over unbounded term streams.

Spark ships HLL (count-distinct) but no CMS; this builds one as a
plain aggregate — which is exactly why CMS works at 100 TB: the
sketch is a (depth x width) integer matrix, each cell a SUM, so the
map-side partial aggregates ARE partial sketches and the shuffle
merges them cell-wise (CMS is a linear sketch: merge = matrix add).
Memory is depth*width ints regardless of vocabulary size, vs the
vocabulary-sized exact frequency table.

The hash family is the same Kirsch-Mitzenmacher double hashing as the
MinHash signatures (h1 + j*h2 from ONE md5, [[spark-duckdb-oracle-
determinism]]), so the whole sketch is deterministic and the DuckDB
oracle reproduces it cell-for-cell — the estimate column is exact on
both engines, and est >= true (CMS never underestimates) is asserted
in the output itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.text import SQL_MD5_LONG, md5_long, tokens
from geoparquet_python_spark.functions.exact import broadcast_narrow, materialize
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_W = 1024  # sketch width (buckets per row)
_D = 4  # sketch depth (hash functions)
_TOP = 20

# h2: md5 hex chars 16-29 (56 bits) — j*h2 + h1 stays < 2^63 for j<4.
_SQL_H2 = "CAST(('0x' || substr(md5({expr}), 16, 14)) AS BIGINT)"


def _h2(col):
    return F.conv(F.substring(F.md5(col), 16, 14), 16, 10).cast("long")


@query(
    "q_countmin_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(str_split(text, ' ')) AS term FROM documents
    ),
    hashed AS (
      SELECT term, {SQL_MD5_LONG.format(expr="term")} AS h1,
             {_SQL_H2.format(expr="term")} AS h2
      FROM tok
    ),
    cells AS (
      SELECT j, (h1 + j * h2) % {_W} AS bucket, COUNT(*) AS cnt
      FROM hashed, (SELECT unnest(range({_D})) AS j)
      GROUP BY 1, 2
    ),
    freq AS (SELECT term, COUNT(*) AS true_count FROM tok GROUP BY term),
    top AS (
      SELECT term, true_count FROM freq
      ORDER BY true_count DESC, term LIMIT {_TOP}
    ),
    probes AS (
      SELECT t.term, t.true_count, j.j,
             ({SQL_MD5_LONG.format(expr="t.term")}
               + j.j * {_SQL_H2.format(expr="t.term")}) % {_W} AS bucket
      FROM top t, (SELECT unnest(range({_D})) AS j) j
    )
    SELECT p.term,
           CAST(p.true_count AS BIGINT) AS true_count,
           CAST(MIN(c.cnt) AS BIGINT) AS est_count
    FROM probes p JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
    GROUP BY p.term, p.true_count
    ORDER BY true_count DESC, term
    """,
)
def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True top-{_TOP} terms with their count-min estimates
    (depth {_D} x width {_W}): est_count = min over rows of the
    sketch cell each hash lands in; est >= true by construction, and
    the gap audits the sketch's collision error at this width.

    Build: one explode x depth -> ({_D}*{_W})-key SUM aggregate (the
    mergeable sketch). Probe: the top-term list is tiny -> its probes
    broadcast against the sketch cells; min per term. The exact freq
    table exists here only to pick/verify the heavy hitters — a pure
    production pass keeps ONLY the sketch."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens("text")).alias("term"))
    hashed = tok.select(
        "term", md5_long(F.col("term")).alias("h1"), _h2(F.col("term")).alias("h2")
    )
    cells = (
        hashed.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, {_D - 1}), "
                    f"j -> struct(CAST(j AS BIGINT) AS j, "
                    f"(h1 + j * h2) % {_W} AS bucket))"
                )
            ).alias("c")
        )
        .select(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    freq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    top = freq.orderBy(F.col("true_count").desc(), "term").limit(_TOP)
    probes = top.select(
        "term",
        "true_count",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_D - 1}), j -> struct("
                f"CAST(j AS BIGINT) AS j, "
                f"(CAST(conv(substring(md5(term), 1, 15), 16, 10) AS BIGINT) "
                f" + j * CAST(conv(substring(md5(term), 16, 14), 16, 10) AS BIGINT)"
                f") % {_W} AS bucket))"
            )
        ).alias("p"),
    ).select(
        "term", "true_count", F.col("p.j").alias("j"), F.col("p.bucket").alias("bucket")
    )
    return (
        broadcast_narrow(probes)
        .join(cells, ["j", "bucket"])
        .groupBy("term", "true_count")
        .agg(F.min("cnt").alias("est_count"))
        .orderBy(F.col("true_count").desc(), "term")
    )


# ---------------------------------------------------------------------------
# GK-style quantile sketch certification (the C5 approx path, made
# self-certifying the same way as the HLL query q_approx_distinct_parts)
# ---------------------------------------------------------------------------

_ACC = 1000  # approx_percentile accuracy => rank error <= n/_ACC
_QTILES = [0.5, 0.9, 0.99]


@query(
    "q_approx_percentile_certified",
    oracle=f"""
    WITH per_v AS (
      SELECT l_returnflag AS flag, l_extendedprice AS val,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT flag, val,
             CAST(SUM(cnt) OVER (PARTITION BY flag ORDER BY val
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS crun
      FROM per_v
    ),
    nn AS (
      SELECT flag, CAST(SUM(cnt) AS BIGINT) AS n FROM per_v GROUP BY flag
    ),
    qs AS (
      SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in _QTILES)}])
        AS qtile
    ),
    tall AS (
      SELECT cum.flag, cum.val, cum.crun, nn.n, qs.qtile
      FROM cum JOIN nn ON cum.flag = nn.flag CROSS JOIN qs
    ),
    sel AS (
      SELECT flag AS l_returnflag, qtile, n,
             MIN(CASE WHEN crun >= CAST(ceil(qtile * n) AS BIGINT)
                      THEN val END) AS exact_val
      FROM tall GROUP BY flag, qtile, n
    )
    SELECT l_returnflag, qtile, n,
           CAST(exact_val AS DOUBLE) AS exact_val,
           TRUE AS within_rank_bound
    FROM sel ORDER BY l_returnflag, qtile
    """,
)
def q_approx_percentile_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via Spark's built-in Greenwald-Khanna
    sketch (`approx_percentile`, accuracy {_ACC} => rank error
    <= n/{_ACC}), SELF-CERTIFYING like the HLL query: the sketch's
    answer can never hash-match DuckDB (different sketch), so the
    plan emits the EXACT ceil-rank percentile (oracle-matchable) plus
    an in-plan boolean asserting the sketch value lies between the
    exact order statistics at ranks ceil((q -/+ 1/{_ACC})·n) — the
    GK guarantee itself. A sketch drifting past its deterministic
    rank bound turns the row into a hash MISMATCH instead of an
    unchecked estimate.

    Scale shape: the sketch is THE 100 TB quantile path — a bounded
    O(1/eps · log(eps·n)) buffer that merges associatively, so the
    map-side partials are partial sketches and no global sort ever
    happens. The exact legs (certificate only) run on the DISTINCT
    (flag, value) frame — one map-combinable aggregation, then the
    house TWO-PHASE rank (value-bucket shards -> shard-count offsets
    -> per-shard cumulative window), so the cumulative count has
    parallelism = flags x value buckets, not |flags| single-partition
    windows. The oracle keeps the plain per-flag window (fine
    single-node)."""
    li = load_table(spark, sf_dir, "lineitem")
    # Optimization r12 (guide §2.4): the distinct-value frame feeds
    # FOUR consumers (the shard sizes, the per-shard cumulative
    # window, the per-flag totals, and — through them — the
    # certificate join); unmaterialized, each branch re-ran the
    # lineitem scan + the (flag, val) aggregation, so one query paid
    # four corpus passes plus the sketch pass. materialize pins the
    # aggregation's output (the distinct-value frame — orders smaller
    # than the corpus) so the exact legs cost ONE corpus pass total;
    # the GK sketch leg keeps its own (second, and last) pass.
    per_v = materialize(
        li.groupBy(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").alias("val"),
        ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    sh = per_v.withColumn(
        "vshard", F.expr("CAST(floor(val / 1024.0) AS BIGINT)")
    )
    sizes = sh.groupBy("flag", "vshard").agg(F.sum("cnt").alias("scnt"))
    woff = (
        Window.partitionBy("flag")
        .orderBy("vshard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.select(
        "flag",
        "vshard",
        F.coalesce(F.sum("scnt").over(woff), F.lit(0).cast("bigint")).alias(
            "offset"
        ),
    )
    wrun = (
        Window.partitionBy("flag", "vshard")
        .orderBy("val")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        sh.withColumn("run", F.sum("cnt").over(wrun))
        .join(broadcast_narrow(offsets), ["flag", "vshard"])
        .select(
            "flag",
            "val",
            (F.col("offset") + F.col("run")).cast("bigint").alias("crun"),
        )
    )
    nn = per_v.groupBy("flag").agg(F.sum("cnt").cast("bigint").alias("n"))
    qs = spark.createDataFrame([(q,) for q in _QTILES], "qtile double")
    tall = cum.join(broadcast_narrow(nn), "flag").crossJoin(
        broadcast_narrow(qs)
    )
    err = 1.0 / _ACC
    sel = tall.groupBy(F.col("flag").alias("l_returnflag"), "qtile", "n").agg(
        F.min(
            F.expr("CASE WHEN crun >= CAST(ceil(qtile * n) AS BIGINT)"
                   " THEN val END")
        ).alias("exact_val"),
        F.min(
            F.expr(
                f"CASE WHEN crun >= greatest(1L,"
                f" CAST(floor((qtile - {err}) * n) AS BIGINT)) THEN val END"
            )
        ).alias("vlo"),
        F.min(
            F.expr(
                f"CASE WHEN crun >= least(n,"
                f" CAST(ceil((qtile + {err}) * n) AS BIGINT)) THEN val END"
            )
        ).alias("vhi"),
    )
    est = (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice,"
                f" array({', '.join(str(q) for q in _QTILES)}), {_ACC})"
            ).alias("e")
        )
        .select(
            "flag",
            F.explode(
                F.expr(
                    "arrays_zip(array("
                    + ", ".join(f"CAST({q} AS DOUBLE)" for q in _QTILES)
                    + "), e)"
                )
            ).alias("z"),
        )
        .select(
            "flag", F.col("z.0").alias("qtile"), F.col("z.e").alias("est")
        )
    )
    return (
        sel.join(
            est,
            (sel.l_returnflag == est.flag) & (sel.qtile == est.qtile),
        )
        .select(
            "l_returnflag",
            sel.qtile.alias("qtile"),
            "n",
            F.col("exact_val").cast("double").alias("exact_val"),
            (
                (F.col("est") >= F.col("vlo")) & (F.col("est") <= F.col("vhi"))
            ).alias("within_rank_bound"),
        )
        .orderBy("l_returnflag", "qtile")
    )
