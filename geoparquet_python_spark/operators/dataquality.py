"""Declarative data-quality report over the star schema (the
Deequ/dbt-test category: the checks a pipeline runs before it trusts a
snapshot).

One row per check: (table_name, check, n_rows, n_violations, passed).
Check classes covered: key uniqueness, not-null, value range,
referential integrity (FK containment via anti-join), and non-empty
content.

No reference equivalent (SURVEY.md §0 provenance) — [N] north-star
scope.

Scale shape (100 TB lens):
- All same-table checks fold into ONE conditional aggregation per
  table (SUM(CASE WHEN violated)) — a single scan produces every
  not-null/range/emptiness count; uniqueness rides the same pass as
  count(*) − count(distinct key).
- Referential integrity is a LEFT ANTI join counted — the FK side
  shuffles once on the key, the PK side broadcasts when dimension-
  sized; no row data survives the join, only the count.
- Everything is integer counts — no float determinism surface at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_ORACLE = """
    WITH checks AS (
      SELECT 'customer' AS table_name, 'unique:c_custkey' AS check_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT)
               AS n_violations
      FROM customer
      UNION ALL
      SELECT 'orders', 'not_null:o_orderdate', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
               AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'orders', 'fk:o_custkey->customer', CAST(COUNT(*) AS BIGINT),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      FROM orders
      UNION ALL
      SELECT 'lineitem', 'fk:l_orderkey->orders', CAST(COUNT(*) AS BIGINT),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
      FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'range:l_discount[0,0.1]', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem', 'range:l_quantity(0,100]', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN l_quantity <= 0 OR l_quantity > 100
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'documents', 'non_empty:text', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'events', 'unique:event_id', CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
      FROM events
    )
    SELECT table_name, check_name, n_rows, n_violations,
           n_violations = 0 AS passed
    FROM checks
    ORDER BY table_name, check_name
"""


@query("q_data_quality_report", oracle=_ORACLE)
def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight checks across five tables in one report frame: key
    uniqueness, not-null, numeric range, FK containment (left-anti
    counted), and non-empty content.

    Same-table checks share one conditional aggregation (a single scan
    per table — the cheapest possible audit); each FK check is an
    anti-join reduced to a count before it ever leaves the join stage.
    """

    def row(table: str, check: str, agg_df: DataFrame) -> DataFrame:
        return agg_df.select(
            F.lit(table).alias("table_name"),
            F.lit(check).alias("check_name"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_viol").cast("bigint").alias("n_violations"),
            (F.col("n_viol") == 0).alias("passed"),
        )

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")

    viol = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731

    checks = [
        row(
            "customer",
            "unique:c_custkey",
            cust.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias(
                    "n_viol"
                ),
            ),
        ),
        row(
            "orders",
            "not_null:o_orderdate",
            orders.agg(
                F.count(F.lit(1)).alias("n_rows"),
                viol(F.col("o_orderdate").isNull()).alias("n_viol"),
            ),
        ),
        row(
            "orders",
            "fk:o_custkey->customer",
            orders.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
                orders.join(
                    cust.select(F.col("c_custkey").alias("o_custkey")),
                    "o_custkey",
                    "left_anti",
                ).agg(F.count(F.lit(1)).alias("n_viol"))
            ),
        ),
        row(
            "lineitem",
            "fk:l_orderkey->orders",
            li.agg(F.count(F.lit(1)).alias("n_rows")).crossJoin(
                li.join(
                    orders.select(F.col("o_orderkey").alias("l_orderkey")),
                    "l_orderkey",
                    "left_anti",
                ).agg(F.count(F.lit(1)).alias("n_viol"))
            ),
        ),
        row(
            "lineitem",
            "range:l_discount[0,0.1]",
            li.agg(
                F.count(F.lit(1)).alias("n_rows"),
                viol(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)
                ).alias("n_viol"),
            ),
        ),
        row(
            "lineitem",
            "range:l_quantity(0,100]",
            li.agg(
                F.count(F.lit(1)).alias("n_rows"),
                viol(
                    (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 100)
                ).alias("n_viol"),
            ),
        ),
        row(
            "documents",
            "non_empty:text",
            docs.agg(
                F.count(F.lit(1)).alias("n_rows"),
                viol(
                    F.col("text").isNull() | (F.length("text") == 0)
                ).alias("n_viol"),
            ),
        ),
        row(
            "events",
            "unique:event_id",
            events.agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.countDistinct("event_id")).alias(
                    "n_viol"
                ),
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("table_name", "check_name")


# --------------------------------------------------------------------------
# Population-stability-index (PSI) drift report
# --------------------------------------------------------------------------

_PSI_BUCKETS = 10
_PSI_WIDTH = 50.0  # value units per bucket (events.value spans ~0-490)


@query(
    "q_psi_value_drift",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
             CAST(LEAST(CAST(floor(value / {_PSI_WIDTH}) AS BIGINT),
                        {_PSI_BUCKETS - 1}) AS BIGINT) AS b,
             CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END AS is_ref
      FROM events
    ),
    grid AS (
      SELECT DISTINCT event_type FROM base
    ),
    cells AS (
      SELECT g.event_type, r.range AS b
      FROM grid g CROSS JOIN range({_PSI_BUCKETS}) r
    ),
    counts AS (
      SELECT c.event_type, c.b,
             CAST(COALESCE(SUM(CASE WHEN base.is_ref = 1 THEN 1 END), 0)
                  AS BIGINT) AS n_ref,
             CAST(COALESCE(SUM(CASE WHEN base.is_ref = 0 THEN 1 END), 0)
                  AS BIGINT) AS n_live
      FROM cells c
      LEFT JOIN base ON base.event_type = c.event_type AND base.b = c.b
      GROUP BY 1, 2
    ),
    tots AS (
      SELECT event_type,
             CAST(SUM(n_ref) AS BIGINT) AS tot_ref,
             CAST(SUM(n_live) AS BIGINT) AS tot_live
      FROM counts GROUP BY 1
    ),
    contribs AS (
      SELECT c.event_type,
             CAST(round(((c.n_ref + 1.0) / (t.tot_ref + {_PSI_BUCKETS})
                         - (c.n_live + 1.0) / (t.tot_live + {_PSI_BUCKETS}))
                        * 1000000) AS BIGINT)
             * CAST(round(ln(((c.n_ref + 1.0) * (t.tot_live + {_PSI_BUCKETS}))
                            / ((c.n_live + 1.0) * (t.tot_ref + {_PSI_BUCKETS})))
                          * 1000000) AS BIGINT) AS c_pico,
             c.n_ref, c.n_live
      FROM counts c JOIN tots t USING (event_type)
    )
    SELECT event_type,
           CAST(SUM(c_pico) AS BIGINT) AS psi_pico,
           CAST(SUM(n_ref) AS BIGINT) AS n_ref,
           CAST(SUM(n_live) AS BIGINT) AS n_live
    FROM contribs
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type: bucketize `value`
    into {_PSI_BUCKETS} fixed-width bins, compare the first half of the
    month (reference) against the second (live), and report
    PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) with add-one smoothing — the
    standard model-ops drift gate (PSI < 0.1 stable, > 0.25 shifted).

    Determinism: the two factors are fixed-pointed SEPARATELY before
    multiplying — (p−q) rounds to 1e-6, and ln takes an exactly-
    representable integer-product ratio then rounds to 1e-6 (the
    repo's transcendental convention) — so each bucket contribution is
    an exact int64 in 1e-12 units and the sum is order-independent.

    Scale shape: one conditional-aggregate corpus pass to the
    (type × bucket) grid — a few dozen keys, full map-side combine;
    the dense grid (so empty buckets still contribute their smoothed
    mass) comes from a types × {_PSI_BUCKETS} literal frame joined to
    the counts, and totals are a per-type one-row rollup — nothing
    beyond the tiny grid shuffles after the scan."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.least(
            F.floor(F.col("value") / _PSI_WIDTH).cast("bigint"),
            F.lit(_PSI_BUCKETS - 1).cast("bigint"),
        ).alias("b"),
        F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("is_ref"),
    )
    counts_sparse = base.groupBy("event_type", "b").agg(
        F.sum(F.when(F.col("is_ref") == 1, 1)).alias("n_ref_s"),
        F.sum(F.when(F.col("is_ref") == 0, 1)).alias("n_live_s"),
    )
    types = base.select("event_type").distinct()
    buckets = F.explode(
        F.array(*[F.lit(i).cast("bigint") for i in range(_PSI_BUCKETS)])
    )
    cells = types.select("event_type", buckets.alias("b"))
    counts = (
        cells.join(counts_sparse, ["event_type", "b"], "left")
        .select(
            "event_type",
            "b",
            F.coalesce("n_ref_s", F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce("n_live_s", F.lit(0)).cast("bigint").alias("n_live"),
        )
    )
    tots = counts.groupBy("event_type").agg(
        F.sum("n_ref").cast("bigint").alias("tot_ref"),
        F.sum("n_live").cast("bigint").alias("tot_live"),
    )
    j = counts.join(tots, "event_type")
    dp = F.round(
        (
            (F.col("n_ref") + 1.0) / (F.col("tot_ref") + _PSI_BUCKETS)
            - (F.col("n_live") + 1.0) / (F.col("tot_live") + _PSI_BUCKETS)
        )
        * 1e6
    ).cast("bigint")
    lnr = F.round(
        F.log(
            ((F.col("n_ref") + 1.0) * (F.col("tot_live") + _PSI_BUCKETS))
            / ((F.col("n_live") + 1.0) * (F.col("tot_ref") + _PSI_BUCKETS))
        )
        * 1e6
    ).cast("bigint")
    return (
        j.select(
            "event_type", (dp * lnr).alias("c_pico"), "n_ref", "n_live"
        )
        .groupBy("event_type")
        .agg(
            F.sum("c_pico").cast("bigint").alias("psi_pico"),
            F.sum("n_ref").cast("bigint").alias("n_ref"),
            F.sum("n_live").cast("bigint").alias("n_live"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Cross-source score calibration (per-source quantile normalization)
# --------------------------------------------------------------------------


@query(
    "q_source_quantile_calibration",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             CAST(rank() OVER (PARTITION BY source
                               ORDER BY n_chars, doc_id) - 1 AS BIGINT)
               AS qn_num,
             CAST(COUNT(*) OVER (PARTITION BY source) - 1 AS BIGINT)
               AS qn_den
      FROM documents
    )
    SELECT doc_id, source, n_chars, qn_num, qn_den,
           CASE WHEN qn_den > 0
                THEN CAST(qn_num * 1000000 // qn_den AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS calib_ppm
    FROM r
    ORDER BY doc_id
    """,
)
def q_source_quantile_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile normalization ACROSS sources: each document's raw
    score (n_chars here; any per-doc quality signal drops in) is
    replaced by its within-source percent rank — the calibration step
    that makes scores comparable when sources have wildly different
    score distributions (a web crawl's '90th percentile' and a books
    corpus's '90th percentile' become the same number, so one global
    threshold curates both fairly).

    The rank is emitted as the exact rational (rank−1)/(n−1) in int64
    (percent_rank's definition, with a (n_chars, doc_id) ordering so
    ties resolve identically on both engines) plus a ppm projection —
    non-negative, so floor- and truncating-div agree. Plan: ONE
    source-keyed window computing rank and count together — a single
    exchange; at 100 TB the per-source window is the same
    hash-partitioned sort every rank query pays, with no join and no
    global frame anywhere."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    r = d.select(
        "doc_id",
        "source",
        "n_chars",
        (F.rank().over(ws) - 1).cast("bigint").alias("qn_num"),
        (F.count(F.lit(1)).over(wc) - 1).cast("bigint").alias("qn_den"),
    )
    return r.select(
        "doc_id",
        "source",
        "n_chars",
        "qn_num",
        "qn_den",
        F.when(
            F.col("qn_den") > 0,
            F.expr("CAST(qn_num * 1000000 div qn_den AS BIGINT)"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("calib_ppm"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# 2-D Pareto frontier (skyline) — local frontier, then global refine
# --------------------------------------------------------------------------


@query(
    "q_pareto_doc_frontier",
    oracle="""
    WITH f AS (
      SELECT doc_id, lang, source, n_chars,
             CAST(len(list_distinct(str_split(text, ' '))) AS BIGINT)
               AS n_distinct_tokens
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars, n_distinct_tokens
    FROM f a
    WHERE NOT EXISTS (
      SELECT 1 FROM f b
      WHERE b.n_chars >= a.n_chars
        AND b.n_distinct_tokens >= a.n_distinct_tokens
        AND (b.n_chars > a.n_chars
             OR b.n_distinct_tokens > a.n_distinct_tokens)
    )
    ORDER BY n_chars DESC, doc_id
    """,
)
def q_pareto_doc_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE: documents Pareto-optimal under two quality axes
    (length in chars, lexical diversity as distinct-token count) — no
    other document is at least as good on both axes and strictly
    better on one. The multi-objective selection move when two
    signals should not be collapsed into one weighted score.

    The 2-D skyline needs no pair join: sort one axis and a point is
    dominated iff the MAX of the other axis over strictly-greater x
    reaches it (or a same-x point strictly beats it) — two window
    maxes and a filter. Scale shape: frontier(S) ⊆ ∪ frontier(S_i)
    for ANY partition of S, so stage 1 computes the frontier WITHIN
    each source (partitioned windows, fully parallel) and only those
    survivors — frontier-sized, tiny for correlated axes — enter the
    stage-2 global window, the same post-filter-global-frame pattern
    the plan guards allow for post-agg windows. The oracle is the
    quadratic NOT EXISTS dominance definition; the match certifies
    the window formulation including dominance ties."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("bigint")
        .alias("n_distinct_tokens"),
    )

    def frontier(df: DataFrame, part_cols: list) -> DataFrame:
        w_eq = Window.partitionBy(*(part_cols + ["n_chars"]))
        w_gt = (
            Window.partitionBy(*part_cols)
            .orderBy("n_chars")
            .rangeBetween(1, Window.unboundedFollowing)
            if part_cols
            else Window.orderBy("n_chars").rangeBetween(
                1, Window.unboundedFollowing
            )
        )
        y = F.col("n_distinct_tokens")
        dominated = F.coalesce(
            F.max("n_distinct_tokens").over(w_gt) >= y, F.lit(False)
        ) | (F.max("n_distinct_tokens").over(w_eq) > y)
        return df.withColumn("dominated", dominated).where(
            ~F.col("dominated")
        ).drop("dominated")

    local = frontier(d, ["source"])
    return frontier(local, []).orderBy(F.col("n_chars").desc(), "doc_id")
