"""Wider TPC-H-shaped relational coverage (SURVEY.md §2.B/§2.C [C] rows):
the canonical filter-agg, multi-join top-k, conditional pivot-agg,
join-ratio, scalar-subquery (correlated avg), and having-on-groupsum
shapes, plus the in-memory ingest path (§2.A row A5). Adapted to the
driver schema (lineitem has l_shipdate only — no commit/receipt dates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import davg, dsum, sql_davg, sql_dsum
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query


@query(
    "q6_revenue_delta",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue_delta")},
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate <  TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 25
    """,
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate scan → global agg. Every
    predicate is pushdown-eligible (PushedFilters on shipdate/discount/
    quantity); no shuffle at all — partial aggs coalesce to one row."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.04, 0.08)
        & (F.col("l_quantity") < 25)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue_delta"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum("l_extendedprice * (1.0 - l_discount)", "revenue")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1994-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking over returned items.

    Join order: lineitem(filtered) ⋈ orders(filtered) shuffles on
    orderkey, then one shuffle on custkey into customer; nation is
    broadcast. Top-20 is TakeOrderedAndProject (no global sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "q12_shipmonth_priority",
    oracle="""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    ORDER BY ship_month
    """,
)
def q12_shipmonth_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: schema has no commit/receipt dates):
    priority mix per ship month via conditional counts — one join
    shuffle on orderkey, one agg shuffle on the month."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
        .orderBy("ship_month")
    )


@query(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * (
             SELECT {sql_dsum("l_extendedprice * (1.0 - l_discount)", "x")}
             FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE p_type = 'PROMO'
               AND l_shipdate >= TIMESTAMP '1995-09-01'
               AND l_shipdate <  TIMESTAMP '1995-10-01'
           ) / (
             SELECT {sql_dsum("l_extendedprice * (1.0 - l_discount)", "y")}
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1995-09-01'
               AND l_shipdate <  TIMESTAMP '1995-10-01'
           ) AS promo_revenue_pct
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share. One pass over the filtered
    month: join part (broadcast at any SF where part ≪ lineitem), take
    the conditional/total ratio of two exact decimal sums."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(38,6)"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH pavg AS (
      SELECT l_partkey AS pk, {sql_davg("l_quantity", "aq")}
      FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dsum("l_extendedprice", "total_price")},
           COUNT(*) AS n_small
    FROM lineitem JOIN pavg ON l_partkey = pk
    WHERE l_quantity < 0.5 * aq
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated-average subquery, decorrelated
    into agg + self-join (what Catalyst does to the SQL form anyway) —
    both sides partition on l_partkey, so AQE plans a co-located join."""
    li = load_table(spark, sf_dir, "lineitem")
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(davg("l_quantity", "aq"))
    return (
        li.join(pavg, F.col("l_partkey") == F.col("pk"))
        .where(F.col("l_quantity") < 0.5 * F.col("aq"))
        .agg(
            dsum("l_extendedprice", "total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "q18_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey AS ok, {sql_dsum("l_quantity", "sum_qty")}
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 250
    )
    SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = ok
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped sum feeding a join chain.
    The heavy agg happens FIRST (lineitem shrinks to qualifying order
    keys before touching orders/customer) — at 100 TB the filter-early
    ordering is the difference between joining 60B rows and 60k."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(dsum("l_quantity", "sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("ok"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "q_inmem_priority_weights",
    oracle=f"""
    WITH w(priority, weight) AS (
      VALUES ('1-URGENT', 5.0), ('2-HIGH', 3.0), ('3-MEDIUM', 2.0),
             ('4-NOT SPECIFIED', 1.0), ('5-LOW', 0.5)
    )
    SELECT o_orderstatus,
           {sql_dsum("o_totalprice * weight", "weighted_revenue")},
           COUNT(*) AS n
    FROM orders JOIN w ON o_orderpriority = priority
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q_inmem_priority_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-memory ingest (§2.A A5, the reference's GeoDataFrame-ctor
    path): a literal dimension built with createDataFrame, broadcast
    against the parquet fact — the idiomatic small-dim enrichment."""
    w = spark.createDataFrame(
        [
            ("1-URGENT", 5.0),
            ("2-HIGH", 3.0),
            ("3-MEDIUM", 2.0),
            ("4-NOT SPECIFIED", 1.0),
            ("5-LOW", 0.5),
        ],
        ["priority", "weight"],
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(w), o.o_orderpriority == w.priority)
        .groupBy("o_orderstatus")
        .agg(
            dsum(F.col("o_totalprice") * F.col("weight"), "weighted_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q_percentile_prices",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS p99,
           ROUND(median(l_quantity), 6) AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (C5): Spark `percentile` and DuckDB
    `quantile_cont` both use linear interpolation — rounded to 1e-6 for
    the final-ulp interpolation arithmetic. (`percentile_approx` is the
    sketch variant; kept exact here so the oracle is strong, the approx
    path is covered by q_approx_distinct_parts.)"""
    li = load_table(spark, sf_dir, "lineitem")
    # one percentile aggregate with an array of fractions: a single
    # per-group buffer/sort instead of three
    pcts = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            pcts.alias("pcts"),
            F.round(F.median("l_quantity"), 6).alias("median_qty"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("pcts")[0], 6).alias("p50"),
            F.round(F.col("pcts")[1], 6).alias("p90"),
            F.round(F.col("pcts")[2], 6).alias("p99"),
            "median_qty",
        )
        .orderBy("l_returnflag")
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: count-of-counts histogram through a LEFT join
    (customers with zero orders must survive as c_count=0). Two aggs:
    the first shuffles on custkey, the second on the tiny c_count key —
    partial aggregation makes the second shuffle carry |distinct
    counts| rows per partition."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q22_idle_wealthy_customers",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           {sql_dsum("c_acctbal", "totacctbal")}
    FROM customer
    WHERE c_acctbal > (
            SELECT {sql_davg("c_acctbal", "a")} FROM customer WHERE c_acctbal > 0
          )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (global avg over
    positive balances — computed once, joined as a 1-row broadcast) +
    NOT EXISTS as a left-anti join against orders. No correlated
    re-execution anywhere: the anti join is one shuffle on custkey."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    threshold = (
        c.where(F.col("c_acctbal") > 0)
        .agg(davg("c_acctbal", "avg_bal"))
    )
    return (
        c.join(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q7_nation_trade_flow",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS ship_year,
           {sql_dsum("l_extendedprice * (1.0 - l_discount)", "revenue")}
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE n1.n_name IN ('NATION_9', 'NATION_10')
      AND n2.n_name IN ('NATION_9', 'NATION_10')
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q7_nation_trade_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year. The two
    nation filters are applied THROUGH the broadcast dims before the
    fact-fact joins (supplier/customer shrink to two nations first), so
    the orderkey/custkey shuffles carry only qualifying rows."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.where(F.col("n_name").isin("NATION_9", "NATION_10")).select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.where(F.col("n_name").isin("NATION_9", "NATION_10")).select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(s.join(F.broadcast(n1), s.s_nationkey == F.col("nk1")),
                li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c.join(F.broadcast(n2), c.c_nationkey == F.col("nk2")),
              o.o_custkey == c.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(dsum(rev, "revenue"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )
