"""Wider TPC-H-shaped relational coverage (SURVEY.md §2.B/§2.C [C] rows):
the canonical filter-agg, multi-join top-k, conditional pivot-agg,
join-ratio, scalar-subquery (correlated avg), and having-on-groupsum
shapes, plus the in-memory ingest path (§2.A row A5). Adapted to the
driver schema (lineitem has l_shipdate only — no commit/receipt dates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import broadcast_narrow, davg, dsum, sql_davg, sql_dsum
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
        .join(broadcast_narrow(n), c.c_nationkey == n.n_nationkey)
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
        li.join(broadcast_narrow(p), F.col("l_partkey") == F.col("p_partkey"))
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
        o.join(broadcast_narrow(w), o.o_orderpriority == w.priority)
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
        c.join(broadcast_narrow(threshold))
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
        li.join(s.join(broadcast_narrow(n1), s.s_nationkey == F.col("nk1")),
                li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c.join(broadcast_narrow(n2), c.c_nationkey == F.col("nk2")),
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


_DEC0 = "CAST(0 AS DECIMAL(38,6))"


@query(
    "q8_market_share",
    oracle=f"""
    WITH base AS (
      SELECT EXTRACT(year FROM o_orderdate) AS order_year,
             n1.n_name AS supp_nation,
             CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)) AS rev
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n2.n_regionkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    )
    SELECT order_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN rev ELSE {_DEC0} END) AS DOUBLE) AS nation_rev,
           CAST(SUM(rev) AS DOUBLE) AS total_rev,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN rev ELSE {_DEC0} END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE) AS mkt_share
    FROM base
    GROUP BY order_year
    ORDER BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share of a region's PROMO
    trade, by order year. The conditional numerator and the denominator
    come out of ONE grouped aggregate over one join tree (no second
    pass); nation/region dims broadcast; the share division happens on
    the exact decimal sums so it is bit-stable at any partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation"))
    n2 = n.join(broadcast_narrow(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("nk2")
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    zero = F.lit(0).cast("decimal(38,6)")
    num = (
        F.sum(F.when(F.col("supp_nation") == "NATION_5", rev).otherwise(zero))
        .cast("double")
        .alias("nation_rev")
    )
    den = F.sum(rev).cast("double").alias("total_rev")
    return (
        li.join(broadcast_narrow(p), li.l_partkey == p.p_partkey)
        .join(s.join(broadcast_narrow(n1), s.s_nationkey == F.col("nk1")),
              li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c.join(broadcast_narrow(n2), c.c_nationkey == F.col("nk2")),
              o.o_custkey == c.c_custkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(num, den)
        .withColumn("mkt_share", F.col("nation_rev") / F.col("total_rev"))
        .orderBy("order_year")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS supp_nation,
           EXTRACT(year FROM o_orderdate) AS order_year,
           {sql_dsum("l_extendedprice * (1.0 - l_discount) - 0.6 * p_retailprice * l_quantity", "profit")}
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation, per-year profit on a part-name
    family. The driver schema has no partsupp, so supply cost is the
    deterministic proxy 0.6 * p_retailprice (same double expression on
    both engines). The LIKE filter shrinks part BEFORE the fact join,
    so the broadcast hash build holds only matching parts."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(broadcast_narrow(p), li.l_partkey == p.p_partkey)
        .join(broadcast_narrow(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_narrow(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(dsum(profit, "profit"))
        .orderBy("supp_nation", "order_year")
    )


@query(
    "q11_important_parts",
    oracle=f"""
    WITH pv AS (
      SELECT l_partkey,
             {sql_dsum("l_extendedprice * (1.0 - l_discount)", "part_value")}
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_8')
      GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM pv
    WHERE part_value > 0.002 * (SELECT SUM(part_value) FROM pv)
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value (through two nations'
    suppliers) exceeds a fraction of the global total — the
    HAVING-against-global-scalar-subquery shape. The grouped table is
    computed once (localCheckpoint cuts lineage), the one-row global
    total is broadcast into the filter; threshold compares the same
    exact-decimal doubles on both engines."""
    from geoparquet_python_spark.functions.exact import materialize

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_8")
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    pv = materialize(
        li.join(broadcast_narrow(s.join(broadcast_narrow(n), s.s_nationkey == n.n_nationkey)),
                li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(dsum(rev, "part_value"))
    )
    total = pv.agg(
        F.sum(F.col("part_value").cast("decimal(38,6)")).cast("double").alias("_tot")
    )
    return (
        pv.crossJoin(broadcast_narrow(total))
        .where(F.col("part_value") > F.lit(0.002) * F.col("_tot"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH sr AS (
      SELECT l_suppkey,
             {sql_dsum("l_extendedprice * (1.0 - l_discount)", "total_revenue")}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN sr ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM sr)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the revenue 'view' for one quarter, then the
    supplier(s) hitting its max — view-plus-scalar-subquery. Equality
    against MAX is safe because revenues are exact decimal sums (ties
    resolve identically on both engines). One-row max broadcasts."""
    from geoparquet_python_spark.functions.exact import materialize

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    sr = materialize(
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(rev, "total_revenue"))
    )
    mx = sr.agg(F.max("total_revenue").alias("_mx"))
    return (
        sr.crossJoin(broadcast_narrow(mx))
        .where(F.col("total_revenue") == F.col("_mx"))
        .join(broadcast_narrow(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type  <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    cell, excluding a complaint set (negative-balance suppliers) via
    broadcast anti-join. The part filter is applied before the
    broadcast build; count-distinct expands then dedups map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        li.join(broadcast_narrow(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(broadcast_narrow(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * (1.0 - l_discount)", "revenue")},
           COUNT(*) AS n
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    bands across the part join. Catalyst extracts the common
    `p_brand IN (...)` / size upper bound implied by the OR into the
    broadcast build side; the residual disjunction evaluates post-join
    inside whole-stage codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & q.between(20, 30))
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(broadcast_narrow(p), li.l_partkey == p.p_partkey)
        .where(cond)
        .agg(dsum(rev, "revenue"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "q20_bulk_part_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%bolt%'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 2000
    )
    ORDER BY s_suppkey
    """,
)
def q20_bulk_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers moving bulk volume of a part-name
    family — semi-join against a grouped-HAVING subquery. The inner
    aggregate shrinks to ≤ |supplier| rows, so the outer semi-join is a
    broadcast; quantity sums are int-valued doubles, exact in both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    bulk = (
        li.join(broadcast_narrow(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .where(F.col("_qty") > 2000)
    )
    return (
        s.join(broadcast_narrow(bulk), s.s_suppkey == bulk.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


@query(
    "q21_lone_returner",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_lone_returner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: in finished multi-supplier orders, the supplier
    whose line was the ONLY returned one — correlated EXISTS and NOT
    EXISTS, each with an extra non-equi term. Both realize as semi/anti
    joins keyed on l_orderkey with the `suppkey <>` residual evaluated
    in the join; fresh scans for l2/l3 keep self-join lineage clean
    (PySpark re-executes shared lineage per branch otherwise)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    l2 = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    )
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .join(l2, (F.col("l_orderkey") == F.col("k2"))
              & (F.col("l_suppkey") != F.col("s2")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("k3"))
              & (F.col("l_suppkey") != F.col("s3")), "left_anti")
        .join(broadcast_narrow(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
