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
