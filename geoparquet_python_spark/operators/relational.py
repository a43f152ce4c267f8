"""Relational core queries (SURVEY.md §2.B/§2.C [C] rows).

The reference delegates this entire surface to pandas on the decoded
GeoDataFrame (geoparquet/__init__.py:47-70≈ produces the frame; the
README workflow is read → dataframe algebra → write). Here each
operator is a declarative DataFrame plan — Catalyst does pushdown,
pruning, broadcast selection and partial aggregation (SURVEY.md §4.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import davg, dsum, sql_davg, sql_dsum
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum("l_quantity", "sum_qty")},
      {sql_dsum("l_extendedprice", "sum_base_price")},
      {sql_dsum("l_extendedprice * (1.0 - l_discount)", "sum_disc_price")},
      {sql_dsum("(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)", "sum_charge")},
      {sql_davg("l_quantity", "avg_qty")},
      {sql_davg("l_extendedprice", "avg_price")},
      {sql_davg("l_discount", "avg_disc")},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: scan → filter → hash agg → sort.

    Scale notes: the only shuffle is the final aggregation on a
    6-value grouping key (tiny exchange after map-side partial agg);
    the shipdate filter reaches the Parquet row-group stats
    (PushedFilters in .explain) and only 7 of 11 columns are read.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
