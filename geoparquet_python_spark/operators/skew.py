"""Skew-handling join utilities (SCALE.md "Relational core": salting
for known-hot keys; the bucketing lever is certified in
tests/test_skew.py).

AQE's skew-join splitting handles most runtime skew, but it only
splits the SHUFFLED side's oversized partitions — when one key is so
hot that a single (key) hash bucket exceeds executor memory on BOTH
sides, the classic remedy is salting: replicate the modest side
n_salt times and scatter the skewed side's hot key across n_salt
sub-keys, turning one giant partition into n_salt bounded ones.

Cost model: the modest side is duplicated n_salt×, the skewed side
gets one extra int column — choose n_salt ≈ hottest-key-rows /
target-partition-rows. Salting beats broadcast only when the modest
side is too big to broadcast; otherwise broadcast wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    modest: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to heavy key skew on ``skewed``.

    The skewed side gets a deterministic per-row salt (hash of the
    whole row — no rand(): retries must re-produce the same salt or a
    recomputed partition would change results); the modest side is
    exploded across all n_salt salts so every (key, salt) pair still
    meets its match. Result rows are identical to ``skewed.join(
    modest, on, how)`` — each skewed row meets exactly one replica.

    Supports how in ('inner', 'left'): semantics preserved because
    replication is on the OTHER side. (A right/full variant would
    need the mirror construction.)
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salt)
    ).cast("int")
    left = skewed.withColumn(_SALT, salt)
    right = modest.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return left.join(right, [*on, _SALT], how).drop(_SALT)


from pyspark.sql import SparkSession  # noqa: E402

from geoparquet_python_spark.io import load_table  # noqa: E402
from geoparquet_python_spark.registry import query  # noqa: E402


@query(
    "q_salted_status_revenue",
    oracle="""
    SELECT o.o_orderstatus AS status,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_salted_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order status through the SALTED join path: the
    skewed fact side carries a deterministic per-row salt, the modest
    side explodes across all 8 salts, and the join runs on
    (l_orderkey, salt) — one hot key becomes 8 bounded partitions.
    Results are provably identical to the plain join (each fact row
    meets exactly one replica), which is precisely what the oracle
    checks: the plain SQL join, no salt anywhere.

    This registers the skew lever as a first-class oracle-checked
    operator; equivalence and hot-key distribution are additionally
    unit-certified in tests/test_skew.py. Deterministic salting
    (xxhash64 of the row, not rand()) keeps retries re-entrant.
    """
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    joined = salted_join(l, o, on=["l_orderkey"], n_salt=8)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.groupBy("status")
        .agg(
            F.sum(revenue.cast("decimal(38,6)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("status")
    )


@query(
    "q_join_key_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT o_custkey AS key, COUNT(*) AS n_rows
      FROM orders GROUP BY o_custkey
    ),
    tot AS (
      SELECT CAST(SUM(n_rows) AS BIGINT) AS total_rows,
             COUNT(*) AS n_keys,
             MAX(n_rows) AS max_rows
      FROM per_key
    ),
    ranked AS (
      SELECT key, n_rows,
             ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS rank
      FROM per_key
    )
    SELECT r.rank, r.key, r.n_rows,
           r.n_rows * 1.0 / t.total_rows AS pct_of_total,
           r.n_rows / (t.total_rows * 1.0 / t.n_keys) AS skew_ratio,
           t.total_rows, t.n_keys, t.max_rows
    FROM ranked r CROSS JOIN tot t
    WHERE r.rank <= 10
    ORDER BY r.rank
    """,
)
def q_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diagnostic you run BEFORE choosing a skew remedy: per-key
    row counts for a join key (orders.o_custkey), the 10 heaviest keys
    with their share of the table and their ratio to the mean key, and
    the global key-distribution stats alongside. skew_ratio >> 1 on
    the top key says salt or AQE-split; ~1 says the plain hash join is
    already balanced.

    One groupBy on the key, a one-row stats aggregate broadcast back,
    and a DISTRIBUTED top-10 (orderBy().limit() plans
    TakeOrderedAndProject: per-partition heaps merged on the driver —
    never a global single-partition window over billions of keys);
    ranks are assigned on the 10 surviving rows only.
    """
    from pyspark.sql import Window

    from geoparquet_python_spark.functions.exact import broadcast_narrow

    per_key = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    tot = per_key.agg(
        F.sum("n_rows").cast("bigint").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n_rows").alias("max_rows"),
    )
    top = per_key.orderBy(F.col("n_rows").desc(), F.col("key")).limit(10)
    # row_number over exactly 10 rows — the single-partition window is
    # bounded by the limit, not the key domain
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(broadcast_narrow(tot))
        .select(
            "rank",
            "key",
            "n_rows",
            (F.col("n_rows") * F.lit(1.0) / F.col("total_rows")).alias(
                "pct_of_total"
            ),
            (
                F.col("n_rows")
                / (F.col("total_rows") * F.lit(1.0) / F.col("n_keys"))
            ).alias("skew_ratio"),
            "total_rows",
            "n_keys",
            "max_rows",
        )
        .orderBy("rank")
    )
