"""Scalar-function queries (SURVEY.md §2.D: string/date/math/JSON/
conditional). Everything here is a built-in JVM expression inside
whole-stage codegen — no Python UDFs in any of these paths.

Determinism: libm-backed functions (ln/exp) are rounded to 6 decimals
on BOTH sides (JVM vs C libm may differ in the last ulp); everything
else is IEEE-exact or integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import davg
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query


# --------------------------------------------------------------------------
# B2: compound filter predicates (IN / BETWEEN / LIKE / null test)
# --------------------------------------------------------------------------


@query(
    "q_filter_predicates",
    oracle="""
    SELECT p_type, COUNT(*) AS n, MIN(p_retailprice) AS min_price
    FROM part
    WHERE p_type IN ('PROMO', 'ECONOMY', 'STANDARD')
      AND p_size BETWEEN 10 AND 30
      AND p_name LIKE '%a%'
      AND p_brand IS NOT NULL
    GROUP BY p_type
    ORDER BY p_type
    """,
)
def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + BETWEEN + LIKE + IS NOT NULL, all pushed toward the scan."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.where(
            F.col("p_type").isin("PROMO", "ECONOMY", "STANDARD")
            & F.col("p_size").between(10, 30)
            & F.col("p_name").like("%a%")
            & F.col("p_brand").isNotNull()
        )
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n"), F.min("p_retailprice").alias("min_price"))
        .orderBy("p_type")
    )


# --------------------------------------------------------------------------
# D: string functions
# --------------------------------------------------------------------------


@query(
    "q_string_functions",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_prefix,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           concat_ws('|', c_mktsegment, c_name) AS tagged,
           split_part(c_name, '#', 2) AS name_num,
           levenshtein(c_mktsegment, 'BUILDING') AS seg_dist,
           strpos(c_name, '#') AS hash_pos,
           trim('  ' || c_mktsegment || ' ') AS seg_trim
    FROM customer
    WHERE c_custkey <= 200
    ORDER BY c_custkey
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/length/substring/replace/lpad/concat_ws/split_part/
    levenshtein/instr/trim — all JVM built-ins."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.lower("c_mktsegment").alias("seg_lower"),
            F.length("c_name").alias("name_len"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
                "name_short"
            ),
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
            F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
            F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
            F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_dist"),
            F.instr(F.col("c_name"), "#").alias("hash_pos"),
            F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias(
                "seg_trim"
            ),
        )
        .orderBy("c_custkey")
    )


@query(
    "q_regexp_functions",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_prefix,
           regexp_matches(text, 'spark|query') AS mentions_engine
    FROM (
      SELECT doc_id, substr(text, 1, 40) AS text FROM documents WHERE doc_id < 50
    )
    ORDER BY doc_id
    """,
)
def q_regexp_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / regexp-match predicate.

    Spark's regexp_replace replaces all matches (DuckDB needs the 'g'
    flag for parity); rlike ≡ regexp_matches.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.where(F.col("doc_id") < 50)
        .select("doc_id", F.substring("text", 1, 40).alias("text"))
        .select(
            "doc_id",
            F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
            F.regexp_replace("text", "[aeiou]", "_").alias("devoweled_prefix"),
            F.col("text").rlike("spark|query").alias("mentions_engine"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# D: date/time functions
# --------------------------------------------------------------------------


@query(
    "q_date_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mth,
           dayofmonth(o_orderdate) AS dom,
           quarter(o_orderdate) AS qtr,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    WHERE o_orderkey <= 300
    ORDER BY o_orderkey
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter/dayofweek/date_trunc/datediff/add_months/
    unix_timestamp. (Spark dayofweek is 1=Sunday; DuckDB dow is
    0=Sunday — the oracle adds 1.)"""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.where(F.col("o_orderkey") <= 300)
        .select(
            "o_orderkey",
            F.year(d).alias("yr"),
            F.month(d).alias("mth"),
            F.dayofmonth(d).alias("dom"),
            F.quarter(d).alias("qtr"),
            F.dayofweek(d).alias("dow"),
            F.date_trunc("month", d).alias("month_start"),
            F.datediff(F.lit("2000-01-01").cast("date"), F.to_date(d)).alias(
                "days_to_y2k"
            ),
            F.add_months(F.to_date(d), 3).cast("timestamp").alias("plus3m"),
            F.unix_timestamp(d).alias("epoch_s"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# D: math functions
# --------------------------------------------------------------------------


@query(
    "q_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_diff,
           CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
           CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
           sqrt(l_quantity) AS qty_sqrt,
           round(l_extendedprice / 7.0, 2) AS price_7th,
           l_quantity * l_quantity AS qty_sq,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           l_linenumber % 3 AS line_mod,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate,
           round(ln(l_extendedprice), 6) AS log_price
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/floor/ceil/sqrt/round/sign/mod/greatest/least (+ ln rounded:
    JVM vs libm may differ in the final ulp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("abs_diff"),
            F.floor(F.col("l_extendedprice") / 1000.0).alias("price_k_floor"),
            F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_k_ceil"),
            F.sqrt("l_quantity").alias("qty_sqrt"),
            F.round(F.col("l_extendedprice") / 7.0, 2).alias("price_7th"),
            (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
            F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
            (F.col("l_linenumber") % 3).alias("line_mod"),
            F.greatest("l_tax", "l_discount").alias("max_rate"),
            F.least("l_tax", "l_discount").alias("min_rate"),
            F.round(F.log(F.col("l_extendedprice")), 6).alias("log_price"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# D: JSON extraction (events.props is JSON-in-string)
# --------------------------------------------------------------------------


@query(
    "q_json_events",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / COUNT(*) AS avg_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the JSON-in-string props column; integer
    aggregates are exact so no decimal dance is needed."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "q_json_schema_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE event_id < 100
    ORDER BY event_id
    """,
)
def q_json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema (the scale-path JSON parser:
    one pass, typed struct out, no per-field re-parse)."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return (
        e.where(F.col("event_id") < 100)
        .select("event_id", parsed.getField("k").alias("k"))
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# D: conditional expressions
# --------------------------------------------------------------------------


@query(
    "q_conditional_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 250000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_label,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(o_totalprice) AS avg_price
    FROM orders
    GROUP BY 1, 2
    ORDER BY bucket, status_label
    """,
)
def q_conditional_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + NULLIF/COALESCE relabeling."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 250000, "medium")
        .otherwise("large")
    )
    status_label = F.coalesce(
        F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
    )
    return (
        o.select(bucket.alias("bucket"), status_label.alias("status_label"), "o_totalprice")
        .groupBy("bucket", "status_label")
        .agg(F.count(F.lit(1)).alias("n"), davg("o_totalprice", "avg_price"))
        .orderBy("bucket", "status_label")
    )


@query(
    "q_variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS n_with_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(COUNT(CAST(json_extract_string(props, '$.absent') AS BIGINT))
                AS BIGINT) AS n_with_absent
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: `parse_json` the semi-structured
    `props` column ONCE into the binary VARIANT encoding, then
    extract typed paths with `variant_get`/`try_variant_get` — the
    schema-flexible lane next to q_json_events' schema-declared
    `from_json`. The difference that matters operationally: VARIANT
    needs no up-front schema, unknown paths degrade to NULL
    (`try_variant_get` on '$.absent' — counted here as the
    missing-field audit), and the binary encoding makes repeated
    path extraction cheaper than re-parsing JSON text per field at
    100 TB. Plan: map-side parse + extract inside the scan
    projection, one event_type-keyed aggregate — the same single
    exchange as every conditional-agg profile; exact int64 sums."""
    e = load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.expr("parse_json(props)").alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("try_variant_get(v, '$.absent', 'bigint')").alias("absent"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count("k").cast("bigint").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.count("absent").cast("bigint").alias("n_with_absent"),
        )
        .orderBy("event_type")
    )
