"""Record linkage: blocked fuzzy (edit-distance) matching
(SURVEY.md §2.F training-pipeline closure — entity resolution over
catalog/name columns).

The naive fuzzy join is O(n²) Levenshtein calls — the canonical
scale-killer. The production shape is BLOCK → PREFILTER → REFINE:
a cheap equi-join key that true matches almost surely share (here
the first name token; phonetic keys or q-gram bands generalize), a
necessary-condition prefilter that is free to evaluate (edit distance
≥ |length difference|, so |Δlen| ≤ t prunes before any DP), and the
exact Levenshtein DP only on surviving candidates — JVM codegen on
both engines, bit-identical integer results.

No reference equivalent (SURVEY.md §0 provenance) — [N] scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_MAX_DIST = 3  # match threshold (edit ops)

# The fuzzy-pair CTE chain shared by both oracles: distinct-name
# entity table (canonical key = lowest part key), first-token block,
# Δlen prefilter, exact Levenshtein refine.
_SQL_FUZZY_CTES = f"""
    n AS (
      SELECT p_name, CAST(MIN(p_partkey) AS BIGINT) AS canonical_key
      FROM part GROUP BY p_name
    ),
    fuzzy AS (
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             a.canonical_key AS key_a, b.canonical_key AS key_b,
             CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      FROM n a
      JOIN n b
        ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
       AND a.p_name < b.p_name
       AND abs(length(a.p_name) - length(b.p_name)) <= {_MAX_DIST}
      WHERE levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
    )
"""


def _name_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part names with a stable canonical key (min part key)."""
    return (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.min("p_partkey").cast("bigint").alias("canonical_key"))
    )


def _fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCK → PREFILTER → REFINE candidate pairs (unsorted)."""
    n = _name_entities(spark, sf_dir)
    a = n.select(
        F.col("p_name").alias("name_a"),
        F.col("canonical_key").alias("key_a"),
        F.expr("split_part(p_name, ' ', 1)").alias("blk_a"),
        F.length("p_name").alias("len_a"),
    )
    b = n.select(
        F.col("p_name").alias("name_b"),
        F.col("canonical_key").alias("key_b"),
        F.expr("split_part(p_name, ' ', 1)").alias("blk_b"),
        F.length("p_name").alias("len_b"),
    )
    cand = a.join(
        b,
        (F.col("blk_a") == F.col("blk_b"))
        & (F.col("name_a") < F.col("name_b"))
        & (F.abs(F.col("len_a") - F.col("len_b")) <= _MAX_DIST),
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("bigint")
        )
        .where(F.col("dist") <= _MAX_DIST)
        .select("name_a", "name_b", "key_a", "key_b", "dist")
    )


@query(
    "q_fuzzy_name_pairs",
    oracle=f"""
    WITH {_SQL_FUZZY_CTES}
    SELECT name_a, name_b, key_a, key_b, dist
    FROM fuzzy
    ORDER BY name_a, name_b
    """,
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy match over part names: distinct-name entities
    (canonical key = lowest part key), blocked on the first name
    token, length-difference prefiltered (|Δlen| ≤ t is NECESSARY for
    edit distance ≤ t — zero false dismissals), refined by exact
    Levenshtein ≤ {_MAX_DIST}.

    Plan: one distinct-name aggregate (entity table ≪ row table),
    a block-keyed equi-join (the only shuffle — candidate volume is
    Σ|block|², governed by the blocking key's selectivity exactly
    like LSH bands govern MinHash), the Δlen prefilter inside the
    join condition so it evaluates before any DP, and codegen
    levenshtein on survivors only. At 100 TB the block key generalizes
    to phonetic/q-gram band keys with the same plan; a hot block
    (skewed common first token) is the AQE-skew/salting case the
    near-dup family already documents."""
    return _fuzzy_pairs(spark, sf_dir).orderBy("name_a", "name_b")


@query(
    "q_fuzzy_entity_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_FUZZY_CTES},
    edges AS (
      SELECT key_a AS s, key_b AS d FROM fuzzy
      UNION ALL
      SELECT key_b AS s, key_a AS d FROM fuzzy
    ),
    nodes AS (SELECT DISTINCT s FROM edges),
    reach(s, d) AS (
      SELECT s, s FROM nodes
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON e.s = r.d
    ),
    comp AS (
      SELECT s AS member_key, MIN(d) AS entity_key FROM reach GROUP BY s
    ),
    sizes AS (
      SELECT entity_key, CAST(COUNT(*) AS BIGINT) AS n_members
      FROM comp GROUP BY entity_key
    )
    SELECT c.member_key, na.p_name AS member_name,
           c.entity_key, nb.p_name AS entity_name, z.n_members
    FROM comp c
    JOIN n na ON na.canonical_key = c.member_key
    JOIN n nb ON nb.canonical_key = c.entity_key
    JOIN sizes z ON z.entity_key = c.entity_key
    ORDER BY member_key
    """,
)
def q_fuzzy_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: the fuzzy pair graph contracted to
    connected components, each member name mapped to its entity (the
    component's min canonical key), with the entity's display name and
    member count — the table a MERGE/golden-record step consumes.

    Reuses `star_contraction_components` (large-star/small-star,
    O(log n) rounds regardless of chain length — fuzzy-match graphs
    DO chain: A~B and B~C at distance 3 with A~C at 6). The pair graph
    is entity-sized (≪ corpus); the name lookups are two equi-joins
    against the distinct-name table, broadcast or shuffled at AQE's
    discretion. Oracle: recursive-CTE transitive closure over the same
    fuzzy CTE chain."""
    from geoparquet_python_spark.operators.dedup import (
        star_contraction_components,
    )

    pairs = _fuzzy_pairs(spark, sf_dir).select("key_a", "key_b")
    labels = star_contraction_components(pairs)
    comp = labels.select(
        F.col("node").alias("member_key"), F.col("label").alias("entity_key")
    )
    sizes = comp.groupBy("entity_key").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    n = _name_entities(spark, sf_dir)
    member_names = n.select(
        F.col("canonical_key").alias("member_key"),
        F.col("p_name").alias("member_name"),
    )
    entity_names = n.select(
        F.col("canonical_key").alias("entity_key"),
        F.col("p_name").alias("entity_name"),
    )
    return (
        comp.join(member_names, "member_key")
        .join(entity_names, "entity_key")
        .join(sizes, "entity_key")
        .select(
            "member_key",
            "member_name",
            "entity_key",
            "entity_name",
            "n_members",
        )
        .orderBy("member_key")
    )


@query(
    "q_entity_golden_record",
    oracle=f"""
    WITH RECURSIVE {_SQL_FUZZY_CTES},
    edges AS (
      SELECT key_a AS s, key_b AS d FROM fuzzy
      UNION ALL
      SELECT key_b AS s, key_a AS d FROM fuzzy
    ),
    nodes AS (SELECT DISTINCT s FROM edges),
    reach(s, d) AS (
      SELECT s, s FROM nodes
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON e.s = r.d
    ),
    comp AS (
      SELECT s AS member_key, MIN(d) AS entity_key FROM reach GROUP BY s
    ),
    rows_in AS (
      SELECT c.entity_key, p.p_name, p.p_brand, p.p_size,
             CAST(round(p.p_retailprice * 100) AS BIGINT) AS price_cents
      FROM part p
      JOIN n nm ON nm.p_name = p.p_name
      JOIN comp c ON c.member_key = nm.canonical_key
    ),
    brand_votes AS (
      SELECT entity_key, p_brand, COUNT(*) AS n_votes
      FROM rows_in GROUP BY entity_key, p_brand
    ),
    top_brand AS (
      SELECT entity_key, p_brand AS brand FROM (
        SELECT entity_key, p_brand,
               row_number() OVER (PARTITION BY entity_key
                                  ORDER BY n_votes DESC, p_brand) AS rk
        FROM brand_votes
      ) WHERE rk = 1
    ),
    agg AS (
      SELECT entity_key,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT p_name) AS BIGINT) AS n_names,
             CAST(MIN(p_size) AS BIGINT) AS min_size,
             CAST(MAX(p_size) AS BIGINT) AS max_size,
             CAST(SUM(price_cents) AS BIGINT) AS total_price_cents
      FROM rows_in GROUP BY entity_key
    )
    SELECT a.entity_key, ne.p_name AS entity_name, a.n_rows, a.n_names,
           tb.brand AS survivor_brand, a.min_size, a.max_size,
           a.total_price_cents
    FROM agg a
    JOIN n ne ON ne.canonical_key = a.entity_key
    JOIN top_brand tb ON tb.entity_key = a.entity_key
    ORDER BY a.entity_key
    """,
)
def q_entity_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVIVORSHIP: one golden record per resolved entity — the step
    after clustering that MDM/ER pipelines actually ship. All part
    ROWS whose name belongs to the entity merge into one record:
    most-frequent brand wins (lexicographic tie-break — a
    deterministic mode, since SQL has no mode with stable ties),
    sizes report their span, prices their exact cent total, and the
    entity displays under its canonical (min-key) name.

    Plan: the pair graph + O(log n) star contraction (entity-sized),
    ONE row-table join routing each part row to its entity, a
    per-(entity, brand) vote count with a WindowGroupLimit rank-1
    pick, and one entity-keyed aggregate. At 100 TB the row table is
    the only big frame and it is touched exactly once; everything
    downstream is entity-sized."""
    from pyspark.sql import Window

    from geoparquet_python_spark.operators.dedup import (
        star_contraction_components,
    )

    p = load_table(spark, sf_dir, "part")
    n = _name_entities(spark, sf_dir)
    pairs = _fuzzy_pairs(spark, sf_dir).select("key_a", "key_b")
    comp = star_contraction_components(pairs).select(
        F.col("node").alias("member_key"), F.col("label").alias("entity_key")
    )
    rows_in = (
        p.select(
            "p_name",
            "p_brand",
            "p_size",
            F.round(F.col("p_retailprice") * 100)
            .cast("bigint")
            .alias("price_cents"),
        )
        .join(n.withColumnRenamed("canonical_key", "member_key"), "p_name")
        .join(comp, "member_key")
    )
    votes = rows_in.groupBy("entity_key", "p_brand").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("entity_key").orderBy(
        F.col("n_votes").desc(), F.col("p_brand")
    )
    top_brand = (
        votes.withColumn("rk", F.row_number().over(wv))
        .where(F.col("rk") == 1)
        .select("entity_key", F.col("p_brand").alias("survivor_brand"))
    )
    agg = rows_in.groupBy("entity_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("p_name").cast("bigint").alias("n_names"),
        F.min("p_size").cast("bigint").alias("min_size"),
        F.max("p_size").cast("bigint").alias("max_size"),
        F.sum("price_cents").cast("bigint").alias("total_price_cents"),
    )
    entity_names = n.select(
        F.col("canonical_key").alias("entity_key"),
        F.col("p_name").alias("entity_name"),
    )
    return (
        agg.join(entity_names, "entity_key")
        .join(top_brand, "entity_key")
        .select(
            "entity_key",
            "entity_name",
            "n_rows",
            "n_names",
            "survivor_brand",
            "min_size",
            "max_size",
            "total_price_cents",
        )
        .orderBy("entity_key")
    )
