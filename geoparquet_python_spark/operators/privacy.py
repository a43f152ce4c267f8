"""Differentially private releases of corpus statistics: the Laplace
mechanism with a DETERMINISTIC (hash-seeded) noise draw, so the
release is reproducible and oracle-checkable while keeping the exact
counts out of the output.

Reference parity: the reference engine (SURVEY.md §0.2 — nil surface
beyond GeoParquet I/O) has no privacy layer; this is part of the
mandated LLM-training-pipeline extension surface — corpus-composition
dashboards (how many docs per language/source) are routinely shared
outside the data team, and DP release is the standard way to do that
without leaking membership. Companions: q_k_anonymity_audit (indirect
identifiers) and q_redact_props_digits (direct identifiers) in
operators/quality.py.

Mechanism (Dwork et al. 2006): for add/remove-one-document neighbors
each per-language count has L1 sensitivity 1, the language cells are
disjoint, so by parallel composition one epsilon covers the whole
histogram. Laplace(b = 1/epsilon) noise via inverse CDF:
X = -b * sign(u) * ln(1 - 2|u|) for u ~ Uniform(-1/2, 1/2).

Determinism: u comes from the md5 content hash of a versioned seed
string + the group key (the corpus-wide hash convention,
functions/text.py), mapped to the odd lattice (h % 999999) - 499999
over 1e6 — so |u| <= 0.499999 and the ln argument is >= 2e-6 (never
0). ln is the one transcendental; its result is rounded to the 1e-6
grid immediately (the sigmoid/haversine precedent), after which the
noisy release is a fixed IEEE chain on exact inputs — bit-identical
across engines and partitionings. A real deployment would swap the
hash-seeded u for a CSPRNG draw; everything else is unchanged.

Why this shape wins at 100 TB: the query is ONE map-side-combinable
count aggregation over the corpus; the mechanism runs post-aggregation
on the |languages|-row frame. Privacy cost is fixed (epsilon), compute
cost is a count(*) — DP release is an O(domain) decoration on an
aggregate, never a per-row pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_EPS = 0.5
_B = 1.0 / _EPS  # Laplace scale, sensitivity 1
_SEED = "dp-v1:"
# Worst-case |noise| on the u lattice: b * ln(1e6 / 2) ~= 26.25 — the
# certified tail bound below (27.0) can only fail if the mechanism or
# the lattice changed.
_TAIL = 27.0

# Shared-text noise chain over an integer column `ulat` in
# [-499999, 499999] (identical on both engines; ln rounded to 1e-6).
_U = "(CAST(ulat AS DOUBLE) / 1000000.0)"
_NOISE = f"round(-({_B}) * sign({_U}) * ln(1.0 - 2.0 * abs({_U})), 6)"


@query(
    "q_dp_noisy_counts",
    oracle=f"""
    WITH g AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents
      GROUP BY lang
    ),
    seeded AS (
      SELECT lang, c,
             (CAST(('0x' || substr(md5('{_SEED}' || lang), 1, 15)) AS BIGINT)
              % 999999) - 499999 AS ulat
      FROM g
    ),
    noised AS (
      SELECT lang, c, {_NOISE} AS noise FROM seeded
    )
    SELECT lang,
           CAST(c AS DOUBLE) + noise AS noisy_count,
           CAST({_EPS} AS DOUBLE) AS epsilon,
           (abs(noise) <= {_TAIL}) AS tail_ok
    FROM noised ORDER BY lang
    """,
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epsilon-differentially-private per-language document counts via
    the Laplace mechanism (epsilon = {_EPS}, sensitivity 1, parallel
    composition across the disjoint language cells). The exact counts
    never appear in the output — only the noisy release, the epsilon
    spent, and an in-plan certification that the (deterministic)
    noise draw stayed inside its lattice tail bound. See the module
    docstring for the determinism contract and the CSPRNG caveat."""
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    seeded = g.select(
        "lang",
        "c",
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(_SEED), F.col("lang"))), 1, 15),
                16,
                10,
            ).cast("long")
            % 999999
            - 499999
        ).alias("ulat"),
    )
    noised = seeded.select("lang", "c", F.expr(_NOISE).alias("noise"))
    return noised.select(
        "lang",
        (F.col("c").cast("double") + F.col("noise")).alias("noisy_count"),
        F.lit(float(_EPS)).alias("epsilon"),
        (F.abs(F.col("noise")) <= _TAIL).alias("tail_ok"),
    ).orderBy("lang")
