"""Local mirror of the driver's oracle-diff harness (SURVEY.md §5.2).

Runs a registered Spark query and its DuckDB oracle side by side and
compares row count, column names, and values order-insensitively —
exact for non-floats, bit-exact-by-default for floats (the engine's
aggregates are designed to be order-independent; see functions/exact.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from geoparquet_python_spark.io import TABLES


def duckdb_connect(sf_dir: str):
    """DuckDB connection with the driver's table views pre-registered."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize timestamps to µs, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        elif s.dtype == object and s.notna().any():
            first = s.dropna().iloc[0]
            if isinstance(first, (bytes, bytearray)):
                s = s.map(lambda b: None if b is None else bytes(b))
            elif type(first).__name__ == "date":
                # Spark DateType → datetime.date objects; DuckDB DATE →
                # datetime64. Normalize both to datetime64[us].
                s = pd.to_datetime(s).astype("datetime64[us]")
        out[c] = s
    df = pd.DataFrame(out)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort", na_position="last")
        df = df.reset_index(drop=True)
    return df


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "?",
                   float_rtol: float = 0.0) -> None:
    """Raise AssertionError with a readable diff on any mismatch."""
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"[{name}] column mismatch: spark={list(a.columns)} oracle={list(b.columns)}"
    )
    assert len(a) == len(b), f"[{name}] row count: spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver's value hash is dtype-sensitive: int64 402 vs float64
        # 402.0 hash-differ even though == passes. DuckDB returns HUGEINT
        # for integer SUM, which pandas materializes as float64 — oracles
        # must CAST(... AS BIGINT) so both sides agree. Flag the split
        # here instead of silently coercing (round-1 CORRECTNESS red).
        a_f, b_f = pd.api.types.is_float_dtype(av), pd.api.types.is_float_dtype(bv)
        a_i, b_i = pd.api.types.is_integer_dtype(av), pd.api.types.is_integer_dtype(bv)
        if (a_f and b_i) or (a_i and b_f):
            raise AssertionError(
                f"[{name}] col {c!r} int/float dtype split: spark={av.dtype} "
                f"oracle={bv.dtype} — driver value-hash would mismatch; "
                f"CAST the oracle aggregate to BIGINT (or align the Spark side)"
            )
        if a_f or b_f:
            avf = av.astype("float64").to_numpy()
            bvf = bv.astype("float64").to_numpy()
            both_nan = np.isnan(avf) & np.isnan(bvf)
            if float_rtol == 0.0:
                ok = (avf == bvf) | both_nan
            else:
                ok = np.isclose(avf, bvf, rtol=float_rtol, atol=0) | both_nan
            if not ok.all():
                i = int(np.argmin(ok))
                raise AssertionError(
                    f"[{name}] float col {c!r}: {int((~ok).sum())}/{len(ok)} differ; "
                    f"first at row {i}: spark={avf[i]!r} oracle={bvf[i]!r} "
                    f"(maxabs={np.nanmax(np.abs(avf - bvf))!r})"
                )
        else:
            an = av.where(pd.notna(av), None).tolist()
            bn = bv.where(pd.notna(bv), None).tolist()
            if an != bn:
                bad = [(i, x, y) for i, (x, y) in enumerate(zip(an, bn)) if x != y][:5]
                raise AssertionError(f"[{name}] col {c!r} differs, first diffs: {bad}")


def run_compare(spark, duck_con, name: str, fn, oracle: str | None, sf_dir: str,
                float_rtol: float = 0.0) -> int:
    """Execute one registered query against its oracle. Returns row count."""
    sdf = fn(spark, sf_dir).toPandas()
    if oracle is None:
        assert len(sdf) >= 0
        return len(sdf)
    opdf = duck_con.execute(oracle).df()
    compare_frames(sdf, opdf, name=name, float_rtol=float_rtol)
    return len(sdf)


# ---------------------------------------------------------------------------
# Engine-side order-insensitive value hash (VERDICT r8 item 1).
#
# The row-level compare above materializes BOTH result sets driver-side
# (toPandas + duckdb .df()), which for multi-million-row results (e.g.
# q_simhash_blocked_pairs_loose, 5.5M pairs at sf0.1) is the single
# reason evidence runs ever needed a bigger driver heap. The same
# order-insensitive equality can be decided from THREE SCALARS computed
# inside each engine:
#
#   piece(col) = md5(CAST(col AS STRING))        -- null -> 'null' (the
#                                                   letters n/u/l are not
#                                                   hex digits, so the
#                                                   sentinel can never be
#                                                   confused with a hash
#                                                   piece: concat stays
#                                                   injective)
#   row_str    = concat(pieces in sorted-column-name order)
#   h          = md5_long(row_str)               -- 60-bit int
#   summary    = (COUNT(*), SUM(h) as exact int, BIT_XOR(h))
#
# SUM is order-insensitive and multiset-faithful; BIT_XOR adds an
# independent check (XOR alone would let even-multiplicity duplicates
# cancel). Only type families whose CAST-to-string forms are identical
# across Spark and DuckDB participate (ints, boolean, string, date);
# anything else — floats, timestamps, arrays, binary — falls back to the
# row-level path, which stays the debugging tool for mismatches.
# ---------------------------------------------------------------------------

_SPARK_FAMILY = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "boolean": "bool", "string": "str", "date": "date",
}
_DUCK_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "BOOLEAN": "bool", "VARCHAR": "str", "DATE": "date",
}


def spark_hash_summary(sdf):
    """(count, hash_sum, hash_xor, {col: family}) computed engine-side.

    Returns None when any column's type is outside the cross-engine
    canonical-string-safe set — the caller falls back to the row-level
    compare.
    """
    from pyspark.sql import functions as F

    fams, pieces = {}, []
    for fld in sorted(sdf.schema.fields, key=lambda f: f.name):
        fam = _SPARK_FAMILY.get(fld.dataType.simpleString())
        if fam is None:
            return None
        fams[fld.name] = fam
        pieces.append(F.coalesce(F.md5(F.col(fld.name).cast("string")), F.lit("null")))
    h = F.conv(F.substring(F.md5(F.concat(*pieces)), 1, 15), 16, 10).cast("long")
    row = (
        sdf.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("hs"),
            F.expr("bit_xor(h)").alias("hx"),
        )
        .collect()[0]
    )
    return int(row["c"]), int(row["hs"] or 0), int(row["hx"] or 0), fams


def duck_hash_summary(con, oracle: str):
    """DuckDB mirror of spark_hash_summary over an oracle SQL string.

    Registers the oracle as a temp view (nothing executes until the
    scalar aggregate runs), DESCRIBEs it for the type check, and
    computes the identical (count, sum, xor) triple. Returns None when
    any output column's type is outside the hash-safe set.
    """
    con.execute("CREATE OR REPLACE TEMP VIEW __graft_oracle AS " + oracle)
    desc = con.execute("DESCRIBE __graft_oracle").fetchall()
    fams, pieces = {}, []
    for row in sorted(desc, key=lambda r: r[0]):
        name, dtype = row[0], row[1].upper()
        fam = _DUCK_FAMILY.get(dtype)
        if fam is None:
            return None
        fams[name] = fam
        pieces.append(f"COALESCE(md5(CAST(\"{name}\" AS VARCHAR)), 'null')")
    concat = " || ".join(pieces)
    c, hs, hx = con.execute(
        "SELECT COUNT(*), "
        "CAST(COALESCE(SUM(h), 0) AS VARCHAR), "
        "COALESCE(BIT_XOR(h), 0) "
        "FROM (SELECT CAST(('0x' || substr(md5(" + concat + "), 1, 15)) AS BIGINT) AS h "
        "FROM __graft_oracle)"
    ).fetchone()
    return int(c), int(hs), int(hx), fams


def run_compare_engine_side(spark, duck_con, name: str, fn, oracle: str | None,
                            sf_dir: str, row_level_limit: int = 200_000):
    """Scale-safe oracle compare: scalars by default, rows for debugging.

    Returns (row_count, mode) with mode in {'hash', 'pandas', 'rows-only'}.
    On a hash mismatch with a small result the row-level compare re-runs
    to produce a readable diff; large results raise with the scalar
    summary (materializing them driver-side is exactly what this path
    exists to avoid).
    """
    sdf = fn(spark, sf_dir)
    if oracle is None:
        return sdf.count(), "rows-only"
    s = spark_hash_summary(sdf)
    d = duck_hash_summary(duck_con, oracle) if s is not None else None
    if s is None or d is None:
        pdf = sdf.toPandas()
        opdf = duck_con.execute(oracle).df()
        compare_frames(pdf, opdf, name=name)
        return len(pdf), "pandas"
    sc, ss, sx, sfam = s
    dc, ds, dx, dfam = d
    if sfam != dfam:
        raise AssertionError(
            f"[{name}] schema/type-family mismatch: spark={sfam} oracle={dfam}"
        )
    if sc != dc:
        raise AssertionError(f"[{name}] row count: spark={sc} oracle={dc}")
    if (ss, sx) != (ds, dx):
        if sc <= row_level_limit:
            compare_frames(sdf.toPandas(), duck_con.execute(oracle).df(), name=name)
            raise AssertionError(
                f"[{name}] engine-side hash mismatch (sum {ss} vs {ds}, "
                f"xor {sx} vs {dx}) but row-level compare PASSED — "
                f"canonicalization bug in the hash path, not the query"
            )
        raise AssertionError(
            f"[{name}] value-hash mismatch over {sc} rows: "
            f"sum {ss} vs {ds}, xor {sx} vs {dx}"
        )
    return sc, "hash"
