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
