"""Session windows (E3) and arbitrary stateful sessionization (E6).

E3 uses the built-in session_window — identical in batch and stream;
the registered query runs it in batch (oracle: SQL lag/cumsum
sessionization), and tests/test_streaming.py proves batch≡stream.

E6 is applyInPandasWithState: a hand-rolled gap-session operator (the
custom-stateful-operator escape hatch). Completed sessions emit when a
later event closes them; still-open sessions stay in state. The
emitted (closed) set is deterministic at end-of-stream — all sessions
except each user's final one — so the query is oracle-EXACT against a
gaps-and-islands CTE that drops each user's last session, plus a
containment test against E3.
"""

from __future__ import annotations

from decimal import Decimal, ROUND_HALF_UP
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query
from geoparquet_python_spark.streaming.source import (
    read_events_stream,
    run_to_memory_table,
    table_rows,
)

_GAP_MIN = 30

# Shared gaps-and-islands CTE prefix: lag flags a session break, the
# running sum of breaks is the session id.
_SESSION_CTE = f"""
    WITH e AS (
      SELECT user_id, date_trunc('microseconds', ts) AS tsu, value FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
                       <= INTERVAL {_GAP_MIN} MINUTE
                  THEN 0 ELSE 1 END AS new_sess
      FROM e
    ),
    sess AS (
      SELECT *,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY tsu
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sid
      FROM flagged
    )
"""

_SESSION_ORACLE = f"""
    {_SESSION_CTE}
    SELECT user_id,
           CAST(MIN(tsu) AS TIMESTAMP) AS session_start,
           CAST(MAX(tsu) + INTERVAL {_GAP_MIN} MINUTE AS TIMESTAMP) AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
"""

# The stateful operators emit exactly the sessions a LATER event closed
# — every session except each user's final (still-open) one. That set
# is deterministic at end-of-stream, so it oracle-checks exactly: the
# islands aggregate minus each user's max session id.
_CLOSED_SESSION_ORACLE = f"""
    {_SESSION_CTE}
    SELECT user_id, session_start, session_end, n_events, sum_value
    FROM (
      SELECT user_id, sid,
             CAST(MIN(tsu) AS TIMESTAMP) AS session_start,
             CAST(MAX(tsu) + INTERVAL {_GAP_MIN} MINUTE AS TIMESTAMP)
               AS session_end,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
             MAX(sid) OVER (PARTITION BY user_id) AS max_sid
      FROM sess
      GROUP BY user_id, sid
    )
    WHERE sid < max_sid
    ORDER BY user_id, session_start
"""


@query("q_session_windows", oracle=_SESSION_ORACLE)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: built-in session_window (30-minute gap) per user.

    session_window is the same expression in batch and streaming —
    this registration runs batch (deterministic full result); the
    batch≡stream parity test runs the identical plan via readStream.
    The oracle reproduces gap-merging with lag + cumulative session
    ids — a useful independent specification of the semantics.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", f"{_GAP_MIN} minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


_STATE_SCHEMA = "start_us long, last_us long, n long, sum_fp long"
_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)


_MICRO = Decimal("0.000001")


def _value_fp(value: float) -> int:
    """DECIMAL(38,6) fixed-point of a double, as int micro-units.

    Python Decimal quantizes the EXACT binary value half-up — verified
    to agree with DuckDB's CAST(double AS DECIMAL(38,6)) on every
    events.value at sf0.1. Accumulating int micro-units keeps the
    session sum order-independent and bit-exact against the oracle's
    SUM(DECIMAL) (a raw float += in event order is neither)."""
    return int(
        Decimal(value).quantize(_MICRO, rounding=ROUND_HALF_UP).scaleb(6)
    )


# JVM-side fixed-point projection of `value`, computed BEFORE the
# stateful operator so the Python side never touches a Decimal:
# CAST(double AS DECIMAL(38,6)) rounds the exact binary value half-up
# — proven equal to _value_fp on every events.value at all three SFs
# (and ties are impossible for binary doubles at scale 6, see
# functions/exact.py), so the session sums are bit-identical.
_VALUE_FP_SQL = "CAST(CAST(value AS DECIMAL(38,6)) * 1000000 AS BIGINT)"


def _sessionize_core(
    chunks: list[pd.DataFrame],
    s_start: int | None,
    s_last: int | None,
    s_n: int,
    s_sum: int,
    gap_us: int,
) -> tuple[list[tuple[int, int, int, int]], tuple]:
    """Shared gap-session recurrence over (ts, value_fp) chunks:
    returns (closed sessions as (start_us, last_us, n, sum_fp), new
    open-session state). Used by BOTH stateful runtimes
    (applyInPandasWithState here, transformWithStateInPandas in
    sessions_tws.py) so the two can never diverge.

    All Arrow chunks for the key are concatenated and sorted ONCE —
    per-chunk sorting would mis-order events that span chunk
    boundaries and close sessions at wrong edges (round-4 ADVICE).

    Vectorized (optimization r13, guide §4.2): the previous form
    looped over every event in Python with a pd.Timestamp conversion
    and a Decimal quantize per row — ~2.1 s of the operator's 3.4 s
    sf0.1 wall, dwarfing the state store itself (measured: stateless
    drain 1.0 s, JVM session_window drain 1.3 s). Timestamps now
    convert in one astype, the fixed-point values arrive precomputed
    from the JVM (_VALUE_FP_SQL), and session boundaries come from one
    vectorized gap scan + reduceat sums. Closed sessions and the open
    state are value-identical to the loop form (same oracle, same
    batch≡stream parity tests)."""
    import numpy as np

    empty = np.empty(0, dtype=np.int64)
    closed = (empty, empty, empty, empty)
    if chunks:
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(
            chunks, ignore_index=True
        )
        ts = pdf["ts"].to_numpy().astype("datetime64[ns]").astype(np.int64)
        ts //= 1000  # ns -> us, exactly int(pd.Timestamp(t).value // 1000)
        vfp = pdf["value_fp"].to_numpy().astype(np.int64)
        order = np.argsort(ts, kind="stable")
        if not np.array_equal(order, np.arange(len(ts))):
            ts, vfp = ts[order], vfp[order]
        n = len(ts)
        is_new = np.empty(n, dtype=bool)
        is_new[0] = s_start is None or (ts[0] - s_last) > gap_us
        np.greater(ts[1:] - ts[:-1], gap_us, out=is_new[1:])
        starts = np.flatnonzero(is_new)
        state_closes = s_start is not None and bool(is_new[0])
        merged = s_start is not None and not bool(is_new[0])
        bounds = (
            np.r_[0, starts, n]
            if (starts.size == 0 or starts[0] != 0)
            else np.r_[starts, n]
        )
        seg_start = ts[bounds[:-1]]
        seg_last = ts[bounds[1:] - 1]
        seg_n = np.diff(bounds)
        seg_sum = np.add.reduceat(vfp, bounds[:-1])
        if merged:
            # first segment continues the stored open session
            seg_start[0] = s_start
            seg_n[0] += s_n
            seg_sum[0] += s_sum
        # every segment except the last is closed by a later event;
        # the stored session closes FIRST when the batch starts anew
        c_start = seg_start[:-1]
        c_last = seg_last[:-1]
        c_n = seg_n[:-1]
        c_sum = seg_sum[:-1]
        if state_closes:
            c_start = np.r_[s_start, c_start]
            c_last = np.r_[s_last, c_last]
            c_n = np.r_[s_n, c_n]
            c_sum = np.r_[s_sum, c_sum]
        closed = (c_start, c_last, c_n, c_sum)
        s_start = int(seg_start[-1])
        s_last = int(seg_last[-1])
        s_n = int(seg_n[-1])
        s_sum = int(seg_sum[-1])
    return closed, (s_start, s_last, s_n, s_sum)


def _closed_frame(user_id, closed, gap_us: int) -> pd.DataFrame:
    """Vectorized output frame from _sessionize_core's closed arrays —
    identical dtypes/values to the per-session pd.Timestamp loop it
    replaced (pd.to_datetime(int64, unit='us') is the same ns-precision
    timestamp)."""
    import numpy as np

    c_start, c_last, c_n, c_sum = closed
    return pd.DataFrame(
        {
            "user_id": np.full(len(c_start), user_id, dtype=np.int64),
            "session_start": pd.to_datetime(c_start, unit="us"),
            "session_end": pd.to_datetime(c_last + gap_us, unit="us"),
            "n_events": c_n.astype(np.int64),
            "sum_value": c_sum / 1e6,
        }
    )


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap-sessionizer: state = the open session; emit sessions closed
    by a subsequent event beyond the gap (see _sessionize_core)."""
    gap_us = _GAP_MIN * 60 * 1_000_000
    if state.exists:
        s_start, s_last, s_n, s_sum = state.get
    else:
        s_start, s_last, s_n, s_sum = None, None, 0, 0
    closed, new_state = _sessionize_core(
        [pdf for pdf in batches], s_start, s_last, s_n, s_sum, gap_us
    )
    state.update(new_state)
    if len(closed[0]):
        yield _closed_frame(key[0], closed, gap_us)


@query("q_stateful_sessionization", oracle=_CLOSED_SESSION_ORACLE)
def q_stateful_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: custom stateful operator via applyInPandasWithState.

    Emits exactly the sessions a later event closed — every session
    except each user's final one, which stays open in state at end of
    stream. That closed set is deterministic, so the query is
    oracle-EXACT against the islands CTE minus each user's max session
    id (_CLOSED_SESSION_ORACLE); session sums accumulate as DECIMAL(38,6)
    fixed-point micro-units to stay bit-identical to SUM(DECIMAL).
    tests/test_streaming.py additionally asserts the emitted sessions
    are exactly the non-final sessions of the batch session_window
    result.
    """
    stream = read_events_stream(spark, sf_dir)
    # Narrow, JVM-precomputed projection into the Python state op
    # (guide §4.1/§4.2): only (user_id, ts, value_fp) crosses the
    # boundary — the fixed-point cast runs codegen'd in the JVM and the
    # stateful function never sees the other event columns.
    narrow = stream.select(
        "user_id", "ts", F.expr(_VALUE_FP_SQL).alias("value_fp")
    )
    sessions = (
        narrow.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = run_to_memory_table(
        sessions,
        output_mode="append",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
    return spark.table(name).orderBy("user_id", "session_start")
