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


def _sessionize_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap-sessionizer: state = the open session; emit sessions closed
    by a subsequent event beyond the gap.

    All Arrow chunks for the key are concatenated and sorted ONCE —
    per-chunk sorting would mis-order events that span chunk
    boundaries and close sessions at wrong edges (round-4 ADVICE)."""
    gap_us = _GAP_MIN * 60 * 1_000_000
    if state.exists:
        start_us, last_us, n, sum_fp = state.get
    else:
        start_us, last_us, n, sum_fp = None, None, 0, 0
    closed: list[tuple[int, int, int, int, int]] = []
    user_id = key[0]
    chunks = [pdf for pdf in batches]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            ts_us = int(pd.Timestamp(ts).value // 1000)
            if last_us is not None and ts_us - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n, sum_fp))
                start_us, last_us = ts_us, ts_us
                n, sum_fp = 1, _value_fp(value)
            else:
                start_us = ts_us if start_us is None else start_us
                last_us = ts_us
                n += 1
                sum_fp += _value_fp(value)
    state.update((start_us, last_us, n, sum_fp))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [
                    pd.Timestamp(c[2] + gap_us, unit="us") for c in closed
                ],
                "n_events": [c[3] for c in closed],
                "sum_value": [c[4] / 1e6 for c in closed],
            }
        )


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
    sessions = (
        stream.withWatermark("ts", "2 hours")
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
