"""Streaming per-key anomaly detection (E6 family): flag events whose
value deviates >3σ from THAT USER'S OWN prior history, maintained as
running moments in the state store.

The ingestion-time tripwire every event pipeline wants: per-key (not
global) baselines, updated incrementally, flagging as data arrives.
Batch q_value_outliers is the global z-score sibling; this one is
stateful and per-key.

Exactness story (why a probabilistic-looking monitor oracle-checks
bit-for-bit): the z-score test is rewritten in INTEGER algebra. With
x centi-quantized (x_c = round(100·x), mirrored in SQL), prior count
n, prior sum S = Σx_c, prior square-sum Q = Σx_c², the test

    |x − mean| > 3·σ   ⇔   (n·x_c − S)² > 9·(n·Q − S²)

has both sides integer (population σ over priors; the n² denominators
cancel). No float ever enters the decision, so Spark's stateful
operator and DuckDB's cumulative-window CTE agree exactly. The
squared terms are evaluated in DECIMAL(38,0)/Python int to stay exact
when n·x_c overflows int64 at extreme key histories.

Scale: state is 3 numbers per key; per-microbatch work is O(events
for the key in the batch). Same state-partitioning story as the gap
sessionizer (streaming/sessions.py).
"""

from __future__ import annotations

from decimal import Decimal, ROUND_HALF_UP
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geoparquet_python_spark.registry import query
from geoparquet_python_spark.streaming.source import (
    read_events_stream,
    run_to_memory_table,
    table_rows,
)

_MIN_PRIOR = 10  # need this much history before flagging
_Z2 = 9  # 3-sigma squared

_CENTI = Decimal("0.01")

_STATE_SCHEMA = "n long, s long, q long"
_OUT_SCHEMA = (
    "user_id bigint, ts timestamp, event_id bigint, value double, "
    "n_prior bigint"
)


def _centi(value: float) -> int:
    """round(100·x) on the exact binary double, half-up — verified to
    match both engines' double→DECIMAL(38,2) conversion (same check as
    sessions._value_fp at 6 dp)."""
    return int(Decimal(value).quantize(_CENTI, rounding=ROUND_HALF_UP).scaleb(2))


def _detect_group(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running-moments recurrence per user; emit events whose
    integer-algebra z² exceeds 9 against the PRIOR moments."""
    if state.exists:
        n, s, q = state.get
    else:
        n, s, q = 0, 0, 0
    user_id = key[0]
    flagged = []
    chunks = [pdf for pdf in batches]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        for ts, event_id, value in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
            xc = _centi(float(value))
            # ints are unbounded in Python — no overflow at any history
            if n >= _MIN_PRIOR and (n * xc - s) ** 2 > _Z2 * (n * q - s * s):
                flagged.append((user_id, ts, event_id, float(value), n))
            n, s, q = n + 1, s + xc, q + xc * xc
    state.update((n, s, q))
    if flagged:
        yield pd.DataFrame(
            flagged, columns=["user_id", "ts", "event_id", "value", "n_prior"]
        )


@query(
    "q_stream_value_anomalies",
    oracle=f"""
    WITH e AS (
      SELECT user_id, date_trunc('microseconds', ts) AS tsu, event_id,
             value,
             CAST(CAST(value AS DECIMAL(38,2)) * 100 AS BIGINT) AS xc
      FROM events
    ),
    m AS (
      SELECT user_id, tsu, event_id, value, xc,
             COUNT(*) OVER w AS n,
             COALESCE(SUM(xc) OVER w, 0) AS s,
             COALESCE(SUM(xc * xc) OVER w, 0) AS q
      FROM e
      WINDOW w AS (
        PARTITION BY user_id ORDER BY tsu, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      )
    )
    SELECT user_id, CAST(tsu AS TIMESTAMP) AS ts, event_id, value,
           CAST(n AS BIGINT) AS n_prior
    FROM m
    WHERE n >= {_MIN_PRIOR}
      AND CAST(n * xc - s AS DECIMAL(38,0)) * CAST(n * xc - s AS DECIMAL(38,0))
          > {_Z2} * (CAST(n AS DECIMAL(38,0)) * q
                     - CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)))
    ORDER BY user_id, ts, event_id
    """,
)
def q_stream_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user streaming 3σ anomaly flags via applyInPandasWithState:
    state carries (count, Σx_c, Σx_c²); each arriving event is tested
    against its user's PRIOR moments with the integer z² predicate
    (module docstring), then folded in. Oracle: the same predicate
    over cumulative window sums in DuckDB — exact, because the whole
    decision is integer algebra on identically-quantized values.
    """
    stream = read_events_stream(spark, sf_dir).select(
        "user_id", "ts", "event_id", "value"
    )
    flagged = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("user_id")
        .applyInPandasWithState(
            _detect_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = run_to_memory_table(
        flagged,
        output_mode="append",
        source_rows=table_rows(spark, sf_dir, "events"),
    )
    return spark.table(name).orderBy("user_id", "ts", "event_id")
