"""CDC changelog compaction + MERGE-INTO (upsert/delete) application.

The incremental-corpus maintenance shape every warehouse/lakehouse
runs (Delta/Iceberg `MERGE INTO`, Kafka compacted topics, Debezium
snapshots): a keyed changelog is COMPACTED to last-op-wins state, and
a newer delta batch is MERGED into the base snapshot — insert where
the key is new, update where it exists, delete where the delta's
final op is a tombstone. operators/windows.py:q_scd2_user_state keeps
the full validity-interval HISTORY; this module produces the other
artifact, the current SNAPSHOT, and labels every key with the merge
action an engine would have taken.

No reference equivalent (SURVEY.md §0 provenance) — [N] north-star
scope: at 100 TB this is how the corpus ingests daily crawls without
rewriting itself.

Changelog mapping over the synthetic `events` table: `user_id` is the
key, (`ts`, `event_id`) the total op order, `error` the tombstone op,
everything else an upsert carrying `value`.

Spark-first shape / scale:
- each side compacts with ONE hash aggregate (count + max_by ordered
  on the unique (ts, event_id) pair) — a single shuffle of the
  changelog on its key, and since r12 the last-op pick is a
  map-side-combinable aggregate like the count (no window sort);
- the merge is one full-outer equi-join on that same key: with both
  sides hash-partitioned on user_id, AQE reuses the exchange — the
  fact table moves once per side, total;
- the action label is a pure CASE projection, codegen-fused.
- Keys are uniform user ids; a skewed changelog key (celebrity row)
  would take the salted-window route of operators/skew.py.

Determinism: op order is the unique (ts, event_id) pair; values are
carried doubles, never re-accumulated — bit-identical on any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.registry import query

_CUTOFF = "2024-01-16 00:00:00"
_TOMBSTONE = "error"


def _compact(e: DataFrame) -> DataFrame:
    """Last-op-wins compaction of a changelog slice: one row per
    user_id with the final op and an op count.

    Optimization r12 (guide §2.3): last-op selection as ONE max_by
    aggregate ordered on struct(ts, event_id) — the same deterministic
    total order the oracle spells with row_number (the equivalence the
    streaming OHLC twin certifies against a shared oracle). vs the
    previous row_number window + groupBy: the per-partition sort
    disappears and the aggregate gains map-side partials, so the
    user_id exchange carries one partial row per key per map task
    instead of the whole changelog slice."""
    last = F.max_by(
        F.struct("event_type", "value", "ts"), F.struct("ts", "event_id")
    )
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_ops"),
            last.alias("_last"),
        )
        .select(
            "user_id",
            "n_ops",
            F.col("_last.event_type").alias("op"),
            F.col("_last.value").alias("value"),
            F.col("_last.ts").alias("ts"),
        )
    )


def _sql_compact(pred: str, out: str) -> str:
    return f"""{out} AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ops,
             MAX(CASE WHEN rn = 1 THEN event_type END) AS op,
             MAX(CASE WHEN rn = 1 THEN value END) AS value,
             MAX(CASE WHEN rn = 1 THEN ts END) AS ts
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE {pred}
      ) GROUP BY user_id
    )"""


@query(
    "q_cdc_merge_upsert",
    oracle=f"""
    WITH {_sql_compact(f"ts < TIMESTAMP '{_CUTOFF}'", "base_all")},
    {_sql_compact(f"ts >= TIMESTAMP '{_CUTOFF}'", "delta")},
    base AS (SELECT * FROM base_all WHERE op <> '{_TOMBSTONE}')
    SELECT COALESCE(b.user_id, d.user_id) AS user_id,
           CASE
             WHEN d.user_id IS NULL THEN 'carry'
             WHEN d.op = '{_TOMBSTONE}' AND b.user_id IS NOT NULL
               THEN 'delete'
             WHEN d.op = '{_TOMBSTONE}' THEN 'delete_noop'
             WHEN b.user_id IS NULL THEN 'insert'
             ELSE 'update'
           END AS action,
           CASE WHEN d.user_id IS NULL THEN b.value
                WHEN d.op <> '{_TOMBSTONE}' THEN d.value END AS final_value,
           CAST(COALESCE(d.ts, b.ts) AS TIMESTAMP) AS last_ts,
           CAST(COALESCE(b.n_ops, 0) AS BIGINT) AS n_base_ops,
           CAST(COALESCE(d.n_ops, 0) AS BIGINT) AS n_delta_ops
    FROM base b FULL OUTER JOIN delta d ON d.user_id = b.user_id
    ORDER BY user_id
    """,
)
def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE a compacted delta batch (ts >= cutoff) into the compacted
    base snapshot (ts < cutoff): per key, the action an engine's
    `MERGE INTO` would take (`insert`/`update`/`delete`/`delete_noop`/
    `carry`) plus the post-merge value (NULL where the key ends
    deleted). The post-merge snapshot is exactly the rows with action
    NOT IN ('delete', 'delete_noop')."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    cutoff = F.to_timestamp(F.lit(_CUTOFF))
    base = (
        _compact(e.where(F.col("ts") < cutoff))
        .where(F.col("op") != _TOMBSTONE)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("n_ops").alias("n_base_ops"),
            F.col("value").alias("b_value"),
            F.col("ts").alias("b_ts"),
        )
    )
    delta = _compact(e.where(F.col("ts") >= cutoff)).select(
        F.col("user_id").alias("d_user"),
        F.col("n_ops").alias("n_delta_ops"),
        F.col("op").alias("d_op"),
        F.col("value").alias("d_value"),
        F.col("ts").alias("d_ts"),
    )
    merged = base.join(
        delta, F.col("b_user") == F.col("d_user"), "full_outer"
    )
    is_del = F.col("d_op") == _TOMBSTONE
    action = (
        F.when(F.col("d_user").isNull(), F.lit("carry"))
        .when(is_del & F.col("b_user").isNotNull(), F.lit("delete"))
        .when(is_del, F.lit("delete_noop"))
        .when(F.col("b_user").isNull(), F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    return merged.select(
        F.coalesce("b_user", "d_user").alias("user_id"),
        action.alias("action"),
        F.when(F.col("d_user").isNull(), F.col("b_value"))
        .when(~is_del, F.col("d_value"))
        .alias("final_value"),
        F.coalesce("d_ts", "b_ts").alias("last_ts"),
        F.coalesce("n_base_ops", F.lit(0).cast("bigint")).alias("n_base_ops"),
        F.coalesce("n_delta_ops", F.lit(0).cast("bigint")).alias(
            "n_delta_ops"
        ),
    ).orderBy("user_id")
