"""Batch ≡ stream parity (SURVEY.md §5.2) and stateful-session
containment checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from geoparquet_python_spark import registry
from geoparquet_python_spark.io import load_table
from geoparquet_python_spark.testing import canonicalize

registry.load_all()


def test_batch_stream_parity_tumbling(spark, sf_dir):
    """The same windowed aggregation over read vs readStream+availableNow
    must produce identical results."""
    stream_result = registry.QUERIES["q_stream_tumbling_counts"](
        spark, sf_dir
    ).toPandas()
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
        .toPandas()
    )
    a, b = canonicalize(stream_result), canonicalize(batch)
    assert a.equals(b), "batch and streaming window aggregation diverge"


def test_stateful_sessions_subset_of_session_windows(spark, sf_dir):
    """applyInPandasWithState emits exactly the sessions that a later
    event closed — i.e. every session from the batch session_window
    result except each user's final session."""
    stateful = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in registry.QUERIES["q_stateful_sessionization"](
            spark, sf_dir
        ).collect()
    }
    batch_rows = registry.QUERIES["q_session_windows"](spark, sf_dir).collect()
    last_start = {}
    for r in batch_rows:
        if r.user_id not in last_start or r.session_start > last_start[r.user_id]:
            last_start[r.user_id] = r.session_start
    expected = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch_rows
        if r.session_start != last_start[r.user_id]
    }
    assert stateful == expected, (
        f"missing={sorted(expected - stateful)[:3]} "
        f"extra={sorted(stateful - expected)[:3]}"
    )


def test_parquet_sink_append_with_watermark(spark, sf_dir, tmp_path):
    """E8: append-mode parquet sink. With a watermark, append only emits
    windows the final watermark passed; availableNow's last commit
    advances the watermark past max(ts) - 2h, so all but the trailing
    windows land in the files. Verify emitted rows are a prefix-subset
    of the batch result and nothing is duplicated."""
    from geoparquet_python_spark.streaming.source import read_events_stream

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    agg = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("day"), "n")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {(r.day, r.n) for r in spark.read.parquet(out).collect()}
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("day"), "n")
    )
    want = {(r.day, r.n) for r in batch.collect()}
    assert got <= want, "append sink emitted rows batch doesn't have"
    # everything except (at most) the windows still open at the final
    # watermark must have been emitted
    missing = want - got
    assert len(missing) <= 2, f"too many unemitted windows: {sorted(missing)}"
    assert len(got) == len({d for d, _ in got}), "duplicate windows in sink"


def test_foreachbatch_idempotent_upsert_exactly_once(spark, sf_dir, tmp_path):
    """The production sink pattern for non-transactional stores:
    foreachBatch + an epoch-id commit marker, so a retried/restarted
    batch is skipped instead of double-written. Drain the same
    checkpointed stream twice — the second run must add NOTHING (the
    checkpoint already covers the input), and the output must equal
    the batch answer exactly once."""
    import os

    from geoparquet_python_spark.streaming.source import read_events_stream

    out = str(tmp_path / "upsert_out")
    marks = str(tmp_path / "epoch_marks")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(marks, exist_ok=True)

    def upsert(df, epoch_id):
        mark = os.path.join(marks, f"epoch-{epoch_id}")
        if os.path.exists(mark):  # retried epoch: already committed
            return
        df.write.mode("append").parquet(out)
        open(mark, "w").close()

    def drain():
        q = (
            read_events_stream(spark, sf_dir)
            .where(F.col("event_type") == "purchase")
            .select("event_id", "user_id", "value")
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = spark.read.parquet(out).count()
    drain()  # same checkpoint: no new input -> no new epochs -> no writes
    second = spark.read.parquet(out).count()
    expected = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert first == expected
    assert second == expected, "restarted drain duplicated rows"


class _FakeValueState:
    """Stand-in for the TWS ValueState protocol (exists/get/update) so
    the StatefulProcessor logic runs without the protobuf state server."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        self.states[name] = _FakeValueState()
        return self.states[name]


def test_tws_processor_matches_applyinpandaswithstate(spark, sf_dir):
    """Drive the Spark-4 StatefulProcessor directly, one call per user
    (the single-microbatch shape availableNow produces here): emitted
    closed sessions must equal the applyInPandasWithState operator's
    output row-for-row."""
    import pandas as pd

    from geoparquet_python_spark.streaming.sessions_tws import (
        _GapSessionProcessor,
    )

    events = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .toPandas()
    )
    emitted = []
    for user_id, grp in events.groupby("user_id"):
        proc = _GapSessionProcessor()
        proc.init(_FakeHandle())
        for out in proc.handleInputRows((user_id,), iter([grp]), None):
            emitted.append(out)
        proc.close()
    got = canonicalize(pd.concat(emitted, ignore_index=True))
    want = canonicalize(
        registry.QUERIES["q_stateful_sessionization"](spark, sf_dir).toPandas()
    )
    assert got.equals(want), "TWS processor diverges from sibling operator"


def test_tws_query_parity(spark, sf_dir):
    """The registered TWS query equals the applyInPandasWithState query
    (real transformWithStateInPandas where protobuf exists; documented
    fallback otherwise — either path must hold the output contract)."""
    a = canonicalize(
        registry.QUERIES["q_stateful_sessionization_tws"](spark, sf_dir).toPandas()
    )
    b = canonicalize(
        registry.QUERIES["q_stateful_sessionization"](spark, sf_dir).toPandas()
    )
    assert a.equals(b)


def test_stream_neardup_screen_ignores_short_docs(spark, tmp_path):
    """Docs with fewer than k=3 tokens have EMPTY shingle arrays; before
    the size('sh') > 0 guard their NULL minhash slots collapsed every
    band sig to the same empty string, so every short stream doc
    band-matched every short corpus doc (round-4 ADVICE). Plant two
    short docs (one on each side of the even/odd corpus split) plus one
    true near-dup pair: the short docs must NOT appear in the screen
    output, the real pair must."""
    import pandas as pd

    texts = [
        "hi there",  # doc 0: even -> corpus side, 2 tokens
        "yo",  # doc 1: odd -> stream-only, 1 token
        "completely unrelated filler document alpha beta gamma",
        "another unrelated filler document delta epsilon zeta",
        "the quick brown fox jumps over the lazy dog tonight again",
        "the quick brown fox jumps over the lazy dog tonight today",
    ]
    d = str(tmp_path)
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["planted"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(f"{d}/documents.parquet")

    rows = registry.QUERIES["q_stream_neardup_screen"](spark, d).collect()
    flagged = {r.doc_id: r.min_match_doc for r in rows}
    assert 0 not in flagged and 1 not in flagged, (
        "short (<k tokens) docs must be dropped before banding, got "
        f"{flagged}"
    )
    # doc 5 (odd, stream side) near-dups doc 4 (even, in corpus)
    assert flagged.get(5) == 4
