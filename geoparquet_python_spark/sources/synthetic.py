"""Spark 4 Python Data Source API (SPARK-44076): a content-addressed
synthetic-documents source, registered as ``format("synthetic_docs")``.

The reference's entire source surface is "read a Parquet file"; a real
engine also needs the ESCAPE HATCH for sources Spark doesn't ship —
REST feeds, proprietary formats, generators. Spark 4 finally exposes
that in pure Python (DataSource / DataSourceReader / InputPartition),
and this module exercises it end-to-end: schema declaration, option
handling, and PARTITIONED parallel reads (one InputPartition per
shard — the reader scales across executors like any file source).

Everything generated is content-addressed (md5 of "doc_id:j"), so the
source is bit-reproducible across retries/partitionings AND exactly
mirrorable in DuckDB SQL — the registered query's oracle regenerates
the same corpus with generate_series + md5 and must hash-match.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_DEFAULT_ROWS = 1000
_DEFAULT_PARTS = 8


def doc_text(doc_id: int) -> str:
    """3 + (doc_id % 5) tokens; token j = first 6 hex chars of
    md5('{doc_id}:{j}'). Mirrored verbatim in the SQL oracle."""
    n_tok = 3 + doc_id % 5
    return " ".join(
        hashlib.md5(f"{doc_id}:{j}".encode()).hexdigest()[:6]
        for j in range(n_tok)
    )


class _Part(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", _DEFAULT_ROWS))
        self.parts = int(options.get("partitions", _DEFAULT_PARTS))
        # generation range, narrowed by pushFilters (Spark 4.1 Python
        # DS filter pushdown; requires
        # spark.sql.python.filterPushdown.enabled=true)
        self.lo = 0
        self.hi = self.rows

    def pushFilters(self, filters):
        """Consume doc_id range/point filters by narrowing the
        GENERATION range — pushdown to the source in the strongest
        sense: filtered ids are never generated, not generated then
        dropped. Everything else is yielded back for Spark to
        evaluate post-scan (the contract: returned filters are the
        residual, by reference)."""
        for f in filters:
            consumed = False
            if getattr(f, "attribute", None) == ("doc_id",) and isinstance(
                getattr(f, "value", None), int
            ):
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    consumed = True
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    consumed = True
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    consumed = True
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    consumed = True
                elif isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    consumed = True
            if not consumed:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = hi - lo
        if n == 0:
            return [_Part(lo, lo)]
        step = -(-n // self.parts)  # ceil
        return [
            _Part(p, min(p + step, hi)) for p in range(lo, hi, step)
        ]

    def read(self, partition: _Part) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, doc_text(doc_id))


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("rows", N)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticDocsStreamReader":
        return SyntheticDocsStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "ManifestJsonlWriter":
        return ManifestJsonlWriter(self.options, overwrite)


def register(spark) -> None:
    # A reader that implements pushFilters() REQUIRES the session conf
    # to be on — Spark 4.1 refuses the read otherwise
    # (DATA_SOURCE_PUSHDOWN_DISABLED) — so registration enables it;
    # every consumer of this source goes through register().
    #
    # SESSION-WIDE MUTATION, by design: the conf stays flipped for the
    # session's lifetime. It cannot be restored after the q_pyds_*
    # queries because they return LAZY DataFrames — the conf is read
    # at execution time, which happens after register() returns (the
    # driver collects later). The flag only affects Python data
    # sources that implement pushFilters(); built-in sources and
    # plain Python sources ignore it, and this repo's only
    # pushFilters() reader is this one. Tests that need the prior
    # value save/restore it themselves (tests/test_llm_ops.py).
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticDocsDataSource)


# ---------------------------------------------------------------- streaming


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source (SimpleDataSourceStreamReader:
    offset dict in, (rows, next offset) out; readBetweenOffsets replays
    a committed range for recovery — trivially exact here because
    generation is content-addressed, the property that makes the source
    replayable/exactly-once under checkpoint recovery). Emits up to
    ``batch`` docs per micro-batch until ``rows`` have been produced."""

    def __init__(self, options):
        self.rows = int(options.get("rows", _DEFAULT_ROWS))
        self.batch = int(options.get("batch", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch, self.rows)
        return (
            iter([(i, doc_text(i)) for i in range(lo, hi)]),
            {"next": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([(i, doc_text(i)) for i in range(start["next"], end["next"])])


# ---------------------------------------------------------------- writer


class _FileCommit(WriterCommitMessage):
    """One per task: the file it wrote + its row count and checksum.
    Only files named in a commit message reach the manifest — files
    from failed/speculative task attempts are dead on arrival, which
    is the whole exactly-once story of the V2 commit protocol."""

    def __init__(self, filename: str, n_rows: int, cksum: int):
        self.filename = filename
        self.n_rows = n_rows
        self.cksum = cksum


class ManifestJsonlWriter(DataSourceWriter):
    """Batch writer face of the Python Data Source API: each task
    streams its partition to ``part-{pid}-{uuid}.jsonl`` and returns a
    commit message; the DRIVER's commit() writes ``_MANIFEST.json``
    naming exactly the committed files (+ per-file checksums and the
    total). Readers that go through the manifest never see output of
    aborted attempts — the same visibility contract as Parquet's
    _SUCCESS+file-listing, made explicit and checkable."""

    def __init__(self, options, overwrite: bool):
        import os as _os

        self.path = options.get("path")
        if not self.path:
            raise ValueError("synthetic_docs writer requires a path")
        # The writer is constructed on the DRIVER, so directory prep
        # and overwrite semantics happen here, before any task runs:
        # mode("overwrite") clears prior part files AND the manifest —
        # without this, stale parts from an earlier write would sit
        # beside the new manifest, violating Spark's overwrite
        # contract for any reader globbing *.jsonl.
        _os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for f in _os.listdir(self.path):
                if f.endswith(".jsonl") or f == "_MANIFEST.json":
                    _os.remove(_os.path.join(self.path, f))

    def write(self, iterator):
        import json as _json
        import os as _os
        import uuid as _uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"part-{pid:05d}-{_uuid.uuid4().hex[:8]}.jsonl"
        _os.makedirs(self.path, exist_ok=True)
        full = _os.path.join(self.path, name)
        n, cksum = 0, 0
        with open(full, "w", encoding="utf-8") as fh:
            for row in iterator:
                rec = row.asDict()
                fh.write(_json.dumps(rec, sort_keys=True) + "\n")
                n += 1
                h = hashlib.md5(str(rec.get("text", "")).encode()).hexdigest()
                cksum = (cksum + int(h[:15], 16)) % (1 << 60)
        return _FileCommit(name, n, cksum)

    def commit(self, messages):
        import json as _json
        import os as _os

        manifest = {
            "files": sorted(
                [
                    {"name": m.filename, "n_rows": m.n_rows, "cksum": m.cksum}
                    for m in messages
                ],
                key=lambda f: f["name"],
            ),
            "total_rows": sum(m.n_rows for m in messages),
        }
        with open(_os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            _json.dump(manifest, fh)

    def abort(self, messages):
        import os as _os

        for m in messages:
            if m is None:
                continue
            try:
                _os.remove(_os.path.join(self.path, m.filename))
            except OSError:
                pass
