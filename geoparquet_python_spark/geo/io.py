"""GeoParquet source/sink (SURVEY.md §2.A rows A1/A2) — the reference's
entire public API re-expressed for Spark:

* reference ``gdf.to_geoparquet(path)`` (geoparquet/__init__.py:22–45≈):
  single file, eager, per-row WKB encode, geo metadata stamped into the
  Parquet footer on one process.
* reference ``read_geoparquet(path)`` (geoparquet/__init__.py:47–70≈):
  single file, eager decode of every geometry row.

Spark re-design: Spark's parquet sink cannot stamp footer key-value
metadata, so the writer runs as ``mapInArrow`` — every partition writes
its own footer-correct part file with pyarrow IN PARALLEL on the
executors (one pass, no post-hoc rewrite; at 100 TB there is no
driver-side step proportional to data size). The reader is a plain
``spark.read.parquet`` (vectorized scan, pushdown intact); only the
footer metadata hop is pyarrow-on-the-driver, reading ONE footer.

Geometry stays WKB ``BinaryType`` end-to-end; nothing decodes at scan
time (decode is per-operator, SURVEY.md §1.1). An optional GeoParquet
1.1-style ``bbox`` covering struct is materialized at write so spatial
predicates push down to row-group stats (§4.3).
"""

from __future__ import annotations

import glob
import json
import os
import uuid
from collections.abc import Iterator
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geoparquet_python_spark.geo.functions import st_envelope

GEO_KEY = b"geo"
# Pre-spec key the reference used (SURVEY.md §0.2 — exact name uncertain,
# tolerate it and the spec form on read).
LEGACY_KEY = b"geometry_fields"

SPEC_VERSION = "1.1.0"


_WKB_TYPE_NAMES = {
    1: "Point",
    2: "LineString",
    3: "Polygon",
    4: "MultiPoint",
    5: "MultiLineString",
    6: "MultiPolygon",
    7: "GeometryCollection",
}


def _geo_column_entry(
    crs: Any,
    bbox: list | None,
    geometry_types: list[str] | None = None,
) -> dict[str, Any]:
    col: dict[str, Any] = {"encoding": "WKB", "geometry_types": geometry_types or []}
    if crs is not None:
        col["crs"] = crs
    if bbox is not None:
        col["bbox"] = bbox
    return col


def _geo_metadata_json(
    geometry_col: str,
    crs: Any,
    bbox: list | None,
    geometry_types: list[str] | None = None,
    extra_cols: dict[str, dict] | None = None,
) -> bytes:
    """Spec `geo` doc: the primary column entry plus any SECONDARY
    geometry columns (GeoParquet allows several; exactly one is
    primary_column). Secondaries carry encoding/crs/geometry_types;
    the dataset bbox rides on the primary."""
    doc = {
        "version": SPEC_VERSION,
        "primary_column": geometry_col,
        "columns": {
            geometry_col: _geo_column_entry(crs, bbox, geometry_types),
            **(extra_cols or {}),
        },
    }
    return json.dumps(doc).encode("utf-8")


def _wkb_type_codes(arr: pa.Array) -> set[int]:
    """Vectorized WKB geometry-type-code extraction from a pyarrow
    binary array: byte 0 is the byte order, bytes 1-4 the uint32 type
    code. Runs on numpy views of the Arrow offsets/data buffers — no
    per-row Python in the write hot path."""
    if arr.null_count == len(arr) or len(arr) == 0:
        return set()
    off_dtype = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    validity, offsets_buf, data_buf = arr.buffers()
    offsets = np.frombuffer(offsets_buf, dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(data_buf, dtype=np.uint8)
    starts = offsets[:-1].astype(np.int64)
    if validity is not None:
        mask = np.unpackbits(
            np.frombuffer(validity, dtype=np.uint8), bitorder="little"
        )[arr.offset : arr.offset + len(arr)].astype(bool)
        starts = starts[mask]
    if starts.size == 0:
        return set()
    order = data[starts]  # 1 = little-endian, 0 = big-endian
    b = [data[starts + i].astype(np.uint32) for i in (1, 2, 3, 4)]
    le = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
    be = (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]
    codes = np.where(order == 1, le, be)
    return set(int(c) for c in np.unique(codes))


def _type_code_names(codes: set[int]) -> list[str]:
    """Spec geometry_types names from raw WKB codes; ISO Z/M/ZM
    variants (1000/2000/3000 offsets) map to the suffixed spec form."""
    names = []
    for c in sorted(codes):
        base = _WKB_TYPE_NAMES.get(c % 1000)
        if base is None:
            continue
        suffix = {0: "", 1: " Z", 2: " M", 3: " ZM"}.get(c // 1000, "")
        names.append(base + suffix)
    return sorted(set(names))


def add_bbox_column(df: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """Materialize the GeoParquet-1.1 covering column: a
    {xmin,ymin,xmax,ymax} struct. Plain comparisons against its fields
    are pushed to Parquet row-group stats by Spark's scan — this column
    IS the spatial index at 100 TB."""
    return df.withColumn("bbox", st_envelope(F.col(geometry_col)))


def write_geoparquet(
    df: DataFrame,
    path: str,
    geometry_col: str = "geometry",
    crs: Any = "OGC:CRS84",
    bbox_covering: bool = True,
    secondary_geometry_cols: list[str] | None = None,
) -> int:
    """Distributed GeoParquet sink; returns rows written.

    Each input partition becomes one part file whose footer carries the
    OGC ``geo`` key-value metadata — written by pyarrow inside
    ``mapInArrow``, so the stamping is executor-side and single-pass
    (the reference's ``replace_schema_metadata`` + ``pq.write_table``,
    geoparquet/__init__.py:35–40≈, parallelized).

    Task-commit protocol (retries/speculation are routine at 100 TB):
    each attempt writes to a hidden temp name derived from
    (partitionId, taskAttemptId), then atomically renames to the
    canonical ``part-{partitionId}.parquet`` on close. Retried or
    speculative attempts of the same partition overwrite the SAME final
    name with identical content instead of leaving a second part file
    (the silent row-duplication failure of uuid naming). The rename is
    atomic on POSIX local/NFS filesystems; on an object store deploy
    this function's commit step is where an S3A-style committer slots
    in. An empty input still produces one schema-only part file, so the
    output directory is always a readable dataset."""
    secondary = list(secondary_geometry_cols or [])
    for c in [geometry_col, *secondary]:
        if c not in df.columns:
            raise ValueError(f"geometry column {c!r} not in {df.columns}")
    if bbox_covering and "bbox" not in df.columns:
        df = add_bbox_column(df, geometry_col)

    os.makedirs(path, exist_ok=True)

    def write_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else uuid.uuid4().hex
        final = os.path.join(path, f"part-{pid:05d}.parquet")
        tmp = os.path.join(path, f".part-{pid:05d}-{attempt}.parquet.tmp")
        # Footer bbox/geometry_types are only known after the last row,
        # but pyarrow fixes schema metadata at writer construction — so
        # buffer the partition's batches (bounded by
        # spark.sql.files.maxPartitionBytes, the same bound any Arrow
        # exchange already has) and stamp true per-file stats at open.
        buffered: list[pa.RecordBatch] = []
        rows = 0
        xmin = ymin = float("inf")
        xmax = ymax = float("-inf")
        codes: set[int] = set()
        sec_codes: dict[str, set[int]] = {c: set() for c in secondary}
        for batch in batches:
            buffered.append(batch)
            rows += batch.num_rows
            codes |= _wkb_type_codes(batch.column(geometry_col))
            for c in secondary:
                sec_codes[c] |= _wkb_type_codes(batch.column(c))
            if "bbox" in batch.schema.names:
                import pyarrow.compute as pc

                box = batch.column("bbox")
                for field, agg in (
                    ("xmin", "min"), ("ymin", "min"), ("xmax", "max"), ("ymax", "max")
                ):
                    v = getattr(pc, agg)(pc.struct_field(box, field)).as_py()
                    if v is None:
                        continue
                    if agg == "min":
                        if field == "xmin":
                            xmin = min(xmin, v)
                        else:
                            ymin = min(ymin, v)
                    elif field == "xmax":
                        xmax = max(xmax, v)
                    else:
                        ymax = max(ymax, v)
        bbox = [xmin, ymin, xmax, ymax] if xmin <= xmax else None
        meta_json = _geo_metadata_json(
            geometry_col,
            crs,
            bbox,
            _type_code_names(codes),
            extra_cols={
                c: _geo_column_entry(crs, None, _type_code_names(sec_codes[c]))
                for c in secondary
            },
        )
        writer = None
        try:
            for batch in buffered:
                if writer is None:
                    schema = batch.schema.with_metadata(
                        {**(batch.schema.metadata or {}), GEO_KEY: meta_json}
                    )
                    writer = pq.ParquetWriter(tmp, schema)
                writer.write_batch(batch)
            if writer is not None:
                writer.close()
                os.replace(tmp, final)  # commit: atomic, last attempt wins
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)  # abort path: never leak half-written files
        yield pa.RecordBatch.from_pylist(
            [{"file": final, "rows": rows}] if rows else [],
            schema=pa.schema([("file", pa.string()), ("rows", pa.int64())]),
        )

    stats = df.mapInArrow(write_partition, "file string, rows long").collect()
    if not stats:
        # Every partition was empty: emit one schema-only part so the
        # directory is a valid (zero-row) GeoParquet dataset.
        tbl = df.limit(0).toArrow()
        tbl = tbl.replace_schema_metadata(
            {**(tbl.schema.metadata or {}),
             GEO_KEY: _geo_metadata_json(
                 geometry_col, crs, None, [],
                 extra_cols={
                     c: _geo_column_entry(crs, None, []) for c in secondary
                 },
             )}
        )
        pq.write_table(tbl, os.path.join(path, "part-00000.parquet"))
        return 0
    return sum(r.rows for r in stats)


def geo_metadata(path: str) -> dict | None:
    """Parse geo metadata from the dataset's part-file footers. Accepts
    the OGC spec form (``geo``) and the reference's legacy pre-spec form
    (``geometry_fields`` — normalized into the spec shape).

    Each part file carries its own true ``bbox`` / ``geometry_types``
    (stamped executor-side at write); this merges them into the
    dataset-level extent and type union. Footer reads are KB-sized and
    O(num_files) on the driver — independent of data volume."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet"))) or [path]
    merged: dict | None = None
    for f in files:
        md = pq.ParquetFile(f).schema_arrow.metadata or {}
        if GEO_KEY not in md:
            break
        doc = json.loads(md[GEO_KEY].decode("utf-8"))
        if merged is None:
            merged = doc
            continue
        # Merge EVERY geometry column's per-file stats (multi-geometry
        # datasets carry one entry per column; exactly one is primary).
        for cname, a in merged["columns"].items():
            b = doc.get("columns", {}).get(cname, {})
            a["geometry_types"] = sorted(
                set(a.get("geometry_types", []))
                | set(b.get("geometry_types", []))
            )
            ba, bb = a.get("bbox"), b.get("bbox")
            if ba and bb:
                a["bbox"] = [min(ba[0], bb[0]), min(ba[1], bb[1]),
                             max(ba[2], bb[2]), max(ba[3], bb[3])]
            elif bb:
                a["bbox"] = bb
    if merged is not None:
        return merged
    md = pq.ParquetFile(files[0]).schema_arrow.metadata or {}
    if LEGACY_KEY in md:
        legacy = json.loads(md[LEGACY_KEY].decode("utf-8"))
        if isinstance(legacy, list) and legacy:
            first = legacy[0]
            name = first.get("field_name", "geometry")
            return {
                "version": "legacy",
                "primary_column": name,
                "columns": {
                    name: {
                        "encoding": first.get("geometry_format", "wkb").upper(),
                        "geometry_types": [],
                        "crs": first.get("crs"),
                    }
                },
            }
    return None


def read_geoparquet(spark: SparkSession, path: str) -> DataFrame:
    """GeoParquet scan: vectorized Spark parquet read (pushdown/pruning
    intact); geo footer metadata (one driver-side footer read) attached
    to the geometry column's schema metadata. WKB stays binary — decode
    is lazy, per-operator (the reference decodes every row up front,
    geoparquet/__init__.py:60≈ — the 100 TB anti-pattern)."""
    df = spark.read.parquet(path)
    meta = geo_metadata(path)
    if meta is not None:
        # Attach metadata to EVERY geometry column the footer declares
        # (multi-geometry files are spec-legal; primary_column marks the
        # default one). The primary keeps an extra marker so consumers
        # can find it without re-reading footers.
        for cname, entry in meta["columns"].items():
            if cname in df.columns:
                df = df.withMetadata(
                    cname,
                    {
                        "geo": entry,
                        "geo_primary": cname == meta["primary_column"],
                    },
                )
    return df
