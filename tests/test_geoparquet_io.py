"""GeoParquet sink/source round-trip tests (SURVEY.md §5.1: the
reference's implicit test IS the metadata-preserving round-trip)."""

from __future__ import annotations

import json
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from geoparquet_python_spark.geo import io as gio
from geoparquet_python_spark.geo import wkb
from geoparquet_python_spark.geo.functions import st_point
from geoparquet_python_spark.io import load_table


@pytest.fixture()
def tmp_out(tmp_path):
    out = str(tmp_path / "gpq")
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _points_df(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    lon = (F.col("c_custkey") * 7919 % 3600) / 10.0 - 180.0
    lat = (F.col("c_custkey") * 4409 % 1700) / 10.0 - 85.0
    return cust.select("c_custkey", st_point(lon, lat).alias("geometry"))


def test_roundtrip_preserves_bytes_and_metadata(spark, sf_dir_small, tmp_out):
    df = _points_df(spark, sf_dir_small)
    n = gio.write_geoparquet(df, tmp_out, "geometry", crs="OGC:CRS84")
    assert n == df.count()

    meta = gio.geo_metadata(tmp_out)
    assert meta["version"] == gio.SPEC_VERSION
    assert meta["primary_column"] == "geometry"
    assert meta["columns"]["geometry"]["encoding"] == "WKB"
    assert meta["columns"]["geometry"]["crs"] == "OGC:CRS84"

    back = gio.read_geoparquet(spark, tmp_out)
    assert "bbox" in back.columns  # covering column materialized at write
    want = {(r.c_custkey, bytes(r.geometry)) for r in df.collect()}
    got = {(r.c_custkey, bytes(r.geometry)) for r in back.collect()}
    assert got == want
    # geometry column carries the geo metadata in its schema
    field = dict(zip(back.columns, back.schema.fields))["geometry"]
    assert field.metadata["geo"]["encoding"] == "WKB"


def test_footer_carries_true_bbox_and_geometry_types(spark, sf_dir_small, tmp_out):
    """Spec-form consumers prune files on footer bbox/geometry_types, so
    the sink must stamp TRUE per-file values (not placeholders), and
    geo_metadata must merge them into the dataset extent."""
    df = _points_df(spark, sf_dir_small)
    gio.write_geoparquet(df, tmp_out, "geometry", crs="OGC:CRS84")

    # dataset-level merged metadata equals the brute-force extent
    xs, ys = [], []
    for r in df.collect():
        x, y = wkb.decode(bytes(r.geometry))[1]
        xs.append(x)
        ys.append(y)
    meta = gio.geo_metadata(tmp_out)
    col = meta["columns"]["geometry"]
    assert col["geometry_types"] == ["Point"]
    bb = col["bbox"]
    assert bb == pytest.approx([min(xs), min(ys), max(xs), max(ys)])

    # every individual part footer carries its own true (tighter) bbox
    import glob as _glob

    for f in sorted(_glob.glob(f"{tmp_out}/*.parquet")):
        md = pq.ParquetFile(f).schema_arrow.metadata
        doc = json.loads(md[gio.GEO_KEY].decode())
        c = doc["columns"]["geometry"]
        assert c["geometry_types"] == ["Point"]
        fb = c["bbox"]
        assert bb[0] <= fb[0] and bb[1] <= fb[1]
        assert fb[2] <= bb[2] and fb[3] <= bb[3]
        # per-file bbox matches that file's actual rows
        tbl = pq.read_table(f, columns=["geometry"])
        pts = [wkb.decode(v.as_py())[1] for v in tbl.column("geometry")]
        assert fb == pytest.approx(
            [min(p[0] for p in pts), min(p[1] for p in pts),
             max(p[0] for p in pts), max(p[1] for p in pts)]
        )

    # read side surfaces merged bbox + types on the column metadata
    back = gio.read_geoparquet(spark, tmp_out)
    field = dict(zip(back.columns, back.schema.fields))["geometry"]
    assert field.metadata["geo"]["geometry_types"] == ["Point"]
    assert field.metadata["geo"]["bbox"] == pytest.approx(bb)


def test_footer_geometry_types_mixed(spark, tmp_path):
    """Mixed geometry types in one file all surface in the footer."""
    geoms = [
        wkb.encode(("Point", (1.0, 2.0))),
        wkb.encode(("LineString", [(0.0, 0.0), (1.0, 1.0)])),
        wkb.encode(("Polygon", [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 0.0)]])),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(g)) for i, g in enumerate(geoms)], "id long, geometry binary"
    ).coalesce(1)
    out = str(tmp_path / "mixed")
    gio.write_geoparquet(df, out, "geometry")
    meta = gio.geo_metadata(out)
    assert meta["columns"]["geometry"]["geometry_types"] == [
        "LineString", "Point", "Polygon"
    ]
    assert meta["columns"]["geometry"]["bbox"] == pytest.approx([0.0, 0.0, 2.0, 2.0])


def test_legacy_reference_form_read(spark, tmp_path):
    """The reference's pre-spec footer key (geometry_fields, SURVEY.md
    §0.2 step ⑤) must be readable and normalized."""
    out = str(tmp_path / "legacy")
    pts = [wkb.encode(("Point", (float(i), float(-i)))) for i in range(5)]
    table = pa.table({"id": list(range(5)), "geom": pts})
    legacy = json.dumps(
        [{"field_name": "geom", "geometry_format": "wkb", "crs": "epsg:4326"}]
    ).encode()
    table = table.replace_schema_metadata({gio.LEGACY_KEY: legacy})
    import os

    os.makedirs(out)
    pq.write_table(table, f"{out}/part-0.parquet")

    meta = gio.geo_metadata(out)
    assert meta["version"] == "legacy"
    assert meta["primary_column"] == "geom"
    assert meta["columns"]["geom"]["encoding"] == "WKB"
    assert meta["columns"]["geom"]["crs"] == "epsg:4326"

    back = gio.read_geoparquet(spark, out)
    assert back.count() == 5
    assert wkb.decode(bytes(back.orderBy("id").first().geom)) == ("Point", (0.0, -0.0))


def test_bbox_filter_pushdown(spark, sf_dir_small, tmp_out):
    """Spatial predicate -> bbox conjuncts -> Parquet PushedFilters
    (SURVEY.md §4.3: the rewrite happens in the API layer, pushdown is
    free from the scan)."""
    gio.write_geoparquet(_points_df(spark, sf_dir_small), tmp_out, "geometry")
    back = gio.read_geoparquet(spark, tmp_out)
    q = back.where(
        (F.col("bbox.xmin") >= 0.0) & (F.col("bbox.ymax") <= 40.0)
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "xmin" in plan  # bbox struct fields reached the scan
    # and the filter is correct
    rows = q.collect()
    for r in rows:
        x, y = wkb.decode(bytes(r.geometry))[1]
        assert x >= 0.0 and y <= 40.0
    full = {bytes(r.geometry) for r in back.collect()}
    kept = {
        g
        for g in full
        if wkb.decode(g)[1][0] >= 0.0 and wkb.decode(g)[1][1] <= 40.0
    }
    assert {bytes(r.geometry) for r in rows} == kept


def test_spatial_window_filter_rewrite(spark, sf_dir_small, tmp_out):
    """spatial_window_filter = coarse pushdown-able bbox conjuncts +
    exact envelope refine; equals brute-force intersection test."""
    from geoparquet_python_spark.geo.functions import spatial_window_filter

    gio.write_geoparquet(_points_df(spark, sf_dir_small), tmp_out, "geometry")
    back = gio.read_geoparquet(spark, tmp_out)
    win = (-30.0, -20.0, 90.0, 70.0)
    got = {
        bytes(r.geometry)
        for r in spatial_window_filter(back, win, "geometry").collect()
    }
    want = set()
    for r in back.collect():
        x, y = wkb.decode(bytes(r.geometry))[1]
        if win[0] <= x <= win[2] and win[1] <= y <= win[3]:
            want.add(bytes(r.geometry))
    assert got == want
    plan = (
        spatial_window_filter(back, win, "geometry")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "xmin" in plan


def test_st_functions_sql_registration(spark, sf_dir_small):
    """register_sql exposes the ST_* UDF surface to SQL strings (§2.G)."""
    from geoparquet_python_spark.geo.functions import register_sql

    register_sql(spark)
    row = spark.sql(
        """
        SELECT ST_X(p) AS x, ST_Y(p) AS y,
               ST_AsText(p) AS wkt,
               ST_Area(ST_Buffer(p, 2.0, 16)) AS a
        FROM (SELECT ST_Point(3.5D, -1.25D) AS p)
        """
    ).first()
    assert row.x == 3.5 and row.y == -1.25
    assert row.wkt == "POINT (3.5 -1.25)"
    import math

    assert abs(row.a - 0.5 * 16 * 4.0 * math.sin(2 * math.pi / 16)) < 1e-9


def test_write_is_idempotent_per_partition(spark, sf_dir_small, tmp_out):
    """Task-commit protocol: re-running the same write (the user-level
    analogue of a retried/speculative task attempt) renames onto the
    SAME canonical part names — no duplicate part files, no doubled
    rows, no leftover temp files."""
    import glob
    import os

    df = _points_df(spark, sf_dir_small)
    n1 = gio.write_geoparquet(df, tmp_out, "geometry")
    files1 = sorted(glob.glob(os.path.join(tmp_out, "*.parquet")))
    n2 = gio.write_geoparquet(df, tmp_out, "geometry")
    files2 = sorted(glob.glob(os.path.join(tmp_out, "*.parquet")))
    assert n1 == n2 == df.count()
    assert files1 == files2, "retry must overwrite, not add part files"
    assert gio.read_geoparquet(spark, tmp_out).count() == df.count()
    assert not glob.glob(os.path.join(tmp_out, ".part-*")), "temp files leaked"


def test_write_empty_dataframe_is_readable(spark, sf_dir_small, tmp_out):
    """An all-empty write must still leave a valid zero-row GeoParquet
    dataset (schema + geo footer), not an empty directory that breaks
    read_geoparquet."""
    df = _points_df(spark, sf_dir_small).where(F.lit(False))
    n = gio.write_geoparquet(df, tmp_out, "geometry")
    assert n == 0
    meta = gio.geo_metadata(tmp_out)
    assert meta is not None and meta["primary_column"] == "geometry"
    back = gio.read_geoparquet(spark, tmp_out)
    assert back.count() == 0
    assert "geometry" in back.columns


def test_root_level_reference_parity_api(spark, tmp_path):
    """The reference exposes read_geoparquet as a module function and
    to_geoparquet as the writer name — both work from the package
    root, so a reference user can switch with an import change."""
    import geoparquet_python_spark as gpq
    from geoparquet_python_spark.geo.functions import st_point

    d = spark.range(7).select(
        F.col("id").alias("k"),
        st_point(F.col("id") * 1.0, F.col("id") * 2.0).alias("geometry"),
    )
    path = str(tmp_path / "root_api")
    assert gpq.to_geoparquet(d, path) == 7
    back = gpq.read_geoparquet(spark, path)
    assert back.count() == 7
    assert "geometry" in back.columns


def test_sql_rewrite_injects_sargable_conjuncts():
    """Text-level: every ST_EnvelopeIntersects atom gains covering-box
    conjuncts, in ANY boolean context (atom-local implied-conjunct
    rewrites are equivalences), and non-matching atoms are untouched."""
    from geoparquet_python_spark.geo.sqlrewrite import rewrite_spatial_sql

    sql = (
        "SELECT * FROM t WHERE NOT (ST_EnvelopeIntersects(g, -1, -2.5, 3e1, 4)"
        " OR flag) AND ST_EnvelopeIntersects(g, 0, 0, 1, 1)"
    )
    out = rewrite_spatial_sql(sql)
    assert out.count("bbox.xmin <=") == 2
    # atom preserved inside the conjunction (stays as the exact refine)
    assert out.count("ST_EnvelopeIntersects(g, -1, -2.5, 3e1, 4)") == 1
    assert "(bbox.xmin <= 3e1 AND bbox.xmax >= -1" in out
    # column-bound windows are not literal-matchable: left untouched
    dyn = "SELECT * FROM t WHERE ST_EnvelopeIntersects(g, a, 0, 1, 1)"
    assert rewrite_spatial_sql(dyn) == dyn


def test_sql_pushdown_query_prunes_and_matches_unrewritten(spark, sf_dir):
    """The registered SQL-string query must (a) push the injected bbox
    conjuncts into the Parquet scan, (b) return exactly what the same
    SQL returns WITHOUT the rewrite (soundness end-to-end)."""
    from geoparquet_python_spark import registry
    from geoparquet_python_spark.geo.functions import register_sql
    from geoparquet_python_spark.testing import canonicalize

    registry.load_all()
    df = registry.QUERIES["q_geo_sql_pushdown_window"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(bbox.xmin)" in plan, (
        "bbox conjuncts did not reach the Parquet scan"
    )

    # same statement, no rewrite (UDF-only filter; geo_pts view was
    # registered by the query above)
    register_sql(spark)
    raw = spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS n,
               MIN(ST_X(geometry)) AS min_x, MAX(ST_X(geometry)) AS max_x
        FROM geo_pts
        WHERE ST_EnvelopeIntersects(geometry, -90.0, -40.0, 60.0, 55.0)
        GROUP BY c_nationkey ORDER BY c_nationkey
        """
    )
    assert canonicalize(df.toPandas()).equals(canonicalize(raw.toPandas()))


def test_partitioned_scan_prunes_directories(spark, sf_dir):
    """The hive-partitioned layout must prune at the directory level:
    the cell filter appears in PartitionFilters (files for other cells
    are never listed into the scan), distinct from the covering
    column's row-group PushedFilters."""
    from geoparquet_python_spark import registry

    registry.load_all()
    df = registry.QUERIES["q_geo_partitioned_scan"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cell_x" in plan
    assert "(cell_x" in plan.split("PartitionFilters:")[1][:120]


def test_multi_geometry_metadata_on_both_columns(spark, sf_dir, tmp_path):
    """A two-geometry-column write must stamp a `columns` entry per
    geometry into every footer; the read must re-attach metadata to
    BOTH Spark columns with geo_primary marking the primary — the
    multi-geometry capability GeoParquet 1.1 specifies and the round-6
    VERDICT listed as the last unimplemented nice-to-have."""
    from pyspark.sql import functions as F

    from geoparquet_python_spark.geo import io as gio
    from geoparquet_python_spark.geo.functions import st_point
    from geoparquet_python_spark.io import load_table

    out = str(tmp_path / "multigeom")
    cust = load_table(spark, sf_dir, "customer").limit(200)
    lon = (F.col("c_custkey") * 7919 % 3600) / 10.0 - 180.0
    lat = (F.col("c_custkey") * 4409 % 1700) / 10.0 - 85.0
    pts = cust.select(
        "c_custkey",
        st_point(lon, lat).alias("geometry"),
        st_point(lon / 2.0, lat / 2.0).alias("dest"),
    )
    gio.write_geoparquet(
        pts, out, "geometry", secondary_geometry_cols=["dest"]
    )
    meta = gio.geo_metadata(out)
    assert set(meta["columns"]) == {"geometry", "dest"}
    assert meta["primary_column"] == "geometry"
    assert meta["columns"]["dest"]["geometry_types"] == ["Point"]
    assert "bbox" in meta["columns"]["geometry"]

    back = gio.read_geoparquet(spark, out)
    fields = {f.name: f for f in back.schema.fields}
    assert fields["geometry"].metadata["geo_primary"] is True
    assert fields["dest"].metadata["geo_primary"] is False
    assert fields["dest"].metadata["geo"]["encoding"] == "WKB"
