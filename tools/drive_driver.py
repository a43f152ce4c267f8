# Simulate the verify driver: fresh process, import __spark_entry__ by path,
# run entry() smoke at sf0.001, then each queries() vs oracle_sql() at sf0.01
# with the order-insensitive exact compare from geoparquet_python_spark.testing.
import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

from geoparquet_python_spark.testing import (  # noqa: E402
    compare_frames,
    duckdb_connect,
    run_compare_engine_side,
)

# Vanilla session for everything that affects QUERY SEMANTICS — the
# whole point is catching anything that silently depends on our
# session builder. The only non-default confs are UI/metadata
# RETENTION caps (VERDICT r7 item 4): Spark's defaults retain 1000
# SQL executions + jobs/stages of UI metadata, which across a
# full-suite session at sf0.1 accumulated past the vanilla 1g heap
# (r7: the JVM died at query #207, alphabetical position). Retention
# caps change what the UI remembers, never what a query computes, so
# the semantics-vanilla contract holds. Since r9 the comparator
# decides equality from engine-side scalars (testing.run_compare_
# engine_side) instead of materializing both result sets driver-side,
# so even the 5.5M-row q_simhash_blocked_pairs_loose at sf0.1 fits
# the vanilla 1g heap — no SPARK_GRAFT_DRIVER_MEM knob remains.
# SPARK_GRAFT_COMPARE=pandas forces the row-level path everywhere
# (the debugging mode; also what the hash path falls back to for
# float/timestamp/array result columns).
spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.ui.retainedExecutions", "8")
    .config("spark.ui.retainedJobs", "64")
    .config("spark.ui.retainedStages", "64")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

t0 = time.time()
rows = mod.entry(spark).collect()
print(f"SMOKE entry(): {len(rows)} rows in {time.time() - t0:.1f}s")
assert len(rows) > 0

sf = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.01")
con = duckdb_connect(sf)

qs, os_ = mod.queries(), mod.oracle_sql()
only = os.environ.get("SPARK_GRAFT_ONLY")  # comma-separated subset filter
if only:
    keep = set(only.split(","))
    qs = {k: v for k, v in qs.items() if k in keep}
force_pandas = os.environ.get("SPARK_GRAFT_COMPARE") == "pandas"
failed = []
for qi, (name, fn) in enumerate(sorted(qs.items())):
    # Session-lifetime hygiene, BETWEEN queries only (semantics-neutral):
    # materialize() = localCheckpoint stores RDD blocks in the local-mode
    # JVM; they free when the ContextCleaner sees the JVM GC collect the
    # RDD handles, which a long single session may not do before the
    # block manager fills a vanilla 1g heap (~250 queries in at sf0.1 —
    # the r9 crash signature: every heavy query passes ALONE at 1g).
    # Drop the Python-side py4j refs, then poke the JVM collector.
    if qi and qi % 16 == 0:
        import gc

        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
    # Deterministic release of dead localCheckpoint blocks (round 12;
    # see functions/exact.release_dead_checkpoints — safe only BETWEEN
    # queries, which is exactly where this runs).
    try:
        from geoparquet_python_spark.functions.exact import (
            release_dead_checkpoints,
        )

        release_dead_checkpoints()
    except Exception:
        pass
    try:
        t0 = time.time()
        if force_pandas:
            sdf = fn(spark, sf).toPandas()
            if name in os_:
                odf = con.execute(os_[name]).df()
                compare_frames(sdf, odf, name=name)
                mode = "MATCH[pandas]"
            else:
                mode = "rows-only"
            n = len(sdf)
        else:
            n, m = run_compare_engine_side(spark, con, name, fn, os_.get(name), sf)
            mode = {"hash": "MATCH[hash]", "pandas": "MATCH[pandas]"}.get(m, m)
        dt = time.time() - t0
        print(f"  {name}: rows={n} {mode} ({dt:.1f}s)")
    except Exception as e:
        failed.append(name)
        print(f"  {name}: FAIL {str(e)[:300]}")

print(f"\n{len(qs)} queries, {len(failed)} failed: {failed}")
sys.exit(1 if failed else 0)
