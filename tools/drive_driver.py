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

from geoparquet_python_spark.testing import compare_frames, duckdb_connect  # noqa: E402

# Vanilla session for everything that affects QUERY SEMANTICS — the
# whole point is catching anything that silently depends on our
# session builder. The only non-default confs are UI/metadata
# RETENTION caps (VERDICT r7 item 4): Spark's defaults retain 1000
# SQL executions + jobs/stages of UI metadata, which across a
# full-suite session at sf0.1 accumulated past the vanilla 1g heap
# (r7: the JVM died at query #207, alphabetical position). Retention
# caps change what the UI remembers, never what a query computes, so
# the semantics-vanilla contract holds. Measured residual (r8): with
# the caps, a 1g sf0.1 run gets further but still dies on
# q_simhash_blocked_pairs_loose — whose RESULT is 5.5M pair rows that
# this comparator materializes driver-side (toPandas) to diff against
# DuckDB; that is an evidence-protocol cost (the driver's real sf0.01
# gate has small results), so the sf0.1 evidence pass sets
# SPARK_GRAFT_DRIVER_MEM=2g for the collect spike (was 8g pre-caps).
_builder = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.ui.retainedExecutions", "8")
    .config("spark.ui.retainedJobs", "64")
    .config("spark.ui.retainedStages", "64")
    .config("spark.ui.enabled", "false")
)
_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
if _mem:
    _builder = _builder.config("spark.driver.memory", _mem)
spark = _builder.getOrCreate()

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
failed = []
for name, fn in sorted(qs.items()):
    try:
        t0 = time.time()
        sdf = fn(spark, sf).toPandas()
        dt = time.time() - t0
        if name in os_:
            odf = con.execute(os_[name]).df()
            compare_frames(sdf, odf, name=name)
            print(f"  {name}: rows={len(sdf)} MATCH ({dt:.1f}s)")
        else:
            print(f"  {name}: rows-only rows={len(sdf)} ({dt:.1f}s)")
    except Exception as e:
        failed.append(name)
        print(f"  {name}: FAIL {str(e)[:300]}")

print(f"\n{len(qs)} queries, {len(failed)} failed: {failed}")
sys.exit(1 if failed else 0)
