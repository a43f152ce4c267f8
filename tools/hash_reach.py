# Measure the engine-side hash comparator's reach: for every registered
# query, analyze the Spark result schema and the DuckDB oracle's DESCRIBE
# and report which column types keep the query on the row-level (pandas)
# fallback. Schema-only — no query executes (iterative ops still run their
# training loops at DataFrame-build time, so use a small sf).
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from geoparquet_python_spark import registry  # noqa: E402
from geoparquet_python_spark.testing import (  # noqa: E402
    _DUCK_FAMILY,
    _SPARK_FAMILY,
    duckdb_connect,
)

registry.load_all()

sf = os.environ.get("SPARK_GRAFT_VERIFY_SF", "/root/testdata/sf0.001")
spark = (
    SparkSession.builder.master("local[8]")
    .appName("hash-reach")
    .config("spark.sql.ui.retainedExecutions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
con = duckdb_connect(sf)

blockers_spark = Counter()
blockers_duck = Counter()
blocked = {}
safe = 0
no_oracle = 0
for name, fn in sorted(registry.QUERIES.items()):
    oracle = registry.ORACLES.get(name)
    if oracle is None:
        no_oracle += 1
        continue
    why = []
    try:
        sdf = fn(spark, sf)
        for fld in sdf.schema.fields:
            t = fld.dataType.simpleString()
            if t not in _SPARK_FAMILY:
                why.append(f"spark:{t}")
                blockers_spark[t] += 1
    except Exception as e:  # noqa: BLE001
        why.append(f"spark-build-error:{str(e)[:80]}")
    try:
        con.execute("CREATE OR REPLACE TEMP VIEW __hr AS " + oracle)
        for row in con.execute("DESCRIBE __hr").fetchall():
            t = row[1].upper()
            if t not in _DUCK_FAMILY:
                why.append(f"duck:{t}")
                blockers_duck[t] += 1
    except Exception as e:  # noqa: BLE001
        why.append(f"duck-describe-error:{str(e)[:80]}")
    if why:
        blocked[name] = why
    else:
        safe += 1

total = len(registry.QUERIES)
print(f"\ntotal={total} no_oracle={no_oracle} hash_safe_now={safe} "
      f"blocked={len(blocked)}")
print("\nSpark blocker types:", dict(blockers_spark.most_common()))
print("Duck blocker types:", dict(blockers_duck.most_common()))
print("\nBlocked queries:")
for name, why in sorted(blocked.items()):
    print(f"  {name}: {sorted(set(why))}")
