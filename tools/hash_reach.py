# Measure the engine-side hash comparator's reach: for every registered
# query, analyze the Spark result schema and the DuckDB oracle's DESCRIBE
# and report which column types keep the query on the row-level (pandas)
# fallback. Schema-only — no query executes (iterative ops still run their
# training loops at DataFrame-build time, so use a small sf).
#
# ADVICE r10: hash-safety is gated on BOTH sides independently AND on the
# per-column family maps agreeing (run_compare_engine_side raises on a
# family mismatch) — so a cross-engine disagreement is its own blocker
# category here ('family-mismatch'), not a silent overstatement.
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from geoparquet_python_spark import registry  # noqa: E402
from geoparquet_python_spark.testing import (  # noqa: E402
    _duck_canonical,
    _spark_canonical,
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
    sfam, dfam = {}, {}
    try:
        sdf = fn(spark, sf)
        for fld in sdf.schema.fields:
            t = fld.dataType.simpleString()
            fam, _ = _spark_canonical(fld.name, t)
            if fam is None:
                why.append(f"spark:{t}")
                blockers_spark[t] += 1
            else:
                sfam[fld.name] = fam
    except Exception as e:  # noqa: BLE001
        why.append(f"spark-build-error:{str(e)[:80]}")
    try:
        con.execute("CREATE OR REPLACE TEMP VIEW __hr AS " + oracle)
        for row in con.execute("DESCRIBE __hr").fetchall():
            t = row[1].upper()
            fam, _ = _duck_canonical(row[0], t)
            if fam is None:
                why.append(f"duck:{t}")
                blockers_duck[t] += 1
            else:
                dfam[row[0]] = fam
    except Exception as e:  # noqa: BLE001
        why.append(f"duck-describe-error:{str(e)[:80]}")
    if not why and sfam != dfam:
        # The real comparator raises on this — count it as blocked.
        diff = {
            k: (sfam.get(k), dfam.get(k))
            for k in set(sfam) | set(dfam)
            if sfam.get(k) != dfam.get(k)
        }
        why.append(f"family-mismatch:{sorted(diff.items())}")
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
