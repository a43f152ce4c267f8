# Dump `.explain("formatted")` for headline (or named) queries into
# plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
# format (OPTIMIZATION_r12.md): the judge checks plan claims against
# these files without running Spark.
#
# Usage:
#   python tools/explain_dump.py <tag> <suffix> [q1,q2,...]
# e.g.
#   python tools/explain_dump.py r12 before
#   python tools/explain_dump.py r12 after q_events_gapfill_hourly
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geoparquet_python_spark import registry  # noqa: E402
from geoparquet_python_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    if len(sys.argv) > 3:
        names = sys.argv[3].split(",")
    else:
        import bench

        names = list(bench.HEADLINE)
    registry.load_all()
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn = registry.QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered")
            continue
        try:
            df = fn(spark, SF)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # streaming queries drain on build
            print(f"SKIP {name}: {type(exc).__name__}: {exc}")
            continue
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {SF} ({suffix})\n")
            f.write(plan)
        print(f"WROTE {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
