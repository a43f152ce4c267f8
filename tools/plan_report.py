# Generate PLANS.md: one row per registered batch query with the
# physical-plan features the 100 TB posture cares about — join
# strategies, exchange (shuffle) count, pushdown reaching the scan,
# top-k planning. Streaming queries are skipped (constructing them
# drains a stream; their plans are covered by tests/test_streaming.py).
#
# This turns SCALE.md's narrative claims into a generated, re-checkable
# artifact: re-run after any operator change.
from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from geoparquet_python_spark import registry  # noqa: E402
from geoparquet_python_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.01")

FEATURES = [
    ("BHJ", "BroadcastHashJoin"),
    ("SMJ", "SortMergeJoin"),
    ("SHJ", "ShuffledHashJoin"),
    ("BNLJ", "BroadcastNestedLoopJoin"),
    ("cartesian", "CartesianProduct"),
    ("exchanges", "Exchange hashpartitioning"),
    ("rangeX", "Exchange rangepartitioning"),
    ("topk", "TakeOrderedAndProject"),
    ("window", "Window"),
    ("pandasUDF", "ArrowEvalPython"),
    ("mapInArrow", "MapInArrow"),
    ("pushed", "PushedFilters: ["),
]


def main() -> None:
    registry.load_all()
    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    skipped = []
    for name in sorted(registry.QUERIES):
        if name.startswith("q_stream") or name == "q_stateful_sessionization":
            skipped.append(name)
            continue
        try:
            df = registry.QUERIES[name](spark, SF)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # pragma: no cover - report, don't die
            rows.append((name, f"ERROR {str(e)[:80]}"))
            continue
        feats = []
        for label, needle in FEATURES:
            n = plan.count(needle)
            if label == "pushed":
                # count only non-empty pushdown lists
                n = len(re.findall(r"PushedFilters: \[(?!\])", plan))
            if n:
                feats.append(f"{label}×{n}" if n > 1 else label)
        rows.append((name, " ".join(feats) or "map-only"))

    lines = [
        "# PLANS — generated physical-plan audit (tools/plan_report.py)",
        "",
        f"Built (not executed) at `{SF}`. Legend: BHJ broadcast-hash join,",
        "SMJ sort-merge join, BNLJ broadcast nested-loop, exchanges =",
        "hash-partition shuffles in the final plan (AQE may coalesce at",
        "runtime), topk = TakeOrderedAndProject, pushed = scans with a",
        "non-empty PushedFilters list. A trailing `rangeX` on nearly",
        "every query is the presentation sort required by the driver's",
        "order-insensitive-hash oracle contract, not an algorithmic",
        "shuffle — production plans drop it (see SCALE.md",
        "\"Bench-protocol caveats\"). Queries that drain a stream during",
        "construction are excluded (see tests/test_streaming.py):",
        ", ".join(f"`{s}`" for s in skipped) + ".",
        "",
        "| query | plan features |",
        "|---|---|",
    ]
    lines += [f"| {n} | {f} |" for n, f in rows]
    out = os.path.join(REPO, "PLANS.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(rows)} queries, {len(skipped)} skipped")
    errs = [r for r in rows if r[1].startswith("ERROR")]
    if errs:
        print("ERRORS:", errs)
        sys.exit(1)


if __name__ == "__main__":
    main()
