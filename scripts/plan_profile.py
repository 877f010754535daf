#!/usr/bin/env python
"""Per-entry plan/job profile (r10 VERDICT ask #3): for each named
entry, report the executed-plan operator census (exchanges, sorts,
windows, joins, scans, aggregates) and the number of Spark JOBS one
warm execution launches — the two "fixed cost × count" terms that
explain engine-vs-DuckDB residuals once a plan is already minimal.

Usage: python scripts/plan_profile.py <sf_dir> entry[,entry...]
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OPS = ("Exchange", "Sort ", "Window", "HashAggregate", "ObjectHashAggregate",
       "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
       "BroadcastNestedLoopJoin", "CartesianProduct", "FileScan",
       "InMemoryTableScan", "TakeOrderedAndProject")


def census(plan: str) -> dict[str, int]:
    # AQE's plan string appends the pre-adaptive plan under an
    # "== Initial Plan ==" banner — count the FINAL plan only.
    plan = plan.split("== Initial Plan ==")[0]
    out: dict[str, int] = {}
    for op in OPS:
        n = len(re.findall(re.escape(op), plan))
        if n:
            out[op.strip()] = n
    return out


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")

    import importlib.util

    from query_planner_optimizer_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    spark = get_spark(app_name="qpo-plan-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    tracker = spark.sparkContext.statusTracker()

    for name in names:
        df = qs[name](spark, sf_dir)
        df.collect()  # warm lineage + let AQE settle its final plan
        df2 = qs[name](spark, sf_dir)
        spark.sparkContext.setJobGroup(f"profile_{name}", name)
        t0 = time.perf_counter()
        df2.collect()
        wall = time.perf_counter() - t0
        spark.sparkContext.setJobGroup("idle", "idle")
        jobs = len(tracker.getJobIdsForGroup(f"profile_{name}") or [])
        # executedPlan AFTER execution = AQE final plan.
        plan = df2._jdf.queryExecution().executedPlan().toString()
        print(f"\n== {name} (warm {wall:.2f}s, jobs {jobs}) ==")
        for op, n in sorted(census(plan).items()):
            print(f"  {op}: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
