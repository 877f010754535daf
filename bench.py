#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "total_query_time", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Timing counts full execution (plan + run + fetch) per query, after a
session+catalog warmup so JVM/session startup isn't attributed to Q1 —
matching how the reference times its run phase after prepare
(reference ``main.py:43-85``).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Headline set: flagship DSL queries + one of each pipeline-operator
#: family. Keys must exist in __spark_entry__.queries().
HEADLINE = [
    "dsl_pricing_summary",
    "dsl_daily_rollup",
    "dsl_minute_rollup",
    "dsl_groupby_count_star",
    "dsl_topk_limit",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "text_quality_score",
    "text_fingerprint",
]


def main() -> None:
    import __spark_entry__ as entry_mod
    from query_planner_optimizer_spark.session import get_spark

    spark = get_spark(app_name="qpo-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # Warmup: touch each table's footer + trigger one tiny job so JVM
    # startup / code paths are warm (page cache behavior then mirrors
    # the reference's "second run" numbers, BASELINE.md).
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        # collect() (not count()) so the full result — every projected
        # column — is computed and fetched, as the driver's runner does.
        rows = df.collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        _ = len(rows)
    total = round(sum(timings.values()), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "total_query_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
