#!/usr/bin/env python
"""Reference-workload benchmark: the reference's own two-phase flow
(prepare ad-event CSVs → run its 5 benchmark queries) on synthetic data
of the reference's schema, timed like BASELINE.md times the reference.

    python scripts/adbench.py [n_events] [out.json]

Prints one JSON line: prepare seconds, per-query cold/warm ms, totals.
Context for reading the numbers against BASELINE.md: the reference
(Polars, single-process, M2) reports ~40-50 ms for 5 queries against
pre-built aggregates at 245M rows. Spark pays a per-query floor of
~100-300 ms for driver→executor scheduling regardless of data size —
that overhead buys distributability; parity is expected in per-query
work growth, not in the fixed floor at toy scale.
"""

from __future__ import annotations

import csv
import json
import os
import random
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COUNTRIES = ["US", "JP", "DE", "IN", "BR", "FR"]
TYPES = ["serve", "impression", "click", "purchase"]


def gen_events_csv(path: str, n: int, seed: int = 42) -> None:
    rng = random.Random(seed)
    base_ts = 1704067200000  # 2024-01-01T00:00:00Z millis
    year_ms = 366 * 24 * 3600 * 1000
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["ts", "type", "auction_id", "advertiser_id",
                    "publisher_id", "bid_price", "user_id", "total_price",
                    "country"])
        for i in range(n):
            ts = base_ts + rng.randrange(0, year_ms)
            etype = rng.choices(TYPES, weights=[4, 3, 2, 1])[0]
            bid = round(rng.uniform(0.01, 2.0), 4) if etype == "impression" else ""
            total = round(rng.uniform(1, 300), 2) if etype == "purchase" else "null"
            w.writerow([ts, etype, f"a{i % (n // 8 + 1):07d}",
                        rng.randrange(1, 50), rng.randrange(1, 100), bid,
                        rng.randrange(1, n // 50 + 2), total,
                        rng.choice(COUNTRIES)])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from query_planner_optimizer_spark.__main__ import (
        REFERENCE_BENCHMARK_QUERIES,
    )
    from query_planner_optimizer_spark.catalog import Catalog
    from query_planner_optimizer_spark.prepare import prepare
    from query_planner_optimizer_spark.runner import QueryRunner
    from query_planner_optimizer_spark.session import get_spark

    spark = get_spark(app_name="qpo-adbench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    root = tempfile.mkdtemp(prefix="qpo_adbench_")
    csv_path = os.path.join(root, "events_part_0.csv")
    t0 = time.perf_counter()
    gen_events_csv(csv_path, n)
    gen_sec = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    res = prepare(spark, csv_path, os.path.join(root, "optimized"))
    prepare_sec = round(time.perf_counter() - t0, 2)

    cat = Catalog(spark, root, register_views=False,
                  overrides={"events": res.partitioned_dir})
    runner = QueryRunner(spark, cat, aggregates_dir=res.aggregates_dir,
                         use_cache=False)

    def one_pass() -> dict[str, float]:
        out = {}
        for i, q in enumerate(REFERENCE_BENCHMARK_QUERIES, start=1):
            run = runner.run_one(q, i)
            if run.error:
                raise RuntimeError(f"q{i}: {run.error}")
            out[f"q{i}"] = round(run.seconds * 1000, 1)
        return out

    cold = one_pass()
    warm = one_pass()
    result = {
        "workload": "reference-5-queries",
        "n_events": n,
        "gen_sec": gen_sec,
        "prepare_sec": prepare_sec,
        "routed": runner.router.routed,
        "cold_ms": cold,
        "cold_total_ms": round(sum(cold.values()), 1),
        "warm_ms": warm,
        "warm_total_ms": round(sum(warm.values()), 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
