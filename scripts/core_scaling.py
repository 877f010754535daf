#!/usr/bin/env python
"""Core-count scaling measurement at SF >= 1 (r16, VERDICT ask #2).

At sf0.1 every bench entry is scheduling-floor-bound: the r15 driver
scaling block showed 32 cores LOSING to 8 on every entry (t8/t32 <= 1.22)
because the inputs are ~600k rows and the per-task cost dominates. The
100-TB parallelism claims therefore rested on plan shape alone. This
script produces the missing measurement: noop-sink compute times for the
top warm entries over the 10x-replicated sf1 dataset (built by
scripts/sf1_bench.build_sf1 — ids remapped per replica so join/group
structure scales), at whatever core count $SPARK_GRAFT_CPUS selects.

Run it once per core count (one Spark JVM at a time — measurement
discipline), then compare the two JSON artifacts:

    SPARK_GRAFT_CPUS=8  python scripts/core_scaling.py --out=BENCH_sf1_r16_c8.json
    SPARK_GRAFT_CPUS=32 python scripts/core_scaling.py --out=BENCH_sf1_r16_c32.json

Timing is the noop sink (guide §1.4): every column of every row is
computed and discarded, so the number is the distributed computation,
not the driver row-fetch (which is constant in core count and at sf1
would swamp collect()-based numbers for result-heavy entries).
Entry construction stays inside the timed region, matching bench.run_op.

Usage: python scripts/core_scaling.py [--sf-dir=DIR] [--k=10]
           [--entries=a,b,...] [--runs=N] [--out=FILE]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Default panel: the top warm bench entries (r15 BENCH) spanning every
#: heavy operator family — dedup pair-gen + CC loop, minhash LSH,
#: incremental probe paths, IVF-PQ serving (full + pruned), lexical
#: scoring, doc-pipeline passes, windowed streaming, HLL profile, and
#: two fact-scan DSL shapes (routed entries are rollup-served and stay
#: sub-second at any SF by design, so they are not scaling subjects).
DEFAULT_ENTRIES = [
    "dedup_connected_components",
    "dedup_minhash_xxh",
    "pipeline_daily_ingest",
    "dedup_incremental_shard",
    "sim_ivfpq_index",
    "sim_ivfpq_index_pruned",
    "relevance_bm25",
    "text_quality_classifier",
    "pipeline_line_dedup",
    "pipeline_token_budget",
    "stream_sessionize",
    "profile_events_hll",
    "dsl_tpch_q5_local_supplier_volume",
    "dsl_tpch_q18_large_orders",
]


def main() -> int:
    k = 10
    runs = 3
    out_path = None
    sf_dir = None
    entries = list(DEFAULT_ENTRIES)
    for a in sys.argv[1:]:
        if a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--entries="):
            entries = a.split("=", 1)[1].split(",")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    import bench as bench_mod
    sf1_spec = importlib.util.spec_from_file_location(
        "sf1_bench", os.path.join(REPO, "scripts", "sf1_bench.py"))
    sf1_bench = importlib.util.module_from_spec(sf1_spec)
    sf1_spec.loader.exec_module(sf1_bench)
    from query_planner_optimizer_spark.session import (
        default_parallelism,
        get_spark,
    )

    cpus = default_parallelism()
    spark = get_spark(app_name=f"qpo-core-scaling-c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    spark.range(32 * 1024).repartition(32).mapInPandas(
        lambda it: it, "id long").count()

    if sf_dir is None:
        sf1_bench.K = k
        sf1_bench.SF_LABEL = f"sf{k / 10:g}"
        sf1_bench.SF1 = os.path.join(REPO, ".scale_tmp", sf1_bench.SF_LABEL)
        sf1_bench.build_sf1(spark, rebuild=False)
        sf_dir = sf1_bench.SF1
    label = os.path.basename(sf_dir.rstrip("/"))

    qs = entry.queries()
    qs.update(bench_mod._bench_only())

    dsl_runner = None

    def _dsl_setup():
        import tempfile

        from query_planner_optimizer_spark.catalog import Catalog
        from query_planner_optimizer_spark.plans.router import RollupRouter
        from query_planner_optimizer_spark.prepare import (
            DRIVER_EVENTS_ROLLUPS,
            build_rollups,
        )
        from query_planner_optimizer_spark.runner import QueryRunner

        cat = Catalog(spark, sf_dir, register_views=False)
        agg_dir = os.path.join(
            tempfile.mkdtemp(prefix="qpo_scaling_"), "aggregates")
        build_rollups(cat.table("events"), agg_dir, DRIVER_EVENTS_ROLLUPS,
                      tables={"lineitem": cat.table("lineitem")})
        runner = QueryRunner(spark, cat, aggregates_dir=agg_dir,
                             use_cache=False)
        runner.router = RollupRouter(spark, agg_dir, DRIVER_EVENTS_ROLLUPS)
        return runner

    results: dict[str, dict] = {}
    for name in entries:
        spark.sparkContext.setJobDescription(f"core-scaling c{cpus}: {name}")
        samples = []
        if name.startswith("dsl_"):
            if dsl_runner is None:
                dsl_runner = _dsl_setup()
            for _ in range(runs + 1):
                t0 = time.perf_counter()
                run = dsl_runner.run_one(entry.DSL_QUERIES[name])
                if run.error:
                    raise RuntimeError(f"{name}: {run.error}")
                samples.append(time.perf_counter() - t0)
        else:
            fn = qs[name]
            for _ in range(runs + 1):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite").save()
                samples.append(time.perf_counter() - t0)
        cold, warm = samples[0], samples[1:]
        med = statistics.median(warm)
        results[name] = {
            "cold": round(cold, 4),
            "warm": round(med, 4),
            "warm_spread": round(max(warm) - min(warm), 4),
        }
        print(f"{name:40s} cold={cold:8.3f} warm_med={med:8.3f} "
              f"warm={['%.3f' % s for s in warm]}", flush=True)

    payload = {
        "metric": "core_scaling_noop",
        "cpus": cpus,
        "sf_dir": sf_dir,
        "sf_label": label,
        "runs": runs,
        "entries": results,
        "total_warm": round(sum(r["warm"] for r in results.values()), 4),
    }
    line = json.dumps(payload)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
