#!/usr/bin/env python
"""Round-16 optimization profiler: time one or more entries in
isolation with the noop sink (guide §1.4) and capture
``explain("formatted")`` for the plan ledger under plans/r16/.

Usage:
    python scripts/r16_profile.py NAME [NAME...] [--sf=DIR] [--runs=N]
        [--plan=SUFFIX]   # write plans/r16/<name>_<SUFFIX>.txt
        [--collect]       # time .collect() like bench.py instead of noop

Notes:
- Operator entries come from ``queries()`` (plus bench-only callables);
  dsl_* names run through the same QueryRunner + router as bench.py.
- First run is reported as cold (includes any per-process index build
  the entry caches); remaining runs are the warm samples.
"""

from __future__ import annotations

import io
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    global SF_DIR
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    runs = 4
    plan_suffix = None
    use_collect = "--collect" in flags
    for f in flags:
        if f.startswith("--sf="):
            SF_DIR = f.split("=", 1)[1]
        elif f.startswith("--runs="):
            runs = int(f.split("=", 1)[1])
        elif f.startswith("--plan="):
            plan_suffix = f.split("=", 1)[1]

    import __spark_entry__ as entry_mod
    import bench
    from query_planner_optimizer_spark.session import get_spark

    spark = get_spark(app_name="qpo-r16-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    spark.range(32 * 1024).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    qs = entry_mod.queries()
    qs.update(bench._bench_only())

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

        cat = Catalog(spark, SF_DIR, register_views=False)
        agg_dir = os.path.join(
            tempfile.mkdtemp(prefix="qpo_prof_"), "aggregates")
        build_rollups(cat.table("events"), agg_dir, DRIVER_EVENTS_ROLLUPS,
                      tables={"lineitem": cat.table("lineitem")})
        runner = QueryRunner(spark, cat, aggregates_dir=agg_dir,
                             use_cache=False)
        runner.router = RollupRouter(spark, agg_dir, DRIVER_EVENTS_ROLLUPS)
        return runner

    from __spark_entry__ import DSL_QUERIES

    plans_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        is_dsl_bench = name in DSL_QUERIES and name not in qs or (
            name in DSL_QUERIES and name.startswith("dsl_"))
        spark.sparkContext.setJobDescription(f"r16-profile: {name}")
        samples = []
        if name.startswith("dsl_") and name in DSL_QUERIES:
            if dsl_runner is None:
                dsl_runner = _dsl_setup()
            for i in range(runs):
                t0 = time.perf_counter()
                run = dsl_runner.run_one(DSL_QUERIES[name])
                if run.error:
                    raise RuntimeError(f"{name}: {run.error}")
                samples.append(time.perf_counter() - t0)
            df = None
        else:
            fn = qs[name]
            for i in range(runs):
                # Entry construction stays inside the timed region to
                # match bench.py's run_op (entries may do bounded
                # driver-side work — index manifests, centroid
                # collects — that bench charges to the query).
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                if use_collect:
                    df.collect()
                else:
                    df.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
        cold, warm = samples[0], samples[1:]
        med = statistics.median(warm) if warm else float("nan")
        print(f"{name:40s} cold={cold:7.3f} warm_med={med:7.3f} "
              f"warm={['%.3f' % s for s in warm]}", flush=True)
        if plan_suffix and df is not None:
            buf = io.StringIO()
            stdout = sys.stdout
            sys.stdout = buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            out = os.path.join(plans_dir, f"{name}_{plan_suffix}.txt")
            with open(out, "w") as fh:
                fh.write(buf.getvalue())
            print(f"  plan -> {out}", flush=True)
        spark.sparkContext.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
