#!/usr/bin/env python
"""sf1 bench appendix (r10, r9 VERDICT ask #3): close the
floor-vs-real-gap question for the perf watch-list.

Thesis under test: the entries slower than the DuckDB oracle at sf0.1
are dominated by Spark's PER-QUERY fixed floor (scheduler + exchange
setup + Catalyst analysis), which is constant in data volume — so
their engine/oracle warm ratio must FALL as data grows 10×. Any entry
whose ratio does NOT improve earns a named plan fix in r11.

Method: replicate sf0.1 events/documents/orders/lineitem 10× (ids
remapped per replica so join/group structure scales, not degenerates)
into .scale_tmp/sf1/, symlink the small dims unchanged, then time each
entry's queries() callable (cold + median-of-3 warm via .collect())
and its oracle_sql() in DuckDB over the same parquet, at BOTH scales
in one process. Prints a markdown table for SCALE.md.

Usage: python scripts/sf1_bench.py [--rebuild] [--only=a,b]
                                   [--k=N] [--entries=a,b,...]

--k=N sets the replication factor (default 10 → "sf1"; 30 → "sf3"),
building .scale_tmp/sf{N/10} the same way (r10 VERDICT ask #6: promote
the sf3 protocol to the bench suite). --entries replaces the default
WATCH+CONTROLS list wholesale.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
for _a in sys.argv[1:]:
    if _a.startswith("--k="):
        K = int(_a.split("=", 1)[1])
SF_LABEL = f"sf{K / 10:g}"
SF1 = os.path.join(REPO, ".scale_tmp", SF_LABEL)

#: r9 VERDICT watch-list + floor-dominated controls.
WATCH = [
    "pipeline_token_budget",
    "pipeline_line_dedup",
    "stream_sessionize",
    "relevance_bm25",
    "dsl_tpch_q18_large_orders",
]
CONTROLS = [
    "dsl_daily_rollup",
    "dsl_weekly_rollup",
    "dsl_minute_rollup",
    "dsl_groupby_count_star",
    "dsl_count_distinct_users",
]

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")
REPLICATED = {"events", "documents", "orders", "lineitem"}


def build_sf1(spark, rebuild: bool) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(SF1) and not rebuild and all(
        os.path.exists(os.path.join(SF1, f"{t}.parquet")) for t in TABLES
    ):
        return
    shutil.rmtree(SF1, ignore_errors=True)
    os.makedirs(SF1, exist_ok=True)
    reps = spark.range(K).withColumnRenamed("id", "__rep")

    def rep(df, idcols: dict[str, str]):
        out = df.crossJoin(reps)
        for col in idcols:
            out = out.withColumn(col, F.col(col) * K + F.col("__rep"))
        return out.drop("__rep")

    # id remaps keep join/group structure per replica: lineitem pairs
    # with its own replica's orders (same *K+rep transform on both
    # sides of the key), users/docs multiply 10x.
    plans = {
        "events": ("events", {"event_id": "u"}),
        "documents": ("documents", {"doc_id": "u"}),
        "orders": ("orders", {"o_orderkey": "u"}),
        "lineitem": ("lineitem", {"l_orderkey": "u"}),
    }
    for t in TABLES:
        src = os.path.join(SF01, f"{t}.parquet")
        dst = os.path.join(SF1, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        if t in REPLICATED:
            df = spark.read.parquet(src)
            rep(df, plans[t][1]).repartition(16).write.mode(
                "overwrite"
            ).parquet(dst)
        else:
            os.symlink(src, dst)


def main() -> int:
    rebuild = "--rebuild" in sys.argv
    only = None
    entries = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        if a.startswith("--entries="):
            entries = a.split("=", 1)[1].split(",")

    import duckdb

    from query_planner_optimizer_spark.session import get_spark

    sys.path.insert(0, REPO)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    spark = get_spark(app_name="qpo-sf1-bench")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark, rebuild)

    qs = entry.queries()
    # bench-only callables (production-hash twins with no oracle row,
    # e.g. dedup_minhash_xxh) — timeable here for engine-absolute
    # trend rows (r11 VERDICT #5).
    import bench as bench_mod
    qs = {**qs, **bench_mod._bench_only()}
    oracles = entry.oracle_sql()
    names = [n for n in (entries if entries is not None
                         else (*WATCH, *CONTROLS))
             if not only or n in only]

    def engine_times(name: str, sf_dir: str) -> tuple[float, float]:
        # Arrow-batched toPandas, not .collect(): both engines deliver
        # the SAME client artifact (a columnar DataFrame — DuckDB via
        # fetchdf below). Row-object collect() pickles every row
        # through the JVM→Python boundary, which at sf1 costs MORE than
        # the whole query for the wide-result window entries (r11
        # probe: asof compute 1.0 s vs collect 3.4 s; Arrow 1.3 s) —
        # that measures the legacy client path, not the engine. Arrow
        # transfer is also the production fetch path at scale.
        def once() -> float:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).toPandas()
            return time.perf_counter() - t0

        cold = once()
        warm = statistics.median(once() for _ in range(3))
        return cold, warm

    def oracle_times(name: str, sf_dir: str, con) -> float | None:
        # rows-only entries (engine-specific hash families, e.g.
        # dedup_minhash_xxh) have no oracle row — engine-absolute
        # trend only (r11 VERDICT #5).
        sql = oracles.get(name)
        if sql is None:
            return None

        def once() -> float:
            t0 = time.perf_counter()
            con.execute(sql).fetchdf()
            return time.perf_counter() - t0

        once()
        return statistics.median(once() for _ in range(3))

    results: dict[str, dict] = {}
    for sf_label, sf_dir in (("sf0.1", SF01), (SF_LABEL, SF1)):
        con = duckdb.connect()
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if not os.path.exists(p):
                continue
            # Spark writes a table as a DIRECTORY of part files;
            # DuckDB needs the glob form for those.
            pat = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{pat}')")
        for name in names:
            _cold, ew = engine_times(name, sf_dir)
            ow = oracle_times(name, sf_dir, con)
            results.setdefault(name, {})[sf_label] = (ew, ow)
            otxt = ("oracle_warm -- (no oracle)" if ow is None
                    else f"oracle_warm {ow:.2f}s  ratio "
                         f"{ew / max(ow, 1e-9):.2f}")
            print(f"{sf_label} {name}: engine_warm {ew:.2f}s  {otxt}",
                  flush=True)
        con.close()

    print(f"\n| entry | engine sf0.1 | oracle sf0.1 | ratio sf0.1 "
          f"| engine {SF_LABEL} | oracle {SF_LABEL} | ratio {SF_LABEL} "
          f"| ratio falls? |")
    print("|---|---|---|---|---|---|---|---|")
    for name in names:
        (e1, o1) = results[name]["sf0.1"]
        (e2, o2) = results[name][SF_LABEL]
        tag = "watch" if name in WATCH else "control"
        if o1 is None or o2 is None:
            print(f"| `{name}` ({tag}) | {e1:.2f} s | -- | -- "
                  f"| {e2:.2f} s | -- | -- | (engine-absolute) |")
            continue
        r1, r2 = e1 / max(o1, 1e-9), e2 / max(o2, 1e-9)
        print(f"| `{name}` ({tag}) | {e1:.2f} s | {o1:.2f} s | {r1:.2f} "
              f"| {e2:.2f} s | {o2:.2f} s | {r2:.2f} "
              f"| {'YES' if r2 < r1 else 'NO'} |")
    payload = {
        n: {k: {"engine_warm": round(v[0], 4),
                "oracle_warm": None if v[1] is None else round(v[1], 4),
                "ratio": None if v[1] is None
                else round(v[0] / max(v[1], 1e-9), 3)}
            for k, v in d.items()}
        for n, d in results.items()
    }
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
