#!/usr/bin/env python
"""Self-check: run every __spark_entry__.queries() entry and compare
against its oracle_sql() via DuckDB — the same scheme the driver's
CORRECTNESS gate uses (row-count + column set + order-insensitive
values). Exit code 0 iff all entries match (rows-only entries must
simply run and return a schema).

Usage: python scripts/selfcheck.py [sf_dir] [--vanilla]
       (default sf_dir /root/testdata/sf0.01)

``--vanilla`` (now the DEFAULT) runs under a conf-free
``SparkSession.builder.master("local[N]")`` session — exactly what the
driver's harness passes — so engine code can never silently depend on
session.py-only confs again (round-1 postmortem: nanosAsLong was set
only in our factory and 23 driver entries errored). ``--repo-session``
opts back into the tuned factory session.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def normalize(df: pd.DataFrame, dp: int = 6) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(dp)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = [f.split("=", 1)[1] for f in flags if f.startswith("--only=")]
    only = [s for f in only for s in f.split(",") if s]
    import __spark_entry__ as mod

    if "--repo-session" in flags:
        from query_planner_optimizer_spark.session import get_spark

        spark = get_spark(app_name="qpo-selfcheck")
    else:
        # Vanilla session (default): replicate the driver harness, which
        # builds its own SparkSession with NONE of session.py's confs.
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("qpo-selfcheck-vanilla")
            .getOrCreate()
        )
        print(f"(vanilla session, local[{cpus}] — no repo confs)")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # entry() smoke check
    edf = mod.entry(spark)
    erows = edf.collect()
    print(f"entry(): OK ({len(erows)} rows, schema {[f.name for f in edf.schema]})")

    qs, oracles = mod.queries(), mod.oracle_sql()
    if only:
        qs = {n: f for n, f in qs.items() if any(s in n for s in only)}
    failures = []
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok~   {name}: rows-only ({len(got)} rows, {dt:.2f}s)")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle SQL error: {e}")
            continue
        if set(got.columns) != set(want.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(got.columns)} "
                  f"oracle={sorted(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(got)} oracle={len(want)}")
            continue
        g, w = normalize(got), normalize(want)
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                          check_exact=False, rtol=1e-6)
        except AssertionError as e:
            failures.append(name)
            print(f"FAIL  {name}: values differ: {str(e).splitlines()[0]}")
            continue
        print(f"ok    {name}: {len(got)} rows match oracle ({dt:.2f}s)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} entries pass"
          + (f"; FAILURES: {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
