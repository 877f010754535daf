#!/usr/bin/env python
"""Strict Spark-vs-DuckDB comparison for every oracle-covered entry.

Stricter than ``selfcheck.py`` (which allows rtol=1e-6 and ignores
dtypes): the driver's CORRECTNESS gate hashes *values*, so an int64
column that the oracle returns as float64 (DuckDB SUM(int) → HUGEINT →
float64), or a double that rounds differently by one step, both fail
even when ``assert_frame_equal(check_dtype=False)`` passes. This script
flags:

- dtype-kind mismatches (int vs float vs object) per column;
- any float divergence beyond 1e-9 relative (real bugs, not noise);
- exact-value mismatches on non-float columns.

Usage: python scripts/exactcheck.py [sf_dir] [--only=a,b] [--first=N]
       [--repo-session]

``--first=N`` checks the first N queries() entries in panel order —
the driver's 50-entry correctness window is ``--first=50``.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _sortable(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _coerce_dates(df: pd.DataFrame) -> pd.DataFrame:
    """Normalize date/datetime columns to datetime64 — Spark DateType
    arrives as object-of-datetime.date while DuckDB DATE arrives as
    datetime64[us]; the driver's r2 hash treated these as equal, so the
    strict check must too."""
    import datetime
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(
                sample.iloc[0], (datetime.date, datetime.datetime)
            ):
                df[c] = pd.to_datetime(df[c])
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if set(got.columns) != set(want.columns):
        return [f"columns spark={sorted(got.columns)} oracle={sorted(want.columns)}"]
    if len(got) != len(want):
        return [f"rows spark={len(got)} oracle={len(want)}"]
    got, want = _coerce_dates(got), _coerce_dates(want)
    for c in sorted(got.columns):
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        # i/u are interchangeable; bool stays bool; f must match f.
        norm = {"u": "i", "b": "i"}
        if norm.get(gk, gk) != norm.get(wk, wk):
            errs.append(f"dtype-kind mismatch on {c!r}: spark={got[c].dtype} "
                        f"oracle={want[c].dtype} (hash-visible)")
    g, w = _sortable(got), _sortable(want)
    for c in g.columns:
        if g[c].dtype.kind == "f" and w[c].dtype.kind == "f":
            a, b = g[c].to_numpy(), w[c].to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            with np.errstate(invalid="ignore"):
                bad = ~both_nan & ~np.isclose(a, b, rtol=1e-9, atol=1e-12)
            nexact = int((~both_nan & (a != b)).sum())
            if bad.any():
                i = int(np.argmax(bad))
                errs.append(f"float diverges on {c!r}: {a[i]!r} vs {b[i]!r} "
                            f"({int(bad.sum())} rows beyond 1e-9)")
            elif nexact:
                errs.append(f"NOTE {c!r}: {nexact} rows differ within 1e-9 "
                            f"(noise; hash-risky only if query rounds)")
        else:
            neq = (g[c].astype(str) != w[c].astype(str))
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                errs.append(f"values differ on {c!r}: "
                            f"{g[c].iloc[i]!r} vs {w[c].iloc[i]!r} "
                            f"({int(neq.sum())} rows)")
    return errs


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = [f.split("=", 1)[1] for f in flags if f.startswith("--only=")]
    only = [s for f in only for s in f.split(",") if s]

    import __spark_entry__ as mod

    if "--repo-session" in flags:
        from query_planner_optimizer_spark.session import get_spark
        spark = get_spark(app_name="qpo-exactcheck")
    else:
        from pyspark.sql import SparkSession
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (SparkSession.builder.master(f"local[{cpus}]")
                 .appName("qpo-exactcheck-vanilla").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = mod.queries(), mod.oracle_sql()
    first = [int(f.split("=", 1)[1]) for f in flags
             if f.startswith("--first=")]
    if first:
        qs = {n: f for i, (n, f) in enumerate(qs.items()) if i < first[0]}
    if only:
        qs = {n: f for n, f in qs.items() if any(s in n for s in only)}
    hard, notes = [], []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        t0 = time.perf_counter()
        try:
            got = fn(spark, sf_dir).toPandas()
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            hard.append(name)
            print(f"FAIL  {name}: {type(e).__name__}: {e}")
            continue
        errs = compare(name, got, want)
        dt = time.perf_counter() - t0
        real = [e for e in errs if not e.startswith("NOTE")]
        if real:
            hard.append(name)
            for e in real:
                print(f"FAIL  {name}: {e}")
        else:
            for e in errs:
                notes.append(f"{name}: {e}")
            print(f"ok    {name} ({len(got)} rows, {dt:.2f}s)")
    if notes:
        print("\n-- within-tolerance float noise (informational) --")
        for n in notes:
            print("  " + n)
    print(f"\nSTRICT: {len([n for n in qs if n in oracles]) - len(hard)} pass, "
          f"{len(hard)} fail" + (f": {hard}" if hard else ""))
    spark.stop()
    return 1 if hard else 0


if __name__ == "__main__":
    sys.exit(main())
