"""Run phase: execute a list of DSL queries → CSV results + timing report.

Spark-side equivalent of the reference's ``main.py`` run loop
(reference ``main.py:41-86``): per-query error isolation (a failing
query yields a 0-row record and the run continues), per-query wall
timing, optional result cache and rollup routing, one ``q<i>.csv`` per
query (header + rows — reference ``main.py:51-56``).

Scale note: results are only fully materialized on the driver below
``collect_threshold`` rows (the reference workload's grouped results are
tiny, so that path matches its behavior). Larger results — e.g. an
ungrouped row-level select over the fact table — stream to CSV through
``toLocalIterator`` one partition at a time, so driver memory is bounded
by a partition, not the result; such results also bypass the in-memory
result cache for the same reason.
"""

from __future__ import annotations

import csv
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from query_planner_optimizer_spark.catalog import Catalog
from query_planner_optimizer_spark.dsl.compiler import compile_query
from query_planner_optimizer_spark.plans.cache import ResultCache
from query_planner_optimizer_spark.plans.router import RollupRouter


@dataclass
class QueryRun:
    index: int
    columns: list[str]
    rows: list[tuple]  # full result below collect_threshold; preview above
    seconds: float
    routed: bool = False
    cached: bool = False
    error: str | None = None
    total_rows: int = 0  # always the true result cardinality
    spilled: bool = False  # True when rows streamed to CSV, not held


@dataclass
class RunReport:
    runs: list[QueryRun] = field(default_factory=list)

    @property
    def total_seconds(self) -> float:
        return sum(r.seconds for r in self.runs)


class QueryRunner:
    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        aggregates_dir: str | None = None,
        use_cache: bool = True,
        collect_threshold: int = 100_000,
    ):
        self.spark = spark
        self.catalog = catalog
        self.router = (
            RollupRouter(spark, aggregates_dir) if aggregates_dir else None
        )
        self.cache = ResultCache() if use_cache else None
        self.collect_threshold = collect_threshold

    def run_one(self, q: dict, index: int = 0, csv_path: str | None = None) -> QueryRun:
        t0 = time.perf_counter()
        try:
            if self.cache is not None:
                hit = self.cache.get(q)
                if hit is not None:
                    run = QueryRun(index, hit.columns, hit.rows,
                                   time.perf_counter() - t0, cached=True,
                                   total_rows=len(hit.rows))
                    if csv_path is not None:
                        _write_csv(csv_path, run.columns, run.rows)
                    return run
            df = None
            routed = False
            if self.router is not None:
                df = self.router.route(q)
                routed = df is not None
            if df is None:
                df = compile_query(q, self.catalog)
            cols = df.columns

            # Probe one row past the threshold: small results (the
            # reference-workload case) stay on the fast collect path.
            probe = df.limit(self.collect_threshold + 1).collect()
            if len(probe) <= self.collect_threshold:
                rows = [tuple(r) for r in probe]
                if self.cache is not None:
                    self.cache.put(q, cols, rows)
                if csv_path is not None:
                    _write_csv(csv_path, cols, rows)
                return QueryRun(index, cols, rows, time.perf_counter() - t0,
                                routed=routed, total_rows=len(rows))

            # Big result: stream partition-by-partition. Driver holds one
            # partition at a time; only a bounded preview is retained.
            preview: list[tuple] = []
            n = 0
            sink = _CsvSink(csv_path, cols) if csv_path is not None else None
            try:
                for r in df.toLocalIterator(prefetchPartitions=True):
                    t = tuple(r)
                    if n < 1000:
                        preview.append(t)
                    n += 1
                    if sink is not None:
                        sink.write(t)
            finally:
                if sink is not None:
                    sink.close()
            return QueryRun(index, cols, preview, time.perf_counter() - t0,
                            routed=routed, total_rows=n, spilled=True)
        except Exception as e:  # noqa: BLE001 — per-query isolation
            if csv_path is not None:
                _write_csv(csv_path, [], [])
            return QueryRun(index, [], [], time.perf_counter() - t0,
                            error=f"{type(e).__name__}: {e}")

    def run(self, queries: list[dict], out_dir: str | None = None) -> RunReport:
        report = RunReport()
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
        for i, q in enumerate(queries, start=1):
            csv_path = (
                os.path.join(out_dir, f"q{i}.csv") if out_dir is not None else None
            )
            report.runs.append(self.run_one(q, i, csv_path=csv_path))
        return report


def _write_csv(path: str, columns: list[str], rows: list[tuple]) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(columns)
        w.writerows(rows)


class _CsvSink:
    """Incremental CSV writer for streamed (above-threshold) results."""

    def __init__(self, path: str, columns: list[str]):
        self._f = open(path, "w", newline="")
        self._w = csv.writer(self._f)
        self._w.writerow(columns)

    def write(self, row: tuple) -> None:
        self._w.writerow(row)

    def close(self) -> None:
        self._f.close()
