"""Run phase: execute a list of DSL queries → CSV results + timing report.

Spark-side equivalent of the reference's ``main.py`` run loop
(reference ``main.py:41-86``): per-query error isolation (a failing
query yields a 0-row record and the run continues), per-query wall
timing, optional result cache and rollup routing, one ``q<i>.csv`` per
query (header + rows — reference ``main.py:51-56``).
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
    rows: list[tuple]
    seconds: float
    routed: bool = False
    cached: bool = False
    error: str | None = None


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
    ):
        self.spark = spark
        self.catalog = catalog
        self.router = (
            RollupRouter(spark, aggregates_dir) if aggregates_dir else None
        )
        self.cache = ResultCache() if use_cache else None

    def run_one(self, q: dict, index: int = 0) -> QueryRun:
        t0 = time.perf_counter()
        try:
            if self.cache is not None:
                hit = self.cache.get(q)
                if hit is not None:
                    return QueryRun(index, hit.columns, hit.rows,
                                    time.perf_counter() - t0, cached=True)
            df = None
            routed = False
            if self.router is not None:
                df = self.router.route(q)
                routed = df is not None
            if df is None:
                df = compile_query(q, self.catalog)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            if self.cache is not None:
                self.cache.put(q, cols, rows)
            return QueryRun(index, cols, rows, time.perf_counter() - t0,
                            routed=routed)
        except Exception as e:  # noqa: BLE001 — per-query isolation
            return QueryRun(index, [], [], time.perf_counter() - t0,
                            error=f"{type(e).__name__}: {e}")

    def run(self, queries: list[dict], out_dir: str | None = None) -> RunReport:
        report = RunReport()
        for i, q in enumerate(queries, start=1):
            run = self.run_one(q, i)
            report.runs.append(run)
            if out_dir is not None:
                os.makedirs(out_dir, exist_ok=True)
                with open(os.path.join(out_dir, f"q{i}.csv"), "w", newline="") as f:
                    w = csv.writer(f)
                    w.writerow(run.columns)
                    w.writerows(run.rows)
        return report
