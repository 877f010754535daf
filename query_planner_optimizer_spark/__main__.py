"""Two-phase CLI mirroring the reference's entry points so a reference
user can switch without changing their workflow:

    # reference: python prepare_optimized.py --data-dir D --optimized-dir O
    python -m query_planner_optimizer_spark prepare \
        --data-dir /path/to/csvs --optimized-dir /path/to/optimized

    # reference: python main.py --optimized-dir O --out-dir R
    python -m query_planner_optimizer_spark run \
        --optimized-dir /path/to/optimized --out-dir /path/to/results \
        [--queries-file queries.json] [--no-router] [--no-cache]

``run`` also accepts ``--data-dir`` with raw parquet tables (the driver
testdata layout) instead of a prepared dir. Queries default to the
reference's five benchmark shapes (reference ``inputs.py:7-47``) and
can be overridden with a JSON file holding a list of DSL dicts — the
``--queries-file`` flag the reference documents but never implemented
(doc/code drift noted in SURVEY.md §3).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

#: The reference's benchmark query set (reference ``inputs.py:7-47``,
#: = example_queries.json), restated in the DSL grammar claude.md:82-143.
REFERENCE_BENCHMARK_QUERIES: list[dict] = [
    {
        "select": ["day", {"SUM": "bid_price"}],
        "from": "events",
        "where": [{"col": "type", "op": "eq", "val": "impression"}],
        "group_by": ["day"],
    },
    {
        "select": ["publisher_id", {"SUM": "bid_price"}],
        "from": "events",
        "where": [
            {"col": "type", "op": "eq", "val": "impression"},
            {"col": "country", "op": "eq", "val": "JP"},
            {"col": "day", "op": "between",
             "val": ["2024-10-20", "2024-10-23"]},
        ],
        "group_by": ["publisher_id"],
    },
    {
        "select": ["country", {"AVG": "total_price"}],
        "from": "events",
        "where": [{"col": "type", "op": "eq", "val": "purchase"}],
        "group_by": ["country"],
        "order_by": [{"col": "AVG(total_price)", "dir": "desc"}],
    },
    {
        "select": ["advertiser_id", "type", {"COUNT": "*"}],
        "from": "events",
        "group_by": ["advertiser_id", "type"],
        "order_by": [{"col": "COUNT(*)", "dir": "desc"}],
    },
    {
        "select": ["minute", {"SUM": "bid_price"}],
        "from": "events",
        "where": [
            {"col": "type", "op": "eq", "val": "impression"},
            {"col": "day", "op": "eq", "val": "2024-06-01"},
        ],
        "group_by": ["minute"],
        "order_by": [{"col": "minute", "dir": "asc"}],
    },
]


def _spark(app: str):
    from query_planner_optimizer_spark.session import get_spark

    spark = get_spark(app_name=app)
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cmd_prepare(args: argparse.Namespace) -> int:
    from query_planner_optimizer_spark.prepare import prepare

    spark = _spark("qpo-spark-prepare")
    result = prepare(spark, args.data_dir, args.optimized_dir,
                     profile="fast" if args.fast else "default")
    print(f"partitioned: {result.partitioned_dir}")
    print(f"aggregates:  {result.aggregates_dir} "
          f"({len(result.rollups)} rollups: {', '.join(result.rollups)})")
    return 0


def cmd_run(args: argparse.Namespace) -> int:
    from query_planner_optimizer_spark.catalog import Catalog
    from query_planner_optimizer_spark.runner import QueryRunner

    spark = _spark("qpo-spark-run")
    if args.queries_file:
        with open(args.queries_file) as f:
            queries = json.load(f)
        if not isinstance(queries, list):
            raise SystemExit("--queries-file must hold a JSON list of queries")
    else:
        queries = REFERENCE_BENCHMARK_QUERIES

    agg_dir = None
    if args.optimized_dir:
        data_dir = args.optimized_dir
        overrides = {
            "events": os.path.join(args.optimized_dir, "partitioned")
        }
        cand = os.path.join(args.optimized_dir, "aggregates")
        agg_dir = cand if os.path.isdir(cand) and not args.no_router else None
        cat = Catalog(spark, data_dir, overrides=overrides)
    else:
        cat = Catalog(spark, args.data_dir)

    runner = QueryRunner(
        spark, cat, aggregates_dir=agg_dir, use_cache=not args.no_cache
    )
    report = runner.run(queries, out_dir=args.out_dir)
    for run in report.runs:
        status = "ERROR " + (run.error or "") if run.error else (
            f"{run.total_rows} rows"
            + (" [routed]" if run.routed else "")
            + (" [cached]" if run.cached else "")
        )
        print(f"q{run.index}: {run.seconds * 1000:.1f} ms — {status}")
    print(f"total: {report.total_seconds * 1000:.1f} ms "
          f"({len(report.runs)} queries) → {args.out_dir}")
    return 1 if any(r.error for r in report.runs) else 0


def cmd_sql(args: argparse.Namespace) -> int:
    """Raw ANSI SQL over the registered tables, with automatic
    Catalyst-plan-level rollup routing (plans/catalyst_router.py):
    aggregates over `events` that a prepared rollup subsumes never
    touch the base table. `--no-router` or an unroutable shape falls
    back to the ordinary plan — results are identical either way
    (subsume-or-refuse), only the I/O differs."""
    from query_planner_optimizer_spark.catalog import Catalog

    spark = _spark("qpo-spark-sql")
    agg_dir = None
    if args.optimized_dir:
        overrides = {
            "events": os.path.join(args.optimized_dir, "partitioned")
        }
        cat = Catalog(spark, args.optimized_dir, overrides=overrides)
        cand = os.path.join(args.optimized_dir, "aggregates")
        agg_dir = cand if os.path.isdir(cand) else None
    else:
        cat = Catalog(spark, args.data_dir)
    cat.register_all()

    df = spark.sql(args.query)
    note = "scan"
    if agg_dir and not args.no_router:
        from query_planner_optimizer_spark.plans.catalyst_router import (
            PlanRouter,
        )

        router = PlanRouter(spark, agg_dir)
        routed = router.route_df(df)
        if routed is not None:
            df = routed
            note = f"routed via {router.router.last_rollup}"
        else:
            note = f"scan ({router.last_reason})"
    if args.explain:
        df.explain("formatted")
    if args.out:
        # Distributed CSV sink — never collects to the driver.
        df.write.mode("overwrite").option("header", True).csv(args.out)
        print(f"[{note}] → {args.out}")
    else:
        df.show(args.limit, truncate=False)
        print(f"[{note}]")
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    """Engine service: show a DSL query's physical plan and routing
    decision WITHOUT executing it — what an operator reaches for before
    shipping a query against 100 TB (is the filter pushed? did it
    route? is the join broadcast?)."""
    from query_planner_optimizer_spark.catalog import Catalog
    from query_planner_optimizer_spark.dsl.assembler import assemble_sql
    from query_planner_optimizer_spark.dsl.compiler import compile_query

    spark = _spark("qpo-spark-explain")
    if args.query_file:
        with open(args.query_file) as f:
            q = json.load(f)
    else:
        q = json.loads(args.query)

    agg_dir = None
    if args.optimized_dir:
        overrides = {
            "events": os.path.join(args.optimized_dir, "partitioned")
        }
        cat = Catalog(spark, args.optimized_dir, overrides=overrides)
        cand = os.path.join(args.optimized_dir, "aggregates")
        agg_dir = cand if os.path.isdir(cand) else None
    else:
        cat = Catalog(spark, args.data_dir)

    df = compile_query(q, cat)
    note = "scan"
    if agg_dir and not args.no_router:
        from query_planner_optimizer_spark.plans.router import RollupRouter

        router = RollupRouter(spark, agg_dir)
        routed = router.route(q)
        if routed is not None:
            df = routed
            note = "routed"
        else:
            note = "scan (route refused)"
    print(f"-- route: {note}")
    if args.sql:
        print("-- spark-sql twin:")
        print(assemble_sql(q, _merged_type_map(cat, q), dialect="spark"))
    df.explain("formatted")
    return 0


def _merged_type_map(cat, q: dict):
    tm = dict(cat.spark_type_map(q.get("from", "events")))
    for jspec in q.get("join") or []:
        tm.update(cat.spark_type_map(jspec["table"]))
    return tm


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="query_planner_optimizer_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("prepare", help="CSV events → partitioned parquet + rollups")
    pp.add_argument("--data-dir", required=True,
                    help="directory of events_part_*.csv (reference layout)")
    pp.add_argument("--fast", action="store_true",
                    help="speed profile (reference prepare_ultra_fast "
                         "parity): zstd level 1, larger row groups, "
                         "essential rollups only")
    pp.add_argument("--optimized-dir", required=True,
                    help="output dir (partitioned/ + aggregates/)")
    pp.set_defaults(fn=cmd_prepare)

    pr = sub.add_parser("run", help="execute DSL queries → q<i>.csv + timings")
    src = pr.add_mutually_exclusive_group(required=True)
    src.add_argument("--optimized-dir", help="prepared dir from `prepare`")
    src.add_argument("--data-dir", help="raw parquet tables dir (TESTDATA.md layout)")
    pr.add_argument("--out-dir", required=True)
    pr.add_argument("--queries-file", help="JSON list of DSL query dicts")
    pr.add_argument("--no-router", action="store_true",
                    help="disable rollup routing (always scan)")
    pr.add_argument("--no-cache", action="store_true",
                    help="disable the md5 result cache")
    pr.set_defaults(fn=cmd_run)

    ps = sub.add_parser(
        "sql",
        help="raw SQL with automatic rollup routing (plan-level rewrite)",
    )
    ps.add_argument("query", help="ANSI SQL over the registered tables")
    src = ps.add_mutually_exclusive_group(required=True)
    src.add_argument("--optimized-dir", help="prepared dir from `prepare`")
    src.add_argument("--data-dir", help="raw parquet tables dir")
    ps.add_argument("--out", help="write full result as CSV dir (distributed)")
    ps.add_argument("--limit", type=int, default=20,
                    help="rows to show when --out is absent (default 20)")
    ps.add_argument("--no-router", action="store_true",
                    help="disable the plan-level rollup rewrite")
    ps.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan")
    ps.set_defaults(fn=cmd_sql)

    pe = sub.add_parser(
        "explain",
        help="show a DSL query's physical plan + routing decision",
    )
    qsrc = pe.add_mutually_exclusive_group(required=True)
    qsrc.add_argument("--query", help="DSL query dict as a JSON string")
    qsrc.add_argument("--query-file", help="path to a JSON DSL query dict")
    src = pe.add_mutually_exclusive_group(required=True)
    src.add_argument("--optimized-dir", help="prepared dir from `prepare`")
    src.add_argument("--data-dir", help="raw parquet tables dir")
    pe.add_argument("--no-router", action="store_true",
                    help="skip the rollup-route attempt")
    pe.add_argument("--sql", action="store_true",
                    help="also print the assembled spark-sql twin")
    pe.set_defaults(fn=cmd_explain)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
