"""Audit the Catalyst-plan router's refusal reasons over a corpus of
raw-SQL spellings of routable-looking queries.

For each candidate SQL (generated from join-free aggregate DSL entries
via the spark-dialect assembler, plus hand-written raw spellings users
actually type), run `PlanRouter.route_df` and bucket the refusal
reason. The output is the work-list for widening the routable surface
(r5 VERDICT #4): the most common refusal classes get admitted next.

Usage: python scripts/planroute_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    from __spark_entry__ import DSL_QUERIES
    from query_planner_optimizer_spark.catalog import Catalog
    from query_planner_optimizer_spark.dsl.assembler import assemble_sql
    from query_planner_optimizer_spark.plans.catalyst_router import (
        PlanRouter,
    )
    from query_planner_optimizer_spark.prepare import build_rollups
    from query_planner_optimizer_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, SF_DIR, register_views=False)
    events = cat.table("events")
    events.createOrReplaceTempView("events_audit")

    rollups = {
        "agg_day_etype": {"keys": ["day", "event_type"],
                          "aggs": {"value": ["sum", "count", "min",
                                             "max"]}},
        "agg_minute_etype": {"keys": ["minute", "event_type"],
                             "aggs": {"value": ["sum", "count"]}},
    }
    agg_dir = tempfile.mkdtemp(prefix="qpo_planroute_audit_")
    build_rollups(events, agg_dir, rollups)
    router = PlanRouter(spark, agg_dir, rollups, view="events_audit",
                        frame=events)

    # Join-free single-table aggregate DSL entries, respelled as raw
    # Spark SQL by the assembler (what a migrating user would run).
    candidates: dict[str, str] = {}
    for name, q in DSL_QUERIES.items():
        if not isinstance(q, dict) or q.get("from") != "events":
            continue
        if any(k in q for k in ("join", "with", "union", "intersect",
                                "except", "distinct")):
            continue
        if not q.get("group_by"):
            continue
        try:
            sql = assemble_sql(q, cat.spark_type_map("events"),
                               dialect="spark")
        except Exception:
            continue
        candidates[name] = sql.replace("FROM events", "FROM events_audit")

    # Raw spellings users type (not assembler-generated).
    candidates.update({
        "raw_cast_col_filter": (
            "SELECT day, count(*) AS n FROM events_audit "
            "WHERE CAST(event_type AS STRING) = 'click' GROUP BY day"),
        "raw_int_vs_double_lit": (
            "SELECT event_type, count(*) AS n FROM events_audit "
            "WHERE value > 1.5 GROUP BY event_type"),
        "raw_minute_grain": (
            "SELECT minute, round(sum(value), 4) AS sv "
            "FROM events_audit "
            "WHERE minute >= '2024-01-02 10:00' GROUP BY minute"),
        "raw_day_cast_string": (
            "SELECT day, count(*) AS n FROM events_audit "
            "WHERE CAST(day AS STRING) BETWEEN '2024-01-02' AND "
            "'2024-01-05' GROUP BY day"),
        "raw_having_post": (
            "SELECT event_type, sum(value) AS sv FROM events_audit "
            "GROUP BY event_type HAVING count(*) > 100"),
    })

    reasons: Counter = Counter()
    detail: dict[str, list[str]] = {}
    routed_n = 0
    for name, sql in sorted(candidates.items()):
        try:
            df = spark.sql(sql)
        except Exception as e:
            reasons["sql-error"] += 1
            detail.setdefault("sql-error", []).append(f"{name}: {e}")
            continue
        out = router.route_df(df)
        if out is not None:
            routed_n += 1
            continue
        reason = router.last_reason or "?"
        reasons[reason] += 1
        detail.setdefault(reason, []).append(name)

    print(f"\n{routed_n} routed / {len(candidates)} candidates\n")
    for reason, n in reasons.most_common():
        print(f"{n:3d}  {reason}")
        for name in detail[reason][:6]:
            print(f"       {name}")
    spark.stop()


if __name__ == "__main__":
    main()
