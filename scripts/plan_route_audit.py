"""Audit the Catalyst-plan router's refusal surface (VERDICT r5 item 4
follow-through, merged r7 from the former planroute_audit.py twin).

Two corpora, selected by ``--mode``:

- ``shapes`` (default): hand-written raw-SQL spellings of
  rollup-servable queries — route/refuse + reason per shape, so
  widening work targets the most common refusals instead of guesses.
- ``dsl``: join-free single-table aggregate DSL entries respelled as
  raw Spark SQL by the assembler (what a migrating user would run),
  plus a few extra raw spellings; refusals bucketed by reason.

Usage: python scripts/plan_route_audit.py [sf_dir] [--mode=shapes|dsl]
"""
import sys
import tempfile
from collections import Counter

sys.path.insert(0, ".")

from query_planner_optimizer_spark.catalog import Catalog  # noqa: E402
from query_planner_optimizer_spark.plans.catalyst_router import (  # noqa: E402
    PlanRouter,
)
from query_planner_optimizer_spark.prepare import build_rollups  # noqa: E402
from query_planner_optimizer_spark.session import get_spark  # noqa: E402

SHAPES = [
    ("plain_day", "SELECT day, round(sum(value), 6) AS sv "
     "FROM V GROUP BY day"),
    ("count_star", "SELECT day, count(*) AS n FROM V GROUP BY day"),
    ("avg_derived", "SELECT day, round(avg(value), 6) AS av "
     "FROM V GROUP BY day"),
    ("eq_filter", "SELECT day, count(*) AS n FROM V "
     "WHERE event_type = 'click' GROUP BY day"),
    ("in_filter", "SELECT day, count(*) AS n FROM V "
     "WHERE event_type IN ('click', 'view') GROUP BY day"),
    ("between_day", "SELECT day, count(*) AS n FROM V "
     "WHERE day BETWEEN '2024-01-02' AND '2024-01-15' GROUP BY day"),
    ("week_grain", "SELECT week, count(*) AS n FROM V GROUP BY week"),
    ("having_count", "SELECT day, count(*) AS n FROM V GROUP BY day "
     "HAVING count(*) > 10"),
    ("having_alias", "SELECT day, count(*) AS n FROM V GROUP BY day "
     "HAVING n > 10"),
    ("order_by_key", "SELECT day, count(*) AS n FROM V GROUP BY day "
     "ORDER BY day"),
    ("order_by_agg_alias", "SELECT day, count(*) AS n FROM V "
     "GROUP BY day ORDER BY n DESC LIMIT 5"),
    ("limit_only", "SELECT day, count(*) AS n FROM V GROUP BY day "
     "LIMIT 7"),
    ("ratio_post", "SELECT day, round(sum(value) / count(*), 6) AS r "
     "FROM V GROUP BY day"),
    ("cast_filter", "SELECT day, count(*) AS n FROM V "
     "WHERE CAST(day AS STRING) = '2024-01-03' GROUP BY day"),
    ("date_lit_filter", "SELECT day, count(*) AS n FROM V "
     "WHERE day = DATE '2024-01-03' GROUP BY day"),
    ("neq_filter", "SELECT day, count(*) AS n FROM V "
     "WHERE event_type <> 'click' GROUP BY day"),
    ("or_filter", "SELECT day, count(*) AS n FROM V "
     "WHERE event_type = 'click' OR event_type = 'view' GROUP BY day"),
    ("two_keys", "SELECT day, event_type, count(*) AS n FROM V "
     "GROUP BY day, event_type"),
    ("ungrouped", "SELECT round(sum(value), 6) AS sv FROM V"),
    ("expr_group_lower", "SELECT lower(event_type) AS e, count(*) AS n "
     "FROM V GROUP BY lower(event_type)"),
    ("sum_plus_lit", "SELECT day, round(sum(value), 6) + 1.0 AS s1 "
     "FROM V GROUP BY day"),
    ("count_col", "SELECT day, count(value) AS nv FROM V GROUP BY day"),
    ("distinct_users", "SELECT day, count(DISTINCT user_id) AS du "
     "FROM V GROUP BY day"),
    ("minute_grain", "SELECT minute, count(*) AS n FROM V "
     "GROUP BY minute"),
    ("cast_range", "SELECT day, count(*) AS n FROM V "
     "WHERE CAST(day AS STRING) >= '2024-01-05' GROUP BY day"),
    ("cast_in", "SELECT day, count(*) AS n FROM V "
     "WHERE CAST(day AS STRING) IN ('2024-01-03', '2024-01-04') "
     "GROUP BY day"),
    ("cast_noncanon", "SELECT day, count(*) AS n FROM V "
     "WHERE CAST(day AS STRING) = '2024-1-3' GROUP BY day"),
    ("cast_flip", "SELECT day, count(*) AS n FROM V "
     "WHERE '2024-01-05' < CAST(day AS STRING) GROUP BY day"),
    ("cast_between", "SELECT day, count(*) AS n FROM V "
     "WHERE CAST(day AS STRING) BETWEEN '2024-01-02' AND '2024-01-05' "
     "GROUP BY day"),
    ("hour_grain", "SELECT hour, count(*) AS n FROM V GROUP BY hour"),
    ("nulls_first", "SELECT day, count(*) AS n FROM V GROUP BY day "
     "ORDER BY day DESC NULLS FIRST LIMIT 5"),
    ("nulls_last", "SELECT day, count(*) AS n FROM V GROUP BY day "
     "ORDER BY n DESC NULLS LAST, day LIMIT 5"),
]

RAW_DSL_EXTRAS = {
    "raw_cast_col_filter": (
        "SELECT day, count(*) AS n FROM V "
        "WHERE CAST(event_type AS STRING) = 'click' GROUP BY day"),
    "raw_int_vs_double_lit": (
        "SELECT event_type, count(*) AS n FROM V "
        "WHERE value > 1.5 GROUP BY event_type"),
    "raw_minute_grain": (
        "SELECT minute, round(sum(value), 4) AS sv FROM V "
        "WHERE minute >= '2024-01-02 10:00' GROUP BY minute"),
    "raw_day_cast_string": (
        "SELECT day, count(*) AS n FROM V "
        "WHERE CAST(day AS STRING) BETWEEN '2024-01-02' AND "
        "'2024-01-05' GROUP BY day"),
    "raw_having_post": (
        "SELECT event_type, sum(value) AS sv FROM V "
        "GROUP BY event_type HAVING count(*) > 100"),
}


def _dsl_candidates(cat) -> dict:
    from __spark_entry__ import DSL_QUERIES
    from query_planner_optimizer_spark.dsl.assembler import assemble_sql

    out: dict = {}
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
        sql = sql.replace("FROM events", "FROM V")
        if "events." in sql:
            # correlated-subquery spelling qualifies the outer table by
            # its original name — the FROM rewrite breaks the
            # correlation alias, so the candidate is not representative
            continue
        out[name] = sql
    out.update(RAW_DSL_EXTRAS)
    return out


def main() -> None:
    argv = [a for a in sys.argv[1:]]
    mode = "shapes"
    for a in list(argv):
        if a.startswith("--mode="):
            mode = a.split("=", 1)[1]
            argv.remove(a)
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"

    spark = get_spark(app_name="plan-route-audit")
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, sf_dir, register_views=False)
    events = cat.table("events")
    events.createOrReplaceTempView("V")
    rollups = {"agg_day_etype": {"keys": ["day", "event_type"],
                                 "aggs": {"value": ["sum", "count",
                                                    "min", "max"]}},
               "agg_minute_etype": {"keys": ["minute", "event_type"],
                                    "aggs": {"value": ["sum", "count"]}}}
    agg_dir = tempfile.mkdtemp(prefix="qpo_plan_audit_")
    build_rollups(events, agg_dir, rollups)
    router = PlanRouter(spark, agg_dir, rollups, view="V", frame=events)

    corpus = (dict(SHAPES) if mode == "shapes"
              else _dsl_candidates(cat))
    reasons: Counter = Counter()
    detail: dict = {}
    routed_n = 0
    for name, sql in (SHAPES if mode == "shapes"
                      else sorted(corpus.items())):
        try:
            _, routed = router.sql(sql)
            reason = "" if routed else str(router.last_reason)
        except Exception as e:  # noqa: BLE001
            routed, reason = False, f"EXC {type(e).__name__}: {e}"
        routed_n += routed
        tag = "ROUTE " if routed else "refuse"
        print(f"{tag} {name:28s} {reason[:110]}")
        if not routed:
            reasons[reason] += 1
            detail.setdefault(reason, []).append(name)
    print(f"\n{routed_n}/{len(corpus)} routed ({mode} corpus)\n")
    for reason, n in reasons.most_common():
        print(f"{n:3d}  {reason[:110]}")
        for name in detail[reason][:6]:
            print(f"       {name}")


if __name__ == "__main__":
    main()
