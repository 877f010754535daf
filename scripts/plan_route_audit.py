"""Audit the Catalyst-plan router's refusal surface over a corpus of
rollup-servable SQL shapes (VERDICT r5 item 4 follow-through): print
route/refuse + reason per shape so widening work targets the most
common refusals instead of guesses.

Usage: python scripts/plan_route_audit.py [sf_dir]
"""
import sys
import tempfile

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
    ("hour_grain", "SELECT hour, count(*) AS n FROM V GROUP BY hour"),
    ("nulls_first", "SELECT day, count(*) AS n FROM V GROUP BY day "
     "ORDER BY day DESC NULLS FIRST LIMIT 5"),
    ("nulls_last", "SELECT day, count(*) AS n FROM V GROUP BY day "
     "ORDER BY n DESC NULLS LAST, day LIMIT 5"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="plan-route-audit")
    spark.sparkContext.setLogLevel("ERROR")
    events = Catalog(spark, sf_dir, register_views=False).table("events")
    events.createOrReplaceTempView("V")
    rollups = {"agg_day_etype": {"keys": ["day", "event_type"],
                                 "aggs": {"value": ["sum", "count"]}}}
    agg_dir = tempfile.mkdtemp(prefix="qpo_plan_audit_")
    build_rollups(events, agg_dir, rollups)
    router = PlanRouter(spark, agg_dir, rollups, view="V")
    routed_n = 0
    for name, sql in SHAPES:
        try:
            _, routed = router.sql(sql)
            reason = "" if routed else str(router.last_reason)
        except Exception as e:  # noqa: BLE001
            routed, reason = False, f"EXC {type(e).__name__}: {e}"
        tag = "ROUTE " if routed else "refuse"
        routed_n += routed
        print(f"{tag} {name:22s} {reason[:120]}")
    print(f"\n{routed_n}/{len(SHAPES)} routed")


if __name__ == "__main__":
    main()
