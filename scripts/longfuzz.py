#!/usr/bin/env python
"""Long-run hypothesis fuzz over the DSL twin strategies — the same
generators as tests/test_property_dsl.py at a much higher example
count. Every semantic catch since round 5 came from these draws
(grouping-dict empty-input COUNT_DISTINCT zeroing, the r8
exists-empties-input marker bug), so burning spare wall-clock here has
the best bug-per-minute rate in the repo.

Usage: python scripts/longfuzz.py [examples-per-target] [target-substr,...]
Exits non-zero on the first falsifying example (hypothesis prints it).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from hypothesis import HealthCheck, given, settings  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 150

    import tests.test_property_dsl as P
    from query_planner_optimizer_spark.catalog import Catalog
    from query_planner_optimizer_spark.session import get_spark
    from tests.conftest import TABLES

    spark = get_spark(app_name="qpo-longfuzz")
    spark.sparkContext.setLogLevel("ERROR")
    catalog = Catalog(spark, SF_DIR)
    catalog.register_all()
    ddb = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            ddb.execute(f"CREATE OR REPLACE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{path}')")

    # (strategy, inner test, fixture args) — inner_test is the
    # undecorated body behind each @given test.
    targets = [
        ("sql_twin", P.dsl_queries(),
         P.test_compiler_equals_sql_twin.hypothesis.inner_test,
         (spark, catalog)),
        ("duckdb_oracle", P.dsl_queries(),
         P.test_compiler_equals_duckdb_oracle.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("nested", P.nested_queries(),
         P.test_nested_compiler_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("composed", P.composed_queries(),
         P.test_composed_nesting_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("joins", P.join_queries(),
         P.test_join_compiler_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("setops", P.setop_queries(),
         P.test_setop_compiler_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        # r9: window frames (ROWS/RANGE bounds × fns × rounds) — the
        # rounded-SUM/AVG-over-frames surface the r9 DECIMAL+FLOOR
        # window contract covers; association order and boundary
        # quotients are only settled by draws.
        ("windows", P.window_frame_queries(),
         P.test_window_frames_equal_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("windows_twin", P.window_frame_queries(),
         P.test_window_frames_equal_sql_twin.hypothesis.inner_test,
         (spark, catalog)),
        # r10: rounded SUM/AVG through the eager-agg single-join
        # rewrite (DECIMAL partials across the join + re-aggregation,
        # Q18 membership fusion, alias-HAVING) — with a fires-exactly-
        # when-pushable assert so draws never silently miss the
        # rewrite.
        ("eageragg", P.eager_agg_queries(),
         P.test_eager_agg_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("eageragg_twin", P.eager_agg_queries(),
         P.test_eager_agg_equals_sql_twin.hypothesis.inner_test,
         (spark, catalog)),
        # r11: window functions over a JOINED frame (partition/value
        # columns spanning both join sides) and set ops over grouped
        # CTE legs (shared multi-ref views → the persisted-CTE memo and
        # its sibling-closure cache key churn under distinct specs).
        ("windowjoin", P.window_join_queries(),
         P.test_window_join_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("windowjoin_twin", P.window_join_queries(),
         P.test_window_join_equals_sql_twin.hypothesis.inner_test,
         (spark, catalog)),
        ("setopcte", P.setop_cte_queries(),
         P.test_setop_cte_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("setopcte_twin", P.setop_cte_queries(),
         P.test_setop_cte_equals_sql_twin.hypothesis.inner_test,
         (spark, catalog)),
        # r12: set ops × FULL OUTER × windows in one draw — the last
        # undrawn composite (r11 VERDICT #4): null-extension × frame
        # contents × distinct semantics, the class that forced the r11
        # window-order nulls knob.
        ("setopfow", P.setop_fullouter_window_queries(),
         P.test_setop_fullouter_window_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("setopfow_twin", P.setop_fullouter_window_queries(),
         P.test_setop_fullouter_window_equals_sql_twin.hypothesis.inner_test,
         (spark, catalog)),
        # r13: the two genuinely undrawn composites from the r12 queue —
        # correlated SELECT-side scalars over a JOINED outer frame, and
        # HAVING-scalar-subquery thresholds over derived/CTE FROM legs.
        ("scalarjoin", P.scalar_join_queries(),
         P.test_scalar_join_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("scalarjoin_twin", P.scalar_join_queries(),
         P.test_scalar_join_equals_sql_twin.hypothesis.inner_test,
         (spark, catalog)),
        ("havingsub", P.having_sub_derived_queries(),
         P.test_having_sub_derived_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("havingsub_twin", P.having_sub_derived_queries(),
         P.test_having_sub_derived_equals_sql_twin.hypothesis.inner_test,
         (spark, catalog)),
        # r13 late (r14 queue pre-executed): set ops over JOINED legs,
        # and windows over a derived FROM whose inner leg carries a
        # HAVING-scalar-subquery threshold.
        ("setopjoin", P.setop_join_queries(),
         P.test_setop_join_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("setopjoin_twin", P.setop_join_queries(),
         P.test_setop_join_equals_sql_twin.hypothesis.inner_test,
         (spark, catalog)),
        ("windhaving", P.window_derived_having_queries(),
         P.test_window_derived_having_equals_duckdb.hypothesis.inner_test,
         (spark, catalog, ddb)),
        ("windhaving_twin", P.window_derived_having_queries(),
         P.test_window_derived_having_equals_sql_twin.hypothesis.inner_test,
         (spark, catalog)),
    ]
    def make_body(inner, args):
        # closure (not defaulted params — @given refuses defaults)
        def body(q):
            inner(q, *args)
        return body

    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name, strat, inner, args in targets:
        if only and not any(s in name for s in only):
            continue
        t0 = time.time()
        run = settings(max_examples=n, deadline=None,
                       suppress_health_check=list(HealthCheck))(
            given(q=strat)(make_body(inner, args)))
        run()
        print(f"{name}: {n} examples ok ({time.time() - t0:.0f}s)",
              flush=True)
    print("LONGFUZZ: all targets clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
