"""Property-based differential testing: random DSL queries (drawn from
the full grammar) must produce identical results through the compiler
(DSL → DataFrame) and the assembler twin (DSL → SQL → spark.sql) —
the in-repo version of the reference's engine-vs-baseline diff scheme
(SURVEY.md §5), but over the whole query space instead of 5 fixtures."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from query_planner_optimizer_spark.dsl.assembler import assemble_sql
from query_planner_optimizer_spark.dsl.compiler import compile_query

from .conftest import normalize

PLAIN_COLS = ["event_id", "user_id", "event_type", "value", "day", "minute"]
GROUP_COLS = ["event_type", "day", "minute", "user_id"]
ETYPES = ["view", "click", "purchase", "signup", "error"]

agg_terms = st.sampled_from([
    {"SUM": "value", "as": "sum_value", "round": 6},
    {"AVG": "value", "as": "avg_value", "round": 6},
    {"COUNT": "*", "as": "cnt"},
    {"COUNT": "value", "as": "cnt_value"},
])

conditions = st.one_of(
    st.builds(
        lambda op, v: {"col": "event_type", "op": op, "val": v},
        st.sampled_from(["eq", "neq"]), st.sampled_from(ETYPES),
    ),
    st.builds(
        lambda vs: {"col": "event_type", "op": "in", "val": sorted(vs)},
        st.sets(st.sampled_from(ETYPES), min_size=1, max_size=3),
    ),
    st.builds(
        lambda op, v: {"col": "value", "op": op, "val": round(v, 2)},
        st.sampled_from(["lt", "lte", "gt", "gte"]),
        st.floats(min_value=0, max_value=100, allow_nan=False),
    ),
    st.builds(
        lambda a, b: {"col": "value", "op": "between",
                      "val": [round(min(a, b), 2), round(max(a, b), 2)]},
        st.floats(min_value=0, max_value=100, allow_nan=False),
        st.floats(min_value=0, max_value=100, allow_nan=False),
    ),
    st.builds(
        lambda d1, d2: {"col": "day", "op": "between",
                        "val": [f"2024-01-{min(d1, d2):02d}",
                                f"2024-01-{max(d1, d2):02d}"]},
        st.integers(min_value=1, max_value=28),
        st.integers(min_value=1, max_value=28),
    ),
)


@st.composite
def dsl_queries(draw) -> dict:
    q: dict = {"from": "events"}
    grouped = draw(st.booleans())
    if grouped:
        keys = draw(st.lists(st.sampled_from(GROUP_COLS), min_size=0,
                             max_size=2, unique=True))
        aggs = draw(st.lists(agg_terms, min_size=1, max_size=3,
                             unique_by=lambda t: tuple(sorted(t.items()))))
        q["select"] = [*keys, *aggs]
        if keys:
            q["group_by"] = keys
    else:
        q["select"] = draw(st.lists(st.sampled_from(PLAIN_COLS), min_size=1,
                                    max_size=4, unique=True))
    where = draw(st.lists(conditions, min_size=0, max_size=3))
    if where:
        q["where"] = where
    if draw(st.booleans()):
        out_cols = [t if isinstance(t, str) else t["as"] for t in q["select"]]
        ob = draw(st.lists(st.sampled_from(out_cols), min_size=1,
                           max_size=2, unique=True))
        q["order_by"] = [
            {"col": c, "dir": draw(st.sampled_from(["asc", "desc"]))}
            for c in ob
        ]
    return q


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=dsl_queries())
def test_compiler_equals_sql_twin(q, spark, catalog):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"), dialect="spark")
    want = spark.sql(sql).toPandas()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=dsl_queries())
def test_compiler_equals_duckdb_oracle(q, spark, catalog, ddb):
    """Three-way: the same random query through the DuckDB dialect —
    a genuinely independent engine as the oracle."""
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"), dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )
