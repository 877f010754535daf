"""Join DSL extension + analytics operator tests."""

from __future__ import annotations

import pandas as pd
import pytest

from query_planner_optimizer_spark.dsl.assembler import assemble_sql
from query_planner_optimizer_spark.dsl.compiler import QueryError, compile_query

from .conftest import assert_matches_duckdb

JOIN_QUERIES = [
    ("inner_broadcast_chain", {
        "select": ["n_name", {"SUM": "o_totalprice", "as": "revenue", "round": 4}],
        "from": "orders",
        "join": [
            {"table": "customer", "on": [["o_custkey", "c_custkey"]],
             "hint": "broadcast"},
            {"table": "nation", "on": [["c_nationkey", "n_nationkey"]],
             "hint": "broadcast"},
        ],
        "group_by": ["n_name"],
        "order_by": [{"col": "revenue", "dir": "desc"}],
    }),
    ("left_join", {
        "select": ["c_mktsegment", {"COUNT": "o_orderkey", "as": "n_orders"},
                   {"COUNT": "*", "as": "n_rows"}],
        "from": "customer",
        "join": [{"table": "orders", "on": [["c_custkey", "o_custkey"]],
                  "type": "left"}],
        "group_by": ["c_mktsegment"],
    }),
    ("semi_join", {
        "select": ["o_orderstatus", {"COUNT": "*", "as": "n"}],
        "from": "orders",
        "join": [{"table": "lineitem", "on": [["o_orderkey", "l_orderkey"]],
                  "type": "semi"}],
        "group_by": ["o_orderstatus"],
    }),
    ("join_full_outer", {
        # r11: FULL OUTER with differently-named keys + pre-join filter
        # on the joined table — events whose customer the filter
        # removed null-extend into a NULL-segment group; zero-event
        # customers null-extend the event columns (COUNT(value) vs
        # COUNT(*) exposes both). Explicit NULLS placement: Spark
        # (ASC→FIRST) and DuckDB (ASC→LAST) defaults disagree and the
        # NULL group key is the point of the test.
        "select": ["c_mktsegment",
                   {"COUNT": "value", "as": "n_event_rows"},
                   {"COUNT": "*", "as": "n_rows"}],
        "from": "events",
        "join": [{"table": "customer", "on": [["user_id", "c_custkey"]],
                  "type": "full",
                  "where": [{"col": "c_acctbal", "op": "gt",
                             "val": 2000}]}],
        "group_by": ["c_mktsegment"],
        "order_by": [{"col": "c_mktsegment", "dir": "asc",
                      "nulls": "last"}],
    }),
    ("window_over_full_outer", {
        # r11: window over a null-extending frame — the window-order
        # `nulls` knob pins frame contents (engine defaults disagree);
        # rank + cumulative sum are tie-safe among the NULL-keyed
        # peers. The fuzz branch draws this shape generatively; this
        # pin keeps one deterministic instance in CI.
        "select": ["o_orderkey", "c_custkey", "c_mktsegment",
                   "o_totalprice",
                   {"win": "rank", "partition_by": ["c_mktsegment"],
                    "order_by": [{"col": "o_orderkey", "dir": "asc",
                                  "nulls": "last"}],
                    "as": "seg_rank"},
                   {"win": "sum", "of": "o_totalprice",
                    "partition_by": ["c_mktsegment"],
                    "order_by": [{"col": "o_orderkey", "dir": "desc",
                                  "nulls": "first"}],
                    "as": "seg_running", "round": 2}],
        "from": "orders",
        "join": [{"table": "customer", "on": [["o_custkey", "c_custkey"]],
                  "type": "full",
                  "where": [{"col": "c_acctbal", "op": "gt",
                             "val": 4000}]}],
        "order_by": [{"col": "o_orderkey", "dir": "asc", "nulls": "last"},
                     {"col": "c_custkey", "dir": "asc", "nulls": "last"}],
        "limit": 300,
    }),
    ("anti_join", {
        "select": [{"COUNT": "*", "as": "n_customers_without_orders"}],
        "from": "customer",
        "join": [{"table": "orders", "on": [["c_custkey", "o_custkey"]],
                  "type": "anti"}],
    }),
    ("join_with_where_and_derived", {
        "select": ["p_brand", {"AVG": "l_extendedprice", "as": "avg_price",
                               "round": 6}],
        "from": "lineitem",
        "join": [{"table": "part", "on": [["l_partkey", "p_partkey"]],
                  "hint": "broadcast"}],
        "where": [{"col": "l_discount", "op": "gt", "val": 0.03},
                  {"col": "p_size", "op": "lte", "val": 30}],
        "group_by": ["p_brand"],
    }),
]


def _merged_type_map(q, catalog):
    tm = catalog.spark_type_map(q.get("from", "events"))
    for j in q.get("join") or []:
        tm.update(catalog.spark_type_map(j["table"]))
    return tm


@pytest.mark.parametrize("name,q", JOIN_QUERIES, ids=[n for n, _ in JOIN_QUERIES])
def test_join_dsl_matches_duckdb(name, q, catalog, ddb):
    df = compile_query(q, catalog)
    sql = assemble_sql(q, _merged_type_map(q, catalog), dialect="duckdb")
    assert_matches_duckdb(df, ddb, sql, ordered=bool(q.get("order_by")))


def test_broadcast_hint_takes_effect(catalog):
    q = JOIN_QUERIES[0][1]
    plan = compile_query(q, catalog)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_join_unknown_column_raises(catalog):
    with pytest.raises(QueryError):
        compile_query(
            {"select": ["n_name"], "from": "orders",
             "join": [{"table": "nation", "on": [["nope", "n_nationkey"]]}]},
            catalog,
        )


def test_join_without_on_raises(catalog):
    with pytest.raises(QueryError):
        compile_query(
            {"select": ["n_name"], "from": "orders",
             "join": [{"table": "nation"}]},
            catalog,
        )


def test_join_using_same_named_keys(spark, catalog, ddb):
    """Same-named key pairs take USING semantics on both paths: one
    output copy of the key, no ambiguous references downstream."""
    users = pd.DataFrame(
        {"user_id": [1, 2, 3, 4], "seg": ["a", "a", "b", "b"]}
    )
    purchases = pd.DataFrame(
        {"user_id": [1, 1, 2, 3, 9], "amt": [5.0, 7.0, 11.0, 13.0, 99.0]}
    )
    spark.createDataFrame(users).createOrReplaceTempView("udsl_users")
    spark.createDataFrame(purchases).createOrReplaceTempView("udsl_purchases")
    ddb.register("udsl_users", users)
    ddb.register("udsl_purchases", purchases)

    q = {
        "select": ["seg", {"SUM": "amt", "as": "total"},
                   {"COUNT": "*", "as": "n"}],
        "from": "udsl_purchases",
        "join": [{"table": "udsl_users", "on": ["user_id"]}],
        "group_by": ["seg"],
        "order_by": ["seg"],
    }
    df = compile_query(q, catalog)
    tm = {f.name: f.dataType for f in df.schema.fields}
    tm.update({f.name: f.dataType
               for f in catalog.spark.table("udsl_purchases").schema.fields})
    tm.update({f.name: f.dataType
               for f in catalog.spark.table("udsl_users").schema.fields})
    sql = assemble_sql(q, tm, dialect="duckdb")
    assert "USING" in sql
    assert_matches_duckdb(df, ddb, sql, ordered=True)

    # Row-level USING join keeps a single key column.
    q2 = {"select": ["user_id", "seg", "amt"],
          "from": "udsl_purchases",
          "join": [{"table": "udsl_users", "on": ["user_id"]}]}
    df2 = compile_query(q2, catalog)
    assert df2.columns.count("user_id") == 1
    sql2 = assemble_sql(q2, tm, dialect="duckdb")
    assert_matches_duckdb(df2, ddb, sql2)

    # Mixed same-named + differently-named pairs are rejected on BOTH
    # paths (ambiguous references).
    q3 = {"select": ["seg"], "from": "udsl_purchases",
          "join": [{"table": "udsl_users",
                    "on": ["user_id", ["amt", "seg"]]}]}
    with pytest.raises(QueryError):
        compile_query(q3, catalog)
    with pytest.raises(QueryError):
        assemble_sql(q3, tm, dialect="duckdb")


def test_order_by_unknown_column_raises_both_paths(catalog):
    """An unresolvable order_by name raises at build time on the engine
    AND the oracle path (the assembler used to silently pass the raw
    name through to deferred SQL errors)."""
    q = {"select": ["o_orderstatus", {"COUNT": "*", "as": "n"}],
         "from": "orders", "group_by": ["o_orderstatus"],
         "order_by": ["no_such_col"]}
    with pytest.raises(QueryError):
        compile_query(q, catalog)
    with pytest.raises(QueryError):
        assemble_sql(q, catalog.spark_type_map("orders"), dialect="duckdb")


def test_zscore_outliers_match_oracle_and_plan(spark, ddb):
    from query_planner_optimizer_spark.operators import analytics

    from .conftest import SF_DIR, assert_matches_duckdb

    df = analytics.q_zscore_outliers(spark, SF_DIR)
    assert_matches_duckdb(
        df, ddb, analytics.entry_oracles()["analytics_zscore_outliers"]
    )
    # stats attach via broadcast join, not a per-row window
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "Window" not in plan


def test_approx_distinct_within_rsd(spark, catalog):
    """HLL++ sketch (the 100 TB path) stays within ~3x its declared 1%
    relative standard deviation of the exact distinct count."""
    from query_planner_optimizer_spark.operators.analytics import distinct_count

    rows = distinct_count(
        catalog.table("events"), ["event_type"], "user_id"
    ).collect()
    for r in rows:
        assert abs(r.n_approx - r.n_distinct) <= max(3, 0.03 * r.n_distinct), r


def test_percentile_approx_tracks_exact(spark, catalog):
    from pyspark.sql import functions as F

    events = catalog.table("events")
    got = events.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.5)).alias("exact"),
        F.percentile_approx(F.col("value"), F.lit(0.5), F.lit(10000)).alias("approx"),
    ).collect()
    for r in got:
        assert abs(r.approx - r.exact) <= 0.05 * max(1.0, abs(r.exact)), r


def test_latest_per_key_matches_oracle_no_window(spark, ddb):
    from query_planner_optimizer_spark.operators import analytics

    from .conftest import SF_DIR, assert_matches_duckdb

    df = analytics.q_latest_event_per_user(spark, SF_DIR)
    assert_matches_duckdb(
        df, ddb, analytics.entry_oracles()["analytics_latest_per_key"]
    )
    # argmax runs as a partial-aggregable max(struct), never a window sort
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_embedding_centroids_match_oracle(spark, ddb):
    from query_planner_optimizer_spark.operators import analytics

    from .conftest import SF_DIR, assert_matches_duckdb

    df = analytics.q_embedding_centroids(spark, SF_DIR)
    assert_matches_duckdb(
        df, ddb, analytics.entry_oracles()["analytics_embedding_centroids"]
    )


def test_json_props_rollup_handles_malformed(spark, ddb):
    from query_planner_optimizer_spark.operators import analytics

    from .conftest import SF_DIR, assert_matches_duckdb

    assert_matches_duckdb(
        analytics.q_json_props(spark, SF_DIR), ddb,
        analytics.entry_oracles()["analytics_json_props"],
    )
    # Malformed / missing-field JSON parses to NULL and drops out of
    # SUM/AVG while n_rows still counts the row.
    rows = [(1, "a", '{"k": 10}'), (2, "a", "not json"),
            (3, "a", '{"other": 1}'), (4, "b", None)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "props"])
    got = {r.event_type: r for r in
           analytics.json_props_rollup(df, ["event_type"]).collect()}
    assert got["a"].sum_k == 10 and got["a"].n_rows == 3
    assert got["b"].sum_k is None and got["b"].n_rows == 1


def test_cube_counts_match_oracle(spark, ddb):
    from .conftest import SF_DIR, assert_matches_duckdb  # noqa: F401
    from query_planner_optimizer_spark.operators import analytics

    assert_matches_duckdb(
        analytics.q_cube_day_type(spark, SF_DIR), ddb,
        analytics.entry_oracles()["analytics_cube_counts"],
    )


def test_cube_contains_rollup_sets_plus_type_marginals(spark):
    from .conftest import SF_DIR, assert_matches_duckdb  # noqa: F401
    """CUBE(day, type) = ROLLUP(day, type) ∪ the (type)-only marginal
    sets; the grand-total row agrees between both."""
    from query_planner_optimizer_spark.operators import analytics

    cube = {(r.day, r.event_type): r.n_rows
            for r in analytics.q_cube_day_type(spark, SF_DIR).collect()}
    roll = {(r.day, r.event_type): r.n_rows
            for r in analytics.q_rollup_day_type(spark, SF_DIR).collect()}
    assert set(roll) <= set(cube)
    assert all(cube[k] == v for k, v in roll.items())
    type_marginals = {k for k in cube if k[0] == "ALL" and k[1] != "ALL"}
    assert set(cube) == set(roll) | type_marginals
    assert cube[("ALL", "ALL")] == sum(
        v for (d, t), v in cube.items() if d != "ALL" and t == "ALL"
    )


def test_cube_null_key_distinct_from_subtotal(spark):
    """A data-NULL grouping key renders 'NULL', a subtotal row renders
    'ALL' — the grouping() flags disambiguate what a COALESCE-only
    sentinel conflates (r3 ADVICE)."""
    from query_planner_optimizer_spark.operators import analytics
    from pyspark.sql import functions as SF

    rows = [("a", 1.0), (None, 2.0), ("a", 4.0), (None, 8.0)]
    df = spark.createDataFrame(rows, ["k", "value"])
    out = analytics.cube_counts(df, ["k"], "value").select(
        SF.when(SF.col("__g_k") == 1, SF.lit("ALL"))
        .otherwise(SF.coalesce(SF.col("k"), SF.lit("NULL")))
        .alias("k"),
        "n_rows", "sum_value",
    )
    got = {r.k: (r.n_rows, r.sum_value) for r in out.collect()}
    assert got["NULL"] == (2, 10.0)   # the data-null group, not a subtotal
    assert got["ALL"] == (4, 15.0)    # the grand total, not the null group
    assert got["a"] == (2, 5.0)


def test_pivot_matches_oracle_single_shuffle(spark, ddb):
    from .conftest import SF_DIR, assert_matches_duckdb  # noqa: F401
    """The crosstab matches its conditional-aggregate oracle, and the
    explicit value list keeps the plan to ONE aggregate pass (no
    second distinct-scan job for pivot-key discovery)."""
    from query_planner_optimizer_spark.operators import analytics

    df = analytics.q_pivot_day_by_type(spark, SF_DIR)
    assert_matches_duckdb(
        df, ddb, analytics.entry_oracles()["analytics_pivot_day_by_type"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE dumps the tree twice
    assert final.count("Exchange") <= 2  # the aggregate's own shuffle only


def test_salted_agg_equals_plain_groupby(spark, ddb):
    """The two-phase salted aggregation is semantics-preserving: its
    oracle IS the plain GROUP BY, and the plan really has two
    aggregation exchanges (salt phase + final phase)."""
    from .conftest import SF_DIR, assert_matches_duckdb
    from query_planner_optimizer_spark.operators import analytics

    df = analytics.q_salted_agg(spark, SF_DIR)
    assert_matches_duckdb(
        df, ddb, analytics.entry_oracles()["analytics_salted_agg"]
    )


def test_grouping_sets_matches_oracle_and_union_construction(spark, ddb):
    """GROUPING SETS ((day,type),(type),()) vs the oracle, and vs an
    independent union-of-plain-group-bys construction; rejects sets
    using undeclared columns."""
    import pytest

    from .conftest import SF_DIR, assert_matches_duckdb
    from query_planner_optimizer_spark.operators import analytics

    df = analytics.q_grouping_sets_day_type(spark, SF_DIR)
    assert_matches_duckdb(
        df, ddb, analytics.entry_oracles()["analytics_grouping_sets"]
    )
    got = {(r.day, r.event_type): r.n_rows for r in df.collect()}
    # independent construction: three plain GROUP BYs
    cube = {(r.day, r.event_type): r.n_rows
            for r in analytics.q_cube_day_type(spark, SF_DIR).collect()}
    want = {k: v for k, v in cube.items()
            if (k[0] != "ALL" and k[1] != "ALL")   # (day, type)
            or (k[0] == "ALL" and k[1] != "ALL")   # (type)
            or k == ("ALL", "ALL")}                # ()
    assert got == want
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    with pytest.raises(ValueError, match="non-grouping"):
        analytics.grouping_sets_counts(
            events, [["user_id"]], ["event_type"], "value"
        )


def test_profile_table_edges(spark):
    """Profiler edge cases: NULL counting, all-NULL column yields NULL
    avg (not Inf/NaN), exact distinct ignores NULLs, string length avg,
    and unsupported dtypes are refused."""
    import pytest

    from query_planner_optimizer_spark.operators.analytics import (
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "ab", None), (2, None, None), (2, "cdef", None)],
        "x bigint, s string, z double",
    )
    rows = {r.col_name: r for r in profile_table(df).collect()}
    assert rows["x"].n_rows == 3 and rows["x"].n_null == 0
    assert rows["x"].n_distinct == 2
    assert rows["x"].min_num == 1.0 and rows["x"].max_num == 2.0
    assert abs(rows["x"].avg_num - 5.0 / 3.0) < 1e-12
    assert rows["s"].n_null == 1 and rows["s"].n_distinct == 2
    assert rows["s"].min_str == "ab" and rows["s"].max_str == "cdef"
    assert rows["s"].avg_len == 3.0
    # all-NULL double column: guarded division -> NULL, never Inf
    assert rows["z"].n_null == 3 and rows["z"].n_distinct == 0
    assert rows["z"].avg_num is None and rows["z"].min_num is None
    # unsupported dtype refused loudly
    arr = spark.createDataFrame([([1, 2],)], "a array<int>")
    with pytest.raises(TypeError, match="unsupported dtype"):
        profile_table(arr)

    # approx mode (r7): identical schema, every non-distinct metric
    # bit-identical to exact mode, small-cardinality estimates exact
    # (HLL++ stores small sets verbatim), no Expand in the plan
    ap = profile_table(df, distinct_mode="approx", rsd=0.05)
    ex = profile_table(df)
    assert ap.columns == ex.columns
    arows = {r.col_name: r for r in ap.collect()}
    for c in ("x", "s", "z"):
        got, want = arows[c].asDict(), rows[c].asDict()
        nd = got.pop("n_distinct"), want.pop("n_distinct")
        assert got == want, c
        assert nd[0] == nd[1], c  # exact at tiny cardinality
    assert "Expand" not in ap._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in ex._jdf.queryExecution().executedPlan().toString()
    with pytest.raises(ValueError, match="distinct_mode"):
        profile_table(df, distinct_mode="hll")


def test_key_skew_report_numbers(spark):
    """Known distribution: key 1 x6, key 2 x3, key 3 x1 -> exact
    shares; top_n smaller than key count sums only the heaviest."""
    from query_planner_optimizer_spark.operators.analytics import (
        key_skew_report,
    )

    df = spark.createDataFrame(
        [(1,)] * 6 + [(2,)] * 3 + [(3,)], "k bigint"
    )
    r = key_skew_report(df, "k", top_n=2).collect()[0]
    assert (r.n_rows, r.n_keys, r.max_key_rows) == (10, 3, 6)
    assert r.top1_share == 0.6
    assert r.topn_rows == 9 and r.topn_share == 0.9
    assert abs(r.avg_rows_per_key - 10 / 3) < 1e-12
    assert abs(r.skew_ratio - 1.8) < 1e-12


def test_corr_pairs_known_values(spark):
    """Perfect linear -> 1.0; perfect inverse -> -1.0; constant column
    -> NULL (guarded, never NaN); NULL rows drop from that pair only."""
    from query_planner_optimizer_spark.operators.analytics import (
        corr_pairs,
    )

    df = spark.createDataFrame(
        [(1.0, 2.0, 5.0, 7.0), (2.0, 4.0, 5.0, 6.0),
         (3.0, 6.0, 5.0, 5.0), (4.0, None, 5.0, 4.0)],
        "x double, y double, c double, z double",
    )
    out = {(r.col_x, r.col_y): r for r in
           corr_pairs(df, ["x", "y", "c", "z"]).collect()}
    assert out[("x", "y")].n_pairs == 3
    assert abs(out[("x", "y")].corr - 1.0) < 1e-12
    assert out[("x", "z")].n_pairs == 4
    assert abs(out[("x", "z")].corr + 1.0) < 1e-12
    assert out[("x", "c")].corr is None  # constant -> zero variance
    assert out[("c", "z")].corr is None


def test_winsorized_stats_semantics(spark):
    """Clip counts and mean on a known distribution; NULLs drop; the
    clipped mean sits between the raw percentiles."""
    from query_planner_optimizer_spark.operators.analytics import (
        winsorized_stats,
    )

    vals = [float(v) for v in range(1, 100)] + [10_000.0, None]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, value double")
    r = winsorized_stats(df, ["g"], "value").collect()[0]
    assert r.n_rows == 100  # NULL dropped
    assert r.n_clip_lo > 0 and r.n_clip_hi > 0
    assert r.p_lo < r.p_hi
    # the 10000 outlier is clipped to p_hi, so the mean stays bounded
    assert r.p_lo <= r.winsorized_mean <= r.p_hi


def test_mad_outliers_semantics(spark):
    """A planted extreme value is flagged; a constant group (MAD=0)
    flags nothing; flagged rows satisfy the k·MAD bound."""
    from query_planner_optimizer_spark.operators.analytics import (
        mad_outliers,
    )

    rows = ([("g", i, float(v)) for i, v in enumerate(
        [10, 11, 12, 13, 14, 15, 16, 10_000])]
        + [("c", 100 + i, 5.0) for i in range(6)])
    df = spark.createDataFrame(rows, "grp string, event_id long, "
                                     "value double")
    out = mad_outliers(df, ["grp"], "value").collect()
    assert [r.value for r in out] == [10_000.0]
    for r in out:
        assert r.dev > 3.0 * r.mad and r.mad > 0
    assert not any(r.grp == "c" for r in out)  # constant group silent
