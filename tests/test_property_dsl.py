"""Property-based differential testing: random DSL queries (drawn from
the full grammar) must produce identical results through the compiler
(DSL → DataFrame) and the assembler twin (DSL → SQL → spark.sql) —
the in-repo version of the reference's engine-vs-baseline diff scheme
(SURVEY.md §5), but over the whole query space instead of 5 fixtures."""

from __future__ import annotations

import json

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

from query_planner_optimizer_spark.dsl.assembler import assemble_sql
from query_planner_optimizer_spark.dsl.compiler import compile_query

from .conftest import normalize


@pytest.fixture(autouse=True)
def _fresh_views(catalog):
    """The spark.sql() twin resolves table names through session temp
    views; RE-register the driver-testdata views before every test so a
    foreign Catalog elsewhere in the suite (the CLI end-to-end test
    registers an ad-events `events` view) can never leave this module
    pointed at the wrong dataset."""
    catalog.register_all()

PLAIN_COLS = ["event_id", "user_id", "event_type", "value", "day", "minute"]
GROUP_COLS = ["event_type", "day", "minute", "user_id"]
ETYPES = ["view", "click", "purchase", "signup", "error"]

agg_terms = st.sampled_from([
    {"SUM": "value", "as": "sum_value", "round": 6},
    {"AVG": "value", "as": "avg_value", "round": 6},
    {"COUNT": "*", "as": "cnt"},
    {"COUNT": "value", "as": "cnt_value"},
    {"MIN": "value", "as": "min_value", "round": 6},
    {"MAX": "value", "as": "max_value", "round": 6},
    # Unaliased terms — exercise the reference's output-naming contract:
    # results must be named sum(value) / count(*) etc. (lowercase).
    {"SUM": "value", "round": 6},
    {"COUNT": "*"},
    {"COUNT": "value"},
    # Distinct count (incl. a FILTER'd variant).
    {"COUNT_DISTINCT": "user_id", "as": "n_users"},
    {"COUNT_DISTINCT": "user_id", "as": "n_users_click",
     "where": {"col": "event_type", "op": "eq", "val": "click"}},
    # FILTER (WHERE ...) clause variants.
    {"COUNT": "*", "as": "cnt_high",
     "where": {"col": "value", "op": "gte", "val": 50}},
    {"SUM": "value", "as": "sum_clicks", "round": 6,
     "where": {"col": "event_type", "op": "eq", "val": "click"}},
    # Arithmetic expression targets.
    {"SUM": {"op": "mul", "args": ["value", 2]},
     "as": "sum_double", "round": 6},
    # Conditional (CASE WHEN) expression target.
    {"SUM": {"if": {"col": "value", "op": "gte", "val": 50},
             "then": "value", "else": 0},
     "as": "sum_high_case", "round": 6},
    {"AVG": {"op": "div", "args": [
        {"op": "sub", "args": ["value", 50]}, 100]},
     "as": "avg_centered", "round": 6},
    # Exact interpolated order statistic — identical interpolation rule
    # in Spark and DuckDB.
    {"MEDIAN": "value", "as": "med_value", "round": 6},
    # Histogram-sketch quantiles (r6, functions/histq.py): exact
    # integer cums + shared IEEE interpolation — bitwise twin, incl.
    # under FILTER clauses.
    {"APPROX_P50": "value", "as": "p50_est"},
    {"APPROX_P90": "value", "as": "p90_est",
     "where": {"col": "event_type", "op": "eq", "val": "click"}},
    {"APPROX_P99": "value", "as": "p99_est", "round": 4},
    # String-function aggregate target (integral inference pins DuckDB's
    # HUGEINT SUM to BIGINT).
    {"SUM": {"fn": "length", "args": ["props"]}, "as": "sum_plen"},
    # r9: COARSE rounds (round_to < the data's decimal precision) —
    # the regime where values/medians/quotients can sit exactly on a
    # half-boundary, which the shared FLOOR half-up contract now
    # covers for every non-COUNT aggregate (not just SUM/AVG).
    {"MIN": "value", "as": "min_r2", "round": 2},
    {"MAX": "value", "as": "max_r3", "round": 3},
    {"MEDIAN": "value", "as": "med_r2", "round": 2},
    {"AVG": "value", "as": "avg_r2", "round": 2},
    {"SUM": "value", "as": "sum_r2", "round": 2},
    {"STDDEV_SAMP": "value", "as": "sd_r4", "round": 4},
])

#: Row-level computed projections over the r5 expression grammar
#: (string functions, literals) — ungrouped selects only.
expr_terms = st.sampled_from([
    # r5: date-part and numeric scalar functions
    {"expr": {"fn": "year", "args": ["day"]}, "as": "yr"},
    {"expr": {"fn": "month", "args": ["day"]}, "as": "mo"},
    {"expr": {"fn": "abs", "args": [{"op": "sub", "args": ["value", 50]}]},
     "as": "dist50"},
    {"expr": {"fn": "least", "args": ["value", 25.0]}, "as": "capped"},
    {"expr": {"fn": "greatest", "args": ["value", "user_id", 10]},
     "as": "hi3"},
    {"expr": {"fn": "upper", "args": ["event_type"]}, "as": "et_up"},
    {"expr": {"fn": "concat", "args": [{"lit": "t:"}, "event_type",
                                       {"lit": "!"}]}, "as": "tagged"},
    {"expr": {"fn": "length", "args": ["props"]}, "as": "plen"},
    {"expr": {"fn": "substr", "args": ["event_type", 1, 3]}, "as": "et3"},
    {"expr": {"fn": "replace", "args": ["event_type", {"lit": "c"},
                                        {"lit": "k"}]}, "as": "repl"},
    {"expr": {"fn": "strpos", "args": ["event_type", {"lit": "ur"}]},
     "as": "pos_ur"},
    {"expr": {"fn": "lower", "args": [{"fn": "trim",
                                       "args": ["event_type"]}]},
     "as": "lo_trim"},
    # r9: ROUNDED expr projections — n-denominator divisions whose
    # quotients can sit exactly on a half-boundary; both twins compute
    # the shared FLOOR half-up formula (always DOUBLE).
    {"expr": {"op": "div", "args": ["value", 3]}, "as": "third",
     "round": 4},
    {"expr": {"op": "mul", "args": ["value", 7]}, "as": "v7",
     "round": 2},
])

#: Window projections incl. the r5 frame/ntile grammar.
_WIN_OB = [{"col": "ts_dt", "dir": "asc"}, {"col": "event_id", "dir": "asc"}]
win_terms = st.sampled_from([
    {"win": "ntile", "buckets": 4, "partition_by": ["user_id"],
     "order_by": [{"col": "value", "dir": "desc"},
                  {"col": "event_id", "dir": "asc"}], "as": "quartile"},
    {"win": "avg", "of": "value", "partition_by": ["user_id"],
     "order_by": _WIN_OB, "frame": {"rows": [-2, 0]},
     "as": "ma3", "round": 6},
    {"win": "sum", "of": "value", "partition_by": ["user_id"],
     "order_by": _WIN_OB, "frame": {"rows": [None, None]},
     "as": "part_total", "round": 6},
    {"win": "min", "of": "value", "partition_by": ["user_id"],
     "order_by": _WIN_OB, "frame": {"rows": [1, 3]},
     "as": "next3_min", "round": 6},
    {"win": "max", "of": "value", "partition_by": ["user_id"],
     "order_by": _WIN_OB, "frame": {"rows": [0, None]},
     "as": "max_ahead", "round": 6},
    # r7: first_value/last_value ride the aggregate-frame contract
    {"win": "first_value", "of": "value", "partition_by": ["user_id"],
     "order_by": _WIN_OB, "frame": {"rows": [-2, 0]},
     "as": "fv3", "round": 6},
    {"win": "last_value", "of": "value", "partition_by": ["user_id"],
     "order_by": _WIN_OB, "frame": {"rows": [0, 2]},
     "as": "lv3", "round": 6},
    # r8: RANGE frames — COUNT/MIN/MAX only (order-independent exact);
    # interval bounds over the single ts_dt key, numeric over event_id
    {"win": "count", "of": "event_id", "partition_by": ["user_id"],
     "order_by": [{"col": "ts_dt", "dir": "asc"}],
     "frame": {"range": ["-2 days", 0]}, "as": "cnt_2d"},
    {"win": "max", "of": "value", "partition_by": ["user_id"],
     "order_by": [{"col": "ts_dt", "dir": "asc"}],
     "frame": {"range": ["-36 hours", "12 hours"]},
     "as": "max_win", "round": 6},
    {"win": "min", "of": "value", "partition_by": ["user_id"],
     "order_by": [{"col": "event_id", "dir": "asc"}],
     "frame": {"range": [-300, 300]}, "as": "min_near", "round": 6},
    # r8: lag/lead with an explicit default (partition heads/tails get
    # the literal, not NULL)
    {"win": "lag", "of": "value", "partition_by": ["user_id"],
     "order_by": _WIN_OB, "offset": 2, "default": -1.5,
     "as": "lag2_dflt", "round": 6},
    {"win": "lead", "of": "value", "partition_by": ["user_id"],
     "order_by": _WIN_OB, "default": 0.0,
     "as": "lead_dflt", "round": 6},
    # r8: nth_value — cumulative default and full frame
    {"win": "nth_value", "of": "value", "n": 2,
     "partition_by": ["user_id"], "order_by": _WIN_OB,
     "as": "nth2_sofar", "round": 6},
    {"win": "nth_value", "of": "value", "n": 3,
     "partition_by": ["user_id"], "order_by": _WIN_OB,
     "frame": {"rows": [None, None]}, "as": "nth3_all", "round": 6},
])

AGG_FUNCS = ("SUM", "AVG", "COUNT", "MIN", "MAX")


def out_name(term) -> str:
    """Output column name of a select term (the reference's contract:
    explicit alias, else lowercase func(col))."""
    if isinstance(term, str):
        return term
    if "as" in term:
        return term["as"]
    fn = next(k for k in AGG_FUNCS if k in term)
    return f"{fn.lower()}({term[fn]})"

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
    # Uncorrelated scalar subqueries — deterministic one-row aggregates.
    st.builds(
        lambda op, fn: {"col": "value", "op": op,
                        "val": {"subquery": {
                            "select": [{fn: "value", "as": "s"}],
                            "from": "events"}}},
        st.sampled_from(["lt", "lte", "gt", "gte"]),
        st.sampled_from(["AVG", "MEDIAN", "MIN", "MAX"]),
    ),
    # r5: column-vs-column comparisons.
    st.builds(
        lambda op: {"col": "value", "op": op, "col2": "user_id"},
        st.sampled_from(["lt", "lte", "gt", "gte", "eq", "neq"]),
    ),
)


#: Leaf conditions composed into random boolean trees (depth ≤ 2).
bool_trees = st.recursive(
    conditions,
    lambda kids: st.one_of(
        st.builds(lambda bs: {"or": bs},
                  st.lists(kids, min_size=1, max_size=3)),
        st.builds(lambda bs: {"and": bs},
                  st.lists(kids, min_size=1, max_size=3)),
        st.builds(lambda b: {"not": b}, kids),
    ),
    max_leaves=4,
)


@st.composite
def dsl_queries(draw) -> dict:
    q: dict = {"from": "events"}
    grouped = draw(st.booleans())
    if grouped:
        keys = draw(st.lists(st.sampled_from(GROUP_COLS), min_size=0,
                             max_size=2, unique=True))
        aggs = draw(st.lists(agg_terms, min_size=1, max_size=3,
                             unique_by=lambda t: json.dumps(t, sort_keys=True)))
        q["select"] = [*keys, *aggs]
        if keys:
            # r6: plain GROUP BY or a grouping-dict form (rollup/cube/
            # sets over the same keys — subtotal rows through the
            # string sentinel, refusing interactions elsewhere).
            form = draw(st.sampled_from(["plain", "plain", "plain",
                                         "rollup", "cube", "sets"]))
            if form == "plain":
                q["group_by"] = keys
            elif form == "sets":
                q["group_by"] = {"sets": [keys, []]}
            else:
                q["group_by"] = {form: keys}
        # r5: post-aggregation expression over a COUNT alias
        # (integer-exact across engines).
        cnt_names = [out_name(t) for t in aggs
                     if "COUNT" in t and "COUNT_DISTINCT" not in t]
        if cnt_names and draw(st.booleans()):
            # post terms admitted under grouping dicts too (late-r6):
            # agg-alias leaves only, computed for subtotal rows as well
            q["select"] = [*q["select"],
                           {"post": {"op": draw(st.sampled_from(
                               ["add", "mul"])),
                               "args": [cnt_names[0], 2]},
                            "as": "post_cnt"}]
    else:
        q["select"] = draw(st.lists(st.sampled_from(PLAIN_COLS), min_size=1,
                                    max_size=4, unique=True))
        # r5 grammar: computed string projections and framed/ntile
        # windows mix freely into ungrouped selects.
        q["select"] += draw(st.lists(
            expr_terms, min_size=0, max_size=2,
            unique_by=lambda t: t["as"]))
        q["select"] += draw(st.lists(
            win_terms, min_size=0, max_size=2,
            unique_by=lambda t: t["as"]))
    # r7: SELECT-side scalar subquery — a COUNT(*) constant column
    # (integer-exact across engines), grouped and ungrouped alike,
    # refused under grouping dicts (skip those draws).
    if draw(st.integers(min_value=0, max_value=4)) == 0 \
            and not isinstance(q.get("group_by"), dict):
        q["select"] = [*q["select"],
                       {"subquery": {"select": [{"COUNT": "*",
                                                 "as": "n_all"}],
                                     "from": "events"},
                        "as": "corpus_n"}]
    where = draw(st.lists(bool_trees, min_size=0, max_size=3))
    # r8: correlated EXISTS / NOT EXISTS — top-level conjuncts only
    # (the compiler rewrites to semi/anti joins). The subquery filter
    # varies so the semi/anti sets differ draw to draw.
    if draw(st.integers(min_value=0, max_value=3)) == 0:
        thr = draw(st.integers(min_value=0, max_value=100))
        # correlate on a plain key or a DERIVED-TIME column (the
        # latter exercises the oracle's time-CTE wrap, an r8 catch)
        key = draw(st.sampled_from(["user_id", "day"]))
        sel = [key]
        corr: list = [[key, key]]
        # r11: optionally ONE non-equi pair (the TPC-H Q21 shape;
        # grammar caps at one — DuckDB 1.0.0 mis-decorrelates
        # EXISTS with 2+ inequality correlations, so wider draws
        # would fuzz the oracle's bug, not the engine)
        ne = draw(st.sampled_from(
            [None, ("event_type", "neq"), ("value", "lt"),
             ("value", "gt"), ("value", "lte"), ("value", "gte")]))
        if ne is not None and ne[0] != key:
            sel.append(ne[0])
            corr.append([ne[0], ne[0], ne[1]])
        val = {"subquery": {
            "select": sel, "from": "events",
            "where": [{"col": "value", "op": "gt", "val": thr}]},
            "correlate": corr}
        # physical-only knob: exercised so hinted plans (shuffle_hash
        # semi/anti instead of broadcast) stay semantics-identical
        hint = draw(st.sampled_from([None, "shuffle_hash", "broadcast"]))
        if hint:
            val["hint"] = hint
        where.append({
            "op": draw(st.sampled_from(["exists", "not_exists"])),
            "val": val,
        })
    # r12: correlated WHERE-scalar (the q17/q2 shape) with the new
    # decorrelation-hint knob — value vs a per-key aggregate, scaled
    # or not. AVG rides the shared DECIMAL round contract; MIN/MAX
    # are exact picks. Hints are physical-only: every hinted draw
    # must match the natively correlated oracle bit-for-bit.
    if draw(st.integers(min_value=0, max_value=3)) == 0:
        fn = draw(st.sampled_from(["AVG", "MIN", "MAX"]))
        agg_t = {fn: "value", "as": "s"}
        if fn == "AVG":
            agg_t["round"] = 6
        ckey = draw(st.sampled_from(["user_id", "event_type"]))
        sval: dict = {"subquery": {"select": [agg_t], "from": "events"},
                      "correlate": [[ckey, ckey]]}
        if draw(st.booleans()):
            sval["scale"] = draw(st.sampled_from([0.2, 0.5, 1.5]))
        hint = draw(st.sampled_from(
            [None, "shuffle_hash", "broadcast", "merge"]))
        if hint:
            sval["hint"] = hint
        where.append({"col": "value",
                      "op": draw(st.sampled_from(["lt", "lte", "gt",
                                                  "gte"])),
                      "val": sval})
    if where:
        q["where"] = where
    if grouped and draw(st.booleans()):
        # HAVING: aggregate-alias conditions restricted to COUNT terms
        # (admitted under grouping-dict group_by too, late-r6: filters
        # every output row, subtotals included)
        # (integer counts are exact across engines; float-sum thresholds
        # could straddle inter-engine ulp deltas), plus group-key conds.
        having = []
        cnt_aliases = [out_name(t) for t in q["select"]
                       if not isinstance(t, str) and "COUNT" in t]
        if cnt_aliases:
            having.append({
                "col": draw(st.sampled_from(cnt_aliases)),
                "op": draw(st.sampled_from(["gt", "gte", "lt", "lte"])),
                "val": draw(st.integers(min_value=0, max_value=500)),
            })
        gb = q.get("group_by") or []
        gcols = (gb if isinstance(gb, list)
                 else next(iter(gb.values())) if "sets" not in gb
                 else [c for st_ in gb["sets"] for c in st_])
        if "event_type" in gcols and draw(st.booleans()):
            # Case-varied spelling — both paths resolve group keys
            # case-insensitively.
            key = draw(st.sampled_from(["event_type", "EVENT_TYPE"]))
            having.append({"col": key, "op": "neq",
                           "val": draw(st.sampled_from(ETYPES))})
        if draw(st.booleans()):
            # r5: inline-aggregate HAVING (aggregate not in the select
            # list) — COUNT-only, integer-exact across engines.
            having.append({
                "agg": {"COUNT": "*"},
                "op": draw(st.sampled_from(["gt", "gte", "lt", "lte"])),
                "val": draw(st.integers(min_value=0, max_value=500)),
            })
        # r12: UNCORRELATED scalar-subquery threshold in HAVING (the
        # Q11 fraction-of-global shape) — plain-list group_by only
        # (gmode × subquery refuses in both twins). COUNT on both
        # sides: integer aggregate × an exactly-representable scale
        # keeps the comparison ulp-free across engines.
        if cnt_aliases and isinstance(gb, list) and gb \
                and draw(st.booleans()):
            having.append({
                "col": draw(st.sampled_from(cnt_aliases)),
                "op": draw(st.sampled_from(["gt", "lte"])),
                "val": {"subquery": {
                    "select": [{"COUNT": "*", "as": "tot"}],
                    "from": "events"},
                    "scale": draw(st.sampled_from([0.25, 0.5, 0.125]))},
            })
        if having:
            q["having"] = having
    if draw(st.booleans()):
        out_cols = [out_name(t) for t in q["select"]]
        ob = draw(st.lists(st.sampled_from(out_cols), min_size=1,
                           max_size=2, unique=True))
        q["order_by"] = []
        for c in ob:
            # Aggregate output names may appear case-varied in ORDER BY
            # (reference resolves "AVG(total_price)" → avg(total_price)).
            if "(" in c and draw(st.booleans()):
                c = c.upper()
            spec = {"col": c, "dir": draw(st.sampled_from(["asc", "desc"]))}
            # r5: explicit NULLS placement — both twins must emit it.
            if draw(st.booleans()):
                spec["nulls"] = draw(st.sampled_from(["first", "last"]))
            q["order_by"].append(spec)
        # LIMIT is only deterministic when the sort is total over the
        # output (fully-equal rows are interchangeable in the cut).
        if {o["col"].lower() for o in q["order_by"]} == {
            c.lower() for c in out_cols
        } and draw(st.booleans()):
            q["limit"] = draw(st.integers(min_value=1, max_value=20))
            # r7: OFFSET pagination rides the same total-sort guard
            if draw(st.booleans()):
                q["offset"] = draw(st.integers(min_value=1, max_value=10))
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


# ---------------------------------------------------------------------------
# r9: generative window-frame grammar (r8 VERDICT #3). The fixed
# win_terms menu above pins known-good shapes; these draws settle the
# surfaces only randomness reaches — frame-aggregation association
# order under rounded SUM/AVG (each engine folds a frame via its own
# tree: the DECIMAL accumulator + shared FLOOR half-up contract landed
# in r9 is what these draws police), ROWS/RANGE bound combinatorics,
# lag/lead offsets with defaults, and nth_value positions.

_ROWS_BOUND = st.one_of(st.none(), st.integers(min_value=-4, max_value=4))


@st.composite
def _rows_frame(draw) -> dict:
    lo, hi = draw(_ROWS_BOUND), draw(_ROWS_BOUND)
    if lo is not None and hi is not None and lo > hi:
        lo, hi = hi, lo
    return {"rows": [lo, hi]}


@st.composite
def _range_frame_numeric(draw) -> dict:
    b = st.one_of(st.none(), st.integers(min_value=-2000, max_value=2000))
    lo, hi = draw(b), draw(b)
    if lo is not None and hi is not None and lo > hi:
        lo, hi = hi, lo
    return {"range": [lo, hi]}


@st.composite
def _range_frame_interval(draw) -> dict:
    unit = draw(st.sampled_from(["minute", "hour", "day"]))
    lo = draw(st.one_of(st.none(), st.integers(min_value=-48, max_value=0)))
    hi = draw(st.one_of(st.none(), st.integers(min_value=0, max_value=48)))
    if not any(isinstance(b, int) and b != 0 for b in (lo, hi)):
        # All-None/0 bounds carry no interval spelling, so the frame
        # would classify as NUMERIC and both twins (correctly) refuse
        # it over a timestamp key — keep at least one real interval.
        lo = draw(st.integers(min_value=-48, max_value=-1))
    spell = lambda n: n if n in (None, 0) else f"{n} {unit}s"  # noqa: E731
    return {"range": [spell(lo), spell(hi)]}


@st.composite
def gen_window_terms(draw) -> dict:
    """One random window projection over the full r8 frame grammar,
    always legal: RANGE refuses positional fns and needs one asc key
    (timestamp for interval bounds, integral for numeric), ROWS rides
    the total (ts_dt, event_id) order."""
    fn = draw(st.sampled_from(
        ["sum", "avg", "count", "min", "max",
         "first_value", "last_value", "nth_value", "lag", "lead"]))
    term: dict = {"win": fn, "partition_by": [draw(st.sampled_from(
        ["user_id", "event_type"]))], "as": draw(st.sampled_from(
        ["wg1", "wg2"]))}
    if fn in ("lag", "lead"):
        term.update(of="value", order_by=_WIN_OB,
                    offset=draw(st.integers(min_value=1, max_value=3)))
        if draw(st.booleans()):
            term["default"] = draw(st.sampled_from([-1.5, 0.0, 7, 42.25]))
    elif fn == "nth_value":
        term.update(of="value", order_by=_WIN_OB,
                    n=draw(st.integers(min_value=1, max_value=4)))
        if draw(st.booleans()):
            term["frame"] = draw(_rows_frame())
    elif fn in ("first_value", "last_value"):
        term.update(of="value", order_by=_WIN_OB,
                    frame=draw(_rows_frame()))
    else:
        # sum/avg/count/min/max: any frame kind (or the cumulative
        # default); `of` varies over double and integral columns.
        term["of"] = draw(st.sampled_from(["value", "event_id"]))
        kind = draw(st.sampled_from(
            ["rows", "rows", "range_num", "range_interval", "none"]))
        if kind == "rows":
            term.update(order_by=_WIN_OB, frame=draw(_rows_frame()))
        elif kind == "range_num":
            term.update(order_by=[{"col": "event_id", "dir": "asc"}],
                        frame=draw(_range_frame_numeric()))
        elif kind == "range_interval":
            term.update(order_by=[{"col": "ts_dt", "dir": "asc"}],
                        frame=draw(_range_frame_interval()))
        else:
            term["order_by"] = _WIN_OB
    if draw(st.booleans()):
        # Rounded windows: the r9 boundary-exact window contract
        # (DECIMAL-accumulated SUM/AVG + shared FLOOR half-up; raw-value
        # picks through the same formula). round < data precision makes
        # half-boundaries REACHABLE from on-grid values — the hard case.
        term["round"] = draw(st.sampled_from([2, 4, 6]))
    return term


@st.composite
def window_frame_queries(draw) -> dict:
    q: dict = {"from": "events",
               "select": ["event_id", "user_id", "value"]}
    q["select"] += draw(st.lists(gen_window_terms(), min_size=1,
                                 max_size=2, unique_by=lambda t: t["as"]))
    if draw(st.booleans()):
        q["where"] = [draw(conditions)]
    return q


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=window_frame_queries())
def test_window_frames_equal_duckdb(q, spark, catalog, ddb):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"), dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=window_frame_queries())
def test_window_frames_equal_sql_twin(q, spark, catalog):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"), dialect="spark")
    want = spark.sql(sql).toPandas()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@st.composite
def nested_queries(draw) -> dict:
    """r5 nesting grammar: derived-table FROM, named CTEs (including a
    scalar subquery over the same view), and IN/NOT-IN membership
    subqueries — all COUNT/rounded-SUM based so values are exact in
    both engines."""
    mode = draw(st.sampled_from(
        ["derived", "cte", "member_in", "member_not_in"]))
    if mode in ("derived", "cte"):
        key = draw(st.sampled_from(["user_id", "event_type", "day"]))
        inner = {"select": [key, {"COUNT": "*", "as": "n"},
                            {"SUM": "value", "as": "sv", "round": 6}],
                 "from": "events", "group_by": [key]}
        if draw(st.booleans()):
            inner["where"] = [{"col": "event_type", "op": "neq",
                               "val": draw(st.sampled_from(ETYPES))}]
        outer: dict = {
            "select": ["n", {"COUNT": "*", "as": "n_groups"}],
            "group_by": ["n"],
            "order_by": [{"col": "n", "dir": "asc"}],
        }
        if mode == "cte":
            outer["with"] = {"v": inner}
            outer["from"] = "v"
        else:
            outer["from"] = inner
        if draw(st.booleans()):
            # above-average gate: scalar subquery over the SAME view /
            # derived query
            outer["where"] = [{"col": "sv", "op": "gt", "val": {
                "subquery": {
                    "select": [{"AVG": "sv", "as": "a", "round": 6}],
                    "from": "v" if mode == "cte" else inner}}}]
        return outer
    sub = {"select": ["user_id", {"COUNT": "*", "as": "n"}],
           "from": "events", "group_by": ["user_id"],
           "having": [{"col": "n", "op": "gte",
                       "val": draw(st.integers(min_value=1,
                                               max_value=50))}]}
    op = "in" if mode == "member_in" else "not_in"
    return {"select": ["event_type", {"COUNT": "*", "as": "cnt"}],
            "from": "events",
            "where": [{"col": "user_id", "op": op,
                       "val": {"subquery": sub}}],
            "group_by": ["event_type"],
            "order_by": [{"col": "event_type", "dir": "asc"}]}


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=nested_queries())
def test_nested_compiler_equals_duckdb(q, spark, catalog, ddb):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"), dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@st.composite
def composed_queries(draw) -> dict:
    """r6 composition grammar (r5 VERDICT #6): a named CTE, a derived-
    table FROM reading the CTE, an IN/NOT-IN membership subquery (over
    the base table or the CTE itself), a post-aggregation expression
    over the outer aggregates, and an optional inline-agg HAVING — ALL
    IN ONE QUERY. The feature interactions (CTE view scoping inside a
    derived table, HUGEINT pins for integral SUMs over CTE/derived
    aliases, membership compiled against the view catalog) are where
    twin-dialect drift hides; every value is integer-exact so any
    divergence is a real bug, never float noise."""
    cte = {"select": ["user_id", "event_type",
                      {"COUNT": "*", "as": "n"}],
           "from": "events", "group_by": ["user_id", "event_type"]}
    if draw(st.booleans()):
        cte["where"] = [{"col": "event_type", "op": "neq",
                         "val": draw(st.sampled_from(ETYPES))}]
    # derived FROM over the CTE: per-user type-count + integral SUM
    # over the CTE's COUNT alias (exercises the derived_output_types
    # integral pin two levels deep).
    derived = {"select": ["user_id",
                          {"COUNT": "*", "as": "n_types"},
                          {"SUM": "n", "as": "tot"}],
               "from": "v", "group_by": ["user_id"]}
    q: dict = {
        "with": {"v": cte},
        "from": derived,
        "select": ["n_types",
                   {"COUNT": "*", "as": "n_users"},
                   {"SUM": "tot", "as": "sum_tot"}],
        "group_by": ["n_types"],
        "order_by": [{"col": "n_types", "dir": "asc"}],
    }
    if draw(st.booleans()):
        q["select"] = [*q["select"],
                       {"post": {"op": draw(st.sampled_from(
                           ["add", "mul", "sub"])),
                           "args": ["sum_tot", "n_users"]},
                        "as": "post_mix"}]
    # membership over the base table or the CTE view itself
    if draw(st.booleans()):
        src = draw(st.sampled_from(["events", "v"]))
        if src == "events":
            sub = {"select": ["user_id", {"COUNT": "*", "as": "m"}],
                   "from": "events", "group_by": ["user_id"]}
        else:
            sub = {"select": ["user_id", {"SUM": "n", "as": "m"}],
                   "from": "v", "group_by": ["user_id"]}
        sub["having"] = [{"col": "m",
                          "op": draw(st.sampled_from(["gte", "lte"])),
                          "val": draw(st.integers(min_value=1,
                                                  max_value=40))}]
        q["where"] = [{"col": "user_id",
                       "op": draw(st.sampled_from(["in", "not_in"])),
                       "val": {"subquery": sub}}]
    if draw(st.booleans()):
        q["having"] = [{"agg": {"COUNT": "*"},
                        "op": draw(st.sampled_from(["gte", "lte"])),
                        "val": draw(st.integers(min_value=0,
                                                max_value=100))}]
    # r8 (r7 VERDICT #6): SELECT-side scalar subquery READING THE CTE —
    # the one-row aggregate compiles against the view catalog and the
    # SQL twin renders the subselect under the same WITH scope;
    # integer-exact (SUM of COUNT aliases), so drift is a real bug.
    if draw(st.booleans()):
        fn = draw(st.sampled_from([{"SUM": "n", "as": "s"},
                                   {"COUNT": "*", "as": "s"}]))
        q["select"] = [*q["select"],
                       {"subquery": {"select": [fn], "from": "v"},
                        "as": "cte_scalar"}]
    return q


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=composed_queries())
def test_composed_nesting_equals_duckdb(q, spark, catalog, ddb):
    """CTE + derived FROM + membership + post-agg + inline-agg HAVING
    composed in one draw, differentially against DuckDB."""
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"),
                       dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    # dtype KINDS must match too (the exactcheck contract): every
    # column here is integral or a group key, so any float is a
    # missing HUGEINT pin in one dialect.
    for c in got.columns:
        assert got[c].dtype.kind == want[c].dtype.kind, (c, q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@st.composite
def join_queries(draw) -> dict:
    """Random star joins: orders⋈customer(⋈nation), aggregated over a
    drawn grouping column, with optional filters/order/limit. A drawn
    fraction instead exercises the non-equi surface: semi/anti
    (late-r6 generalized EXISTS) and — r7 — inner/left range
    conjuncts, customers filtered/paired by a cross-side price
    comparison against their orders."""
    if draw(st.integers(min_value=0, max_value=4)) == 4:
        # r7: correlated SELECT-side scalar subquery — per-customer
        # order COUNT (0 for empty groups, integer-exact) with a drawn
        # price gate, optionally alongside a MAX scalar.
        thr = draw(st.integers(min_value=50000, max_value=450000))
        sel = ["c_custkey", "c_mktsegment",
               {"subquery": {"select": [{"COUNT": "*", "as": "c"}],
                             "from": "orders",
                             "where": [{"col": "o_totalprice",
                                        "op": "gt", "val": thr}]},
                "correlate": [["c_custkey", "o_custkey"]],
                "as": "n_big"}]
        if draw(st.booleans()):
            sel.append({"subquery": {
                "select": [{"MAX": "o_totalprice", "as": "m",
                            "round": 4}],
                "from": "orders",
                "where": [{"col": "o_totalprice", "op": "gt",
                           "val": thr}]},
                "correlate": [["c_custkey", "o_custkey"]],
                "as": "max_big"})
        return {"select": sel, "from": "customer",
                "order_by": ["c_custkey"],
                "limit": draw(st.integers(min_value=5, max_value=100))}
    if draw(st.integers(min_value=0, max_value=5)) == 5:
        # r11: FULL OUTER — a drawn pre-join balance gate makes both
        # null-extension directions non-empty (filtered-away customers
        # null-extend their orders; gated-in zero-order customers
        # null-extend the order columns); COUNT(col) vs COUNT(*)
        # exposes both, and the NULL group key's placement is pinned
        # explicitly (Spark/DuckDB ASC defaults disagree).
        return {
            "select": ["c_mktsegment",
                       {"COUNT": "o_orderkey", "as": "n_orders"},
                       {"COUNT": "*", "as": "n_rows"}],
            "from": "orders",
            "join": [{"table": "customer",
                      "on": [["o_custkey", "c_custkey"]],
                      "type": "full",
                      "where": [{"col": "c_acctbal",
                                 "op": draw(st.sampled_from(["gt",
                                                             "lt"])),
                                 "val": draw(st.integers(
                                     min_value=0, max_value=8000))}]}],
            "group_by": ["c_mktsegment"],
            "order_by": [{"col": "c_mktsegment", "dir": "asc",
                          "nulls": draw(st.sampled_from(["first",
                                                         "last"]))}],
        }
    if draw(st.integers(min_value=0, max_value=5)) == 5:
        # r12: RIGHT OUTER — the left side is a CTE-gated order subset
        # (top-level WHERE applies post-join in both twins, so a plain
        # filter would kill the null-extended rows); unmatched
        # customers null-extend the order columns at every threshold.
        thr = draw(st.integers(min_value=400000, max_value=500000))
        return {
            "with": {"big_orders": {
                "select": ["o_orderkey", "o_custkey", "o_totalprice"],
                "from": "orders",
                "where": [{"col": "o_totalprice", "op": "gt",
                           "val": thr}]}},
            "select": ["c_mktsegment",
                       {"COUNT": "o_orderkey", "as": "n_big"},
                       {"COUNT": "*", "as": "n_rows"}],
            "from": "big_orders",
            "join": [{"table": "customer",
                      "on": [["o_custkey", "c_custkey"]],
                      "type": "right"}],
            "group_by": ["c_mktsegment"],
            "order_by": ["c_mktsegment"],
        }
    if draw(st.integers(min_value=0, max_value=3)) == 0:
        jtype = draw(st.sampled_from(["semi", "anti", "inner", "left"]))
        op = draw(st.sampled_from(["lt", "lte", "gt", "gte"]))
        if jtype in ("semi", "anti"):
            return {
                "select": ["c_custkey", "c_mktsegment", "c_acctbal"],
                "from": "customer",
                "join": [{"table": "orders", "type": jtype,
                          "on": [["c_custkey", "o_custkey"]],
                          "cond": [{"left": "c_acctbal", "op": op,
                                    "right": "o_totalprice"}]}],
                "order_by": ["c_custkey"],
                "limit": draw(st.integers(min_value=5, max_value=100)),
            }
        # Row-producing range conjunct: aggregate the matched pairs so
        # the left join's null-extended rows flow through COUNT(col)
        # (counts 0) and the result stays integral/rounded.
        return {
            "select": ["c_custkey",
                       {"COUNT": "o_orderkey", "as": "n_match"},
                       {"SUM": "o_totalprice", "as": "match_total",
                        "round": 4}],
            "from": "customer",
            "join": [{"table": "orders", "type": jtype,
                      "on": [["c_custkey", "o_custkey"]],
                      "cond": [{"left": "c_acctbal", "op": op,
                                "right": "o_totalprice"}]}],
            "group_by": ["c_custkey"],
            "order_by": ["c_custkey"],
            "limit": draw(st.integers(min_value=5, max_value=100)),
        }
    q: dict = {
        "from": "orders",
        "join": [
            {"table": "customer", "on": [["o_custkey", "c_custkey"]],
             "hint": draw(st.sampled_from(["broadcast", None]))},
        ],
    }
    deep = draw(st.booleans())
    if deep:
        q["join"].append(
            {"table": "nation", "on": [["c_nationkey", "n_nationkey"]]}
        )
    q["join"] = [
        {k: v for k, v in j.items() if v is not None} for j in q["join"]
    ]
    key = draw(st.sampled_from(
        ["n_name", "c_mktsegment"] if deep else ["c_mktsegment"]
    ))
    aggs = draw(st.lists(st.sampled_from([
        {"SUM": "o_totalprice", "as": "rev", "round": 4},
        {"AVG": "o_totalprice", "as": "avg_rev", "round": 6},
        {"COUNT": "*", "as": "n"},
    ]), min_size=1, max_size=2,
        unique_by=lambda t: tuple(sorted(t.items()))))
    q["select"] = [key, *aggs]
    q["group_by"] = [key]
    if draw(st.booleans()):
        q["where"] = [{
            "col": "o_totalprice",
            "op": draw(st.sampled_from(["lt", "gte"])),
            "val": draw(st.integers(min_value=1000, max_value=300000)),
        }]
    return q


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=join_queries())
def test_join_compiler_equals_duckdb(q, spark, catalog, ddb):
    got = compile_query(q, catalog).toPandas()
    # merged map: the strategy draws from/join/subquery references
    # across the orders/customer/nation star only.
    tm = catalog.spark_type_map("orders")
    tm.update(catalog.spark_type_map("customer"))
    tm.update(catalog.spark_type_map("nation"))
    sql = assemble_sql(q, tm, dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


# ---- r10: rounded aggregates above the eager-agg join rewrite ----

_EAGER_PUSHABLE = ("sum_qty", "sum_price", "sum_disc", "n_items",
                   "n_rows", "min_q", "max_p")


@st.composite
def eager_agg_queries(draw) -> dict:
    """orders ⋈ lineitem grouped queries targeting the _try_eager_agg
    surface (Yan & Larson rewrite): DECIMAL partials for rounded SUMs
    carried through the join and re-aggregated, COUNT/MIN/MAX
    partials, SUM over expressions, alias-HAVING, and the Q18
    membership-subquery fusion. A drawn minority adds an AVG term (the
    rewrite refuses it — the unrewritten rounded-through-join path is
    differentialized too). The tests assert the rewrite FIRES exactly
    when every term is in the pushable family, so the campaign can
    never silently fuzz the unrewritten plan only."""
    names = draw(st.lists(st.sampled_from(_EAGER_PUSHABLE),
                          min_size=1, max_size=3, unique=True))
    terms: list[dict] = []
    for p in names:
        if p == "sum_qty":
            terms.append({"SUM": "l_quantity", "as": "sum_qty",
                          "round": draw(st.sampled_from([0, 2, 4]))})
        elif p == "sum_price":
            terms.append({"SUM": "l_extendedprice", "as": "sum_price",
                          "round": draw(st.sampled_from([2, 6]))})
        elif p == "sum_disc":
            terms.append({"SUM": {"op": "mul", "args": [
                "l_extendedprice",
                {"op": "sub", "args": [1, "l_discount"]}]},
                "as": "sum_disc", "round": 2})
        elif p == "n_items":
            terms.append({"COUNT": "l_partkey", "as": "n_items"})
        elif p == "n_rows":
            terms.append({"COUNT": "*", "as": "n_rows"})
        elif p == "min_q":
            terms.append({"MIN": "l_quantity", "as": "min_q"})
        else:
            terms.append({"MAX": "l_extendedprice", "as": "max_p"})
    if draw(st.integers(min_value=0, max_value=3)) == 0:
        terms.append({"AVG": "l_extendedprice", "as": "avg_p",
                      "round": 6})
    keys = draw(st.sampled_from([
        ["o_orderpriority"], ["o_orderstatus"],
        ["o_orderpriority", "o_orderstatus"], ["o_custkey"],
        ["o_custkey", "o_orderpriority"]]))
    # A drawn minority uses a LEFT join — the rewrite must REFUSE it
    # (left-preserved rows have no partials), and the unrewritten
    # null-extended aggregate semantics (COUNT→0, SUM/MIN/MAX→NULL)
    # get differentialized across both twins.
    jtype = draw(st.sampled_from(["inner", "inner", "inner", "left"]))
    q: dict = {"select": [*keys, *terms], "from": "orders",
               "join": [{"table": "lineitem", "type": jtype,
                         "on": [["o_orderkey", "l_orderkey"]]}],
               "group_by": list(keys),
               "order_by": list(keys)}
    where = []
    if draw(st.booleans()):
        where.append({"col": "o_totalprice",
                      "op": draw(st.sampled_from(["lt", "gte"])),
                      "val": draw(st.integers(min_value=1000,
                                              max_value=400000))})
    if draw(st.booleans()):
        # Q18 fusion: membership over the same (T, gk) — must fold
        # into the partial frame, not re-aggregate lineitem.
        where.append({"col": "o_orderkey", "op": "in",
                      "val": {"subquery": {
                          "select": ["l_orderkey",
                                     {"SUM": "l_quantity", "as": "qty",
                                      "round": 2}],
                          "from": "lineitem",
                          "group_by": ["l_orderkey"],
                          "having": [{"col": "qty", "op": "gt",
                                      "val": draw(st.integers(
                                          min_value=10,
                                          max_value=200))}]}}})
    if where:
        q["where"] = where
    if draw(st.booleans()) and any(
            isinstance(t, dict) and t.get("as") == "sum_qty"
            for t in terms):
        q["having"] = [{"col": "sum_qty", "op": "gt",
                        "val": draw(st.integers(min_value=0,
                                                max_value=500))}]
    return q


def _eager_expected(q: dict) -> bool:
    """By strategy construction the ONLY refusal triggers are an AVG
    term and a non-inner join; everything else drawn is inside the
    rewrite's guards."""
    if q["join"][0].get("type", "inner") != "inner":
        return False
    return not any(isinstance(t, dict) and "AVG" in t
                   for t in q["select"])


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=eager_agg_queries())
def test_eager_agg_equals_duckdb(q, spark, catalog, ddb):
    from query_planner_optimizer_spark.dsl.compiler import _try_eager_agg

    assert (_try_eager_agg(q, catalog) is not None) == _eager_expected(q), q
    got = compile_query(q, catalog).toPandas()
    tm = {**catalog.spark_type_map("orders"),
          **catalog.spark_type_map("lineitem")}
    sql = assemble_sql(q, tm, dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=eager_agg_queries())
def test_eager_agg_equals_sql_twin(q, spark, catalog):
    got = compile_query(q, catalog).toPandas()
    tm = {**catalog.spark_type_map("orders"),
          **catalog.spark_type_map("lineitem")}
    sql = assemble_sql(q, tm, dialect="spark")
    want = spark.sql(sql).toPandas()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@st.composite
def setop_queries(draw) -> dict:
    """Random set-op queries: UNION/INTERSECT/EXCEPT [ALL] over (a)
    filtered projections of one column list, or (b) GROUPED aggregate
    branches — including grouping-dict branches, whose sentinel-string
    key unifies with a plain branch's raw string key (late-r6: the
    set-op × grouping-sets interaction)."""
    kw = draw(st.sampled_from(["union", "intersect", "except"]))
    shape = draw(st.sampled_from(["plain", "agg"]))
    if shape == "plain":
        cols = draw(st.lists(
            st.sampled_from(["event_type", "day", "user_id"]),
            min_size=1, max_size=2, unique=True))

        def child() -> dict:
            c: dict = {"select": list(cols), "from": "events"}
            w = draw(st.lists(conditions, min_size=0, max_size=2))
            if w:
                c["where"] = w
            return c

        order_cols = cols
    else:
        def child() -> dict:
            c: dict = {"select": ["event_type",
                                  {"COUNT": "*", "as": "n"}],
                       "from": "events"}
            form = draw(st.sampled_from(["plain", "rollup", "cube"]))
            c["group_by"] = (["event_type"] if form == "plain"
                             else {form: ["event_type"]})
            w = draw(st.lists(conditions, min_size=0, max_size=1))
            if w:
                c["where"] = w
            return c

        order_cols = ["event_type", "n"]
    q: dict = {kw: [child(), child()]}
    if draw(st.booleans()):
        q["all"] = True
    q["order_by"] = [{"col": c, "dir": "asc"} for c in order_cols]
    return q


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=setop_queries())
def test_setop_compiler_equals_duckdb(q, spark, catalog, ddb):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"), dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


# ---- r11: window functions OVER a joined frame ---------------------------


@st.composite
def _window_join_term(draw) -> dict:
    """One window projection over the orders⋈customer join: partition
    keys and value columns drawn from BOTH join sides, ordered by the
    (unique post-join) o_orderkey so every function is deterministic.
    Covers rank-family, offset fns, picks, and rounded SUM/AVG frames —
    the full r8/r9 window grammar, but over a joined input (never
    drawn before r11)."""
    fn = draw(st.sampled_from(
        ["sum", "avg", "count", "min", "max", "lag", "lead",
         "rank", "row_number", "first_value", "last_value"]))
    term: dict = {"win": fn,
                  "partition_by": [draw(st.sampled_from(
                      ["c_mktsegment", "o_orderstatus"]))],
                  "as": draw(st.sampled_from(["wj1", "wj2"]))}
    ob = [{"col": "o_orderkey", "dir": "asc"}]
    roundable = True
    if fn in ("rank", "row_number"):
        term["order_by"] = ob
        roundable = False
    elif fn in ("lag", "lead"):
        term.update(of=draw(st.sampled_from(
            ["o_totalprice", "c_acctbal"])), order_by=ob,
            offset=draw(st.integers(min_value=1, max_value=3)))
        if draw(st.booleans()):
            term["default"] = draw(st.sampled_from([-1.5, 0.0, 42.25]))
    elif fn in ("first_value", "last_value"):
        term.update(of="o_totalprice", order_by=ob,
                    frame=draw(_rows_frame()))
    else:
        term["of"] = draw(st.sampled_from(["o_totalprice", "c_acctbal"]))
        if draw(st.booleans()):
            term.update(order_by=ob, frame=draw(_rows_frame()))
        else:
            term["order_by"] = ob
        roundable = fn != "count"
    if roundable and draw(st.booleans()):
        term["round"] = draw(st.sampled_from([2, 4, 6]))
    return term


@st.composite
def window_join_queries(draw) -> dict:
    """orders ⋈ customer (equi, optional broadcast hint) with 1-2
    window projections whose partition/value columns span both sides.
    Mostly inner joins; an r11 branch draws windows OVER A FULL OUTER
    frame, made twin-safe by the new window-order `nulls` knob
    (engine-default NULL placement disagrees and would change frame
    contents) and by restricting to tie-safe functions (rank family +
    cumulative aggregates — NULL-keyed rows are peers, so row_number/
    lag among them is nondeterministic in BOTH engines)."""
    if draw(st.integers(min_value=0, max_value=3)) == 3:
        term = dict(draw(st.sampled_from([
            {"win": "rank", "as": "w"},
            {"win": "dense_rank", "as": "w"},
            {"win": "sum", "of": "o_totalprice", "as": "w", "round": 2},
            {"win": "count", "of": "o_orderkey", "as": "w"},
            {"win": "max", "of": "o_totalprice", "as": "w", "round": 2},
        ])))
        term["partition_by"] = ["c_mktsegment"]
        term["order_by"] = [
            {"col": "o_orderkey",
             "dir": draw(st.sampled_from(["asc", "desc"])),
             "nulls": draw(st.sampled_from(["first", "last"]))}]
        return {
            # (o_orderkey, c_custkey) is a total order across all
            # three row classes: matched / orders-only (unique
            # o_orderkey) / customer-only (NULL o_orderkey, unique
            # c_custkey) — the ordered compare needs it.
            "select": ["o_orderkey", "c_custkey", "c_mktsegment",
                       "o_totalprice", term],
            "from": "orders",
            "join": [{"table": "customer",
                      "on": [["o_custkey", "c_custkey"]],
                      "type": "full",
                      "where": [{"col": "c_acctbal",
                                 "op": draw(st.sampled_from(["gt",
                                                             "lt"])),
                                 "val": draw(st.integers(
                                     min_value=0, max_value=8000))}]}],
            "order_by": [{"col": "o_orderkey", "dir": "asc",
                          "nulls": "last"},
                         {"col": "c_custkey", "dir": "asc",
                          "nulls": "last"}],
            "limit": draw(st.integers(min_value=50, max_value=400)),
        }
    join: dict = {"table": "customer", "on": [["o_custkey", "c_custkey"]]}
    if draw(st.booleans()):
        join["hint"] = "broadcast"
    q: dict = {"select": ["o_orderkey", "c_mktsegment", "o_totalprice"],
               "from": "orders", "join": [join]}
    q["select"] += draw(st.lists(
        _window_join_term(), min_size=1, max_size=2,
        unique_by=lambda t: t["as"]))
    if draw(st.booleans()):
        q["where"] = [{"col": "o_totalprice",
                       "op": draw(st.sampled_from(["lt", "gte"])),
                       "val": draw(st.integers(min_value=1000,
                                               max_value=400000))}]
    q["order_by"] = ["o_orderkey"]
    if draw(st.booleans()):
        q["limit"] = draw(st.integers(min_value=10, max_value=400))
    return q


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=window_join_queries())
def test_window_join_equals_duckdb(q, spark, catalog, ddb):
    got = compile_query(q, catalog).toPandas()
    tm = {**catalog.spark_type_map("orders"),
          **catalog.spark_type_map("customer")}
    sql = assemble_sql(q, tm, dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=window_join_queries())
def test_window_join_equals_sql_twin(q, spark, catalog):
    got = compile_query(q, catalog).toPandas()
    tm = {**catalog.spark_type_map("orders"),
          **catalog.spark_type_map("customer")}
    sql = assemble_sql(q, tm, dialect="spark")
    want = spark.sql(sql).toPandas()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


# ---- r11: set ops over GROUPED CTE legs -----------------------------------


@st.composite
def setop_cte_queries(draw) -> dict:
    """UNION/INTERSECT/EXCEPT [ALL] whose legs read grouped-aggregate
    CTE views. Half the draws share ONE view across both legs — a
    multiply-referenced CTE, exercising the persisted-frame memo and
    its r11 sibling-closure cache key under churn (hundreds of distinct
    specs → FrameMemo evictions mid-campaign); the other half defines
    two sibling views with independently drawn filters. The aggregate
    term is drawn ONCE per query so both legs project identical types
    (a COUNT leg set-opped against a rounded-SUM leg would
    differentialize the engines' numeric-coercion defaults, not this
    compiler)."""
    kw = draw(st.sampled_from(["union", "intersect", "except"]))
    agg = draw(st.sampled_from([
        {"COUNT": "*", "as": "n"},
        {"SUM": "value", "as": "n", "round": 4},
        {"AVG": "value", "as": "n", "round": 6},
        {"MIN": "value", "as": "n", "round": 2}]))

    def grouped_view() -> dict:
        v: dict = {"select": ["event_type", dict(agg)],
                   "from": "events", "group_by": ["event_type"]}
        w = draw(st.lists(conditions, min_size=0, max_size=1))
        if w:
            v["where"] = w
        return v

    if draw(st.integers(min_value=0, max_value=4)) == 4:
        # r11: FULL OUTER over two grouped CTE legs on the group key —
        # the generative twin of dsl_join_full_outer_days.
        # Independently drawn leg filters vary which event_types each
        # side carries, so both null-extension directions fire across
        # draws; the USING key coalesces (never NULL), so ordering on
        # it needs no null-placement pin, while the leg columns carry
        # the NULLs.
        def leg_view(alias: str) -> dict:
            v: dict = {"select": ["event_type", {**dict(agg),
                                                 "as": alias}],
                       "from": "events", "group_by": ["event_type"]}
            w = draw(st.lists(conditions, min_size=0, max_size=1))
            if w:
                v["where"] = w
            return v

        return {
            "with": {"ga": leg_view("na"), "gb": leg_view("nb")},
            "select": ["event_type", "na", "nb"],
            "from": "ga",
            "join": [{"table": "gb", "on": ["event_type"],
                      "type": "full"}],
            "order_by": [{"col": "event_type", "dir": "asc"}],
        }

    if draw(st.booleans()):
        withs = {"g1": grouped_view()}
        srcs = ("g1", "g1")
    else:
        withs = {"g1": grouped_view(), "g2": grouped_view()}
        srcs = ("g1", "g2")

    def leg(src: str) -> dict:
        c: dict = {"select": ["event_type", "n"], "from": src}
        if draw(st.booleans()):
            c["where"] = [{"col": "n",
                           "op": draw(st.sampled_from(["gt", "lte"])),
                           "val": draw(st.integers(min_value=0,
                                                   max_value=300))}]
        return c

    q: dict = {"with": withs, kw: [leg(srcs[0]), leg(srcs[1])]}
    if draw(st.booleans()):
        q["all"] = True
    q["order_by"] = [{"col": "event_type", "dir": "asc"},
                     {"col": "n", "dir": "asc"}]
    return q


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=setop_cte_queries())
def test_setop_cte_equals_duckdb(q, spark, catalog, ddb):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"),
                       dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=setop_cte_queries())
def test_setop_cte_equals_sql_twin(q, spark, catalog):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"),
                       dialect="spark")
    want = spark.sql(sql).toPandas()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


# ---- r12: set ops × FULL OUTER × windows in ONE draw ----------------------


@st.composite
def setop_fullouter_window_queries(draw) -> dict:
    """r12 (r11 VERDICT #4): the last undrawn composite — set ops whose
    legs are windows OVER null-extending FULL OUTER frames. Each leg
    full-outer-joins two grouped CTE views on (event_type, day) — the
    USING keys coalesce so join keys never carry NULL; the per-side
    aggregates (na/nb) do — then projects a window over that frame.
    Tie-safe window functions only (rank family + default-RANGE
    cumulative aggregates: NULL-keyed and tied rows are frame peers in
    both engines) and any nullable window order key carries an explicit
    `nulls` pin — exactly the surface class (null-extension × frame
    contents × distinct semantics) that forced the r11 nulls knob into
    existence. Both legs share the agg and window terms so the set op
    compares identical projections; leg filters draw independently so
    both null-extension directions and leg-vs-leg differences fire.
    Half the draws share the left view across legs (multiply-referenced
    CTE → FrameMemo churn under the sibling-closure key)."""
    kw = draw(st.sampled_from(["union", "intersect", "except"]))
    agg = draw(st.sampled_from([
        {"COUNT": "*"},
        {"SUM": "value", "round": 4},
        {"MIN": "value", "round": 2},
    ]))
    win = dict(draw(st.sampled_from([
        {"win": "rank", "as": "w"},
        {"win": "dense_rank", "as": "w"},
        {"win": "sum", "of": "nb", "as": "w", "round": 2},
        {"win": "count", "of": "nb", "as": "w"},
        {"win": "max", "of": "na", "as": "w", "round": 2},
    ])))
    win["partition_by"] = ["event_type"]
    # The cumulative default frame is ROWS UNBOUNDED PRECEDING..CURRENT
    # in both twins, so aggregate windows need a TOTAL in-partition
    # order (the grammar's documented caller contract). `day` is unique
    # within an event_type partition (each view groups by (event_type,
    # day); the full join keeps key uniqueness), so it serves as the
    # unique key / tiebreak. The null-extended `na` as primary key
    # carries an explicit `nulls` pin — engine-default placement
    # disagrees and would reorder the ROWS accumulation.
    ranky = win["win"] in ("rank", "dense_rank")
    variant = draw(st.integers(min_value=0, max_value=2 if ranky else 1))
    d = draw(st.sampled_from(["asc", "desc"]))
    if variant == 0:
        win["order_by"] = [{"col": "day", "dir": d}]
    elif variant == 1:
        win["order_by"] = [
            {"col": "na", "dir": d,
             "nulls": draw(st.sampled_from(["first", "last"]))},
            {"col": "day", "dir": "asc"}]
    else:
        # rank family only: ties are peers, no tiebreak needed.
        win["order_by"] = [
            {"col": "na", "dir": d,
             "nulls": draw(st.sampled_from(["first", "last"]))}]

    def side_view(alias: str) -> dict:
        v: dict = {"select": ["event_type", "day", {**agg, "as": alias}],
                   "from": "events", "group_by": ["event_type", "day"]}
        w = draw(st.lists(conditions, min_size=0, max_size=1))
        if w:
            v["where"] = w
        return v

    withs = {"va": side_view("na"), "vb": side_view("nb")}
    if draw(st.booleans()):
        withs["vd"] = side_view("nb")
        legs = [("va", "vb"), ("va", "vd")]  # shared left view
    else:
        withs["vc"] = side_view("na")
        withs["vd"] = side_view("nb")
        legs = [("va", "vb"), ("vc", "vd")]

    def leg(lv: str, rv: str) -> dict:
        return {"select": ["event_type", "day", "na", "nb", dict(win)],
                "from": lv,
                "join": [{"table": rv, "on": ["event_type", "day"],
                          "type": "full"}]}

    q: dict = {"with": withs, kw: [leg(*legs[0]), leg(*legs[1])]}
    if draw(st.booleans()):
        q["all"] = True
    # Total order over the projection: the coalesced USING keys are
    # never NULL; the aggregate and window columns pin placement.
    q["order_by"] = [
        {"col": "event_type", "dir": "asc"},
        {"col": "day", "dir": "asc"},
        {"col": "na", "dir": "asc", "nulls": "last"},
        {"col": "nb", "dir": "asc", "nulls": "last"},
        {"col": "w", "dir": "asc", "nulls": "last"},
    ]
    return q


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=setop_fullouter_window_queries())
def test_setop_fullouter_window_equals_duckdb(q, spark, catalog, ddb):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"),
                       dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=setop_fullouter_window_queries())
def test_setop_fullouter_window_equals_sql_twin(q, spark, catalog):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"),
                       dialect="spark")
    want = spark.sql(sql).toPandas()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


# ---- r13: correlated SELECT-side scalars × joins in one draw --------------
# (r12 VERDICT #4 / builder queue #3 — the first genuinely undrawn
# composite: the outer FROM is itself a JOIN while a SELECT-side scalar
# correlates into a third table. Exercises outer-reference scoping when
# the decorrelated group-agg join must key on the JOINED frame, and the
# SQL twin's correlated subselect quals must survive the join aliasing.)


@st.composite
def scalar_join_queries(draw) -> dict:
    """customer ⋈ nation (optionally broadcast-hinted), with one or two
    correlated SELECT-side scalar subqueries into orders (COUNT — 0 for
    customers with no qualifying orders — and optionally a gated
    rounded MAX, NULL for empty groups). A drawn outer WHERE on either
    join side checks pre-/post-join filter placement under the scalar
    rewrite; ORDER BY the unique customer key keeps LIMIT total."""
    thr = draw(st.integers(min_value=50000, max_value=450000))
    scalars: list = [{
        "subquery": {"select": [{"COUNT": "*", "as": "c"}],
                     "from": "orders",
                     "where": [{"col": "o_totalprice", "op": "gt",
                                "val": thr}]},
        "correlate": [["c_custkey", "o_custkey"]],
        "as": "n_big"}]
    if draw(st.booleans()):
        scalars.append({
            "subquery": {"select": [{"MAX": "o_totalprice", "as": "m",
                                     "round": 4}],
                         "from": "orders",
                         "where": [{"col": "o_totalprice", "op": "gt",
                                    "val": thr}]},
            "correlate": [["c_custkey", "o_custkey"]],
            "as": "max_big"})
    join: dict = {"table": "nation", "on": [["c_nationkey",
                                             "n_nationkey"]]}
    if draw(st.booleans()):
        join["hint"] = "broadcast"
    q: dict = {
        "select": ["c_custkey", "n_name", *scalars],
        "from": "customer",
        "join": [join],
        "order_by": ["c_custkey"],
        "limit": draw(st.integers(min_value=5, max_value=100)),
    }
    wside = draw(st.sampled_from(["none", "cust", "dim"]))
    if wside == "cust":
        q["where"] = [{"col": "c_acctbal",
                       "op": draw(st.sampled_from(["gt", "lt"])),
                       "val": draw(st.integers(min_value=-500,
                                               max_value=8000))}]
    elif wside == "dim":
        q["where"] = [{"col": "n_name", "op": "neq",
                       "val": draw(st.sampled_from(
                           ["FRANCE", "GERMANY", "CHINA"]))}]
    return q


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=scalar_join_queries())
def test_scalar_join_equals_duckdb(q, spark, catalog, ddb):
    got = compile_query(q, catalog).toPandas()
    tm = catalog.spark_type_map("customer")
    tm.update(catalog.spark_type_map("nation"))
    tm.update(catalog.spark_type_map("orders"))
    sql = assemble_sql(q, tm, dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=scalar_join_queries())
def test_scalar_join_equals_sql_twin(q, spark, catalog):
    got = compile_query(q, catalog).toPandas()
    tm = catalog.spark_type_map("customer")
    tm.update(catalog.spark_type_map("nation"))
    tm.update(catalog.spark_type_map("orders"))
    sql = assemble_sql(q, tm, dialect="spark")
    want = spark.sql(sql).toPandas()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


# ---- r13: HAVING-scalar-subquery thresholds over derived-FROM legs --------
# (the second undrawn composite from the r12 queue: the r12 grammar
# drew having-subqueries only over base-table FROMs; a derived/CTE FROM
# means the outer aggregation — and its HAVING rewrite — runs over a
# frame the compiler itself built.)


@st.composite
def having_sub_derived_queries(draw) -> dict:
    """FROM = derived table or CTE (per-key COUNT over events), outer
    re-groups by the inner count and gates n_groups with an
    UNCORRELATED scalar-subquery threshold (COUNT of a drawn event
    type, scaled by a binary-exact fraction so the comparison is
    ulp-free in both engines — the r12 Q11-shape contract)."""
    key = draw(st.sampled_from(["user_id", "event_type", "day"]))
    inner: dict = {"select": [key, {"COUNT": "*", "as": "n"}],
                   "from": "events", "group_by": [key]}
    if draw(st.booleans()):
        inner["where"] = [{"col": "event_type", "op": "neq",
                           "val": draw(st.sampled_from(ETYPES))}]
    having: list = [{
        "col": "n_groups",
        "op": draw(st.sampled_from(["gt", "gte", "lt", "lte"])),
        "val": {"subquery": {
            "select": [{"COUNT": "*", "as": "tot"}],
            "from": "events",
            "where": [{"col": "event_type", "op": "eq",
                       "val": draw(st.sampled_from(ETYPES))}]},
            "scale": draw(st.sampled_from(
                [0.03125, 0.015625, 0.0078125]))},
    }]
    if draw(st.booleans()):
        # compose with a plain inline-aggregate HAVING condition
        having.append({"agg": {"COUNT": "*"}, "op": "gte",
                       "val": draw(st.integers(min_value=0,
                                               max_value=5))})
    outer: dict = {
        "select": ["n", {"COUNT": "*", "as": "n_groups"}],
        "group_by": ["n"],
        "having": having,
        "order_by": [{"col": "n", "dir": "asc"}],
    }
    if draw(st.booleans()):
        outer["with"] = {"v": inner}
        outer["from"] = "v"
    else:
        outer["from"] = inner
    return outer


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=having_sub_derived_queries())
def test_having_sub_derived_equals_duckdb(q, spark, catalog, ddb):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"),
                       dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=having_sub_derived_queries())
def test_having_sub_derived_equals_sql_twin(q, spark, catalog):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"),
                       dialect="spark")
    want = spark.sql(sql).toPandas()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


# ---- r13 late (r14 queue #3, pre-executed): set ops over JOINED legs ------
# (each set-op child carries its own join — child-plan aliasing, join
# hints, and pre-join dim filters all meet the set-op dedup/column-
# unification machinery in one draw.)


@st.composite
def setop_join_queries(draw) -> dict:
    kw = draw(st.sampled_from(["union", "intersect", "except"]))

    def leg() -> dict:
        join: dict = {"table": "customer",
                      "on": [["o_custkey", "c_custkey"]]}
        if draw(st.booleans()):
            join["hint"] = "broadcast"
        if draw(st.booleans()):
            # pre-join dim filter (join-side WHERE applies before the
            # join in both twins)
            join["where"] = [{"col": "c_acctbal", "op": "gt",
                              "val": draw(st.integers(min_value=0,
                                                      max_value=5000))}]
        c: dict = {
            "select": ["c_mktsegment", {"COUNT": "*", "as": "n"}],
            "from": "orders",
            "join": [join],
            "group_by": ["c_mktsegment"],
        }
        if draw(st.booleans()):
            c["where"] = [{"col": "o_totalprice",
                           "op": draw(st.sampled_from(["lt", "gte"])),
                           "val": draw(st.integers(min_value=1000,
                                                   max_value=300000))}]
        return c

    q: dict = {kw: [leg(), leg()]}
    if draw(st.booleans()):
        q["all"] = True
    q["order_by"] = [{"col": "c_mktsegment", "dir": "asc"},
                     {"col": "n", "dir": "asc"}]
    return q


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=setop_join_queries())
def test_setop_join_equals_duckdb(q, spark, catalog, ddb):
    got = compile_query(q, catalog).toPandas()
    tm = catalog.spark_type_map("orders")
    tm.update(catalog.spark_type_map("customer"))
    sql = assemble_sql(q, tm, dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=setop_join_queries())
def test_setop_join_equals_sql_twin(q, spark, catalog):
    got = compile_query(q, catalog).toPandas()
    tm = catalog.spark_type_map("orders")
    tm.update(catalog.spark_type_map("customer"))
    sql = assemble_sql(q, tm, dialect="spark")
    want = spark.sql(sql).toPandas()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


# ---- r13 late: windows over a derived FROM whose inner leg carries a
# HAVING-scalar-subquery threshold — the two newest grammar features
# meeting in one plan (the window input frame is itself the product of
# the decorrelated-threshold rewrite).


@st.composite
def window_derived_having_queries(draw) -> dict:
    inner: dict = {"select": ["user_id", {"COUNT": "*", "as": "n"},
                              {"SUM": "value", "as": "sv", "round": 6}],
                   "from": "events", "group_by": ["user_id"]}
    if draw(st.booleans()):
        inner["where"] = [{"col": "event_type", "op": "neq",
                           "val": draw(st.sampled_from(ETYPES))}]
    inner["having"] = [{
        "col": "n",
        "op": draw(st.sampled_from(["gt", "lte"])),
        "val": {"subquery": {
            "select": [{"COUNT": "*", "as": "tot"}],
            "from": "events",
            "where": [{"col": "event_type", "op": "eq",
                       "val": draw(st.sampled_from(ETYPES))}]},
            "scale": draw(st.sampled_from(
                [0.03125, 0.015625, 0.0078125]))},
    }]
    fn = draw(st.sampled_from(["sum", "count", "min", "max", "avg"]))
    term: dict = {"win": fn, "of": draw(st.sampled_from(["sv", "n"])),
                  "partition_by": ["n"],
                  "order_by": [{"col": "user_id", "dir": "asc"}],
                  "as": "w"}
    if fn in ("sum", "avg"):
        term["round"] = 6
    outer: dict = {"select": ["user_id", "n", "sv", term],
                   "order_by": ["user_id"]}
    if draw(st.booleans()):
        outer["with"] = {"v": inner}
        outer["from"] = "v"
    else:
        outer["from"] = inner
    return outer


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=window_derived_having_queries())
def test_window_derived_having_equals_duckdb(q, spark, catalog, ddb):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"),
                       dialect="duckdb")
    want = ddb.execute(sql).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=window_derived_having_queries())
def test_window_derived_having_equals_sql_twin(q, spark, catalog):
    got = compile_query(q, catalog).toPandas()
    sql = assemble_sql(q, catalog.spark_type_map("events"),
                       dialect="spark")
    want = spark.sql(sql).toPandas()
    assert sorted(got.columns) == sorted(want.columns), (q, sql)
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want),
        check_dtype=False, check_exact=False, rtol=1e-6,
    )


# ---- operator property tests vs pure-python references -------------------

@st.composite
def skewed_tables(draw):
    """Random fact/dim pair with adjustable skew: one key may hold up
    to ~90% of fact rows; dims may miss keys; facts may carry NULLs."""
    n_keys = draw(st.integers(2, 8))
    hot = draw(st.integers(0, n_keys - 1))
    hot_rows = draw(st.integers(0, 60))
    cold_rows = draw(st.integers(0, 20))
    fact = [(hot, 1000 + i) for i in range(hot_rows)]
    fact += [
        (draw(st.integers(0, n_keys - 1)), 2000 + i)
        for i in range(cold_rows)
    ]
    if draw(st.booleans()):
        fact.append((None, 9999))
    dim_keys = draw(
        st.sets(st.integers(0, n_keys), min_size=0, max_size=n_keys + 1)
    )
    dim = [(k, f"d{k}") for k in sorted(dim_keys)]
    return fact, dim


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(t=skewed_tables())
def test_salted_join_equals_plain_join_property(t, spark):
    """salted_join ≡ the plain inner join for ANY key distribution,
    including empty sides, missing dim keys and NULL fact keys."""
    from query_planner_optimizer_spark.functions.skew import salted_join

    fact_rows, dim_rows = t
    fact = spark.createDataFrame(fact_rows, "k long, payload long") \
        if fact_rows else spark.createDataFrame([], "k long, payload long")
    dim = spark.createDataFrame(dim_rows, "k long, attr string") \
        if dim_rows else spark.createDataFrame([], "k long, attr string")
    got = sorted(
        (r.k, r.payload, r.attr)
        for r in salted_join(fact, dim, "k", salt_buckets=3,
                             share_threshold=0.3).collect()
    )
    want = sorted(
        (r.k, r.payload, r.attr)
        for r in fact.join(dim, "k", "inner").collect()
    )
    assert got == want


@st.composite
def line_corpora(draw):
    """Random newline documents over a tiny line alphabet so cross-doc
    repeats actually happen."""
    lines = ["alpha", "beta", "gamma", "delta", "common footer"]
    docs = []
    for i in range(draw(st.integers(1, 6))):
        k = draw(st.integers(1, 5))
        body = [draw(st.sampled_from(lines)) for _ in range(k)]
        docs.append((i, "\n".join(body)))
    maxdf = draw(st.integers(1, 4))
    return docs, maxdf


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(c=line_corpora())
def test_line_dedup_equals_python_reference(c, spark):
    """line_dedup ≡ a direct python implementation of the C4 rule on
    random corpora (doc-frequency counting, strict-greater removal,
    order-preserving reassembly, per-doc counts)."""
    from collections import defaultdict

    from query_planner_optimizer_spark.operators import docpipe

    docs, maxdf = c
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_lines_kept, r.n_lines_removed)
        for r in docpipe.line_dedup(df, max_doc_freq=maxdf).collect()
    }
    doc_freq: dict[str, set] = defaultdict(set)
    for did, body in docs:
        for line in body.split("\n"):
            doc_freq[line].add(did)
    want = {}
    for did, body in docs:
        kept = [ln for ln in body.split("\n")
                if len(doc_freq[ln]) <= maxdf]
        removed = len(body.split("\n")) - len(kept)
        want[did] = ("\n".join(kept), len(kept), removed)
    assert got == want


@pytest.fixture(scope="module")
def fuzz_router(spark, catalog, tmp_path_factory):
    """A RollupRouter over a (day, event_type) sum/count/hist grain —
    built once for the soundness fuzz below."""
    from query_planner_optimizer_spark.plans.router import RollupRouter
    from query_planner_optimizer_spark.prepare import build_rollups

    spec = {"agg_day_etype_fuzz": {
        "keys": ["day", "event_type"],
        "aggs": {"value": ["sum", "count", "hist"]},
    }}
    agg_dir = str(tmp_path_factory.mktemp("fuzz_rollups"))
    build_rollups(catalog.table("events"), agg_dir, spec)
    return RollupRouter(spark, agg_dir, spec)


#: Routable-biased draws: grain-compatible keys (day/event_type plus
#: the derivable week), router-servable aggregates (rounded SUM/AVG,
#: counts, MIN/MAX, hist quantiles), flat grain-column predicates —
#: so roughly half the examples actually route and the soundness
#: property bites (the general dsl_queries corpus routes <2%).
routable_aggs = st.sampled_from([
    {"SUM": "value", "as": "sv", "round": 6},
    {"AVG": "value", "as": "av", "round": 6},
    {"COUNT": "*", "as": "cnt"},
    {"COUNT": "value", "as": "cv"},
    {"MIN": "value", "as": "mn"},
    {"MAX": "value", "as": "mx"},
    {"APPROX_P50": "value", "as": "p50"},
    {"APPROX_P90": "value", "as": "p90"},
])

routable_conds = st.one_of(
    st.builds(lambda op, v: {"col": "event_type", "op": op, "val": v},
              st.sampled_from(["eq", "neq"]), st.sampled_from(ETYPES)),
    st.builds(lambda vs: {"col": "event_type", "op": "in",
                          "val": sorted(vs)},
              st.sets(st.sampled_from(ETYPES), min_size=1, max_size=3)),
    st.builds(lambda d1, d2: {"col": "day", "op": "between",
                              "val": [f"2024-01-{min(d1, d2):02d}",
                                      f"2024-01-{max(d1, d2):02d}"]},
              st.integers(min_value=1, max_value=28),
              st.integers(min_value=1, max_value=28)),
)


@st.composite
def routable_queries(draw) -> dict:
    keys = draw(st.lists(st.sampled_from(["day", "event_type", "week"]),
                         min_size=0, max_size=2, unique=True))
    aggs = draw(st.lists(routable_aggs, min_size=1, max_size=3,
                         unique_by=lambda t: t["as"]))
    q: dict = {"from": "events", "select": [*keys, *aggs]}
    if keys:
        q["group_by"] = keys
    where = draw(st.lists(routable_conds, min_size=0, max_size=2))
    if where:
        q["where"] = where
    if keys and draw(st.booleans()):
        q["order_by"] = list(keys)
    return q


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(q=st.one_of(routable_queries(), dsl_queries()))
def test_router_subsumption_soundness(q, spark, catalog, fuzz_router):
    """SOUNDNESS fuzz of the rollup router's subsume-or-refuse proof:
    for ANY drawn query, if the router claims a route, the routed frame
    must be BITWISE equal to the raw-scan compile. Refusals are always
    allowed (completeness isn't fuzzed); a wrong rewrite never is."""
    routed = fuzz_router.route(q)
    if routed is None:
        return
    want = compile_query(q, catalog).toPandas()
    got = routed.toPandas()
    assert sorted(got.columns) == sorted(want.columns), q
    got = got[want.columns]
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want), check_dtype=False,
    )
