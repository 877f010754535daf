"""Catalyst-plan-level rollup routing for arbitrary Spark SQL.

``plans/router.RollupRouter`` rewrites *DSL dicts* onto materialized
rollups (the altitude of the reference's pattern router,
``query_engine.py:73-108``). This module lifts the same rewrite to the
**analyzed Catalyst logical plan**, so a user writing plain
``spark.sql("SELECT day, count(*) FROM events GROUP BY day")`` — no DSL
involved — gets the rollup rewrite too.

Why not a real ``SparkSessionExtensions`` rule? Injecting an optimizer
rule requires a JVM-side (Scala) class on the driver classpath;
PySpark's py4j bridge cannot register a Python function as a Catalyst
rule. The Python-reachable equivalent is to pattern-match the SAME tree
the rule would see — ``df._jdf.queryExecution().analyzed()``, exported
losslessly by ``TreeNode.toJSON`` — *before* execution, and substitute
the rewritten DataFrame. The match runs pre-optimization on the
analyzed plan, exactly where an injected rule would sit, and the
rewrite itself reuses ``RollupRouter``'s subsumption proof, so the two
paths can never disagree about routability.

Matching is **subsume-or-refuse** (same contract as the DSL router): a
plan shape, expression class, or literal type outside the supported
surface refuses the route (``route_df`` returns None) and the caller
falls back to executing the original plan — a wrong rewrite is
impossible by construction. The supported surface:

    [GlobalLimit [LocalLimit]] [Sort] [Project] [Filter(HAVING)]
      Aggregate
        [Filter(WHERE)]
          SubqueryAlias(<view>) ...

- grouping keys: plain column references;
- aggregates: COUNT(*)/COUNT(col)/SUM(col)/AVG(col), optionally under
  ROUND(_, k) — routed with the engine's exact-DECIMAL-partial
  semantics (``router._measure``), so a routed answer is bit-identical
  to the DSL scan path and its DuckDB oracle;
- WHERE: and/or/not trees over eq/neq/in/not_in/lt/lte/gt/gte/
  is_null/is_not_null with literal operands (casts around literals are
  unwrapped; casts around columns refuse);
- HAVING: the analyzer plants the having aggregate as an extra
  Aggregate output and trims it with a Project — both are translated,
  and the trim is re-applied after routing.

Scale note: this is a logical rewrite — a routed query touches the
rollup's 10^3-10^6 rows instead of the base table's 10^9-10^12, and
the refusal path costs one plan-JSON parse (no Spark job).
"""

from __future__ import annotations

import json
import re
from datetime import date, datetime, timedelta
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from query_planner_optimizer_spark.plans.router import RollupRouter


class Unsupported(Exception):
    """Plan/expression shape outside the routable surface (→ refuse)."""


def _cls(node: dict) -> str:
    return node["class"].rsplit(".", 1)[-1]


# -- expression trees -------------------------------------------------------
# TreeNode.toJSON flattens each expression tree pre-order; a node's
# named fields (left/right/child/value/list/scale/...) hold CHILD
# ORDINALS, so a recursive descent over num-children rebuilds the tree.


def _build(arr: list[dict]) -> dict:
    def rec(i: int) -> tuple[dict, int]:
        node = arr[i]
        n = int(node.get("num-children", 0))
        kids = []
        j = i + 1
        for _ in range(n):
            k, j = rec(j)
            kids.append(k)
        return {"n": node, "kids": kids}, j

    tree, end = rec(0)
    if end != len(arr):
        raise Unsupported(f"dangling expression nodes ({end}/{len(arr)})")
    return tree


def _kid(t: dict, field: str) -> dict:
    return t["kids"][int(t["n"][field])]


def _literal_value(t: dict) -> Any:
    """Literal → plain Python value in the DSL's spelling (dates and
    timestamps as strings — the compiler/router coerce them against the
    target column's type, which is also what makes them pushdownable)."""
    node = t["n"]
    if _cls(node) == "Cast":
        # Cast AROUND a literal only re-types it; the DSL coerces by
        # column dtype anyway, so the inner value is enough.
        return _literal_value(_kid(t, "child"))
    if _cls(node) != "Literal":
        raise Unsupported(f"non-literal operand: {_cls(node)}")
    v, dt = node.get("value"), str(node.get("dataType"))
    if v is None:
        raise Unsupported("NULL literal in comparison (use is_null)")
    if dt in ("integer", "long", "short", "byte"):
        return int(v)
    if dt in ("double", "float") or dt.startswith("decimal"):
        return float(v)
    if dt == "boolean":
        return v is True or str(v).lower() == "true"
    if dt == "string":
        return str(v)
    if dt == "date":
        s = str(v)
        if re.fullmatch(r"-?\d+", s):  # epoch-days form
            return str(date(1970, 1, 1) + timedelta(days=int(s)))
        return s
    if dt.startswith("timestamp"):
        s = str(v)
        if re.fullmatch(r"-?\d+", s):  # epoch-micros form
            ts = datetime(1970, 1, 1) + timedelta(microseconds=int(s))
            return ts.strftime("%Y-%m-%d %H:%M:%S.%f").rstrip("0").rstrip(".") \
                if ts.microsecond else ts.strftime("%Y-%m-%d %H:%M:%S")
        return s
    raise Unsupported(f"literal type {dt}")


def _attr_name(t: dict) -> str:
    if _cls(t["n"]) != "AttributeReference":
        raise Unsupported(f"expected column reference, got {_cls(t['n'])}")
    return t["n"]["name"]


_REL_OPS = {
    "EqualTo": "eq",
    "LessThan": "lt",
    "LessThanOrEqual": "lte",
    "GreaterThan": "gt",
    "GreaterThanOrEqual": "gte",
}
#: op under operand swap (5 < x  ≡  x > 5)
_FLIP = {"eq": "eq", "neq": "neq", "lt": "gt", "lte": "gte",
         "gt": "lt", "gte": "lte"}


def _cond(t: dict) -> dict:
    """Expression tree → DSL condition dict (and/or/not trees allowed)."""
    c = _cls(t["n"])
    if c == "And":
        return {"and": [_cond(_kid(t, "left")), _cond(_kid(t, "right"))]}
    if c == "Or":
        return {"or": [_cond(_kid(t, "left")), _cond(_kid(t, "right"))]}
    if c == "Not":
        inner = t["kids"][0]
        ic = _cls(inner["n"])
        if ic == "EqualTo":
            return _leaf(inner, "neq")
        if ic == "In":
            return _in_leaf(inner, "not_in")
        return {"not": _cond(inner)}
    if c == "In":
        return _in_leaf(t, "in")
    if c == "IsNull":
        return {"col": _attr_name(t["kids"][0]), "op": "is_null"}
    if c == "IsNotNull":
        return {"col": _attr_name(t["kids"][0]), "op": "is_not_null"}
    if c in _REL_OPS:
        return _leaf(t, _REL_OPS[c])
    if c == "Between":
        # RuntimeReplaceable: input/lower/upper are embedded
        # single-expression fields; the ordinal child is the planted
        # replacement tree (ignored — the DSL has a native between).
        inp = _build(t["n"]["input"])
        col = _col_side(inp)
        if col is not None:
            lo = _literal_value(_build(t["n"]["lower"]))
            hi = _literal_value(_build(t["n"]["upper"]))
            return {"col": col, "op": "between", "val": [lo, hi]}
        # CAST(date col AS STRING) BETWEEN two canonical ISO literals:
        # strippable by the same fixed-width lexicographic-order
        # argument as eq/range/IN (_date_to_string_side).
        cast_col = _date_to_string_side(inp)
        if cast_col is not None:
            lo = _canonical_date_lit(_build(t["n"]["lower"]))
            hi = _canonical_date_lit(_build(t["n"]["upper"]))
            if lo is not None and hi is not None:
                return {"col": cast_col, "op": "between", "val": [lo, hi]}
        raise Unsupported("BETWEEN without a plain column side")
    raise Unsupported(f"filter expression {c}")


_TIME_PREFIXES = ("timestamp", "date")


def _col_side(t: dict) -> str | None:
    """Column side of a comparison: a bare AttributeReference, or one
    under an analyzer-planted datetime-widening cast (timestamp_ntz →
    timestamp, date → timestamp, ...). Unwrapping those is sound
    because the DSL path re-coerces the literal to the COLUMN's own
    type (same wall-clock instant under the engine's fixed UTC session
    timezone); any other cast on a column changes comparison semantics
    and must refuse."""
    if _cls(t["n"]) == "Cast":
        target = str(t["n"].get("dataType", ""))
        inner = _kid(t, "child")
        if _cls(inner["n"]) == "AttributeReference":
            itype = str(inner["n"].get("dataType", ""))
            if target == itype:
                # identity cast (CAST(c AS <its own type>)) — a no-op
                return inner["n"]["name"]
            if (target.startswith(_TIME_PREFIXES)
                    and itype.startswith(_TIME_PREFIXES)):
                return inner["n"]["name"]
        return None
    if _cls(t["n"]) == "AttributeReference":
        return t["n"]["name"]
    return None


_ISO_DATE = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _date_to_string_side(t: dict) -> str | None:
    """``Cast(<date column> AS STRING)`` → the column name, else None.
    Strippable only against a CANONICAL ``YYYY-MM-DD`` literal (checked
    by the caller): Spark stringifies dates in exactly that form, which
    is fixed-width ISO, so lexicographic string order coincides with
    chronological order — eq/neq/range/IN against such a literal are
    all equivalent to the date-domain comparison the DSL re-coerces to.
    A non-canonical literal ('2024-1-3', 'zzz') has string-comparison
    semantics the date domain can't express → refuse."""
    if (_cls(t["n"]) == "Cast"
            and str(t["n"].get("dataType", "")).startswith("string")):
        inner = _kid(t, "child")
        if (_cls(inner["n"]) == "AttributeReference"
                and str(inner["n"].get("dataType", "")).startswith("date")):
            return inner["n"]["name"]
    return None


def _canonical_date_lit(t: dict) -> str | None:
    v = _literal_value(t)
    if isinstance(v, str) and _ISO_DATE.match(v):
        return v
    return None


def _leaf(t: dict, op: str) -> dict:
    left, right = _kid(t, "left"), _kid(t, "right")
    lcol, rcol = _col_side(left), _col_side(right)
    if lcol is not None and rcol is not None:
        # column-vs-column comparison → the DSL's col2 leaf (the
        # router's subsumption accounting counts both columns)
        return {"col": lcol, "op": op, "col2": rcol}
    if lcol is not None:
        return {"col": lcol, "op": op, "val": _literal_value(right)}
    if rcol is not None:
        return {"col": rcol, "op": _FLIP[op], "val": _literal_value(left)}
    # CAST(date col AS STRING) vs canonical ISO literal: strip the cast
    # (see _date_to_string_side for the order-compatibility argument).
    lcast, rcast = _date_to_string_side(left), _date_to_string_side(right)
    if lcast is not None:
        lit = _canonical_date_lit(right)
        if lit is not None:
            return {"col": lcast, "op": op, "val": lit}
    if rcast is not None:
        lit = _canonical_date_lit(left)
        if lit is not None:
            return {"col": rcast, "op": _FLIP[op], "val": lit}
    raise Unsupported(f"comparison without a plain column side ({op})")


def _in_leaf(t: dict, op: str) -> dict:
    value = _kid(t, "value")
    col = _col_side(value)
    kids = [t["kids"][int(i)] for i in t["n"]["list"]]
    if col is None:
        cast_col = _date_to_string_side(value)
        if cast_col is not None:
            lits = [_canonical_date_lit(k) for k in kids]
            if all(v is not None for v in lits):
                return {"col": cast_col, "op": op, "val": lits}
        raise Unsupported("IN without a plain column side")
    vals = [_literal_value(k) for k in kids]
    return {"col": col, "op": op, "val": vals}


_AGG_FNS = {"Count": "COUNT", "Sum": "SUM", "Average": "AVG",
            "Min": "MIN", "Max": "MAX"}


def _strip_cast(t: dict, to: str) -> dict:
    """Unwrap ``Cast(x AS <to>...)`` (prefix match, so ``decimal`` hits
    any precision/scale)."""
    if (_cls(t["n"]) == "Cast"
            and str(t["n"].get("dataType", "")).startswith(to)):
        return _kid(t, "child")
    return t


def _agg_call(t: dict) -> tuple[str, str]:
    """AggregateExpression → (fname, col). The aggregate target may sit
    under a to-DECIMAL cast — the engine's bit-stable accumulation
    idiom (``assembler._agg_expr_sql``) — which the router's measure
    reproduces, so unwrapping it is semantics-preserving."""
    if _cls(t["n"]) != "AggregateExpression":
        raise Unsupported(f"projection expression {_cls(t['n'])}")
    if t["n"].get("isDistinct"):
        raise Unsupported("DISTINCT aggregate")
    if len(t["kids"]) != 1:
        # A second child is a FILTER (WHERE ...) clause — dropping it
        # would silently widen the aggregate; refuse instead.
        raise Unsupported("aggregate with FILTER clause")
    fn = _kid(t, "aggregateFunction")
    fname = _AGG_FNS.get(_cls(fn["n"]))
    if fname is None:
        raise Unsupported(f"aggregate function {_cls(fn['n'])}")
    if len(fn["kids"]) != 1:
        raise Unsupported(f"{fname} with {len(fn['kids'])} arguments")
    arg = _strip_cast(fn["kids"][0], "decimal")
    if fname == "COUNT" and _cls(arg["n"]) == "Literal":
        return fname, "*"
    return fname, _attr_name(arg)


def _avg_div(t: dict) -> str | None:
    """``double(SUM(dec x)) / COUNT(x)`` → x, else None."""
    if _cls(t["n"]) != "Divide":
        return None
    num = _strip_cast(_kid(t, "left"), "double")
    den = _strip_cast(_kid(t, "right"), "double")
    f1, c1 = _agg_call(num)
    f2, c2 = _agg_call(den)
    if f1 == "SUM" and f2 == "COUNT" and c1 == c2 and c1 != "*":
        return c1
    raise Unsupported("non-AVG aggregate division")


def _agg_term(t: dict, alias: str) -> dict:
    """Alias child → DSL aggregate term. Accepts the plain forms
    (``sum(x)``, ``round(sum(x), k)``) and the engine's documented
    bit-stable idioms (``assembler._agg_expr_sql``):
    ``CAST(ROUND(SUM(CAST(x AS DECIMAL)), k) AS DOUBLE)`` and the
    rounded-AVG half-up formula
    ``FLOOR(double(SUM(dec x))/COUNT(x) * 10^k + 0.5) / 10^k``
    (plus its pre-r8 ``ROUND(... / COUNT(x), k)`` spelling) — all map
    onto the same rounded decimal-partial measure the router
    re-derives."""
    import math

    round_to = None
    t = _strip_cast(t, "double")
    if _cls(t["n"]) == "Round":
        round_to = int(_literal_value(_kid(t, "scale")))
        t = _strip_cast(_kid(t, "child"), "double")
    if _cls(t["n"]) == "Divide" and round_to is None:
        # FLOOR(x·p + 0.5) / p — the r8 AVG rounding idiom.
        den = _kid(t, "right")
        num = _strip_cast(_kid(t, "left"), "double")
        if _cls(num["n"]) == "Floor":
            p_out = _literal_value(den)
            inner = _strip_cast(_kid(num, "child"), "double")
            if (_cls(inner["n"]) != "Add"
                    or not isinstance(p_out, (int, float))):
                raise Unsupported("non-AVG floor expression")
            half = _literal_value(_kid(inner, "right"))
            mul = _strip_cast(_kid(inner, "left"), "double")
            if (half != 0.5 or _cls(mul["n"]) != "Multiply"
                    or _literal_value(_kid(mul, "right")) != p_out):
                raise Unsupported("non-AVG floor expression")
            if not isinstance(p_out, (int, float)) or p_out <= 0:
                # log10 raises ValueError (not Unsupported) on zero or
                # negative divisors, which would crash PlanRouter.sql
                # instead of falling back to the original plan.
                raise Unsupported("non-positive floor scale")
            r = math.log10(float(p_out))
            if abs(r - round(r)) > 1e-9:
                raise Unsupported("non-power-of-10 floor scale")
            col = _avg_div(_strip_cast(_kid(mul, "left"), "double"))
            if col is None:
                raise Unsupported("non-AVG floor expression")
            return {"AVG": col, "as": alias, "round": int(round(r))}
    if _cls(t["n"]) == "Divide" and round_to is not None:
        # pre-r8 decimal-AVG idiom: ROUND(double(SUM)/COUNT, k). The
        # ORIGINAL plan rounds the double quotient with NATIVE Spark
        # ROUND, not the r8 FLOOR half-up — flag the term so the rollup
        # measure applies F.round too, keeping routed == unrouted
        # bit-exact even at half-boundaries (where the two roundings
        # legitimately differ).
        col = _avg_div(t)
        if col is not None:
            return {"AVG": col, "as": alias, "round": round_to,
                    "__round_native__": True}
    fname, col = _agg_call(t)
    term: dict = {fname: col, "as": alias}
    if round_to is not None:
        term["round"] = round_to
        if fname in ("MIN", "MAX"):
            # A matched ``round(min(x), k)`` plan rounds NATIVELY over
            # the raw aggregate; the DSL scan path (and the router's
            # default measure) use the r9 FLOOR half-up. Flag it so the
            # rollup measure mirrors the plan being served — same
            # routed == unrouted pin as the pre-r8 AVG spelling.
            term["__round_native__"] = True
    return term


_ARITH_CLS = {"Multiply": "mul", "Divide": "div",
              "Add": "add", "Subtract": "sub", "Remainder": "mod"}


def _post_expr(t: dict, hidden: list, alias_of: dict):
    """Arithmetic over aggregates (the raw-SQL spelling of a
    post-aggregation expression, e.g. a ratio of sums) → DSL post tree.
    Aggregate leaves become HIDDEN select terms (deduplicated by
    shape), trimmed off after routing; numeric literals pass through.
    Anything else refuses."""
    t = _strip_cast(t, "double")
    t = _strip_cast(t, "decimal")
    c = _cls(t["n"])
    if c in _ARITH_CLS:
        return {"op": _ARITH_CLS[c],
                "args": [_post_expr(_kid(t, "left"), hidden, alias_of),
                         _post_expr(_kid(t, "right"), hidden, alias_of)]}
    if c == "Literal":
        v = _literal_value(t)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise Unsupported("non-numeric literal in post expression")
        return v
    term = _agg_term(t, alias="__pa")
    sig = json.dumps({k: v for k, v in term.items() if k != "as"},
                     sort_keys=True)
    if sig not in alias_of:
        name = f"__pa{len(alias_of)}"
        alias_of[sig] = name
        hidden.append({**term, "as": name})
    return alias_of[sig]


def _post_term(t: dict, alias: str, hidden: list, alias_of: dict) -> dict:
    """Alias child → DSL post-aggregation term (optional top ROUND)."""
    round_to = None
    t = _strip_cast(t, "double")
    if _cls(t["n"]) == "Round":
        round_to = int(_literal_value(_kid(t, "scale")))
        t = _kid(t, "child")
    tree = _post_expr(t, hidden, alias_of)
    if isinstance(tree, (str, int, float)):
        raise Unsupported("post expression reduces to a single leaf")
    term: dict = {"post": tree, "as": alias}
    if round_to is not None:
        term["round"] = round_to
    return term


# -- plan walk --------------------------------------------------------------


_ID_KEYS = ("exprId", "resultId", "jvmId", "qualifier")


def _normalize(obj):
    """Strip per-plan identity (expression ids, qualifiers) so two
    analyzed plans of the SAME source frame compare structurally
    equal."""
    if isinstance(obj, dict):
        return {k: _normalize(v) for k, v in obj.items()
                if k not in _ID_KEYS}
    if isinstance(obj, list):
        return [_normalize(v) for v in obj]
    return obj


def translate_plan(
    nodes: list[dict], view: str, table: str = "events",
    canon: list[dict] | None = None,
) -> tuple[dict, list[str] | None]:
    """Analyzed-plan JSON → (DSL query dict, post-route projection).

    Raises :class:`Unsupported` on any shape outside the routable
    surface. The projection (or None) re-trims analyzer-planted HAVING
    aggregates after routing.

    The source below the aggregate is accepted two ways: a
    ``SubqueryAlias`` matching ``view`` (the spark.sql path), or — when
    ``canon`` is given — a subtree STRUCTURALLY EQUAL (modulo
    expression ids) to the canonical source frame's own analyzed plan
    (the DataFrame-API path: ``cat.table("events").groupBy(...)``).
    Structural equality is what makes the second path sound: any user
    transformation between the source and the aggregate changes the
    subtree and refuses the route.
    """
    i = 0
    q: dict = {"from": table}
    proj: list[str] | None = None

    def cls_at(j: int) -> str:
        return _cls(nodes[j]) if j < len(nodes) else ""

    # NB: single-expression fields (condition, limitExpr) serialize as
    # one flat node array; Seq fields (groupingExpressions, order, ...)
    # as a list of flat arrays.
    if cls_at(i) == "GlobalLimit":
        q["limit"] = int(_literal_value(_build(nodes[i]["limitExpr"])))
        i += 1
        if cls_at(i) == "LocalLimit":
            i += 1
    if cls_at(i) == "Sort":
        order = []
        for so in nodes[i]["order"]:
            tree = _build(so)
            if _cls(tree["n"]) != "SortOrder":
                raise Unsupported("non-SortOrder in Sort")
            direction = ("desc" if "Descending"
                         in tree["n"]["direction"]["object"] else "asc")
            nulls = tree["n"]["nullOrdering"]["object"]
            default = "NullsFirst" if direction == "asc" else "NullsLast"
            spec = {"col": _attr_name(tree["kids"][0]), "dir": direction}
            if default not in nulls:
                # Explicit non-default placement maps to the DSL's
                # order spec (r6 admission — previously refused).
                spec["nulls"] = ("first" if "NullsFirst" in nulls
                                 else "last")
            order.append(spec)
        q["order_by"] = order
        i += 1
    if cls_at(i) == "Project":
        # Analyzer-planted trim of internal HAVING aggregates; only a
        # pure column-reference projection is that shape.
        proj = [_attr_name(_build(p)) for p in nodes[i]["projectList"]]
        i += 1
    if cls_at(i) == "Filter" and cls_at(i + 1) == "Aggregate":
        having = _cond(_build(nodes[i]["condition"]))
        q["having"] = having["and"] if set(having) == {"and"} else [having]
        i += 1
    if cls_at(i) != "Aggregate":
        raise Unsupported(f"expected Aggregate, found {cls_at(i)}")
    agg = nodes[i]
    i += 1

    group_by = [_attr_name(_build(g)) for g in agg["groupingExpressions"]]
    select: list = []
    out_names: list[str] = []
    hidden: list = []
    alias_of: dict = {}
    for ae in agg["aggregateExpressions"]:
        tree = _build(ae)
        c = _cls(tree["n"])
        if c == "AttributeReference":
            select.append(_attr_name(tree))
            out_names.append(_attr_name(tree))
        elif c == "Alias":
            name = tree["n"]["name"]
            child = tree["kids"][0]
            if _cls(child["n"]) == "AttributeReference":
                if _attr_name(child) != name:
                    raise Unsupported(f"renamed grouping column {name}")
                select.append(name)
            else:
                try:
                    select.append(_agg_term(child, name))
                except Unsupported:
                    # Arithmetic over aggregates (ratio-of-sums):
                    # decompose into hidden aggregate terms + a post
                    # expression, trimmed back after routing.
                    select.append(_post_term(child, name, hidden,
                                             alias_of))
            out_names.append(name)
        else:
            raise Unsupported(f"aggregate output {c}")
    q["select"] = select + hidden
    if hidden and proj is None:
        proj = out_names
    if group_by:
        q["group_by"] = group_by

    if cls_at(i) == "Filter":
        where = _cond(_build(nodes[i]["condition"]))
        q["where"] = where["and"] if set(where) == {"and"} else [where]
        i += 1
    if cls_at(i) == "SubqueryAlias":
        ident = nodes[i]["identifier"]["name"]
        # Spark's analyzer resolves identifiers case-insensitively
        # (spark.sql.caseSensitive=false default) and serializes them
        # lower-cased; match the same way.
        if ident.lower() != view.lower():
            raise Unsupported(f"source view {ident!r} is not {view!r}")
        # Everything below the alias is the view's own definition (the
        # catalog's derived-time-column projects over the parquet
        # relation) — the same frame the rollups were built from, by
        # construction.
        return q, proj
    if canon is not None and _normalize(nodes[i:]) == _normalize(canon):
        return q, proj
    raise Unsupported(
        f"source is neither the {view!r} view nor the canonical frame "
        f"(found {cls_at(i)})"
    )


class PlanRouter:
    """Route analyzed Catalyst plans onto rollups (see module doc).

    ``view`` is the registered view name the plan must read; ``table``
    is the rollup spec's source-table label (``RollupRouter.tables``).
    """

    def __init__(self, spark: SparkSession, aggregates_dir: str,
                 rollup_keys: dict | None = None, view: str = "events",
                 table: str = "events", frame: DataFrame | None = None):
        self.spark = spark
        self.view = view
        self.table = table
        self.router = RollupRouter(spark, aggregates_dir, rollup_keys)
        #: canonical source-frame plan for the DataFrame-API path
        #: (``frame=cat.table("events")``): a plan whose below-aggregate
        #: subtree equals this one structurally routes without a view.
        self._canon = (
            json.loads(frame._jdf.queryExecution().analyzed().toJSON())
            if frame is not None else None
        )
        # Flavor-dependent derivations (router._TIME_DERIVE_TYPED):
        # the PlanRouter can see the actual source schema — the frame's
        # if given, else the registered view's — so it can pin hour's
        # timestamp-vs-ntz flavor and admit the minute→hour derivation
        # the flavor-blind RollupRouter refuses.
        src_schema = None
        if frame is not None:
            src_schema = frame.schema
        else:
            try:
                src_schema = spark.table(view).schema
            except Exception:  # view not registered (yet) — stay refused
                src_schema = None
        if src_schema is not None and "hour" in src_schema.names:
            self.router.time_dtypes["hour"] = src_schema["hour"].dataType
        #: why the last route_df refused (None after a successful route)
        self.last_reason: str | None = None

    def route_df(self, df: DataFrame) -> DataFrame | None:
        """Rewrite ``df``'s analyzed plan onto a rollup, or None."""
        nodes = json.loads(df._jdf.queryExecution().analyzed().toJSON())
        try:
            q, proj = translate_plan(nodes, self.view, self.table,
                                     canon=self._canon)
        except Unsupported as e:
            self.last_reason = f"translate: {e}"
            return None
        routed = self.router.route(q)
        if routed is None:
            self.last_reason = "router: no subsuming rollup"
            return None
        self.last_reason = None
        if proj is not None and proj != list(routed.columns):
            routed = routed.select(*proj)
        return routed

    def sql(self, query: str) -> tuple[DataFrame, bool]:
        """``spark.sql`` with rollup substitution: (frame, was_routed)."""
        df = self.spark.sql(query)
        routed = self.route_df(df)
        return (routed, True) if routed is not None else (df, False)
