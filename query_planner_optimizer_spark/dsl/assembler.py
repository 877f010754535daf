"""JSON query DSL → SQL text, for Spark SQL and for the DuckDB oracle.

Twin of :mod:`.compiler`, mirroring the reference's baseline assembler
(reference ``baseline/assembler.py:6-59``) with two deliberate upgrades:

- **typed literals** — the reference single-quotes every value, even
  numerics (``baseline/assembler.py:25-33``), relying on DuckDB implicit
  casts; here literals are typed from the table schema (numbers bare,
  dates as ``DATE '...'``) so Spark's ANSI mode and pushdown both work;
- **dialects** — ``spark`` (backtick identifiers, runs via ``spark.sql``
  over the catalog's augmented temp views) and ``duckdb`` (double-quote
  identifiers; derived time columns day/week/hour/minute are inlined as
  a CTE over the raw table, since the oracle only has raw parquet views).

Keeping both paths (DSL→DataFrame and DSL→SQL→engine) reproduces the
reference's engine-vs-baseline differential testing scheme (SURVEY.md §5)
inside this repo: every fixture asserts compiler ≡ spark-sql ≡ duckdb.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

from query_planner_optimizer_spark.catalog import DERIVED_TIME_COLUMNS, duckdb_time_cte
from query_planner_optimizer_spark.functions import histq as _HQ
from query_planner_optimizer_spark.functions.rounding import (
    sql_round_half_up as _rs,
)
from query_planner_optimizer_spark.dsl.compiler import (
    AGG_FUNCS,
    ARITH_OPS,
    SET_OPS,
    WINDOW_RANK_FNS,
    QueryError,
    agg_decimal_scale,
    _is_agg_term,
    _is_exists_leaf,
    _is_expr_term,
    _is_membership_leaf,
    _is_post_term,
    _check_order_spec_keys,
    _is_win_term,
    _parse_agg_term,
    _parse_window_term,
    _NONEQUI_SQL,
    expr_columns,
    validate_derived_from,
    validate_join_nonequi,
    parse_grouping,
    validate_exists_join_types,
    validate_exists_leaf,
    validate_membership_subquery,
    validate_with_clause,
)

_OP_SQL = {"eq": "=", "neq": "<>", "lt": "<", "lte": "<=", "gt": ">", "gte": ">="}


def _quote_ident(name: str, dialect: str) -> str:
    if dialect == "duckdb":
        return '"' + name.replace('"', '""') + '"'
    return "`" + name.replace("`", "``") + "`"


def _ident(name: str, dialect: str) -> str:
    # Quote only when necessary (parens/spaces from aggregate aliases).
    if name.replace("_", "a").isalnum() and not name[0].isdigit():
        return name
    return _quote_ident(name, dialect)


def _literal(val: Any, dtype: T.DataType | None, dialect: str) -> str:
    if val is None:
        return "NULL"
    if isinstance(val, bool):
        return "TRUE" if val else "FALSE"
    if isinstance(val, (int, float)):
        return repr(val)
    if isinstance(val, str):
        escaped = val.replace("'", "''")
        if isinstance(dtype, T.DateType):
            return f"DATE '{escaped}'"
        if isinstance(dtype, T.TimestampType):
            return f"TIMESTAMP '{escaped}'"
        return f"'{escaped}'"
    raise QueryError(f"unsupported literal: {val!r}")


def _condition_sql(
    cond: dict, type_map: dict[str, T.DataType], dialect: str,
    outer_table: str | None = None,
    cte_names: frozenset = frozenset(),
) -> str:
    # Boolean-tree nodes (additive extension, twin of the compiler's
    # _bool_expr): {"or": [...]}, {"and": [...]}, {"not": cond}.
    for kw, joiner in (("or", " OR "), ("and", " AND ")):
        if kw in cond:
            if not cond[kw]:
                raise QueryError(f"{kw!r} needs at least one branch: {cond!r}")
            return "(" + joiner.join(
                _condition_sql(b, type_map, dialect, outer_table,
                               cte_names)
                for b in cond[kw]
            ) + ")"
    if "not" in cond:
        inner = _condition_sql(cond["not"], type_map, dialect,
                               outer_table, cte_names)
        return f"(NOT {inner})"
    if _is_exists_leaf(cond):
        # Mirrors the compiler's refusal: exists rewrites to semi/anti
        # joins, which cannot sit under OR/NOT or inside HAVING.
        raise QueryError(
            "exists leaves are only supported as top-level WHERE "
            f"conditions: {cond!r}")
    col_name = cond.get("col")
    if col_name not in type_map:
        raise QueryError(f"unknown filter column: {cond!r}")
    c2 = cond.get("col2")
    if c2 is not None:
        # Column-vs-column comparison — twin of the compiler's col2
        # branch (comparison ops only; no literal side).
        op = cond.get("op")
        if op not in _OP_SQL:
            raise QueryError(
                f"op {op!r} does not support a column comparison: {cond!r}"
            )
        if "val" in cond:
            raise QueryError(
                f"condition takes 'val' or 'col2', not both: {cond!r}"
            )
        if c2 not in type_map:
            raise QueryError(f"unknown filter column: {cond!r}")
        return f"{_ident(col_name, dialect)} {_OP_SQL[op]} {_ident(c2, dialect)}"
    val = cond.get("val")
    if isinstance(val, dict) and "subquery" in val:
        if cond.get("op") in ("in", "not_in"):
            # Membership subqueries rewrite to semi/anti joins, which
            # cannot sit under OR/NOT or inside FILTER/HAVING — only
            # assemble_sql's top-level WHERE renders them.
            raise QueryError(
                "membership subqueries are only supported as top-level "
                f"WHERE conditions: {cond!r}"
            )
        # Scalar subquery — twin of the compiler's rewrites. Uncorrelated
        # renders a bare nested SELECT (compiler: broadcast crossJoin);
        # correlated renders a natively correlated subquery whose outer
        # references are qualified by the outer FROM table (compiler:
        # decorrelated group-agg join). Identical scoping text is valid
        # in both Spark SQL and DuckDB: the inner alias shadows the
        # table name, so ``<outer_table>.<col>`` resolves outward even
        # when inner and outer scan the same table (TPC-H Q17).
        from query_planner_optimizer_spark.dsl.compiler import (
            SCALAR_SUBQUERY_OPS,
            validate_subquery_val,
        )

        op = cond.get("op")
        if op not in SCALAR_SUBQUERY_OPS or op not in _OP_SQL:
            raise QueryError(
                f"op {op!r} does not support a scalar subquery: {cond!r}"
            )
        pairs = validate_subquery_val(val)
        sub = val["subquery"]
        if pairs:
            if outer_table is None:
                raise QueryError(
                    "correlated subqueries are only valid in the main "
                    f"WHERE clause: {cond!r}"
                )
            sub_sql = _correlated_subselect_sql(
                sub, pairs, _ident(outer_table, dialect), type_map,
                dialect, shadow_table=outer_table)
        else:
            sub_sql = assemble_sql(sub, type_map, dialect,
                                   cte_names=cte_names)
        rhs = f"({sub_sql})"
        if val.get("scale") is not None:
            rhs = f"({_literal(val['scale'], None, dialect)} * {rhs})"
        return f"{_ident(col_name, dialect)} {_OP_SQL[op]} {rhs}"
    return _render_cond(
        _ident(col_name, dialect), cond, type_map[col_name], dialect
    )


def _correlated_subselect_sql(
    sub: dict,
    pairs: list[tuple[str, str]],
    outer_qual: str,
    type_map: dict[str, T.DataType],
    dialect: str,
    shadow_table: str | None = None,
) -> str:
    """Render a natively correlated scalar subselect whose outer
    references qualify by ``outer_qual`` (the outer FROM table in WHERE
    position; the wrapper's derived-table alias in SELECT position —
    identical scoping text is valid in both Spark SQL and DuckDB).
    ``shadow_table``: a joined table with this name would capture the
    outer references when the qualifier IS a table name (the inner
    alias only shadows the base) — refuse; the compiler refuses the
    same shape in both positions, so passing it in SELECT position
    keeps the twin refusals symmetric even though the derived alias
    there cannot actually be shadowed."""
    alias = "__corr"
    agg_expr, _ = _agg_expr_sql(sub["select"][0], dialect, type_map)
    from_sql = f"{_ident(sub['from'], dialect)} AS {alias}"
    for jspec in sub.get("join") or []:
        if shadow_table is not None and jspec.get("table") == shadow_table:
            raise QueryError(
                f"correlated subquery cannot join the outer table "
                f"{shadow_table!r} (its name would shadow the outer "
                f"scope)"
            )
        from_sql += _join_clause_sql(jspec, type_map, dialect)
    conds = [
        f"{alias}.{_ident(ik, dialect)} = {outer_qual}.{_ident(ok, dialect)}"
        for ok, ik in pairs
    ]
    conds += [
        _condition_sql(c, type_map, dialect)
        for c in sub.get("where") or []
    ]
    return f"SELECT {agg_expr} FROM {from_sql} WHERE {' AND '.join(conds)}"


def _membership_sql(
    cond: dict, type_map: dict[str, T.DataType], dialect: str,
    ts_is_millis: bool, cte_names: frozenset = frozenset(),
) -> str:
    """Render a top-level membership leaf. ``in`` renders SQL ``IN
    (SELECT <first output> FROM (<sub>) AS __m)`` — exactly the
    compiler's LEFT SEMI join, including NULL handling (an outer NULL
    matches nothing either way). ``not_in`` deliberately renders ``NOT
    EXISTS`` rather than ``NOT IN``: SQL NOT IN returns UNKNOWN for
    every row once the member set contains one NULL, while the
    compiler's LEFT ANTI join (and NOT EXISTS) keeps non-matching rows
    — the sane semantics, stated here as the DSL's contract. The
    member key is re-aliased to ``__mkey`` in a one-column wrapper so
    no other inner output column can capture the outer reference."""
    col = cond.get("col")
    if col not in type_map:
        raise QueryError(f"unknown filter column: {cond!r}")
    sub = validate_membership_subquery(cond)
    sub_sql = assemble_sql(sub, type_map, dialect, ts_is_millis,
                           cte_names=cte_names)
    names = dsl_output_names(sub)
    if not names or not isinstance(names[0], str):
        raise QueryError(f"membership subquery has no output column: {sub!r}")
    key = _quote_ident(names[0], dialect)
    if cond["op"] == "in":
        return (f"{_ident(col, dialect)} IN "
                f"(SELECT {key} FROM ({sub_sql}) AS __m)")
    return (f"NOT EXISTS (SELECT 1 FROM (SELECT {key} AS __mkey "
            f"FROM ({sub_sql}) AS __mi) AS __m "
            f"WHERE __m.__mkey = {_ident(col, dialect)})")


def _exists_sql(
    cond: dict, type_map: dict[str, T.DataType], dialect: str,
    ts_is_millis: bool, outer_table: str,
    cte_names: frozenset = frozenset(),
) -> str:
    """Render a top-level EXISTS / NOT EXISTS leaf — the twin of the
    compiler's LEFT SEMI / LEFT ANTI rewrite. The subquery is wrapped
    in a derived table (``AS __ex``), so every inner relation name is
    enclosed and ``<outer_table>.<col>`` always resolves to the OUTER
    scope, even when inner and outer scan the same table; identical
    scoping text is valid in Spark SQL and DuckDB."""
    sub, pairs = validate_exists_leaf(cond)
    sub_sql = assemble_sql(sub, type_map, dialect, ts_is_millis,
                           cte_names=cte_names)
    names = dsl_output_names(sub)
    for ok, ik, _pop in pairs:
        if ok not in type_map:
            # Best-effort mirror of the compiler's outer-scope check
            # (the merged type_map cannot distinguish which TABLE a
            # known column comes from; the compiler's frame check is
            # the binding one).
            raise QueryError(
                f"exists outer column {ok!r} not in scope: {cond!r}")
        if ik not in names:
            raise QueryError(
                f"exists inner column {ik!r} not in subquery output "
                f"{names}: {cond!r}")
    sql_ops = {**_NONEQUI_SQL, "eq": "="}  # one table with join conds
    on = " AND ".join(
        f"{_ident(outer_table, dialect)}.{_ident(ok, dialect)} "
        f"{sql_ops[pop]} __ex.{_ident(ik, dialect)}"
        for ok, ik, pop in pairs
    )
    neg = "NOT " if cond["op"] == "not_exists" else ""
    return f"{neg}EXISTS (SELECT 1 FROM ({sub_sql}) AS __ex WHERE {on})"


def _render_cond(
    ident: str, cond: dict, dtype: T.DataType | None, dialect: str
) -> str:
    """Render ``<lhs> <op> <literal>`` where ``ident`` is any SQL
    expression (a quoted column for WHERE, an aggregate expression for
    HAVING — standard SQL evaluates HAVING before SELECT aliases exist,
    so aliases must be re-expanded)."""
    op = cond.get("op")
    val = cond.get("val")
    if op in _OP_SQL:
        return f"{ident} {_OP_SQL[op]} {_literal(val, dtype, dialect)}"
    if op in ("in", "not_in"):
        items = ", ".join(_literal(v, dtype, dialect) for v in val)
        neg = "NOT " if op == "not_in" else ""
        return f"{ident} {neg}IN ({items})"
    if op == "between":
        lo, hi = val
        return (
            f"{ident} BETWEEN {_literal(lo, dtype, dialect)}"
            f" AND {_literal(hi, dtype, dialect)}"
        )
    if op == "is_null":
        return f"{ident} IS NULL"
    if op == "is_not_null":
        return f"{ident} IS NOT NULL"
    if op == "like":
        return f"{ident} LIKE {_literal(val, None, dialect)}"
    raise QueryError(f"unknown filter op: {cond!r}")


def _num_expr_sql(
    e, dialect: str, type_map: dict[str, T.DataType] | None = None
) -> str:
    """Arithmetic expression tree → SQL, twin of ``compiler._num_expr``.
    Fully parenthesized so left-fold semantics survive precedence.
    Column leaves are validated against ``type_map`` when given, so a
    typo raises QueryError at build time like every other reference."""
    if isinstance(e, str):
        if type_map is not None and e not in type_map:
            raise QueryError(f"unknown column {e!r} in expression")
        return _ident(e, dialect)
    if isinstance(e, bool) or not isinstance(e, (dict, int, float)):
        raise QueryError(f"bad expression leaf: {e!r}")
    if isinstance(e, (int, float)):
        return repr(e)
    if "lit" in e:
        if set(e) != {"lit"} or not isinstance(e["lit"], str):
            raise QueryError(f"bad literal leaf (string only): {e!r}")
        return "'" + e["lit"].replace("'", "''") + "'"
    if "fn" in e:
        # String functions — identical semantics in both dialects (see
        # compiler.STRING_FNS); concat renders as `||` (null-propagating
        # like F.concat in both engines), strpos maps to Spark's instr.
        from query_planner_optimizer_spark.dsl.compiler import (
            DATE_FNS,
            NUMERIC_FNS,
            STRING_FNS,
        )

        fn, args = e["fn"], e.get("args")
        if fn in NUMERIC_FNS:
            arity = NUMERIC_FNS[fn]
            if not isinstance(args, list) or (
                len(args) != arity if arity is not None else len(args) < 2
            ):
                raise QueryError(
                    f"{fn} expects "
                    f"{arity if arity is not None else '>=2'} args: {e!r}"
                )
            parts = [_num_expr_sql(a, dialect, type_map) for a in args]
            return f"{fn}({', '.join(parts)})"
        if fn in DATE_FNS:
            # Date-part extraction — same spelling, same INTEGER-kind
            # result in both dialects.
            if not isinstance(args, list) or len(args) != 1:
                raise QueryError(f"{fn} expects 1 arg: {e!r}")
            return f"{fn}({_num_expr_sql(args[0], dialect, type_map)})"
        if fn not in STRING_FNS:
            raise QueryError(f"unknown function: {e!r}")
        arity = STRING_FNS[fn]
        if not isinstance(args, list) or (
            len(args) != arity if arity is not None else len(args) < 2
        ):
            raise QueryError(f"{fn} expects "
                             f"{arity if arity is not None else '>=2'} "
                             f"args: {e!r}")
        parts = [_num_expr_sql(a, dialect, type_map) for a in args]
        if fn == "concat":
            return "(" + " || ".join(parts) + ")"
        if fn == "strpos":
            name = "instr" if dialect == "spark" else "strpos"
            return f"{name}({parts[0]}, {parts[1]})"
        return f"{fn}({', '.join(parts)})"
    if "if" in e:
        if "then" not in e or "else" not in e:
            raise QueryError(f"'if' expression needs 'then' and 'else': {e!r}")
        if type_map is None:
            raise QueryError(f"'if' expression needs a type map: {e!r}")
        cond = _condition_sql(e["if"], type_map, dialect)
        then_sql = _num_expr_sql(e["then"], dialect, type_map)
        else_sql = _num_expr_sql(e["else"], dialect, type_map)
        return f"(CASE WHEN {cond} THEN {then_sql} ELSE {else_sql} END)"
    op = ARITH_OPS.get(e.get("op"))
    args = e.get("args")
    if op is None or not isinstance(args, list) or len(args) < 2:
        raise QueryError(f"bad expression node: {e!r}")
    out = _num_expr_sql(args[0], dialect, type_map)
    for a in args[1:]:
        out = f"({out} {op} {_num_expr_sql(a, dialect, type_map)})"
    return out


_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _is_integral_expr(
    e, type_map: dict[str, T.DataType] | None
) -> bool:
    """Conservative integral-type inference over an expression tree —
    True only when the expression is provably integer-valued (int
    columns / int literals composed with +,-,*, or CASE with integral
    branches). Used to pin DuckDB's HUGEINT SUM result to BIGINT."""
    if isinstance(e, bool):
        return False
    if isinstance(e, int):
        return True
    if isinstance(e, str):
        return (
            type_map is not None
            and isinstance(type_map.get(e), _INTEGRAL_TYPES)
        )
    if isinstance(e, dict):
        if "if" in e:
            return _is_integral_expr(
                e.get("then"), type_map
            ) and _is_integral_expr(e.get("else"), type_map)
        if e.get("op") in ("add", "sub", "mul", "mod"):
            return all(
                _is_integral_expr(a, type_map) for a in e.get("args") or []
            )
        # length/strpos/date-parts yield ints (DuckDB: BIGINT) — SUMs
        # over them need the same HUGEINT→BIGINT pin as int columns.
        if e.get("fn") in ("length", "strpos", "year", "month",
                           "dayofmonth"):
            return True
        if e.get("fn") in ("abs", "least", "greatest"):
            return all(
                _is_integral_expr(a, type_map) for a in e.get("args") or []
            )
    return False


def _referenced_tables(q: dict) -> set:
    """Table names a query references (FROM, joins, subquery FROMs,
    set-op branches) — used for CTE define-before-use validation."""
    out: set = set()
    for kw in SET_OPS:
        if kw in q:
            for c in q[kw]:
                out |= _referenced_tables(c)
            return out
    frm = q.get("from", "events")
    if isinstance(frm, dict):
        out |= _referenced_tables(frm)
    else:
        out.add(frm)
    for j in q.get("join") or []:
        out.add(j.get("table"))

    def visit(cond: dict) -> None:
        for kw in ("or", "and"):
            for b in cond.get(kw) or []:
                visit(b)
        if "not" in cond:
            visit(cond["not"])
        v = cond.get("val")
        if isinstance(v, dict) and "subquery" in v:
            out.update(_referenced_tables(v["subquery"]))

    for c in q.get("where") or []:
        visit(c)
    for t in q.get("select") or []:
        if isinstance(t, dict) and "subquery" in t:
            out |= _referenced_tables(t["subquery"])
    return out


def dsl_output_names(q: dict) -> list[str]:
    """Output column names of a DSL query, in select order (set ops:
    the first child's names, like both engines)."""
    for kw in SET_OPS:
        if kw in q:
            return dsl_output_names(q[kw][0])
    out: list[str] = []
    for t in q.get("select") or []:
        if _is_post_term(t):
            out.append(t["as"])
        elif isinstance(t, dict) and "subquery" in t:
            out.append(t.get("as"))
        elif _is_expr_term(t):
            out.append(t.get("as"))
        elif _is_win_term(t):
            out.append(_parse_window_term(t)[4])
        elif _is_agg_term(t):
            out.append(_parse_agg_term(t)[2])
        else:
            out.append(t)
    return out


_STRING_OUT_FNS = ("lower", "upper", "trim", "ltrim", "rtrim", "substr",
                   "concat", "replace")


def _is_string_expr(e, m: dict[str, T.DataType]) -> bool:
    if isinstance(e, str):
        return isinstance(m.get(e), T.StringType)
    if isinstance(e, dict):
        if "lit" in e:
            return True
        if e.get("fn") in _STRING_OUT_FNS:
            return True
        if "if" in e:
            return (_is_string_expr(e.get("then"), m)
                    and _is_string_expr(e.get("else"), m))
    return False


def _expr_type(e, m: dict[str, T.DataType]) -> T.DataType:
    """Conservative output type of a scalar expression tree — exact
    where it matters for the differential contract (integral → BIGINT
    pinning; string vs numeric; date/timestamp passthrough for literal
    coercion), DOUBLE otherwise."""
    if isinstance(e, str) and e in m:
        return m[e]
    if _is_integral_expr(e, m):
        return T.LongType()
    if _is_string_expr(e, m):
        return T.StringType()
    return T.DoubleType()


def _agg_out_type(
    fname: str, col, round_to, m: dict[str, T.DataType]
) -> T.DataType:
    if fname in ("COUNT", "COUNT_DISTINCT", "APPROX_COUNT_DISTINCT"):
        return T.LongType()
    if round_to is not None:
        # Every rounded non-COUNT aggregate is DOUBLE in both twins
        # (DECIMAL-accumulated SUM/AVG cast back; MIN/MAX & co through
        # the shared FLOOR half-up formula, which divides by 10^r).
        return T.DoubleType()
    if fname in ("AVG", "STDDEV_SAMP", "VAR_SAMP", "MEDIAN") \
            or fname in _HQ.APPROX_QUANTILES:
        return T.DoubleType()
    if fname in ("MIN", "MAX"):
        return _expr_type(col, m)
    # SUM: BIGINT over provably-integral targets, DOUBLE otherwise.
    return T.LongType() if _is_integral_expr(col, m) else T.DoubleType()


def derived_output_types(
    q: dict, type_map: dict[str, T.DataType]
) -> dict[str, T.DataType]:
    """Output column → type map of a derived-table FROM subquery, used
    to type the OUTER query's literals (dates stay dates), pin DuckDB's
    HUGEINT sums over derived BIGINT columns, and validate references —
    the structural twin of the compiler reading ``df.schema`` off the
    compiled inner frame."""
    for kw in SET_OPS:
        if kw in q:
            return derived_output_types(q[kw][0], type_map)
    inner_map = dict(type_map)
    # CTE views inside the subquery contribute their output columns
    # (define-before-use order, same as the WITH renderer).
    for vq in (q.get("with") or {}).values():
        inner_map.update(derived_output_types(vq, inner_map))
    if isinstance(q.get("from"), dict):
        inner_map.update(derived_output_types(q["from"], inner_map))
    out: dict[str, T.DataType] = {}
    post_terms: list[dict] = []
    for t in q.get("select") or []:
        if _is_post_term(t):
            # Leaves reference sibling aggregate aliases / group keys —
            # type them in a second pass once those aliases are typed.
            post_terms.append(t)
        elif _is_win_term(t):
            raise QueryError(
                "window projections are not supported inside a "
                f"derived-table FROM (engine-dependent output dtype): {t!r}"
            )
        elif isinstance(t, dict) and "subquery" in t:
            # Scalar select term (r7): the subquery's single output
            # column carries the type.
            sub_types = derived_output_types(t["subquery"], type_map)
            if len(sub_types) != 1:
                raise QueryError(
                    f"scalar select subquery must have one output: {t!r}")
            out[t["as"]] = (T.DoubleType() if t.get("round") is not None
                            else next(iter(sub_types.values())))
        elif _is_expr_term(t):
            # A rounded expr term is DOUBLE in both twins (the shared
            # FLOOR half-up formula divides by 10^r).
            out[t["as"]] = (T.DoubleType() if t.get("round") is not None
                            else _expr_type(t["expr"], inner_map))
        elif _is_agg_term(t):
            fname, col, out_name, round_to, _filt = _parse_agg_term(t)
            out[out_name] = _agg_out_type(fname, col, round_to, inner_map)
        else:
            if t not in inner_map:
                raise QueryError(
                    f"unknown column {t!r} in derived-table select"
                )
            # Under rollup/cube/sets grouping, keys project through the
            # string sentinel in both twins.
            out[t] = (T.StringType()
                      if isinstance(q.get("group_by"), dict)
                      else inner_map[t])
    for t in post_terms:
        # A provably-integral post tree (e.g. the product/difference of
        # two BIGINT SUM aliases) yields BIGINT in both engines; an
        # outer SUM over it then needs the HUGEINT→BIGINT pin, which
        # _agg_out_type applies only when the input types LongType.
        # Division and non-integral leaves stay DOUBLE as before.
        alias_map = {**inner_map, **out}
        out[t["as"]] = (
            T.LongType()
            if t.get("round") is None
            and _is_integral_expr(t["post"], alias_map)
            else T.DoubleType()
        )
    return out


def _agg_expr_sql(
    term: dict, dialect: str, type_map: dict[str, T.DataType] | None = None
) -> tuple[str, str]:
    """Render an aggregate term as ``(bare_expression, out_name)`` —
    callers attach the alias (or not, for HAVING re-expansion)."""
    fname, col, out_name, round_to, filt = _parse_agg_term(term)
    if isinstance(col, dict):
        target = _num_expr_sql(col, dialect, type_map)
    else:
        target = "*" if col == "*" else _ident(col, dialect)
    filter_sql = ""
    if filt:
        # SQL FILTER clause — identical syntax in Spark and DuckDB;
        # binds to the aggregate, so ROUND wraps outside it.
        if type_map is None:
            raise QueryError(f"aggregate FILTER needs a type map: {term}")
        cond = " AND ".join(
            _condition_sql(c, type_map, dialect) for c in filt
        )
        filter_sql = f" FILTER (WHERE {cond})"
    if round_to is not None and fname in ("SUM", "AVG"):
        # Rounded SUM/AVG accumulate in DECIMAL so the result is
        # bit-identical across engines regardless of partition /
        # summation order (float += is not associative; a double sum
        # can straddle a ROUND boundary differently per engine). The
        # compiler's DataFrame path applies the identical transform, so
        # Spark and the DuckDB oracle agree by construction.
        dec = f"DECIMAL(38, {agg_decimal_scale(round_to)})"
        sum_expr = f"SUM(CAST({target} AS {dec})){filter_sql}"
        if fname == "SUM":
            expr = f"CAST(ROUND({sum_expr}, {round_to}) AS DOUBLE)"
        else:
            # FLOOR(x·10^r + 0.5)/10^r, not ROUND(x, r): native double
            # ROUND is engine-implementation-defined at half-boundaries
            # (r8 longfuzz catch) — the explicit IEEE formula is
            # bit-identical in both dialects and to the compiler twin.
            cnt = f"COUNT({target}){filter_sql}"
            # DOUBLE-cast literals: a bare `1000000.0` parses as
            # DECIMAL in BOTH SQL dialects, which would drag the whole
            # formula into engine-specific decimal arithmetic.
            p = f"CAST({float(10 ** round_to)!r} AS DOUBLE)"
            x = f"(CAST({sum_expr} AS DOUBLE) / {cnt})"
            expr = (f"(FLOOR({x} * {p} + CAST(0.5 AS DOUBLE)) / {p})")
        return expr, out_name
    if fname == "COUNT" and col == "*":
        expr = "COUNT(*)"
    elif fname == "COUNT_DISTINCT":
        expr = f"COUNT(DISTINCT {target})"
    elif fname in _HQ.APPROX_QUANTILES:
        # Histogram-sketch quantile: exact-integer cumulative bin
        # counts (FILTER-clause-aware) combined by the shared
        # deterministic interpolation — the full SQL twin of the
        # engine's scan/routed forms (functions/histq.py).
        if not isinstance(col, str) or col not in _HQ.HIST_BINS:
            raise QueryError(
                f"{fname} needs a column with a HIST_BINS spec: {col!r}")
        lo, hi, nb = _HQ.HIST_BINS[col]
        idx = _HQ.bin_index_sql(_ident(col, dialect), lo, hi, nb)
        cums = [
            f"SUM(CASE WHEN {idx} <= {i} THEN 1 ELSE 0 END){filter_sql}"
            for i in range(nb)
        ]
        expr = _HQ.quantile_from_cums_sql(
            cums, _HQ.APPROX_QUANTILES[fname], lo, hi, nb,
            dialect=dialect)
        if round_to is not None:
            expr = _rs(expr, round_to)
        return expr, out_name
    elif fname == "APPROX_COUNT_DISTINCT":
        # Engine-only DataSketches-HLL surface: both dialects DO have a
        # same-named function, but each is a DIFFERENT sketch (Spark
        # HLL++, DuckDB HyperLogLog) whose estimates diverge from the
        # engine's DataSketches value — rendering it would produce a
        # silently-inexact twin. Refuse; the gate for this op is the
        # error-bound entry against exact COUNT(DISTINCT).
        raise QueryError(
            "APPROX_COUNT_DISTINCT has no SQL twin (engine-specific "
            "sketch); oracle against the exact COUNT(DISTINCT) bound"
        )
    else:
        expr = f"{fname}({target})"
    expr += filter_sql
    if fname == "SUM" and dialect == "duckdb" and _is_integral_expr(
        col, type_map
    ):
        # Spark's SUM over integral types yields BIGINT; DuckDB yields
        # HUGEINT, which pandas renders as float64 — a dtype mismatch
        # that breaks value-hash comparison. Pin the oracle to BIGINT.
        expr = f"CAST({expr} AS BIGINT)"
    if round_to is not None:
        if fname in ("COUNT", "COUNT_DISTINCT"):
            expr = f"ROUND({expr}, {round_to})"  # integer: exact
        else:
            # Twin of the compiler: rounded MIN/MAX/MEDIAN/STDDEV/VAR
            # doubles go through the shared half-up formula.
            expr = _rs(expr, round_to)
    return expr, out_name


def _agg_sql(
    term: dict, dialect: str, type_map: dict[str, T.DataType] | None = None
) -> str:
    expr, out_name = _agg_expr_sql(term, dialect, type_map)
    return f"{expr} AS {_quote_ident(out_name, dialect)}"


def _join_clause_sql(
    jspec: dict, type_map: dict[str, T.DataType], dialect: str
) -> str:
    """One join clause (`` JOIN t ...``) — shared by the main FROM
    assembly and correlated-subquery rendering. Pre-join filters become
    a filtered subselect aliased to the table's own name; same-named
    key pairs render USING (one output key copy), differently-named
    pairs render ON with the right side table-qualified."""
    _JOIN_KW = {
        "inner": "JOIN",
        "left": "LEFT JOIN",
        "right": "RIGHT JOIN",
        # FULL OUTER (r11): USING-form keys coalesce in BOTH dialects
        # (standard outer-USING semantics, matched by Spark's key-list
        # DataFrame join), so the twins agree on the merged key column.
        "full": "FULL JOIN",
        "semi": "SEMI JOIN" if dialect == "duckdb" else "LEFT SEMI JOIN",
        "anti": "ANTI JOIN" if dialect == "duckdb" else "LEFT ANTI JOIN",
    }
    jt = jspec.get("table")
    kw = _JOIN_KW.get(jspec.get("type", "inner"))
    if kw is None:
        raise QueryError(f"unknown join type: {jspec!r}")
    pairs = [(p, p) if isinstance(p, str) else tuple(p)
             for p in jspec.get("on") or []]
    if not pairs:
        raise QueryError(f"join needs 'on' pairs: {jspec!r}")
    jconds = jspec.get("where") or []
    jt_sql = jt
    if jconds:
        jfilter = " AND ".join(
            _condition_sql(c, type_map, dialect) for c in jconds
        )
        jt_sql = f"(SELECT * FROM {jt} WHERE {jfilter}) AS {jt}"
    # Validate BEFORE the USING early-return: a 'cond' on same-named
    # pairs must refuse here too, never silently drop.
    nonequi = validate_join_nonequi(jspec, pairs)
    same = [l == r for l, r in pairs]
    if all(same):
        keys = ", ".join(_ident(l, dialect) for l, _ in pairs)
        return f" {kw} {jt_sql} USING ({keys})"
    if any(same):
        raise QueryError(
            f"join mixes same-named and differently-named key pairs"
            f" (ambiguous references): {jspec!r}"
        )
    conds = [
        f"{_ident(l, dialect)} = {jt}.{_ident(r, dialect)}"
        for l, r in pairs
    ]
    # Non-equi ON conjuncts (semi/anti/inner/left —
    # validate_join_nonequi): left side unqualified (collision-free by
    # the differently-named pair requirement plus the compiler's
    # right-schema collision guard), right side table-qualified, same
    # as the equi pairs above.
    for ne in nonequi:
        conds.append(
            f"{_ident(ne['left'], dialect)} {_NONEQUI_SQL[ne['op']]} "
            f"{jt}.{_ident(ne['right'], dialect)}")
    return f" {kw} {jt_sql} ON " + " AND ".join(conds)


def _frame_bound_sql(v, side: str) -> str:
    """One frame bound: int ROWS/numeric-RANGE offset, or a parsed
    ("interval", n, unit) RANGE bound — ``INTERVAL n unitS``, a
    spelling valid verbatim in Spark SQL and DuckDB."""
    if v is None:
        return f"UNBOUNDED {'PRECEDING' if side == 'lo' else 'FOLLOWING'}"
    if v == 0:
        return "CURRENT ROW"
    if isinstance(v, tuple):
        _, n, unit = v
        return (f"INTERVAL {abs(n)} {unit.upper()}S "
                f"{'PRECEDING' if n < 0 else 'FOLLOWING'}")
    return f"{-v} PRECEDING" if v < 0 else f"{v} FOLLOWING"


def _window_sql(term: dict, dialect: str,
                type_map: dict[str, T.DataType] | None = None) -> str:
    """Render a window term — same OVER clause text in both dialects.
    Twin of ``compiler._window_column`` (rank family: no frame; ntile(n);
    offset: lag/lead(col, k); aggregates: explicit ROWS/RANGE frame when
    given, else the cumulative default). ``type_map`` mirrors the
    compiler's RANGE order-key dtype refusals (interval bounds need a
    timestamp key, numeric bounds an integral key) so the twins agree
    on which shapes are legal; an untyped key (CTE-view output) is
    left to the compiler's own check."""
    fn, of, pb, specs, out_name, round_to, offset, buckets, frame, nth, \
        default = _parse_window_term(term)
    if frame is not None and frame[0] == "range" and type_map is not None:
        dtype = type_map.get(specs[0][0])
        interval = any(isinstance(b, tuple) for b in frame[1:])
        if dtype is not None:
            if interval and not isinstance(
                    dtype, (T.TimestampType, T.TimestampNTZType)):
                raise QueryError(
                    f"interval range bounds need a timestamp order_by "
                    f"key (got {dtype.simpleString()}): {term!r}")
            if not interval and not isinstance(
                    dtype, (T.ByteType, T.ShortType, T.IntegerType,
                            T.LongType)):
                raise QueryError(
                    f"numeric range bounds need an integral order_by "
                    f"key (got {dtype.simpleString()}): {term!r}")
    part = ", ".join(_ident(c, dialect) for c in pb)
    order = ", ".join(
        f"{_ident(c, dialect)} {d.upper()}"
        + (f" NULLS {n.upper()}" if n else "")
        for c, d, n in specs
    )
    over = f"PARTITION BY {part} ORDER BY {order}"
    if fn == "ntile":
        call = f"ntile({buckets})"
    elif fn in WINDOW_RANK_FNS:
        call = f"{fn}()"
    elif fn in ("lag", "lead"):
        if default is not None:
            call = (f"{fn}({_ident(of, dialect)}, {offset}, "
                    f"{_literal(default, None, dialect)})")
        else:
            call = f"{fn}({_ident(of, dialect)}, {offset})"
    else:
        if fn == "nth_value":
            call = f"nth_value({_ident(of, dialect)}, {nth})"
        elif round_to is not None and fn in ("sum", "avg"):
            # Twin of the compiler's rounded window SUM/AVG (r9):
            # DECIMAL accumulation makes the framed sum association-
            # order-free in both engines; AVG's double quotient rounds
            # through the shared FLOOR half-up formula.
            dec = f"DECIMAL(38, {agg_decimal_scale(round_to)})"
            call = f"SUM(CAST({_ident(of, dialect)} AS {dec}))"
        else:
            call = f"{fn}({_ident(of, dialect)})"
        if frame is not None:
            kind, flo, fhi = frame
            over += (
                f" {kind.upper()} BETWEEN {_frame_bound_sql(flo, 'lo')}"
                f" AND {_frame_bound_sql(fhi, 'hi')}"
            )
        else:
            over += " ROWS UNBOUNDED PRECEDING"
        if round_to is not None and fn in ("sum", "avg"):
            s = f"{call} OVER ({over})"
            if fn == "sum":
                expr = f"CAST(ROUND({s}, {round_to}) AS DOUBLE)"
            else:
                cnt = f"COUNT({_ident(of, dialect)}) OVER ({over})"
                p = f"CAST({float(10 ** round_to)!r} AS DOUBLE)"
                x = f"(CAST({s} AS DOUBLE) / {cnt})"
                expr = f"(FLOOR({x} * {p} + CAST(0.5 AS DOUBLE)) / {p})"
            return f"{expr} AS {_quote_ident(out_name, dialect)}"
    expr = f"{call} OVER ({over})"
    if round_to is not None:
        if fn in WINDOW_RANK_FNS or fn == "ntile":
            # Integer-valued: native ROUND is exact in both engines.
            expr = f"ROUND({expr}, {round_to})"
        else:
            # Raw-value pick: the shared half-up formula (twin of the
            # compiler; all literals DOUBLE-cast — a bare 0.5 parses
            # as DECIMAL in both dialects).
            p = f"CAST({float(10 ** round_to)!r} AS DOUBLE)"
            expr = f"(FLOOR(({expr}) * {p} + CAST(0.5 AS DOUBLE)) / {p})"
    return f"{expr} AS {_quote_ident(out_name, dialect)}"


def assemble_sql(
    q: dict,
    type_map: dict[str, T.DataType],
    dialect: str = "spark",
    ts_is_millis: bool = False,
    cte_names: frozenset = frozenset(),
) -> str:
    """Render a DSL dict as a SQL string for the given dialect.

    ``type_map`` is the augmented table schema (``Catalog.spark_type_map``)
    used for typed literals. For duckdb, derived time columns are
    materialized via a CTE over the raw view when the query touches them.
    ``cte_names`` carries in-scope WITH-view names (a FROM naming one is
    a view reference, never wrapped in the raw-table time CTE).
    """
    if dialect not in ("spark", "duckdb"):
        raise QueryError(f"unknown dialect {dialect!r}")

    from query_planner_optimizer_spark.dsl.compiler import (
        _is_scalar_sel_term,
    )

    if any(_is_scalar_sel_term(t) for t in (q.get("select") or [])) \
            and isinstance(q.get("group_by"), dict):
        # Twin of the compiler's refusal — checked before the
        # grouping-HAVING rewrite below would mis-handle the term.
        raise QueryError(
            "scalar select terms are not supported under "
            "rollup/cube/sets group_by")

    # HAVING under rollup/cube/sets rewrites to a derived-table outer
    # WHERE over the grouping query's OUTPUT (sentinel keys + agg
    # aliases) — the contract the compiler evaluates directly. Spark
    # cannot resolve GROUPING() inside HAVING (GROUPING_COLUMN_
    # MISMATCH) and alias-vs-column resolution in HAVING differs
    # across engines; filtering the projected output is unambiguous
    # in both dialects and reuses the audited derived-FROM path.
    _gm0, _gf0, _gs0 = parse_grouping(q.get("group_by"))         if isinstance(q.get("group_by"), dict) else (None, [], None)
    if _gm0 and q.get("having"):
        from query_planner_optimizer_spark.dsl.compiler import (
            validate_gmode_key_having,
        )

        sel = list(q.get("select") or [])
        sel_names = [
            t["as"] if (_is_post_term(t) or _is_win_term(t))
            else _parse_agg_term(t)[2] if _is_agg_term(t) else t
            for t in sel
        ]
        inner_sel = list(sel)
        by_lower = {k.lower(): k for k in _gf0}
        alias_lower = {n.lower(): n for n in sel_names}
        outer_where = []
        hid = 0
        for cond in q["having"]:
            if isinstance(cond, dict) \
                    and isinstance(cond.get("val"), dict) \
                    and "subquery" in cond["val"]:
                # r12 twin refusal (see compiler gmode having): subtotal
                # rows make a global-threshold compare set-relative.
                raise QueryError(
                    "scalar-subquery HAVING is not supported with "
                    f"rollup/cube/grouping sets: {cond!r}")
            if isinstance(cond, dict) and "agg" in cond:
                term = cond["agg"]
                if "col" in cond:
                    raise QueryError(
                        f"having condition takes 'col' or 'agg', "
                        f"not both: {cond!r}")
                if not isinstance(term, dict) or "as" in term:
                    raise QueryError(
                        f"having 'agg' must be an alias-free aggregate "
                        f"term: {cond!r}")
                alias = f"__hvg{hid}"
                hid += 1
                inner_sel.append({**term, "as": alias})
                outer_where.append(
                    {**{k: v for k, v in cond.items() if k != "agg"},
                     "col": alias})
                continue
            name = str(cond.get("col", ""))
            key = by_lower.get(name.lower())
            if key is not None:
                validate_gmode_key_having(cond, key)
                if key not in inner_sel:
                    inner_sel.append(key)
                outer_where.append(dict(cond, col=key))
            elif name.lower() in alias_lower:
                outer_where.append(
                    dict(cond, col=alias_lower[name.lower()]))
            else:
                raise QueryError(
                    f"having column {name!r} is neither an aggregate "
                    f"alias nor a grouping key")
        inner_q = {k: v for k, v in q.items()
                   if k not in ("having", "order_by", "limit",
                                "offset", "select")}
        inner_q["select"] = inner_sel
        outer_q = {"select": sel_names, "from": inner_q,
                   "where": outer_where}
        for k in ("order_by", "limit", "offset"):
            if k in q:
                outer_q[k] = q[k]
        return assemble_sql(outer_q, type_map, dialect, ts_is_millis,
                            cte_names=cte_names)

    # Named CTEs — twin of the compiler's _ViewCatalog: views render as
    # a WITH clause in definition order, each seeing earlier views
    # (define-before-use) and extending the type map with its inferred
    # output schema; the body (including its subqueries) references
    # them by name.
    withs = q.get("with")
    if withs is not None:
        validate_with_clause(withs)
        tm = dict(type_map)
        names = set(cte_names)
        parts = []
        for name, vq in withs.items():
            # Define-before-use at build time (the compiler twin fails
            # the same way via its eager in-order view compilation).
            forward = _referenced_tables(vq) & (set(withs) - names)
            if forward:
                raise QueryError(
                    f"CTE {name!r} references {sorted(forward)} before "
                    "definition (views see only earlier views)"
                )
            v_sql = assemble_sql(vq, tm, dialect, ts_is_millis,
                                 cte_names=frozenset(names))
            parts.append(f"{name} AS ({v_sql})")
            tm = {**tm, **derived_output_types(vq, tm)}
            names.add(name)
        body_q = {k: v for k, v in q.items() if k != "with"}
        body = assemble_sql(body_q, tm, dialect, ts_is_millis,
                            cte_names=frozenset(names))
        return f"WITH {', '.join(parts)} {body}"

    # Set ops — twin of the compiler's branch. Children render as
    # parenthesized subqueries (each with its own time CTE if needed);
    # the shared order_by/limit applies to the wrapper.
    setop = [kw for kw in SET_OPS if kw in q]
    if setop:
        if len(setop) > 1:
            raise QueryError(f"query mixes set ops: {setop}")
        kw = setop[0]
        children = q[kw]
        if not isinstance(children, list) or len(children) < 2:
            raise QueryError(f"{kw!r} needs a list of at least two queries")
        for other in ("select", "from", "where", "group_by", "having",
                      "join", "distinct"):
            if other in q:
                raise QueryError(f"{kw!r} query cannot also have {other!r}")
        for c in children:
            if isinstance(c, dict) and ("order_by" in c or "limit" in c):
                raise QueryError(f"{kw} children cannot have order_by/limit")

        def _child_out(c: dict) -> list:
            out = []
            for t in c.get("select") or []:
                if _is_expr_term(t):
                    out.append(t.get("as"))
                elif isinstance(t, dict) and "subquery" in t:
                    out.append(t.get("as"))
                elif _is_win_term(t):
                    # r12 fuzz catch (setop × full-outer × windows):
                    # window terms in set-op children previously leaked
                    # the raw term dict into child_out, crashing the
                    # shared ORDER BY alias resolver.
                    out.append(_parse_window_term(t)[4])
                elif _is_agg_term(t):
                    out.append(_parse_agg_term(t)[2])
                else:
                    out.append(t)
            return out

        child_out = _child_out(children[0])
        for c in children[1:]:
            if _child_out(c) != child_out:
                raise QueryError(
                    f"{kw} children project different columns:"
                    f" {child_out} vs {_child_out(c)}"
                )
        joiner = f" {kw.upper()}{' ALL' if q.get('all') else ''} "
        body = joiner.join(
            "(" + assemble_sql(c, type_map, dialect, ts_is_millis,
                               cte_names=cte_names) + ")"
            for c in children
        )
        sql = f"SELECT * FROM ({body}) AS u"
        return _append_order_limit(sql, q, child_out, dialect)

    # SELECT-side scalar subqueries (r7) — twin of the compiler's
    # broadcast-crossJoin wrapper: render the main query WITHOUT the
    # scalar terms as a derived table, interleave inline scalar
    # subselects back into select order in the outer projection, and
    # hang ORDER BY/LIMIT off the wrapper.
    sel0 = q.get("select") or []
    if any(_is_scalar_sel_term(t) for t in sel0):
        from query_planner_optimizer_spark.dsl.compiler import (
            validate_scalar_sel_term,
        )

        inner_q = {k: v for k, v in q.items()
                   if k not in ("order_by", "limit", "offset", "select")}
        inner_q["select"] = [t for t in sel0
                             if not _is_scalar_sel_term(t)]
        if not inner_q["select"]:
            raise QueryError(
                "select cannot consist only of scalar subqueries")
        inner_names = dsl_output_names(inner_q)
        inner_sql = assemble_sql(inner_q, type_map, dialect, ts_is_millis,
                                 cte_names=cte_names)
        parts, out_names = [], []
        for t in sel0:
            if _is_scalar_sel_term(t):
                pairs = validate_scalar_sel_term(t)
                if t["as"] in inner_names or t["as"] in out_names:
                    # Twin of the compiler's df.columns check, which
                    # also sees earlier-attached scalar columns.
                    raise QueryError(
                        f"scalar select alias collides with an output "
                        f"column: {t['as']!r}")
                if pairs:
                    # Correlated subselect in SELECT position: outer
                    # refs qualify by the derived table's alias (the
                    # compiler's LEFT-join decorrelation twin;
                    # correlated COUNT over zero rows is 0 natively in
                    # SQL, matching the engine's coalesce).
                    for ok, _ in pairs:
                        if ok not in inner_names:
                            raise QueryError(
                                f"correlate outer column {ok!r} must "
                                f"be a selected output column: {t!r}")
                    frm = q.get("from", "events")
                    if not isinstance(frm, str):
                        # Mirror the compiler's refusal (compiler.py
                        # correlated-scalar branch): a derived-table
                        # FROM has no stable name for the shadow
                        # alias, and the twins must agree on which
                        # shapes are legal.
                        raise QueryError(
                            "correlated scalar select terms require "
                            f"a named FROM table: {t!r}")
                    expr = "(" + _correlated_subselect_sql(
                        t["subquery"], pairs, "__sel_outer", type_map,
                        dialect, shadow_table=frm) + ")"
                else:
                    sub_sql = assemble_sql(t["subquery"], type_map,
                                           dialect, ts_is_millis,
                                           cte_names=cte_names)
                    expr = f"({sub_sql})"
                if t.get("round") is not None:
                    # Shared half-up formula (twin of the compiler);
                    # the DOUBLE cast pins integral scalars in both
                    # dialects.
                    expr = f"CAST({_rs(expr, t['round'])} AS DOUBLE)"
                parts.append(f"{expr} AS {_ident(t['as'], dialect)}")
                out_names.append(t["as"])
            else:
                n = (t["as"] if (_is_post_term(t) or _is_win_term(t)
                                 or _is_expr_term(t))
                     else _parse_agg_term(t)[2] if _is_agg_term(t) else t)
                parts.append(_ident(n, dialect))
                out_names.append(n)
        sql = (f"SELECT {', '.join(parts)} FROM ({inner_sql}) "
               f"AS __sel_outer")
        return _append_order_limit(sql, q, out_names, dialect)

    # Post-aggregation expressions (TPC-H Q14 ratio-of-sums): render
    # the aggregate query as an inner derived table, compute the post
    # expressions over its output aliases in an outer SELECT, and hang
    # ORDER BY/LIMIT off the outer query — the twin of the compiler's
    # projection over the aggregated frame.
    post_terms = [t for t in (q.get("select") or []) if _is_post_term(t)]
    if post_terms:
        from query_planner_optimizer_spark.dsl.compiler import (
            validate_post_term,
        )

        inner_select = [t for t in q["select"] if not _is_post_term(t)]
        if not any(_is_agg_term(t) for t in inner_select):
            raise QueryError(
                f"post-aggregation terms require aggregates: {post_terms[0]!r}"
            )
        # offset must hang off the OUTER query with order_by/limit —
        # leaving it on the inner aggregate tripped the inner call's
        # "offset requires order_by" refusal (r8 longfuzz catch:
        # ungrouped post-term + total sort + LIMIT/OFFSET).
        inner_q = {k: v for k, v in q.items()
                   if k not in ("order_by", "limit", "offset", "select")}
        inner_q["select"] = inner_select
        inner_sql = assemble_sql(inner_q, type_map, dialect, ts_is_millis,
                                 cte_names=cte_names)
        # Under rollup/cube/sets grouping the inner key outputs are the
        # STRING sentinels — arithmetic over them is undefined, so post
        # leaves are restricted to aggregate aliases (twin of the
        # compiler's gmode avail).
        _gm, _gf, _gs = parse_grouping(q.get("group_by"))
        avail = [_parse_agg_term(t)[2] if _is_agg_term(t) else t
                 for t in inner_select
                 if not _is_win_term(t)
                 and not (_gm and not _is_agg_term(t))]

        def _post_sql(e) -> str:
            if isinstance(e, str):
                return _quote_ident(e, dialect)
            if isinstance(e, (int, float)):
                return repr(e)
            op = ARITH_OPS[e["op"]]
            out = _post_sql(e["args"][0])
            for a in e["args"][1:]:
                out = f"({out} {op} {_post_sql(a)})"
            return out

        outer_terms, final_names = [], []
        for t in q["select"]:
            if _is_post_term(t):
                validate_post_term(t, avail)
                expr = _post_sql(t["post"])
                if t.get("round") is not None:
                    expr = _rs(expr, t["round"])
                outer_terms.append(
                    f"{expr} AS {_quote_ident(t['as'], dialect)}")
                final_names.append(t["as"])
            else:
                n = _parse_agg_term(t)[2] if _is_agg_term(t) else t
                outer_terms.append(_quote_ident(n, dialect))
                final_names.append(n)
        sql = (f"SELECT {', '.join(outer_terms)} FROM ({inner_sql}) AS __q")
        return _append_order_limit(sql, q, final_names, dialect)

    table = q.get("from", "events")
    derived_from = isinstance(table, dict)
    inner_from_sql = None
    if derived_from:
        # Derived-table FROM: render the inner query as a parenthesized
        # subselect and type the outer query's references off its
        # inferred output schema (twin of the compiler recursing into
        # compile_query and reading the frame's columns).
        validate_derived_from(table)
        inner_from_sql = assemble_sql(table, type_map, dialect, ts_is_millis,
                                      cte_names=cte_names)
        type_map = {**type_map, **derived_output_types(table, type_map)}

    gmode, gflat, gsets = parse_grouping(q.get("group_by"))
    _sentinel_type = "VARCHAR" if dialect == "duckdb" else "STRING"

    def _sentinel_case(key: str) -> str:
        k = _ident(key, dialect)
        return (f"CASE WHEN GROUPING({k}) = 1 THEN 'ALL' "
                f"ELSE COALESCE(CAST({k} AS {_sentinel_type}), "
                f"'NULL') END")

    select_terms = []
    out_names = []
    for term in q.get("select") or []:
        if _is_expr_term(term):
            if "as" not in term:
                raise QueryError(f"expression projection needs an alias: {term}")
            if q.get("group_by") or any(
                _is_agg_term(t) for t in q.get("select") or []
            ):
                raise QueryError(
                    f"expression projections are row-level only: {term}"
                )
            rendered = _num_expr_sql(term["expr"], dialect, type_map)
            if term.get("round") is not None:
                # Shared half-up formula, twin of the compiler's
                # rounded expr projection (always DOUBLE).
                rendered = _rs(rendered, int(term["round"]))
            select_terms.append(
                f"{rendered} AS {_quote_ident(term['as'], dialect)}"
            )
            out_names.append(term["as"])
        elif _is_win_term(term):
            if q.get("group_by") or any(
                _is_agg_term(t) for t in q.get("select") or []
            ):
                raise QueryError(f"window projections are row-level only: {term}")
            select_terms.append(_window_sql(term, dialect, type_map))
            out_names.append(_parse_window_term(term)[4])
        elif _is_agg_term(term):
            select_terms.append(_agg_sql(term, dialect, type_map))
            out_names.append(_parse_agg_term(term)[2])
        else:
            if gmode:
                # Twin of the compiler's grouping sentinel: 'ALL' for
                # subtotal rows (GROUPING()=1), 'NULL' for data-null
                # keys, else the stringified value.
                select_terms.append(
                    f"{_sentinel_case(term)} "
                    f"AS {_quote_ident(term, dialect)}")
            else:
                select_terms.append(_ident(term, dialect))
            out_names.append(term)
    if not select_terms:
        raise QueryError("query has no select list")

    referenced = set()

    def _collect_cols(cond: dict) -> None:
        for kw in ("or", "and"):
            for b in cond.get(kw) or []:
                _collect_cols(b)
        if "not" in cond:
            _collect_cols(cond["not"])
        if cond.get("col") is not None:
            referenced.add(cond["col"])
        if cond.get("col2") is not None:
            referenced.add(cond["col2"])
        if _is_exists_leaf(cond):
            # Outer correlate columns are referenced by the rendered
            # EXISTS predicate — a derived-time column (day/week/...)
            # must trigger the CTE wrap exactly like a plain filter on
            # it (r8 review catch: the oracle rendered `events.day`
            # over the raw parquet view and crashed at bind time where
            # the engine answered).
            _sub, pairs = validate_exists_leaf(cond)
            referenced.update(ok for ok, _ik, _pop in pairs)

    for term in q.get("select") or []:
        if _is_expr_term(term):
            referenced.update(expr_columns(term["expr"]))
        elif _is_win_term(term):
            _fn, of, pb, specs, *_rest = _parse_window_term(term)
            referenced.update(pb)
            referenced.update(c for c, _d, _n in specs)
            if of:
                referenced.add(of)
        elif _is_agg_term(term):
            parsed = _parse_agg_term(term)
            if isinstance(parsed[1], dict):
                referenced.update(expr_columns(parsed[1]))
            else:
                referenced.add(parsed[1])
            for c in parsed[4]:  # FILTER conds may be boolean trees
                _collect_cols(c)
        else:
            referenced.add(term)

    for cond in q.get("where") or []:
        _collect_cols(cond)
    referenced.update(gflat)

    if derived_from:
        from_clause = f"({inner_from_sql}) AS __src"
    else:
        from_clause = table
        if (dialect == "duckdb" and table not in cte_names
                and referenced & set(DERIVED_TIME_COLUMNS)):
            from_clause = (
                f"({duckdb_time_cte(table, ts_is_millis=ts_is_millis)})"
                f" AS {table}"
            )

    for jspec in q.get("join") or []:
        from_clause += _join_clause_sql(jspec, type_map, dialect)

    prefix = "SELECT DISTINCT" if q.get("distinct") else "SELECT"
    if q.get("distinct") and (q.get("group_by") or any(
        _is_agg_term(t) for t in q.get("select") or []
    )):
        raise QueryError("'distinct' with aggregation is redundant")
    sql = f"{prefix} {', '.join(select_terms)} FROM {from_clause}"

    conds = q.get("where") or []
    where_sql = ""
    if conds:
        if any(_is_exists_leaf(c) for c in conds):
            validate_exists_join_types(q)  # twin of the compiler's
        outer = None if derived_from else table
        ex_outer = "__src" if derived_from else table
        where_sql = " WHERE " + " AND ".join(
            _membership_sql(c, type_map, dialect, ts_is_millis,
                            cte_names=cte_names)
            if _is_membership_leaf(c)
            else _exists_sql(c, type_map, dialect, ts_is_millis,
                             ex_outer, cte_names=cte_names)
            if _is_exists_leaf(c)
            else _condition_sql(c, type_map, dialect, outer_table=outer,
                                cte_names=cte_names)
            for c in conds
        )
        sql += where_sql

    group_by = [] if gmode else (q.get("group_by") or [])
    if gmode:
        cols = ", ".join(_ident(c, dialect) for c in gflat)
        if gmode == "rollup":
            sql += f" GROUP BY ROLLUP({cols})"
        elif gmode == "cube":
            sql += f" GROUP BY CUBE({cols})"
        else:
            sets_sql = ", ".join(
                "(" + ", ".join(_ident(c, dialect) for c in st) + ")"
                for st in gsets)
            sql += f" GROUP BY GROUPING SETS ({sets_sql})"
        # SQL-standard empty-input semantics: every () grouping set
        # emits one row even over EMPTY input. DuckDB does this
        # natively; SPARK's rollup/cube return no rows, so the spark
        # dialect appends the statically-known ()-row gated on
        # COUNT(*)=0 over the same FROM/WHERE — the exact twin of the
        # compiler's marker union.
        n_empty = (1 if gmode in ("rollup", "cube")
                   else sum(1 for st in gsets if not st))
        if dialect == "spark" and n_empty:
            statics = []
            for t in q.get("select") or []:
                if _is_agg_term(t):
                    fname, col, out_name, round_to, _f = _parse_agg_term(t)
                    if fname in ("COUNT", "COUNT_DISTINCT"):
                        # Both are 0 (not NULL) over empty input — the
                        # r7 fuzzer contract the engine's marker union
                        # and DuckDB already follow (an r8 exists-draw
                        # catch: NOT EXISTS can empty the input, and
                        # this twin emitted NULL for COUNT_DISTINCT).
                        statics.append(
                            f"CAST(0 AS BIGINT) AS "
                            f"{_quote_ident(out_name, dialect)}")
                    else:
                        ty = _agg_out_type(fname, col, round_to,
                                           type_map).simpleString()
                        statics.append(
                            f"CAST(NULL AS {ty.upper()}) AS "
                            f"{_quote_ident(out_name, dialect)}")
                else:
                    statics.append(
                        f"'ALL' AS {_quote_ident(t, dialect)}")
            marker = (f"SELECT {', '.join(statics)} FROM "
                      f"(SELECT COUNT(*) AS __n0 FROM {from_clause}"
                      f"{where_sql}) AS __mrk WHERE __n0 = 0")
            sql = "(" + sql + ")" + (" UNION ALL " + marker) * n_empty
    elif group_by:
        sql += " GROUP BY " + ", ".join(_ident(c, dialect) for c in group_by)

    # HAVING — conditions over aggregate aliases (re-expanded to their
    # expressions; see _render_cond) or group keys. Twin of the
    # compiler's post-aggregation filter.
    having = q.get("having") or []
    if having:
        agg_expr_by_alias: dict[str, str] = {}
        for term in q.get("select") or []:
            if _is_agg_term(term):
                expr, alias = _agg_expr_sql(term, dialect, type_map)
                agg_expr_by_alias[alias.lower()] = expr
        # Group keys resolve case-insensitively, matching the compiler
        # twin's _resolve_order_col behavior.
        keys_by_lower = {k.lower(): k for k in group_by}

        def _having_scalar_sql(expr: str, cond: dict) -> str:
            # r12: UNCORRELATED scalar-subquery threshold in HAVING
            # (TPC-H Q11's fraction-of-global) — renders the nested
            # SELECT natively; the compiler twin broadcast-crossJoins
            # the one-row scalar onto the aggregated frame. Correlated
            # HAVING refuses in both twins (the aggregated frame has
            # no table name to qualify outer references by).
            from query_planner_optimizer_spark.dsl.compiler import (
                SCALAR_SUBQUERY_OPS,
                validate_subquery_val,
            )

            val = cond["val"]
            op = cond.get("op")
            if op not in SCALAR_SUBQUERY_OPS or op not in _OP_SQL:
                raise QueryError(
                    f"op {op!r} does not support a scalar subquery: "
                    f"{cond!r}")
            if validate_subquery_val(val):
                raise QueryError(
                    f"correlated subqueries are not supported in "
                    f"HAVING: {cond!r}")
            sub_sql = assemble_sql(val["subquery"], type_map, dialect,
                                   ts_is_millis, cte_names=cte_names)
            rhs = f"({sub_sql})"
            if val.get("scale") is not None:
                rhs = f"({_literal(val['scale'], None, dialect)} * {rhs})"
            return f"{expr} {_OP_SQL[op]} {rhs}"

        parts = []
        for cond in having:
            if isinstance(cond, dict) and "agg" in cond:
                # Inline-aggregate HAVING (aggregate not in SELECT) —
                # renders the bare aggregate expression directly; the
                # compiler twin computes it as a hidden dropped column.
                if "col" in cond:
                    raise QueryError(
                        f"having condition takes 'col' or 'agg', "
                        f"not both: {cond!r}"
                    )
                term = cond["agg"]
                if not isinstance(term, dict) or "as" in term:
                    raise QueryError(
                        f"having 'agg' must be an alias-free aggregate "
                        f"term: {cond!r}"
                    )
                expr, _ = _agg_expr_sql(
                    {**term, "as": "__hv"}, dialect, type_map
                )
                if isinstance(cond.get("val"), dict) \
                        and "subquery" in cond["val"]:
                    parts.append(_having_scalar_sql(expr, cond))
                else:
                    parts.append(_render_cond(expr, cond, None, dialect))
                continue
            name = str(cond.get("col"))
            expr = agg_expr_by_alias.get(name.lower())
            if expr is not None:
                if isinstance(cond.get("val"), dict) \
                        and "subquery" in cond["val"]:
                    parts.append(_having_scalar_sql(expr, cond))
                else:
                    parts.append(_render_cond(expr, cond, None, dialect))
            elif name.lower() in keys_by_lower:
                resolved = dict(cond, col=keys_by_lower[name.lower()])
                parts.append(_condition_sql(resolved, type_map, dialect,
                                            cte_names=cte_names))
            else:
                raise QueryError(
                    f"having column {name!r} is neither an aggregate"
                    f" alias nor a group key"
                )
        sql += " HAVING " + " AND ".join(parts)

    return _append_order_limit(sql, q, out_names, dialect)


def _append_order_limit(
    sql: str, q: dict, out_names: list[str], dialect: str
) -> str:
    """Shared tail of every query form: ORDER BY + LIMIT clauses."""
    order_by = q.get("order_by") or []
    if order_by:
        parts = []
        for spec in order_by:
            nulls = None
            if isinstance(spec, str):
                name, direction = spec, "ASC"
            else:
                _check_order_spec_keys(spec)
                name, direction = spec.get("col"), (spec.get("dir") or "asc").upper()
                nulls = spec.get("nulls")
            if nulls is not None and nulls not in ("first", "last"):
                raise QueryError(f"bad nulls placement: {spec!r}")
            # Resolve aggregate-alias spellings ("AVG(total_price)") to
            # the output name, case-insensitively (reference
            # ``query_engine.py:506-524``). Unresolvable names raise at
            # build time, mirroring compiler._resolve_order_col — the
            # oracle path must fail the same way the engine path does.
            resolved = next(
                (n for n in out_names if n == name),
                next((n for n in out_names if n.lower() == name.lower()), None),
            )
            if resolved is None:
                raise QueryError(
                    f"order_by column {name!r} not in result columns {out_names}"
                )
            # Explicit NULLS placement — Spark's default (ASC→NULLS
            # FIRST) and DuckDB's (NULLS LAST) DISAGREE, so sorting a
            # nullable key portably requires spelling it out; the
            # compiler twin maps to asc_nulls_first/…
            tail = f" NULLS {nulls.upper()}" if nulls else ""
            parts.append(f"{_quote_ident(resolved, dialect)} {direction}{tail}")
        sql += " ORDER BY " + ", ".join(parts)

    if q.get("limit") is not None:
        sql += f" LIMIT {int(q['limit'])}"
    offset = q.get("offset")
    if offset is not None:
        # Same validation as the compiler twin: OFFSET without a total
        # ORDER BY skips arbitrary rows. `LIMIT n OFFSET m` / bare
        # `OFFSET m` parse identically in Spark SQL (3.4+) and DuckDB.
        if not isinstance(offset, int) or isinstance(offset, bool) \
                or offset < 0:
            raise QueryError(f"bad offset: {offset!r}")
        if not order_by:
            raise QueryError("'offset' requires an order_by")
        sql += f" OFFSET {offset}"
    return sql
