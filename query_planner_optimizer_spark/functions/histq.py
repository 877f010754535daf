"""Histogram-sketch quantiles — the MERGEABLE percentile path.

Order statistics don't re-aggregate (``AGG_FUNCS['MEDIAN']`` is never
rollup-routable), so serving p50/p90/p99 from pre-aggregates needs a
mergeable summary. Spark's ``percentile_approx`` sketch has no SQL-level
partial-merge surface, so the engine uses the classic fixed-bin count
histogram instead: per-bin counts are plain integers that merge by
elementwise addition — associative, order-independent, and exactly
replayable in ANSI SQL, which buys the same full-circle-oracle property
the DECIMAL-sum partials have (contrast the HLL path, whose
DataSketches estimate can only be bound-gated).

Estimator contract (deterministic, identical in every engine):

- Bins: ``nbins`` equal widths over ``[lo, hi)``; values clamp to the
  edge bins, NULLs drop. The estimate is exact-integer cumulative
  counts combined by one IEEE-double interpolation, so any two engines
  computing it over the same rows agree BITWISE.
- ``cum_i`` = #values in bins 0..i (= #values with clamped index ≤ i).
- quantile(q) = lower edge of the first bin where ``cum_i ≥ q·total``
  plus linear interpolation within the bin. Error ≤ one bin width for
  in-range data (clamped outliers degrade only the affected tail).

``HIST_BINS`` is the single source of truth for every surface (scan
aggregate, rollup build, partial merge, routed serve, SQL oracle) — a
bins change is a rollup FORMAT change: rebuild hist rollups with it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: column name -> (lo, hi, nbins). Part of the rollup format version.
HIST_BINS: dict[str, tuple[float, float, int]] = {
    "value": (0.0, 500.0, 50),
    # TPC-H lineitem prices: ~900..105000 across SFs (price formula is
    # SF-independent); [0, 110k) covers with headroom, w = 2200.
    "l_extendedprice": (0.0, 110_000.0, 50),
}

#: DSL aggregate names -> quantile level. Named levels (not a free q
#: parameter) keep the DSL aggregate-term grammar parameter-free.
APPROX_QUANTILES: dict[str, float] = {
    "APPROX_P50": 0.5,
    "APPROX_P90": 0.9,
    "APPROX_P99": 0.99,
}


def bin_width(col: str) -> float:
    lo, hi, nbins = HIST_BINS[col]
    return (hi - lo) / nbins


def bin_index_col(x: Column, lo: float, hi: float, nbins: int) -> Column:
    """Clamped bin index of ``x`` — NULL for NULL x, EXPLICITLY: Spark's
    ``least``/``greatest`` SKIP null arguments (SQL-standard n-ary
    semantics), so an unguarded ``least(greatest(NULL, 0), n-1)`` is 0,
    silently counting NULL (or FILTER-nulled) values into bin 0. The
    hypothesis fuzzer caught this as a filtered-ungrouped divergence;
    the guard makes NULLs genuinely drop in both twins."""
    w = (hi - lo) / nbins
    raw = F.floor((x - F.lit(lo)) / F.lit(w)).cast("bigint")
    clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1))
    return F.when(x.isNotNull(), clamped)


def bin_index_sql(x: str, lo: float, hi: float, nbins: int) -> str:
    """SQL twin of :func:`bin_index_col` — same explicit NULL guard
    (DuckDB's GREATEST/LEAST also skip NULLs)."""
    w = (hi - lo) / nbins
    return (f"CASE WHEN {x} IS NOT NULL THEN "
            f"LEAST(GREATEST(CAST(FLOOR(({x} - {lo!r}) / {w!r}) "
            f"AS BIGINT), 0), {nbins - 1}) END")


#: Column-object caches: building ~50-element array expressions costs
#: ~1 s of py4j round trips per compile; Spark Columns are immutable
#: unresolved expression trees, so reusing them across plans is safe
#: (each plan re-resolves the attribute references). Keyed on the
#: STRUCTURAL inputs (column names + bins + level).
_CUM_AGGS_CACHE: dict[tuple, list[Column]] = {}
_EST_CACHE: dict[tuple, Column] = {}


def quantile_est_cached(cum_names: list[str], q: float, lo: float,
                        hi: float, nbins: int) -> Column:
    """Cached estimator over named cumulative-count columns."""
    key = (tuple(cum_names), q, lo, hi, nbins)
    if key not in _EST_CACHE:
        _EST_CACHE[key] = quantile_from_cums(
            [F.col(n) for n in cum_names], q, lo, hi, nbins)
    return _EST_CACHE[key]


def routed_quantile_cached(hist_col: str, q: float, lo: float,
                           hi: float, nbins: int) -> Column:
    """Cached routed-path estimate from a stored hist partial column:
    nbins PLAIN per-bin sums (array-index aggregates — no lambdas, so
    analysis stays cheap and identical sums dedupe across quantile
    levels), then ONE nested-lambda fold turns the per-bin totals into
    the cumulative array the shared estimator core reads. Same exact
    integers as the scan form's direct cums ⇒ bit-equal estimates."""
    key = ("routed", hist_col, q, lo, hi, nbins)
    if key not in _EST_CACHE:
        ck = ("perbin", hist_col, nbins)
        if ck not in _CUM_AGGS_CACHE:
            _CUM_AGGS_CACHE[ck] = [
                F.sum(F.col(hist_col)[i]) for i in range(nbins)]
        per_bin = F.array(*_CUM_AGGS_CACHE[ck])
        cums_d = F.transform(
            F.sequence(F.lit(1), F.lit(nbins)),
            lambda j: F.aggregate(
                F.slice(per_bin, F.lit(1), j),
                F.lit(0).cast("bigint"), lambda a, x: a + x
            ).cast("double"))
        _EST_CACHE[key] = _est_from_double_array(cums_d, q, lo, hi, nbins)
    return _EST_CACHE[key]


def quantile_from_cums(cums: list[Column], q: float, lo: float,
                       hi: float, nbins: int) -> Column:
    """Estimate from cumulative-count Columns (exact integers).

    Array-based, NOT a WHEN-cascade: the chosen bin is
    ``array_position`` over the boolean-transformed cum array, and the
    bin edge is computed arithmetically from that position. A 50-branch
    CASE cascade inlines to >64 KB of generated Java — janino then
    fails, and every execution pays the attempt-and-fall-back (~1.5 s
    per cascade measured at sf0.1); this form codegens in a few hundred
    bytes. Keep it structurally identical to
    :func:`quantile_from_cums_sql` (same ops, same order, same
    literals) so exact integer inputs produce bit-equal doubles.
    """
    arr = F.array(*[c.cast("double") for c in cums])
    return _est_from_double_array(arr, q, lo, hi, nbins)


def _est_from_double_array(arr: Column, q: float, lo: float,
                           hi: float, nbins: int) -> Column:
    """Shared estimator core over a double cumulative-count array —
    identical arithmetic regardless of how the array was assembled, so
    scan, routed, and oracle agree bitwise on the same integers."""
    w = (hi - lo) / nbins
    total = F.element_at(arr, nbins)
    target = total * F.lit(q)
    # first bin with cum >= target; exists whenever total > 0 (the last
    # element IS total and target = q·total <= total for q <= 1)
    pos = F.array_position(
        F.transform(arr, lambda c: c >= target), F.lit(True)
    ).cast("int")
    cumprev = (F.when(pos == 1, F.lit(0.0))
               .otherwise(F.element_at(arr, pos - 1)))
    cnt = F.element_at(arr, pos) - cumprev
    edge = F.lit(float(lo)) + (pos - 1).cast("double") * F.lit(w)
    est = edge + ((target - cumprev) / cnt) * F.lit(w)
    return F.when(total > 0, est)


def quantile_from_cums_sql(cums: list[str], q: float, lo: float,
                           hi: float, nbins: int,
                           dialect: str = "duckdb") -> str:
    """SQL twin of :func:`quantile_from_cums`; ``cums`` are integer
    cumulative-count SQL expressions. Dialect-aware spellings of the
    same 1-based array ops (semantics identical, so the computed
    doubles are bit-equal across dialects)."""
    w = (hi - lo) / nbins
    if dialect == "duckdb":
        mk_arr = "[{items}]"
        extract, position, transform = ("list_extract", "list_position",
                                        "list_transform")
    else:
        mk_arr = "array({items})"
        extract, position, transform = ("element_at", "array_position",
                                        "transform")
    arr = mk_arr.format(items=", ".join(
        f"CAST({c} AS DOUBLE)" for c in cums))
    total = f"{extract}({arr}, {nbins})"
    target = f"({total} * {q!r})"
    pos = (f"CAST({position}({transform}({arr}, "
           f"c -> c >= {target}), true) AS INTEGER)")
    cumprev = (f"(CASE WHEN {pos} = 1 THEN 0.0 "
               f"ELSE {extract}({arr}, {pos} - 1) END)")
    cnt = f"({extract}({arr}, {pos}) - {cumprev})"
    edge = f"({lo!r} + CAST({pos} - 1 AS DOUBLE) * {w!r})"
    est = f"({edge} + ((({target} - {cumprev}) / {cnt}) * {w!r}))"
    return f"CASE WHEN {total} > 0 THEN {est} END"
