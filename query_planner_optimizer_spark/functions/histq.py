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


def quantile_from_cums(cums: list[Column], q: float, lo: float,
                       hi: float, nbins: int) -> Column:
    """Estimate from cumulative-count Columns (exact integers).

    The twin of :func:`quantile_from_cums_sql` — keep the expression
    trees structurally identical (same ops, same order, same literals)
    so exact integer inputs produce bit-equal doubles.
    """
    w = (hi - lo) / nbins
    total = cums[-1].cast("double")
    target = total * F.lit(q)
    chain = None
    for i in range(nbins):
        edge = lo + i * w
        cumprev = (F.lit(0.0) if i == 0 else cums[i - 1].cast("double"))
        cnt = cums[i].cast("double") - cumprev
        est = F.lit(edge) + ((target - cumprev) / cnt) * F.lit(w)
        cond = cums[i].cast("double") >= target
        chain = F.when(cond, est) if chain is None else chain.when(cond, est)
    return F.when(total > 0, chain)


def quantile_from_cums_sql(cums: list[str], q: float, lo: float,
                           hi: float, nbins: int) -> str:
    """SQL twin of :func:`quantile_from_cums`; ``cums`` are integer
    cumulative-count SQL expressions."""
    w = (hi - lo) / nbins
    total = f"CAST({cums[-1]} AS DOUBLE)"
    target = f"({total} * {q!r})"
    whens = []
    for i in range(nbins):
        edge = lo + i * w
        cumprev = "0.0" if i == 0 else f"CAST({cums[i - 1]} AS DOUBLE)"
        cnt = f"(CAST({cums[i]} AS DOUBLE) - {cumprev})"
        est = f"({edge!r} + ((({target} - {cumprev}) / {cnt}) * {w!r}))"
        whens.append(
            f"WHEN CAST({cums[i]} AS DOUBLE) >= {target} THEN {est}")
    cascade = "CASE " + " ".join(whens) + " END"
    return f"CASE WHEN {total} > 0 THEN {cascade} END"
