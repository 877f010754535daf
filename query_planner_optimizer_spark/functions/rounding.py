"""Engine-portable rounding idioms (the r8 boundary-exactness contract).

Native ``ROUND(double, r)`` is ENGINE-IMPLEMENTATION-DEFINED exactly at
half-boundaries: Spark rounds the double's exact binary expansion
(BigDecimal HALF_UP), DuckDB multiply-rounds — the r8 longfuzz campaign
produced a real divergence (0.024063 vs 0.024062) from low-precision
source data through an n-denominator average. Every differential
engine+oracle pair that rounds a DOUBLE therefore uses the shared
``FLOOR(x·10^r + 0.5) / 10^r`` formula on BOTH sides: it is pure IEEE
multiply/add/floor/divide — correctly-rounded ops on identical inputs —
so the twins agree bit-for-bit by construction, and it equals native
ROUND everywhere off the boundary.

Semantic pin (documented, deliberate): the formula rounds half-values
toward +infinity — ``-0.125`` at 2dp gives ``-0.12`` where SQL ROUND's
half-away-from-zero gives ``-0.13``. Both twins compute the identical
value, which is the contract; the direction on negative halves is a
convention, chosen because a single branch-free formula keeps the SQL
spelling portable across dialects.

Rounding a DECIMAL needs none of this: both engines round decimals
half-away-from-zero exactly, so ``ROUND(SUM(CAST(x AS DECIMAL)), r)``
stays native — see ``compiler.agg_decimal_scale`` for why the
accumulator scale is 12.

SQL-literal gotcha: a bare ``0.5`` parses as DECIMAL in BOTH dialects,
dragging the whole expression into engine-specific decimal arithmetic —
the SQL spelling must CAST every literal to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, round_to: int) -> Column:
    """``FLOOR(col·10^r + 0.5)/10^r`` over a DOUBLE column — the
    engine-side half of the shared formula (bit-identical to
    :func:`sql_round_half_up` on the same input in either dialect)."""
    p = float(10 ** round_to)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def sql_round_half_up(expr: str, round_to: int) -> str:
    """The SQL spelling of :func:`round_half_up`, valid verbatim in
    Spark SQL and DuckDB (all literals DOUBLE-cast — see module doc)."""
    p = f"CAST({float(10 ** round_to)!r} AS DOUBLE)"
    return f"(FLOOR(({expr}) * {p} + CAST(0.5 AS DOUBLE)) / {p})"
