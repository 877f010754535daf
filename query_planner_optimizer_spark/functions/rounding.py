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

Magnitude bound (r10, advisor note): Spark's ``FLOOR(double)`` returns
BIGINT (saturating at ±2^63−1 ≈ ±9.22e18) while DuckDB's returns
DOUBLE, so the bit-for-bit twin guarantee holds only while
``|x·10^r + 0.5| < 2^63``, i.e. ``|x| ≲ 9.2e18 / 10^r`` (9.2e12 at
6dp). Beyond that Spark saturates where DuckDB keeps the (already
integer-valued — every double ≥ 2^53 is an integer, so rounding is the
identity there) double. All repo twins operate far inside the bound:
source measures are ≤1e6-scale, SUM paths accumulate in DECIMAL and
round natively, and the fuzz value strategies draw |x| ≤ 1e6 (pinned in
``tests/test_property_dsl.py``). We deliberately do NOT cast FLOOR's
result back to DOUBLE to widen the bound: ``CAST(FLOOR(...) AS DOUBLE)``
changes nothing inside the bound (longs ≤ 2^53 are exact doubles, and
2^53..2^63 longs re-quantize identically on both engines) but would
imply a guarantee past 2^63 that saturation already broke.
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
