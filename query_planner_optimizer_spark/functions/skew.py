"""Skew-aware aggregation: two-phase salted groupBy.

When a grouping key is heavily skewed (one key holds a large share of
all rows — e.g. a bot user_id, an empty-string country), a plain
``groupBy(key)`` sends every row of the hot key to ONE reducer: at
100 TB that task runs for hours while the rest of the cluster idles.
AQE's skew handling only splits skewed *join* partitions, not
aggregations, so the classic fix is salting:

    phase 1: groupBy(key, salt = pmod(hash(random-ish col), S))
             → S partial aggregates per key (map-side combinable);
    phase 2: groupBy(key) over the partials → final result.

Only re-aggregable measures are offered (sum / count / min / max — the
same algebra the rollup router relies on); AVG callers combine
sum+count themselves.

For low-cardinality keys this is also the right way to avoid a
single-reducer bottleneck even without skew (e.g. groupBy(type) with 4
distinct values on 32+ cores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: measure -> (phase-1 partial, phase-2 combiner)
_ALGEBRA = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_groupby_agg(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str]],
    salt_buckets: int = 64,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``measures``: out_name → (func, col) with func in sum|count|min|max
    and col a column name or "*" (count only).
    ``salt_col``: column whose hash spreads the hot key's rows; defaults
    to a uniform random-free spread via ``spark_partition_id()`` (stable
    within a task, uniform across tasks — deterministic result either
    way because the measures are commutative).
    """
    salt = (
        F.pmod(F.hash(F.col(salt_col)), F.lit(salt_buckets))
        if salt_col
        else F.pmod(F.spark_partition_id(), F.lit(salt_buckets))
    )
    partial_exprs = []
    final_exprs = []
    for out, (func, col) in measures.items():
        if func not in _ALGEBRA:
            raise ValueError(f"measure {func!r} is not re-aggregable")
        p, f = _ALGEBRA[func]
        src = F.lit(1) if col == "*" else F.col(col)
        partial_exprs.append(p(src).alias(f"__p_{out}"))
        final_exprs.append(f(F.col(f"__p_{out}")).alias(out))
    return (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_exprs)
        .groupBy(*keys)
        .agg(*final_exprs)
    )
