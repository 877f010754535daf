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
from pyspark.sql import types as T

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


def detect_hot_keys(
    df: DataFrame, key: str, share_threshold: float = 0.05,
    max_keys: int = 64,
) -> list:
    """Keys holding ≥ ``share_threshold`` of the rows (NULLs excluded —
    they never match an equi-join anyway). The detection groupBy is
    itself skew-safe: COUNT partials combine map-side, so the hot key
    contributes ONE row per task to the shuffle, not its row count. The
    collect is bounded by construction: at most 1/share_threshold keys
    can clear the bar (≤ 20 at the 5% default), capped at ``max_keys``.
    At 100 TB you would run this on a sample; exact counting here keeps
    the semantics test deterministic."""
    counts = df.filter(F.col(key).isNotNull()).groupBy(key).agg(
        F.count(F.lit(1)).alias("__n")
    )
    total = counts.agg(F.sum("__n")).first()[0] or 0
    if not total:
        return []
    rows = (
        counts.filter(F.col("__n") >= float(total) * share_threshold)
        .orderBy(F.col("__n").desc(), F.col(key))
        .limit(max_keys)
        .collect()
    )
    return [r[0] for r in rows]


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 32,
    hot_keys: list | None = None,
    share_threshold: float = 0.05,
) -> DataFrame:
    """Skew-safe inner equi-join: salt the HOT keys of the fact side,
    replicate only the matching dim rows per salt bucket, and join the
    cold remainder plainly — ``plain ∪ salted`` is row-for-row equal to
    ``fact ⋈ dim`` (proved by the ``dsl_join_salted`` oracle entry and a
    planted-skew pytest).

    Why: a shuffle join partitions by hash(key), so one 90%-share key
    lands its entire row mass on ONE reducer — at 100 TB that task runs
    for hours. Salting spreads the hot key over ``salt_buckets`` tasks
    at the cost of replicating the hot keys' dim rows ``salt_buckets``
    times (dim rows for cold keys are NOT replicated — selective
    salting, unlike blanket key-salting). Prefer ``broadcast(dim)`` when
    the whole dim fits an executor; salting is for the middle regime —
    dim too big to broadcast, fact skewed. AQE's skew-join split covers
    sort-merge joins at runtime; salting also covers downstream
    aggregations pinned to the same key and engines/paths AQE doesn't
    reach.

    The salt itself is ``pmod(hash(fact row id surrogate), S)`` — any
    spread works since the join result is salt-independent; we hash the
    fact's OTHER columns via ``spark_partition_id`` + a per-row counter
    to avoid requiring a unique id column.
    """
    if hot_keys is None:
        hot_keys = detect_hot_keys(fact, on, share_threshold)
    if not hot_keys:
        return fact.join(dim, on, "inner")
    is_hot = F.col(on).isin(hot_keys)
    # Uniform per-row spread, no id column required: partition id mixes
    # with a monotonic per-partition counter. Nondeterministic salt
    # VALUES are safe — any assignment yields the same join output.
    spread = F.pmod(
        F.hash(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(salt_buckets),
    )
    fact_hot = fact.filter(is_hot).withColumn("__salt", spread)
    dim_hot = (
        dim.filter(F.col(on).isin(hot_keys))
        .withColumn(
            "__salt",
            F.explode(
                F.sequence(
                    F.lit(0), F.lit(salt_buckets - 1)
                ).cast(T.ArrayType(T.IntegerType()))
            ),
        )
    )
    salted = fact_hot.join(dim_hot, [on, "__salt"], "inner").drop("__salt")
    plain = fact.filter(~is_hot | F.col(on).isNull()).join(
        dim, on, "inner"
    )
    return plain.unionByName(salted)
