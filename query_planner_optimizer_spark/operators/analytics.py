"""Analytic (window-function) operators — beyond the reference surface.

The reference has no window functions (SURVEY.md §2.5). These are the
standard analytical primitives a Spark-first engine exposes for free;
each has an exact ANSI-SQL oracle.

Scale: window functions shuffle on their partition key. Partition keys
here (customer, user) are high-cardinality → well-distributed; an
unpartitioned ORDER BY window would serialize on one task and is
deliberately not offered.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from query_planner_optimizer_spark.catalog import Catalog


def top_n_per_group(
    df: DataFrame, part_cols: list[str], order_col: str, n: int,
    tiebreak: str, descending: bool = True,
) -> DataFrame:
    """Top-n rows per group by ``order_col`` (deterministic tiebreak)."""
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(*part_cols).orderBy(oc, F.col(tiebreak).asc())
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .withColumn("rn", F.col("rn").cast("int"))
    )


def running_sum(
    df: DataFrame, part_col: str, order_cols: list[str], value_col: str,
) -> DataFrame:
    w = (
        Window.partitionBy(part_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("running_sum", F.round(F.sum(value_col).over(w), 6))


def lag_delta_seconds(
    df: DataFrame, part_col: str, ts_col: str, tiebreak: str,
) -> DataFrame:
    """Seconds since the previous event of the same key (NULL for the
    first event)."""
    w = Window.partitionBy(part_col).orderBy(F.col(ts_col).asc(),
                                             F.col(tiebreak).asc())
    prev = F.lag(F.col(ts_col)).over(w)
    # exact integer microseconds both engines (no float epoch rounding)
    return df.withColumn(
        "delta_us", F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)
    )


# --------------------------------------------------------------------------
# Driver entries
# --------------------------------------------------------------------------

def q_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir, register_views=False).table("orders")
    return top_n_per_group(
        orders, ["o_custkey"], "o_totalprice", 3, "o_orderkey"
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rn")


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = Catalog(spark, sf_dir, register_views=False).table("events")
    return running_sum(
        events, "user_id", ["ts", "event_id"], "value"
    ).select("user_id", "event_id", "running_sum")


def q_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = Catalog(spark, sf_dir, register_views=False).table("events")
    return lag_delta_seconds(events, "user_id", "ts", "event_id").select(
        "user_id", "event_id", "delta_us"
    )


def entry_queries() -> dict[str, Callable]:
    return {
        "analytics_topn_per_group": q_topn_orders,
        "analytics_running_sum": q_running_sum,
        "analytics_lag_delta": q_lag_delta,
    }


def entry_oracles() -> dict[str, str]:
    topn = """
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER)
                       AS rn
            FROM orders
        ) WHERE rn <= 3
    """
    run_sum = """
        SELECT user_id, event_id,
               ROUND(SUM(value) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING), 6) AS running_sum
        FROM events
    """
    lag_d = """
        SELECT user_id, event_id,
               epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id)) AS delta_us
        FROM events
    """
    return {
        "analytics_topn_per_group": topn,
        "analytics_running_sum": run_sum,
        "analytics_lag_delta": lag_d,
    }
