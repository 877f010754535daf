#!/usr/bin/env python
"""r11 probe: batch sessionize — session_window groupBy vs a
gaps-and-islands window formulation (lag + running-sum + groupBy).

The sf3 bench flagged stream_sessionize as the one riser (ratio 15.55,
engine 5.9x time for 30x data). Hypothesis: the gaps-and-islands plan
(1 exchange + 1 sort + WindowExec + HashAggregate that reuses the
user_id partitioning) beats MergingSessionsExec's sort-based merge at
scale. Measure both at sf0.1 and a replicated sf1 before touching the
operator.

Usage: python scripts/sessionize_probe.py [K] [--rebuild]
(default K=10; --rebuild discards the cached replicated dataset)
"""
from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402

from query_planner_optimizer_spark.dsl.compiler import (  # noqa: E402
    agg_decimal_scale,
)
from query_planner_optimizer_spark.session import get_spark  # noqa: E402
from query_planner_optimizer_spark.streaming.windows import (  # noqa: E402
    sessionize,
)

REBUILD = "--rebuild" in sys.argv
_args = [a for a in sys.argv[1:] if a != "--rebuild"]
K = int(_args[0]) if _args else 10
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def gaps_islands(events, gap_minutes=30, ts_col="ts", key_col="user_id"):
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    cur = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(cur).over(w)
    new_s = F.when(prev.isNull() | (cur - prev >= gap_us), 1).otherwise(0)
    run = Window.partitionBy(key_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    sid = F.sum(new_s).over(run)
    return (
        events.withColumn("__sid", sid)
        .groupBy(key_col, "__sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast(
                f"decimal(38, {agg_decimal_scale(6)})")), 6)
            .cast("double").alias("sum_value"),
        )
        .select(key_col, "session_start", "n_events", "sum_value")
    )


def timeit(fn, reps=3):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return statistics.median(ts)


def main():
    spark = get_spark(app_name="sessionize-probe")
    spark.sparkContext.setLogLevel("ERROR")
    ev01 = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    reps = spark.range(K).withColumnRenamed("id", "__rep")
    ev1 = (ev01.crossJoin(reps)
           .withColumn("event_id", F.col("event_id") * K + F.col("__rep"))
           .drop("__rep"))
    # Write-then-rename so a crashed run can't leave a partial dir the
    # next invocation silently reuses (r11 ADVICE); --rebuild forces a
    # rewrite after testdata changes. Spark's _SUCCESS marker gates the
    # reuse: a dir without it is treated as stale and rebuilt.
    tmp = os.path.join(REPO, ".scale_tmp", f"sessionize_k{K}")
    complete = os.path.isfile(os.path.join(tmp, "_SUCCESS"))
    if REBUILD or not complete:
        staging = tmp + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        ev1.repartition(16).write.mode("overwrite").parquet(staging)
        shutil.rmtree(tmp, ignore_errors=True)
        os.rename(staging, tmp)
    ev1 = spark.read.parquet(tmp)

    for label, events in (("sf0.1", ev01), (f"k={K}", ev1)):
        a = timeit(lambda: sessionize(events).write.format("noop")
                   .mode("overwrite").save())
        b = timeit(lambda: gaps_islands(events).write.format("noop")
                   .mode("overwrite").save())
        print(f"{label}: session_window={a:.2f}s gaps_islands={b:.2f}s")

    # exactness: same result set at sf0.1 (deterministic: ts ties in a
    # session do not change min/count/sum).
    ga = gaps_islands(ev01).toPandas()
    sw = sessionize(ev01).toPandas()
    import pandas as pd

    def norm(df):
        df = df.copy()
        df["session_start"] = df["session_start"].astype(str)
        return (df.sort_values(list(df.columns)).reset_index(drop=True)
                [sorted(df.columns)])

    pd.testing.assert_frame_equal(norm(ga), norm(sw), check_dtype=False)
    print("exactness: gaps_islands == session_window at sf0.1 "
          f"({len(ga)} sessions)")


if __name__ == "__main__":
    main()
