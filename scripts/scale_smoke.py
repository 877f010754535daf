#!/usr/bin/env python
"""Scale smoke: replicate sf0.1 inputs K× (ids remapped) and time key
operators at 1× vs K× — the local stand-in for "does the plan's cost
track data volume or blow up superlinearly?". Results feed SCALE.md.

Usage: python scripts/scale_smoke.py [K] [--only=a,b]
Plans execute through the `noop` DSv2 sink (full computation, no
output I/O), warm JVM, min-of-two timing.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate_docs(spark, k: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if k == 1:
        return docs
    reps = spark.range(k).withColumnRenamed("id", "__rep")
    return (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") * k + F.col("__rep"))
        .drop("__rep")
    )


def replicate_orders(spark, k: int):
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    if k == 1:
        return orders
    reps = spark.range(k).withColumnRenamed("id", "__rep")
    # Keep o_custkey as-is: per-key row counts scale k×, so hot keys get
    # k× hotter — the regime salting exists for.
    return (
        orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") * k + F.col("__rep"))
        .drop("__rep")
    )


def run_noop(df) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    k = 20
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        else:
            k = int(a)

    from pyspark.sql import functions as F

    from query_planner_optimizer_spark.functions.skew import salted_join
    from query_planner_optimizer_spark.operators import docpipe, text
    from query_planner_optimizer_spark.session import get_spark

    spark = get_spark(app_name="qpo-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    def salted(spark, kk):
        orders = replicate_orders(spark, kk)
        customer = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
            F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
        )
        hot = [
            r[0]
            for r in orders.groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("o_custkey"))
            .limit(10)
            .collect()
        ]
        joined = salted_join(orders, customer, "o_custkey",
                             salt_buckets=8, hot_keys=hot)
        return joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n"))

    ops = {
        "line_dedup": lambda spark, kk: docpipe.line_dedup(
            replicate_docs(spark, kk), line_tokens=3),
        "collocations": lambda spark, kk: text.bigram_collocations(
            replicate_docs(spark, kk)),
        "salted_join_agg": salted,
    }
    print(f"# scale smoke: 1x vs {k}x (sf0.1 base, local, noop sink)")
    for name, build in ops.items():
        if only and name not in only:
            continue
        t1 = run_noop(build(spark, 1))
        tk = run_noop(build(spark, k))
        print(f"{name}: 1x {t1:.2f}s  {k}x {tk:.2f}s  "
              f"(time ratio {tk / max(t1, 1e-9):.1f}x for {k}x rows)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
