#!/usr/bin/env python
"""Phase breakdown of the IVF-PQ cold build (r16, VERDICT ask #6).

Times each stage of build_ivfpq_index + append_to_ivfpq_index the way
the sim_ivfpq_index entry pays them cold, with per-phase wall clocks:
seed collects, IVF Lloyd rounds, PQ Lloyd rounds, the cells+codes
write, the small writes, and the append encode. Run SOLO (one JVM).

Usage: python scripts/ivfpq_build_profile.py [--sf=DIR]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.1"
for a in sys.argv[1:]:
    if a.startswith("--sf="):
        SF_DIR = a.split("=", 1)[1]


def main() -> int:
    from pyspark.sql import functions as F

    from query_planner_optimizer_spark.operators import similarity as S
    from query_planner_optimizer_spark.session import get_spark

    spark = get_spark(app_name="qpo-ivfpq-build-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    spark.range(32 * 1024).repartition(32).mapInPandas(
        lambda it: it, "id long").count()

    t_all = time.perf_counter()
    marks: list[tuple[str, float]] = []
    last = t_all

    def mark(label: str) -> None:
        nonlocal last
        now = time.perf_counter()
        marks.append((label, now - last))
        last = now

    emb = S._emb(spark, SF_DIR)
    corpus = emb.filter(F.col("vec_id") % 8 != 0)
    shard = emb.filter(F.col("vec_id") % 8 == 0)
    print("corpus rows:", corpus.count(), " shard rows:", shard.count())
    mark("counts(warmup)")

    dim, nlist, m, ks = 64, S.IVF_NLIST, S.PQ_M, S.PQ_KS
    d_sub = dim // m
    base = S.with_norm(corpus, "embedding").select(
        F.col("vec_id").alias("id"), "_vec", "_norm").persist()
    unit = base.select(
        "id", F.transform("_vec", lambda x: x / F.col("_norm")).alias("u")
    ).persist()
    base.count(); unit.count()
    mark("persist base+unit")

    cents = S._train_ivf_centroids(base, dim, nlist, S.IVF_ITERS)
    mark(f"IVF Lloyd ({S.IVF_ITERS} iters)")

    sub = S._pq_subvectors(unit, m, d_sub)
    books, codes = S._pq_train_books(spark, unit, sub, m, ks, d_sub,
                                     S.PQ_ITERS)
    mark(f"PQ Lloyd ({S.PQ_ITERS} iters)")

    d = tempfile.mkdtemp(prefix="qpo_ivfpq_prof_")
    cells = S._assigned_cells(base, cents).select("id", "cell")
    version = S._write_ivfpq_version(
        spark, cents, books, cells, S._pack_codes(codes), d,
        meta={"dim": dim, "m": m, "ks": ks, "nlist": nlist})
    mark("version write (cells+codes job + small writes)")
    S._flip_ann_current(d, version)
    unit.unpersist(); base.unpersist()
    mark("flip+unpersist")

    S.append_to_ivfpq_index(spark, shard, d)
    mark("append encode+write")

    queries = emb.filter(F.col("vec_id") < S.DEFAULT_NUM_QUERIES)
    S.ivfpq_index_topk(spark, queries, d, source=emb,
                       nprobe=S.IVF_NLIST, shortlist=1 << 40).collect()
    mark("first probe (collect)")
    S.ivfpq_index_topk(spark, queries, d, source=emb,
                       nprobe=S.IVF_NLIST, shortlist=1 << 40).collect()
    mark("second probe (collect)")

    total = time.perf_counter() - t_all
    print(f"\n{'phase':48s} sec")
    for label, sec in marks:
        print(f"{label:48s} {sec:7.3f}")
    print(f"{'TOTAL':48s} {total:7.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
