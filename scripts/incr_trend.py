#!/usr/bin/env python
"""Incremental-dedup probe trend: does shard-vs-corpus probe time stay
FLAT as the corpus grows? (The operator's central claim: daily work is
proportional to the SHARD, not the corpus.)

Protocol: density-stable synthetic corpus (scale_smoke.synth_docs — one
planted dup per 20 docs, pair structure linear) at 1×/3×/9× of a 40k
base; the shard is a FIXED 5,000 docs (doc_id % 8 == 0, id < 40k) at
every scale. Per scale: time the one-time index build (xxhash mode),
then min-of-2 warm probes (candidates + exact verification). The
probe's only corpus-dependent input is the band-index scan (linear
bytes, map-side, no shuffle) — time should grow far slower than the
corpus, and candidate volume with it.

Usage: python scripts/incr_trend.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

SCALES = [40_000, 120_000, 360_000]


def main() -> int:
    from pyspark.sql import functions as F

    from query_planner_optimizer_spark.operators import incremental as inc
    from query_planner_optimizer_spark.session import get_spark
    from scale_smoke import synth_docs

    spark = get_spark(app_name="qpo-incr-trend")
    spark.sparkContext.setLogLevel("ERROR")

    print("| corpus docs | shard docs | build s | probe s (min of 2) "
          "| pairs |", flush=True)
    print("|---|---|---|---|---|", flush=True)
    for n in SCALES:
        docs = synth_docs(spark, n)
        corpus = docs.filter(F.col("doc_id") % 8 != 0)
        # Fixed-size shard at every scale: ~4.4k fresh docs (% 8 == 0,
        # id < 40k) plus ~714 re-crawls of corpus docs (% 7 == 1,
        # id < 40k, re-emitted at id + 10M) — the re-crawls guarantee
        # cross pairs, so the probe's VERIFICATION stage does real work
        # at every scale (synth_docs' planted in-corpus dups never
        # cross a mod-8 split: the duplicated ids are all odd).
        shard = docs.filter((F.col("doc_id") % 8 == 0)
                            & (F.col("doc_id") < 40_000)).unionByName(
            corpus.filter((F.col("doc_id") % 7 == 1)
                          & (F.col("doc_id") < 40_000)).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        )
        d = tempfile.mkdtemp(prefix=f"qpo_incr_trend_{n}_")
        t0 = time.perf_counter()
        inc.build_dedup_index(corpus, d)
        build_s = time.perf_counter() - t0
        times, pairs = [], None
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = inc.incremental_minhash_pairs(
                spark, shard, d, threshold=0.2).count()
            times.append(time.perf_counter() - t0)
        n_c, n_s = corpus.count(), shard.count()
        print(f"| {n_c} | {n_s} | {build_s:.1f} | {min(times):.2f} "
              f"| {pairs} |", flush=True)

    # ---- bucketed index, NON-broadcast probe (the backfill case) ----
    # A merged/backfill shard too big to broadcast (banded frame +
    # shingle arrays ≫ the 10 MB default broadcast threshold) probes a
    # bucketBy(16, band, bsig) index with broadcast_shard=False: the
    # sort-merge join shuffles the SHARD side only (plan-audited in
    # tests). Two claims measured: (a) probe time stays flat as the
    # CORPUS/index grows 9× under a fixed big shard; (b) at a fixed
    # corpus, probe time is proportional to the SHARD.
    print("", flush=True)
    print("bucketed bands (16 buckets), broadcast_shard=False:",
          flush=True)
    print("| corpus docs | shard docs | build s | probe s (min of 2) "
          "| pairs |", flush=True)
    print("|---|---|---|---|---|", flush=True)

    def big_shard(docs, corpus, mod):
        # fresh docs (even ids < 40k at mod density) + re-crawls
        return docs.filter((F.col("doc_id") % mod == 0)
                           & (F.col("doc_id") < 40_000)).unionByName(
            corpus.filter((F.col("doc_id") % 7 == 1)
                          & (F.col("doc_id") < 40_000)).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
        )

    def probe_row(docs, corpus, shard):
        d = tempfile.mkdtemp(prefix="qpo_incr_bkt_trend_")
        t0 = time.perf_counter()
        inc.build_dedup_index(corpus, d, bucket_bands=16)
        build_s = time.perf_counter() - t0
        times, pairs = [], None
        for _ in range(2):
            t0 = time.perf_counter()
            pairs = inc.incremental_minhash_pairs(
                spark, shard, d, threshold=0.2,
                broadcast_shard=False).count()
            times.append(time.perf_counter() - t0)
        print(f"| {corpus.count()} | {shard.count()} | {build_s:.1f} "
              f"| {min(times):.2f} | {pairs} |", flush=True)

    # (a) fixed big shard (~20k fresh + ~0.7k re-crawl), corpus 1x/3x/9x
    for n in SCALES:
        docs = synth_docs(spark, n)
        corpus = docs.filter(F.col("doc_id") % 8 != 0)
        probe_row(docs, corpus, big_shard(docs, corpus, mod=2))

    # (b) fixed corpus (3x), shard 5k → 10k → 20k
    docs = synth_docs(spark, SCALES[1])
    corpus = docs.filter(F.col("doc_id") % 8 != 0)
    for mod in (8, 4, 2):
        probe_row(docs, corpus, big_shard(docs, corpus, mod=mod))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
