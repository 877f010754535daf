#!/usr/bin/env python
"""Connected-components scale trend (r12 VERDICT ask #6): run the
dedup_connected_components entry's exact pipeline (exact-Jaccard pairs
→ min-label propagation → cluster report) at sf0.1 / sf1 / sf3 with
rounds telemetry, engine-absolute (no oracle — the sf1 oracle point,
151 s vs engine 44.6 s, is already in SCALE.md; a DuckDB recursive CTE
at sf3 is impractical).

The claim under test: propagation ROUNDS stay flat as the corpus grows
(near-dup graphs are clique-dense — diameter is a property of cluster
shape, not corpus size), so total time scales with the per-round
shuffle volume (edges), never with extra iterations.

Usage: python scripts/cc_trend.py  (expects .scale_tmp/sf{1,3} built by
       scripts/sf1_bench.py --k=10 / --k=30)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALES = [
    ("sf0.1", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")),
    ("sf1", os.path.join(REPO, ".scale_tmp", "sf1")),
    # NO replicated sf3 row: k×-replication copies each document k
    # times VERBATIM, so every doc becomes a k-clique of exact dups and
    # the edge set grows k² (measured: the sf3 attempt OOMs the local
    # heap in the pair join — a test-data artifact, the exact
    # degenerate regime scale_smoke.synth_docs documents). Real corpora
    # hold dup DENSITY roughly constant as they grow; the synthetic
    # rows below scale that way.
]

#: density-stable synthetic corpus sizes (synth_docs plants one exact
#: dup per 20 docs — pair structure grows LINEARLY): 1×/10×/30× of the
#: sf0.1 document count.
SYNTH = [("synth-5k", 5_000), ("synth-50k", 50_000),
         ("synth-150k", 150_000)]


def main() -> int:
    from query_planner_optimizer_spark.catalog import spread
    from query_planner_optimizer_spark.operators import dedup
    from query_planner_optimizer_spark.session import get_spark

    spark = get_spark(app_name="qpo-cc-trend")
    spark.sparkContext.setLogLevel("ERROR")

    print("| scale | docs | rounds | run1 s | run2 s (warm) |",
          flush=True)
    print("|---|---|---|---|---|", flush=True)
    for label, d in SCALES:
        p = os.path.join(d, "documents.parquet")
        if not os.path.exists(p):
            print(f"| {label} | (missing {p}) | | | |", flush=True)
            continue
        docs = spread(spark.read.parquet(p)).select("doc_id", "text")
        n_docs = docs.count()
        times, rounds = [], None
        for _ in range(2):
            stats: dict = {}
            t0 = time.perf_counter()
            dedup.dedup_clusters(docs, threshold=0.2, stats=stats).count()
            times.append(time.perf_counter() - t0)
            rounds = stats.get("rounds")
        print(f"| {label} | {n_docs} | {rounds} | {times[0]:.1f} "
              f"| {times[1]:.1f} |", flush=True)

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from scale_smoke import synth_docs

    for label, n in SYNTH:
        docs = synth_docs(spark, n).localCheckpoint(eager=True)
        times, rounds = [], None
        for _ in range(2):
            stats = {}
            t0 = time.perf_counter()
            dedup.dedup_clusters(docs, threshold=0.2, stats=stats).count()
            times.append(time.perf_counter() - t0)
            rounds = stats.get("rounds")
        print(f"| {label} | {n} | {rounds} | {times[0]:.1f} "
              f"| {times[1]:.1f} |", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
