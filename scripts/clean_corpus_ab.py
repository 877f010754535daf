#!/usr/bin/env python
"""clean_corpus agg-vs-window A/B on a DUPLICATE-HEAVY corpus (r16,
VERDICT ask #5).

r15 replaced the keep-first-per-content-hash row_number window with a
min-struct partial aggregation (guide §2.3: map-side combine collapses
duplicates before the exchange). On the driver's sf0.1 corpus that
measured 0.88x — the corpus has almost no duplicates, so the agg's
map-side combine has nothing to collapse and its extra struct packing
costs a little. The 100-TB rationale is dup-heavy corpora (web crawls
commonly carry 30-60% exact dups). This script MEASURES that claim
instead of asserting it: replicate the sf0.1 documents K times with
IDENTICAL text and fresh doc_ids (a K-fold exact-dup corpus), then
alternate the agg form and the window form in ONE session (JIT-fair),
noop-sink timed. It also alternates both on the original (dup-light)
corpus for the neutral-cost check, and verifies both forms return the
same rows.

Usage: python scripts/clean_corpus_ab.py [--k=8] [--runs=4]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def window_form(docs):
    """The pre-r15 dedup step (git 2a9f6b9~1), with ONE control change:
    both forms score through the r15 fused with_quality_and_lang, so
    this A/B isolates the window-vs-agg dedup choice alone."""
    from query_planner_optimizer_spark.operators import text as T
    from query_planner_optimizer_spark.operators.docpipe import (
        KEEP_LANGS,
        QUALITY_MIN,
    )

    scored = T.with_quality_and_lang(docs)
    gated = scored.filter(
        (F.col("quality_score") >= F.lit(QUALITY_MIN))
        & (F.col("lang_pred").isin(*KEEP_LANGS))
    )
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy(
        F.col("doc_id").asc()
    )
    return (
        gated.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "lang_pred", "quality_score", "n_tokens")
    )


def main() -> int:
    k = 8
    runs = 4
    for a in sys.argv[1:]:
        if a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])

    from query_planner_optimizer_spark.operators.docpipe import clean_corpus
    from query_planner_optimizer_spark.session import get_spark

    spark = get_spark(app_name="qpo-clean-corpus-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = base.count()
    reps = spark.range(k).withColumnRenamed("id", "__rep")
    heavy = (
        base.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") * k + F.col("__rep"))
        .drop("__rep")
        .repartition(32)
        .persist()
    )
    heavy.count()

    def timed(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Equality first (dup-heavy corpus): same survivor rows both forms.
    a_rows = sorted(map(tuple, clean_corpus(heavy).collect()))
    b_rows = sorted(map(tuple, window_form(heavy).collect()))
    print(f"rows equal on {k}x dup-heavy corpus: {a_rows == b_rows} "
          f"({len(a_rows)} survivors from {n_docs * k} docs)")
    assert a_rows == b_rows

    for label, corpus in (("dup-heavy(x%d)" % k, heavy), ("sf0.1", None)):
        if corpus is None:
            corpus = base.repartition(32).persist()
            corpus.count()
        agg_t, win_t = [], []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"ab agg {label}")
            agg_t.append(timed(clean_corpus(corpus)))
            spark.sparkContext.setJobDescription(f"ab window {label}")
            win_t.append(timed(window_form(corpus)))
        print(f"{label}: agg med={statistics.median(agg_t):.3f}s "
              f"{['%.3f' % t for t in agg_t]}  "
              f"window med={statistics.median(win_t):.3f}s "
              f"{['%.3f' % t for t in win_t]}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
