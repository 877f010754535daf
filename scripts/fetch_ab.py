#!/usr/bin/env python
"""Driver-fetch A/B for result-heavy entries (r16, VERDICT ask #7):
noop sink (compute only) vs .collect() (the bench contract: pickled
Row objects) vs windows.fetch_arrow (the r16 Arrow serving helper).

Shows how much of a bench line is transfer encoding rather than
computation, and what the serving helper recovers. Row equality of the
two fetch paths is pinned in tests/test_streaming_multimodal.py.

Usage: python scripts/fetch_ab.py [entry ...] [--runs=4]
(default entry: stream_sessionize)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "stream_sessionize"]
    runs = 4
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(REPO, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    from query_planner_optimizer_spark.session import get_spark
    from query_planner_optimizer_spark.streaming.windows import fetch_arrow

    spark = get_spark(app_name="qpo-fetch-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    qs = entry.queries()

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    for name in names:
        build = qs[name]
        n = build(spark, SF_DIR).count()
        modes = {
            "noop": lambda: build(spark, SF_DIR).write.format("noop")
            .mode("overwrite").save(),
            "collect": lambda: build(spark, SF_DIR).collect(),
            "arrow": lambda: fetch_arrow(build(spark, SF_DIR)),
        }
        out = {}
        for _ in range(runs):  # alternate modes within each round
            for mode, fn in modes.items():
                out.setdefault(mode, []).append(timed(fn))
        line = "  ".join(
            f"{m} med={statistics.median(v):.3f}s" for m, v in out.items())
        print(f"{name} ({n} rows): {line}")
        for m, v in out.items():
            print(f"    {m}: {['%.3f' % t for t in v]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
