#!/usr/bin/env python
"""Round-close artifact check (r16, VERDICT ask #9): assert a bench
artifact parses as the driver contract's one-line JSON with the
required keys, so an unparseable BENCH_rNN can never again silently
disable the driver's round-over-round PERF comparison (the r14
artifact did exactly that: PERF_r15 prev_bench_ok=false).

Usage: python scripts/check_bench_artifact.py BENCH_r16.json [...]
Accepts either a full-payload JSON file (BENCH_full.json style) or a
driver-captured file with a "tail"/"parsed" wrapper.
"""

from __future__ import annotations

import json
import sys

#: Required keys by artifact kind: the driver bench contract, and the
#: r16 core-scaling artifacts (distinguished by their "metric" value).
REQUIRED_BENCH = ("metric", "value", "unit", "queries", "sf")
REQUIRED_SCALING = ("metric", "cpus", "entries", "total_warm")


def check(path: str) -> list[str]:
    errors = []
    with open(path) as f:
        data = json.load(f)
    payload = data.get("parsed", data) if isinstance(data, dict) else None
    if payload is None or not isinstance(payload, dict):
        return [f"{path}: no JSON object payload"]
    scaling = payload.get("metric") == "core_scaling_noop"
    required = REQUIRED_SCALING if scaling else REQUIRED_BENCH
    for k in required:
        if k not in payload:
            errors.append(f"{path}: missing required key {k!r}")
    if errors:
        return errors
    rows = payload["entries"] if scaling else payload["queries"]
    if not isinstance(rows, dict) or not rows:
        errors.append(f"{path}: per-entry dict empty or not a dict")
    total = payload["total_warm"] if scaling else payload["value"]
    if not isinstance(total, (int, float)):
        errors.append(f"{path}: total not numeric")
    return errors


def main() -> int:
    paths = sys.argv[1:]
    if not paths:
        print("usage: check_bench_artifact.py FILE [...]", file=sys.stderr)
        return 2
    bad = []
    for p in paths:
        try:
            errs = check(p)
        except (OSError, json.JSONDecodeError) as e:
            errs = [f"{p}: {e}"]
        for e in errs:
            print(f"FAIL {e}")
        bad.extend(errs)
        if not errs:
            print(f"OK   {p}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
