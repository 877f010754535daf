#!/usr/bin/env python
"""100× scale smoke for the STATEFUL streaming pair (r10, r9 VERDICT
ask #4): funnel_stream / heavy_hitters_stream (applyInPandasWithState)
at 1× vs K× replicated events, in the two adversarial regimes the r9
as-of protocol established:

- funnel_wide  — user population scales K× (state-row-count regime):
  state rows must equal distinct users exactly, time ~linear in rows.
- funnel_deep  — user_id KEPT and ~1% of replicated rows remapped onto
  ONE hot user (the r9 exists protocol): per-key batches deepen K× but
  state rows stay FLAT at the base user count; the per-user walk is
  vectorized per STAGE, so depth costs a mask+min, not a Python loop.
- hh_capped    — heavy hitters with the item domain scaled K× under a
  small capacity (1024): state must stay at one row per GROUP with
  memory bounded by capacity·groups, REGARDLESS of item cardinality —
  the entire point of the space-saving sketch at stream scale.

Each case writes the replicated input as a multi-file parquet dir and
replays it as a micro-batched stream (maxFilesPerTrigger) under
Trigger.AvailableNow, so state genuinely persists across batches.
Asserts state-row exactness from StreamingQueryProgress stateOperators
metrics; prints wall times + state memory for SCALE.md.

Usage: python scripts/stream_scale_smoke.py [K] [--only=a,b]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TMP = os.path.join(REPO, ".scale_tmp", "stream")


def replicate(spark, k: int, mode: str):
    """events replicated k×. mode='wide' remaps user_id per replica
    (k× keys); mode='deep' keeps user_id and funnels ~1% of replicated
    rows onto user 1 (single-hot-key regime, r9 exists protocol)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    if k == 1:
        return ev
    reps = spark.range(k).withColumnRenamed("id", "__rep")
    out = ev.crossJoin(reps).withColumn(
        "event_id", F.col("event_id") * k + F.col("__rep")
    )
    if mode == "wide":
        out = out.withColumn(
            "user_id", F.col("user_id") * k + F.col("__rep")
        )
    else:
        out = out.withColumn(
            "user_id",
            F.when(
                F.pmod(F.xxhash64("event_id"), F.lit(100)) == 0, F.lit(1)
            ).otherwise(F.col("user_id")),
        )
    return out.drop("__rep")


def run_stream(spark, src_dir: str, build, name: str,
               files_per_trigger: int = 4, output_mode: str = "update"):
    """Replay src_dir as a micro-batched stream through the stateful
    operator; returns (wall_s, max_state_rows, max_state_bytes,
    n_batches, out_rows)."""
    from query_planner_optimizer_spark.streaming.windows import (
        EVENTS_STREAM_SCHEMA,
    )

    ckpt = os.path.join(TMP, f"ckpt_{name}")
    shutil.rmtree(ckpt, ignore_errors=True)
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )
    t0 = time.perf_counter()
    q = (
        build(src)
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    wall = time.perf_counter() - t0
    rows = bytes_ = batches = out_rows = 0
    for p in q.recentProgress:
        for so in p.get("stateOperators") or []:
            rows = max(rows, so.get("numRowsTotal", 0))
            bytes_ = max(bytes_, so.get("memoryUsedBytes", 0))
        if (p.get("numInputRows") or 0) > 0:
            batches += 1
        out_rows += (p.get("sink") or {}).get("numOutputRows", 0) or 0
    return wall, rows, bytes_, batches, out_rows


def write_input(df, path: str, n_files: int = 12,
                time_ordered: bool = False) -> None:
    shutil.rmtree(path, ignore_errors=True)
    if time_ordered:
        # Range-partition on event time so part-file order ≈ time
        # order: the availableNow replay then advances the watermark
        # batch by batch, which is what lets the interval join EVICT
        # state (a randomly-ordered replay jumps the watermark to
        # near-max in batch 1 and drops the rest as late).
        df.repartitionByRange(n_files, "ts").write.mode(
            "overwrite").parquet(path)
        # FileStreamSource replays files in MODIFICATION-TIME order,
        # and the writer stamps every part file within the same
        # second — same-mtime order is unspecified, which scrambles
        # the ranges (observed: ~half the joins dropped as late).
        # Re-stamp mtimes ascending in part-name (= ts-range) order.
        parts = sorted(
            f for f in os.listdir(path) if f.startswith("part-")
        )
        base = time.time() - len(parts) * 2
        for i, f in enumerate(parts):
            os.utime(os.path.join(path, f), (base + i * 2, base + i * 2))
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(path)


def main() -> int:
    k = 100
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        else:
            k = int(a)

    from pyspark.sql import functions as F

    from query_planner_optimizer_spark.session import get_spark
    from query_planner_optimizer_spark.streaming import stateful

    spark = get_spark(app_name="qpo-stream-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(TMP, exist_ok=True)

    def funnel(src):
        return stateful.funnel_stream(src)

    def hh(src):
        return stateful.heavy_hitters_stream(src, capacity=1024)

    from query_planner_optimizer_spark.streaming import windows as W

    IJ_WINDOW, IJ_WM = "30 minutes", "10 minutes"

    def ij(src):
        return W.interval_join(
            src.filter(F.col("event_type") == "click"),
            src.filter(F.col("event_type") == "purchase"),
            window=IJ_WINDOW, watermark=IJ_WM,
        )

    def ijl(src):
        return W.interval_join_left(
            src.filter(F.col("event_type") == "click"),
            src.filter(F.col("event_type") == "purchase"),
            window=IJ_WINDOW, watermark=IJ_WM,
        )

    def ijf(src):
        return W.interval_join_full(
            src.filter(F.col("event_type") == "click"),
            src.filter(F.col("event_type") == "purchase"),
            window=IJ_WINDOW, watermark=IJ_WM,
        )

    # (mode, build, output_mode, time_ordered): the stream-stream
    # interval join emits in APPEND mode over a time-ordered replay —
    # see write_input — so the watermark advances per batch and state
    # eviction is observable.
    cases = {
        "funnel_wide": ("wide", funnel, "update", False),
        "funnel_deep": ("deep", funnel, "update", False),
        "hh_capped": ("wide", hh, "update", False),
        "interval_join": ("wide", ij, "append", True),
        "interval_join_left": ("wide", ijl, "append", True),
        "interval_join_full": ("wide", ijf, "append", True),
    }
    print(f"# stateful-streaming scale smoke: 1x vs {k}x "
          f"(sf0.1 events base, availableNow micro-batches, noop sink)")
    for name, (mode, build, omode, ordered) in cases.items():
        if only and name not in only:
            continue
        results = {}
        for kk in (1, k):
            df = replicate(spark, kk, mode)
            src_dir = os.path.join(TMP, f"in_{name}_{kk}")
            # The interval case needs enough micro-batches that the
            # never-evicted FINAL batch is a small fraction of the
            # stream: state after batch b ≈ batch b's side rows (+ the
            # watermark horizon) — eviction of batch b happens in
            # b+1 — so 48 files / 4 per trigger = 12 batches puts the
            # per-batch share near 8%.
            write_input(df, src_dir, n_files=48 if ordered else 12,
                        time_ordered=ordered)
            n_users = df.select("user_id").distinct().count()
            n_groups = df.select("event_type").distinct().count()
            wall, rows, bytes_, batches, out_rows = run_stream(
                spark, src_dir, build, f"{name}_{kk}", output_mode=omode
            )
            if name == "interval_join_left":
                sides = df.filter(
                    F.col("event_type").isin("click", "purchase")
                ).count()
                # Same eviction bound as the inner case: outer state is
                # the same join state, NULL emission happens AT
                # eviction so it adds no retained rows.
                assert rows < 0.2 * sides, (name, kk, rows, sides)
                # Horizon-exact output count: matches (== inner batch
                # twin) + one NULL row per unmatched click whose
                # click_ts + interval the final watermark passed.
                # wm_final = min over sides of (max ts − delay)
                # (multipleWatermarkPolicy=min).
                src_b = spark.read.parquet(src_dir)
                bc = src_b.filter(F.col("event_type") == "click")
                bp = src_b.filter(F.col("event_type") == "purchase")
                inner_n = W.interval_join(
                    bc, bp, window=IJ_WINDOW, watermark=None).count()
                left = W.interval_join_left(
                    bc, bp, window=IJ_WINDOW, watermark=None)
                import datetime
                import re

                def _minutes(spec: str) -> int:
                    m = re.fullmatch(r"(\d+) minutes?", spec)
                    assert m, f"smoke expects minute-granular spec: {spec}"
                    return int(m.group(1))

                max_c = bc.agg(F.max("ts")).collect()[0][0]
                max_p = bp.agg(F.max("ts")).collect()[0][0]
                wm = min(max_c, max_p) - datetime.timedelta(
                    minutes=_minutes(IJ_WM))
                # interval + 1m margin (boundary-exact eviction is not
                # contractual; the unit-test twin uses the same margin)
                horizon = wm - datetime.timedelta(
                    minutes=_minutes(IJ_WINDOW) + 1)
                owed = (
                    left.filter(F.col("purchase_id").isNull())
                    .join(bc.select(F.col("event_id").alias("click_id"),
                                    F.col("ts").alias("cts")), "click_id")
                    .filter(F.col("cts") < F.lit(horizon))
                    .count()
                )
                assert inner_n + owed <= out_rows <= inner_n + (
                    left.count() - inner_n), (name, kk, out_rows,
                                              inner_n, owed)
                label = (f"(< 20% of {sides} side rows; "
                         f"out {out_rows} in [{inner_n + owed}, "
                         f"{left.count()}]; nulls emitted="
                         f"{out_rows - inner_n})")
            elif name == "interval_join_full":
                # r12: same join state as inner/left (NULL emission in
                # BOTH directions happens at eviction — no extra
                # retained rows); output band adds the purchase-only
                # owed set, whose horizon is the watermark itself (the
                # interval admits only clicks at-or-before a purchase,
                # so no future click can claim an old purchase).
                sides = df.filter(
                    F.col("event_type").isin("click", "purchase")
                ).count()
                assert rows < 0.2 * sides, (name, kk, rows, sides)
                src_b = spark.read.parquet(src_dir)
                bc = src_b.filter(F.col("event_type") == "click")
                bp = src_b.filter(F.col("event_type") == "purchase")
                inner_n = W.interval_join(
                    bc, bp, window=IJ_WINDOW, watermark=None).count()
                full = W.interval_join_full(
                    bc, bp, window=IJ_WINDOW, watermark=None)
                import datetime
                import re

                def _minutes(spec: str) -> int:
                    m = re.fullmatch(r"(\d+) minutes?", spec)
                    assert m, f"smoke expects minute-granular spec: {spec}"
                    return int(m.group(1))

                max_c = bc.agg(F.max("ts")).collect()[0][0]
                max_p = bp.agg(F.max("ts")).collect()[0][0]
                wm = min(max_c, max_p) - datetime.timedelta(
                    minutes=_minutes(IJ_WM))
                h_click = wm - datetime.timedelta(
                    minutes=_minutes(IJ_WINDOW) + 1)
                h_purch = wm - datetime.timedelta(minutes=1)
                owed_c = (
                    full.filter(F.col("purchase_id").isNull())
                    .join(bc.select(F.col("event_id").alias("click_id"),
                                    F.col("ts").alias("cts")), "click_id")
                    .filter(F.col("cts") < F.lit(h_click))
                    .count()
                )
                owed_p = (
                    full.filter(F.col("click_id").isNull())
                    .join(bp.select(
                        F.col("event_id").alias("purchase_id"),
                        F.col("ts").alias("pts")), "purchase_id")
                    .filter(F.col("pts") < F.lit(h_purch))
                    .count()
                )
                assert inner_n + owed_c + owed_p <= out_rows \
                    <= full.count(), (name, kk, out_rows, inner_n,
                                      owed_c, owed_p)
                label = (f"(< 20% of {sides} side rows; "
                         f"out {out_rows} in "
                         f"[{inner_n + owed_c + owed_p}, "
                         f"{full.count()}]; nulls emitted="
                         f"{out_rows - inner_n})")
            elif name == "interval_join":
                # Watermark eviction: join state retains only rows
                # inside the interval+watermark horizon — a vanishing
                # fraction of the month-long input. Without eviction
                # the stream-stream join retains EVERY click+purchase
                # row (~40% of input) forever.
                sides = df.filter(
                    F.col("event_type").isin("click", "purchase")
                ).count()
                assert rows < 0.2 * sides, (name, kk, rows, sides)
                # Completeness under the ordered replay: streamed
                # emissions must equal the batch twin exactly (the
                # SAME interval_join code with watermark=None).
                batch_n = W.interval_join(
                    spark.read.parquet(src_dir).filter(
                        F.col("event_type") == "click"),
                    spark.read.parquet(src_dir).filter(
                        F.col("event_type") == "purchase"),
                    window=IJ_WINDOW, watermark=None,
                ).count()
                assert out_rows == batch_n, (name, kk, out_rows, batch_n)
                label = f"(< 20% of {sides} side rows; out=={batch_n})"
            else:
                # State-row exactness: one state row per funnel USER /
                # per heavy-hitter GROUP — never per event, never per
                # item.
                expect = n_groups if name.startswith("hh") else n_users
                assert rows == expect, (name, kk, rows, expect)
                label = ("(= groups)" if name.startswith("hh")
                         else "(= users)")
            results[kk] = (wall, rows, bytes_, batches)
            print(f"{name} {kk}x: {wall:.2f}s  state_rows={rows} "
                  f"{label} "
                  f"state_mem={bytes_ / 1e6:.2f}MB  batches={batches}",
                  flush=True)
        w1, _, b1, _ = results[1]
        wk, _, bk, _ = results[k]
        print(f"{name}: time ratio {wk / max(w1, 1e-9):.1f}x for {k}x "
              f"rows; state_mem ratio {bk / max(b1, 1):.1f}x", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
