"""Temporal join tests: as-of (vs DuckDB's native ASOF JOIN — an
independent implementation) and the bucketized range join (vs a plain
inequality join on the same inputs)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from query_planner_optimizer_spark.operators import temporal

from .conftest import SF_DIR, assert_matches_duckdb, normalize


def test_asof_backward_matches_duckdb_asof(spark, ddb):
    df = temporal.q_asof_purchase_click(spark, SF_DIR)
    assert_matches_duckdb(
        df, ddb, temporal.entry_oracles()["temporal_asof_join"]
    )


def test_asof_forward_semantics(spark, catalog):
    """Forward direction: smallest right ts >= left ts; verified against
    a window-free groupBy-min construction."""
    events = catalog.table("events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    ).groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    got = temporal.asof_join(
        purchases, clicks, on="user_id", ts_col="ts",
        value_cols=("value",), direction="forward",
    ).toPandas()
    # Oracle: min click ts >= purchase ts per purchase, via a join+min.
    p, c = purchases.alias("p"), clicks.alias("c")
    want = (
        p.join(c, (F.col("p.user_id") == F.col("c.user_id"))
               & (F.col("c.ts") >= F.col("p.ts")), "left")
        .groupBy("p.event_id", "p.user_id", "p.ts")
        .agg(F.min(F.col("c.ts")).alias("matched_ts"))
        .toPandas()
    )
    g = got[["event_id", "matched_ts"]].sort_values("event_id").reset_index(drop=True)
    w = want[["event_id", "matched_ts"]].sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_asof_tolerance(spark):
    """merge_asof-style tolerance: matches farther than tolerance_us are
    nulled (match columns only — left rows always survive); exact-gap
    matches are kept (<=); works for both directions."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    left = spark.createDataFrame(
        [(1, "u", ts(100)), (2, "u", ts(500)), (3, "v", ts(50))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", ts(40), 1.0), ("u", ts(90), 2.0), ("v", ts(49), 3.0)],
        "user_id string, ts timestamp, value double",
    )
    no_tol = {
        r.event_id: r
        for r in temporal.asof_join(
            left, right, on="user_id", value_cols=("value",)
        ).collect()
    }
    assert no_tol[2].matched_value == 2.0  # 410 s stale, still matched
    tol = {
        r.event_id: r
        for r in temporal.asof_join(
            left, right, on="user_id", value_cols=("value",),
            tolerance_us=10_000_000,  # 10 s
        ).collect()
    }
    assert tol[1].matched_value == 2.0 and tol[1].matched_ts == ts(90)
    assert tol[2].matched_value is None and tol[2].matched_ts is None
    assert tol[3].matched_value == 3.0  # exactly 1 s gap <= 10 s
    fwd = {
        r.event_id: r
        for r in temporal.asof_join(
            left, right, on="user_id", value_cols=("value",),
            direction="forward", tolerance_us=1_000_000,
        ).collect()
    }
    assert all(fwd[i].matched_value is None for i in (1, 2, 3))


def test_range_entry_matches_duckdb_iejoin(spark, ddb):
    """Driver range-join entry ≡ DuckDB's native inequality join."""
    df = temporal.q_range_click_window(spark, SF_DIR)
    assert_matches_duckdb(
        df, ddb, temporal.entry_oracles()["temporal_range_join"]
    )


def test_range_join_equals_inequality_join(spark, catalog):
    """Bucketized range join ≡ the raw inequality join it replaces."""
    events = catalog.table("events")
    left = events.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    right = (
        events.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 90 minutes")).alias("end"),
        )
    )
    got = temporal.range_join(
        left, right, on="user_id", ts_col="ts"
    ).select("event_id", "start").toPandas()
    want = (
        left.join(right, "user_id")
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
        .select("event_id", "start")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        normalize(got), normalize(want), check_dtype=False
    )
    # And the physical plan is a hash join, not a nested loop.
    plan = temporal.range_join(
        left, right, on="user_id", ts_col="ts"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gapfill_entry_matches_duckdb(spark, ddb):
    df = temporal.q_gapfill_hourly(spark, SF_DIR)
    assert_matches_duckdb(
        df, ddb, temporal.entry_oracles()["temporal_gapfill_hourly"]
    )


def test_gapfill_planted_gaps(spark):
    """Synthetic series with known holes: zero-filled counts, LOCF avg
    carried across the empty buckets, span per group (not global)."""
    import datetime as dt

    rows = [
        # group "a": buckets at hours 0, 1, 4  (holes at 2, 3)
        ("a", dt.datetime(2024, 1, 1, 0, 30), 10.0),
        ("a", dt.datetime(2024, 1, 1, 1, 15), 20.0),
        ("a", dt.datetime(2024, 1, 1, 1, 45), 40.0),
        ("a", dt.datetime(2024, 1, 1, 4, 5), 8.0),
        # group "b": single bucket — spine is that one bucket only
        ("b", dt.datetime(2024, 1, 2, 7, 10), 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    out = temporal.gapfill_resample(
        df, group_cols=("g",), bucket_seconds=3600
    ).toPandas().sort_values(["g", "bucket_start"]).reset_index(drop=True)
    a = out[out.g == "a"]
    assert len(a) == 5  # hours 0..4 inclusive
    assert a.n_events.tolist() == [1, 2, 0, 0, 1]
    assert a.sum_value.tolist() == [10.0, 60.0, 0.0, 0.0, 8.0]
    # LOCF: hour-1 avg (30.0) carries across the two empty buckets.
    assert a.locf_avg.tolist() == [10.0, 30.0, 30.0, 30.0, 8.0]
    b = out[out.g == "b"]
    assert len(b) == 1 and b.n_events.tolist() == [1]


def test_gapfill_max_buckets_guard(spark):
    """A degenerate span (rows decades apart) fails loudly instead of
    exploding a giant sequence inside one task."""
    import datetime as dt

    import pytest

    rows = [("a", dt.datetime(1970, 1, 2, 0, 0), 1.0),
            ("a", dt.datetime(2024, 1, 1, 0, 0), 2.0)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, value double")
    with pytest.raises(Exception, match="max_buckets"):
        temporal.gapfill_resample(
            df, group_cols=("g",), bucket_seconds=3600, max_buckets=1000
        ).collect()


def test_scd2_intervals_chain(spark):
    """Intervals chain per key: valid_to equals the next valid_from,
    exactly one current row per key, equal timestamps tiebreak on the
    tiebreak column."""
    from datetime import datetime

    from query_planner_optimizer_spark.operators.temporal import scd2_intervals

    rows = [
        (1, 10, datetime(2024, 1, 1), 5.0),
        (1, 11, datetime(2024, 1, 3), 6.0),
        (1, 12, datetime(2024, 1, 3), 7.0),   # same ts: id order decides
        (2, 20, datetime(2024, 2, 1), 1.0),
    ]
    changes = spark.createDataFrame(
        rows, "k long, cid long, ts timestamp, v double")
    out = scd2_intervals(changes, "k", "ts", "cid", ("cid", "v")) \
        .orderBy("k", "valid_from", "cid").collect()
    k1 = [r for r in out if r.k == 1]
    assert [r.cid for r in k1] == [10, 11, 12]
    assert k1[0].valid_to == k1[1].valid_from
    assert k1[1].valid_to == k1[2].valid_from  # equal-ts chain via cid
    assert [r.is_current for r in k1] == [False, False, True]
    k2 = [r for r in out if r.k == 2]
    assert len(k2) == 1 and k2[0].is_current and k2[0].valid_to is None


def test_ohlc_streaming_equals_batch(spark, tmp_path):
    """Streaming OHLC (watermarked window aggregation, availableNow)
    equals the batch twin over the same files — struct min/max merge
    correctly across micro-batches."""
    import pandas as pd

    from query_planner_optimizer_spark.catalog import Catalog
    from query_planner_optimizer_spark.operators.temporal import ohlc_resample
    from query_planner_optimizer_spark.streaming import windows as sw
    from .conftest import SF_DIR, normalize

    d = str(tmp_path / "ohlc_stream")
    events = Catalog(spark, SF_DIR, register_views=False).table("events")
    events.select("event_id", "ts", "user_id", "event_type", "value",
                  "props").filter("value IS NOT NULL") \
        .repartition(4).write.mode("overwrite").parquet(d)
    stream = ohlc_resample(sw.read_events_stream(spark, d),
                           watermark="2 hours")
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("ohlc_test")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ohlc_test").toPandas()
    batch = ohlc_resample(spark.read.parquet(d)).toPandas()
    pd.testing.assert_frame_equal(normalize(got), normalize(batch),
                                  check_dtype=False)
