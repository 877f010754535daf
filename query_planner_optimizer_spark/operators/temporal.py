"""Temporal joins: as-of and range joins — operators Spark's join
syntax lacks (no ASOF keyword), expressed as compositions of built-in
DataFrame ops so Catalyst still plans the shuffles.

- :func:`asof_join` — for each left row, the single right row with the
  greatest right.ts <= left.ts (``backward``; ``forward`` mirrors with
  the smallest right.ts >= left.ts) within the same key. Implemented as
  the union/carry-forward trick: tag both sides, sort each key's rows by
  (ts, side), and carry the latest right values forward with
  ``last(..., ignorenulls)`` over an unbounded-preceding window. ONE
  shuffle on the key — never a per-row range probe, never a cross join.
  This is the standard distributed as-of shape (the merge in
  pandas.merge_asof, done with a window instead of a sorted walk).
- :func:`range_join` — inequality-band join (left.ts within
  [right.start, right.end)) bucketized to an equi-join on coarse time
  buckets + residual filter, so the planner gets a hash join key
  instead of a BroadcastNestedLoopJoin over the raw inequality.

DuckDB has native ``ASOF JOIN`` — the driver oracle uses it, giving an
independent implementation to hash-match against.

Tie/duplicate discipline: if several right rows share (key, ts) the
match would be ambiguous; callers dedupe the right side first (the
driver entry keeps the max event_id per (user, ts), mirrored in the
oracle SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from query_planner_optimizer_spark.dsl.compiler import agg_decimal_scale
from query_planner_optimizer_spark.functions.rounding import (
    round_half_up,
    sql_round_half_up as _rs,
)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    direction: str = "backward",
    suffix: str = "matched",
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join: attach the temporally nearest right row per left row.

    ``backward``: greatest right ts <= left ts. ``forward``: smallest
    right ts >= left ts. Output = every left column plus
    ``{suffix}_ts`` and ``{suffix}_<col>`` for each value column
    (NULL when no qualifying right row exists).

    ``tolerance_us`` (pandas ``merge_asof(tolerance=...)`` parity):
    matches farther than this many microseconds from the left row are
    nulled out — a stale quote/click should not attach to a trade/
    purchase hours later. Applied as a post-carry column rewrite (no
    extra shuffle); uses epoch micros so TIMESTAMP and TIMESTAMP_NTZ
    inputs behave identically.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")

    left_cols = left.columns
    lhs = left.select(
        *left_cols,
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__r_ts"),
    )
    rhs = right.select(
        F.col(on),
        F.col(ts_col),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.col(ts_col).alias("__r_ts"),
    )
    # Missing left-only columns on the right side become NULLs.
    for c in left_cols:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rhs = rhs.select(*lhs.columns)
    both = lhs.unionByName(rhs)

    # Sort order: backward scans time ascending with right rows first at
    # equal ts (so a right row at exactly left.ts matches — <=);
    # forward scans descending with right rows first (>=). last() with
    # ignorenulls then carries the nearest right row onto each left row.
    if direction == "backward":
        order = [F.col(ts_col).asc(), F.col("__is_left").asc()]
    else:
        order = [F.col(ts_col).desc(), F.col("__is_left").asc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.select(
        *left_cols,
        F.col("__is_left"),
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"{suffix}_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{suffix}_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__is_left") == 1).drop("__is_left")
    if tolerance_us is not None:
        from query_planner_optimizer_spark.functions.timeexpr import (
            epoch_micros,
        )

        mts = F.col(f"{suffix}_ts")
        if direction == "backward":
            gap = epoch_micros(F.col(ts_col)) - epoch_micros(mts)
        else:
            gap = epoch_micros(mts) - epoch_micros(F.col(ts_col))
        ok = mts.isNotNull() & (gap <= F.lit(int(tolerance_us)))
        matched = [f"{suffix}_ts"] + [f"{suffix}_{c}" for c in value_cols]
        out = out.select(
            *[
                F.when(ok, F.col(c)).alias(c) if c in matched else F.col(c)
                for c in out.columns
            ]
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_unit: str = "hour",
) -> DataFrame:
    """Band join: left rows whose ``ts`` falls in a right row's
    [start, end) interval, same key. Both sides bucketize to coarse time
    buckets (the right side explodes once per overlapped bucket) and
    hash-join on (key, bucket) before the exact residual filter — the
    planner never sees a raw inequality join, so no nested-loop
    fallback. Pick ``bucket_unit`` near the typical interval length:
    fan-out is ceil(interval/bucket)+1 rows per right interval.
    """
    step = F.expr(f"INTERVAL 1 {bucket_unit}")
    lb = left.withColumn("__bkt", F.date_trunc(bucket_unit, F.col(ts_col)))
    rb = right.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.date_trunc(bucket_unit, F.col(start_col)),
                F.date_trunc(bucket_unit, F.col(end_col)),
                step,
            )
        ),
    )
    joined = lb.join(rb, [on, "__bkt"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__bkt")


# --------------------------------------------------------------------------
# Driver entry: attach the most recent prior click to every purchase.
# --------------------------------------------------------------------------

def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.catalog import Catalog

    events = Catalog(spark, sf_dir, register_views=False).table("events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = _dedup_clicks(events)
    out = asof_join(
        purchases, clicks, on="user_id", ts_col="ts", value_cols=("value",)
    )
    return out.select(
        "event_id", "user_id", "ts",
        round_half_up(F.col("value"), 6).alias("purchase_value"),
        "matched_ts",
        round_half_up(F.col("matched_value"), 6).alias("click_value"),
    )


def _dedup_clicks(events: DataFrame) -> DataFrame:
    """One click per (user, ts): max event_id wins (tie discipline
    mirrored in the oracle SQL)."""
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    return (
        events.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def q_range_click_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases landing inside a [click, click + 2 h) window of the
    same user — the bucketized range join (hash equi-join on
    (user, hour-bucket) + residual band filter; no nested-loop plan).
    The oracle states the same band join as a raw inequality, which
    DuckDB plans natively (IEJoin) — two independent implementations."""
    from query_planner_optimizer_spark.catalog import Catalog

    events = Catalog(spark, sf_dir, register_views=False).table("events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    wins = _dedup_clicks(events).select(
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
    )
    out = range_join(
        purchases, wins, on="user_id", ts_col="ts",
        start_col="win_start", end_col="win_end", bucket_unit="hour",
    )
    return out.select(
        "event_id", "user_id", "ts",
        round_half_up(F.col("value"), 6).alias("purchase_value"),
        "win_start", "win_end",
    )


def gapfill_resample(
    events: DataFrame,
    group_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    value_col: str = "value",
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Fixed-interval resample with gap filling (timeseries rollup à la
    TimescaleDB ``time_bucket_gapfill``): bucket rows into
    ``bucket_seconds`` intervals per group, then materialize EVERY
    bucket between each group's first and last observation — counts and
    sums zero-filled, the per-bucket average carried forward (LOCF)
    across empty buckets.

    Distribution: the spine is built executor-side with
    ``sequence() + explode`` on the per-group [min, max] span — one row
    per group feeds the generator, so there is no driver loop and no
    global window; the spine joins back on (group, bucket) as a plain
    equi-join and the LOCF window partitions by group. Buckets are
    BIGINT epoch seconds (integer generate_series in the oracle — no
    timestamp-zone semantics in the compare).

    ``max_buckets`` bounds the per-group span: a degenerate input (one
    row in 1970, one today) would otherwise explode a billion-element
    array inside a single task. Exceeding it raises loudly
    (``assert_true``) rather than OOMing an executor.
    """
    from query_planner_optimizer_spark.functions.timeexpr import epoch_micros

    step_us = bucket_seconds * 1_000_000
    gcols = list(group_cols)
    bucket = (
        F.floor(epoch_micros(F.col(ts_col)) / F.lit(step_us))
        .cast("long") * bucket_seconds
    ).alias("bucket_start")
    # DECIMAL accumulation for the rounded sum/avg — double += is not
    # associative, and an ulp drift straddling the ROUND(…, 6) boundary
    # diverges from the oracle (caught by the sf0.1 full sweep: one
    # bucket flipped 43.472812 vs 43.472813). Same idiom as the DSL
    # compiler's rounded aggregates (scale-12 accumulator, FLOOR
    # half-up for the AVG quotient — functions/rounding.py); the
    # oracle mirrors it.
    dec = T.DecimalType(38, agg_decimal_scale(6))
    dsum = F.sum(F.col(value_col).cast(dec))
    agg = events.groupBy(*gcols, bucket).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(dsum, 6).cast("double").alias("sum_value"),
        round_half_up(dsum.cast("double") / F.count(F.lit(1)), 6)
        .alias("__avg"),
    )
    # The span guard lives INSIDE the __mx expression (a pruned side
    # column would be optimized away before it ever evaluated): any
    # group spanning more than max_buckets buckets raises loudly.
    spans = agg.groupBy(*gcols).agg(
        F.min("bucket_start").alias("__mn"),
        F.max("bucket_start").alias("__mx"),
    ).withColumn(
        "__mx",
        F.when(
            (F.col("__mx") - F.col("__mn")) / bucket_seconds
            < F.lit(max_buckets),
            F.col("__mx"),
        ).otherwise(
            F.raise_error(
                F.lit(f"gapfill span exceeds max_buckets={max_buckets}")
            )
        ),
    )
    spine = spans.select(
        *gcols,
        F.explode(
            F.sequence("__mn", "__mx", F.lit(bucket_seconds))
        ).alias("bucket_start"),
    )
    out = spine.join(agg, [*gcols, "bucket_start"], "left")
    w = (
        Window.partitionBy(*gcols).orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.select(
        *gcols,
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        F.last("__avg", ignorenulls=True).over(w).alias("locf_avg"),
    )


def q_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.catalog import Catalog

    events = Catalog(spark, sf_dir, register_views=False).table("events")
    return gapfill_resample(events, group_cols=("event_type",))


GAPFILL_ORACLE = f"""
WITH agg AS (
    SELECT event_type,
           CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) * 3600
               AS bucket_start,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(38, 12))), 6) AS DOUBLE)
               AS sum_value,
           {_rs('''CAST(SUM(CAST(value AS DECIMAL(38, 12))) AS DOUBLE)
                 / COUNT(*)''', 6)} AS avg_v
    FROM events GROUP BY 1, 2
),
spans AS (
    SELECT event_type, MIN(bucket_start) AS mn, MAX(bucket_start) AS mx
    FROM agg GROUP BY 1
),
spine AS (
    SELECT event_type, UNNEST(generate_series(mn, mx, 3600)) AS bucket_start
    FROM spans
)
SELECT s.event_type, s.bucket_start,
       COALESCE(a.n_events, 0) AS n_events,
       COALESCE(a.sum_value, 0.0) AS sum_value,
       LAST_VALUE(a.avg_v IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.bucket_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_avg
FROM spine s LEFT JOIN agg a USING (event_type, bucket_start)
"""


def scd2_intervals(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_cols: tuple[str, ...],
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change log: each
    change row becomes a validity interval ``[valid_from, valid_to)``
    where ``valid_to`` is the NEXT change's timestamp for the same key
    (NULL = still current). The standard build step for dimension
    history that :func:`asof_join` then queries point-in-time.

    One window per key ordered by (ts, tiebreak) — the tiebreak makes
    the order total so equal-timestamp changes chain deterministically
    instead of racing. Per-key partitions are bounded by a key's change
    count (dimension keys change rarely); there is no global sort and
    no driver participation.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    return changes.select(
        F.col(key_col),
        *[F.col(c) for c in value_cols],
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
        F.lead(F.col(ts_col)).over(w).isNull().alias("is_current"),
    )


def q_scd2_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each user's signup-event values: every signup is
    a 'change' to the user's profile value; intervals chain per user."""
    from query_planner_optimizer_spark.catalog import Catalog

    events = Catalog(spark, sf_dir, register_views=False).table("events")
    changes = events.filter(F.col("event_type") == "signup").select(
        "user_id", "event_id", "ts",
        round_half_up(F.col("value"), 6).alias("value")
    )
    return scd2_intervals(
        changes, key_col="user_id", ts_col="ts",
        tiebreak_col="event_id", value_cols=("event_id", "value"),
    )


def ohlc_resample(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "hour",
    watermark: str | None = None,
) -> DataFrame:
    """OHLC (open/high/low/close) time-series resample per (bucket,
    key) — the financial-rollup shape of a tick pipeline. Open/close
    use the argmin/argmax STRUCT idiom (min/max of (ts, id, value)
    structs — one shuffle with map-side partial merge, one struct per
    (task, bucket, key)), never a sorted window over the raw stream;
    the id tiebreak makes equal-timestamp ticks deterministic. Volume
    accumulates in DECIMAL per the engine's rounded-sum discipline.
    Null values are the caller's concern (the entry filters them).

    Streaming mode (``watermark`` set on a streaming frame): the same
    aggregation runs as a watermarked windowed agg — struct min/max are
    mergeable, so late ticks update open/close correctly until the
    watermark closes the bucket; state is one OHLC accumulator per
    live (bucket, key).
    """
    if watermark is not None:
        # Streaming needs the event-time window() form for state
        # eviction (date_trunc is not watermark-trackable); its .start
        # equals date_trunc for tumbling 1-unit windows, so batch and
        # stream emit identical bucket values.
        events = events.withWatermark(ts_col, watermark)
        group_expr = F.window(F.col(ts_col), f"1 {bucket}").alias("__w")
        bucket_out = F.col("__w.start").alias("bucket")
    else:
        group_expr = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
        bucket_out = F.col("bucket")
    tick = F.struct(F.col(ts_col), F.col(id_col), F.col(value_col))
    dec = T.DecimalType(38, agg_decimal_scale(4))
    agg = (
        events.groupBy(group_expr, F.col(key_col))
        .agg(
            F.min(tick).alias("__first"),
            F.max(tick).alias("__last"),
            round_half_up(F.max(value_col), 6).alias("high"),
            round_half_up(F.min(value_col), 6).alias("low"),
            F.count(value_col).alias("n_ticks"),
            F.round(F.sum(F.col(value_col).cast(dec)), 4)
            .cast("double").alias("volume"),
        )
    )
    return agg.select(
        bucket_out, key_col,
        round_half_up(F.col(f"__first.{value_col}"), 6).alias("open"),
        round_half_up(F.col(f"__last.{value_col}"), 6).alias("close"),
        "high", "low", "n_ticks", "volume",
    )


def linear_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "30 minutes",
) -> DataFrame:
    """Linear multi-touch attribution: every purchase's value splits
    EQUALLY across the same-user clicks in the preceding ``window``
    (vs. the last-touch model :func:`asof_join` implements). Built on
    the interval join's bounded pair set plus one per-purchase count —
    credit = purchase_value / n_touches, one portable division.
    Purchases with no qualifying click produce no credit rows (an
    un-attributable conversion), exactly the inner interval join's
    semantics. Returns (click_id, purchase_id, user_id, credit).
    """
    from query_planner_optimizer_spark.streaming.windows import interval_join

    pairs = interval_join(clicks, purchases, window=window)
    n = pairs.groupBy("purchase_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        pairs.join(n, "purchase_id")
        .select(
            "click_id", "purchase_id", "user_id",
            round_half_up(
                F.col("purchase_value") / F.col("__n").cast("double"), 6
            ).alias("credit"),
        )
    )


def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.catalog import Catalog

    events = Catalog(spark, sf_dir, register_views=False).table("events")
    return linear_attribution(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    )


def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.catalog import Catalog

    events = Catalog(spark, sf_dir, register_views=False).table("events")
    return ohlc_resample(events.filter(F.col("value").isNotNull()))


def entry_queries() -> dict[str, Callable]:
    return {"temporal_asof_join": q_asof_purchase_click,
            "temporal_range_join": q_range_click_window,
            "temporal_gapfill_hourly": q_gapfill_hourly,
            "temporal_scd2_intervals": q_scd2_user_values,
            "temporal_ohlc_hourly": q_ohlc_hourly,
            "temporal_linear_attribution": q_linear_attribution}


def entry_oracles() -> dict[str, str]:
    asof = f"""
        WITH purchases AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT event_id, user_id, ts, value FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click'
            ) WHERE rn = 1
        )
        SELECT p.event_id, p.user_id, p.ts,
               {_rs('p.value', 6)} AS purchase_value,
               c.ts AS matched_ts,
               {_rs('c.value', 6)} AS click_value
        FROM purchases p
        ASOF LEFT JOIN clicks c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    """
    range_sql = f"""
        WITH purchases AS (
            SELECT event_id, user_id, ts, value FROM events
            WHERE event_type = 'purchase'
        ),
        clicks AS (
            SELECT user_id, ts FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click'
            ) WHERE rn = 1
        ),
        wins AS (
            SELECT user_id, ts AS win_start,
                   ts + INTERVAL 2 HOUR AS win_end
            FROM clicks
        )
        SELECT p.event_id, p.user_id, p.ts,
               {_rs('p.value', 6)} AS purchase_value,
               w.win_start, w.win_end
        FROM purchases p
        JOIN wins w
          ON p.user_id = w.user_id
         AND p.ts >= w.win_start AND p.ts < w.win_end
    """
    scd2 = f"""
        SELECT user_id, event_id, {_rs('value', 6)} AS value,
               ts AS valid_from,
               lead(ts) OVER w AS valid_to,
               (lead(ts) OVER w IS NULL) AS is_current
        FROM events
        WHERE event_type = 'signup'
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """
    ohlc = f"""
        WITH r AS (
            SELECT date_trunc('hour', ts) AS bucket, event_type, value,
                   row_number() OVER (
                       PARTITION BY date_trunc('hour', ts), event_type
                       ORDER BY ts ASC, event_id ASC) AS rn_a,
                   row_number() OVER (
                       PARTITION BY date_trunc('hour', ts), event_type
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events WHERE value IS NOT NULL
        )
        SELECT bucket, event_type,
               {_rs('MAX(CASE WHEN rn_a = 1 THEN value END)', 6)} AS open,
               {_rs('MAX(CASE WHEN rn_d = 1 THEN value END)', 6)} AS close,
               {_rs('MAX(value)', 6)} AS high,
               {_rs('MIN(value)', 6)} AS low,
               COUNT(value) AS n_ticks,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(38, 12))), 4)
                    AS DOUBLE) AS volume
        FROM r GROUP BY bucket, event_type
    """
    return {"temporal_asof_join": asof, "temporal_range_join": range_sql,
            "temporal_gapfill_hourly": GAPFILL_ORACLE,
            "temporal_scd2_intervals": scd2,
            "temporal_ohlc_hourly": ohlc,
            "temporal_linear_attribution": f"""
        WITH pairs AS (
            SELECT c.event_id AS click_id, p.event_id AS purchase_id,
                   c.user_id,
                   {_rs('p.value', 6)} AS purchase_value
            FROM events c JOIN events p
              ON c.user_id = p.user_id
             AND p.ts >= c.ts
             AND p.ts < c.ts + INTERVAL '30 minutes'
            WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        ),
        n AS (
            SELECT purchase_id, COUNT(*) AS nc FROM pairs GROUP BY 1
        )
        SELECT pairs.click_id, pairs.purchase_id, pairs.user_id,
               {_rs('pairs.purchase_value / CAST(n.nc AS DOUBLE)', 6)}
                   AS credit
        FROM pairs JOIN n USING (purchase_id)
    """}
