"""Custom stateful streaming operator: ordered funnel detection.

The one streaming shape built-in windowed aggregation genuinely cannot
express (SURVEY.md §2.5 notes the reference's funnel hint at
``claude.md:62`` is never exercised): match an ORDERED stage sequence
per key — here view → click → purchase, each stage strictly after the
previous match — with state carried across micro-batches.

Greedy-minimum semantics (deterministic, oracle-expressible): stage 1
matches at the earliest qualifying event; stage k at the earliest event
of its type strictly later than the stage k-1 match. Greedy matching is
complete: a funnel completes under greedy iff any ordered chain exists.

Two physical forms over one shared per-user walk:

- :func:`funnel_batch` — ``groupBy(user).applyInPandas``: Arrow-batched
  per-key walk over the full history. The DuckDB oracle is the chained
  min-join SQL in :func:`entry_oracles`.
- :func:`funnel_stream` — ``applyInPandasWithState``: the same walk
  resumed from a (stage, match-timestamps) state tuple each
  micro-batch; emits a snapshot per updated key per batch. Tests prove
  availableNow streaming snapshots converge to the batch result.

Scale: both forms shuffle once on the key; state per key is four
scalars, so the state store stays tiny regardless of event volume.
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Default funnel over the driver's events table (TESTDATA.md types).
FUNNEL_STAGES = ("view", "click", "purchase")

OUTPUT_SCHEMA = (
    "user_id bigint, stages_completed int, view_ts timestamp, "
    "click_ts timestamp, purchase_ts timestamp"
)

#: Streaming state: stage index + per-stage match epoch-micros (-1 = unset).
STATE_SCHEMA = "completed int, t1 long, t2 long, t3 long"

_UNSET = -1


def _ts_us(ts: pd.Series) -> pd.Series:
    """Timestamps → epoch microseconds (Spark timestamp precision)."""
    return ts.astype("datetime64[ns]").astype("int64") // 1000


def _walk(
    events: pd.DataFrame,
    stages: tuple[str, ...],
    completed: int,
    match_us: list[int],
) -> tuple[int, list[int]]:
    """Advance one user's funnel over a batch of events. Vectorized per
    STAGE, not per event: the greedy match for stage k is simply the
    minimum qualifying timestamp (> stage k-1's match), so each stage is
    one boolean mask + min. ``match_us`` holds epoch-microsecond match
    times (_UNSET when unmatched)."""
    if len(events) == 0 or completed >= len(stages):
        return completed, match_us
    ts_us = _ts_us(events["ts"])
    types = events["event_type"]
    last = match_us[completed - 1] if completed > 0 else None
    for k in range(completed, len(stages)):
        mask = types == stages[k]
        if last is not None:
            mask &= ts_us > last
        if not mask.any():
            break
        last = int(ts_us[mask].min())
        match_us[k] = last
        completed = k + 1
    return completed, match_us


def _snapshot(user_id: Any, completed: int, match_us: list[int]) -> pd.DataFrame:
    cols: dict[str, Any] = {"user_id": [user_id], "stages_completed": [completed]}
    for name, us in zip(("view_ts", "click_ts", "purchase_ts"), match_us):
        cols[name] = [pd.Timestamp(us, unit="us") if us != _UNSET else pd.NaT]
    return pd.DataFrame(cols)


def funnel_batch(
    events: DataFrame,
    stages: tuple[str, ...] = FUNNEL_STAGES,
    key_col: str = "user_id",
) -> DataFrame:
    """Batch funnel: one row per user with stage progress + match times.

    Physical shape: ONE shuffle (repartition by key) then mapInPandas,
    with the whole partition's users chained in vectorized pandas
    (stage k = one groupby-min over qualifying events) — not one Arrow
    round-trip per user, which dominates wall time at high key
    cardinality. Executor memory holds one partition of (key, ts, type)
    triples, sized by the partition count upstream."""

    ts_names = ("view_ts", "click_ts", "purchase_ts")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(batches), ignore_index=True)
        if len(pdf) == 0:
            return
        work = pd.DataFrame(
            {
                "k": pdf[key_col],
                "t": _ts_us(pdf["ts"]),
                "e": pdf["event_type"],
            }
        )
        out = pd.DataFrame(
            {"user_id": work["k"].unique()}
        ).set_index("user_id")
        last: pd.Series | None = None
        for name, stage in zip(ts_names, stages):
            sel = work[work["e"] == stage]
            if last is not None:
                prior = sel["k"].map(last)
                sel = sel[sel["t"] > prior]  # NaN prior → False → drop
            mins = sel.groupby("k")["t"].min()
            out[name] = out.index.map(mins)
            last = mins
        out["stages_completed"] = out[list(ts_names)].notna().sum(axis=1)
        res = out.reset_index()
        res["stages_completed"] = res["stages_completed"].astype("int32")
        for name in ts_names:
            res[name] = pd.to_datetime(res[name], unit="us")
        yield res[["user_id", "stages_completed", *ts_names]]

    return (
        events.select(key_col, "ts", "event_type")
        .withColumnRenamed(key_col, "user_id")
        .repartition("user_id")
        .mapInPandas(run, schema=OUTPUT_SCHEMA)
    )


def funnel_stream(
    events: DataFrame,
    stages: tuple[str, ...] = FUNNEL_STAGES,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming funnel via applyInPandasWithState: emits the post-batch
    snapshot for every key that received events in the micro-batch. The
    LAST snapshot per key equals :func:`funnel_batch` over the same data
    (snapshots are monotone: a matched stage timestamp never changes)."""

    def run(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            completed, *match_us = state.get
            match_us = list(match_us)
        else:
            completed, match_us = 0, [_UNSET] * len(stages)
        for pdf in pdfs:
            completed, match_us = _walk(pdf, stages, completed, match_us)
        state.update((completed, *match_us))
        yield _snapshot(key[0], completed, match_us)

    return (
        events.select(key_col, "ts", "event_type")
        .groupBy(key_col)
        .applyInPandasWithState(
            run,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# Heavy hitters (space-saving sketch): approximate per-group top-k item
# frequencies with bounded state — the streaming answer to "top users /
# domains / tokens right now" when the item domain is unbounded.
# --------------------------------------------------------------------------

#: Sketch capacity: counters kept per group. With capacity >= distinct
#: items the sketch is EXACT (no eviction ever fires) — the driver-entry
#: regime; under-capacity regimes carry the classic space-saving bound
#: (true <= est <= true + max_err, max_err <= N/capacity).
HH_CAPACITY = 65536
HH_K = 10

HH_OUTPUT_SCHEMA = (
    "grp string, item bigint, est_count bigint, max_err bigint, rank int"
)
HH_STATE_SCHEMA = (
    "items array<bigint>, counts array<bigint>, errs array<bigint>"
)


def _ss_merge(
    counter: dict[int, list[int]], batch_counts: pd.Series, capacity: int
) -> None:
    """Merge a batch's per-item counts into a space-saving counter dict
    (item -> [count, err]) — the mergeable-summaries formulation: an
    unseen item under a full counter evicts the current minimum and
    inherits its count as overestimation error.

    The eviction minimum comes from a lazy-deletion heap (r10): the
    first cut scanned all ``capacity`` counters per eviction, which the
    capped regime hits once per unseen item — O(items·capacity) per
    batch, measured 100× slower than linear at the 100× smoke
    (scripts/stream_scale_smoke.py). The heap keeps the identical
    (count, item) eviction order — stale entries (an updated or evicted
    item's old count) are skipped on pop — so results are bit-identical
    to the scan form at every capacity."""
    heap = [(ce[0], i) for i, ce in counter.items()]
    heapq.heapify(heap)
    for item, c in batch_counts.items():
        ent = counter.get(item)
        if ent is not None:
            ent[0] += int(c)
            heapq.heappush(heap, (ent[0], item))
        elif len(counter) < capacity:
            counter[item] = [int(c), 0]
            heapq.heappush(heap, (int(c), item))
        else:
            while True:
                cnt, i = heap[0]
                cur = counter.get(i)
                if cur is not None and cur[0] == cnt:
                    break
                heapq.heappop(heap)  # stale: updated or evicted
            heapq.heappop(heap)
            del counter[i]
            counter[item] = [cnt + int(c), cnt]
            heapq.heappush(heap, (cnt + int(c), item))


def _ss_topk(grp: Any, counter: dict[int, list[int]], k: int) -> pd.DataFrame:
    top = sorted(counter.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    return pd.DataFrame(
        {
            "grp": [grp] * len(top),
            "item": [i for i, _ in top],
            "est_count": [ce[0] for _, ce in top],
            "max_err": [ce[1] for _, ce in top],
            "rank": pd.Series(range(1, len(top) + 1), dtype="int32"),
        }
    )


def heavy_hitters_batch(
    events: DataFrame,
    group_col: str = "event_type",
    item_col: str = "user_id",
    k: int = HH_K,
    capacity: int = HH_CAPACITY,
) -> DataFrame:
    """Batch twin of the streaming sketch: with ``capacity >= distinct
    items`` the result is the EXACT top-k (count desc, item asc), which
    is what the SQL oracle states.

    Scale shape (r10, sf1 protocol finding): the per-item counting runs
    JVM-side as a partial-combined ``groupBy(group, item).count()`` —
    the raw corpus never crosses into Python. The Python stage (the
    space-saving walk, kept so batch and stream share ONE sketch
    definition) sees one row per DISTINCT item per group, i.e. the
    aggregated summary, which at any scale is the sketch's own input
    size, not the event volume. Feeding exact per-item counts in one
    merge is the same semantics as before (the whole history was one
    ``value_counts`` batch); the merge order is pinned to
    (count desc, item asc) so the under-capacity regime is
    deterministic too, where the old raw-rows form inherited pandas
    tie order from shuffle arrival."""

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        counter: dict[int, list[int]] = {}
        ordered = pdf.sort_values(
            ["__c", item_col], ascending=[False, True]
        )
        _ss_merge(
            counter,
            pd.Series(ordered["__c"].values, index=ordered[item_col]),
            capacity,
        )
        return _ss_topk(key[0], counter, k)

    counts = (
        events.select(group_col, item_col)
        .groupBy(group_col, item_col)
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return counts.groupBy(group_col).applyInPandas(
        run, schema=HH_OUTPUT_SCHEMA
    )


def heavy_hitters_stream(
    events: DataFrame,
    group_col: str = "event_type",
    item_col: str = "user_id",
    k: int = HH_K,
    capacity: int = HH_CAPACITY,
) -> DataFrame:
    """Streaming heavy hitters via ``applyInPandasWithState``: the
    counter arrays persist per group across micro-batches; each batch
    emits that group's current top-k snapshot (update mode). State is
    bounded by ``capacity`` counters per group REGARDLESS of the item
    domain's cardinality — the whole point of the sketch at stream
    scale. In the exact regime the final snapshot equals
    :func:`heavy_hitters_batch` (pinned in tests, any batch split)."""

    def run(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errs = state.get
            counter = {
                int(i): [int(c), int(e)]
                for i, c, e in zip(items, counts, errs)
            }
        else:
            counter = {}
        for pdf in pdfs:
            _ss_merge(counter, pdf[item_col].value_counts(), capacity)
        state.update((
            list(counter.keys()),
            [ce[0] for ce in counter.values()],
            [ce[1] for ce in counter.values()],
        ))
        yield _ss_topk(key[0], counter, k)

    return (
        events.select(group_col, item_col)
        .groupBy(group_col)
        .applyInPandasWithState(
            run,
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# Driver entry — the batch twin, with the chained min-join SQL oracle.
# --------------------------------------------------------------------------

def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.catalog import Catalog

    events = Catalog(spark, sf_dir, register_views=False).table("events")
    return funnel_batch(events)


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from query_planner_optimizer_spark.catalog import Catalog

    events = Catalog(spark, sf_dir, register_views=False).table("events")
    # Exact regime (capacity >> distinct users): the oracle states the
    # exact top-k; the under-capacity sketch is bound-tested in pytest.
    # The oracle is only VALID in that regime — if a regenerated driver
    # corpus ever crosses capacity, eviction fires and the entry would
    # silently flip to a wrong-answer hash mismatch. Assert the regime
    # up front so a violation surfaces as a loud setup error instead
    # (sf0.1 today: ~1.5k distinct users/group vs 65,536 — 43× headroom).
    worst = (
        events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .agg(F.max("n").alias("m"))
        .first()[0]
    )
    if worst is not None and worst >= HH_CAPACITY:
        raise RuntimeError(
            f"stream_heavy_hitters oracle regime violated: a group has "
            f"{worst} distinct items >= capacity {HH_CAPACITY}; the "
            f"space-saving sketch would evict and the exact-top-k oracle "
            f"no longer applies. Raise HH_CAPACITY for the driver entry."
        )
    return heavy_hitters_batch(events)


def entry_queries():
    return {"stream_funnel": q_funnel,
            "stream_heavy_hitters": q_heavy_hitters}


def entry_oracles() -> dict[str, str]:
    v, c, p = FUNNEL_STAGES
    funnel = f"""
        WITH s1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = '{v}' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN s1 USING (user_id)
            WHERE e.event_type = '{c}' AND e.ts > s1.t1
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN s2 USING (user_id)
            WHERE e.event_type = '{p}' AND e.ts > s2.t2
            GROUP BY e.user_id
        )
        SELECT u.user_id,
               CAST(CASE WHEN t3 IS NOT NULL THEN 3
                         WHEN t2 IS NOT NULL THEN 2
                         WHEN t1 IS NOT NULL THEN 1
                         ELSE 0 END AS INTEGER) AS stages_completed,
               t1 AS view_ts, t2 AS click_ts, t3 AS purchase_ts
        FROM (SELECT DISTINCT user_id FROM events) u
        LEFT JOIN s1 USING (user_id)
        LEFT JOIN s2 USING (user_id)
        LEFT JOIN s3 USING (user_id)
    """
    hh = f"""
        SELECT grp, item, est_count, CAST(0 AS BIGINT) AS max_err, rank
        FROM (
            SELECT event_type AS grp, user_id AS item,
                   COUNT(*) AS est_count,
                   CAST(row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY COUNT(*) DESC, user_id ASC) AS INTEGER)
                       AS rank
            FROM events GROUP BY event_type, user_id
        ) WHERE rank <= {HH_K}
    """
    return {"stream_funnel": funnel, "stream_heavy_hitters": hh}
