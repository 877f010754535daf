"""Streaming rollup maintenance: Structured Streaming keeps the
router's pre-aggregates fresh as data lands.

The reference rebuilds its aggregate tables in a batch prepare step
(``prepare.py:138-144``); the Spark-first engine additionally maintains
them CONTINUOUSLY: a file-source stream of landed event parquet feeds
``prepare.refresh_rollups`` one micro-batch at a time via
``foreachBatch``. Because every stored measure is a sum-mergeable
partial (DECIMAL sums + long counts — ``prepare.rollup_frame``), the
merge is associative and the maintained rollup is BIT-identical to a
from-scratch rebuild no matter how the stream was chopped into batches
— which is exactly what lets the routed answer over a streamed-in
rollup hash-match the raw-scan oracle.

Delivery semantics: the file source's checkpoint gives at-least-once
replay of uncommitted batches; exactly-once comes from the PER-ROLLUP
batch marker committed INSIDE each rollup dir by the same atomic
rename that commits the folded data (``prepare.refresh_rollups``'s
``batch_id`` path, r7). A crash at ANY point — mid-fold, between the
swap and any bookkeeping, mid-multi-rollup — replays the batch, and
each rollup independently skips or re-folds exactly according to its
own committed marker. The agg_dir-level ``_last_batch`` file remains
as a cheap whole-batch fast path and a progress record; correctness
no longer depends on it.

Scale: each micro-batch shuffles |batch grain| + |rollup grain| rows —
delta-bounded, never the fact table; the stream never holds aggregate
state in memory (the rollup ON DISK is the state), so there is no
watermark and no state store to size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def streaming_rollup_maintenance(
    spark: SparkSession,
    landing_dir: str,
    agg_dir: str,
    checkpoint_dir: str,
    rollups: dict[str, dict],
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
):
    """Start (and return) the maintenance stream. Landing files must
    carry the rollup key columns (write them from an augmented frame —
    the derived time columns are ordinary columns on disk). Callers
    ``awaitTermination`` on the returned query; with
    ``trigger(availableNow=True)`` the run is finite."""
    from query_planner_optimizer_spark.prepare import refresh_rollups

    os.makedirs(agg_dir, exist_ok=True)
    marker = os.path.join(agg_dir, "_last_batch")

    def _last() -> int:
        if os.path.exists(marker):
            txt = open(marker).read().strip()
            return int(txt) if txt else -1
        return -1

    def apply_batch(batch_df, batch_id: int) -> None:
        if batch_id <= _last():
            return  # fast path: whole batch already folded + recorded
        refresh_rollups(spark, batch_df, agg_dir, rollups,
                        batch_id=batch_id)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, marker)

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(landing_dir)
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
