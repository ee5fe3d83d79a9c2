"""Streaming transformations: the reference's hand-rolled loops as
Structured Streaming plans.

Each function takes a *streaming* DataFrame and returns a transformed
streaming DataFrame (composable; sinks/triggers chosen by the caller).
Batch/stream parity: these reuse the same expressions as the batch
operators in `operators/windows.py` / `operators/dedup.py`, so a backfill
(batch) and the live stream compute identical results — the Kappa
contract a 100 TB pipeline needs.

Reference anchors:
* poll loop, 2 s cadence      workers/worker_daemon.py:24-28  → trigger
* windowed counts             (north-star; no event-time in ref)
* duplicate suppression       filesystem_store.py:108-127     → T6
* stale-entity eviction       db/postgres_store.py:58-68      → T3 (watermark)
* idempotent upsert sink      db/postgres_store.py:126-184    → T5 foreachBatch
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_system_spark.operators._common import dec
from data_integration_system_spark.pipeline.writer import merge_keep_latest


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling per-window counts with late-data tolerance: events later
    than `watermark` behind the max seen ts are dropped and their windows
    finalized (the streaming analog of Q24)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "event_type", "n_events", "sum_value")
    )


def sessionized(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Session windows per user (Q26's streaming form). Watermark is what
    lets Spark finalize sessions — the declarative replacement for the
    reference's stale-job timeout reaper (T3)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id", F.session_window(ts_col, gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """T6 — duplicate suppression with bounded state: re-delivered rows
    (same key) within the watermark horizon are dropped, state is evicted
    past it. The streaming form of the visited-set (D2) that can't grow
    without bound."""
    return stream.withWatermark(ts_col, watermark).dropDuplicates(keys)


def upsert_sink(
    target_path: str,
    key: str,
    version_col: str,
    spark: SparkSession,
):
    """T5 — effectively-once sink: at-least-once delivery + idempotent
    keep-latest MERGE per micro-batch (db/postgres_store.py:126-184's
    contract). Returns a foreachBatch callable.

    Each batch: read current table → merge_keep_latest → atomic overwrite.
    Re-running a batch (at-least-once) converges to the same table. At
    scale the overwrite becomes a Delta/Iceberg MERGE; the classify/merge
    logic is identical (pipeline/writer.py)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        try:
            current = spark.read.parquet(target_path)
        except Exception:
            current = None
        if current is not None and current.columns:
            merged = merge_keep_latest(current, batch, key, version_col)
        else:
            merged = batch
        # localCheckpoint breaks the read->overwrite self-dependency
        merged.localCheckpoint().write.mode("overwrite").parquet(target_path)

    return apply


def pending_job_picker(jobs_stream: DataFrame) -> DataFrame:
    """T1/S14 — the job-queue poll (SELECT ... WHERE status='PENDING'
    ORDER BY created_at, db/postgres_store.py:26-43) as a streaming
    filter; the 2 s poll cadence (worker_daemon.py:27) becomes the
    caller's `trigger(processingTime="2 seconds")`, and the SKIP LOCKED
    claim race disappears — the stream owns its input exactly once."""
    return jobs_stream.filter(F.col("status") == "PENDING")


def running_user_totals(events: DataFrame):
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value total maintained ACROSS micro-batches —
    the arbitrary-state surface (T2/T3's hand-rolled per-entity state,
    crawler visited-sets and stale-job bookkeeping, done properly).

    State = (n_events, total_value) per user_id; each batch folds its
    rows into the state and emits the updated snapshot.  At scale state
    lives in the state store (RocksDB in prod conf), partitioned by the
    group key; eviction belongs to a timeout conf (NoTimeout here — the
    test drives a bounded input)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        import pandas as pd  # local import: runs on workers

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 2)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
