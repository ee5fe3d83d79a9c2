"""Table maintenance for long-lived parquet stores.

An incremental pipeline (generation-checkpointed crawls, per-batch
upserts, streaming foreachBatch sinks) accretes small files; at 100 TB
the file COUNT, not the byte count, becomes the scan bottleneck (driver
listing, task-per-file scheduling, row-group overhead).  Compaction is
the standing maintenance job every production lake runs.

The reference has no analog (its stores are Postgres rows and
per-page JSON files, filesystem_store.py) — this is Spark-side
operational hygiene for the sinks writer.py introduces.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from data_integration_system_spark.pipeline.fsutil import tree_bytes


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str | None = None,
    target_file_bytes: int = 256 << 20,
) -> int:
    """Rewrite a parquet table into ceil(bytes / target) files; returns
    the output file count.

    Sizing comes from the ACTUAL on-disk byte size, not a row-count
    guess, so the result holds for wide and narrow tables alike.  The
    rewrite is one round-robin repartition — a full shuffle, but that is
    the point: compaction is the job you schedule, so every later scan
    pays file-count overhead proportional to data size, not to how many
    increments ever ran."""
    out_path = out_path or path.rstrip("/") + "_compacted"
    n = max(1, math.ceil(tree_bytes(spark, path) / target_file_bytes))
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(out_path)
    return n
