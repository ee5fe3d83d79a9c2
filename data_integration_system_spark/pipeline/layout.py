"""Physical-layout management: clustered writes and snapshot compaction.

Two write-time disciplines that cost one sort/coalesce ONCE and pay on
every subsequent read:

* **Clustering** (`write_clustered`): range-partition by the hot filter
  key, sort within partitions, and cap parquet row-group size.  Every
  row group then covers a narrow key range, so the parquet reader's
  min/max stats pruning skips the row groups (and whole files) a
  selective filter can't match — at 100 TB this is the difference
  between scanning the table and scanning the slice.  Unlike directory
  partitioning it adds ZERO small-file overhead for high-cardinality
  keys and keeps working for range predicates.

* **Compaction** (`compact_snapshot`): incremental jobs (streaming
  foreachBatch sinks, per-generation crawl appends) accrete small
  files; small files turn scan planning into a metadata storm (one
  task per file, listing latency, memory on the driver).  Compaction
  rewrites the CURRENT snapshot into ~target-sized files as a NEW
  version through the same copy-on-write manifest swap as every other
  write — readers never see a half-compacted table, and time travel to
  the pre-compaction version still works until pruned.

Reference anchor: filesystem_store.py appends per-page text files with
no layout management at all — fine at crawler scale, fatal at corpus
scale; this module is the Spark-native answer.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from data_integration_system_spark.pipeline.fsutil import hadoop_path
from data_integration_system_spark.pipeline.snapshots import (
    current_version,
    read_current,
    write_snapshot,
)

#: Default parquet row-group target.  Small enough that a selective
#: filter prunes at useful granularity, large enough that scans stay
#: sequential: the standard 128 MiB default trades pruning granularity
#: away, which is the right call only for full-scan workloads.
DEFAULT_ROWGROUP_BYTES = 16 * 1024 * 1024

DEFAULT_FILE_BYTES = 128 * 1024 * 1024


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    rowgroup_bytes: int = DEFAULT_ROWGROUP_BYTES,
) -> None:
    """Write ``df`` range-clustered on ``cluster_cols``.

    repartitionByRange gives disjoint key ranges per FILE (file-level
    min/max skipping); sortWithinPartitions tightens every ROW GROUP's
    stats inside each file; the block-size option bounds row-group span.
    The one extra cost vs a plain write is the range exchange — paid
    once, at write time."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.option("parquet.block.size", rowgroup_bytes)
        .mode("errorifexists")
        .parquet(path)
    )


def _dir_bytes(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total_bytes, n_data_files) under ``path`` via the Hadoop FS API."""
    p, fs = hadoop_path(spark, path)
    total = 0
    n = 0
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            total += st.getLen()
            n += 1
        elif st.isDirectory():
            t, c = _dir_bytes(spark, f"{path}/{name}")
            total += t
            n += c
    return total, n


def _partition_layout(spark: SparkSession, path: str) -> tuple[str | None, int]:
    """(partition column, number of partition dirs) of a hive-style
    layout (``col=value`` child dirs), or (None, 0) for a flat table."""
    p, fs = hadoop_path(spark, path)
    col, n = None, 0
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and "=" in name:
            col = name.split("=", 1)[0]
            n += 1
    return col, n


def compact_snapshot(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = DEFAULT_FILE_BYTES,
) -> dict:
    """Rewrite the current snapshot of ``root`` into ~target-sized files
    as a new committed version; returns a report dict.

    Flat tables merge with coalesce — no shuffle, each output task reads
    several input files sequentially.  A hive-partitioned snapshot keeps
    its layout: the rewrite detects the ``col=value`` dirs, clusters by
    the partition column, and partitionBy-writes the new version — a
    naive coalesce would flatten the table and silently destroy every
    reader's partition pruning.  Skips (no-op report) when already at or
    under the target file count, so a scheduled compactor is idempotent."""
    version = current_version(spark, root)
    if version is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    total, n_files = _dir_bytes(spark, f"{root}/{version}")
    part_col, n_parts = _partition_layout(spark, f"{root}/{version}")
    # a partitioned table can never go below one file per partition dir
    target = max(1, n_parts, math.ceil(total / target_file_bytes))
    if n_files <= target:
        return {
            "compacted": False,
            "version": version,
            "partition_by": part_col,
            "n_files": n_files,
            "target_files": target,
        }
    df = read_current(spark, root)
    if part_col is not None:
        # 1 file per partition value (hash-clustered); preserves pruning
        new_version = write_snapshot(
            df.repartition(part_col), root, partition_by=part_col
        )
    else:
        new_version = write_snapshot(df.coalesce(target), root)
    _, n_after = _dir_bytes(spark, f"{root}/{new_version}")
    return {
        "compacted": True,
        "version": new_version,
        "previous_version": version,
        "partition_by": part_col,
        "n_files_before": n_files,
        "n_files_after": n_after,
        "bytes": total,
    }
