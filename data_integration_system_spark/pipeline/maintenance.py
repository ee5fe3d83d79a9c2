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


def maintain_snapshot_store(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 << 20,
    keep_versions: int = 2,
    max_rewrites: int | None = None,
) -> dict:
    """The scheduled maintenance pass for one snapshot store: compact
    the CURRENT version to ~target-size files (layout- and
    partition-preserving), then prune old versions beyond the time-travel
    budget.  Idempotent end to end — the compactor no-ops at target and
    the pruner never touches the active version — so a cron can run it
    blindly.  Returns the combined report.

    Partitioned stores compact SELECTIVELY (layout.compact_partitions):
    only fragmented partitions are re-read and rewritten, the rest are
    byte-copied — cost proportional to fragmentation, which is what a
    streaming sink appending to today's partition actually produces.
    ``max_rewrites`` caps the rewritten partitions per run so the cron
    does bounded work per trigger; flat stores take the whole-table
    coalesce path inside compact_partitions' delegation."""
    from data_integration_system_spark.pipeline.layout import compact_partitions
    from data_integration_system_spark.pipeline.snapshots import prune_snapshots

    try:
        report = compact_partitions(
            spark, root, target_file_bytes=target_file_bytes, max_rewrites=max_rewrites
        )
    except FileNotFoundError:
        # a root with no committed snapshot yet (sink not started): skip,
        # don't kill the cron's loop over its OTHER roots
        return {"compacted": False, "missing": True, "pruned_versions": []}
    removed = prune_snapshots(spark, root, keep=keep_versions)
    return {**report, "pruned_versions": removed}


def _main(argv: list[str]) -> int:
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m data_integration_system_spark.pipeline.maintenance",
        description="Compact + prune a snapshot store (idempotent).",
    )
    ap.add_argument("roots", nargs="+", help="snapshot store roots")
    ap.add_argument("--target-mb", type=int, default=128)
    ap.add_argument("--keep", type=int, default=2)
    ap.add_argument(
        "--max-rewrites",
        type=int,
        default=None,
        help="cap rewritten partitions per run (bounded incremental pass)",
    )
    args = ap.parse_args(argv)

    from data_integration_system_spark.session import get_spark

    spark = get_spark("maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    for root in args.roots:
        rep = maintain_snapshot_store(
            spark,
            root,
            target_file_bytes=args.target_mb << 20,
            keep_versions=args.keep,
            max_rewrites=args.max_rewrites,
        )
        print(root, rep)
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(_main(sys.argv[1:]))
