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
from pyspark.sql import functions as F

from data_integration_system_spark.pipeline.fsutil import copy_tree, hadoop_path
from data_integration_system_spark.pipeline.snapshots import (
    allocate_version,
    commit_version,
    current_version,
    read_current,
    write_snapshot,
)
from data_integration_system_spark.registry import query

#: Default parquet row-group target.  Small enough that a selective
#: filter prunes at useful granularity, large enough that scans stay
#: sequential: the standard 128 MiB default trades pruning granularity
#: away, which is the right call only for full-scan workloads.
DEFAULT_ROWGROUP_BYTES = 16 * 1024 * 1024

DEFAULT_FILE_BYTES = 128 * 1024 * 1024

#: the synthetic documents table's fixed source domain (TESTDATA.md:
#: src0..src19 at every SF) — used to size partitioned writes without
#: paying a distinct-count job
_DOCUMENT_SOURCES = 20


@query(
    "snapshot_store_source_probe",
    oracle="""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE source IN ('src3', 'src7')
    GROUP BY source, lang
    """,
)
def snapshot_store_source_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lake point probe through the versioned snapshot store (r15): the
    documents table is committed as a source-partitioned copy-on-write
    snapshot (pipeline/snapshots.py — the page-store shape, reference
    filesystem_store.py:201-211 partitioned-by-site writes), then two
    sources are probed through ``read_current(partitions=...)`` — the
    manifest-backed read that schedules ZERO file-discovery jobs and
    never touches unprobed partition dirs (pins:
    tests/test_lake_manifest.py).  The result is an exact per-
    (source, lang) rollup, so the oracle is the same aggregation over
    the raw table — identical rows prove the store's commit + probe
    path end-to-end.

    Scale shape: the store's partition count tracks the corpus (sites ×
    dates at 100 TB); the probe reads ONLY the two requested sources'
    files — listing cost is the manifest JSON, scan cost is the probed
    slice, and the aggregation is one map-side-combined shuffle on the
    (source, lang) grain (measured at a 2,000-partition store:
    0.22 s probe vs 4.9 s plain cold resolve — SCALE.md r15)."""
    import shutil
    import tempfile

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.operators._common import (
        cluster_for_partitioned_write,
    )

    docs = table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="snapstore_")
    try:
        root = tmp + "/store"
        # partition-count for the write comes from the fixture's KNOWN
        # source domain (TESTDATA.md: 20 sources at every SF) — sizing
        # it with a distinct().count() job was a whole extra scan per
        # invocation (VERDICT r15); in production the manifest carries
        # this for free after the first commit.  The count only caps
        # the task fan-out, so a generous bound stays correct.
        write_snapshot(
            cluster_for_partitioned_write(docs, "source", _DOCUMENT_SOURCES),
            root,
            partition_by="source",
        )
        probe = read_current(spark, root, partitions=["src3", "src7"])
        return (
            probe.groupBy("source", "lang")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            # tiny (source × lang grain): materialize so the temp store
            # can be deleted — returning a lazy frame over it leaked a
            # full table copy into /tmp per invocation (ADVICE r15)
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "snapshot_time_travel_diff",
    oracle="""
    WITH cur AS (
      SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id % 3 <> 0
    ), nxt AS (
      SELECT doc_id,
             sha256(CASE WHEN doc_id % 4 = 0 THEN text || ' v2' ELSE text END) AS h
      FROM documents WHERE doc_id % 2 = 0
    )
    SELECT COALESCE(c.doc_id, n.doc_id) AS doc_id,
           CASE WHEN n.doc_id IS NULL THEN 'DELETED'
                WHEN c.doc_id IS NULL THEN 'ADDED'
                WHEN c.h = n.h        THEN 'UNCHANGED'
                ELSE 'CHANGED' END AS change
    FROM cur c FULL OUTER JOIN nxt n ON c.doc_id = n.doc_id
    """,
)
def snapshot_time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel audit diff THROUGH the versioned store (r15):
    snapshot_reconcile's exact classification (DELETED/ADDED/CHANGED/
    UNCHANGED by key + hash — reference D5 read-compare,
    db/postgres_store.py:126-184), but run between two RETAINED
    versions of one copy-on-write store instead of two in-flight
    frames: both table versions are COMMITTED via write_snapshot (each
    publishing its per-version file manifest under the atomic pointer
    swap), then snapshot_diff resolves them by version name through
    read_version's manifest-backed scans.  Identical rows to the
    derivation-level oracle prove commit → retain → time-travel →
    diff end-to-end under the driver gate; snapshot_reconcile keeps
    owning the bare join shape.

    Scale shape: the diff joins two (key, hash) PROJECTIONS — payloads
    never move; version resolution is two manifest JSON reads, zero
    listing jobs (tests/test_lake_manifest.py pins)."""
    import shutil
    import tempfile

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.pipeline.snapshots import (
        snapshot_diff,
        write_snapshot,
    )

    docs = table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="snapdiff_")
    try:
        root = tmp + "/store"
        cur = docs.filter(F.col("doc_id") % 3 != 0).select(
            "doc_id", F.sha2("text", 256).alias("h")
        )
        nxt = docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id",
            F.sha2(
                F.when(F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(" v2")))
                .otherwise(F.col("text")),
                256,
            ).alias("h"),
        )
        v1 = write_snapshot(cur, root)
        v2 = write_snapshot(nxt, root)
        return (
            snapshot_diff(spark, root, v1, v2, key="doc_id", hash_col="h")
            .select("doc_id", F.col("status").alias("change"))
            # (doc_id, change) rows only — small enough to pin in
            # memory, and it lets the temp store be deleted instead of
            # leaking a hash projection into /tmp per run (ADVICE r15)
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "snapshot_maintenance_compaction",
    oracle="""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_pre,
           CAST(SUM(n_chars) AS BIGINT) AS chars_post
    FROM documents
    GROUP BY source, lang
    """,
)
def snapshot_maintenance_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scheduled-maintenance path end-to-end under the driver gate
    (r16, VERDICT r15 #1): a source-partitioned snapshot store is
    committed with two deliberately FRAGMENTED partitions (src3/src7
    hash-split across 12 writer tasks — the shape a streaming sink
    appending to today's partition produces; reference anchor: the
    store-rewrite semantics of filesystem_store.py:95-128 at lake
    scale), then ``maintain_snapshot_store`` runs the full cron pass:
    SELECTIVE compaction (only the fragmented partitions re-read and
    rewritten, the 18 clean ones byte-copied), the new version's file
    manifest SPLICED from the base (re-listing only the rewrites —
    commit cost tracks rewrites, not store size), and version pruning
    beyond the time-travel budget (the throwaway v1 goes, the
    pre-compaction v2 is retained).

    The result joins the per-(source, lang) rollup of the RETAINED
    pre-compaction version (time travel) with the same rollup of the
    compacted current version on (source, lang, n_docs) — so a single
    lost or duplicated row anywhere in rewrite/copy/splice/prune
    breaks row-count or value parity against the raw-table oracle.
    The operational facts the rollup can't see (exact file counts
    before/after, zero listing jobs through the spliced manifest) are
    pinned in tests/test_lake_manifest.py; the query itself refuses to
    return if the pass didn't actually rewrite exactly the fragmented
    partitions, copy the rest, and prune the budget — a silently
    degraded maintenance pass fails the driver row instead of passing
    vacuously.

    Scale shape: compaction compute tracks FRAGMENTED bytes (two
    partitions), not table size; the clean-partition copies are
    sequential IO; manifest splice is O(rewrites); prune is dir
    deletes.  At a 10,000-site store this is the difference between a
    bounded nightly pass and a full-table rewrite per run."""
    import shutil
    import tempfile

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.operators._common import (
        cluster_for_partitioned_write,
    )
    from data_integration_system_spark.pipeline.maintenance import (
        maintain_snapshot_store,
    )
    from data_integration_system_spark.pipeline.snapshots import read_version

    docs = table(spark, sf_dir, "documents")
    frag = ("src3", "src7")
    tmp = tempfile.mkdtemp(prefix="snapmaint_")
    try:
        root = tmp + "/store"
        # throwaway v1: exists only so the maintenance pass has a
        # version beyond the keep budget to prune
        write_snapshot(
            docs.filter(F.col("source") == "src0").coalesce(1),
            root,
            partition_by="source",
        )
        # v2: the real store — clean sources land 1 file per partition
        # dir, the two fragmented sources are hash-split across 12
        # writer tasks (deterministic: same doc_id hash every run)
        clean = cluster_for_partitioned_write(
            docs.filter(~F.col("source").isin(*frag)),
            "source",
            _DOCUMENT_SOURCES - len(frag),
        )
        fragged = docs.filter(F.col("source").isin(*frag)).repartition(
            12, "doc_id"
        )
        v2 = write_snapshot(
            clean.unionByName(fragged), root, partition_by="source"
        )
        rep = maintain_snapshot_store(
            spark, root, target_file_bytes=DEFAULT_FILE_BYTES, keep_versions=2
        )
        expected_rewrites = sorted(f"source={s}" for s in frag)
        if (
            not rep.get("compacted")
            or sorted(rep.get("rewritten", [])) != expected_rewrites
            or rep.get("copied_partitions") != _DOCUMENT_SOURCES - len(frag)
            or rep.get("pruned_versions") != ["v000001"]
        ):
            raise RuntimeError(f"maintenance pass degraded: {rep}")
        pre = (
            read_version(spark, root, v2)
            .groupBy("source", "lang")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("chars_pre"),
            )
        )
        post = (
            read_current(spark, root)
            .groupBy("source", "lang")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("chars_post"),
            )
        )
        return (
            pre.join(post, ["source", "lang", "n_docs"])
            .select("source", "lang", "n_docs", "chars_pre", "chars_post")
            # tiny (source × lang grain); materializing lets the temp
            # store be deleted instead of leaking into /tmp
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "snapshot_purge_probe",
    oracle="""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE NOT (source IN ('src3', 'src7') AND doc_id % 3 = 0)
    GROUP BY source, lang
    """,
)
def snapshot_purge_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lake takedown primitive under the driver gate (r16):
    documents committed as a source-partitioned copy-on-write snapshot,
    then a key set drawn from TWO sources is HARD-DELETED through
    ``purge_snapshot`` — only those two partitions are re-read and
    rewritten with the keys anti-joined out, the other 18 are
    byte-copied, the new version's manifest is spliced, and the commit
    is the standard OCC pointer swap.  The result is the full
    per-(source, lang) rollup of the purged store, so the oracle is the
    same aggregation over the raw table minus exactly the purged keys —
    identical rows prove locate → selective rewrite → copy → splice →
    commit end-to-end, including that untouched partitions lost
    nothing.  The query raises if the pass wasn't selective (rewrote
    more than the two affected partitions or copied fewer than the
    rest), so a degraded purge fails the driver row instead of passing
    vacuously.

    Scale shape: purge compute tracks the AFFECTED partitions' bytes
    (a takedown touches a handful of sites/dates at 100 TB); the
    key-location scan is column-pruned; retained older versions still
    hold the rows until prune_snapshots — the report names them, and
    the completing prune is pinned in tests/test_lake_manifest.py."""
    import shutil
    import tempfile

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.operators._common import (
        cluster_for_partitioned_write,
    )

    docs = table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="snappurge_")
    try:
        root = tmp + "/store"
        write_snapshot(
            cluster_for_partitioned_write(docs, "source", _DOCUMENT_SOURCES),
            root,
            partition_by="source",
        )
        purge_ids = docs.filter(
            F.col("source").isin("src3", "src7") & (F.col("doc_id") % 3 == 0)
        ).select("doc_id")
        rep = purge_snapshot(spark, root, purge_ids, "doc_id")
        if (
            not rep.get("purged")
            or sorted(rep.get("rewritten", [])) != ["src3", "src7"]
            or rep.get("copied_partitions") != _DOCUMENT_SOURCES - 2
        ):
            raise RuntimeError(f"purge pass degraded: {rep}")
        return (
            read_current(spark, root)
            .groupBy("source", "lang")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
            )
            # tiny (source × lang grain); materializing lets the temp
            # store be deleted
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int,
    rowgroup_bytes: int = DEFAULT_ROWGROUP_BYTES,
    bloom_cols: list[str] | None = None,
) -> None:
    """Write ``df`` range-clustered on ``cluster_cols``.

    repartitionByRange gives disjoint key ranges per FILE (file-level
    min/max skipping); sortWithinPartitions tightens every ROW GROUP's
    stats inside each file; the block-size option bounds row-group span.
    The one extra cost vs a plain write is the range exchange — paid
    once, at write time.

    ``bloom_cols``: write parquet bloom filters for these columns — the
    skipping story for POINT lookups on hash-like keys (content hashes,
    UUIDs) that clustering can't help: their min/max stats span the
    whole domain in every row group, so an equality probe reads the
    table; a bloom filter skips every row group that can't contain the
    value (measured 200k -> ~900 rows read for one hash probe).  Costs
    write-side space/CPU per column — reserve it for keys that are
    genuinely probed by equality."""
    writer = (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.option("parquet.block.size", rowgroup_bytes)
    )
    for c in bloom_cols or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    writer.mode("errorifexists").parquet(path)


def _interleave_bits(b1, b2, bits: int):
    """Morton/Z value: interleave the low ``bits`` of two bucket-id
    columns (b1 gets the odd bit positions).  Pure JVM bit ops — the
    whole Z computation rides inside whole-stage codegen."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b1, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b2, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col1: str,
    col2: str,
    n_files: int,
    rowgroup_bytes: int = DEFAULT_ROWGROUP_BYTES,
    bits: int = 16,
) -> None:
    """Write ``df`` Z-order-clustered on TWO hot filter columns.

    ``write_clustered`` makes predicates on the sort column skippable
    but leaves every other column's min/max stats table-wide; sorting by
    the Morton interleave of both columns' bucket ids instead makes each
    row group a small hyperrectangle in (col1, col2) space, so a
    selective predicate on EITHER column (or both) skips most row
    groups.  The trade: per-column pruning is ~sqrt-of-table rather than
    the single-column sort's near-exact range — the right layout when
    two independent access paths matter (e.g. user_id probes AND value
    outlier scans over the same events table).

    Bucketing is equi-width over one min/max aggregation pass (numeric
    columns; heavily skewed domains deserve a rank pre-map before
    calling this).  Cost model matches write_clustered: one range
    exchange + in-partition sort, paid once at write time."""
    lo1, hi1, lo2, hi2 = (
        df.agg(
            F.min(F.col(col1).cast("double")),
            F.max(F.col(col1).cast("double")),
            F.min(F.col(col2).cast("double")),
            F.max(F.col(col2).cast("double")),
        ).head()
    )
    nb = 1 << bits

    def bucket(col: str, lo: float, hi: float):
        if lo is None or hi is None or hi <= lo:  # constant/empty column
            return F.lit(0).cast("long")
        b = F.width_bucket(
            F.col(col).cast("double"), F.lit(lo), F.lit(hi), F.lit(nb)
        ) - F.lit(1)
        return F.greatest(F.lit(0), F.least(b, F.lit(nb - 1))).cast("long")

    z = _interleave_bits(bucket(col1, lo1, hi1), bucket(col2, lo2, hi2), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
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


#: hive's sentinel dir value for a NULL partition key
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _unescape_hive(value: str) -> str | None:
    """Decode a hive partition-dir value string back to the value
    ``CAST(part_col AS STRING)`` produces: Spark %-escapes special
    characters (spaces, colons in timestamps, slashes...) in dir names,
    and NULL keys land in ``__HIVE_DEFAULT_PARTITION__``.  Matching the
    RAW dir string against the cast column silently misses every escaped
    value — the advisor-r6 hot-task trap in compact_snapshot's plan."""
    from urllib.parse import unquote

    if value == _HIVE_NULL:
        return None
    return unquote(value)


def _partition_bytes(spark: SparkSession, path: str) -> dict[str, int]:
    """Bytes per hive partition, keyed by the dir's value string."""
    p, fs = hadoop_path(spark, path)
    out: dict[str, int] = {}
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and "=" in name:
            b, _ = _dir_bytes(spark, f"{path}/{name}")
            out[name.split("=", 1)[1]] = b
    return out


def compact_snapshot(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = DEFAULT_FILE_BYTES,
) -> dict:
    """Rewrite the current snapshot of ``root`` into ~target-sized files
    as a new committed version; returns a report dict.

    Flat tables merge with coalesce — no shuffle, each output task reads
    several input files sequentially.  A hive-partitioned snapshot keeps
    its layout: the rewrite detects the ``col=value`` dirs, sizes each
    partition's file count from its BYTES (ceil(bytes/target)), and
    salt-splits the rows so a large partition compacts across that many
    tasks — ``repartition(part_col)`` alone would route every row of a
    partition value through ONE task (maximal key skew, a serial
    hot-task at 100 TB) and ignore ``target_file_bytes`` entirely.  A
    naive coalesce would instead flatten the table and silently destroy
    every reader's partition pruning.  Skips (no-op report) when already
    at or under the target file count, so a scheduled compactor is
    idempotent."""
    version = current_version(spark, root)
    if version is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    total, n_files = _dir_bytes(spark, f"{root}/{version}")
    part_col, n_parts = _partition_layout(spark, f"{root}/{version}")
    if part_col is not None:
        # per-partition file plan: a partition never goes below 1 file,
        # an oversized one gets ceil(bytes/target) files (and tasks)
        files_per = {
            v: max(1, math.ceil(b / target_file_bytes))
            for v, b in _partition_bytes(spark, f"{root}/{version}").items()
        }
        target = max(1, sum(files_per.values()))
    else:
        target = max(1, math.ceil(total / target_file_bytes))
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
        # deterministic salt in [0, files_per[value]): hash of the data
        # columns, modulo the partition's planned file count.  The
        # (part_col, salt) repartition spreads a big partition over its
        # planned number of tasks; partitionBy then lands each task's
        # rows in the right dir, ~target_file_bytes per file.
        # plan keys are unescaped dir values (NULL-safe): the join must
        # match what cast(part_col as string) yields for escaped chars
        # (timestamp colons, spaces) and NULL partitions, or a skewed
        # partition's __n_files misses and it funnels through one task
        from data_integration_system_spark.operators._common import (
            local_rows_df,
        )

        plan = local_rows_df(
            spark,
            [(_unescape_hive(v), n) for v, n in files_per.items()],
            "__part_val string, __n_files int",
        )
        data_cols = [c for c in df.columns if c != part_col]
        # fallback for a value that STILL fails to match (exotic type
        # rendering): the average per-partition plan, not 1 — bounds the
        # hot task without exploding clean partitions into shards
        fallback = max(1, math.ceil(target / max(1, len(files_per))))
        salted = (
            df.join(
                F.broadcast(plan),
                F.col(part_col).cast("string").eqNullSafe(F.col("__part_val")),
                "left",
            )
            .withColumn(
                "__salt",
                F.pmod(
                    F.hash(*data_cols),
                    F.coalesce(F.col("__n_files"), F.lit(fallback)),
                ),
            )
            .repartition(target, F.col(part_col), F.col("__salt"))
            .drop("__part_val", "__n_files", "__salt")
        )
        # expect_current: refuse to commit over a snapshot some OTHER
        # writer landed while this rewrite ran (lost-update guard)
        new_version = write_snapshot(
            salted, root, partition_by=part_col, expect_current=version
        )
    else:
        new_version = write_snapshot(
            df.coalesce(target), root, expect_current=version
        )
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


def _copy_trees(
    spark: SparkSession, src_root: str, dst_root: str, names: list[str]
) -> None:
    """Byte-copy ``names`` child dirs from ``src_root`` to ``dst_root``
    through a thread pool.  Each copy_tree is a blocking driver-side FS
    copy (Hadoop FileUtil via py4j — the gateway is thread-safe, one
    connection per thread), so a serial loop makes a clean-partition
    carry-forward O(partitions) in wall: the measured 44.1 s purge at
    the 2,000-site store was DOMINATED by 1,998 sequential copies
    (SCALE.md r16).  Pooling bounds the wall by the largest partition
    plus copy parallelism; 16 threads saturate a local disk and are a
    sane default for object stores (server-side copy latency-bound)."""
    if not names:
        return
    from concurrent.futures import ThreadPoolExecutor

    sp, sfs = hadoop_path(spark, src_root)
    if sfs.getScheme() == "file":
        # local-filesystem fast path (r18): each Hadoop copy_tree is ~4
        # py4j round-trips + FileUtil setup — ~78 ms/partition even
        # pooled, 9.7 s of the re-priced 2,000-site purge.  On file://
        # the same byte copy (data + .crc sidecars verbatim) is plain
        # shutil, no gateway traffic.  Non-local schemes (HDFS, s3a)
        # keep the Hadoop path below.
        import os as _os
        import shutil as _shutil

        src_base = sp.toUri().getPath()
        dst_base = hadoop_path(spark, dst_root)[0].toUri().getPath()
        _os.makedirs(dst_base, exist_ok=True)
        with ThreadPoolExecutor(max_workers=min(32, len(names))) as pool:
            list(
                pool.map(
                    lambda n: _shutil.copytree(
                        f"{src_base}/{n}", f"{dst_base}/{n}"
                    ),
                    names,
                )
            )
        return
    if len(names) == 1:
        copy_tree(spark, f"{src_root}/{names[0]}", f"{dst_root}/{names[0]}")
        return
    with ThreadPoolExecutor(max_workers=min(16, len(names))) as pool:
        # list() re-raises the first failure before the caller commits
        list(
            pool.map(
                lambda n: copy_tree(
                    spark, f"{src_root}/{n}", f"{dst_root}/{n}"
                ),
                names,
            )
        )


def purge_snapshot(
    spark: SparkSession,
    root: str,
    ids_df,
    key_col: str,
) -> dict:
    """Hard-delete rows from the CURRENT snapshot by key — the lake's
    right-to-be-forgotten / takedown primitive (r16), completing the
    tombstone story: index tiers hide deleted ids logically
    (operators/tombstones); the lake REWRITES, because the obligation
    is to the bytes, not the query results.

    Selective, like compact_partitions: one column-pruned scan finds
    which partitions hold the keys, ONLY those partitions are re-read
    and rewritten with the keys anti-joined out, every clean partition
    is byte-copied, the new version's file manifest is SPLICED from the
    base (re-listing only rewrites), and the commit is the same
    copy-on-write OCC pointer swap as every other snapshot write —
    readers never see a half-purged table.  Flat (non-partitioned)
    stores take a full anti-join rewrite through write_snapshot.

    Retention caveat, by design: RETAINED older versions still contain
    the purged rows (they are immutable time travel) — a forget
    obligation completes when ``prune_snapshots`` drops every version
    older than the purge, so the returned report names the versions
    still holding the data.  Returns the report dict.

    Scale shape: compute tracks the AFFECTED partitions' bytes (a
    takedown touches a handful of sites/dates), the key-location scan
    reads one column, clean-partition copies and per-partition rewrites
    run through thread pools (wall bounded by the largest item, not the
    partition count — the serial copy loop dominated the measured
    44.1 s purge at the 2,000-site store, SCALE.md r16), splice is
    O(rewrites).  ``ids_df`` is a DataFrame with ``key_col`` or an
    iterable of values."""
    from data_integration_system_spark.operators._common import local_rows_df
    from data_integration_system_spark.pipeline import index_manifest as im
    from data_integration_system_spark.pipeline.snapshots import (
        list_versions,
        read_version,
    )

    if not isinstance(ids_df, DataFrame):
        ids_df = local_rows_df(
            spark, [(v,) for v in ids_df], f"{key_col} long"
        )
    ids_df = ids_df.select(key_col).distinct().localCheckpoint()
    version = current_version(spark, root)
    if version is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    part_col, _n = _partition_layout(spark, f"{root}/{version}")
    cur = read_version(spark, root, version)
    if part_col is None:
        kept = cur.join(ids_df, key_col, "left_anti")
        new_name = write_snapshot(kept, root, expect_current=version)
        return {
            "purged": True,
            "version": new_name,
            "previous_version": version,
            "partition_by": None,
            "rewritten": ["<flat>"],
            "copied_partitions": 0,
            "versions_retaining_purged_rows":
                [v for v in list_versions(spark, root) if v != new_name],
        }

    # Everything below operates in DIR-NAME space (hive-ESCAPED partition
    # value strings), like compact_partitions: the data values coming out
    # of the locate scan are RAW, while dir names, manifest keys, and the
    # copy-skip comparison all carry Spark's hive escaping (spaces,
    # colons, slashes, NULL -> __HIVE_DEFAULT_PARTITION__).  Matching raw
    # values against those silently turned the purge into a byte-copy of
    # the un-purged partition for any escaped value — the hard-delete
    # primitive retaining the rows while reporting purged=True (ADVICE
    # r16 high).  One listing of the version dir gives the authoritative
    # dir names; raw values are matched through _unescape_hive, and a
    # purged key whose partition cannot be matched to a dir FAILS LOUDLY
    # instead of silently retaining rows.
    p, fs = hadoop_path(spark, f"{root}/{version}")
    dir_names = [
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isDirectory() and "=" in st.getPath().getName()
    ]
    by_value: dict[str | None, str] = {
        _unescape_hive(n.split("=", 1)[1]): n.split("=", 1)[1]
        for n in dir_names
    }
    # one column-pruned scan locates the keys' partitions — the value
    # is formatted to string BY SPARK (ADVICE r17): Python str() of a
    # typed partition value diverges from Spark's dir formatting
    # (boolean True -> 'True' where the dir says 'true'), so a
    # legitimate purge on such a column raised the loud mismatch below.
    # Spark's cast-to-string is the same formatting partitionBy used to
    # write the dir name, so typed values round-trip; NULL stays None
    # (the hive default sentinel is matched through the None key).
    hit_values = [
        r[0]
        for r in cur.join(ids_df, key_col, "left_semi")
        .select(F.col(part_col).cast("string"))
        .distinct()
        .collect()
    ]
    if any(v not in by_value for v in hit_values):
        # inference-LOSSY dir strings (a dir '01' is type-inferred to 1,
        # which formats back as '1'): re-locate through a plain
        # directory read with partition type inference disabled, so the
        # scanned values ARE the unescaped dir strings.  Rare path —
        # only taken when the fast typed scan cannot match a dir — and
        # the loud failure below still guards anything left over.
        from data_integration_system_spark.operators._common import (
            _SESSION_CONF_LOCK,
        )

        _INF = "spark.sql.sources.partitionColumnTypeInference.enabled"
        with _SESSION_CONF_LOCK:
            prev_inf = spark.conf.get(_INF)
            try:
                spark.conf.set(_INF, "false")
                hit_values = [
                    r[0]
                    for r in spark.read.parquet(f"{root}/{version}")
                    .join(ids_df, key_col, "left_semi")
                    .select(F.col(part_col).cast("string"))
                    .distinct()
                    .collect()
                ]
            finally:
                spark.conf.set(_INF, prev_inf)
    affected: list[str] = []  # hive-escaped dir-value strings
    for raw in hit_values:
        key = raw  # Spark-formatted string (or None), never re-formatted
        if key not in by_value:
            raise ValueError(
                f"purge_snapshot: partition value {raw!r} (from the key-"
                f"location scan) matches no partition dir under "
                f"{root}/{version} (have {sorted(dir_names)[:10]}...); "
                "refusing a purge that would silently retain rows"
            )
        affected.append(by_value[key])
    affected = sorted(set(affected))
    if not affected:
        return {
            "purged": False,
            "version": version,
            "partition_by": part_col,
            "rewritten": [],
        }
    new_name = allocate_version(spark, root)

    def _rewrite(dir_value: str) -> None:
        # read the partition DIR directly (not basePath-restored), so the
        # rewritten files match the byte-copied partitions structurally:
        # no partition column embedded in the data files (ADVICE r16 low)
        (
            spark.read.parquet(f"{root}/{version}/{part_col}={dir_value}")
            .join(ids_df, key_col, "left_anti")
            .write.mode("errorifexists")
            .parquet(f"{root}/{new_name}/{part_col}={dir_value}")
        )

    clean = [
        n for n in dir_names if n.split("=", 1)[1] not in set(affected)
    ]
    copied = len(clean)
    # rewrites are independent small Spark jobs and the clean-partition
    # copies are independent driver-side FS copies: both pools bound the
    # wall by the largest item instead of the sum (the serial copy loop
    # dominated the measured 44.1 s purge at the 2,000-site store —
    # SCALE.md r16; same rationale as compact_partitions' rewrite pool)
    from concurrent.futures import ThreadPoolExecutor

    if len(affected) == 1:
        _rewrite(affected[0])
    else:
        with ThreadPoolExecutor(max_workers=min(8, len(affected))) as pool:
            list(pool.map(_rewrite, affected))
    _copy_trees(spark, f"{root}/{version}", f"{root}/{new_name}", clean)
    base_man = im.read_manifest(spark, f"{root}/{version}")
    if base_man is not None and "" in base_man.get("relations", {}):
        im.splice_manifest_from(
            spark, f"{root}/{new_name}", base_man, {"": affected}
        )
    commit_version(spark, root, new_name, expect_current=version)
    return {
        "purged": True,
        "version": new_name,
        "previous_version": version,
        "partition_by": part_col,
        "rewritten": affected,
        "copied_partitions": copied,
        "versions_retaining_purged_rows":
            [v for v in list_versions(spark, root) if v != new_name],
    }


def compact_partitions(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = DEFAULT_FILE_BYTES,
    max_rewrites: int | None = None,
) -> dict:
    """SELECTIVE compaction of a hive-partitioned snapshot: rewrite only
    the partitions whose file count exceeds their byte-sized plan
    (ceil(bytes/target)); every untouched partition is FILE-COPIED into
    the new version — IO only, no decode, no shuffle, no re-encode.

    This is the 100 TB form of compaction: ``compact_snapshot`` re-reads
    and re-writes the ENTIRE table even when one partition out of ten
    thousand is fragmented (a streaming sink appending to today's
    partition fragments exactly one), so its cost is proportional to
    table size; this one's compute is proportional to the FRAGMENTED
    bytes (the clean-partition copies are pooled byte-copies — see
    _copy_trees — that a real lake further amortizes with server-side
    copy).  ``max_rewrites`` bounds a
    scheduled run — the worst offenders (by excess file count) are
    rewritten now, the rest ride along as copies and are picked up next
    run, so an incremental compactor does bounded work per trigger.

    Same copy-on-write contract as every snapshot write: the new version
    dir is invisible until ``commit_version`` stamps its _SUCCESS and
    swaps the manifest, so readers never see a half-compacted table and
    time travel to the previous version keeps working.  Flat
    (non-partitioned) snapshots delegate to ``compact_snapshot``."""
    version = current_version(spark, root)
    if version is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    part_col, _n_parts = _partition_layout(spark, f"{root}/{version}")
    if part_col is None:
        return compact_snapshot(spark, root, target_file_bytes)

    p, fs = hadoop_path(spark, f"{root}/{version}")
    frag: list[tuple[str, int, int]] = []  # (dir_name, plan_files, n_files)
    clean: list[str] = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if not (st.isDirectory() and "=" in name):
            continue
        b, n = _dir_bytes(spark, f"{root}/{version}/{name}")
        plan = max(1, math.ceil(b / target_file_bytes))
        if n > plan:
            frag.append((name, plan, n))
        else:
            clean.append(name)
    if not frag:
        return {
            "compacted": False,
            "version": version,
            "partition_by": part_col,
            "fragmented_partitions": 0,
        }
    frag.sort(key=lambda t: t[2] - t[1], reverse=True)  # worst offenders first
    if max_rewrites is not None and len(frag) > max_rewrites:
        deferred = frag[max_rewrites:]
        frag = frag[:max_rewrites]
        clean += [name for name, _p, _n in deferred]

    new_name = allocate_version(spark, root)

    def _rewrite(name: str, plan: int) -> None:
        # round-robin within ONE partition value: even target-size files,
        # plan-many tasks, no key skew possible
        (
            spark.read.parquet(f"{root}/{version}/{name}")
            .repartition(plan)
            .write.mode("errorifexists")
            .parquet(f"{root}/{new_name}/{name}")
        )

    # Concurrent job submission: each partition rewrite is its own small
    # Spark job; running them serially from the driver makes a
    # 100-partition repair 100 job walls deep (VERDICT r6 #4).  Under
    # spark.scheduler.mode=FAIR (set at session build — session.py; a
    # startup-only key, so a FIFO session handed in by an external driver
    # keeps FIFO) the scheduler interleaves the jobs' task sets and
    # repair wall-clock is bounded by the largest partition plus
    # scheduling overhead.  Under FIFO, concurrent submission still
    # overlaps jobs whenever the cluster is not saturated by the job at
    # the head of the queue — a large first partition can serialize the
    # rest.
    from concurrent.futures import ThreadPoolExecutor

    if len(frag) == 1:
        _rewrite(frag[0][0], frag[0][1])
    else:
        with ThreadPoolExecutor(max_workers=min(8, len(frag))) as pool:
            # list() re-raises the first failure before the commit below
            list(pool.map(lambda t: _rewrite(t[0], t[1]), frag))
    _copy_trees(spark, f"{root}/{version}", f"{root}/{new_name}", clean)
    # file manifest for the new version by SPLICE, not full walk: the
    # copied clean partitions' entries are byte-identical to the base
    # version's, so only the rewritten partitions are re-listed —
    # commit cost tracks REWRITES, not store size (at metastore scale,
    # 3 dir walks instead of 10,000).  Pre-manifest base versions fall
    # back to commit_version's full walk.
    from data_integration_system_spark.pipeline import index_manifest as im

    base_man = im.read_manifest(spark, f"{root}/{version}")
    if base_man is not None and "" in base_man.get("relations", {}):
        im.splice_manifest_from(
            spark,
            f"{root}/{new_name}",
            base_man,
            {"": [name.split("=", 1)[1] for name, _p, _n in frag]},
        )
    # expect_current: a concurrent writer's snapshot must not be
    # overwritten by a compaction of the OLD version (lost update)
    commit_version(spark, root, new_name, expect_current=version)
    return {
        "compacted": True,
        "version": new_name,
        "previous_version": version,
        "partition_by": part_col,
        "rewritten": [name for name, _p, _n in frag],
        "copied_partitions": len(clean),
        "files_rewritten_before": sum(n for _name, _p, n in frag),
        "files_rewritten_after": sum(p_ for _name, p_, _n in frag),
    }
