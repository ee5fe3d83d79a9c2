"""Executed-plan metrics (plans/metrics.py) and physical layout
(pipeline/layout.py): pin the scale facts only execution can show —
exchange reuse, map-side combine, stats-based row-group skipping, and
small-file compaction."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from data_integration_system_spark.catalog import table
from data_integration_system_spark.pipeline.layout import (
    compact_snapshot,
    write_clustered,
)
from data_integration_system_spark.pipeline.snapshots import (
    list_versions,
    read_current,
    write_snapshot,
)
from data_integration_system_spark.plans.metrics import (
    collect_with_metrics,
    executed_nodes,
    metric_sum,
    node_count,
    scan_output_rows,
)

SF = "/root/testdata/sf0.001"


def test_broadcast_join_zero_shuffle_records(spark):
    """A dim-broadcast join must move ZERO rows over the shuffle wire —
    the executed `shuffleRecordsWritten` proves the broadcast actually
    happened at runtime (the formatted plan only promises it)."""
    orders = table(spark, SF, "orders")
    cust = table(spark, SF, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name"
    )
    _, nodes = collect_with_metrics(j)
    assert metric_sum(nodes, "ShuffleExchangeExec", "shuffleRecordsWritten") == 0
    assert node_count(nodes, "BroadcastHashJoinExec") == 1


def test_map_side_combine_shrinks_shuffle(spark):
    """Partial aggregation must collapse the stream BEFORE the exchange:
    rows written to the shuffle = |groups × map tasks| partials, orders
    of magnitude below the scanned row count.  This is the executed-plan
    proof behind every 'map-side combined' claim in the operator
    docstrings."""
    ev = table(spark, SF, "events")
    agg = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    _, nodes = collect_with_metrics(agg)
    scanned = scan_output_rows(nodes, "events.parquet")
    shuffled = metric_sum(nodes, "ShuffleExchangeExec", "shuffleRecordsWritten")
    assert scanned >= 1000
    assert 0 < shuffled < scanned / 5


def test_dup_rate_reuses_grain_exchange(spark):
    """dup_rate_by_source consumes the (hash, source) grain twice (per-
    hash counts + join-back).  The formatted plan shows two scans; the
    EXECUTED plan must show AQE materializing the exchange once and
    reusing it — the single-computation claim from the round-5 notes,
    pinned where it is actually visible."""
    from data_integration_system_spark.operators.dedup import dup_rate_by_source

    df = dup_rate_by_source(spark, SF)
    df.collect()
    nodes = executed_nodes(df)
    assert node_count(nodes, "ReusedExchangeExec") >= 1


def test_clustered_write_skips_row_groups(spark, tmp_path):
    """write_clustered = range files + sorted row groups + bounded
    row-group size: a selective range filter must read a small fraction
    of the table (parquet min/max stats skipping), while the same filter
    over an unclustered copy reads everything.  THE layout lever at
    100 TB: same query, same plan shape, ~10x less IO."""
    ev = table(spark, SF, "events")
    total = ev.count()
    clustered = str(tmp_path / "clustered")
    plain = str(tmp_path / "plain")
    write_clustered(ev, clustered, ["user_id"], n_files=4, rowgroup_bytes=64 * 1024)
    ev.repartition(4).write.option("parquet.block.size", 64 * 1024).parquet(plain)

    pred = (F.col("user_id") >= 10) & (F.col("user_id") <= 20)

    q = spark.read.parquet(clustered).filter(pred)
    q.collect()
    clustered_rows = scan_output_rows(executed_nodes(q), "clustered")

    p = spark.read.parquet(plain).filter(pred)
    p.collect()
    plain_rows = scan_output_rows(executed_nodes(p), "plain")

    assert plain_rows == total  # no clustering -> stats too wide to skip
    assert clustered_rows < total * 0.5
    assert clustered_rows < plain_rows
    # correctness unchanged by layout
    assert q.count() == p.count() == ev.filter(pred).count()


def test_bloom_filter_skips_point_lookup_on_hash_key(spark, tmp_path):
    """bloom_cols: an equality probe on a hash-like column must skip the
    row groups that can't contain the value — min/max stats are useless
    there (every row group spans the whole hex domain), so without the
    bloom filter the probe reads the table."""
    from data_integration_system_spark.pipeline.layout import write_clustered

    n = 200_000
    df = spark.range(n).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("h")
    )
    bpath = str(tmp_path / "bloom")
    ppath = str(tmp_path / "plain")
    write_clustered(df, bpath, ["id"], n_files=4,
                    rowgroup_bytes=64 * 1024, bloom_cols=["h"])
    write_clustered(df, ppath, ["id"], n_files=4, rowgroup_bytes=64 * 1024)

    probe = df.filter(F.col("id") == 12345).head()["h"]

    def rows_read(path):
        q = spark.read.parquet(path).filter(F.col("h") == probe)
        assert q.count() == 1  # layout never changes answers
        q.collect()
        return scan_output_rows(executed_nodes(q), "")

    assert rows_read(ppath) == n  # stats too wide: full read
    assert rows_read(bpath) < n * 0.05  # bloom: ~one row group


def test_content_hash_point_lookup_probes_not_scans(spark):
    """The registered layout consumer (content_hash_point_lookup) must
    actually exercise the bloom path: its executed probe scan reads a
    small fraction of the stored table, and re-invocation reuses the
    cached layout (the build is write-path, priced once)."""
    from data_integration_system_spark.operators import relational as rel

    df = rel.content_hash_point_lookup(spark, SF)
    n_hits = df.count()
    assert n_hits > 0
    path = rel._HASH_LAYOUT_CACHE[SF] + "/by_hash"
    total = spark.read.parquet(path).count()
    df.collect()
    read = scan_output_rows(executed_nodes(df), "")
    # sf0.001 is small enough to fit one row group per file, so the pin
    # is modest: the probe must not read MORE than the table (2 passes
    # allowed — the global sort's range-partitioner samples the scan
    # once before the real read); the dedicated bloom test above pins
    # the actual row-group skipping at 200k rows.  Layout answers must
    # match a brute-force recompute.
    assert read <= 2 * total
    brute = (
        table(spark, SF, "documents")
        .select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("content_hash"))
    )
    probes = [r.content_hash for r in brute.filter(F.col("doc_id") % 101 == 0)
              .select("content_hash").distinct().collect()]
    want = brute.filter(F.col("content_hash").isin(probes)).count()
    assert n_hits == want
    # second call: layout dir unchanged (cache hit, no rebuild)
    again = rel.content_hash_point_lookup(spark, SF)
    assert rel._HASH_LAYOUT_CACHE[SF] + "/by_hash" == path
    assert again.count() == n_hits


def test_zordered_write_skips_on_both_columns(spark, tmp_path):
    """write_zordered: a selective predicate on EITHER clustered column
    must skip most row groups (Morton interleave -> row groups are small
    hyperrectangles in the 2-column space), where a single-column
    range-clustered layout only skips on its sort column and reads the
    whole table for the other.  Uniform 256x256 grid so the geometry is
    deterministic and the table has enough row groups (32 KiB) for
    per-column pruning to be visible."""
    from data_integration_system_spark.pipeline.layout import write_zordered

    n = 1 << 16
    df = spark.range(n).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "zorder")
    cpath = str(tmp_path / "bycol1")
    write_zordered(df, zpath, "x", "y", n_files=8, rowgroup_bytes=32 * 1024)
    write_clustered(df, cpath, ["x"], n_files=8, rowgroup_bytes=32 * 1024)

    px = F.col("x") <= 15  # 1/16 slab in x
    py = F.col("y") <= 15  # 1/16 slab in y

    def rows_read(path, pred):
        # single-scan plans: match every scan node ("" fragment) — the
        # node detail TRUNCATES long pytest tmp paths, so a dir-name
        # fragment can silently match nothing and return 0
        q = spark.read.parquet(path).filter(pred)
        q.collect()
        rows = scan_output_rows(executed_nodes(q), "")
        assert rows > 0
        return rows

    # x predicate: both layouts skip (the single-column sort skips more
    # on its OWN column — that's the z-order trade)
    assert rows_read(zpath, px) < n * 0.4
    assert rows_read(cpath, px) < n * 0.4
    # y predicate: only the z-ordered layout skips
    zy = rows_read(zpath, py)
    cy = rows_read(cpath, py)
    assert cy > n * 0.9  # single-column clustering: stats too wide
    assert zy < n * 0.4
    # layout never changes answers
    assert (
        spark.read.parquet(zpath).filter(py).count()
        == spark.read.parquet(cpath).filter(py).count()
        == df.filter(py).count()
        == n // 16
    )


def test_zorder_range_scan_matches_brute_force(spark):
    """The registered z-order consumer (zorder_range_scan) answers
    identically to a brute-force filter of the source table, pushes both
    BETWEEN predicates into the layout scan, and reuses the cached
    layout on re-invocation (build = write path, priced once).  The
    row-group-skipping pin lives in the 256x256-grid test above —
    sf0.001 fits one row group per file."""
    from data_integration_system_spark.operators import relational as rel

    df = rel.zorder_range_scan(spark, SF)
    got = [(r.event_id, r.user_id, r.value) for r in df.collect()]
    assert got  # the predicate selects rows at every sf
    path = rel._ZORDER_LAYOUT_CACHE[SF] + "/by_uv"
    want = sorted(
        (r.event_id, r.user_id, r.value)
        for r in table(spark, SF, "events")
        .filter(F.col("user_id").between(3, 9) & F.col("value").between(50.0, 150.0))
        .select("event_id", "user_id", "value")
        .collect()
    )
    assert got == want
    # both predicates reach the parquet scan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    for frag in ("GreaterThanOrEqual(user_id,3)", "LessThanOrEqual(user_id,9)"):
        assert frag in plan, plan[:2000]
    # second call: cache hit, layout dir unchanged
    again = rel.zorder_range_scan(spark, SF)
    assert rel._ZORDER_LAYOUT_CACHE[SF] + "/by_uv" == path
    assert again.count() == len(got)


def test_compact_snapshot_merges_small_files(spark, tmp_path):
    """A fragmented snapshot (one file per shuffle partition) compacts
    into ~target-sized files as a NEW manifest-committed version: same
    rows, fewer files, old version still time-travelable, second run a
    no-op."""
    root = str(tmp_path / "store")
    ev = table(spark, SF, "events").repartition(32)
    write_snapshot(ev, root)
    n_before = len(glob.glob(f"{root}/v000001/*.parquet"))
    assert n_before >= 30

    report = compact_snapshot(spark, root, target_file_bytes=64 * 1024 * 1024)
    assert report["compacted"] is True
    assert report["n_files_after"] < n_before
    assert read_current(spark, root).count() == ev.count()
    assert list_versions(spark, root) == ["v000001", "v000002"]

    again = compact_snapshot(spark, root, target_file_bytes=64 * 1024 * 1024)
    assert again["compacted"] is False  # idempotent: already at target


def test_kmeans_assignment_no_corpus_shuffle(spark):
    """kmeans_assign_int's scale claim: the corpus side is never
    shuffle-joined — centroids collapse to one broadcast row and the
    argmin is inline.  Pin: the only join is the broadcast nested-loop
    attach, no SortMergeJoin, and the exchanges belong to the
    |labels|x|dim| centroid derivation (+ the final presentation sort),
    never the corpus."""
    from data_integration_system_spark.operators.similarity import (
        kmeans_assign_int,
    )
    from data_integration_system_spark.plans.analyze import (
        formatted_plan,
        shuffle_count,
        sortmerge_join_count,
    )

    df = kmeans_assign_int(spark, SF)
    plan = formatted_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert sortmerge_join_count(df) == 0
    assert shuffle_count(df) <= 4


def test_novelty_shuffle_volume_stays_linear(spark):
    """doc_ngram_novelty's scale claim is linearity: nothing pair-wise.
    Executed pin: the TOTAL rows crossing any shuffle wire stay below
    TWO passes over the exploded shingle grain (the theoretical shape is
    one combined agg pass + one join-back pass; any pair blowup would be
    orders of magnitude above it).  Scale-invariant where an
    exchange-reuse pin is not — at sf0.001 AQE legitimately broadcasts
    the checkpointed shingle side instead of reusing its exchange."""
    from data_integration_system_spark.operators.dedup import doc_ngram_novelty

    df = doc_ngram_novelty(spark, SF)
    df.collect()
    nodes = executed_nodes(df)
    shingle_grain = max(
        n.metrics.get("numOutputRows", 0)
        for n in nodes
        if n.cls == "RDDScanExec"  # the checkpointed (doc, hash) relation
    )
    total_shuffled = metric_sum(nodes, "ShuffleExchangeExec", "shuffleRecordsWritten")
    assert shingle_grain > 10_000
    assert 0 < total_shuffled < 2 * shingle_grain


def test_compact_preserves_partition_layout(spark, tmp_path):
    """Compacting a hive-partitioned snapshot must KEEP the layout:
    the new version carries the same col=value dirs (~1 file each) and
    partition pruning still reaches the scan — a naive coalesce rewrite
    would flatten the table and silently destroy every reader's
    pruning.  Second run is a no-op (never below 1 file/partition)."""
    import re

    from data_integration_system_spark.pipeline.snapshots import (
        current_version,
    )
    from data_integration_system_spark.plans.analyze import partition_filters

    root = str(tmp_path / "store")
    ev = table(spark, SF, "events").withColumn(
        "bucket", (F.col("user_id") % 4).cast("int")
    )
    write_snapshot(ev.repartition(8), root, partition_by="bucket")
    v1 = current_version(spark, root)
    files_before = glob.glob(f"{root}/{v1}/bucket=*/*.parquet")
    assert len(files_before) > 8  # fragmented: ~8 files per bucket

    report = compact_snapshot(spark, root, target_file_bytes=64 * 1024 * 1024)
    assert report["compacted"] is True and report["partition_by"] == "bucket"
    v2 = current_version(spark, root)
    dirs = {
        re.search(r"bucket=(\d+)", d).group(1)
        for d in glob.glob(f"{root}/{v2}/bucket=*")
    }
    assert dirs == {"0", "1", "2", "3"}
    assert len(glob.glob(f"{root}/{v2}/bucket=*/*.parquet")) <= 8
    got = read_current(spark, root)
    assert got.count() == ev.count()
    pruned = got.filter(F.col("bucket") == 2)
    assert partition_filters(pruned, root) != []  # pruning survives
    assert pruned.count() == ev.filter(F.col("bucket") == 2).count()

    again = compact_snapshot(spark, root, target_file_bytes=64 * 1024 * 1024)
    assert again["compacted"] is False


def test_compact_splits_skewed_partition(spark, tmp_path):
    """A hive partition larger than target_file_bytes must compact into
    MULTIPLE files (≈ ceil(bytes/target) of them, i.e. multiple tasks),
    not funnel through one task into one oversized file — the key-skew
    hot-task trap of a bare repartition(part_col)."""
    import re

    from data_integration_system_spark.pipeline.snapshots import current_version

    root = str(tmp_path / "store")
    ev = table(spark, SF, "events").withColumn(
        # ~95% of rows land in bucket 0: one fat partition, one thin one
        "bucket",
        F.when(F.col("user_id") % 20 == 0, 1).otherwise(0).cast("int"),
    )
    write_snapshot(ev.repartition(16), root, partition_by="bucket")
    v1 = current_version(spark, root)
    fat_bytes = sum(
        __import__("os").path.getsize(f)
        for f in glob.glob(f"{root}/{v1}/bucket=0/*.parquet")
    )
    target = max(fat_bytes // 3, 1)  # plan ≥3 files for the fat partition
    report = compact_snapshot(spark, root, target_file_bytes=target)
    assert report["compacted"] is True
    v2 = current_version(spark, root)
    fat_files = glob.glob(f"{root}/{v2}/bucket=0/*.parquet")
    assert len(fat_files) >= 2  # the skewed partition split across tasks
    # no file grossly above target (2x slack for row-group granularity)
    assert all(__import__("os").path.getsize(f) < 2.5 * target for f in fat_files)
    # layout + data survive
    dirs = {re.search(r"bucket=(\d+)", d).group(1) for d in glob.glob(f"{root}/{v2}/bucket=*")}
    assert dirs == {"0", "1"}
    assert read_current(spark, root).count() == ev.count()


def test_compact_splits_skewed_partition_with_escaped_value(spark, tmp_path):
    """Partition values Spark %-escapes in hive dir names (spaces,
    colons) must still match compact_snapshot's per-partition file plan
    (advisor r6): a skewed partition whose value is escaped on disk has
    to split across multiple files, not silently funnel through one
    task because the plan join missed the raw dir string."""
    import os

    from data_integration_system_spark.pipeline.snapshots import current_version

    root = str(tmp_path / "store")
    ev = table(spark, SF, "events").withColumn(
        # ~95% of rows land in the value that needs escaping on disk
        "shard",
        F.when(F.col("user_id") % 20 == 0, F.lit("rare plain"))
        .otherwise(F.lit("hot: escaped value"))
        .cast("string"),
    )
    write_snapshot(ev.repartition(16), root, partition_by="shard")
    v1 = current_version(spark, root)
    dirs = [d for d in glob.glob(f"{root}/{v1}/shard=*")]
    assert any("%3A" in d or "%20" in d for d in dirs)  # escaping happened
    fat_dir = next(d for d in dirs if "hot" in d)
    fat_bytes = sum(
        os.path.getsize(f) for f in glob.glob(f"{fat_dir}/*.parquet")
    )
    target = max(fat_bytes // 3, 1)  # plan ≥3 files for the fat partition
    report = compact_snapshot(spark, root, target_file_bytes=target)
    assert report["compacted"] is True
    v2 = current_version(spark, root)
    fat_dir2 = next(d for d in glob.glob(f"{root}/{v2}/shard=*") if "hot" in d)
    assert len(glob.glob(f"{fat_dir2}/*.parquet")) >= 2  # plan matched
    got = read_current(spark, root)
    assert got.count() == ev.count()
    assert (
        got.filter(F.col("shard") == "hot: escaped value").count()
        == ev.filter(F.col("shard") == "hot: escaped value").count()
    )


def test_compact_partitions_submits_rewrites_concurrently(spark, tmp_path, monkeypatch):
    """Multiple fragmented partitions must be rewritten as CONCURRENT
    Spark jobs (VERDICT r6 #4): repair wall-clock is bounded by the
    largest partition, not the partition count.  Structural pin: the
    rewrites go through a thread pool sized to the fragment count, and
    the jobs genuinely overlap (observed pool concurrency > 1)."""
    import concurrent.futures as cf
    import threading

    from data_integration_system_spark.pipeline.layout import compact_partitions
    from data_integration_system_spark.pipeline.snapshots import current_version

    seen = {"max_workers": 0, "overlap": 0, "live": 0}
    lock = threading.Lock()
    real_pool = cf.ThreadPoolExecutor

    class SpyPool(real_pool):
        def __init__(self, max_workers=None, **kw):
            seen["max_workers"] = max_workers
            super().__init__(max_workers=max_workers, **kw)

        def map(self, fn, it):
            def traced(item):
                with lock:
                    seen["live"] += 1
                    seen["overlap"] = max(seen["overlap"], seen["live"])
                try:
                    return fn(item)
                finally:
                    with lock:
                        seen["live"] -= 1

            return super().map(traced, it)

    monkeypatch.setattr(cf, "ThreadPoolExecutor", SpyPool)

    root = str(tmp_path / "store")
    ev = table(spark, SF, "events").withColumn(
        "bucket", (F.col("user_id") % 4).cast("int")
    )
    write_snapshot(ev.repartition(12), root, partition_by="bucket")
    v1 = current_version(spark, root)
    assert len(glob.glob(f"{root}/{v1}/bucket=*/*.parquet")) > 4
    report = compact_partitions(spark, root, target_file_bytes=64 * 1024 * 1024)
    assert report["compacted"] is True and len(report["rewritten"]) == 4
    assert seen["max_workers"] == 4
    assert seen["overlap"] > 1  # the rewrite jobs actually ran in parallel
    assert read_current(spark, root).count() == ev.count()


def test_unescape_hive_values():
    from data_integration_system_spark.pipeline.layout import (
        _HIVE_NULL,
        _unescape_hive,
    )

    assert _unescape_hive("2024-01-01 00%3A00%3A00") == "2024-01-01 00:00:00"
    assert _unescape_hive("two%20words") == "two words"
    assert _unescape_hive("plain") == "plain"
    assert _unescape_hive(_HIVE_NULL) is None


def test_compact_partitions_rewrites_only_fragmented(spark, tmp_path):
    """Selective compaction: only the fragmented partition is re-read and
    rewritten; clean partitions are byte-copied (identical files), the
    result commits as a normal readable version, time travel to the
    pre-compaction version survives, and a second run is a no-op."""
    import os as _os
    import re

    from data_integration_system_spark.pipeline.layout import compact_partitions
    from data_integration_system_spark.pipeline.snapshots import (
        current_version,
        read_version,
    )

    root = str(tmp_path / "store")
    ev = table(spark, SF, "events").withColumn(
        "bucket", (F.col("user_id") % 3).cast("int")
    )
    # bucket 0 fragmented (16 slivers), buckets 1-2 written compact
    # (one task -> one file per clean bucket, already at their plan)
    write_snapshot(
        ev.filter("bucket = 0").repartition(16).unionByName(
            ev.filter("bucket != 0").repartition(1)
        ),
        root,
        partition_by="bucket",
    )
    # the union writes per-task, so re-check actual fragmentation and
    # compact with a target that only bucket 0 exceeds
    v1 = current_version(spark, root)
    clean_files = {
        b: sorted(
            _os.path.basename(f)
            for f in glob.glob(f"{root}/{v1}/bucket={b}/*.parquet")
        )
        for b in (1, 2)
    }
    frag_before = len(glob.glob(f"{root}/{v1}/bucket=0/*.parquet"))
    big = sum(
        _os.path.getsize(f) for f in glob.glob(f"{root}/{v1}/bucket=0/*.parquet")
    )
    report = compact_partitions(spark, root, target_file_bytes=big + 1)
    assert report["compacted"] is True
    assert report["rewritten"] == ["bucket=0"]
    assert report["copied_partitions"] == 2
    v2 = current_version(spark, root)
    assert v2 != v1
    # fragmented partition: down to its 1-file plan
    assert len(glob.glob(f"{root}/{v2}/bucket=0/*.parquet")) == 1 < frag_before
    # clean partitions: file-copied verbatim (same names, same bytes)
    for b in (1, 2):
        got = sorted(
            _os.path.basename(f)
            for f in glob.glob(f"{root}/{v2}/bucket={b}/*.parquet")
        )
        assert got == clean_files[b]
        for name in got:
            assert _os.path.getsize(f"{root}/{v2}/bucket={b}/{name}") == \
                _os.path.getsize(f"{root}/{v1}/bucket={b}/{name}")
    # data + layout intact, old version still readable
    got_df = read_current(spark, root)
    assert got_df.count() == ev.count()
    dirs = {
        re.search(r"bucket=(\d+)", d).group(1)
        for d in glob.glob(f"{root}/{v2}/bucket=*")
    }
    assert dirs == {"0", "1", "2"}
    assert read_version(spark, root, v1).count() == ev.count()

    again = compact_partitions(spark, root, target_file_bytes=big + 1)
    assert again["compacted"] is False


def test_compact_partitions_max_rewrites_bounds_work(spark, tmp_path):
    """A bounded incremental run rewrites only the worst offender and
    copies the rest; the next run picks up the deferred partition."""
    from data_integration_system_spark.pipeline.layout import compact_partitions
    from data_integration_system_spark.pipeline.snapshots import current_version

    root = str(tmp_path / "store")
    ev = table(spark, SF, "events").withColumn(
        "bucket", (F.col("user_id") % 2).cast("int")
    )
    write_snapshot(
        # both fragmented; bucket 0 worse (12 slivers vs 6)
        ev.filter("bucket = 0").repartition(12).unionByName(
            ev.filter("bucket = 1").repartition(6)
        ),
        root,
        partition_by="bucket",
    )
    import os as _os

    v1 = current_version(spark, root)
    big = max(
        sum(_os.path.getsize(f) for f in glob.glob(f"{root}/{v1}/bucket={b}/*.parquet"))
        for b in (0, 1)
    )
    r1 = compact_partitions(spark, root, target_file_bytes=big + 1, max_rewrites=1)
    assert r1["rewritten"] == ["bucket=0"]  # worst offender first
    r2 = compact_partitions(spark, root, target_file_bytes=big + 1, max_rewrites=1)
    assert r2["rewritten"] == ["bucket=1"]  # deferred one picked up
    r3 = compact_partitions(spark, root, target_file_bytes=big + 1, max_rewrites=1)
    assert r3["compacted"] is False
    assert read_current(spark, root).count() == ev.count()


def test_maintain_snapshot_store_end_to_end(spark, tmp_path):
    """The scheduled maintenance pass: compacts the fragmented current
    version AND prunes history beyond the keep budget, in one idempotent
    call (the cron entry point)."""
    from data_integration_system_spark.pipeline.maintenance import (
        maintain_snapshot_store,
    )

    root = str(tmp_path / "store")
    ev = table(spark, SF, "events")
    write_snapshot(ev.repartition(16), root)   # v1 (fragmented)
    write_snapshot(ev.repartition(16), root)   # v2 (fragmented, current)

    rep = maintain_snapshot_store(spark, root, keep_versions=2)
    # compaction committed v3; prune(keep=2) then dropped v1
    assert rep["compacted"] is True
    assert rep["pruned_versions"] == ["v000001"]
    assert list_versions(spark, root) == ["v000002", "v000003"]
    assert read_current(spark, root).count() == ev.count()

    again = maintain_snapshot_store(spark, root, keep_versions=2)
    assert again["compacted"] is False and again["pruned_versions"] == []


def test_maintain_missing_root_is_skipped(spark, tmp_path):
    """A root with no committed snapshot reports missing instead of
    raising — one unstarted sink must not kill the cron's pass over its
    other roots."""
    from data_integration_system_spark.pipeline.maintenance import (
        maintain_snapshot_store,
    )

    rep = maintain_snapshot_store(spark, str(tmp_path / "never_written"))
    assert rep == {"compacted": False, "missing": True, "pruned_versions": []}
