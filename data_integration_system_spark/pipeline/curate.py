"""End-to-end corpus curation: the composed training-data job.

The reference stops at ingest→store; a training-data pipeline's actual
deliverable is a CURATED corpus.  This module chains the engine's
independently-audited curation stages into one job:

    quality filter (Gopher rules)      operators/textops.quality_filter_gopher
    ∩ exact dedup survivors            operators/dedup.dedup_exact_full
    ∩ near-dup cluster representatives operators/dedup.dedup_corpus_keep_reps
    ∩ decontamination survivors        operators/textops.decontaminate_filter

and commits the surviving documents as an atomically-swapped snapshot
(pipeline/snapshots), returning a per-stage audit report — the
release-over-release record a curation team actually reviews.

Scale notes: every stage emits a doc_id-keyed relation no larger than
the corpus, so the composition is a chain of doc_id equi-joins — at
100 TB, bucket the corpus by doc_id and the whole intersection is
shuffle-free; the decontamination/near-dup drop sets additionally
broadcast inside their own stages.  Each stage's internals (zero-shuffle
quality scan, one-shuffle hash dedup, banded LSH, broadcast anti-joins)
are pinned by tests/test_plans.py on the standalone queries this job
reuses verbatim — composition adds joins, never new shuffles inside a
stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_system_spark.catalog import table
from data_integration_system_spark.pipeline.snapshots import write_snapshot


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    min_novelty_e4: int | None = None,
) -> DataFrame:
    """Run the full curation chain over ``sf_dir``'s documents, commit
    the curated corpus as the next snapshot of ``out_root``, and return
    the per-stage audit report ``(stage_idx, stage, n_docs)``.

    Stage semantics (all keyed on doc_id):

    * ``corpus``        — every document.
    * ``quality``       — Gopher-rule passers.
    * ``exact_dedup``   — first-writer-wins survivors on the full
      normalized content hash.
    * ``near_dedup``    — near-dup cluster representatives (MinHash/LSH
      → connected components → keep min doc_id).
    * ``decontaminated``— documents clear of benchmark shingle overlap
      (the held-out set itself is excluded by contract).
    * ``novel``         — (only when ``min_novelty_e4`` is set) documents
      whose first-seen shingle fraction clears the threshold — drops
      boilerplate-dominated docs no pairwise dedup stage fires on.
    * ``curated``       — the intersection, i.e. what ships.
    """
    from data_integration_system_spark.operators.dedup import (
        dedup_corpus_keep_reps,
        dedup_exact_full,
    )
    from data_integration_system_spark.operators.textops import (
        decontaminate_filter,
        quality_filter_gopher,
    )

    docs = table(spark, sf_dir, "documents")
    stages: list[tuple[str, DataFrame]] = [
        (
            "quality",
            quality_filter_gopher(spark, sf_dir)
            .filter(F.col("passes"))
            .select("doc_id"),
        ),
        ("exact_dedup", dedup_exact_full(spark, sf_dir).select("doc_id")),
        ("near_dedup", dedup_corpus_keep_reps(spark, sf_dir).select("doc_id")),
        (
            "decontaminated",
            decontaminate_filter(spark, sf_dir).select("doc_id"),
        ),
    ]
    if min_novelty_e4 is not None:
        from data_integration_system_spark.operators.dedup import (
            doc_ngram_novelty,
        )

        stages.append(
            (
                "novel",
                doc_ngram_novelty(spark, sf_dir)
                .filter(F.col("novelty_e4") >= min_novelty_e4)
                .select("doc_id"),
            )
        )
    # Each stage relation is consumed TWICE — once in the semi-join
    # chain below and once by the report count — so without a barrier
    # the full stage lineage (the near-dup LSH pass especially) executes
    # twice.  Lazy checkpoint: materialized by whichever action runs
    # first, reused by the second; the relations are doc_id lists,
    # strictly smaller than the corpus.  (Eager checkpointing here was
    # measured SLOWER — it serializes the stage jobs upfront.)
    stages = [
        (name, ids.localCheckpoint(eager=False)) for name, ids in stages
    ]

    curated = docs
    for _name, ids in stages:
        curated = curated.join(ids, "doc_id", "left_semi")
    # one stable view: the report counts and the snapshot write must see
    # the same survivors, and the 4-stage lineage re-runs otherwise
    curated = curated.localCheckpoint()

    write_snapshot(curated, out_root)

    counts: list[tuple[int, str, DataFrame]] = [
        (0, "corpus", docs),
        *[(i + 1, name, ids) for i, (name, ids) in enumerate(stages)],
        (len(stages) + 1, "curated", curated),
    ]
    report = None
    for idx, name, df in counts:
        row = df.agg(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
        )
        report = row if report is None else report.unionByName(row)
    return report.orderBy("stage_idx")


def export_jsonl(
    spark: SparkSession,
    snapshot_root: str,
    out_path: str,
    compression: str = "gzip",
) -> dict:
    """Hand off the curated snapshot as compressed JSON Lines — the
    interchange format tokenizer/training jobs actually consume.
    Returns ``{"path", "version", "rows", "written"}``.

    The export lands under ``{out_path}/{snapshot_version}`` so the
    re-export contract actually holds: after a new snapshot version is
    committed, exporting to the SAME out_path writes the new version's
    rows to a fresh subdir (a flat errorifexists write would raise on
    the second call).  Re-exporting an already-exported version is an
    idempotent no-op (``written=False``) — version dirs are write-once,
    like the snapshots they mirror.

    One distributed write, one file per partition (the snapshot's
    partitioning carries through, so a compacted snapshot exports as
    ~target-size .json.gz parts).  The export is a COPY: the parquet
    snapshot stays the queryable source of truth."""
    from data_integration_system_spark.pipeline.fsutil import hadoop_path
    from data_integration_system_spark.pipeline.snapshots import (
        current_version,
        read_current,
    )

    version = current_version(spark, snapshot_root)
    if version is None:
        raise FileNotFoundError(f"no committed snapshot at {snapshot_root}")
    target = f"{out_path}/{version}"
    p, fs = hadoop_path(spark, target)
    # Completion marker, not directory existence: an export that crashed
    # mid-write leaves a partial dir without _SUCCESS — treat it as
    # absent (delete and rewrite) rather than returning a truncated
    # release as done (advisor r6).
    success, _ = hadoop_path(spark, f"{target}/_SUCCESS")
    if fs.exists(success):
        rows = spark.read.json(target).count()
        return {"path": target, "version": version, "rows": rows, "written": False}
    if fs.exists(p):
        fs.delete(p, True)
    df = read_current(spark, snapshot_root)
    df.write.mode("errorifexists").option("compression", compression).json(target)
    return {"path": target, "version": version, "rows": df.count(), "written": True}


def release_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    export_path: str | None = None,
    min_novelty_e4: int | None = None,
    seq_len: int = 512,
    split_weights: dict[str, int] | None = None,
    split_salt: str = "release",
) -> DataFrame:
    """The full training-data release: curate -> committed snapshot ->
    packing manifest over the SURVIVORS -> optional compressed-JSONL
    hand-off, returning the audit report extended with a ``sequences``
    row (how many fixed-length sequences the release yields).

    This is the deliverable composition: curation decides WHAT ships,
    packing decides HOW the dataloader reads it, and both facts land in
    one report a release review signs off on.  The manifest is committed
    as its own snapshot beside the corpus (`{out_root}_manifest`) so a
    release is the PAIR of versions; the export joins text with its
    packing assignment, one JSONL row per document.

    ``split_weights`` (e.g. ``{"train": 9800, "val": 100, "test": 100}``,
    integer weights out of 10000) fences the release into deterministic
    hash-assigned splits (functions/hashing.assign_split, keyed on
    doc_id, versioned by ``split_salt``): the export gains a ``split``
    column and the report gains one ``split:{name}`` row per split —
    the contamination fence between training and evaluation data is an
    audited release fact, not a downstream afterthought.

    Scale shape: curation is the audited stage chain; packing adds one
    lang-keyed shuffle over survivors (pack_relation); split assignment
    is a scan-side projection; the export is a distributed write.
    Nothing here re-reads the raw corpus after the curation pass."""
    from data_integration_system_spark.functions.hashing import assign_split
    from data_integration_system_spark.operators.textops import pack_relation
    from data_integration_system_spark.pipeline.snapshots import read_current

    report = curate_corpus(
        spark, sf_dir, out_root, min_novelty_e4=min_novelty_e4
    ).localCheckpoint()
    curated = read_current(spark, out_root)
    if split_weights is not None:
        curated = curated.withColumn(
            "split", assign_split("doc_id", split_weights, salt=split_salt)
        )
    manifest = pack_relation(
        curated.select("doc_id", "lang", "text"), seq_len
    ).localCheckpoint(eager=False)
    write_snapshot(manifest, f"{out_root}_manifest")
    n_seqs = (
        manifest.select("lang", "seq_id").distinct().count()
    )
    if export_path is not None:
        # versioned like export_jsonl: the export dir mirrors the corpus
        # snapshot version, so re-releasing to the same path works and a
        # release's JSONL is traceable to its snapshot pair
        from data_integration_system_spark.pipeline.snapshots import current_version

        version = current_version(spark, out_root)
        (
            curated.join(manifest, ["doc_id", "lang"])
            .write.mode("errorifexists")
            .option("compression", "gzip")
            .json(f"{export_path}/{version}")
        )
    next_idx = report.agg(F.max("stage_idx")).head()[0] + 1
    extra = [(int(next_idx), "sequences", int(n_seqs))]
    if split_weights is not None:
        counts = {
            r["split"]: r["n"]
            for r in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        extra += [
            (int(next_idx + 1 + i), f"split:{name}", int(counts.get(name, 0)))
            for i, name in enumerate(split_weights)
        ]
    from data_integration_system_spark.operators._common import local_rows_df

    extra_rows = local_rows_df(
        spark, extra, "stage_idx long, stage string, n_docs long"
    )
    return report.unionByName(extra_rows).orderBy("stage_idx")
