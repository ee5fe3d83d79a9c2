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

    Each batch: read the current snapshot → merge_keep_latest → commit a
    NEW snapshot (pipeline/snapshots.py — the same copy-on-write store
    the page table uses: a crash mid-write leaves the previous snapshot
    authoritative, nothing is ever overwritten in place).  Re-running a
    batch (at-least-once) converges to the same table.  Old snapshots
    are pruned to the newest 2 per batch to bound storage; at scale the
    same commit becomes a Delta/Iceberg MERGE."""
    from data_integration_system_spark.pipeline.snapshots import (
        current_version,
        prune_snapshots,
        read_current,
        snapshot_exists,
        write_snapshot,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        if snapshot_exists(spark, target_path):
            # expect_current: the merge read THIS version as its base —
            # refuse the commit if another writer swapped the manifest
            # mid-merge (a second stream on the same target is a config
            # error; better a loud ConcurrentWriteError than silently
            # dropping its rows from the lineage)
            base = current_version(spark, target_path)
            merged = merge_keep_latest(
                read_current(spark, target_path), batch, key, version_col
            )
        else:
            base, merged = None, batch
        write_snapshot(merged, target_path, expect_current=base)
        prune_snapshots(spark, target_path, keep=2)

    return apply


def pending_job_picker(jobs_stream: DataFrame) -> DataFrame:
    """T1/S14 — the job-queue poll (SELECT ... WHERE status='PENDING'
    ORDER BY created_at, db/postgres_store.py:26-43) as a streaming
    filter; the 2 s poll cadence (worker_daemon.py:27) becomes the
    caller's `trigger(processingTime="2 seconds")`, and the SKIP LOCKED
    claim race disappears — the stream owns its input exactly once."""
    return jobs_stream.filter(F.col("status") == "PENDING")


def job_worker_stream(
    spark: SparkSession,
    jobs_path: str,
    output_root: str,
    fetch_fn=None,
    trigger: dict | None = None,
    stream_options: dict | None = None,
):
    """The worker daemon itself (worker_daemon.py:20-58) as a streaming
    query: watch the jobs log, and on every micro-batch containing new
    PENDING rows, claim-and-run them via `run_pending_jobs` (which
    appends the RUNNING/DONE/FAILED transitions back onto the same log).

    The reference's 2 s `asyncio.sleep` poll becomes the trigger
    (default `processingTime='2 seconds'`; pass
    ``{"availableNow": True}`` for a drain-and-stop worker).  Claim
    races disappear: the stream owns its input exactly once, and
    `run_pending_jobs` re-reads current state so a row already
    transitioned by an earlier batch is never re-claimed.  Returns the
    StreamingQuery; caller stops it."""
    from data_integration_system_spark.pipeline.fetch import default_http_fetch
    from data_integration_system_spark.pipeline.jobs import (
        _JOBS_SCHEMA,
        run_pending_jobs,
    )

    fetch = fetch_fn or default_http_fetch
    # schema is the known constant, NOT inferred from the log: the worker
    # must be deployable BEFORE the first submission (the reference
    # daemon's startup order).  The file source still demands the path
    # EXIST at query start, so create the (empty) log dir — submit_job
    # appends into it either way.
    from data_integration_system_spark.pipeline.fsutil import hadoop_path

    p, fs = hadoop_path(spark, jobs_path)
    if not fs.exists(p):
        fs.mkdirs(p)
    reader = spark.readStream.schema(_JOBS_SCHEMA)
    for k, v in (stream_options or {}).items():
        # e.g. maxFilesPerTrigger=1 for a deterministic multi-batch replay
        reader = reader.option(k, v)
    stream = pending_job_picker(reader.parquet(jobs_path))

    def work(batch: DataFrame, batch_id: int) -> None:
        # the batch is the wake-up signal; claiming happens against the
        # folded CURRENT state (a PENDING row in this batch that a prior
        # batch already ran folds to DONE and is skipped).  Loop until
        # the queue is drained — a batch may carry more PENDING rows
        # than one run_pending_jobs claim limit.
        if batch.isEmpty():
            return
        while run_pending_jobs(spark, jobs_path, output_root, fetch):
            pass

    q = stream.writeStream.foreachBatch(work)
    q = q.trigger(**(trigger or {"processingTime": "2 seconds"}))
    return q.start()


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


def _ts_us(col):
    """pandas timestamp column -> int64 epoch microseconds."""
    return col.values.astype("datetime64[us]").astype("int64")


def _funnel_fold(key, pdfs, state):
    """The funnel's state transition (module-level so unit tests can
    drive it batch by batch with a fake GroupState)."""
    import pandas as pd  # local import: runs on workers

    s_us, purch = state.get if state.exists else (None, [])
    purch = list(purch)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        us = _ts_us(pdf["ts"])
        for t_us, etype in zip(us, pdf["event_type"]):
            if etype == "signup":
                s_us = t_us if s_us is None else min(s_us, int(t_us))
            elif etype == "purchase":
                purch.append(int(t_us))
    # prune: keep purchases that could still be the first-qualifying
    # one for the current (or any lower, future) signup — everything
    # below the signup, plus the smallest at-or-after it
    purch = sorted(set(purch))
    if s_us is not None:
        ge = [p for p in purch if p >= s_us]
        # cap the SPECULATIVE pre-signup candidates only — the qualifying
        # purchase (tail of the sorted list) must always survive the cap
        purch = [p for p in purch if p < s_us][:1023] + ge[:1]
    else:
        purch = purch[:1024]
    state.update((int(s_us) if s_us is not None else None, purch))
    best = min((p for p in purch if s_us is not None and p >= s_us), default=None)
    if s_us is not None and best is not None:
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "signup_ts": [pd.Timestamp(s_us, unit="us")],
                "first_purchase_ts": [pd.Timestamp(best, unit="us")],
                "lag_us": [best - s_us],
            }
        )


def funnel_state_stream(events: DataFrame) -> DataFrame:
    """Streaming sibling of signup_purchase_funnel (operators/windows.py):
    per user, first signup -> first purchase at-or-after it, maintained
    incrementally via applyInPandasWithState; emits the updated funnel
    row whenever a user's (signup, first purchase) pair changes.

    Exactness under out-of-order arrival: state keeps the min signup so
    far plus the candidate purchase set — every purchase EARLIER than the
    current signup (a later, earlier signup could make it qualify) and
    the best qualifying one.  That candidate list is pruned each fold and
    in practice stays tiny (purchases preceding a signup are rare); it is
    hard-capped at 1024 entries.  State eviction belongs to a timeout
    conf in production (NoTimeout here — tests drive a bounded replay);
    the batch form remains the Kappa backfill."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    fold = _funnel_fold
    return (
        events.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=(
                "user_id bigint, signup_ts timestamp, "
                "first_purchase_ts timestamp, lag_us bigint"
            ),
            stateStructType="s_us bigint, purch array<bigint>",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def event_transitions_stream(events: DataFrame) -> DataFrame:
    """Streaming sibling of event_type_transitions (operators/windows.py):
    the lead-equivalent — each user's previous event type is one tuple of
    state, and every arriving event emits its (event_type -> next_type)
    transition edge.  Downstream counts are the consumer's aggregation
    (chaining a second stateful agg onto update-mode output is
    restricted; the test folds the emitted edges and matches the batch
    matrix).

    Within a micro-batch rows are processed in (ts, event_id) order —
    identical to the batch window's total order; across batches the
    per-user state carries the boundary, so a time-ordered replay
    reproduces the batch result exactly."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        import pandas as pd  # local import: runs on workers

        (last_type,) = state.get if state.exists else (None,)
        out_prev, out_next, out_ts = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for t, etype in zip(pdf["ts"], pdf["event_type"]):
                if last_type is not None:
                    out_prev.append(last_type)
                    out_next.append(etype)
                    out_ts.append(t)
                last_type = etype
        state.update((last_type,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_prev),
                "event_type": out_prev,
                "next_type": out_next,
                "ts": out_ts,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=(
            "user_id bigint, event_type string, next_type string, ts timestamp"
        ),
        stateStructType="last_type string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def near_dup_sink(
    spark: SparkSession,
    index_path: str,
    pairs_path: str,
    min_jaccard: float = 0.2,
    top_k_neighbors: int | None = None,
):
    """Incremental near-duplicate detection over the materialized
    MinHash index (operators/dedup.build_minhash_index): each
    micro-batch of documents is APPENDED to the index, then queried
    against it — so every batch surfaces its duplicates against the
    whole corpus seen so far AND within itself, paying only the pruned
    index probe, never a corpus rescan.  Canonicalized (doc_a < doc_b)
    pairs append to ``pairs_path``.  Returns a foreachBatch callable.

    At-least-once caveat: a redelivered batch re-appends its band rows
    (harmless for pair correctness — candidates are pair-distinct — but
    it duplicates index storage) and re-emits its pairs; the periodic
    build_minhash_index rebuild compacts the former, and pair consumers
    dedup on (doc_a, doc_b) exactly like every other idempotent sink
    here.  Expects batches of (doc_id, text).

    ``top_k_neighbors`` extends the r12 bounded-output contract
    (operators/dedup.dedup_embedding_near's capped mode) to the 24/7
    surface: each incoming doc emits at most its k highest-jaccard
    neighbors (ties broken by c_id for determinism).  Every doc is the
    PROBE side once PER INGEST — the trigger that ingests it — so with
    distinct doc_ids the per-batch cap is a global per-doc probe-side
    cap, and a careless low threshold on a redundant corpus emits
    O(stream · k) pairs instead of the quadratic pair set.  (The
    O(stream · k) bound counts INGESTS, not distinct ids: a re-ingested
    doc_id — the at-least-once caveat above — probes again and can emit
    up to another k probe-side pairs; the strict per-DOC cap assumes no
    doc_id re-ingest.)  A doc can still accrue rows as
    the MATCHED side of later docs' top-k, which is dedup semantics
    (the canonical rep of a large duplicate cluster is named by each
    member once), not a quadratic blow-up.  Cap >= every doc's true
    degree reproduces the uncapped pair set exactly (pinned in
    tests/test_streaming.py).

    Trigger sizing (measured at the 5M-doc index, SCALE.md r16): the
    per-batch machinery floor ~30 s dominates until tens of thousands
    of docs per trigger — 400/4k/40k-doc batches ran 75/9.0/1.1 ms/doc
    at batch walls of 30/36/45 s.  Size triggers to >=10k docs when
    throughput-bound; sub-minute freshness costs ~66x throughput."""
    from data_integration_system_spark.operators.dedup import (
        append_minhash_index,
        minhash_bands,
        query_minhash_index,
        shingle_sets,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.localCheckpoint()  # one stable view for index + probe
        # derive shingles + band rows ONCE and share them between the
        # append and the probe: both passes need the identical
        # deterministic relations, and deriving them twice paid the
        # shingle+signature projection twice per trigger (measured
        # ~2-3 s of the sf0.1 trigger wall, r17)
        sh = shingle_sets(batch)
        bands = minhash_bands(batch, shingles_df=sh).localCheckpoint()
        append_minhash_index(
            spark, index_path, batch, shingles_df=sh, bands_df=bands
        )
        pairs = query_minhash_index(
            spark,
            index_path,
            batch,
            min_jaccard=min_jaccard,
            shingles_df=sh,
            bands_df=bands,
        )
        if top_k_neighbors is not None:
            # cap BEFORE canonicalization: the contract is per PROBE doc
            # (q_id), and q_id is this trigger's incoming side
            from pyspark.sql import Window

            rk = F.row_number().over(
                Window.partitionBy("q_id").orderBy(
                    F.col("jaccard").desc(), F.col("c_id")
                )
            )
            pairs = (
                pairs.withColumn("rk", rk)
                .filter(F.col("rk") <= top_k_neighbors)
                .drop("rk")
            )
        (
            pairs.select(
                F.least("q_id", "c_id").alias("doc_a"),
                F.greatest("q_id", "c_id").alias("doc_b"),
                "jaccard",
            )
            .dropDuplicates(["doc_a", "doc_b"])
            .write.mode("append")
            .parquet(pairs_path)
        )

    return apply


def fingerprint_overlap_sink(
    spark: SparkSession,
    index_path: str,
    pairs_path: str,
    min_shared: int = 2,
):
    """Incremental fingerprint-overlap detection — the winnowing sibling
    of near_dup_sink: each micro-batch appends its fingerprints to the
    inverted index (operators/textops.append_fingerprint_index), then
    probes it, so every batch surfaces overlap pairs against the corpus
    seen so far AND within itself at pruned-probe cost.  Canonicalized
    (doc_a < doc_b, shared_fps) pairs append to ``pairs_path``.

    Same at-least-once contract as near_dup_sink: redelivery duplicates
    index storage (compacted by the periodic build_fingerprint_index
    rebuild, which also re-applies stop-hash pruning) and re-emits
    pairs (consumers dedup on the pair key).  Duplicated index rows
    cannot inflate the overlap counts: query_fingerprint_index counts
    DISTINCT fp_hash per pair, so a redelivered batch re-emits pairs
    with IDENTICAL shared_fps and no sub-threshold pair ever crosses
    min_shared.  Expects (doc_id, text).

    Trigger sizing: same per-batch machinery floor as near_dup_sink
    (measured ~20-30 s at the 5M-doc index, SCALE.md r15/r16) — size
    triggers to >=10k docs when throughput-bound; the r16 batch-size
    curve (75 -> 1.1 ms/doc from 400 to 40k docs/trigger) applies."""
    from data_integration_system_spark.operators.textops import (
        append_fingerprint_index,
        query_fingerprint_index,
        winnow_fingerprints,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.localCheckpoint()  # one stable view for index + probe
        # one fingerprint derivation shared by append + probe (same
        # dedup of work as near_dup_sink — the relation is
        # deterministic, so sharing changes no output)
        fps = winnow_fingerprints(batch, spread=False).localCheckpoint()
        append_fingerprint_index(spark, index_path, batch, fps_df=fps)
        pairs = query_fingerprint_index(
            spark, index_path, batch, min_shared=min_shared, fps_df=fps
        )
        (
            pairs.select(
                F.least("q_id", "c_id").alias("doc_a"),
                F.greatest("q_id", "c_id").alias("doc_b"),
                "shared_fps",
            )
            .dropDuplicates(["doc_a", "doc_b"])
            .write.mode("append")
            .parquet(pairs_path)
        )

    return apply


def ann_ingest_sink(spark: SparkSession, index_path: str):
    """Online ANN index growth: each micro-batch of (vec_id, embedding)
    rows is assigned to the stored centroids and appended into their
    partition dirs (operators/similarity.append_ivf_index) — the
    write-side twin of ann_probe_sink, so one index serves live ingest
    AND live probes between scheduled full rebuilds (which refit the
    centroids as the distribution drifts).

    At-least-once safe: a redelivered batch appends duplicate rows, and
    query_ivf_index dedups (vec_id) over the probed subset, so replays
    never change a query's top-k (pinned in test_scale_patterns)."""
    from data_integration_system_spark.operators.similarity import append_ivf_index

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        append_ivf_index(spark, index_path, batch.localCheckpoint())

    return apply


def ann_delete_sink(spark: SparkSession, index_path: str):
    """Streaming TAKEDOWN for the composed IVF-PQ index (r16): each
    micro-batch of (vec_id) delete requests lands as tombstones
    (operators/similarity.delete_from_ivfpq_index), hidden from every
    query path on the next query with no index rewrite — the 24/7
    delete half of the lifecycle whose ingest half ivfpq_ingest_sink
    owns.  A takedown/dedup-removal feed runs both sinks against one
    index: appends restore ids with fresh encodings (upsert), the
    scheduled rebuild compacts tombstones physically.

    At-least-once safe BY CONSTRUCTION: delete_from_ivfpq_index writes
    only ids not already tombstoned, so a redelivered batch writes
    nothing — the relation's size tracks DISTINCT deletes, not
    deliveries.  Expects batches with a ``vec_id`` column."""
    from data_integration_system_spark.operators.similarity import (
        delete_from_ivfpq_index,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        delete_from_ivfpq_index(spark, index_path, batch.select("vec_id"))

    return apply


def doc_delete_sink(spark: SparkSession, index_path: str):
    """Streaming takedown for the DOCUMENT indexes (r16) — minhash
    bands and winnowing fingerprints share one tombstone lifecycle
    (operators/tombstones), so one sink serves both: each micro-batch
    of (doc_id) requests lands as tombstones and the doc stops
    surfacing as a match on the next query; re-ingest through the
    ingest sinks un-deletes; the scheduled rebuild compacts.  Same
    at-least-once-by-construction contract as ann_delete_sink.
    Expects batches with a ``doc_id`` column."""
    from data_integration_system_spark.operators.tombstones import (
        append_tombstones,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        append_tombstones(spark, index_path, batch.select("doc_id"), "doc_id")

    return apply


def pq_ingest_sink(spark: SparkSession, index_path: str):
    """Online PQ index growth — ann_ingest_sink's compressed-tier twin
    (VERDICT r11 #3): each micro-batch of (vec_id, embedding) rows is
    encoded against the stored FROZEN codebooks and its m-byte code
    rows appended (operators/similarity.append_pq_index); scheduled
    full rebuilds refit the codebooks as the distribution drifts.

    At-least-once safe: a redelivered batch appends duplicate code rows
    with IDENTICAL codes (encode is deterministic), and pq_shortlist
    dedups by vec_id before its cuts, so replays never change a query's
    top-k (pinned in test_scale_patterns alongside append_pq_index)."""
    from data_integration_system_spark.operators.similarity import append_pq_index

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        append_pq_index(spark, index_path, batch.localCheckpoint())

    return apply


def ivfpq_ingest_sink(spark: SparkSession, index_path: str):
    """Online growth for the COMPOSED IVF-PQ index: each micro-batch is
    assigned to the FROZEN centroids, encoded against the FROZEN
    codebooks, and its code rows appended into the right cent_id
    partitions (operators/similarity.append_ivfpq_index) — completing
    the online-ingest symmetry across all three index tiers (IVF raw,
    PQ flat codes, IVF-PQ partitioned codes).

    At-least-once safe for the same two reasons as its parents:
    assignment and encode are both deterministic, and pq_shortlist
    dedups by vec_id before its cuts."""
    from data_integration_system_spark.operators.similarity import (
        append_ivfpq_index,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        append_ivfpq_index(spark, index_path, batch.localCheckpoint())

    return apply


def ann_probe_sink(
    spark: SparkSession,
    index_path: str,
    results_path: str,
    top_k: int = 5,
    nprobe: int = 3,
):
    """Online ANN serving: each micro-batch of (q_id, qe) query vectors
    probes the materialized IVF index (operators/similarity.
    build_ivf_index) and appends its top-k neighbors to
    ``results_path``.  The per-batch probe protocol is identical to the
    batch path — centroid ranking on the broadcast centroids table,
    then literal cent_id PartitionFilters on the corpus scan — so each
    trigger reads nprobe/k of the index, never the whole corpus.

    The index is static between rebuilds (IVF centroids must be refit
    as the corpus drifts; that is the batch build's job), which is what
    makes this sink idempotent under at-least-once foreachBatch: a
    redelivered batch recomputes identical rows, and consumers dedup on
    (q_id, rnk) like every idempotent sink here."""
    from data_integration_system_spark.operators.similarity import query_ivf_index

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        res = query_ivf_index(
            spark, index_path, batch.localCheckpoint(), top_k=top_k, nprobe=nprobe
        )
        res.write.mode("append").parquet(results_path)

    return apply


def trending_tokens(
    docs: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token frequencies over a timestamped document
    stream — the live view of token_top_vocab (what is the corpus
    ingesting RIGHT NOW).  Tokens explode inside the stream; the
    windowed count carries map-side partials exactly like the batch
    vocab build, so a Zipf-head token costs one partial per trigger
    partition, not one state row per occurrence.

    Emits finalized (window, token, n) rows in append mode once the
    watermark passes; rank/top-k is the consumer's cheap batch step
    over the tiny finalized slice (ranking inside the stream would need
    complete-mode state over the whole vocabulary)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return (
        docs.withWatermark(ts_col, watermark)
        .select(ts_col, F.explode(toks).alias("token"))
        .groupBy(F.window(ts_col, window, slide).alias("w"), "token")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "token",
            "n",
        )
    )


def incremental_report_sink(
    spark: SparkSession,
    ledger_path: str,
    report_root: str,
    grain_fn,
    report_fn,
):
    """Generic incremental-report pattern: per micro-batch, reduce the
    batch to a REDUCIBLE GRAIN (``grain_fn(batch) -> DataFrame``), land
    it in a ledger, recompute the report from the whole ledger
    (``report_fn(ledger) -> DataFrame``), and commit it as the next
    snapshot of ``report_root`` — readers see an atomically-swapped
    consistent report after every trigger (pipeline/snapshots pointer
    swap) and the raw stream is never rescanned.

    Exactly-once ledger under at-least-once foreachBatch: each batch
    writes its grain to a DETERMINISTIC ``batch_id=N`` directory with
    overwrite, so a redelivered batch replaces its own rows instead of
    double-counting (append-tolerant sinks like near_dup_sink don't need
    this; COUNT ledgers do).  The grain must be re-aggregable —
    ``report_fn`` must treat duplicate grain keys as their sum — which
    also makes compaction trivial: rewrite the ledger as its summed
    grain whenever batch-dirs accumulate.

    Scale: the ledger is grain-sized (≪ stream volume for counting
    grains), and per-trigger report cost is one aggregation over it.
    Report snapshots are pruned to the newest ``keep_reports`` per
    trigger (time-travel is the upsert sink's job, not a monitor's),
    and ``compact_ledger`` folds accumulated batch-dirs back to one
    summed grain when a long-lived stream's trigger count grows.
    Returns a foreachBatch callable."""
    from data_integration_system_spark.pipeline.snapshots import (
        prune_snapshots,
        write_snapshot,
    )

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        grain = grain_fn(batch)
        cols = grain.columns
        grain.write.mode("overwrite").parquet(
            f"{ledger_path}/batch_id={batch_id}"
        )
        ledger = (
            spark.read.option("basePath", ledger_path)
            .parquet(ledger_path)
            .select(*cols)  # drop the batch_id partition-discovery column
        )
        write_snapshot(report_fn(ledger), report_root)
        prune_snapshots(spark, report_root, keep=_REPORT_KEEP)

    return apply


#: report snapshots kept per monitor root (current + one for readers
#: mid-swap); monitors are dashboards, not time-travel stores
_REPORT_KEEP = 2


def compact_ledger(
    spark: SparkSession, ledger_path: str, key_cols: list[str]
) -> None:
    """Fold an incremental_report_sink ledger's accumulated batch-dirs
    into ONE summed-grain dir, preserving report results exactly (the
    grain contract: duplicate keys behave as their sum, so summing them
    eagerly is a no-op for every report_fn).

    The compacted grain lands under a reserved ``batch_id=-1`` dir and
    the per-batch dirs are deleted — a redelivered pre-compaction batch
    would double-count, so run this only at a stream checkpoint
    boundary (stopped stream, or a trigger known committed).  Numeric
    columns other than ``key_cols`` are summed."""
    ledger = spark.read.option("basePath", ledger_path).parquet(ledger_path)
    val_cols = [
        c for c in ledger.columns if c not in key_cols and c != "batch_id"
    ]
    old_ids = [
        r.batch_id
        for r in ledger.select("batch_id").distinct().collect()
        if r.batch_id != -1
    ]
    summed = (
        ledger.select(*key_cols, *val_cols)
        .groupBy(*key_cols)
        .agg(*[F.sum(c).cast("long").alias(c) for c in val_cols])
        .localCheckpoint()  # materialize BEFORE deleting its input dirs
    )
    summed.write.mode("overwrite").parquet(f"{ledger_path}/batch_id=-1")
    from data_integration_system_spark.pipeline.fsutil import delete_tree

    for b in old_ids:
        delete_tree(spark, f"{ledger_path}/batch_id={b}")


def dup_rate_sink(
    spark: SparkSession,
    ledger_path: str,
    report_root: str,
):
    """Incremental per-source duplicate-pressure monitoring: batches of
    ``(source, text)`` documents reduce to ``(ch, source, n_src)`` hash
    counts; the report is the batch `dup_rate_by_source` contract via
    the shared operators/dedup.dup_rate_report rollup.  An
    incremental_report_sink instance — see it for the exactly-once
    ledger and snapshot-swap semantics."""
    from data_integration_system_spark.functions.hashing import content_hash
    from data_integration_system_spark.operators.dedup import dup_rate_report

    def grain(batch: DataFrame) -> DataFrame:
        return (
            batch.select("source", content_hash(F.col("text")).alias("ch"))
            .groupBy("ch", "source")
            .agg(F.count("*").cast("long").alias("n_src"))
        )

    return incremental_report_sink(
        spark, ledger_path, report_root, grain, dup_rate_report
    )


def length_histogram_sink(
    spark: SparkSession,
    ledger_path: str,
    report_root: str,
):
    """Incremental corpus length-profile monitoring: batches of
    documents (any relation with ``n_chars``) reduce to per-bin
    ``(bin, n_docs, sum_chars)`` counts; the report is the batch
    `doc_length_histogram` contract via the shared
    operators/textops.length_histogram_report rollup — the live view of
    whether the ingest mix is drifting toward short/long documents.
    An incremental_report_sink instance."""
    from data_integration_system_spark.operators.textops import (
        length_histogram_grain,
        length_histogram_report,
    )

    return incremental_report_sink(
        spark,
        ledger_path,
        report_root,
        length_histogram_grain,
        length_histogram_report,
    )


def retention_sink(
    spark: SparkSession,
    ledger_path: str,
    report_root: str,
):
    """Incremental cohort-retention monitoring: batches of timestamped
    events reduce to their DISTINCT (user_id, week) activity grain; the
    report is the batch `weekly_retention` contract via the shared
    operators/windows.retention_report rollup (which re-distincts, so
    the same user landing in multiple batches of one week collapses).
    An incremental_report_sink instance — note the ledger here is
    distinct-keyed rather than summed, which the generic pattern admits
    because the report's first step is itself the de-duplicator.

    Schema note: the ``week`` grain column became TIMESTAMP in round 5
    (was DATE — timestamps are the driver-proven time-grain class).  A
    ledger written before that change mixes the two types across
    batch dirs and fails parquet schema merge on the next trigger:
    migrate with ``migrate_ledger_column(spark, ledger_path, "week",
    "timestamp")`` (or start a fresh ledger; the grain is re-derivable
    from the raw stream)."""
    from data_integration_system_spark.operators.windows import (
        retention_grain,
        retention_report,
    )

    return incremental_report_sink(
        spark, ledger_path, report_root, retention_grain, retention_report
    )


def dq_sink(
    spark: SparkSession,
    ledger_path: str,
    report_root: str,
    checks,
):
    """Incremental data-quality monitoring: each batch evaluates the
    declarative constraint list (pipeline/checks.run_checks — N checks,
    one aggregation) into a summable (check_name, n_rows, n_violations)
    grain; the report re-sums the ledger per check and derives an
    integer violation rate — the live "is the ingest getting dirtier"
    dashboard, and the streaming twin of the batch `dq_orders_report`.
    An incremental_report_sink instance — the count grain makes both
    the exactly-once ledger and compact_ledger apply unchanged."""
    from data_integration_system_spark.pipeline.checks import run_checks

    def grain(batch: DataFrame) -> DataFrame:
        return run_checks(batch, checks)

    return incremental_report_sink(
        spark, ledger_path, report_root, grain, dq_report
    )


def dq_report(ledger: DataFrame) -> DataFrame:
    """The rollup from a (possibly multi-batch) check-count grain:
    per-check totals + integer violation rate."""
    return (
        ledger.groupBy("check_name")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("n_violations").cast("long").alias("n_violations"),
        )
        .withColumn(
            "violation_rate_e6",
            F.expr("n_violations * 1000000 div n_rows").cast("long"),
        )
        .orderBy("check_name")
    )


def migrate_ledger_column(
    spark: SparkSession, ledger_path: str, col: str, to_type: str
) -> int:
    """Rewrite every batch dir of an incremental_report_sink ledger with
    ``col`` cast to ``to_type``; returns the number of dirs rewritten.

    The upgrade path for grain-schema type changes (concretely: the
    retention grain's ``week`` DATE→TIMESTAMP move in round 5): a mixed
    ledger fails parquet schema merge on the next trigger, and
    compact_ledger can't run because IT reads the mixed ledger too.
    Per-dir rewrite sidesteps the merge: each batch dir is
    self-consistent, so read→cast→overwrite works dir by dir.  Run at a
    stream checkpoint boundary (stopped stream), like compact_ledger."""
    from data_integration_system_spark.pipeline.fsutil import hadoop_path

    p, fs = hadoop_path(spark, ledger_path)
    if not fs.exists(p):
        return 0
    rewritten = 0
    for status in fs.listStatus(p):
        name = status.getPath().getName()
        if not name.startswith("batch_id="):
            continue
        d = f"{ledger_path}/{name}"
        batch = spark.read.parquet(d)
        if dict(batch.dtypes).get(col) == to_type:
            continue  # already migrated — idempotent
        migrated = batch.withColumn(col, F.col(col).cast(to_type)).localCheckpoint()
        # materialize BEFORE overwriting the dir being read
        migrated.write.mode("overwrite").parquet(d)
        rewritten += 1
    return rewritten


def _ewma_fold(key, pdfs, state):
    """Per-user EWMA state transition (module-level so unit tests can
    drive it batch by batch with a fake GroupState).  State =
    (n_events, s_e2); each batch folds its rows IN (ts, event_id)
    order.  v_e2 = floor(value·100) in double precision — bit-identical
    to the batch op's Spark-side F.floor(value * 100)."""
    import math

    import pandas as pd  # local import: runs on workers

    from data_integration_system_spark.operators._common import halve_trunc

    n, s = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for v in pdf["value"]:
            v_e2 = int(math.floor(float(v) * 100))
            s = v_e2 if n == 0 else halve_trunc(s + v_e2)
            n += 1
    state.update((n, s))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "ewma_e2": [s]}
    )


def ewma_state_stream(events: DataFrame) -> DataFrame:
    """Streaming sibling of user_value_ewma (operators/groupops.py):
    the per-user EWMA recurrence maintained incrementally across
    micro-batches — the stateful-recurrence class where the state IS
    the answer (one (n, s) pair per user, updated in order).

    Ordering contract: the recurrence is order-sensitive, so exactness
    requires per-key in-order delivery ACROSS batches — precisely what
    a Kafka topic keyed by user_id guarantees per partition.  Within a
    batch the fold sorts by (ts, event_id); the unit test pins that two
    ordered batches equal one combined batch, and the bounded-replay
    test pins equality with the batch operator.  The batch form remains
    the Kappa backfill for out-of-order history."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _ewma_fold,
        outputStructType="user_id bigint, n_events bigint, ewma_e2 bigint",
        stateStructType="n bigint, s_e2 bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_jvm_step(batch: DataFrame, prior: DataFrame | None) -> DataFrame:
    """One incremental step of the EWMA recurrence, entirely JVM-side:
    fold ``batch``'s per-user (ts, event_id)-ordered ``v_e2`` values
    into the ``prior`` per-user ``(n_events, ewma_e2)`` state.

    The Catalyst ``aggregate()`` fold's NULL-seed branch ("acc IS NULL
    -> take x verbatim") is exactly the recurrence's s_1 = v_1 base
    case, so SEEDING the fold with the prior user's s gives the
    continuation case for free: a user new to the stream folds from
    NULL, a returning user folds from their carried state — one
    expression, no Python.  Users absent from the batch carry their
    prior row through the full-outer join untouched.

    This is the fold-expressible escape hatch the r12 sf10 split
    motivated (SCALE.md: the applyInPandasWithState drain pays ~96% of
    its wall in the Arrow round-trip + per-key Python loop; this step
    pays one user_id shuffle and a state join, all whole-stage
    codegen + HOF evaluation).  Per-batch collect_list is bounded by
    per-user PER-BATCH event counts — strictly smaller than the batch
    operator's per-user total the applyInPandas contract already
    assumes."""
    from data_integration_system_spark.operators.groupops import (
        EWMA_JVM_FOLD,
        EWMA_JVM_VALUES,
    )

    folded = batch.groupBy("user_id").agg(
        F.count("*").cast("long").alias("b_n"),
        F.expr(EWMA_JVM_VALUES).alias("b_vals"),
    )
    if prior is None:
        return folded.select(
            "user_id",
            F.col("b_n").alias("n_events"),
            F.expr(
                f"aggregate(b_vals, cast(null as bigint), {EWMA_JVM_FOLD})"
            ).alias("ewma_e2"),
        )
    j = folded.join(
        prior.select("user_id", "n_events", "ewma_e2"), "user_id", "full_outer"
    )
    return j.select(
        "user_id",
        (
            F.coalesce("n_events", F.lit(0)) + F.coalesce("b_n", F.lit(0))
        ).alias("n_events"),
        F.when(F.col("b_vals").isNull(), F.col("ewma_e2"))
        .otherwise(F.expr(f"aggregate(b_vals, ewma_e2, {EWMA_JVM_FOLD})"))
        .alias("ewma_e2"),
    )


def ewma_jvm_sink(spark: SparkSession, state_root: str):
    """foreachBatch sink maintaining the per-user EWMA state as a
    batch_id-versioned parquet supersede chain: batch N reads the state
    at the largest batch_id < N, folds itself in via ewma_jvm_step, and
    overwrites ``{state_root}/batch_id=N`` — so a redelivered batch
    recomputes from the SAME prior and replaces its own output
    (deterministic, the exactly-once discipline incremental_report_sink
    established for COUNT ledgers, applied to a supersede state).  The
    newest batch_id IS the current state; `read_ewma_jvm_state` resolves
    it.  State size is one row per user — bounded by key cardinality,
    never stream length — and old versions are pruned to the prior one
    (retry needs N-1 intact while N rewrites).

    Contrast with ewma_state_stream: same recurrence, same ordering
    contract (per-key in-order delivery across batches), but state
    lives in the lake instead of the HDFS state store and the fold
    never leaves the JVM.  Reference anchor: workers/worker_daemon.py
    poll loop + db/postgres_store.py:126-184 upsert cadence."""
    from data_integration_system_spark.operators.groupops import ewma_v_e2_col
    from data_integration_system_spark.pipeline.fsutil import (
        child_names,
        delete_tree,
    )

    def _state_ids() -> list[int]:
        out = []
        for name in child_names(spark, state_root):
            if name.startswith("batch_id="):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        rows = batch.select(
            "user_id",
            "ts",
            "event_id",
            ewma_v_e2_col(),
        )
        prior_ids = [b for b in _state_ids() if b < batch_id]
        prior = (
            spark.read.parquet(f"{state_root}/batch_id={prior_ids[-1]}")
            if prior_ids
            else None
        )
        new = ewma_jvm_step(rows, prior)
        # materialize before overwriting a dir the plan may be reading
        # (a retry of batch N reads nothing from its own dir, but the
        # checkpoint barrier doesn't guarantee that for exotic retries)
        new.localCheckpoint().write.mode("overwrite").parquet(
            f"{state_root}/batch_id={batch_id}"
        )
        for b in prior_ids[:-1]:  # keep the direct prior for retry of N
            delete_tree(spark, f"{state_root}/batch_id={b}")

    return apply


def read_ewma_jvm_state(
    spark: SparkSession, state_root: str, checkpoint_dir: str | None = None
) -> DataFrame:
    """Current state = the newest batch_id version (the supersede
    grain's resolution rule).

    Pass ``checkpoint_dir`` (the stream's checkpointLocation) to read
    COMMITTED state: ewma_jvm_sink writes state N before the streaming
    checkpoint commits batch N, so between that write and the commit —
    a window that persists from a crash there until the retry — the
    newest directory is ahead of the committed stream position.  With
    the checkpoint, the reader resolves the largest state id <= the
    last batch id in ``{checkpoint_dir}/commits`` (the retry rewrites
    state N deterministically from prior N-1, so a committed-id read is
    stable across the crash).  Without it, the newest-directory read is
    read-uncommitted: self-healing on retry, but a reader in the crash
    window observes a state version the stream has not committed."""
    from data_integration_system_spark.pipeline.fsutil import child_names

    ids = sorted(
        int(n.split("=", 1)[1])
        for n in child_names(spark, state_root)
        if n.startswith("batch_id=")
    )
    if not ids:
        raise FileNotFoundError(f"no state versions under {state_root}")
    if checkpoint_dir is not None:
        committed = [
            int(n)
            for n in child_names(spark, f"{checkpoint_dir}/commits")
            if n.isdigit()
        ]
        ids = [b for b in ids if committed and b <= max(committed)]
        if not ids:
            raise FileNotFoundError(
                f"no state version under {state_root} is committed by "
                f"{checkpoint_dir}/commits"
            )
    return spark.read.parquet(f"{state_root}/batch_id={ids[-1]}")


# --- driver-facing streaming query ---------------------------------------
#
# The streaming tier above is pinned to batch parity in pytest, but until
# round 8 no registered query actually EXECUTED a foreachBatch path under
# the external driver's oracle gate (VERDICT r7 #4).  The query below runs
# the incremental dup-rate monitor end-to-end — file stream, 3 micro-
# batches, exactly-once grain ledger, snapshot-swap report — and returns
# the final snapshot, which the Kappa contract pins equal to the batch
# dup_rate_by_source, so the exact SQL oracle carries over.

from data_integration_system_spark.registry import query as _query



def _drain_deadline_s() -> int:
    """availableNow replay guard for the snapshot queries: 600 s covers
    every driver-scale replay with an order of magnitude to spare; the
    scale campaigns override via SPARK_GRAFT_STREAM_DRAIN_S (the sf10
    EWMA replay legitimately exceeds 600 s — r11's second streaming
    decade hit the guard, not a hang)."""
    import os as _os

    return int(_os.environ.get("SPARK_GRAFT_STREAM_DRAIN_S", "600"))

def _pin_batch_mtimes(src: str, b: int) -> None:
    """Stamp batch ``b``'s parquet files to mtime ``b * 1e6`` so the
    file source's oldest-first pacing is deterministic even when
    sequential writes share a clock tick.  Fresh files carry real epoch
    mtimes (~1.7e9 s), far above the 1e6..3e6 pin range, so only
    not-yet-pinned files (> 4e6) are stamped — earlier batches' pins
    are never re-stamped (ADVICE r9: the original ``< b * 1e6`` guard
    was inverted — dead code on fresh files, and destructive had it
    ever fired)."""
    import os as _os

    for f in _os.listdir(src):
        p = _os.path.join(src, f)
        if f.endswith(".parquet") and _os.stat(p).st_mtime > 4e6:
            _os.utime(p, (b * 1e6, b * 1e6))


@_query(
    "streaming_dup_rate_snapshot",
    oracle=r"""
    WITH h AS (
      SELECT source,
             sha256(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS ch
      FROM documents
    ), c AS (
      SELECT ch, count(*) AS n FROM h GROUP BY ch
    )
    SELECT h.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) * 10000 // count(*)
                AS BIGINT) AS dup_rate_e4
    FROM h JOIN c USING (ch)
    GROUP BY h.source ORDER BY h.source
    """,
)
def streaming_dup_rate_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental dup-rate monitor, exercised END-TO-END as a real
    Structured Streaming job: the documents corpus replays through a
    file source in three deterministic micro-batches (maxFilesPerTrigger
    =1, availableNow), each trigger lands its (ch, source, n_src) grain
    in the exactly-once ledger and snapshot-swaps the report, and the
    FINAL snapshot is returned.  Because the report re-aggregates the
    whole ledger every trigger, batch boundaries cannot change the
    final answer — the Kappa parity that makes the batch
    dup_rate_by_source SQL the exact oracle for a streaming execution.

    Scale shape: identical to the batch twin past the source — the
    stream reduces each micro-batch to the (ch, source) grain map-side,
    the ledger stays grain-sized (≪ stream volume), and per-trigger
    report cost is one aggregation over the ledger, independent of
    total stream history length (compact_ledger folds batch-dirs when
    trigger counts grow).  Reference anchor: workers/worker_daemon.py
    poll loop + db/postgres_store.py:126-184 upsert cadence, re-expressed
    as foreachBatch over an event stream."""
    import shutil
    import tempfile

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.pipeline.snapshots import read_current

    root = tempfile.mkdtemp(prefix="stream_duprate_")
    try:
        docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
        src = f"{root}/in"
        # three deterministic single-file batches (append keeps one dir)
        _stage_batches(
            docs.withColumn("__b", (F.col("doc_id") % 3).cast("int")), src
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select("source", "text")
        )
        sink = dup_rate_sink(spark, f"{root}/ledger", f"{root}/report")
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        try:
            if not q.awaitTermination(_drain_deadline_s()):
                raise TimeoutError(
                    "availableNow replay did not drain within the deadline; "
                    "refusing to return a partial snapshot"
                )
        finally:
            q.stop()
        # materialize before the tempdir vanishes; order AFTER the barrier
        out = read_current(spark, f"{root}/report").localCheckpoint()
        return out.orderBy("source")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_query(
    "streaming_user_ewma_snapshot",
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id, CAST(FLOOR(value * 100) AS BIGINT) AS v_e2,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), walk AS (
      SELECT user_id, rn, v_e2 AS s_e2 FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, (w.s_e2 + s.v_e2) // 2
      FROM walk w JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1
    )
    SELECT user_id, CAST(max(rn) AS BIGINT) AS n_events,
           max_by(s_e2, rn) AS ewma_e2
    FROM walk GROUP BY user_id ORDER BY user_id
    """,
)
def streaming_user_ewma_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stateful per-user EWMA recurrence executed END-TO-END under
    applyInPandasWithState — the second REAL streaming path under the
    driver's exact oracle, and the first exercising Spark's stateful
    machinery (r8's streaming_dup_rate_snapshot covered foreachBatch
    over an order-insensitive grain; this one carries per-key state
    across micro-batches for an ORDER-SENSITIVE recurrence).

    Replay contract: the recurrence needs per-key in-order delivery
    across batches (the Kafka-partition guarantee), so the fixture
    trisects events by GLOBAL (ts, event_id) order — every user's
    batch-b rows precede their batch-b+1 rows — and forces strictly
    increasing file mtimes so the file source's oldest-first pacing is
    deterministic.  Each micro-batch's update-mode output lands in a
    batch_id-keyed ledger dir (overwrite per dir = idempotent under
    retry); the final per-user row is the one with the largest
    n_events, which the state monotonically grows.  The batch
    user_value_ewma RECURSIVE-CTE SQL is therefore the exact oracle.

    Scale shape: state is one (n, s_e2) pair per user — bounded by key
    cardinality, not stream length; each trigger shuffles only that
    batch's events once on user_id (the same single-shuffle shape as
    the batch operator).  Reference anchor: workers/worker_daemon.py
    poll loop as the streaming host, db/schema.sql:56-61 job-state
    lifecycle as the per-key-state precedent."""
    import os as _os
    import shutil
    import tempfile

    from pyspark.sql import Window

    from data_integration_system_spark.catalog import table

    root = tempfile.mkdtemp(prefix="stream_ewma_")
    try:
        ev = table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "value"
        )
        tercile = F.ntile(3).over(Window.orderBy("ts", "event_id"))
        staged = ev.withColumn("b", tercile).localCheckpoint()
        src = f"{root}/in"
        _stage_batches(
            staged.withColumn("__b", (F.col("b") - 1).cast("int")).drop("b"),
            src,
        )
        stream = (
            spark.readStream.schema(staged.drop("b").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        ledger = f"{root}/ledger"

        def land(batch: DataFrame, batch_id: int) -> None:
            # repartition(1), NOT coalesce(1): the batch's plan still
            # contains the stateful operator, and coalesce would narrow
            # that stage to ONE task that walks all N state partitions
            # serially (each paying its own state-store open + Python
            # runner setup) — measured 47.2 s -> 5.4 s drain on the
            # sf0.1 EWMA replay (r17).  The shuffle moves only the
            # batch's tiny update rows.
            batch.repartition(1).write.mode("overwrite").parquet(
                f"{ledger}/batch_id={batch_id}"
            )

        q = (
            ewma_state_stream(stream)
            .writeStream.foreachBatch(land)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        try:
            if not q.awaitTermination(_drain_deadline_s()):
                raise TimeoutError(
                    "availableNow replay did not drain within the deadline; "
                    "refusing to return a partial snapshot"
                )
        finally:
            q.stop()
        out = (
            spark.read.option("basePath", ledger).parquet(ledger)
            .groupBy("user_id")
            .agg(
                F.max("n_events").alias("n_events"),
                F.max_by("ewma_e2", "n_events").alias("ewma_e2"),
            )
            .localCheckpoint()  # materialize before the tempdir vanishes
        )
        return out.orderBy("user_id")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_query(
    "streaming_user_ewma_jvm_snapshot",
    oracle="""
    WITH RECURSIVE seq AS (
      SELECT user_id, CAST(FLOOR(value * 100) AS BIGINT) AS v_e2,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), walk AS (
      SELECT user_id, rn, v_e2 AS s_e2 FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, (w.s_e2 + s.v_e2) // 2
      FROM walk w JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1
    )
    SELECT user_id, CAST(max(rn) AS BIGINT) AS n_events,
           max_by(s_e2, rn) AS ewma_e2
    FROM walk GROUP BY user_id ORDER BY user_id
    """,
)
def streaming_user_ewma_jvm_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The per-user EWMA recurrence streamed END-TO-END with the fold
    kept JVM-side (ewma_jvm_sink): the r12 counterpart to
    streaming_user_ewma_snapshot, which runs the SAME recurrence
    through applyInPandasWithState.  The two queries share the
    RECURSIVE-CTE oracle, so the driver gate pins that swapping the
    stateful machinery (HDFS state store + Arrow round-trip + Python
    fold → lake-resident supersede state + Catalyst HOF fold) does not
    move a single bit of the answer — the property that lets a
    production pipeline migrate a recurrence off the slow path once it
    proves fold-expressible (SCALE.md r12 EWMA split: the Python-side
    machinery was 96% of the sf10 drain).

    Replay contract identical to the pandas-state twin: global
    (ts, event_id) tercile staging (every user's batch-b rows precede
    their batch-b+1 rows), pinned mtimes for deterministic oldest-first
    pacing, availableNow drain with a deadline.  The answer is the
    newest state version — no ledger fold needed, the supersede state
    IS the snapshot.

    Scale shape: per trigger one user_id shuffle of the batch + a
    state full-outer join (state = one row per user, bounded by key
    cardinality; broadcastable while small, sort-merge when not);
    everything whole-stage codegen.  Reference anchor:
    workers/worker_daemon.py:24-28 poll loop as the streaming host."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from data_integration_system_spark.catalog import table

    root = tempfile.mkdtemp(prefix="stream_ewma_jvm_")
    try:
        ev = table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "value"
        )
        tercile = F.ntile(3).over(Window.orderBy("ts", "event_id"))
        staged = ev.withColumn("b", tercile).localCheckpoint()
        src = f"{root}/in"
        _stage_batches(
            staged.withColumn("__b", (F.col("b") - 1).cast("int")).drop("b"),
            src,
        )
        stream = (
            spark.readStream.schema(staged.drop("b").schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        state_root = f"{root}/state"
        q = (
            stream.writeStream.foreachBatch(ewma_jvm_sink(spark, state_root))
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        try:
            if not q.awaitTermination(_drain_deadline_s()):
                raise TimeoutError(
                    "availableNow replay did not drain within the deadline; "
                    "refusing to return a partial snapshot"
                )
        finally:
            q.stop()
        out = read_ewma_jvm_state(
            spark, state_root, checkpoint_dir=f"{root}/ckpt"
        ).localCheckpoint()
        return out.orderBy("user_id")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_query(
    "streaming_quality_monitor_snapshot",
    oracle="""
    WITH s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_null,
             CAST(SUM(CASE WHEN o_totalprice BETWEEN 0 AND 1000000
                           THEN 0 ELSE 1 END) AS BIGINT) AS v_range,
             CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                           THEN 0 ELSE 1 END) AS BIGINT) AS v_set,
             CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                           THEN 0 ELSE 1 END) AS BIGINT) AS v_regex
      FROM orders
    ), l AS (
      SELECT 'not_null_o_custkey' AS check_name, n_rows,
             v_null AS n_violations FROM s
      UNION ALL SELECT 'range_o_totalprice', n_rows, v_range FROM s
      UNION ALL SELECT 'set_o_orderstatus', n_rows, v_set FROM s
      UNION ALL SELECT 'regex_o_orderpriority', n_rows, v_regex FROM s
    )
    SELECT check_name, n_rows, n_violations,
           CAST(n_violations * 1000000 // n_rows AS BIGINT)
             AS violation_rate_e6
    FROM l ORDER BY check_name
    """,
)
def streaming_quality_monitor_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental data-quality monitor, exercised END-TO-END as a
    real Structured Streaming job — the third streaming surface under
    the driver's exact-oracle gate (VERDICT r9 #4; r8 covered
    foreachBatch over an order-insensitive grain, r9 the stateful
    recurrence; this one gates INGEST QUALITY, the check family every
    production stream runs first).  The orders table replays through a
    file source in three deterministic micro-batches; each trigger
    evaluates the declarative constraint list in ONE aggregation
    (pipeline/checks.run_checks), lands the summable (check_name,
    n_rows, n_violations) grain in the exactly-once ledger, and
    snapshot-swaps the dq_report rollup.  Because counts sum across
    batches, batch boundaries cannot change the final answer — Kappa
    parity makes the batch dq_orders_report one-pass SQL (plus the
    integer violation rate) the exact oracle for a streaming execution.

    Scale shape: per trigger, one scan of the batch + a single-row
    aggregate (N checks = N conditional sums in one pass); the ledger
    stays check-count-sized (4 rows per batch) regardless of stream
    volume, and the per-trigger report cost is an aggregation over that
    tiny ledger.  Reference anchor: db/postgres_store.py per-row
    try/except validation + api/main.py pydantic request models,
    re-expressed as a gateable table-level monitor on a stream."""
    import shutil
    import tempfile

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.pipeline.checks import (
        in_range,
        in_set,
        matches,
        not_null,
    )
    from data_integration_system_spark.pipeline.snapshots import read_current

    checks = [
        not_null("o_custkey"),
        in_range("o_totalprice", 0, 1000000),
        in_set("o_orderstatus", ("O", "F", "P")),
        matches("o_orderpriority", "^[1-5]-"),
    ]
    root = tempfile.mkdtemp(prefix="stream_dq_")
    try:
        orders = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus",
            "o_orderpriority",
        )
        src = f"{root}/in"
        # three deterministic single-file batches (append keeps one dir)
        _stage_batches(
            orders.withColumn(
                "__b", (F.col("o_orderkey") % 3).cast("int")
            ).drop("o_orderkey"),
            src,
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        sink = dq_sink(spark, f"{root}/ledger", f"{root}/report", checks)
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        try:
            if not q.awaitTermination(_drain_deadline_s()):
                raise TimeoutError(
                    "availableNow replay did not drain within the deadline; "
                    "refusing to return a partial snapshot"
                )
        finally:
            q.stop()
        # materialize before the tempdir vanishes; order AFTER the barrier
        out = read_current(spark, f"{root}/report").localCheckpoint()
        return out.orderBy("check_name")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_query(
    "streaming_length_profile_snapshot",
    oracle="""
    SELECT CAST(LEAST(n_chars // 50, 12) AS BIGINT) AS bin,
           CAST(min(LEAST(n_chars // 50, 12)) * 50 AS BIGINT) AS bin_lo_chars,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(count(*) * 1000000 // SUM(count(*)) OVER () AS BIGINT)
             AS share_e6
    FROM documents
    GROUP BY bin ORDER BY bin
    """,
)
def streaming_length_profile_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental length-profile monitor, exercised END-TO-END as
    a real Structured Streaming job — the fourth streaming surface
    under the driver's exact-oracle gate (the live "is the ingest mix
    drifting toward short/long documents" dashboard).  The documents
    corpus replays through a file source in three deterministic
    micro-batches; each trigger reduces its batch to the summable
    (bin, n_docs, sum_chars) grain map-side, lands it in the
    exactly-once ledger, and snapshot-swaps the length_histogram_report
    rollup.  Counts and char-sums add across batches, so batch
    boundaries cannot change the final answer — Kappa parity makes the
    batch doc_length_histogram SQL the exact oracle for a streaming
    execution.

    Scale shape: per trigger one scan of the batch into a <=13-row
    grain (bin computed in-scan: integer div + least, no UDF); the
    ledger stays bins x batches tiny regardless of stream volume.
    Reference anchor: workers/worker_daemon.py poll cadence, as a
    corpus-profile monitor."""
    import shutil
    import tempfile

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.pipeline.snapshots import read_current

    root = tempfile.mkdtemp(prefix="stream_lenprof_")
    try:
        docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
        src = f"{root}/in"
        # three deterministic single-file batches (append keeps one dir)
        _stage_batches(
            docs.withColumn("__b", (F.col("doc_id") % 3).cast("int")), src
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select("n_chars")
        )
        sink = length_histogram_sink(spark, f"{root}/ledger", f"{root}/report")
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        try:
            if not q.awaitTermination(_drain_deadline_s()):
                raise TimeoutError(
                    "availableNow replay did not drain within the deadline; "
                    "refusing to return a partial snapshot"
                )
        finally:
            q.stop()
        # materialize before the tempdir vanishes; order AFTER the barrier
        out = read_current(spark, f"{root}/report").localCheckpoint()
        return out.orderBy("bin")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_query(
    "streaming_retention_snapshot",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events
    )
    SELECT a.week,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                * 10000 // count(*) AS BIGINT) AS retention_e4
    FROM uw a
    LEFT JOIN uw b
      ON b.user_id = a.user_id AND b.week = a.week + INTERVAL 7 DAY
    GROUP BY a.week
    ORDER BY a.week
    """,
)
def streaming_retention_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental cohort-retention monitor, exercised END-TO-END
    as a real Structured Streaming job — the fifth streaming surface
    under the driver's exact-oracle gate, and the one that completes
    the grain taxonomy: dup-rate/DQ/length-profile ledgers are SUMMED,
    the EWMA is ordered per-key state, and this ledger is
    DISTINCT-KEYED — duplicate (user, week) rows across batches (the
    same user active in several micro-batches of one week) must
    COLLAPSE, not add, which holds because retention_report's first
    step re-distincts the ledger (the generic sink pattern admits
    idempotent-on-duplicates grains exactly for this).  Kappa parity
    therefore makes the batch weekly_retention SQL the exact oracle.

    Scale shape: per trigger the batch reduces map-side to its DISTINCT
    (user, week) rows; the ledger is |users x weeks|-bounded regardless
    of event volume; the report's self-join runs co-keyed on user_id
    over that reduced relation.  Reference anchor:
    workers/worker_daemon.py poll cadence as a cohort monitor."""
    import shutil
    import tempfile

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.pipeline.snapshots import read_current

    root = tempfile.mkdtemp(prefix="stream_reten_")
    try:
        ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
        src = f"{root}/in"
        # three deterministic single-file batches (append keeps one dir)
        _stage_batches(
            ev.withColumn("__b", (F.col("event_id") % 3).cast("int")).drop(
                "event_id"
            ),
            src,
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        sink = retention_sink(spark, f"{root}/ledger", f"{root}/report")
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        try:
            if not q.awaitTermination(_drain_deadline_s()):
                raise TimeoutError(
                    "availableNow replay did not drain within the deadline; "
                    "refusing to return a partial snapshot"
                )
        finally:
            q.stop()
        # materialize before the tempdir vanishes; order AFTER the barrier
        out = read_current(spark, f"{root}/report").localCheckpoint()
        return out.orderBy("week")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_query(
    "streaming_tumbling_counts_snapshot",
    oracle="""
    SELECT epoch_ms(CAST(floor(epoch(ts) / 600) AS BIGINT) * 600000) AS bucket_start,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
)
def streaming_tumbling_counts_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked event-time aggregation run END-TO-END — the sixth
    streaming surface under the driver's exact-oracle gate, and the
    first exercising Spark's BUILT-IN stateful machinery (the state
    store behind groupBy(window), watermark-driven eviction) rather
    than a foreachBatch grain ledger or applyInPandasWithState.

    Replay: events in three GLOBAL ts-order micro-batches (the EWMA
    fixture's tercile trisection + mtime pins), so no row is ever late
    — the 10-minute watermark evicts only windows that can receive no
    more data.  Update-mode emissions land per trigger in a
    batch_id-keyed ledger; because per-window updates are CUMULATIVE
    (the state carries the running count/decimal sum), each window's
    row with the LARGEST batch_id is its final total — including
    windows straddling a batch boundary, whose partial batch-b row is
    superseded by batch b+1.  The batch tumbling_window_counts SQL is
    therefore the exact oracle.

    Scale shape: per trigger one shuffle of that batch's rows onto
    window keys with map-side partials; state is one (count, sum) pair
    per OPEN window — the watermark bounds it by the event-time spread,
    not stream length.  Reference anchor: worker_daemon.py:24-28 poll
    cadence as an event-time rollup."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.operators._common import dec

    root = tempfile.mkdtemp(prefix="stream_tumble_")
    try:
        ev = table(spark, sf_dir, "events").select("event_id", "ts", "value")
        tercile = F.ntile(3).over(Window.orderBy("ts", "event_id"))
        staged = ev.withColumn("b", tercile).localCheckpoint()
        src = f"{root}/in"
        _stage_batches(
            staged.withColumn("__b", (F.col("b") - 1).cast("int")).drop(
                "b", "event_id"
            ),
            src,
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        windowed = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum(dec("value")), 2).cast("double").alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("bucket_start"), "n_events", "sum_value"
            )
        )
        ledger = f"{root}/ledger"

        def land(batch: DataFrame, batch_id: int) -> None:
            # repartition(1), NOT coalesce(1): the batch's plan still
            # contains the stateful operator, and coalesce would narrow
            # that stage to ONE task that walks all N state partitions
            # serially (each paying its own state-store open + Python
            # runner setup) — measured 47.2 s -> 5.4 s drain on the
            # sf0.1 EWMA replay (r17).  The shuffle moves only the
            # batch's tiny update rows.
            batch.repartition(1).write.mode("overwrite").parquet(
                f"{ledger}/batch_id={batch_id}"
            )

        q = (
            windowed.writeStream.foreachBatch(land)
            .outputMode("update")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        try:
            if not q.awaitTermination(_drain_deadline_s()):
                raise TimeoutError(
                    "availableNow replay did not drain within the deadline; "
                    "refusing to return a partial snapshot"
                )
        finally:
            q.stop()
        out = (
            spark.read.option("basePath", ledger).parquet(ledger)
            .groupBy("bucket_start")
            .agg(
                F.max_by(F.struct("n_events", "sum_value"), "batch_id").alias("s")
            )
            .select(
                "bucket_start",
                F.col("s.n_events").alias("n_events"),
                F.col("s.sum_value").alias("sum_value"),
            )
            .localCheckpoint()  # materialize before the tempdir vanishes
        )
        return out.orderBy("bucket_start")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_query(
    "streaming_session_windows_snapshot",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), sessioned AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessioned GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def streaming_session_windows_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGING session-window aggregation run END-TO-END — the seventh
    streaming surface under the driver's exact-oracle gate, and the
    stateful machinery the tumbling snapshot can't exercise: session
    state MERGES as data arrives (an event inside the gap of two open
    sessions fuses them into one window whose identity — its start —
    shifts), which is why the batch_id-supersede assembly used for
    tumbling windows would be WRONG here (a superseded partial session
    is not keyed by the merged session's start).  COMPLETE output mode
    sidesteps identity drift: every trigger re-emits ALL sessions, so
    the final trigger's emission IS the full answer — the ledger keeps
    one dir per trigger and the snapshot reads only the largest
    batch_id.  The batch session_windows lag+cumsum SQL is the exact
    oracle (same >= gap convention, session_end = last event + gap).

    Scale shape: complete mode retains all session state (no watermark
    eviction) — correct for a bounded replay and priced honestly: a
    production deployment of this monitor would use the watermarked
    append form (streaming.jobs.sessionized) and accept closed-sessions
    -only output.  Per trigger one shuffle of the batch onto user_id
    with session merge in the state store.  Reference anchor:
    db/postgres_store.py:58-68 stale-job timeout as session semantics."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from data_integration_system_spark.catalog import table

    root = tempfile.mkdtemp(prefix="stream_sess_")
    try:
        ev = table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
        tercile = F.ntile(3).over(Window.orderBy("ts", "event_id"))
        staged = ev.withColumn("b", tercile).localCheckpoint()
        src = f"{root}/in"
        _stage_batches(
            staged.withColumn("__b", (F.col("b") - 1).cast("int")).drop(
                "b", "event_id"
            ),
            src,
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        sess = (
            stream.groupBy(
                "user_id", F.session_window("ts", "30 minutes").alias("w")
            )
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )
        ledger = f"{root}/ledger"

        def land(batch: DataFrame, batch_id: int) -> None:
            # repartition(1), NOT coalesce(1): the batch's plan still
            # contains the stateful operator, and coalesce would narrow
            # that stage to ONE task that walks all N state partitions
            # serially (each paying its own state-store open + Python
            # runner setup) — measured 47.2 s -> 5.4 s drain on the
            # sf0.1 EWMA replay (r17).  The shuffle moves only the
            # batch's tiny update rows.
            batch.repartition(1).write.mode("overwrite").parquet(
                f"{ledger}/batch_id={batch_id}"
            )

        q = (
            sess.writeStream.foreachBatch(land)
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        try:
            if not q.awaitTermination(_drain_deadline_s()):
                raise TimeoutError(
                    "availableNow replay did not drain within the deadline; "
                    "refusing to return a partial snapshot"
                )
        finally:
            q.stop()
        led = spark.read.option("basePath", ledger).parquet(ledger)
        last = led.agg(F.max("batch_id")).head()[0]
        out = (
            led.filter(F.col("batch_id") == last)
            .drop("batch_id")
            .localCheckpoint()  # materialize before the tempdir vanishes
        )
        return out.orderBy("user_id", "session_start")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_query(
    "streaming_funnel_pairs_snapshot",
    oracle="""
    SELECT a.user_id,
           a.ts AS signup_ts,
           b.ts AS purchase_ts,
           epoch_us(b.ts) - epoch_us(a.ts) AS lag_us
    FROM events a JOIN events b
      ON b.user_id = a.user_id
     AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
    WHERE a.event_type = 'signup' AND b.event_type = 'purchase'
    ORDER BY a.user_id, signup_ts, purchase_ts
    """,
)
def streaming_funnel_pairs_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join run END-TO-END — the eighth
    streaming surface under the driver's exact-oracle gate and the last
    distinct machinery class: two watermarked streams (signups,
    purchases — both read from the same replayed events source) joined
    on user_id with an event-time range (purchase within 1 hour of the
    signup).  Spark buffers each side in join state, emits an inner
    match EXACTLY ONCE as soon as both rows have arrived — including
    pairs whose rows land in different micro-batches — and the
    watermark + range condition bound state eviction so a buffered
    signup outlives every purchase that could still match it.  The
    append-emitted matches accumulate in a batch_id-keyed ledger whose
    union IS the full pair set, so the plain batch interval-join SQL is
    the exact oracle.

    Watermark choice: the range spans 1 hour, so a 2-hour delay keeps
    both sides' state strictly longer than any matchable gap — the
    documented completeness condition for inner stream-stream joins
    (delay >= join window).  Scale shape: per trigger one user_id
    shuffle per side; state is the watermark-bounded tail of each
    stream, not its history.  Reference anchor: crawler_core.py's
    frontier↔visited interplay as two coordinated stateful streams."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from data_integration_system_spark.catalog import table

    root = tempfile.mkdtemp(prefix="stream_ssjoin_")
    try:
        ev = table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type"
        )
        tercile = F.ntile(3).over(Window.orderBy("ts", "event_id"))
        staged = ev.withColumn("b", tercile).localCheckpoint()
        src = f"{root}/in"
        _stage_batches(
            staged.withColumn("__b", (F.col("b") - 1).cast("int")).drop(
                "b", "event_id"
            ),
            src,
        )
        schema = spark.read.parquet(src).schema

        def side(kind: str, alias: str) -> DataFrame:
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(src)
                .filter(F.col("event_type") == kind)
                .withWatermark("ts", "2 hours")
                .select(
                    F.col("user_id").alias(f"{alias}_user"),
                    F.col("ts").alias(f"{alias}_ts"),
                )
            )

        joined = side("signup", "s").join(
            side("purchase", "p"),
            F.expr(
                "p_user = s_user AND p_ts >= s_ts "
                "AND p_ts < s_ts + INTERVAL 1 HOUR"
            ),
        )
        ledger = f"{root}/ledger"

        def land(batch: DataFrame, batch_id: int) -> None:
            # repartition(1), NOT coalesce(1): the batch's plan still
            # contains the stateful operator, and coalesce would narrow
            # that stage to ONE task that walks all N state partitions
            # serially (each paying its own state-store open + Python
            # runner setup) — measured 47.2 s -> 5.4 s drain on the
            # sf0.1 EWMA replay (r17).  The shuffle moves only the
            # batch's tiny update rows.
            batch.repartition(1).write.mode("overwrite").parquet(
                f"{ledger}/batch_id={batch_id}"
            )

        q = (
            joined.writeStream.foreachBatch(land)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        try:
            if not q.awaitTermination(_drain_deadline_s()):
                raise TimeoutError(
                    "availableNow replay did not drain within the deadline; "
                    "refusing to return a partial snapshot"
                )
        finally:
            q.stop()
        out = (
            spark.read.option("basePath", ledger).parquet(ledger)
            .select(
                F.col("s_user").alias("user_id"),
                F.col("s_ts").alias("signup_ts"),
                F.col("p_ts").alias("purchase_ts"),
                (F.unix_micros("p_ts") - F.unix_micros("s_ts")).alias("lag_us"),
            )
            .localCheckpoint()  # materialize before the tempdir vanishes
        )
        return out.orderBy("user_id", "signup_ts", "purchase_ts")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _stage_batches(df: DataFrame, src: str, n: int = 3) -> None:
    """Land ``df`` (carrying an int ``__b`` column in [0, n)) as ``n``
    single-file micro-batches under ``src`` with pinned increasing
    mtimes — in ONE partitioned write job instead of n filtered
    scan+coalesce(1) writes (the serial form re-scanned the input n
    times; measured ~2-3 s of each snapshot fixture at sf0.1, r17).
    Batch CONTENT is identical — same rows per __b value; only
    within-file row order can differ, and every replay sink is
    order-insensitive within a batch (folds sort, aggregations
    commute).  Local-filesystem fixture helper, like _pin_batch_mtimes."""
    import glob as _glob
    import os as _os
    import shutil as _shutil

    staging = f"{src}__staging"
    df.repartition(n, F.col("__b")).write.partitionBy("__b").parquet(staging)
    _os.makedirs(src, exist_ok=True)
    empty = None  # built lazily; an all-empty df still needs the schema
    for b in range(n):
        parts = _glob.glob(f"{staging}/__b={b}/part-*.parquet")
        if len(parts) > 1:
            raise RuntimeError(
                f"_stage_batches: expected at most 1 file for batch {b}, "
                f"found {parts}"
            )
        dst = f"{src}/batch-{b}.parquet"
        if parts:
            _os.replace(parts[0], dst)
        else:
            # a __b class with zero rows (ADVICE r17): the pre-r17
            # per-batch coalesce(1) append wrote an EMPTY batch file and
            # the replay consumed it — keep that contract by writing an
            # empty single-row-group file with the staged schema instead
            # of failing the fixture
            if empty is None:
                empty = df.sparkSession.createDataFrame(
                    [], df.drop("__b").schema
                )
            empty.coalesce(1).write.mode("overwrite").parquet(f"{staging}/__empty")
            (src_file,) = _glob.glob(f"{staging}/__empty/part-*.parquet")
            _os.replace(src_file, dst)
        _os.utime(dst, ((b + 1) * 1e6, (b + 1) * 1e6))
    _shutil.rmtree(staging, ignore_errors=True)


def _docs_trisected(spark: SparkSession, sf_dir: str, root: str) -> DataFrame:
    """Shared fixture for the document-stream snapshots: the documents
    corpus staged as three deterministic doc_id-keyed micro-batch files
    under ``{root}/in`` with pinned mtimes (oldest-first pacing), and
    the matching readStream returned.  Batch membership is hash-of-id,
    not order — the dedup/overlap sinks are order-insensitive, so the
    split only has to be deterministic, not time-ordered."""
    from data_integration_system_spark.catalog import table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    src = f"{root}/in"
    _stage_batches(
        docs.withColumn("__b", (F.col("doc_id") % 3).cast("int")), src
    )
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _drain(q) -> None:
    """availableNow replay barrier shared by the snapshot queries."""
    try:
        if not q.awaitTermination(_drain_deadline_s()):
            raise TimeoutError(
                "availableNow replay did not drain within the deadline; "
                "refusing to return a partial snapshot"
            )
    finally:
        q.stop()


@_query("streaming_near_dup_snapshot", oracle=None)
def streaming_near_dup_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ONLINE near-dup sink run END-TO-END under the driver gate —
    the streaming surface an LLM data pipeline runs 24/7 (VERDICT r10
    #3): three micro-batches of the documents corpus replay through
    ``near_dup_sink``, each batch APPENDING its band rows to the
    materialized MinHash index then probing it, so every batch surfaces
    its duplicates against the corpus seen so far AND within itself at
    pruned-probe cost.  The final canonical pair set is returned.

    Kappa parity: the union of per-batch pair emissions equals the
    batch ``dedup_minhash_near`` pair set on the full corpus (every
    pair (a, b) is surfaced by whichever of a/b streams LAST, probing
    an index that already holds the other) — pinned exactly in
    test_streaming.test_near_dup_sink_matches_batch.  MinHash is
    approximate by design, so like its batch twin (Q28) this row is
    rows-only for the driver.

    Scale shape: per trigger, append = one bucket-clustered write of
    the batch's band rows; probe = literal-bucket PartitionFilters scan
    of <= 8/n_buckets of the index + exact-Jaccard verify on candidates
    only.  Index grows linearly; no trigger ever rescans the corpus.
    Reference anchor: filesystem_store.py:108-127 visited-set dedup as
    the online-dedup precedent."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="stream_neardup_")
    try:
        stream = _docs_trisected(spark, sf_dir, root)
        sink = near_dup_sink(spark, f"{root}/mh_idx", f"{root}/pairs")
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        _drain(q)
        out = (
            spark.read.parquet(f"{root}/pairs")
            # at-least-once consumers dedup on the pair key (docstring
            # contract of the sink); a clean replay has no dups, but the
            # snapshot honors the consumer protocol
            .dropDuplicates(["doc_a", "doc_b"])
            .localCheckpoint()  # materialize before the tempdir vanishes
        )
        return out.orderBy("doc_a", "doc_b")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_query("streaming_fingerprint_overlap_snapshot", oracle=None)
def streaming_fingerprint_overlap_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ONLINE winnowing-fingerprint overlap sink under the driver
    gate — near_dup_sink's sibling for plagiarism/derivation tracking
    (VERDICT r10 missing #2): three micro-batches append fingerprints
    to the inverted index then probe it; the final canonical
    (doc_a, doc_b, shared_fps) set is returned.

    Kappa parity with batch ``fingerprint_overlap_pairs`` (min_shared=5)
    is pinned in test_streaming.test_fingerprint_overlap_sink_matches_
    batch; winnowing hashes aren't SQL-expressible, so rows-only like
    the batch twin.  shared_fps counts DISTINCT fp_hash per pair, so
    at-least-once redelivery can never inflate a count across the
    threshold (redelivery test alongside).

    Scale shape: per trigger one index append + one stop-hash-pruned
    probe of the posting lists the batch actually touches; boilerplate
    fingerprints are dropped by the periodic rebuild's stop-hash cap."""
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix="stream_fpov_")
    try:
        stream = _docs_trisected(spark, sf_dir, root)
        sink = fingerprint_overlap_sink(
            spark, f"{root}/fp_idx", f"{root}/pairs", min_shared=5
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        _drain(q)
        out = (
            spark.read.parquet(f"{root}/pairs")
            .dropDuplicates(["doc_a", "doc_b"])
            .localCheckpoint()  # materialize before the tempdir vanishes
        )
        return out.orderBy("doc_a", "doc_b")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_query("streaming_ann_ingest_snapshot", oracle=None)
def streaming_ann_ingest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONLINE ANN index growth under the driver gate — the write-side
    streaming surface of the IVF lake (VERDICT r10 missing #2): the
    corpus embeddings stream in three micro-batches through
    ``ann_ingest_sink`` (per-batch nearest-centroid assignment +
    partition-dir appends against FIXED centroids), then the standard
    query set probes the grown index and the top-k lists are returned.

    Kappa parity: an incrementally-grown index answers every query
    identically to the one-shot batch build over the same centroids
    (pinned in test_streaming.test_ann_ingest_sink_grows_index_to_
    match_batch) — centroids are fit ONCE by the shared
    ``fit_ivf_centroids`` and never moved by appends, the invariant
    that keeps earlier vectors reachable through the pruned probe.
    IVF is approximate by design (as is Lloyd's float geometry), so
    rows-only like batch ``similarity_ivf_topk``.

    Scale shape: per trigger one broadcast-centroids assignment of the
    batch + centroid-clustered partition appends (1 file per touched
    partition); the probe reads nprobe/k of the index via literal
    PartitionFilters.  This is the standard 100 TB ANN serving cadence:
    cheap online appends, scheduled offline refits."""
    import shutil
    import tempfile

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.operators.similarity import (
        _N_QUERIES,
        fit_ivf_centroids,
        query_ivf_index,
    )

    root = tempfile.mkdtemp(prefix="stream_annin_")
    try:
        idx = f"{root}/ivf"
        fit_ivf_centroids(spark, sf_dir).write.mode("overwrite").parquet(
            f"{idx}/centroids"
        )
        emb = table(spark, sf_dir, "embeddings")
        corpus = emb.filter(F.col("vec_id") >= _N_QUERIES).select(
            "vec_id", "embedding"
        )
        src = f"{root}/in"
        _stage_batches(
            corpus.withColumn("__b", (F.col("vec_id") % 3).cast("int")), src
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(ann_ingest_sink(spark, idx))
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        _drain(q)
        queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
        )
        out = query_ivf_index(spark, idx, queries).localCheckpoint()
        return out.orderBy("q_id", "rnk")
    finally:
        shutil.rmtree(root, ignore_errors=True)


@_query(
    "streaming_sessionized_eviction_snapshot",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), sessioned AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    ), sess AS (
      SELECT user_id,
             min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             COUNT(*) AS n_events
      FROM sessioned GROUP BY user_id, sid
    ), cut AS (
      SELECT max(ts) - INTERVAL 65 MINUTE AS c FROM events
    )
    SELECT user_id, session_start, session_end, n_events
    FROM sess, cut
    WHERE session_end <= c
    ORDER BY user_id, session_start
    """,
)
def streaming_sessionized_eviction_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION watermarked session config under the exact oracle
    (VERDICT r10 #4): ``sessionized`` — watermark + session_window in
    APPEND mode — where watermark EVICTION actually fires MID-replay.
    The r10 ``streaming_session_windows_snapshot`` deliberately ran
    COMPLETE mode to gate the merging-state machinery; this row gates
    the config a deployment actually runs: sessions are emitted exactly
    once when the advancing watermark passes their end, their state is
    dropped, and nothing is ever retracted.

    Replay: events in three GLOBAL ts-order micro-batches (tercile
    trisection + mtime pins), so no row is late and an evicted session
    can never be extended (every future ts exceeds every finalized
    session's end).  With a 1-hour watermark delay, batch b's watermark
    (max ts through b-1, minus 1h) finalizes most of batch b-1's
    sessions — emissions land in EVERY post-first trigger, which the
    companion test pins (eviction mid-replay, state bounded by open
    sessions, not all sessions).

    Oracle boundary: Spark emits a session when the final watermark
    (max event time - 1h, millisecond-floored internally) passes its
    end; to keep the gate exact regardless of the flooring, BOTH sides
    restrict to sessions ending >= 65 minutes before max(ts) — a 5-min
    safety margin past the watermark that excludes only the gray-zone
    tail, never reorders it.  Within the cutoff the emitted set equals
    the batch lag+cumsum sessions (same >= gap convention,
    session_end = last event + gap).

    Scale shape: per trigger one shuffle of the batch onto user_id with
    session merge in the state store; state holds OPEN sessions only —
    bounded by (keys x watermark horizon), not stream length — which is
    the entire point of the production config.  Reference anchor:
    db/postgres_store.py:58-68 stale-job timeout reaper as watermark
    eviction."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from data_integration_system_spark.catalog import table

    root = tempfile.mkdtemp(prefix="stream_sessev_")
    try:
        ev = table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
        tercile = F.ntile(3).over(Window.orderBy("ts", "event_id"))
        staged = ev.withColumn("b", tercile).localCheckpoint()
        src = f"{root}/in"
        _stage_batches(
            staged.withColumn("__b", (F.col("b") - 1).cast("int")).drop(
                "b", "event_id"
            ),
            src,
        )
        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        sess = sessionized(stream, gap="30 minutes", watermark="1 hour")
        ledger = f"{root}/ledger"

        def land(batch: DataFrame, batch_id: int) -> None:
            # repartition(1), NOT coalesce(1): the batch's plan still
            # contains the stateful operator, and coalesce would narrow
            # that stage to ONE task that walks all N state partitions
            # serially (each paying its own state-store open + Python
            # runner setup) — measured 47.2 s -> 5.4 s drain on the
            # sf0.1 EWMA replay (r17).  The shuffle moves only the
            # batch's tiny update rows.
            batch.repartition(1).write.mode("overwrite").parquet(
                f"{ledger}/batch_id={batch_id}"
            )

        q = (
            sess.writeStream.foreachBatch(land)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{root}/ckpt")
            .start()
        )
        _drain(q)
        cutoff = spark.read.parquet(src).agg(
            (F.max("ts") - F.expr("INTERVAL 65 MINUTES")).alias("c")
        ).head()["c"]
        out = (
            spark.read.option("basePath", ledger).parquet(ledger)
            .filter(F.col("session_end") <= F.lit(cutoff))
            .drop("batch_id")
            .localCheckpoint()  # materialize before the tempdir vanishes
        )
        return out.orderBy("user_id", "session_start")
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _demo_site_fetch():
    """Deterministic in-package site for the jobs-fold snapshot: four
    start pages (p0..p3) each linking one hop deeper.  A closure, so
    cloudpickle ships it by value to executors."""
    site = {
        "https://ex.com/p0": '<a href="/shared">s</a>Start zero',
        "https://ex.com/p1": '<a href="/shared">s</a>Start one',
        "https://ex.com/p2": '<a href="/shared">s</a>Start two',
        "https://ex.com/p3": '<a href="/leaf">l</a>Start three',
        "https://ex.com/shared": "Shared body",
        "https://ex.com/leaf": "Leaf body",
    }

    def fetch(url: str):
        body = site.get(url)
        if body is None:
            return None, ""
        return (
            f"<html><body>{body}</body></html>".encode(),
            "text/html; charset=utf-8",
        )

    return fetch


_JOBS_FOLD_CONFIG = '{"download_files": false, "max_depth_root": 1}'


@_query(
    "streaming_jobs_fold_snapshot",
    oracle=f"""
    WITH subs AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS job_id,
             'https://ex.com/p' || (o_orderkey % 4) AS start_url,
             'ex.com' AS root_domain,
             '{_JOBS_FOLD_CONFIG}' AS config,
             o_orderdate AS created_at
      FROM (SELECT o_orderkey, o_orderdate FROM orders
            ORDER BY o_orderkey LIMIT 8) o
    )
    SELECT job_id, start_url, root_domain, config,
           'DONE' AS status, '' AS error, created_at
    FROM subs
    ORDER BY job_id
    """,
)
def streaming_jobs_fold_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming job-worker DAEMON under the driver gate — the last
    production orchestration surface that was pytest-only (VERDICT r11
    #5): eight deterministic job submissions (derived from the lowest
    orderkeys) are staged onto the jobs log as THREE micro-batch files,
    ``job_worker_stream`` (the reference worker_daemon.py:24-28 poll
    loop as a streaming query) drains them with a drain-and-stop
    trigger — claim-run loop per batch, PENDING→RUNNING→DONE transition
    rows appended back onto the SAME log — and the production
    ``fold_job_log`` aggregation collapses the final log to present
    state.

    Exact oracle: the fold grain is deterministic even though the
    worker's transition timestamps are wall-clock — submission fields
    ride min_by(created_at) (the staged PENDING rows carry o_orderdate,
    decades older than any wall-clock row), terminal status wins by
    lifecycle rank (one terminal row per job), and every job DONEs
    against the deterministic in-package site.  The multi-batch replay
    exercises the no-re-claim contract: batch 1's claim loop drains
    current state ahead of the stream cursor, so batches 2-3 must fold
    their PENDING rows to already-DONE and claim nothing (the log-row
    bound is pytest-pinned alongside).

    Scale shape: per trigger the claim is one fold of the log + a
    LIMIT-ed collect of PENDING rows; each job's crawl/ingest runs as
    its own bounded Spark jobs; status writes are single-row appends.
    State lives in the log, not the stream — the worker restarts from
    any point by re-folding (reference worker_daemon.py:20-58).
    Wall cost is FIXED-COUNT orchestration (8 jobs x ~14 s of BFS
    rounds + snapshot writes each, SF-independent — the fixture is
    LIMIT 8 at every scale); it prices the daemon's per-job overhead,
    not a data-scaling surface."""
    import shutil
    import tempfile

    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.pipeline.jobs import fold_job_log

    root = tempfile.mkdtemp(prefix="stream_jobsfold_")
    try:
        jobs_path = f"{root}/jobs_log"
        o = table(spark, sf_dir, "orders").orderBy("o_orderkey").limit(8)
        subs = o.select(
            F.col("o_orderkey").cast("string").alias("job_id"),
            F.concat(
                F.lit("https://ex.com/p"),
                (F.col("o_orderkey") % 4).cast("string"),
            ).alias("start_url"),
            F.lit("ex.com").alias("root_domain"),
            F.lit(_JOBS_FOLD_CONFIG).alias("config"),
            F.lit("PENDING").alias("status"),
            F.lit("").alias("error"),
            F.col("o_orderdate").alias("created_at"),
        ).localCheckpoint()
        _stage_batches(
            subs.withColumn(
                "__b", F.pmod(F.col("job_id").cast("long"), F.lit(3)).cast("int")
            ),
            jobs_path,
        )
        q = job_worker_stream(
            spark,
            jobs_path,
            f"{root}/out",
            fetch_fn=_demo_site_fetch(),
            trigger={"availableNow": True},
            stream_options={"maxFilesPerTrigger": "1"},
        )
        _drain(q)
        out = fold_job_log(spark.read.parquet(jobs_path)).localCheckpoint()
        return out.orderBy("job_id")
    finally:
        shutil.rmtree(root, ignore_errors=True)
