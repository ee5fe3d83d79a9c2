"""Shared aggregation helpers enforcing the cross-engine determinism
discipline (SURVEY.md §2B 'Hard parts & risks').

Double-precision SUMs are order-dependent, and Spark/DuckDB do not
accumulate in the same order (Spark: partial aggs per partition; DuckDB:
its own morsel order / segment trees for window frames).  To make value
hashes match bit-for-bit we sum in DECIMAL (exact, associative,
order-independent), round, and cast back to DOUBLE.  The same pattern is
used verbatim in the oracle SQL:

    CAST(ROUND(SUM(CAST(x AS DECIMAL(18,4))), 2) AS DOUBLE)

At 100 TB this costs nothing extra: decimal sum is still a single-pass
hash aggregate with map-side partials.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec(col: Column | str, scale: int = 4) -> Column:
    """Cast to the canonical exact-sum operand type."""
    return _c(col).cast(f"decimal(18,{scale})")


def money_sum(col: Column | str) -> Column:
    """Order-independent SUM of a money-like double, rounded to 2dp,
    returned as DOUBLE. Mirror SQL: CAST(ROUND(SUM(CAST(x AS
    DECIMAL(18,4))), 2) AS DOUBLE)."""
    return F.round(F.sum(dec(col)), 2).cast("double")


def mean2(col: Column | str) -> Column:
    """Deterministic 2dp mean: exact decimal sum -> double -> / count.
    Mirror SQL: ROUND(CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
    / COUNT(*), 2)."""
    return F.round(F.sum(dec(col)).cast("double") / F.count("*"), 2)


def drop_hot_keys(df, key_cols: list[str], cap: int):
    """Drop every row whose key-group exceeds ``cap`` rows — the shared
    quadratic-bucket defense (LSH hot buckets, fingerprint stop-hashes).

    One co-keyed aggregation finds the oversized keys; that set is tiny
    by construction, so it broadcasts into a map-side anti-join and the
    input relation is never reshuffled.  Build- and query-side callers
    MUST share this one implementation: the materialized indexes'
    "self-query == inline query" guarantee depends on the prune
    semantics staying identical."""
    hot = (
        df.groupBy(*key_cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > cap)
        .select(*key_cols)
    )
    return df.join(F.broadcast(hot), key_cols, "left_anti")


def cluster_for_partitioned_write(df, part_col: str, n_values: int):
    """Key-cluster ``df`` for a ``partitionBy(part_col)`` write with an
    EXPLICIT task count.  A bare ``repartition(part_col)`` is an AQE
    coalesce target: a small-at-this-SF index relation collapses to ONE
    task that writes every partition dir serially (measured 5.3 s ->
    0.9 s for the 256-bucket fingerprint index at sf0.1); an oversized
    fixed count would instead spray tasks × values sliver files.
    ``min(n_values, shuffle partitions)`` tasks each write whole
    partition values — exactly 1 file per value, in parallel — and at
    cluster scale the explicit count follows the deployment's shuffle
    parallelism (session.shuffle_partition_plan)."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(max(1, min(int(n_values), n)), part_col)


def parallelize_scan(df):
    """CPU-bound small-input guard: if the scan yields fewer partitions
    than the cluster has cores (tiny/unsplittable files — a parquet file
    is splittable only at row-group boundaries), round-robin repartition
    so heavy per-row expression work (shingling, hashing, regex) uses
    every core.  The shuffled payload is the SMALL input itself, paid
    once, before the expensive projection multiplies it.  At corpus
    scale the scan already arrives in many splits and this no-ops."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def halve_trunc(x: int) -> int:
    """x // 2 truncating TOWARD ZERO — SQL integer-division semantics
    (DuckDB `//`, Spark `div`), which Python's floor-dividing `//`
    breaks for negative operands.  Every Python-side replay of an
    integer recurrence (EWMA fold, pandas UDAFs) must use this so the
    recurrence stays engine-exact over the FULL integer domain, not
    just the non-negative values the synthetic data happens to have."""
    return x // 2 if x >= 0 else -((-x) // 2)


def local_rows_df(spark, rows, schema):
    """Small literal row-sets as an Arrow-backed LocalTableScan.

    ``spark.createDataFrame(list_of_tuples, schema)`` always builds a
    pickled-Python-RDD scan (the Arrow fast path only applies to pandas
    input), and a WRITE task whose lineage re-evaluates a Python RDD
    spawns a fresh Python worker per write — measured ~5.4 s for a
    single-row parquet append on this rig vs 0.2 s through a
    LocalTableScan (SCALE.md r13; an ACTION on the same RDD is ~0.4 s —
    the penalty is specific to the write path).  Routing literal rows
    through pandas makes the plan a LocalTableScan: write tasks stay
    JVM-only, and every metadata write (index meta/codebooks, job-log
    status appends, checkpoint state rows) drops to disk-speed.

    Falls back to the classic path for empty row-sets (no job runs on
    an empty frame, so there is nothing to save).

    CONTRACT — small literal row-sets only.  The LocalTableScan
    guarantee rides on the Arrow createDataFrame fast path; with
    ``spark.sql.execution.arrow.pyspark.fallback.enabled`` (default
    true) an Arrow-unconvertible value, or a row-set past the Arrow
    local-relation threshold
    (``spark.sql.execution.arrow.maxRecordsPerBatch`` spill to an RDD
    plan), silently rebuilds the pickled-RDD plan and quietly restores
    the ~28x write tax this helper removes.  The guard below checks the
    produced plan really is a LocalRelation for every call at or under
    _LOCAL_ROWS_ASSERT_BOUND rows (all intended call sites are tiny
    metadata row-sets).  On a miss it emits a LOUD warning and returns
    the fallback frame — many call sites are durability paths
    (streaming checkpoint/status writes) where slow beats outage — and
    raises only under LOCAL_ROWS_STRICT (on in the test suite, so the
    plan shape can't silently regress in CI).

    Thread safety: the session conf is process-global, so the
    set/convert/restore window is serialized under a module lock —
    concurrent callers (multiple streaming queries' foreachBatch writes)
    can no longer interleave a finally-restore into another thread's
    conversion (the r14 ADVICE race)."""
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    names = spark.createDataFrame([], schema).columns
    pdf = pd.DataFrame([tuple(r) for r in rows], columns=names)
    # the Arrow fast path is what produces a LocalRelation, and
    # spark.sql.execution.arrow.pyspark.enabled defaults to FALSE — on a
    # plain session (the external driver's, notably) createDataFrame
    # (pandas) would quietly take the pickled-RDD path and restore the
    # write tax.  Enable it around the conversion (runtime-settable,
    # restored after) so the plan shape is session-independent.
    key = "spark.sql.execution.arrow.pyspark.enabled"
    with _SESSION_CONF_LOCK:
        prev = spark.conf.get(key)
        try:
            spark.conf.set(key, "true")
            df = spark.createDataFrame(pdf, schema)
        finally:
            spark.conf.set(key, prev)
    if len(rows) <= _LOCAL_ROWS_ASSERT_BOUND:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        if "LocalRelation" not in plan.split("\n", 1)[0]:
            msg = (
                "local_rows_df: Arrow fast path fell back to a pickled-RDD "
                "plan (write tasks would spawn Python workers; ~28x write "
                f"tax — see SCALE.md r13). Optimized plan head: "
                f"{plan.splitlines()[0]!r}. An Arrow-unconvertible value in "
                "the rows is the usual cause."
            )
            if LOCAL_ROWS_STRICT:
                raise AssertionError(msg)
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return df


#: local_rows_df plan-shape assertion bound: every intended call site is a
#: handful of metadata rows; 4096 comfortably covers them while keeping the
#: check off any hypothetical bulk path.
_LOCAL_ROWS_ASSERT_BOUND = 4096

#: Escalate the local_rows_df plan-shape check from loud-warning to hard
#: failure.  Default off: metadata writes are durability paths and must
#: degrade to slow, not crash, when a deployment's Arrow config
#: legitimately falls back (lowered maxRecordsPerBatch, unconvertible
#: value).  The test suite flips it on (tests/conftest.py) so a plan-shape
#: regression still fails CI loudly.
LOCAL_ROWS_STRICT = False

#: Serializes session-conf set/restore windows (local_rows_df's Arrow
#: toggle).  The conf is process-global; without the lock, two concurrent
#: callers interleave so one thread's restore lands mid-conversion of the
#: other (r14 ADVICE).
_SESSION_CONF_LOCK = threading.Lock()
