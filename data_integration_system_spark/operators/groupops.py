"""Custom per-group operators via applyInPandas (the UDAF/UDTF surface).

The reference's only extensibility point is a dispatch table of Python
callables (file_ingestion.py:17-65; SURVEY §2A 'UDF surface').  Spark's
analog for *grouped* custom logic is `groupBy().applyInPandas` — each
group arrives as one Arrow-backed pandas DataFrame.  This module
demonstrates it with semantics the DuckDB oracle can replay exactly.

Scale: one shuffle on the group key; each group must fit one executor's
memory (the documented applyInPandas contract) — for heavy-tailed
groups, pre-aggregate or split by a salt first.  Prefer built-in
aggregates whenever they exist; this surface is for logic they can't
express (per-group model fits, custom sketches, ordered scans).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_integration_system_spark.catalog import table
from data_integration_system_spark.registry import query

_QS = (0.25, 0.5, 0.75)

_OUT_SCHEMA = (
    "o_orderpriority string, n_orders bigint, "
    + ", ".join(f"q{int(q * 100)} double" for q in _QS)
)


def _disc_quantiles(pdf: pd.DataFrame) -> pd.DataFrame:
    """Discrete (type-1) quantiles: the element of rank ceil(q·n) in the
    (value, key)-sorted group — pure selection, no interpolation, so the
    result is bit-identical to any engine that sorts the same way."""
    s = pdf.sort_values(["o_totalprice", "o_orderkey"])["o_totalprice"]
    n = len(s)
    row = {"o_orderpriority": pdf["o_orderpriority"].iloc[0], "n_orders": n}
    for q in _QS:
        row[f"q{int(q * 100)}"] = float(s.iloc[max(math.ceil(q * n), 1) - 1])
    return pd.DataFrame([row])


@query(
    "group_quantiles",
    oracle=f"""
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_orders,
           {", ".join(
               f"max(CASE WHEN rn = greatest(CAST(ceil({q} * n) AS BIGINT), 1) "
               f"THEN o_totalprice END) AS q{int(q * 100)}"
               for q in _QS
           )}
    FROM r GROUP BY o_orderpriority
    """,
)
def group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority discrete order-value quantiles via applyInPandas —
    the custom-UDAF surface, oracle-checked: rank selection (no float
    interpolation) makes pandas and SQL agree exactly.

    One shuffle on the group key; ~5 groups here, but the same plan holds
    for high-cardinality keys (groups process independently)."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    return o.groupBy("o_orderpriority").applyInPandas(_disc_quantiles, _OUT_SCHEMA)


_EWMA_SCHEMA = "user_id bigint, n_events bigint, ewma_e2 bigint"


def _ewma_int(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sequential integer EWMA (alpha = 1/2): s_1 = v_1, s_t =
    trunc((s_{t-1} + v_t) / 2) over the (ts, event_id)-ordered group.
    halve_trunc matches SQL integer-division semantics for NEGATIVE
    sums too (Python's // floors), so the recurrence is engine-exact
    over the full integer domain."""
    from data_integration_system_spark.operators._common import halve_trunc

    pdf = pdf.sort_values(["ts", "event_id"])
    s = 0
    for i, v in enumerate(pdf["v_e2"]):
        s = int(v) if i == 0 else halve_trunc(s + int(v))
    return pd.DataFrame(
        [{"user_id": pdf["user_id"].iloc[0], "n_events": len(pdf), "ewma_e2": s}]
    )


@query(
    "user_value_ewma",
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
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted value average — an inherently
    SEQUENTIAL recurrence (each step depends on the previous state), the
    class of per-key stateful logic built-in aggregates can't express:
    the batch twin of applyInPandasWithState.  applyInPandas hands each
    user's Arrow batch to a Python loop; determinism comes from integer
    arithmetic (e2-quantized, alpha = 1/2 as floor-halving), which lets
    even a recurrence carry a FULL value-hash oracle — the DuckDB twin
    replays it as a RECURSIVE CTE over row_number.

    Scale shape: one shuffle on user_id, then embarrassingly parallel
    per-group loops over Arrow batches; each group is one user's events
    (bounded), the documented applyInPandas contract.  The recursion
    depth lives per executor — the oracle's recursive join is the
    engine-exactness witness, not the scale plan."""
    ev = table(spark, sf_dir, "events")
    rows = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100).cast("long").alias("v_e2"),
    )
    # Pre-hash-partition on the group key: applyInPandas groups are
    # byte-small but CPU-heavy (a Python loop per user), and AQE's
    # size-based coalescing would run them on ~2 partitions.  The
    # explicit hash partitioning IS the grouping distribution, so no
    # second exchange appears (measured 3.1 s -> 1.2 s at sf0.1).
    par = spark.sparkContext.defaultParallelism
    return (
        rows.repartition(par, "user_id")
        .groupBy("user_id")
        .applyInPandas(_ewma_int, _EWMA_SCHEMA)
        .orderBy("user_id")
    )


# The same recurrence, JVM-side.  ``(acc + x) div 2`` is Spark's
# integral divide (truncation toward zero) — the halve_trunc twin —
# and the NULL seed doubles as the "first element is taken verbatim"
# branch, so the fold can also be SEEDED with a prior state column
# (the incremental streaming step reuses it that way).
#
# BECAUSE the NULL seed is the base case, a NULL *element* would be
# indistinguishable from "unseeded": (acc + NULL) div 2 is NULL, so the
# next value would be taken verbatim — a silent mid-sequence reset.
# The applyInPandas twin fails loudly there instead (int(NaN) raises),
# so every JVM fold site must construct v_e2 through ewma_v_e2_col(),
# which raises on a NULL events.value rather than letting the three
# surfaces (pandas twin / JVM fold / RECURSIVE-CTE oracle, which would
# propagate NULL forward) quietly diverge.


def ewma_v_e2_col() -> Column:
    """events.value quantized to e2 for the EWMA fold, with the
    non-null contract enforced loudly: a NULL value raises instead of
    silently resetting the JVM fold's recurrence (the fold's NULL
    accumulator doubles as the base case, so it cannot distinguish an
    unseeded state from a NULL element).  NaN is routed to the same
    raise: floor(NaN*100).cast('long') silently yields 0 JVM-side while
    the applyInPandas twin raises on int(NaN) — without the guard a NaN
    events.value would re-open exactly the silent three-surface
    divergence (JVM fold / pandas twin / oracle) this column exists to
    close."""
    return (
        F.when(
            F.col("value").isNotNull() & ~F.isnan(F.col("value")),
            F.floor(F.col("value") * 100).cast("long"),
        )
        .otherwise(
            F.expr(
                "raise_error('ewma fold: NULL or NaN events.value — the"
                " fold''s NULL seed is the base case, a NULL element"
                " would silently reset the recurrence and floor(NaN)"
                " casts to 0 JVM-side while the pandas twin raises')"
            ).cast("long")
        )
        .alias("v_e2")
    )
EWMA_JVM_VALUES = (
    "transform(array_sort(collect_list(struct(ts, event_id, v_e2)))"
    ", s -> s.v_e2)"
)
EWMA_JVM_FOLD = (
    "(acc, x) -> CASE WHEN acc IS NULL THEN x ELSE (acc + x) div 2 END"
)


@query(
    "user_value_ewma_jvm",
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
def user_value_ewma_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user_value_ewma with the Python loop deleted: the SAME integer
    recurrence (s_1 = v_1, s_t = trunc((s_{t-1} + v_t) / 2)) expressed
    as a Catalyst higher-order fold —
    ``aggregate(transform(array_sort(collect_list(struct(ts, event_id,
    v_e2))), s -> s.v_e2), NULL, (acc, x) -> ... div 2)`` — so the
    whole query stays JVM-side: no Arrow round-trip, no per-group
    Python interpreter, one shuffle on user_id.  ``div`` truncates
    toward zero exactly like operators/_common.halve_trunc, so the two
    operators are bit-identical over the full integer domain (pinned in
    tests/test_operators.py) and share the RECURSIVE-CTE oracle.

    Why both exist: the applyInPandas twin (user_value_ewma) is the
    demonstration that arbitrary per-key Python state CAN carry a full
    value-hash oracle; this one is what you actually deploy when the
    recurrence is expressible as a fold — the r12 sf10 split measured
    the Python-side machinery at ~96% of the streaming drain's wall,
    and a fold this shape is the escape hatch (SCALE.md r12 EWMA
    split).  The collect_list per user is bounded by per-user event
    counts — the SAME boundedness the applyInPandas contract already
    assumes for its per-group pandas frame.

    Reference anchor: workers/worker_daemon.py's sequential per-job
    fold loop — the class of ordered per-key recurrence the reference
    runs in Python because it has no engine to push it into."""
    ev = table(spark, sf_dir, "events")
    rows = ev.select(
        "user_id",
        "ts",
        "event_id",
        ewma_v_e2_col(),
    )
    fold = (
        f"aggregate({EWMA_JVM_VALUES}, cast(null as bigint), {EWMA_JVM_FOLD})"
    )
    return (
        rows.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.expr(fold).alias("ewma_e2"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Fold-expressibility audit (r13, extending the r12 EWMA pair).
#
# Migration rule, applied to every Python group-fold surface in the
# repo: BEFORE reaching for applyInPandas(WithState), check whether the
# per-group logic is expressible as built-in aggregates or a Catalyst
# higher-order fold over the sorted group — the r12 split measured the
# Python machinery (Arrow hops + per-group interpreter) at ~96% of the
# EWMA drain's wall and the JVM fold at 97.8x (SCALE.md).  Audit result:
#
# * user_value_ewma        -> user_value_ewma_jvm (r12): seeded
#   aggregate() fold, bit-identical, 97.8x on the sf10 drain.
# * group_quantiles        -> group_quantiles_jvm (below): a type-1
#   quantile is pure RANK SELECTION — element_at over the
#   (value, key)-sorted group array — no Python needed.
# * dedup.py bucket-local cosine verify (:1029, :1118): NOT migrated,
#   deliberately.  The per-group work is a dense matmul (numpy/BLAS
#   over bucket members); a Catalyst HOF evaluates per-element
#   interpreted, so the JVM direction LOSES there — the same reasoning
#   that sent nearest_centroid's realistic-k path TO numpy
#   (similarity._nearest_centroid_np).  The rule cuts both ways: folds
#   of scalars belong in the JVM, dense linear algebra belongs in
#   Arrow-batched BLAS.
# * streaming applyInPandasWithState sites (sessionize, funnel,
#   EWMA-state): the EWMA twin (streaming/jobs.ewma_jvm_sink) is the
#   priced escape hatch for the fold-expressible member; sessionize /
#   funnel keep arbitrary per-key state machines (open-session lists,
#   step sets) that built-in streaming session windows cover only for
#   the simple case already registered separately.
# ---------------------------------------------------------------------------


@query(
    "group_quantiles_jvm",
    oracle=f"""
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_orders,
           {", ".join(
               f"max(CASE WHEN rn = greatest(CAST(ceil({q} * n) AS BIGINT), 1) "
               f"THEN o_totalprice END) AS q{int(q * 100)}"
               for q in _QS
           )}
    FROM r GROUP BY o_orderpriority
    """,
)
def group_quantiles_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_quantiles with the Python loop deleted (the fold-audit
    sibling of user_value_ewma_jvm): the type-1 quantile is the element
    of rank ceil(q·n) in the (value, key)-sorted group, which is pure
    rank selection — ``element_at(array_sort(collect_list(struct(value,
    key))), greatest(ceil(q*n), 1))`` — so the whole query stays
    JVM-side: no Arrow round-trip, no per-group interpreter, one
    shuffle on the group key, and the SAME exact oracle as the pandas
    twin (selection over identical doubles is engine-exact; pinned
    bit-identical in tests/test_streaming.py).

    Boundedness: collect_list per group is the applyInPandas contract
    the pandas twin already assumes (each group fits one executor);
    at true 100 TB group sizes BOTH twins would move to a distributed
    selection (percentile_approx / two-pass rank), which is the
    documented trade, not a silent one."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    sorted_arr = "array_sort(collect_list(struct(o_totalprice, o_orderkey)))"
    qcols = [
        F.expr(
            f"element_at({sorted_arr}, cast(greatest(ceil({q} * count(*)), 1)"
            " as int)).o_totalprice"
        ).alias(f"q{int(q * 100)}")
        for q in _QS
    ]
    return o.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"), *qcols
    )


@query(
    "group_quantiles_dist",
    oracle=f"""
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_orders,
           {", ".join(
               f"max(CASE WHEN rn = greatest(CAST(ceil({q} * n) AS BIGINT), 1) "
               f"THEN o_totalprice END) AS q{int(q * 100)}"
               for q in _QS
           )}
    FROM r GROUP BY o_orderpriority
    """,
)
def group_quantiles_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third quantile sibling — distributed rank selection, the
    shape that survives groups that DON'T fit one executor: window
    row_number + per-group count, then one aggregation picking the
    rank-ceil(q·n) rows.  No per-group array (group_quantiles_jvm
    materializes and array_sorts a whole group in one task's memory),
    no Arrow hop (group_quantiles ships the group to pandas) — the
    sort is Spark's distributed window sort and everything after is a
    plain aggregate.

    This row REFINES the r12/r13 fold-audit rule with a measured
    counterexample (SCALE.md r13): the JVM-fold escape hatch wins when
    it deletes a per-row interpreted Python loop (EWMA: 97.8x), but
    LOSES to vectorized pandas when the per-group work is a sort
    (sf10: array-fold 15.7 s vs pandas 7.7 s vs this).  Folds of
    scalars -> JVM aggregate; dense math -> Arrow-batched BLAS;
    order-statistics -> distributed rank selection, never a
    materialized group."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    r = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    qcols = [
        F.max(
            F.when(
                F.col("rn")
                == F.greatest(F.ceil(F.lit(q) * F.col("n")), F.lit(1)),
                F.col("o_totalprice"),
            )
        ).alias(f"q{int(q * 100)}")
        for q in _QS
    ]
    return r.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_orders"), *qcols
    )
