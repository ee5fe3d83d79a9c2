"""Query registry — the single source of truth behind __spark_entry__.

Each operator module registers named queries via the @query decorator.
A query couples:

* ``fn(spark, sf_dir) -> DataFrame`` — the Spark implementation
  (idiomatic DataFrame/SQL; docstring cites the reference anchor).
* ``oracle`` — equivalent ANSI SQL for the DuckDB oracle, or None for
  non-SQL-expressible ops (approx / stateful), which get the driver's
  weaker rows-only check.

Determinism contract (SURVEY.md §2B): UTC session TZ, ROUND(,2) float
aggregates, total-order tie-breakers on every ORDER BY, identical column
aliases on both sides, integer computed columns cast to BIGINT on both
sides (Spark `length()` is int32, DuckDB's is int64 — casting avoids
schema-hash mismatches).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every operator module so registration side-effects run."""
    from data_integration_system_spark.operators import (  # noqa: F401
        dedup,
        graph,
        groupops,
        joins,
        multimodal,
        relational,
        similarity,
        textops,
        tokenize,
        windows,
    )
    from data_integration_system_spark.pipeline import jobs as _pjobs  # noqa: F401
    from data_integration_system_spark.streaming import jobs  # noqa: F401


# The external correctness driver samples the FIRST 50 entries of queries()
# in iteration order. _DRIVER_HEAD pins queries that most need a driver row
# this round to the front of the window; anything not listed follows in module
# registration order.
#
# Rotation policy (update each round): (1) queries that have never had a green
# driver row — including queries NEW this round (add them here explicitly),
# (2) queries green in an older round but unsampled last round, (3) everything
# else in registration order; the most-often-verified queries fall out of the
# 50-query window.
_DRIVER_HEAD: list[str] = [
    # Round 12 window (CORRECTNESS_r11 landed 45/50 exact + 5
    # rows-only-by-design, zero err, so the whole r11 head rotates OUT;
    # coverage histogram after `python rehearse.py --coverage`: r8=20,
    # r9=50, r10=50, r11=50).  Window = 4 NEW-this-round + the 20
    # r8-stale queries from _NEXT_ROTATION_FIRST + the first 26 of the
    # r9 tier (alphabetical), exactly 50; the displaced 24-query r9
    # alphabetical tail sits in _NEXT_ROTATION_FIRST for r13
    # (multimodal_resize_meta displaced by the 4th newcomer leads it).
    #
    # (1) NEW this round (no driver row yet — policy tier 1; the two
    # JVM-EWMA queries joined mid-round, displacing the window's last
    # two r9-tier names into _NEXT_ROTATION_FIRST to hold at 50):
    "similarity_ivfpq_topk",
    "dedup_embedding_topk",
    "streaming_jobs_fold_snapshot",
    "similarity_ann_recall_matrix",
    "user_value_ewma_jvm",
    "streaming_user_ewma_jvm_snapshot",
    # (2) the 20 r8-stale queries (the registry's oldest rows —
    # VERDICT r11 #2 names them):
    "pareto_revenue_share",
    "percentile_approx_check",
    "purchase_streak_islands",
    "quantity_price_correlation",
    "range_join_events",
    "rolling_7day_event_volume",
    "salted_event_type_rollup",
    "semi_join_existing",
    "session_windows",
    "shipmode_priority_counts",
    "shipping_priority",
    "similarity_recall_at_k",
    "sliding_window_avg",
    "streaming_dup_rate_snapshot",
    "token_count_bpe",
    "tumbling_window_counts",
    "upsert_changed_rows",
    "volume_shipping",
    "weekday_order_stats",
    "window_rank_frames",
    # (3) the r9-checked tier (alphabetical; the 23 displaced by the
    # newcomers + window math sit in _NEXT_ROTATION_FIRST):
    "brand_supplier_counts",
    "contamination_check",
    "conversion_by_signup_week",
    "current_jobs_fold",
    "daily_volume_anomalies",
    "decontaminate_filter",
    "dedup_clusters",
    "dedup_corpus_keep_reps",
    "dedup_embedding_near",
    "dedup_minhash_near",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "doc_fingerprint",
    "doc_ngram_novelty",
    "domain_mix_weights",
    "embedding_centroid_per_label",
    "event_type_daily_trend",
    "event_type_transitions",
    "event_zscore_outliers",
    "fingerprint_overlap_pairs",
    "group_quantiles",
    "idle_rich_customers",
    "kmeans_assign_int",
    "large_volume_orders",
]

#: Queries that must lead the NEXT round's rotation (fold into the front
#: of _DRIVER_HEAD when updating it). The r12 window's three newcomers +
#: window math displaced the alphabetical tail of the r9 tier — these
#: lead the r13 window (their r9 rows become the registry's oldest).
#: Regenerate the plan from data with ``python rehearse.py --coverage``
#: (writes CORRECTNESS_COVERAGE.json) instead of hand-maintaining this
#: list.
_NEXT_ROTATION_FIRST: list[str] = [
    "minhash_jaccard_error",
    "multimodal_decode_meta",
    "multimodal_resize_meta",
    "nation_supplier_concentration",
    "ntile_quartiles",
    "order_fulfillment_lag",
    "part_copurchase_pairs",
    "part_name_near_matches",
    "partsupp_profit",
    "pii_redact",
    "quality_filter_gopher",
    "regional_nation_volume",
    "returned_item_report",
    "sample_stratified",
    "segment_top_orders",
    "session_opening_paths",
    "signup_purchase_funnel",
    "snapshot_reconcile",
    "source_quality_report",
    "streaming_user_ewma_snapshot",
    "supplier_share_of_nation",
    "text_normalize",
    "token_top_vocab",
    "top_revenue_supplier",
    "transition_triangles",
    "weekly_retention",
]


def _ordered_specs() -> list[QuerySpec]:
    _load_all_modules()
    head_rank = {name: i for i, name in enumerate(_DRIVER_HEAD)}
    unknown = (set(head_rank) | set(_NEXT_ROTATION_FIRST)) - set(QUERIES)
    if unknown:  # a typo here would silently waste a driver-window slot
        raise ValueError(f"driver-rotation names not registered: {sorted(unknown)}")
    names = list(QUERIES)
    reg_rank = {name: i for i, name in enumerate(names)}
    names.sort(key=lambda n: (0, head_rank[n]) if n in head_rank else (1, reg_rank[n]))
    return [QUERIES[n] for n in names]


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.fn for spec in _ordered_specs()}


def get_oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in _ordered_specs() if spec.oracle is not None}
