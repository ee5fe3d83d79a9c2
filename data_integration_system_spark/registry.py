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
    # Round 11 window (CORRECTNESS_r10 landed 49/50 exact + 1
    # rows-only-by-design, zero err, so the whole r10 head rotates OUT;
    # coverage histogram after `python rehearse.py --coverage`: r7=14,
    # r8=50, r9=50, r10=50).  Window = 6 NEW-this-round + the 14
    # r7-stale queries from _NEXT_ROTATION_FIRST + the first 30 of the
    # r8 tier (alphabetical), exactly 50; the displaced 20-query r8
    # alphabetical tail sits in _NEXT_ROTATION_FIRST for r12.
    #
    # (1) NEW this round (no driver row yet — policy tier 1):
    "streaming_near_dup_snapshot",
    "streaming_fingerprint_overlap_snapshot",
    "streaming_ann_ingest_snapshot",
    "streaming_sessionized_eviction_snapshot",
    "token_count_bpe_exact",
    "similarity_pq_topk",
    # (2) the 14 r7-stale queries (the registry's oldest rows —
    # VERDICT r10 #2 names them):
    "segment_median_order",
    "set_ops",
    "similarity_ivf_topk",
    "similarity_topk",
    "small_qty_revenue",
    "stale_timeout_filter",
    "string_metrics",
    "text_lang_id",
    "text_quality_score",
    "text_stats",
    "tfidf_top_terms",
    "topk_oldest_pending",
    "union_pages_files",
    "zorder_range_scan",
    # (3) the r8-checked tier (alphabetical; the 20 displaced by the
    # newcomers + window math sit in _NEXT_ROTATION_FIRST):
    "anti_join_unvisited",
    "asof_latest_event_per_order",
    "bigram_lift_top",
    "cross_source_duplicate_matrix",
    "customer_rfm_scores",
    "customer_spend_percentile",
    "daily_active_users",
    "dedup_exact",
    "dedup_exact_full",
    "dedup_keep_latest",
    "discount_band_pivot",
    "discount_band_unpivot",
    "doc_length_histogram",
    "dq_orders_report",
    "dup_rate_by_source",
    "event_type_gini_per_user",
    "event_value_mad",
    "excess_stock_suppliers",
    "join_broadcast_dim",
    "join_sortmerge_fact",
    "lang_confusion_matrix",
    "lang_source_grouping_sets",
    "lang_source_rollcall",
    "local_supplier_volume",
    "monthly_revenue_growth",
    "multiway_star_join",
    "new_vs_returning_users",
    "order_date_gap_fill",
    "order_gap_percentiles",
    "order_priority_check",
]

#: Queries that must lead the NEXT round's rotation (fold into the front
#: of _DRIVER_HEAD when updating it). The r11 window's six newcomers +
#: window math displaced the alphabetical tail of the r8 tier — these
#: lead the r12 window (their r8 rows become the registry's oldest).
#: Regenerate the plan from data with ``python rehearse.py --coverage``
#: (writes CORRECTNESS_COVERAGE.json) instead of hand-maintaining this
#: list.
_NEXT_ROTATION_FIRST: list[str] = [
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
