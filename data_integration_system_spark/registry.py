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
    from data_integration_system_spark.pipeline import layout as _playout  # noqa: F401
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
    # Round 16 window (CORRECTNESS_r15 landed 50/50 green — 47 exact +
    # 3 rows-only-by-design — so the whole r15 head rotates OUT).
    # Coverage histogram after `python rehearse.py --coverage` through
    # r15: r12=34, r13=50, r14=50, r15=50.  Window = the 34 r12-stale
    # queries (== the r15 _NEXT_ROTATION_FIRST queue, verbatim) + the
    # first 16 of the r13 tier (alphabetical), exactly 50; the displaced
    # 34-query r13 alphabetical tail sits in _NEXT_ROTATION_FIRST for
    # r17.  Queries NEW in r16 go at the very front as they land (names
    # UNCOMMENTED only once registered — the registry rejects unknown
    # names), each displacing the window's LAST r13-tier name into
    # _NEXT_ROTATION_FIRST at the moment of displacement.  Regenerate
    # the plan from data with `python rehearse.py --coverage` instead of
    # hand-counting.
    #
    # (1) NEW this round (policy tier 1; each displaces the window's
    # last r13-tier name into _NEXT_ROTATION_FIRST at that moment):
    "snapshot_maintenance_compaction",  # displaced filter_size_cap
    "similarity_sq8_rerank_parity",  # displaced filter_scope
    "similarity_ann_delete_visibility",  # displaced filter_blocklist
    "similarity_filtered_topk",  # displaced exact_substring_dup_spans
    "snapshot_purge_probe",  # displaced event_type_pagerank
    # (2) the 34 r12-stale queries (the registry's oldest rows):
    "event_type_transitions",
    "event_type_daily_trend",
    "embedding_centroid_per_label",
    "event_zscore_outliers",
    "fingerprint_overlap_pairs",
    "group_quantiles",
    "idle_rich_customers",
    "kmeans_assign_int",
    "large_volume_orders",
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
    "similarity_ann_recall_matrix",
    "similarity_ivfpq_topk",
    "similarity_recall_at_k",
    "sliding_window_avg",
    "streaming_dup_rate_snapshot",
    "streaming_jobs_fold_snapshot",
    "streaming_user_ewma_jvm_snapshot",
    "token_count_bpe",
    "tumbling_window_counts",
    "upsert_changed_rows",
    "user_value_ewma_jvm",
    "volume_shipping",
    "weekday_order_stats",
    "window_rank_frames",
    # (3) the first 16 of the r13 tier (alphabetical):
    "agg_counts_by_group",
    "agg_cube_events",
    "agg_distinct",
    "agg_rollup",
    "approx_distinct",
    "cheapest_supplier_per_part",
    "column_stats_lineitem",
    "content_hash_point_lookup",
    "customer_order_distribution",
    "disjunctive_discount_revenue",
    "embedding_norms",
]

#: Queries that must lead the NEXT round's rotation (fold into the front
#: of _DRIVER_HEAD when updating it).  After the r16 rotation this queue
#: holds the 34-query alphabetical tail of the r13 tier displaced by
#: window math; any query displaced mid-round by an r16 newcomer is
#: APPENDED here at the moment of displacement.  Regenerate the plan
#: from data with ``python rehearse.py --coverage`` (writes
#: CORRECTNESS_COVERAGE.json) instead of hand-maintaining this list.
_NEXT_ROTATION_FIRST: list[str] = [
    "filter_size_cap",  # displaced by r16 newcomer snapshot_maintenance_compaction
    "filter_scope",  # displaced by r16 newcomer similarity_sq8_rerank_parity
    "filter_blocklist",  # displaced by r16 newcomer similarity_ann_delete_visibility
    "exact_substring_dup_spans",  # displaced by r16 newcomer similarity_filtered_topk
    "event_type_pagerank",  # displaced by r16 newcomer snapshot_purge_probe
    "forecast_revenue",
    "group_quantiles_dist",
    "group_quantiles_jvm",
    "json_config_extract",
    "lone_returned_supplier_orders",
    "minhash_jaccard_error",
    "multimodal_audio_features",
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
    "similarity_ivfpq_clustered_recall",
    "snapshot_reconcile",
    "source_quality_report",
    "streaming_user_ewma_snapshot",
    "supplier_share_of_nation",
    "text_normalize",
    "token_count_bpe_big",
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
