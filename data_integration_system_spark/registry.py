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
    # Round 10 window (CORRECTNESS_r09 landed 42/42 exact + 8
    # rows-only, zero err, so the whole r9 head rotates OUT; coverage
    # histogram after `python rehearse.py --coverage`: r6=6, r7=50,
    # r8=50, r9=50). Window = NEW-this-round + the 6 r6-stale queries
    # from _NEXT_ROTATION_FIRST + the r7 tier, trimmed to exactly 50;
    # each addition displaces an r7 refresh into _NEXT_ROTATION_FIRST.
    #
    # (1) NEW this round (no driver row yet — policy tier 1):
    "multimodal_mp4_frame_sample",
    "streaming_quality_monitor_snapshot",
    "token_count_exact",
    "streaming_length_profile_snapshot",
    "streaming_retention_snapshot",
    "streaming_tumbling_counts_snapshot",
    "streaming_session_windows_snapshot",
    "streaming_funnel_pairs_snapshot",
    # (2) the 6 r6-stale queries (the registry's oldest rows —
    # VERDICT r9 #2 names them):
    "top_sources_per_lang",
    "transition_degrees",
    "transition_reachability",
    "user_modal_event_type",
    "user_value_ewma",
    "weighted_resample",
    # (3) the r7-checked tier (alphabetical; the 14 displaced by the
    # newcomers + window math sit in _NEXT_ROTATION_FIRST):
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
    "event_type_pagerank",
    "exact_substring_dup_spans",
    "filter_blocklist",
    "filter_scope",
    "filter_size_cap",
    "forecast_revenue",
    "json_config_extract",
    "lone_returned_supplier_orders",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    "multimodal_pixel_stats",
    "multimodal_video_frames",
    "national_market_share",
    "orders_above_customer_avg",
    "pack_sequences",
    "part_value_concentration",
    "pivot_lang_counts",
    "pricing_summary",
    "priority_counts_with_lineitem",
    "project_content_hash",
    "project_domain",
    "promo_revenue_share",
    "rare_token_score",
    "repetition_top_bigram",
    "scan_project",
]

#: Queries that must lead the NEXT round's rotation (fold into the front
#: of _DRIVER_HEAD when updating it). The r10 window's eight newcomers +
#: window math displaced the alphabetical tail of the r7 tier — these
#: lead the r11 window (their r7 rows become the registry's oldest).
#: Regenerate the plan from data with ``python rehearse.py --coverage``
#: (writes CORRECTNESS_COVERAGE.json) instead of hand-maintaining this
#: list.
_NEXT_ROTATION_FIRST: list[str] = [
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
