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
    # Round 13 window (CORRECTNESS_r12 landed 38/38 exact + 12
    # rows-only-by-design, zero err, so the whole r12 head rotates OUT;
    # coverage histogram after `python rehearse.py --coverage` through
    # r12: r9=26, r10=50, r11=50, r12=50).  Window = the 26 r9-stale
    # queries from _NEXT_ROTATION_FIRST (VERDICT r12 #2 names them) +
    # the first 24 of the r10 tier (alphabetical), exactly 50; the
    # displaced 26-query r10 alphabetical tail sits in
    # _NEXT_ROTATION_FIRST for r14.  Queries NEW in r13 go at the very
    # front as they land, each displacing the window's LAST r10-tier
    # name into _NEXT_ROTATION_FIRST at the moment of displacement.
    #
    # (1) NEW this round (no driver row yet — policy tier 1; names are
    # UNCOMMENTED as each lands — the registry rejects unregistered
    # names — and each displaces the window's last r10-tier entry):
    "group_quantiles_jvm",  # landed: fold-audit JVM twin
    "group_quantiles_dist",  # landed: distributed rank-selection sibling
    "token_count_bpe_big",  # landed: 50k-merge production-vocab BPE pricing
    "similarity_ivfpq_clustered_recall",  # landed: honest-regime recall leg
    # (2) the 26 r9-stale queries (the registry's oldest rows):
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
    # (3) the r10-checked tier (alphabetical; the 26+3 displaced by the
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
]

#: Queries that must lead the NEXT round's rotation (fold into the front
#: of _DRIVER_HEAD when updating it). The r13 window holds the 26
#: r9-stale queries + the head of the r10 tier; the r10 alphabetical
#: tail (displaced by window math and by the three r13 newcomers, in
#: displacement order) leads the r14 window.  Regenerate the plan from
#: data with ``python rehearse.py --coverage`` (writes
#: CORRECTNESS_COVERAGE.json) instead of hand-maintaining this list.
_NEXT_ROTATION_FIRST: list[str] = [
    "multimodal_frame_sample",
    "multimodal_mp4_frame_sample",
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
    "streaming_funnel_pairs_snapshot",
    "streaming_length_profile_snapshot",
    "streaming_quality_monitor_snapshot",
    "streaming_retention_snapshot",
    "streaming_session_windows_snapshot",
    "streaming_tumbling_counts_snapshot",
    "token_count_exact",
    "top_sources_per_lang",
    "transition_degrees",
    "transition_reachability",
    "user_modal_event_type",
    "user_value_ewma",
    "weighted_resample",
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
