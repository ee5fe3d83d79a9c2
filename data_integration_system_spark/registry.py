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
        windows,
    )


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
    # Round 6 window = 16 + 32 + 2 = exactly 50 (VERDICT r5 "Next round"
    # #2/#3). Registry growth is FROZEN this round so verification debt
    # hits zero: after r6 every query has ≥1 driver row and none is >2
    # rounds stale.
    #
    # (1) never driver-sampled (registered late in round 5, after the r5
    # window was already full) — must get their first row:
    "transition_degrees",
    "embedding_centroid_per_label",
    "kmeans_assign_int",
    "user_modal_event_type",
    "doc_ngram_novelty",
    "transition_reachability",
    "minhash_jaccard_error",
    "event_type_daily_trend",
    "user_value_ewma",
    "order_fulfillment_lag",
    "session_opening_paths",
    "conversion_by_signup_week",
    "part_copurchase_pairs",
    "part_name_near_matches",
    "nation_supplier_concentration",
    "daily_volume_anomalies",
    # (2) latest driver row is round 3 — the §2C exact tier displaced by
    # the r5 additions, §2B north-star dedup heart included:
    "dedup_ngram_jaccard",
    "contamination_check",
    "sample_stratified",
    "text_normalize",
    "group_quantiles",
    "partsupp_profit",
    "top_sources_per_lang",
    "ntile_quartiles",
    "signup_purchase_funnel",
    "event_type_transitions",
    "quality_filter_gopher",
    "token_top_vocab",
    "domain_mix_weights",
    "decontaminate_filter",
    "returned_item_report",
    "top_revenue_supplier",
    "segment_top_orders",
    "snapshot_reconcile",
    "pii_redact",
    "large_volume_orders",
    "brand_supplier_counts",
    "event_zscore_outliers",
    "weighted_resample",
    "regional_nation_volume",
    "idle_rich_customers",
    "dedup_minhash_near",
    "dedup_simhash",
    "dedup_embedding_near",
    "dedup_clusters",
    "dedup_corpus_keep_reps",
    "doc_fingerprint",
    "fingerprint_overlap_pairs",
    # (3) r4-stale queries whose implementation CHANGED this round (the
    # multimodal decode stage gained a real JPEG/PNG byte parser) — they
    # need a fresh row against the new code path:
    "multimodal_decode_meta",
    "multimodal_resize_meta",
]

#: Queries that must lead the NEXT round's rotation (fold into the front
#: of _DRIVER_HEAD when updating it). After round 6 lands, the oldest
#: rows belong to the r4-checked tier (everything below), then the
#: r5-checked tier. Regenerate the plan from data with
#: ``python rehearse.py --coverage`` (writes CORRECTNESS_COVERAGE.json)
#: instead of hand-maintaining this list.
_NEXT_ROTATION_FIRST: list[str] = [
    # r4-stale after this round (driver row from round 4):
    "scan_project",
    "filter_blocklist",
    "filter_scope",
    "filter_size_cap",
    "project_domain",
    "project_content_hash",
    "agg_counts_by_group",
    "agg_rollup",
    "agg_distinct",
    "topk_oldest_pending",
    "stale_timeout_filter",
    "union_pages_files",
    "set_ops",
    "json_config_extract",
    "string_metrics",
    "text_stats",
    "similarity_topk",
    "approx_distinct",
    "agg_cube_events",
    "cheapest_supplier_per_part",
    "column_stats_lineitem",
    "customer_order_distribution",
    "disjunctive_discount_revenue",
    "embedding_norms",
    "event_type_pagerank",
    "exact_substring_dup_spans",
    "forecast_revenue",
    "lone_returned_supplier_orders",
    "multimodal_frame_sample",
    "national_market_share",
    "orders_above_customer_avg",
    "pack_sequences",
    "part_value_concentration",
    "pivot_lang_counts",
    "pricing_summary",
    "priority_counts_with_lineitem",
    "promo_revenue_share",
    "rare_token_score",
    "repetition_top_bigram",
    "segment_median_order",
    "similarity_ivf_topk",
    "small_qty_revenue",
    "text_lang_id",
    "text_quality_score",
    "tfidf_top_terms",
    "token_count_bpe",
    "volume_shipping",
    "weekday_order_stats",
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
