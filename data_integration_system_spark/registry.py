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
    # Round 18 window (optimization round 2).  VERDICT r17's gate caveat:
    # the queries whose PLANS changed in r17 were not in the r17 sample
    # (the rotation had not advanced), and r18 changed more paths — so
    # policy tier 1 this round is "changed code first": the r17 dedup-CC
    # + streaming-fixture paths, and the r18 similarity/pagerank/
    # PassJoin/purge paths.  Tier 2 fills the remaining slots from the
    # stalest green tier (r13, the head of the r17 _NEXT_ROTATION_FIRST
    # queue).  Coverage through r17: never_checked=0, oldest_round=13
    # (python rehearse.py --coverage).
    #
    # (1) r17/r18 changed paths (29):
    "dedup_clusters",
    "dedup_corpus_keep_reps",
    "dedup_embedding_near",
    "dedup_minhash_near",
    "streaming_user_ewma_snapshot",
    "streaming_near_dup_snapshot",
    "streaming_tumbling_counts_snapshot",
    "streaming_session_windows_snapshot",
    "streaming_sessionized_eviction_snapshot",
    "streaming_funnel_pairs_snapshot",
    "streaming_length_profile_snapshot",
    "streaming_quality_monitor_snapshot",
    "streaming_retention_snapshot",
    "streaming_ann_ingest_snapshot",
    "streaming_fingerprint_overlap_snapshot",
    "event_type_pagerank",
    "part_name_near_matches",
    "similarity_ivf_topk",
    "similarity_recall_at_k",
    "similarity_ivfpq_topk",
    "similarity_ann_recall_matrix",
    "similarity_ivfpq_clustered_recall",
    "similarity_ivfpq_lowrank_residual_gain",
    "similarity_ivfpq_opq_gain",
    "similarity_sq8_rerank_parity",
    "similarity_ann_delete_visibility",
    "similarity_filtered_topk",
    "snapshot_purge_probe",
    "snapshot_maintenance_compaction",
    # (2) the stalest green tier (r13), in r17 queue order (21):
    "filter_size_cap",
    "filter_scope",
    "filter_blocklist",
    "exact_substring_dup_spans",
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
    "partsupp_profit",
    "pii_redact",
    "quality_filter_gopher",
    "regional_nation_volume",
]

#: Queries that must lead the NEXT round's rotation (fold into the front
#: of _DRIVER_HEAD when updating it).  After the r16 rotation this queue
#: holds the 34-query alphabetical tail of the r13 tier displaced by
#: window math; any query displaced mid-round by an r16 newcomer is
#: APPENDED here at the moment of displacement.  Regenerate the plan
#: from data with ``python rehearse.py --coverage`` (writes
#: CORRECTNESS_COVERAGE.json) instead of hand-maintaining this list.
_NEXT_ROTATION_FIRST: list[str] = [
    # r13-green tail of the r17 queue displaced by the r18 changed-paths
    # tier; they lead whatever rotation comes next.
    "returned_item_report",
    "sample_stratified",
    "segment_top_orders",
    "session_opening_paths",
    "signup_purchase_funnel",
    "snapshot_reconcile",
    "source_quality_report",
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
