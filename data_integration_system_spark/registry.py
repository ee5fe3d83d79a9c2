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
        groupops,
        joins,
        multimodal,
        relational,
        similarity,
        textops,
        windows,
    )


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all_modules()
    return {name: spec.fn for name, spec in QUERIES.items()}


def get_oracle_sql() -> dict[str, str]:
    _load_all_modules()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
