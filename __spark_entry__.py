"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``data_integration_system_spark``; this module
only adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_integration_system_spark.registry import get_oracle_sql, get_queries  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (Q21 multiway_star_join, TPC-H-Q5-shaped) on
    /root/testdata/sf0.001."""
    from data_integration_system_spark.operators.joins import multiway_star_join

    return multiway_star_join(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every exact-oracle query; approx/stateful ops are
    omitted -> rows-only check (SURVEY.md §2B marks which)."""
    return get_oracle_sql()
