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
from pyspark.sql import DataFrame, SparkSession
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
