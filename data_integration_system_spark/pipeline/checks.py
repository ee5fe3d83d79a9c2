"""Declarative data-quality checks, evaluated in ONE pass.

The reference validated rows ad hoc at write time (postgres_store.py's
per-row try/except; api/main.py's pydantic request models); a batch
engine needs the table-level form: declare constraints, get a violation
report, gate the pipeline on it.

Design: every row-local check compiles to a conditional-sum inside a
SINGLE aggregation over one scan — N checks cost one pass, not N
(the `column_stats_lineitem` discipline applied to constraints).
Checks that are inherently relational (key uniqueness, referential
integrity) get their own co-keyed aggregate / anti-join helpers, each
still one shuffle.

`dq_orders_report` registers the row-local family as a driver-checked
query; `gate` turns any report into a hard pipeline stop.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """A named row-local constraint: ``passes`` is the per-row predicate
    (NULL counts as a violation — SQL three-valued logic must not let
    unknowns slip through a gate)."""

    name: str
    passes: Column


def not_null(col: str) -> Check:
    return Check(f"not_null_{col}", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Check:
    return Check(f"range_{col}", F.col(col).between(lo, hi))


def in_set(col: str, values: tuple) -> Check:
    return Check(f"set_{col}", F.col(col).isin(*values))


def matches(col: str, pattern: str) -> Check:
    return Check(f"regex_{col}", F.col(col).rlike(pattern))


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every row-local check in one aggregation over one scan.
    Returns long-form (check_name, n_rows, n_violations) — a NULL
    predicate result counts as a violation."""
    aggs = [
        F.coalesce(  # empty input: 0 violations, not NULL (gate() compares)
            F.sum(F.when(c.passes.isNull() | ~c.passes, 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias(c.name)
        for c in checks
    ]
    wide = df.agg(F.count("*").cast("long").alias("_n_rows"), *aggs)
    return wide.unpivot(
        ids=["_n_rows"],
        values=[c.name for c in checks],
        variableColumnName="check_name",
        valueColumnName="n_violations",
    ).select(
        "check_name",
        F.col("_n_rows").alias("n_rows"),
        "n_violations",
    )


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key-uniqueness violations: every key tuple appearing more than
    once, with its multiplicity.  One co-keyed aggregation; at 100 TB
    the map-side partials collapse unique keys before the shuffle."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").cast("long").alias("n"))
        .filter(F.col("n") > 1)
    )


def foreign_key_violations(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Orphaned child keys: DISTINCT non-NULL child keys with no parent
    — the referential-integrity check as a left-anti join on the
    reduced child-key grain (dedup BEFORE the join: the anti-join moves
    |distinct keys|, not |child rows|).  NULL child keys are NOT
    orphans (SQL FK semantics ignore them — flagging NULLs is
    `not_null`'s job)."""
    ck = (
        child.select(F.col(child_key).alias(child_key))
        .filter(F.col(child_key).isNotNull())
        .distinct()
    )
    pk = parent.select(F.col(parent_key).alias(parent_key))
    return ck.join(pk, ck[child_key] == pk[parent_key], "left_anti")


class CheckFailure(Exception):
    pass


def gate(report: DataFrame, max_violations: int = 0) -> None:
    """Hard pipeline gate: raise CheckFailure if any check exceeds
    ``max_violations``.  The report is tiny (one row per check) — the
    collect here is control-plane, not data-plane."""
    bad = [
        (r["check_name"], r["n_violations"])
        for r in report.collect()
        if r["n_violations"] > max_violations
    ]
    if bad:
        raise CheckFailure(f"data-quality gate failed: {bad}")
