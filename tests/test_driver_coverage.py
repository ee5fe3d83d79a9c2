"""Verification-debt guard (VERDICT r5 "Next round" #6).

Round 5 ended with 16 registered queries that had NEVER been sampled by
the driver's 50-slot CORRECTNESS window — they were only verified by a
manual ``rehearse.py`` run. This module makes that rehearsal mandatory
CI: the exact set difference (registry − union of recorded
CORRECTNESS_r{N}.json rows) is recomputed from data on every pytest run
and each member must pass the DuckDB oracle at the DRIVER'S scale
(sf0.01, not the fast sf0.001 loop), so a newly registered query can't
sit unverified for a round.

A second guard pins the rotation plan itself: every never-checked query
must sit inside the first-50 window the driver samples, so registering a
query without scheduling its first driver row is a red test, not a
VERDICT finding two rounds later.
"""

from __future__ import annotations

import pytest

from rehearse import coverage_map
from tests.conftest import SF_CORRECT

_COV = coverage_map()
NEVER_CHECKED = sorted(n for n, v in _COV.items() if v["round"] is None)


@pytest.mark.parametrize("name", NEVER_CHECKED or ["<all-checked>"])
def test_never_driver_checked_passes_at_driver_scale(spark, name):
    if name == "<all-checked>":
        return  # zero verification debt — nothing to rehearse
    from data_integration_system_spark.registry import QUERIES
    from tests.oracle_harness import compare

    spec = QUERIES[name]
    if spec.oracle is None:
        # rows-only channel: must survive the driver's canonicalizer
        pdf = spec.fn(spark, SF_CORRECT).toPandas()
        assert len(pdf.columns) > 0
        pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    else:
        errors = compare(spark, SF_CORRECT, name, spec.fn, spec.oracle)
        assert not errors, "\n".join(errors)


def test_never_checked_queries_lead_driver_window():
    """The driver samples the FIRST 50 entries of queries() — any query
    with zero driver rows must be inside that window next round."""
    from data_integration_system_spark.registry import get_queries

    window = set(list(get_queries())[:50])
    missing = [n for n in NEVER_CHECKED if n not in window]
    assert not missing, (
        f"never-driver-checked queries outside the 50-slot window: {missing}; "
        "add them to registry._DRIVER_HEAD"
    )
