"""The main correctness gate, run locally: every registered query with an
oracle must match DuckDB exactly at sf0.001 (fast loop; the driver reruns
the same contract at sf0.01). Rows-only queries must at least execute and
return a stable schema."""

from __future__ import annotations

import pytest

from data_integration_system_spark.registry import QUERIES, get_queries

get_queries()  # force registration

ORACLE_NAMES = [n for n, s in QUERIES.items() if s.oracle is not None]
ROWS_ONLY_NAMES = [n for n, s in QUERIES.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    from tests.oracle_harness import compare

    spec = QUERIES[name]
    errors = compare(spark, sf_dir, name, spec.fn, spec.oracle)
    assert not errors, "\n".join(errors)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_executes(spark, sf_dir, name):
    """Rows-only queries must survive the driver's canonicalizer, not just
    count(): the driver does `toPandas().sort_values(by=<all columns>)`,
    which dies with `unhashable type: numpy.ndarray` on array-typed
    columns (the exact round-1 failure of dedup_clusters/doc_fingerprint).
    Reproduce that canonicalization here so array outputs can't ship."""
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    pdf = df.toPandas()
    assert len(pdf.columns) > 0
    # driver-style canonicalization: lexicographic sort over every column
    pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
