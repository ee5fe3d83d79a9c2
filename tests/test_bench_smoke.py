"""Perf regression gate between driver rounds (VERDICT r4 item 7).

A 3-query smoke — the flagship star join, the shuffle-heaviest dedup, and
a materialized-index probe — timed at sf0.01 against the committed
baseline in ``bench_smoke_baseline.json``.  Timings are normalized by the
same fixed-workload calibration bench.py uses, so a uniformly slower host
doesn't fail the gate, and each query is warmed then timed best-of-2 so
codegen/file-listing noise doesn't either.  A query exceeding 2x its
calibrated baseline fails: a plan regression (lost pushdown, new shuffle,
Catalyst expression re-inlining) can't ship silently.

Regenerate the baseline (same machine class) after an INTENTIONAL perf
change: run the recorder block documented in the baseline file's git
history, or copy the timings printed by a failing run if they are the
new expected steady state.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.01"
_BASELINE_PATH = os.path.join(os.path.dirname(__file__), "bench_smoke_baseline.json")
#: calibrated slowdown above this fails the gate (2x = the driver's own
#: regression bar, wide enough for scheduler jitter at sub-second scale)
_MAX_RATIO = 2.0


def _best_of_2(fn) -> float:
    fn()  # warm: codegen + parquet footer/file-listing caches
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


@pytest.fixture(scope="module")
def smoke(spark):
    """Measured timings + the host-speed ratio vs the recorded baseline."""
    with open(_BASELINE_PATH) as fh:
        baseline = json.load(fh)

    t0 = time.perf_counter()
    spark.range(0, 50_000_000, 1, 32).selectExpr(
        "sum(id * 2654435761 % 1000003) as s"
    ).collect()
    calibration = time.perf_counter() - t0
    # clamped >= 1: a faster host must not mask a real regression
    host_ratio = max(1.0, calibration / baseline["calibration_sec"])
    return baseline, host_ratio


def _assert_within_budget(name: str, measured: float, smoke) -> None:
    baseline, host_ratio = smoke
    budget = baseline["queries"][name] * host_ratio * _MAX_RATIO
    assert measured <= budget, (
        f"{name}: {measured:.3f}s exceeds calibrated budget {budget:.3f}s "
        f"(baseline {baseline['queries'][name]}s x host {host_ratio:.2f} "
        f"x bar {_MAX_RATIO}) — a plan/perf regression, or an intentional "
        f"change that needs tests/bench_smoke_baseline.json re-recorded"
    )


def test_flagship_star_join_speed(spark, smoke):
    from data_integration_system_spark.registry import get_queries

    fn = get_queries()["multiway_star_join"]
    measured = _best_of_2(lambda: fn(spark, SF_SMOKE).count())
    _assert_within_budget("multiway_star_join", measured, smoke)


def test_minhash_near_dup_speed(spark, smoke):
    from data_integration_system_spark.registry import get_queries

    fn = get_queries()["dedup_minhash_near"]
    measured = _best_of_2(lambda: fn(spark, SF_SMOKE).count())
    _assert_within_budget("dedup_minhash_near", measured, smoke)


def test_minhash_index_probe_speed(spark, smoke):
    from data_integration_system_spark.catalog import table
    from data_integration_system_spark.operators.dedup import (
        build_minhash_index,
        query_minhash_index,
    )

    root = tempfile.mkdtemp(prefix="smoke_idx_")
    try:
        build_minhash_index(spark, SF_SMOKE, f"{root}/mh")
        probe = (
            table(spark, SF_SMOKE, "documents")
            .filter(F.col("doc_id") < 50)
            .select("doc_id", "text")
        )
        measured = _best_of_2(
            lambda: query_minhash_index(spark, f"{root}/mh", probe).count()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    _assert_within_budget("minhash_index_probe", measured, smoke)


def test_bench_compact_line_bounded():
    """The printed bench line must stay parseable by the driver's tail
    capture NO MATTER how large the suite grows (the r5 full line outran
    it and the round's perf record was lost): 200 long-named queries,
    errors, and regressions must still compact under 4 KB with the
    flagship and the suite wall present."""
    import json as _json

    from bench import compact_output

    timings = {f"extremely_long_query_name_number_{i:03d}": i / 7.0 for i in range(200)}
    timings["multiway_star_join"] = 1.234
    errors = {f"broken_query_{i}": "SomeError: " + "x" * 500 for i in range(20)}
    out = {
        "metric": "suite_wall_sec",
        "value": 99.9,
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "calibration_sec": 0.5,
        "regressions": {
            f"extremely_long_query_name_number_{i:03d}": {"prev": 1.0, "now": 9.0}
            for i in range(40)
        },
        "median_ratio_vs_prev": 1.01,
    }
    line = _json.dumps(compact_output(out, timings, errors))
    assert len(line) < 4096
    parsed = _json.loads(line)
    assert parsed["value"] == 99.9
    assert "multiway_star_join" in parsed["queries"]
    assert parsed["n_queries"] == 201
    assert len(parsed["queries"]) <= 11
    assert len(parsed["regressions"]) <= 10 and len(parsed["errors"]) <= 5
