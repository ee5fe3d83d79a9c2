"""Plan report CLI: the scale-critical plan facts for registered queries.

    python -m data_integration_system_spark.plans.report [query ...]
    python -m data_integration_system_spark.plans.report --executed [query ...]

For each named query (default: every registered query) this prints the
facts tests/test_plans.py pins — pushed filters per scan, columns
actually read, shuffle count, broadcast count — so a reviewer can audit
plan discipline without reading raw `explain` dumps.  Runs at sf0.001
(plan SHAPE is what matters; join strategy may differ at real scale).

``--executed`` RUNS each query and reports the post-AQE runtime facts
instead (plans/metrics.py): rows over each shuffle wire, scan output
rows vs numFiles, exchange reuse — the numbers behind every
"map-side combined" / "broadcast, zero shuffle" docstring claim.
"""

from __future__ import annotations

import sys

from data_integration_system_spark.plans.analyze import (
    broadcast_join_count,
    formatted_plan,
    pushed_filters,
    scan_read_schemas,
    shuffle_count,
)

SF_DIR = "/root/testdata/sf0.001"


def report(spark, name: str, fn) -> str:
    try:
        df = fn(spark, SF_DIR)
        plan = formatted_plan(df)
    except Exception as e:  # noqa: BLE001 — report the failure, keep going
        return f"== {name}\n  PLAN ERROR: {type(e).__name__}: {e}\n"
    lines = [f"== {name}"]
    lines.append(f"  shuffles: {shuffle_count(df)}  broadcasts: {broadcast_join_count(df)}")
    for tbl, cols in sorted(scan_read_schemas(df).items()):
        uniq = sorted(set(cols))
        scans = f" x{len(cols) // len(uniq)}" if uniq and len(cols) > len(uniq) else ""
        lines.append(f"  scan {tbl}{scans}: reads {uniq}")
        pf = pushed_filters(df, tbl)
        if pf:
            lines.append(f"    pushed: {pf}")
    if "TakeOrderedAndProject" in plan:
        lines.append("  top-k: TakeOrderedAndProject (no global sort)")
    if "Expand" in plan:
        lines.append("  WARNING: Expand present (grouping-set/multi-distinct replication)")
    return "\n".join(lines) + "\n"


def executed_report(spark, name: str, fn) -> str:
    """Runtime facts from the EXECUTED plan (the query actually runs)."""
    from data_integration_system_spark.plans.metrics import executed_nodes

    try:
        df = fn(spark, SF_DIR)
        df.collect()
        nodes = executed_nodes(df)
    except Exception as e:  # noqa: BLE001 — report the failure, keep going
        return f"== {name}\n  EXEC ERROR: {type(e).__name__}: {e}\n"
    lines = [f"== {name} (executed)"]
    for n in nodes:
        if n.cls == "ShuffleExchangeExec":
            lines.append(
                f"  exchange: {n.metrics.get('shuffleRecordsWritten', 0)} rows / "
                f"{n.metrics.get('shuffleBytesWritten', 0)} bytes over the wire"
            )
        elif n.cls == "ReusedExchangeExec":
            lines.append("  ReusedExchange: twice-consumed relation materialized once")
        elif n.cls == "FileSourceScanExec":
            lines.append(
                f"  scan ({n.metrics.get('numFiles', 0)} files): "
                f"{n.metrics.get('numOutputRows', 0)} rows out"
            )
        elif n.cls == "BroadcastExchangeExec":
            lines.append(
                f"  broadcast: {n.metrics.get('numOutputRows', 0)} rows shipped to all"
            )
    return "\n".join(lines) + "\n"


def main(argv: list[str]) -> None:
    from data_integration_system_spark.registry import get_queries
    from data_integration_system_spark.session import get_spark

    executed = "--executed" in argv
    argv = [a for a in argv if a != "--executed"]
    queries = get_queries()
    names = argv or list(queries)
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}; see registry")
    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    for n in names:
        if executed:
            print(executed_report(spark, n, queries[n]))
        else:
            print(report(spark, n, queries[n]))


if __name__ == "__main__":
    main(sys.argv[1:])
