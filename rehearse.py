#!/usr/bin/env python
"""Driver-gate dress rehearsal: every registered query vs its DuckDB
oracle at the DRIVER'S scale (sf0.01 — the in-repo pytest parity loop
runs sf0.001, which can miss sf-dependent edges), plus the driver-style
pandas canonicalization for rows-only queries.

    python rehearse.py [--sf-dir /root/testdata/sf0.01] [name ...]

Prints one line per failure and a final summary; exit code 1 on any
failure.  Run before ending a round — this is the closest local replica
of what CORRECTNESS_r{N}.json will record.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_REPO = os.path.dirname(os.path.abspath(__file__))


def coverage_map(repo_root: str = _REPO) -> dict[str, dict]:
    """Per-registered-query driver-verification status, computed from the
    recorded ``CORRECTNESS_r{N}.json`` files (never hand-maintained).

    Returns ``{name: {"round": N | None, "green": bool, "mode": ...}}``
    where ``round`` is the latest round the driver sampled the query
    (None = never), ``green`` is whether that latest row passed (exact
    hash match, or executed-with-rows for the designed rows-only
    channel), and ``mode`` is "exact" / "rows_only" / "never".
    """
    from data_integration_system_spark.registry import get_queries

    latest: dict[str, tuple[int, dict]] = {}
    for f in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        try:
            rows = json.load(open(f))
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            if name not in latest or rnd > latest[name][0]:
                latest[name] = (rnd, row)
    out: dict[str, dict] = {}
    for name in get_queries():
        if name not in latest:
            out[name] = {"round": None, "green": False, "mode": "never"}
            continue
        rnd, row = latest[name]
        if row.get("err") == "no_oracle":
            # designed rows-only channel: green = it executed and the
            # driver saw a row count
            out[name] = {
                "round": rnd,
                "green": row.get("spark_rows") is not None,
                "mode": "rows_only",
            }
        else:
            out[name] = {
                "round": rnd,
                "green": bool(
                    row.get("rows_match")
                    and row.get("schema_match")
                    and row.get("hash_match")
                ),
                "mode": "exact",
            }
    return out


def write_coverage_report(repo_root: str = _REPO) -> dict:
    """Emit CORRECTNESS_COVERAGE.json — the data the rotation plan
    (registry._DRIVER_HEAD) is computed from each round."""
    cov = coverage_map(repo_root)
    rounds = [v["round"] for v in cov.values() if v["round"] is not None]
    report = {
        # which recorded rounds this artifact reflects — the committed
        # file shipped stale two rounds running (VERDICT r7 "What's
        # wrong" #1) because nothing said what it was computed from
        "reflects_rounds_through": max(rounds) if rounds else None,
        "queries": cov,
        "summary": {
            "registered": len(cov),
            "never_checked": sorted(n for n, v in cov.items() if v["round"] is None),
            "latest_not_green": sorted(
                n for n, v in cov.items() if v["round"] is not None and not v["green"]
            ),
            "oldest_round": min(rounds) if rounds else None,
        },
    }
    with open(os.path.join(repo_root, "CORRECTNESS_COVERAGE.json"), "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    return report


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--coverage",
        action="store_true",
        help="write CORRECTNESS_COVERAGE.json and exit (no Spark needed)",
    )
    args = ap.parse_args(argv)

    if args.coverage:
        report = write_coverage_report()
        s = report["summary"]
        print(
            f"registered={s['registered']} never_checked={len(s['never_checked'])} "
            f"not_green={len(s['latest_not_green'])} oldest_round={s['oldest_round']}"
        )
        return 0

    from data_integration_system_spark.registry import QUERIES, get_queries
    from data_integration_system_spark.session import get_spark
    from tests.oracle_harness import compare

    get_queries()
    spark = get_spark("dress-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.names or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    fails = 0
    for name in names:
        spec = QUERIES[name]
        try:
            if spec.oracle is None:
                # rows-only: must at least survive the driver's pandas
                # sort-canonicalization (arrays/maps crash it)
                pdf = spec.fn(spark, args.sf_dir).toPandas()
                pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
            else:
                errs = compare(spark, args.sf_dir, name, spec.fn, spec.oracle)
                if errs:
                    fails += 1
                    print(f"FAIL {name}: {errs[0][:200]}")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails += 1
            print(f"FAIL {name}: {type(e).__name__}: {e}")
    print(f"rehearsed {len(names)} queries at {args.sf_dir}: {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
