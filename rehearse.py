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
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args(argv)

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
