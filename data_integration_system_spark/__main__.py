"""Query CLI — run any registered query from the command line.

    python -m data_integration_system_spark <query> [more queries ...]
        [--sf-dir DIR] [--limit N] [--json] [--explain] [--oracle]
    python -m data_integration_system_spark --sql "SELECT ... FROM documents ..."
    python -m data_integration_system_spark --list

The switch-from-the-reference front door for ad-hoc use (the reference's
equivalent was psql against its Postgres store): name a query from the
registry, get its result on stdout — as an aligned table (default) or
JSON lines (``--json``), truncated to ``--limit`` rows.  ``--explain``
prints the plan-audit facts instead of rows (same report as
``plans.report``); ``--oracle`` prints the DuckDB oracle SQL, which
doubles as readable documentation of each query's exact semantics.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m data_integration_system_spark",
        description="Run registered queries against a parquet table dir.",
    )
    ap.add_argument("queries", nargs="*", help="registered query names")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--json", action="store_true", help="JSON lines output")
    ap.add_argument("--explain", action="store_true", help="plan audit, no rows")
    ap.add_argument("--oracle", action="store_true", help="print oracle SQL only")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    ap.add_argument(
        "--sql",
        metavar="STATEMENT",
        help="run an ad-hoc SQL statement over the catalog views instead "
        "of a registered query (the psql-replacement path)",
    )
    args = ap.parse_args(argv)

    from data_integration_system_spark.registry import get_oracle_sql, get_queries

    if args.sql:
        from data_integration_system_spark.catalog import sql as catalog_sql
        from data_integration_system_spark.session import get_spark

        spark = get_spark("query-cli")
        spark.sparkContext.setLogLevel("ERROR")
        df = catalog_sql(spark, args.sf_dir, args.sql)
        if args.json:
            for line in df.limit(args.limit).toJSON().collect():
                print(line)
        else:
            df.show(args.limit, truncate=False)
        return 0

    queries = get_queries()
    if args.list:
        oracles = get_oracle_sql()
        for n in sorted(queries):
            kind = "sql-oracle" if n in oracles else "rows-only"
            print(f"{n}\t{kind}")
        return 0
    if not args.queries:
        ap.error("name at least one query (or --list)")
    unknown = [n for n in args.queries if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown} (see --list)", file=sys.stderr)
        return 2

    if args.oracle:  # no Spark session needed
        oracles = get_oracle_sql()
        for n in args.queries:
            print(f"-- {n}")
            print(oracles.get(n, "-- rows-only query: no SQL oracle"))
        return 0

    from data_integration_system_spark.session import get_spark

    spark = get_spark("query-cli")
    spark.sparkContext.setLogLevel("ERROR")
    for n in args.queries:
        if args.explain:
            from data_integration_system_spark.plans.report import report

            print(report(spark, n, queries[n]))
            continue
        df = queries[n](spark, args.sf_dir)
        if args.json:
            for line in df.limit(args.limit).toJSON().collect():
                print(line)
        else:
            print(f"== {n}")
            df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
