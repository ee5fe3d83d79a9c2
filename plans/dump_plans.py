#!/usr/bin/env python
"""Dump .explain("formatted") for named queries into plans/<round>/.

Usage: python plans/dump_plans.py r18 before query1 query2 ...
Writes plans/<round>/<query>_<tag>.txt with a header recording sf and
plan-build wall (for queries whose body executes work eagerly, that wall
is the body's phase cost, not the final plan's).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

rnd, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from data_integration_system_spark.registry import get_queries
from data_integration_system_spark.session import get_spark

queries = get_queries()
spark = get_spark("plan-dump")
spark.sparkContext.setLogLevel("ERROR")
here = os.path.join(os.path.dirname(os.path.abspath(__file__)), rnd)
os.makedirs(here, exist_ok=True)

for name in names:
    t0 = time.perf_counter()
    df = queries[name](spark, sf_dir)
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    wall = time.perf_counter() - t0
    out = os.path.join(here, f"{name}_{tag}.txt")
    with open(out, "w") as f:
        f.write(f"-- {name} @ {sf_dir.rsplit('/', 1)[-1]}, {tag} "
                f"(plan-build {wall:.2f}s)\n")
        f.write(txt)
    print(f"{name}: {wall:.2f}s -> {out}", flush=True)
