"""SparkSession factory and session-level configuration.

Determinism + scale defaults used across the engine:

* ``spark.sql.session.timeZone=UTC`` — oracle comparisons (DuckDB) must see
  identical timestamps regardless of host TZ (SURVEY.md §2B determinism).
* AQE on — runtime re-planning (skew joins, coalesced shuffle partitions)
  is the scale story for 100 TB inputs where static stats lie.
* ``autoBroadcastJoinThreshold`` kept at default 10 MB — dimension tables
  (region/nation/customer/supplier) broadcast; facts (orders/lineitem)
  sort-merge.  Queries force `F.broadcast` where the choice matters.
* Arrow enabled — every pandas UDF / mapInPandas stage ships Arrow batches,
  never pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: conf applied both when we build the session ourselves and when the
#: driver hands us one (runtime-settable keys only in that case).
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # the synthetic events table stores TIMESTAMP(NANOS) which Spark's
    # parquet reader rejects; read as long and convert in the catalog
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable determinism/perf conf to an existing session.

    Safe to call on a driver-owned session: only touches runtime keys.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # key not runtime-settable in this build — defaults are fine
    return spark


def get_spark(app_name: str = "data_integration_system_spark") -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    local[N] for tests/bench (N from SPARK_GRAFT_CPUS, default all cores);
    on a real cluster the master comes from spark-submit and this builder
    only contributes conf.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())
