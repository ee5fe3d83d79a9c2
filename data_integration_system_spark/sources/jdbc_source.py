"""Partition-parallel JDBC source — scale-correct database ingestion.

The reference reads its Postgres store single-threaded (psycopg cursor
loops, db/postgres_store.py; the S13 backfill workers/raw_to_postgres.py
re-ingests row by row).  Spark's JDBC source can do the same naive thing
— one connection, one task — which at warehouse scale turns ingestion
into a serial bottleneck AND a single giant result set on one executor.

The scale contract is stride-partitioned reads: pick a numeric/temporal
partition column, split [lower, upper] into numPartitions strides, and
let every executor open its OWN connection for its stride.  Reads
parallelize, each cursor streams a bounded slice, and predicate pushdown
(Spark pushes the stride WHERE clauses) keeps the DB's work per
connection small.

`read_jdbc_partitioned` wraps that contract and auto-probes the bounds
with a MIN/MAX query when not given — the probe is one tiny aggregate
round-trip, not a data read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_IDENT_OK = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _check_ident(name: str, what: str) -> str:
    """Identifiers are interpolated into probe SQL — refuse anything but
    plain table/column names (same discipline as writer.jdbc_merge_sql)."""
    if not _IDENT_OK.match(name):
        raise ValueError(f"invalid {what}: {name!r}")
    return name


def read_jdbc_bounds(
    spark: SparkSession, url: str, table: str, partition_col: str
) -> tuple[int, int]:
    """(min, max) of ``partition_col`` via one aggregate round-trip."""
    _check_ident(table, "table")
    _check_ident(partition_col, "partition column")
    probe = (
        spark.read.format("jdbc")
        .option("url", url)
        .option(
            "dbtable",
            f"(SELECT MIN({partition_col}) AS lo, MAX({partition_col}) AS hi "
            f"FROM {table}) probe",
        )
        .load()
        .head()
    )
    if probe is None or probe["LO" if "LO" in probe.__fields__ else "lo"] is None:
        raise ValueError(f"cannot derive bounds: {table} is empty")
    lo = probe["LO"] if "LO" in probe.__fields__ else probe["lo"]
    hi = probe["HI"] if "HI" in probe.__fields__ else probe["hi"]
    return int(lo), int(hi)


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_col: str,
    num_partitions: int = 8,
    lower: int | None = None,
    upper: int | None = None,
    fetch_size: int = 10_000,
) -> DataFrame:
    """Read ``table`` with ``num_partitions`` parallel stride cursors on
    ``partition_col`` (bounds auto-probed when omitted).

    ``fetchsize`` keeps each cursor streaming instead of buffering its
    whole stride (the Postgres driver default is full-buffer).  Rows
    OUTSIDE [lower, upper] are still read — Spark widens the first and
    last stride — so explicit bounds are a parallelism hint, never a
    filter (the correctness property the test pins)."""
    _check_ident(table, "table")
    _check_ident(partition_col, "partition column")
    if lower is None or upper is None:
        lower, upper = read_jdbc_bounds(spark, url, table, partition_col)
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_col)
        .option("lowerBound", int(lower))
        .option("upperBound", int(upper))
        .option("numPartitions", int(num_partitions))
        .option("fetchsize", int(fetch_size))
        .load()
    )
