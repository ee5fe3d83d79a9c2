"""Bucketed-table layout: pre-shuffled storage for repeat co-located joins.

The reference re-reads its whole store on every reconcile pass and joins
in memory (db/postgres_store.py:126-184 does it row-by-row over an
index).  At 100 TB the equivalent Spark anti-pattern is re-shuffling the
same two fact tables on the same key for every nightly join.  Bucketing
is the storage-level fix: write each table ONCE through a hash shuffle on
the join key (`bucketBy(n, key)`), and every subsequent equi-join or
aggregation on that key reads bucket i against bucket i with **zero
Exchange on either side** — the shuffle is amortized into the layout.

Rules this module enforces (Spark silently degrades otherwise):

* both sides of a co-located join must share bucket COUNT and bucket KEY
  (`cobucket` writes the pair together so they can't drift);
* one file per bucket (`repartition(n, key)` before write) — otherwise
  Spark plans a per-bucket sort AND `sortBy` metadata is ignored;
* bucket counts are powers of two, so a future 4× re-bucket can coalesce
  reads (`spark.sql.bucketing.coalesceBucketsInJoin.enabled`) instead of
  rewriting the smaller table.

Tables are EXTERNAL (explicit ``path``): dropping the catalog entry
leaves the parquet in place, and a fresh session re-registers it with
the same DDL — the catalog carries only the bucket spec.

tests/test_scale_patterns.py pins the payoff: the orderkey join of the
cobucketed orders+lineitem pair plans ZERO Exchange nodes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed parquet table.

    The explicit ``repartition(n_buckets, key)`` makes files==buckets,
    which is what lets Spark (a) trust ``sortBy`` metadata and (b) map
    bucket files 1:1 onto join tasks with no merge pass.
    """
    if n_buckets < 1 or (n_buckets & (n_buckets - 1)) != 0:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def cobucket(
    tables: list[tuple[DataFrame, str, str, list[str]]],
    n_buckets: int,
    base_path: str,
) -> None:
    """Write several relations bucketed on role-equivalent keys with the
    SAME bucket count — the precondition for every pairwise join among
    them to be Exchange-free.  ``tables`` is [(df, table_name, subdir,
    bucket_cols)] — bucket_cols name the join key AS SPELLED IN THAT
    relation (l_orderkey vs o_orderkey); each entry is also sorted by
    its bucket cols so merge-joins skip the per-task sort.  All layouts
    land under ``base_path``."""
    widths = {len(cols) for _, _, _, cols in tables}
    if len(widths) != 1:
        raise ValueError(f"bucket key widths differ across tables: {widths}")
    for df, name, subdir, bucket_cols in tables:
        write_bucketed(
            df,
            name,
            f"{base_path}/{subdir}",
            bucket_cols=bucket_cols,
            n_buckets=n_buckets,
            sort_cols=bucket_cols,
        )


def register_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Re-attach an existing bucketed layout to a (fresh) session's
    catalog.  The parquet files carry no bucket metadata — the catalog
    does — so after a restart the layout is just files until this DDL
    re-registers it; skip it and every join silently degrades back to a
    full shuffle.  Schema is read from the files; the bucket spec MUST
    match what `write_bucketed` used (same cols, same count) — Spark
    trusts the DDL, so a mismatched re-registration silently mis-reads
    bucket membership.  Idempotent: an existing entry is replaced."""
    if n_buckets < 1 or (n_buckets & (n_buckets - 1)) != 0:
        # same invariant write_bucketed enforces — Spark trusts this DDL,
        # so a drifted spec silently mis-reads bucket membership
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    schema = spark.read.parquet(path).schema
    cols_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    sort = sort_cols or bucket_cols
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({cols_ddl}) USING PARQUET "
        f"CLUSTERED BY ({', '.join(bucket_cols)}) "
        f"SORTED BY ({', '.join(sort)}) "
        f"INTO {n_buckets} BUCKETS "
        f"LOCATION '{path}'"
    )
