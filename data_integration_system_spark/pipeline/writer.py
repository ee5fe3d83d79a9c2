"""Incremental writers: the reference's idempotent upsert contract (T4/T5)
as parquet-table operations.

The reference wrote through two sinks — content-addressed files with a
hash-skip (filesystem_store.py:95-128) and a Postgres read-compare-upsert
(db/postgres_store.py:126-184).  Both reduce to two declarative patterns:

* `classify_upsert`   — three-way SKIPPED / UPSERTED / INSERTED split of
  an incoming batch vs. the current table (D5 semantics, preserving the
  return-value distinction of db/postgres_store.py:140-184).
* `merge_keep_latest` — apply the non-SKIPPED rows: new version wins per
  key (D4 semantics, filesystem_store.py:112-127).

Scale: one shuffle each (join / window on the key).  An incremental
re-crawl that changed 0.1% of pages shuffles the batch, not the store —
the store side is read filtered to the batch's keys (broadcast-able when
the batch is small), and only changed rows are rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

STATUS_COL = "_upsert_status"


def classify_upsert(
    incoming: DataFrame,
    current: DataFrame,
    key: str,
    hash_col: str = "content_hash",
) -> DataFrame:
    """Tag each incoming row SKIPPED (key exists, same hash), UPSERTED
    (key exists, hash changed), or INSERTED (new key) — the exact
    outcome set of db/postgres_store.py:140-184."""
    cur = current.select(
        F.col(key).alias("_cur_key"), F.col(hash_col).alias("_cur_hash")
    )
    joined = incoming.join(cur, incoming[key] == cur["_cur_key"], "left")
    status = (
        F.when(F.col("_cur_key").isNull(), "INSERTED")
        .when(F.col(hash_col) == F.col("_cur_hash"), "SKIPPED")
        .otherwise("UPSERTED")
    )
    return joined.withColumn(STATUS_COL, status).drop("_cur_key", "_cur_hash")


def merge_keep_latest(
    current: DataFrame,
    incoming: DataFrame,
    key: str,
    version_col: str,
) -> DataFrame:
    """Union current + incoming, keep the newest version per key
    (version desc, ties → incoming wins).  The batch analog of
    filesystem_store.py's overwrite-on-changed-hash, and the exact
    pattern `foreachBatch` uses in streaming (T5)."""
    cur = current.withColumn("_src", F.lit(0))
    inc = incoming.withColumn("_src", F.lit(1))
    w = Window.partitionBy(key).orderBy(F.col(version_col).desc(), F.col("_src").desc())
    return (
        cur.unionByName(inc)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def write_changed_only(
    incoming: DataFrame,
    current: DataFrame,
    key: str,
    hash_col: str = "content_hash",
) -> DataFrame:
    """The changed-rows-only writer feed: classify, then drop SKIPPED —
    what actually proceeds to the sink under the T4 incremental contract."""
    return (
        classify_upsert(incoming, current, key, hash_col)
        .filter(F.col(STATUS_COL) != "SKIPPED")
        .drop(STATUS_COL)
    )


def write_pages(pages: DataFrame, path: str, partition_by: str = "domain") -> None:
    """S10 — the filesystem sink: one parquet table partitioned by site
    (the 'index' IS the table; filesystem_store.py:201-211's JSON side
    index has no Spark analog because schema travels with parquet)."""
    pages.write.mode("overwrite").partitionBy(partition_by).parquet(path)
