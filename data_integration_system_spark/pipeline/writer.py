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

import re
import uuid

from pyspark.sql import DataFrame
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
    pattern `foreachBatch` uses in streaming (T5).

    Implemented as a max_by AGGREGATION, not a row_number window: the
    aggregate gets map-side partial combine (each scan partition emits
    one candidate per key before the shuffle) and never sorts a key
    group — so a hot key degrades gracefully instead of serializing one
    reducer, and the shuffle carries one row per (partition, key) rather
    than every version.  The skew answer for keep-latest at 100 TB."""
    cur = current.withColumn("_src", F.lit(0))
    inc = incoming.withColumn("_src", F.lit(1))
    both = cur.unionByName(inc)
    payload_cols = [c for c in both.columns if c not in (key, "_src")]
    order = F.struct(F.col(version_col), F.col("_src"))
    winner = F.max_by(F.struct(*payload_cols), order).alias("_row")
    return both.groupBy(key).agg(winner).select(key, "_row.*")


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


# ---------------------------------------------------------------------------
# S11/S12 — JDBC sink (db/postgres_store.py:126-184) as stage-and-merge
# ---------------------------------------------------------------------------

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

#: options consumed by Spark's JDBC writer itself — everything else in
#: write_options is a java.sql connection property and must reach the
#: driver-side merge connection too
_SPARK_WRITER_ONLY_OPTIONS = {
    "url", "dbtable", "query", "driver", "numpartitions", "batchsize",
    "isolationlevel", "truncate", "cascadetruncate", "createtableoptions",
    "createtablecolumntypes", "customschema", "keytab", "principal",
    "refreshkrb5config", "partitioncolumn", "lowerbound", "upperbound",
}


def _q(name: str) -> str:
    """Validate and double-quote one SQL identifier.  Quoting matters
    beyond injection-hardening: Spark's JDBC writer quotes column names
    on CREATE, so unquoted references would case-fold away from the
    staged table's identifiers (Derby/Postgres fold differently)."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return f'"{name}"'


def jdbc_merge_sql(
    target: str,
    staging: str,
    columns: list[str],
    key_cols: list[str],
    update_cols: list[str] | None = None,
    dialect: str = "ansi",
    insert_only: bool = False,
) -> str:
    """The set-based merge statement applied after staging a batch.

    `dialect="postgres"` reproduces the reference's upsert verbatim
    (INSERT … ON CONFLICT (keys) DO UPDATE SET c = EXCLUDED.c,
    postgres_store.py:144-165; `insert_only` gives S12's DO NOTHING,
    insert_raw_document).  `dialect="ansi"` is the MERGE form Derby/
    SQL-Server/Oracle accept — integration-tested against embedded Derby.

    One statement per batch: the upsert happens set-at-a-time in the
    database, not row-at-a-time from executors — the scalable JDBC
    pattern (the DB dedupes against its own index; Spark ships data
    once)."""
    if update_cols is None:
        update_cols = [c for c in columns if c not in key_cols]
    if not update_cols and not insert_only:
        raise ValueError(
            "every column is a key column — an upsert has nothing to "
            "update; use insert_only=True (ON CONFLICT DO NOTHING)"
        )
    cols_q = ", ".join(_q(c) for c in columns)
    if dialect == "postgres":
        action = (
            "DO NOTHING"
            if insert_only
            else "DO UPDATE SET "
            + ", ".join(f"{_q(c)} = EXCLUDED.{_q(c)}" for c in update_cols)
        )
        return (
            f"INSERT INTO {_q(target)} ({cols_q}) "
            f"SELECT {cols_q} FROM {_q(staging)} "
            f"ON CONFLICT ({', '.join(_q(c) for c in key_cols)}) {action}"
        )
    if dialect == "ansi":
        on = " AND ".join(f"t.{_q(c)} = s.{_q(c)}" for c in key_cols)
        matched = (
            ""
            if insert_only
            else "WHEN MATCHED THEN UPDATE SET "
            + ", ".join(f"t.{_q(c)} = s.{_q(c)}" for c in update_cols)
            + " "
        )
        values = ", ".join(f"s.{_q(c)}" for c in columns)
        return (
            f"MERGE INTO {_q(target)} t USING {_q(staging)} s ON ({on}) "
            f"{matched}"
            f"WHEN NOT MATCHED THEN INSERT ({cols_q}) VALUES ({values})"
        )
    raise ValueError(f"unknown dialect: {dialect!r}")


def write_jdbc_upsert(
    df: DataFrame,
    jdbc_url: str,
    target: str,
    key_cols: list[str],
    *,
    staging: str | None = None,
    dialect: str = "ansi",
    insert_only: bool = False,
    write_options: dict[str, str] | None = None,
) -> str:
    """Upsert a DataFrame into a JDBC table: stage the batch with Spark's
    parallel JDBC writer (executors write partitions concurrently), then
    run ONE merge statement on the driver's connection.  Returns the
    executed merge SQL.

    This is the Spark re-expression of upsert_raw_document
    (postgres_store.py:126-184): the reference's per-row
    read-compare-upsert becomes staged bulk load + set-based merge —
    identical end state, O(1) round-trips instead of O(rows).  Pair with
    `write_changed_only` upstream to ship only non-SKIPPED rows.

    The staging table is per-invocation unique by default (two concurrent
    batches upserting the same target must not clobber each other's
    staged rows between stage and merge) and is dropped after the merge,
    success or failure."""
    staging = staging or f"{target}_stg_{uuid.uuid4().hex[:12]}"
    _q(target), _q(staging)  # validate before interpolating anywhere
    writer = (
        df.write.mode("overwrite")
        .format("jdbc")
        .option("url", jdbc_url)
        .option("dbtable", _q(staging))
    )
    for k, v in (write_options or {}).items():
        writer = writer.option(k, v)
    writer.save()
    sql = jdbc_merge_sql(
        target, staging, df.columns, key_cols, dialect=dialect, insert_only=insert_only
    )
    jvm = df.sparkSession._jvm
    # the merge connection must connect exactly like the staging write:
    # forward every connection-relevant option (credentials, ssl*,
    # timeouts, ...) — dropping them could fail the connection or
    # silently downgrade TLS.  Spark-writer-only keys are excluded; the
    # "driver" class is honored by loading it before DriverManager asks.
    if write_options and "driver" in write_options:
        jvm.java.lang.Class.forName(write_options["driver"])
    props = jvm.java.util.Properties()
    for k, v in (write_options or {}).items():
        if k.lower() not in _SPARK_WRITER_ONLY_OPTIONS:
            # setProperty is (String, String); Spark's writer coerces
            # ints/bools itself, so mirror that here
            props.setProperty(k, str(v))
    conn = jvm.java.sql.DriverManager.getConnection(jdbc_url, props)
    try:
        conn.createStatement().execute(sql)
    finally:
        try:
            conn.createStatement().execute(f"DROP TABLE {_q(staging)}")
        except Exception:  # noqa: BLE001 — best-effort cleanup; the merge
            pass           # outcome (or its exception) is what matters
        conn.close()
    return sql
