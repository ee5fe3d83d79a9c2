"""S13 — batch backfill: filesystem store -> documents table.

The reference re-ingested its filesystem store into Postgres by looping
over `pages_index.json` and reading each text file one by one
(workers/raw_to_postgres.py:5-30, sequential, no dedup).  Here the same
shape is two distributed scans and one equi-join:

    index  = spark.read.json(pages_index.json)       (schema-on-read)
    texts  = spark.read.text(dir, wholetext)         (one row per file)
    docs   = index ⋈ texts ON path

plus the exact-dedup pass the reference *meant* to have (its
ON CONFLICT (content_hash) target didn't exist — SURVEY §1.3; we dedup
explicitly instead of replicating that bug).

At scale: both sides are splittable file scans; the join key (path) is
unique on both sides, so the join is a 1:1 hash join — broadcast the
index side when it's small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_integration_system_spark.functions.hashing import content_hash


def read_backfill(
    spark: SparkSession,
    index_json: str,
    text_dir: str,
    dedup_by_content: bool = True,
) -> DataFrame:
    """Join the JSON page index with its content-addressed text blobs.

    Returns (page_id, url, domain, depth, text, content_hash, text_len).
    With dedup_by_content (default), keeps the min-page_id row per
    content hash — the D6 first-writer-wins semantics the reference's
    broken `ON CONFLICT (content_hash)` intended (db/postgres_store.py:88).
    """
    index = spark.read.json(index_json)
    texts = (
        spark.read.text(text_dir, wholetext=True)
        .select(
            F.input_file_name().alias("file_uri"),
            F.col("value").alias("text"),
        )
        # input_file_name returns a URI; the index stores plain paths
        .withColumn("path", F.regexp_replace("file_uri", "^file:/*", "/"))
        .drop("file_uri")
    )
    docs = (
        F.broadcast(index)
        .join(texts, index.text_path == texts.path)
        .select(
            "page_id",
            "url",
            "domain",
            "depth",
            "text",
            content_hash(F.col("text")).alias("content_hash"),
            F.length("text").cast("long").alias("text_len"),
        )
    )
    if dedup_by_content:
        w = Window.partitionBy("content_hash").orderBy("page_id")
        docs = (
            docs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return docs
