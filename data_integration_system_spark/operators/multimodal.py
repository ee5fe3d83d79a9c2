"""Multimodal column plumbing (north-star tier).

Images/audio/video are opaque `binary` columns with typed metadata; the
decode / feature-extract step is a Pandas-UDF stage over `mapInPandas`
(Arrow batches — the only sane way to move binary blobs through Python).
The actual codec libraries aren't in this container, so decode is a
clearly-marked deterministic STUB (`_fake_decode`), but everything
Spark-side — schema, batch shape, partitioning, the mapInPandas contract
— is real and oracle-checked: the stub's outputs are pure functions of
the payload bytes, which DuckDB can recompute from the source text.

Scale notes: binary payloads ride in Arrow record batches; keep
`spark.sql.files.maxPartitionBytes` sized so a batch of blobs fits
executor memory, and push metadata-only predicates (size caps, F9)
BEFORE the decode stage so skipped blobs are never shipped to Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_integration_system_spark.catalog import table
from data_integration_system_spark.registry import query

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("fmt", StringType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB for the image-decode step (no codec libs in this container).

    Deterministic pure function of the payload so the pipeline is
    testable end-to-end; swap with PIL/libvips in production:
        img = PIL.Image.open(io.BytesIO(payload)); return img.size, img.format
    """
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, "png" if n % 2 == 0 else "jpeg"


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary payload column -> typed metadata rows.
    Errors would be captured as data columns, never raised (the
    reference's errors-as-data contract, file_ingestion.py:61-63)."""
    for pdf in batches:
        meta = [_fake_decode(b) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [len(b) for b in pdf["payload"]],
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "fmt": [m[2] for m in meta],
            }
        )


@query(
    "multimodal_decode_meta",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(strlen(text) % 640 + 1 AS BIGINT) AS width,
           CAST(strlen(text) % 480 + 1 AS BIGINT) AS height,
           CASE WHEN strlen(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt
    FROM documents
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star multimodal plumbing: text re-encoded as a binary payload
    column (standing in for image bytes), decoded to typed metadata by a
    mapInPandas stage. The oracle recomputes the stub's metadata from the
    source bytes — so the Arrow round-trip, schema, and batch handling
    are genuinely correctness-checked, even though the codec is stubbed."""
    docs = table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    ).repartition(8, "doc_id")
    return payloads.mapInPandas(decode_batches, DECODED_SCHEMA)
