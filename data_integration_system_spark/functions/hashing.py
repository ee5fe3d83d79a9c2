"""Content/URL hashing — the reference's identity scheme, as Spark columns.

Reference semantics (ported exactly, /root/reference/utils.py:11-20):

* ``hash_url``  : sha1(utf-8 url) hex — the stable row id for a page.
* ``hash_text`` : CRLF->LF, collapse ``\\s+`` to a single space, strip,
  sha256 hex — a whitespace-insensitive content hash used for skip/upsert
  decisions (filesystem_store.py:112-114, db/postgres_store.py:140-142).

All pure JVM-side expressions (whole-stage codegen, no Python in the hot
path); at 100 TB these run inside the scan's project node.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_ws(col: Column | str) -> Column:
    """Whitespace-normalize text exactly like the reference's hash_text
    prep (utils.py:16-18): CRLF->LF is subsumed by the \\s+ collapse."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def content_hash(col: Column | str) -> Column:
    """Whitespace-insensitive sha256 hex (utils.py:15-20)."""
    return F.sha2(normalize_ws(col), 256)


def url_hash(col: Column | str) -> Column:
    """sha1 hex of the URL string (utils.py:11-12)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha1(c)


def assign_split(
    key: Column | str,
    weights: dict[str, int],
    salt: str = "",
) -> Column:
    """Deterministic dataset-split assignment: map ``key`` to a named
    split with the given integer per-10000 weights (e.g. ``{"train":
    9800, "val": 100, "test": 100}``) — the train/val/test fencing a
    training-data release needs.

    sha256(salt:key)'s first 8 hex digits -> uniform bucket in
    [0, 10000): reproducible across engines, runs, partitionings, and
    cluster sizes (unlike randomSplit, whose RNG is partition-dependent,
    so adding an executor silently reshuffles the split).  ``salt``
    versions the assignment: a new salt re-rolls membership without
    touching the data.  Weights are integers out of 10000 so the split
    boundaries are exact — no float accumulation drift between engines.

    Scale shape: a scan-side projection (one hash per row, zero
    shuffle); the split column prunes at read time when used as a
    partition or cluster key."""
    total = sum(weights.values())
    if total != 10000:
        raise ValueError(f"split weights must sum to 10000, got {total}")
    col = F.col(key) if isinstance(key, str) else key
    bucket = F.conv(
        F.substring(F.sha2(F.concat(F.lit(salt), F.lit(":"), col.cast("string")), 256), 1, 8),
        16,
        10,
    ).cast("long") % 10000
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return expr
