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
