"""Fetch stage: URL frontier → (url, depth, content, content_type, charset).

Re-expresses S1 (HTTP GET, crawler/http_fetcher.py:40-56) + S2 (per-domain
politeness, http_fetcher.py:7-15,48) as a `mapInPandas` stage:

* The frontier is `repartition("domain")`-ed so each domain's URLs land
  together; inside a partition a bounded thread pool + per-domain
  semaphores reproduce the reference's ≤2-in-flight-per-domain rule.
  Catalyst cannot see a politeness constraint (SURVEY §4.2) — it lives
  here, isolated from all query paths.
* Errors are data: failed fetches yield (None, "", "") rows, the analog
  of http_fetcher.py:55-56's `(None, "")` return.
* The fetch callable is injectable so tests run a synthetic in-memory
  site; the default uses stdlib urllib with the reference's 20 s timeout.

At scale: fan-out = partitions × pool size, bounded per domain; a skewed
domain (one giant site) throttles only its own partition.
"""

from __future__ import annotations

import threading
from collections import defaultdict
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_integration_system_spark.functions.urls import domain_of

#: fetch(url) -> (body bytes | None, content_type)
FetchFn = Callable[[str], "tuple[bytes | None, str]"]

FETCHED_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("depth", LongType()),
        StructField("content", BinaryType()),
        StructField("content_type", StringType()),
        StructField("charset", StringType()),
    ]
)


def default_http_fetch(url: str, timeout_s: int = 20) -> tuple[bytes | None, str]:
    """Stdlib GET with the reference's timeout (http_fetcher.py:22,25);
    redirects followed, errors → (None, "")."""
    import urllib.request

    try:
        req = urllib.request.Request(url, headers={"User-Agent": "dis-spark/1.0"})
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310
            return resp.read(), resp.headers.get("Content-Type", "") or ""
    except Exception:
        return None, ""


def _charset_of(content_type: str) -> str:
    for part in content_type.split(";"):
        part = part.strip()
        if part.lower().startswith("charset="):
            return part.split("=", 1)[1].strip()
    return ""


def fetch_frontier(
    frontier: DataFrame,
    fetch_fn: FetchFn = default_http_fetch,
    per_domain: int = 2,
    pool_size: int = 8,
) -> DataFrame:
    """(url, depth) frontier → fetched rows.  Partitioned by domain;
    per-domain Semaphore(per_domain) inside each partition mirrors
    HttpFetcher(per_domain=2) (http_fetcher.py:7-15,23)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        sems: dict[str, threading.Semaphore] = defaultdict(
            lambda: threading.Semaphore(per_domain)
        )

        def one(url: str) -> tuple[bytes | None, str]:
            # normalize like domain_of (lowercase, strip www.) — keying
            # on the raw host would give WWW.Ex.com and ex.com separate
            # semaphores, doubling the per-site budget
            dom = url.split("/")[2].lower() if "://" in url else url.lower()
            dom = dom.removeprefix("www.")
            with sems[dom]:
                return fetch_fn(url)

        for pdf in batches:
            if pdf.empty:
                continue
            with ThreadPoolExecutor(max_workers=pool_size) as pool:
                results = list(pool.map(one, pdf["url"]))
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "depth": pdf["depth"].astype("int64"),
                    "content": [r[0] for r in results],
                    "content_type": [r[1] for r in results],
                    "charset": [_charset_of(r[1]) for r in results],
                }
            )

    partitioned = frontier.repartition(domain_of(F.col("url")))
    return partitioned.select("url", "depth").mapInPandas(run, FETCHED_SCHEMA)
