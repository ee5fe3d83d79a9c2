"""S1/S2 — `spark.read.format(...)` HTTP source as a Spark 4 Python
DataSource.

The reference's fetch layer is an aiohttp GET with a per-domain
semaphore (crawler/http_fetcher.py:40-56, 7-15).  As a DataSource it
becomes a first-class scan: URLs are grouped by domain into input
partitions (politeness is per-partition, so the ≤N-per-domain bound
holds cluster-wide without coordination), executors fetch in parallel,
and the result is an ordinary DataFrame feeding the extract pipeline.

Usage:
    spark.dataSource.register(HttpDataSource)
    df = (spark.read.format("http_fetch")
          .option("urls", "https://a.com/x,https://b.com/y")
          .option("per_domain", "2")
          .load())

Errors are data, never exceptions: a failed fetch yields
(url, NULL, "", error) — http_fetcher.py:55-56's (None, "") contract.
file:// URLs work too (how the tests exercise this without a network).
"""

from __future__ import annotations

SCHEMA_DDL = "url string, content binary, content_type string, error string"

try:
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    _HAVE_DATASOURCE = True
except ImportError:  # pragma: no cover — pyspark < 4
    _HAVE_DATASOURCE = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value


def _domain(url: str) -> str:
    # same normalization as fetch.py's politeness keying: www.ex.com and
    # ex.com must share ONE partition/semaphore, not double the budget
    try:
        return url.split("://", 1)[1].split("/", 1)[0].lower().removeprefix("www.")
    except IndexError:
        return url


class _HttpReader(DataSourceReader):
    def __init__(self, options):
        self.urls = [u.strip() for u in options.get("urls", "").split(",") if u.strip()]
        self.per_domain = int(options.get("per_domain", "2"))
        self.timeout_s = int(options.get("timeout_s", "20"))

    def partitions(self):
        """One input partition per domain: the politeness unit IS the
        parallelism unit (http_fetcher.py:7-15's semaphore-per-domain,
        made structural)."""
        by_domain: dict[str, list[str]] = {}
        for u in self.urls:
            by_domain.setdefault(_domain(u), []).append(u)
        return [InputPartition(urls) for urls in by_domain.values()]

    def read(self, partition):
        import threading
        from concurrent.futures import ThreadPoolExecutor

        from data_integration_system_spark.pipeline.fetch import default_http_fetch

        urls = partition.value
        sem = threading.Semaphore(self.per_domain)

        def one(url: str):
            with sem:
                body, ctype = default_http_fetch(url, timeout_s=self.timeout_s)
            err = "" if body is not None else "fetch_failed"
            return (url, body, ctype, err)

        with ThreadPoolExecutor(max_workers=max(self.per_domain, 1)) as pool:
            yield from pool.map(one, urls)


class HttpDataSource(DataSource):
    """format name: http_fetch"""

    @classmethod
    def name(cls) -> str:
        return "http_fetch"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> _HttpReader:
        return _HttpReader(self.options)
