"""Source-connector tests: the S13 backfill join and the http_fetch
DataSource (driven with file:// URLs — same code path as HTTP minus the
socket)."""

from __future__ import annotations

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from data_integration_system_spark.pipeline.extract import normalize_ws_py
from data_integration_system_spark.sources.backfill import read_backfill


@pytest.fixture(scope="module")
def site_store(tmp_path_factory):
    """A miniature filesystem store in the reference's layout: text blobs
    + pages_index.json (filesystem_store.py:201-211)."""
    root = tmp_path_factory.mktemp("site_store")
    texts = root / "pages" / "text"
    texts.mkdir(parents=True)
    records = []
    for i, (pid, body) in enumerate(
        [("p1", "hello world"), ("p2", "second page"), ("p3", "hello world")]
    ):
        p = texts / f"{pid}.txt"
        p.write_text(body)
        records.append(
            {
                "page_id": pid,
                "url": f"https://ex.com/{pid}",
                "domain": "ex.com",
                "depth": i,
                "text_path": str(p),
            }
        )
    idx = root / "pages_index.json"
    idx.write_text(json.dumps(records))
    return str(idx), str(texts)


def test_backfill_joins_index_and_text(spark, site_store):
    idx, tdir = site_store
    docs = read_backfill(spark, idx, tdir, dedup_by_content=False)
    got = {r.page_id: (r.text, r.text_len) for r in docs.collect()}
    assert got == {
        "p1": ("hello world", 11),
        "p2": ("second page", 11),
        "p3": ("hello world", 11),
    }
    h = docs.filter(F.col("page_id") == "p1").first().content_hash
    assert h == hashlib.sha256(normalize_ws_py("hello world").encode()).hexdigest()


def test_backfill_dedups_by_content(spark, site_store):
    idx, tdir = site_store
    docs = read_backfill(spark, idx, tdir)  # D6: first writer (min page_id) wins
    assert {r.page_id for r in docs.collect()} == {"p1", "p2"}


@pytest.fixture(scope="module")
def file_urls(tmp_path_factory):
    d = tmp_path_factory.mktemp("blobs")
    (d / "a.html").write_text("<html>alpha</html>")
    (d / "b.html").write_text("<html>beta</html>")
    return [f"file://{d}/a.html", f"file://{d}/b.html"]


def test_http_datasource_fetches_and_reports_errors(spark, file_urls):
    from data_integration_system_spark.sources.http_source import HttpDataSource

    spark.dataSource.register(HttpDataSource)
    urls = file_urls + ["file:///nonexistent/x.html"]
    df = (
        spark.read.format("http_fetch")
        .option("urls", ",".join(urls))
        .load()
    )
    rows = {r.url: r for r in df.collect()}
    assert len(rows) == 3
    assert bytes(rows[file_urls[0]].content) == b"<html>alpha</html>"
    assert rows[file_urls[0]].error == ""
    # errors-as-data (http_fetcher.py:55-56): failed fetch is a row
    bad = rows["file:///nonexistent/x.html"]
    assert bad.content is None and bad.error == "fetch_failed"


def test_jdbc_partitioned_read_embedded_derby(spark):
    """Stride-partitioned JDBC ingestion against the Derby DB Spark
    ships: bounds auto-probed with one aggregate round-trip, the scan
    splits into numPartitions parallel cursors, and rows outside the
    given bounds are still read (bounds are a parallelism hint, not a
    filter)."""
    from data_integration_system_spark.sources.jdbc_source import (
        read_jdbc_bounds,
        read_jdbc_partitioned,
    )

    jvm = spark._jvm
    url = "jdbc:derby:memory:jdbcsrc;create=true"
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE jobs (id BIGINT PRIMARY KEY, payload VARCHAR(50))")
    for i in range(100):
        st.execute(f"INSERT INTO jobs VALUES ({i}, 'p{i}')")

    assert read_jdbc_bounds(spark, url, "jobs", "id") == (0, 99)

    df = read_jdbc_partitioned(spark, url, "jobs", "id", num_partitions=4)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100

    # explicit narrow bounds: parallelism strides change, row coverage
    # must NOT (Spark widens the first/last stride to +-infinity)
    df2 = read_jdbc_partitioned(
        spark, url, "jobs", "id", num_partitions=4, lower=40, upper=60
    )
    assert df2.count() == 100

    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_jdbc_partitioned(spark, url, "jobs; DROP TABLE x", "id")


def test_catalog_sql_front_door(spark):
    """register_views + catalog.sql: raw-SQL users get the same data and
    the same scan-level pushdown as DataFrame users (the view is a lazy
    alias, not a materialization)."""
    from data_integration_system_spark.catalog import register_views, sql
    from data_integration_system_spark.plans.analyze import pushed_filters

    sf = "/root/testdata/sf0.001"
    names = register_views(spark, sf)
    assert "documents" in names and "lineitem" in names
    df = sql(
        spark, sf,
        "SELECT lang, count(*) AS n FROM documents "
        "WHERE n_chars > 100 GROUP BY lang",
    )
    assert df.count() > 0
    flt = pushed_filters(
        spark.sql("SELECT doc_id FROM documents WHERE n_chars > 100"),
        "documents",
    )
    assert any("n_chars" in f for f in flt)  # pushdown survives the view
    # events view carries the ts normalization: a timestamp function works
    assert sql(spark, sf, "SELECT max(date_trunc('day', ts)) AS d FROM events").head()["d"] is not None
