"""Relational core: scans, filters, projections, aggregation (SURVEY §2B
Q1-Q10, Q16-Q19 + Q8b/Q8c/Q30).

Every query here is a pure declarative DataFrame plan — Catalyst pushes the
filters and prunes the columns into the parquet scan (verify with
``.explain``: PushedFilters / ReadSchema), and whole-stage codegen runs the
expressions JVM-side.  At 100 TB these are scan-dominated, embarrassingly
parallel, zero-shuffle (aggregations shuffle once on their grouping keys
with map-side partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_system_spark.catalog import table
from data_integration_system_spark.functions.hashing import content_hash
from data_integration_system_spark.functions.urls import domain_of, is_blocked_ext
from data_integration_system_spark.registry import query

# Synthetic URL built over documents.source so the URL-shaped operators
# (blocklist F1, domain extraction P1) are exercised on the oracle tables.
# CASE keeps it deterministic; both engines build the identical string.
_EXT_CASE_SQL = """CASE doc_id % 5
        WHEN 0 THEN '.png' WHEN 1 THEN '.pdf' WHEN 2 THEN '.js'
        WHEN 3 THEN '.txt' ELSE '.css' END"""


def _doc_url(df: DataFrame) -> DataFrame:
    ext = (
        F.when(F.col("doc_id") % 5 == 0, ".png")
        .when(F.col("doc_id") % 5 == 1, ".pdf")
        .when(F.col("doc_id") % 5 == 2, ".js")
        .when(F.col("doc_id") % 5 == 3, ".txt")
        .otherwise(".css")
    )
    url = F.concat(
        F.lit("https://WWW."), F.col("source"), F.lit(".example.com/files/doc"),
        F.col("doc_id").cast("string"), ext, F.lit("?dl=1"),
    )
    return df.withColumn("url", url)


_DOC_URL_SQL = (
    "'https://WWW.' || source || '.example.com/files/doc' || CAST(doc_id AS VARCHAR) || "
    + _EXT_CASE_SQL
    + " || '?dl=1'"
)


@query(
    "scan_project",
    oracle="SELECT doc_id, lang, source, n_chars FROM documents",
)
def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 — source scan + projection (reference: reading the pages index,
    storage/filesystem_store.py:48-70; field selection of models.py:43-57).

    Column pruning reaches the scan: ReadSchema lists only the 4 columns.
    """
    return table(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")


@query(
    "filter_blocklist",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_DOC_URL_SQL} AS url FROM documents)
    SELECT doc_id, url FROM u
    WHERE lower(regexp_extract(regexp_replace(url, '[?#].*$', ''), '(\\.[^./\\\\]+)$', 1))
          NOT IN ('.js', '.css', '.png')
    """,
)
def filter_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 — F1 static-extension blocklist (crawler_core.py:15-24): drop
    asset URLs before any further work (manual pushdown in the reference;
    Catalyst pushes the derived-column predicate automatically here)."""
    docs = _doc_url(table(spark, sf_dir, "documents"))
    return docs.filter(~is_blocked_ext(F.col("url"))).select("doc_id", "url")


@query(
    "filter_scope",
    oracle="""
    SELECT event_id, user_id, value FROM events
    WHERE event_type = 'click' AND user_id BETWEEN 2 AND 10 AND value > 50.0
    """,
)
def filter_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 — F2+F4 compound scope predicate (domain + depth gates,
    crawler_core.py:81-93) as a multi-clause filter; all three conjuncts
    reach the parquet scan as PushedFilters."""
    ev = table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("event_type") == "click")
        & F.col("user_id").between(2, 10)
        & (F.col("value") > 50.0)
    ).select("event_id", "user_id", "value")


@query(
    "filter_size_cap",
    oracle="SELECT doc_id, n_chars FROM documents WHERE n_chars <= 300",
)
def filter_size_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 — F9 size cap (file_ingestion.py:79-80: len(data) > max -> skip),
    as a pushed-down comparison on the stored size column."""
    docs = table(spark, sf_dir, "documents")
    return docs.filter(F.col("n_chars") <= 300).select("doc_id", "n_chars")


@query(
    "project_domain",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_DOC_URL_SQL} AS url FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
                          '^www\\.', '') AS domain
    FROM u
    """,
)
def project_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 — P1 domain extraction (utils.py:6-8): lowercase host, strip
    leading www. (unifying the api/main.py:40-41 variant, SURVEY §2A P10)."""
    docs = _doc_url(table(spark, sf_dir, "documents"))
    return docs.select("doc_id", domain_of(F.col("url")).alias("domain"))


@query(
    "project_content_hash",
    oracle=r"""
    SELECT doc_id,
           sha256(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS content_hash
    FROM documents
    """,
)
def project_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 — P3 whitespace-normalized sha256 (utils.py:15-20): CRLF->LF,
    collapse \\s+, strip, sha256 hex. The identity every dedup/upsert
    operator keys on."""
    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", content_hash(F.col("text")).alias("content_hash"))


@query(
    "agg_counts_by_group",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           ROUND(AVG(n_chars), 2) AS avg_chars
    FROM documents GROUP BY lang, source
    """,
)
def agg_counts_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 — A1 report counts (filesystem_store.py:211) generalized to a
    grouped hash aggregation. One shuffle on the grouping keys with
    map-side partial agg; AQE coalesces the post-shuffle partitions."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT lang, source,
           CAST(GROUPING(lang, source) AS BIGINT) AS g_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY ROLLUP (lang, source)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8b — rollup completeness (the Postgres surface the reference sits
    on supports grouping sets; SURVEY §2A 'Aggregations' note)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.rollup("lang", "source")
        .agg(
            F.grouping_id().cast("long").alias("g_id"),
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .select("lang", "source", "g_id", "n_docs", "sum_chars")
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8c — COUNT(DISTINCT) per group. Spark plans this as a two-phase
    expand + aggregate; exact (Q30 is the approx HLL variant)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))


@query(
    "topk_oldest_pending",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderstatus = 'O'
    ORDER BY o_orderdate, o_orderkey LIMIT 10
    """,
)
def topk_oldest_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 — A2/S14 job pick: oldest PENDING first (db/postgres_store.py:
    32-39 ORDER BY created_at LIMIT 1), generalized to top-N with a
    total-order tie-break. Spark runs this as TakeOrderedAndProject —
    no global sort materializes."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "O")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )


@query(
    "stale_timeout_filter",
    oracle="""
    SELECT event_id, user_id, ts FROM events
    WHERE ts < (SELECT max(ts) FROM events) - INTERVAL 7 DAY
    """,
)
def stale_timeout_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 — F11 stale-job predicate (db/postgres_store.py:58-68:
    updated_at < NOW() - interval). 'Now' is pinned to max(ts) so the
    query is deterministic. The 1-row aggregate is broadcast, so the
    filter still pushes down to a scan + broadcast-nested-loop."""
    ev = table(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("cutoff"))
    return (
        ev.crossJoin(F.broadcast(cutoff))
        .filter(F.col("ts") < F.col("cutoff"))
        .select("event_id", "user_id", "ts")
    )


@query(
    "union_pages_files",
    oracle="""
    SELECT doc_id, 'short' AS kind, n_chars FROM documents WHERE n_chars < 200
    UNION ALL
    SELECT doc_id, 'long' AS kind, n_chars FROM documents WHERE n_chars >= 200
    """,
)
def union_pages_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 — A3 partition-by-predicate then recombine (crawler_core.py:
    182-193 splits links into clean vs file streams). unionByName is a
    zero-shuffle concatenation of the two filtered scans."""
    docs = table(spark, sf_dir, "documents")
    short = docs.filter(F.col("n_chars") < 200).select(
        "doc_id", F.lit("short").alias("kind"), "n_chars"
    )
    long_ = docs.filter(F.col("n_chars") >= 200).select(
        "doc_id", F.lit("long").alias("kind"), "n_chars"
    )
    return short.unionByName(long_)


@query(
    "set_ops",
    oracle="""
    SELECT 'both' AS op, user_id FROM
      (SELECT user_id FROM events WHERE event_type = 'click'
       INTERSECT
       SELECT user_id FROM events WHERE event_type = 'purchase')
    UNION ALL
    SELECT 'click_only' AS op, user_id FROM
      (SELECT user_id FROM events WHERE event_type = 'click'
       EXCEPT
       SELECT user_id FROM events WHERE event_type = 'purchase')
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 — set-op completeness: INTERSECT / EXCEPT (distinct semantics
    on both engines)."""
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    both = clicks.intersect(buys).select(F.lit("both").alias("op"), "user_id")
    only = clicks.subtract(buys).select(F.lit("click_only").alias("op"), "user_id")
    return both.unionByName(only)


@query(
    "json_config_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
)
def json_config_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 — P11 JSONB unpack (api/main.py:52-69 packs config to JSON;
    worker_daemon.py:35-40 schema-on-reads it back). get_json_object is
    a codegen'd JSON path walk — no Python."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.select("event_id", k.alias("k_val")).filter(F.col("k_val") > 50)


@query(
    "string_metrics",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_len,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) AS src_num
    FROM documents
    """,
)
def string_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 — P9 length metrics (text_len / size_bytes, filesystem_store.py:
    93,182) + P4-style suffix extraction. Integer outputs cast to BIGINT on
    both sides per the registry's type discipline."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_len"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        F.regexp_extract("source", r"([0-9]+)$", 1).cast("long").alias("src_num"),
    )


@query("approx_distinct", oracle=None)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q30 — approx_count_distinct (HyperLogLog++). The 100 TB answer to
    Q8c: constant memory per group, one shuffle of sketches instead of an
    Expand of raw values. Approx by design -> rows-only check."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("n_users_approx")
    )


_LANGS = ("de", "en", "es", "fr", "zh")


@query(
    "pivot_lang_counts",
    oracle="""
    SELECT source,
           count(*) FILTER (WHERE lang = 'de') AS de,
           count(*) FILTER (WHERE lang = 'en') AS en,
           count(*) FILTER (WHERE lang = 'es') AS es,
           count(*) FILTER (WHERE lang = 'fr') AS fr,
           count(*) FILTER (WHERE lang = 'zh') AS zh
    FROM documents GROUP BY source
    """,
)
def pivot_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide pivot: per-source doc counts, one column per language
    (the report shape every corpus dashboard wants).

    The value list is EXPLICIT: `pivot(col)` without values runs a
    whole extra distinct-scan job just to learn the columns — at 100 TB
    that is a second pass over the corpus for metadata you already know.
    With the list given, this is a single hash aggregation."""
    docs = table(spark, sf_dir, "documents")
    piv = docs.groupBy("source").pivot("lang", list(_LANGS)).count()
    return piv.select(
        "source",
        *[F.coalesce(F.col(lg), F.lit(0)).alias(lg) for lg in _LANGS],
    )


@query(
    "agg_cube_events",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CASE WHEN value >= 50 THEN 'high' ELSE 'low' END AS band,
             value
      FROM events
    )
    SELECT coalesce(event_type, 'ALL') AS event_type,
           coalesce(band, 'ALL') AS band,
           count(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM e GROUP BY CUBE(event_type, band)
    """,
)
def agg_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 completion alongside Q8b's ROLLUP: full CUBE over
    (event_type, value band) — all four grouping-set combinations in one
    Expand + single aggregation shuffle (not four scans).  Decimal-sum
    discipline from _common keeps the double SUM hash-stable."""
    from data_integration_system_spark.operators._common import money_sum

    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.when(F.col("value") >= 50, "high").otherwise("low").alias("band"),
        "value",
    )
    return (
        ev.cube("event_type", "band")
        .agg(F.count("*").alias("n"), money_sum("value").alias("sum_value"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("band", F.lit("ALL")).alias("band"),
            "n",
            "sum_value",
        )
    )


@query(
    "orders_above_customer_avg",
    oracle="""
    WITH a AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                    OVER (PARTITION BY o_custkey) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_custkey) AS cavg
      FROM orders
    )
    SELECT o_orderkey, o_custkey,
           ROUND(o_totalprice, 2) AS totalprice,
           CAST(FLOOR(cavg * 100) AS BIGINT) AS cust_avg_cents
    FROM a WHERE o_totalprice > 1.5 * cavg
    """,
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated-subquery classic (orders 1.5x above their
    customer's average), decorrelated into ONE window pass — the shape
    Catalyst rewrites `WHERE price > (SELECT avg .. correlated)` into
    anyway, written directly so there's a single shuffle on o_custkey
    and no join.  Exact decimal sum /count keeps the threshold
    bit-identical across engines, so the > filter can't flip rows; the
    reported average is floor-of-cents because ROUND on a double diverges
    between engines at .xx5 boundaries (FLOOR of the identical double
    cannot)."""
    from pyspark.sql import Window

    from data_integration_system_spark.operators._common import dec

    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    cavg = F.sum(dec("o_totalprice")).over(w).cast("double") / F.count("*").over(w)
    return (
        orders.select(
            "o_orderkey", "o_custkey", "o_totalprice", cavg.alias("cavg")
        )
        .filter(F.col("o_totalprice") > 1.5 * F.col("cavg"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.floor(F.col("cavg") * 100).cast("long").alias("cust_avg_cents"),
        )
    )


@query(
    "event_zscore_outliers",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
             CAST(SUM(CAST(value AS DECIMAL(18,4))
                      * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sq
      FROM events GROUP BY event_type
    ), z AS (
      SELECT e.event_id, e.event_type, e.value,
             (e.value - m.s / m.n)
               / sqrt((m.sq - (m.s / m.n) * m.s) / (m.n - 1)) AS zval
      FROM events e JOIN m USING (event_type)
    )
    SELECT event_id, event_type, value,
           CAST(FLOOR(zval * 1000) AS BIGINT) AS z_e3
    FROM z WHERE abs(zval) > 3
    """,
)
def event_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly flagging: events whose value is more than 3 sample
    standard deviations from their event_type's mean.  Moments come from
    exact DECIMAL sums (order-independent, engine-identical) and the
    mean/variance/sqrt are then evaluated in doubles with an identical
    expression tree on both engines, so even the derived z-scores hash
    exactly — no stddev_samp, whose merge order is engine-specific.

    Scale shape: one map-side-combined agg shuffle to get per-type
    moments (|event_types| rows), broadcast back over a second scan —
    the corpus is read twice but never shuffled, which beats a window
    over event_type (one full shuffle + spill) at any real scale."""
    ev = table(spark, sf_dir, "events")
    vdec = F.col("value").cast("decimal(18,4)")
    m = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(vdec).cast("double").alias("s"),
        F.sum(vdec * vdec).cast("double").alias("sq"),
    )
    mean = F.col("s") / F.col("n")
    z = (F.col("value") - mean) / F.sqrt(
        (F.col("sq") - mean * F.col("s")) / (F.col("n") - 1)
    )
    return (
        ev.join(F.broadcast(m), "event_type")
        .withColumn("zval", z)
        .filter(F.abs(F.col("zval")) > 3)
        .select(
            "event_id",
            "event_type",
            "value",
            F.floor(F.col("zval") * 1000).cast("long").alias("z_e3"),
        )
    )


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                               * (1 - CAST(l_discount AS DECIMAL(18,4)))
                               AS DECIMAL(18,4))
                          * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2)
                AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 2) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(*), 2) AS avg_price,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical pricing summary report — per
    (returnflag, linestatus) sums/averages over almost the whole fact.

    Scale plan: THE map-side-combine showcase.  Six aggregates over 6
    groups means partial aggregation collapses each input partition to
    ≤6 rows before the exchange — the shuffle moves O(groups ×
    partitions) rows regardless of fact size, and the date filter still
    pushes to the scan.

    Determinism: disc_price and charge multiply in DECIMAL space with
    each FACTOR quantized first — a double product cast to decimal
    tie-breaks differently between engines (Java shortest-repr HALF_UP
    vs binary scaling), and over ~10k rows per group that drifts a
    cent.  Exact decimal factors make the product itself exact, so both
    engines sum identical values; averages per _common.mean2."""
    from data_integration_system_spark.operators._common import dec, mean2, money_sum

    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    one = F.lit(1)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price.cast("decimal(18,4)") * (one + dec("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            mean2("l_quantity").alias("avg_qty"),
            mean2("l_extendedprice").alias("avg_price"),
            F.count("*").cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue increase from hypothetically eliminating
    small-quantity discounts — a pure filter + one global sum.

    Scale plan: every predicate (date range, discount band, quantity
    cap) pushes into the parquet scan as PushedFilters, so row groups
    outside the year are never read; the single-row aggregate needs no
    shuffle at all beyond the final partial-merge.  The cheapest
    possible 100 TB query — IF the filters actually reach the scan,
    which tests/test_plans.py pins."""
    from data_integration_system_spark.operators._common import money_sum

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue")
    )


def _col_stats_oracle(col: str) -> str:
    return f"""
    SELECT '{col}' AS col,
           CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
           CAST(FLOOR(min({col}) * 100) AS BIGINT) AS min_e2,
           CAST(FLOOR(max({col}) * 100) AS BIGINT) AS max_e2
    FROM lineitem"""


_STATS_COLS = (
    "l_orderkey", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_discount",
)


@query(
    "column_stats_lineitem",
    oracle="\nUNION ALL\n".join(_col_stats_oracle(c) for c in _STATS_COLS)
    + "\nORDER BY col",
)
def column_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics for the fact table: null
    count, exact distinct count, floor-scaled min/max — the stats a
    cost-based optimizer (or a data-quality monitor) collects.

    Scale shape: one aggregation PER COLUMN, unioned — six narrow
    columnar scans with map-side combine and NO Expand (a single
    multi-column COUNT(DISTINCT) pass would replicate every row 6× by
    grouping-set expansion; independent one-column passes each read only
    their own column's pages and parallelize freely).  At 100 TB swap
    the exact distinct for approx_count_distinct (HLL, one pass, no
    per-column rescans) — exact is kept here because the driver's
    correctness gate hashes values."""
    li = table(spark, sf_dir, "lineitem")
    parts = [
        li.agg(
            F.lit(c).alias("col"),
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_nulls"),
            F.countDistinct(c).cast("long").alias("n_distinct"),
            F.floor(F.min(F.col(c) * 100)).cast("long").alias("min_e2"),
            F.floor(F.max(F.col(c) * 100)).cast("long").alias("max_e2"),
        )
        for c in _STATS_COLS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("col")


@query(
    "weekday_order_stats",
    oracle="""
    SELECT CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_total,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    GROUP BY iso_dow ORDER BY iso_dow
    """,
)
def weekday_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order volume by ISO weekday — the date-part analytics family
    (seasonality / load profiling).  Weekday numbering is the cross-
    engine trap: Spark's ``weekday`` is 0=Monday, DuckDB's ``isodow`` is
    1=Monday — normalized here to ISO (1=Monday..7=Sunday) explicitly.

    Scale shape: one 7-group aggregation with map-side partials; the
    single-column distinct is the standard two-phase expand over a
    7-key space (bounded, unlike a high-cardinality multi-distinct)."""
    from data_integration_system_spark.operators._common import money_sum

    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy((F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            money_sum("o_totalprice").alias("sum_total"),
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
        )
        .orderBy("iso_dow")
    )


@query(
    "quantity_price_correlation",
    oracle="""
    WITH v AS (
      SELECT l_returnflag,
             CAST(FLOOR(l_quantity * 100) AS BIGINT) AS x,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM v GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CAST(FLOOR((n * sxy - sx * sy)
                      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                      * 1000000) AS BIGINT) AS corr_e6
    FROM m ORDER BY l_returnflag
    """,
)
def quantity_price_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return flag
    — the statistical-aggregate family (corr/covar), computed from exact
    integer co-moments instead of the built-in corr().

    Built-in corr's partial-merge order differs between engines (and
    between runs), perturbing the last bits.  Correlation is affine-
    invariant, so both variables quantize EXACTLY to integer hundredths
    (prices are 2-decimal, quantities integral) and the five co-moments
    sum in exact integer space (decimal(38,0) accumulators Spark-side so
    a 100 TB fact cannot overflow a long); only the closed form runs in
    doubles — on identical inputs, identically.  One map-side-combined
    shuffle over 3 groups; the corpus is scanned once."""
    li = table(spark, sf_dir, "lineitem")
    x = F.floor(F.col("l_quantity") * 100).cast("long")
    y = F.floor(F.col("l_extendedprice") * 100).cast("long")
    big = "decimal(38,0)"
    m = li.select(
        "l_returnflag", x.alias("x"), y.alias("y")
    ).groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("x").cast(big)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(big)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(big)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(big)).cast("double").alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast(big)).cast("double").alias("sxy"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        m.select(
            "l_returnflag",
            "n",
            F.floor(corr * 1000000).cast("long").alias("corr_e6"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "salted_event_type_rollup",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def salted_event_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type rollup computed through the SALTED two-phase
    aggregation (functions/skew.salted_agg) — the skew-mitigation path
    as a driver-checked query: event streams are Zipf-skewed (one hot
    event_type can stall a 1000-executor stage), and salting is
    semantics-preserving, so the result hashes identically to the plain
    GROUP BY oracle.

    Scale shape: phase 1 aggregates on (event_type, salt) — the hot
    key's rows spread over 8 reducers — and phase 2 combines |keys|×8
    partials on the key alone.  The summed column is pre-cast to exact
    DECIMAL, so the extra combine step cannot reorder a double sum; the
    salt column never leaves phase 1."""
    from data_integration_system_spark.functions.skew import salted_agg
    from data_integration_system_spark.operators._common import dec

    ev = table(spark, sf_dir, "events").select(
        "event_type", dec("value").alias("value_dec")
    )
    # "count" ignores its column key (counts rows); "sum" is exact decimal
    out = salted_agg(ev, "event_type", {"value_dec": "sum", "n": "count"})
    # salted_agg's count lands under `count`; decimal sum under sum_value_dec
    return (
        out.select(
            "event_type",
            F.col("count").cast("long").alias("n_events"),
            F.round(F.col("sum_value_dec"), 2).cast("double").alias("sum_value"),
        )
        .orderBy("event_type")
    )


@query(
    "lang_source_grouping_sets",
    oracle="""
    SELECT CAST(GROUPING(lang) AS BIGINT) AS g_lang,
           CAST(GROUPING(source) AS BIGINT) AS g_source,
           coalesce(lang, '(all)') AS lang,
           coalesce(source, '(all)') AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), (lang, source))
    ORDER BY g_lang, g_source, lang, source
    """,
)
def lang_source_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the third grouping-set variant beyond
    agg_rollup/agg_cube_events: exactly the (lang), (source),
    (lang, source) slices, no grand total, with GROUPING() flags so
    consumers can tell a real NULL from a super-aggregate row (the
    flags also make the coalesced '(all)' labels unambiguous).

    Scale shape: one Expand (×3 — the declared sets, nothing more,
    unlike CUBE's 2^n) followed by a single map-side-combined
    aggregation shuffle; the scan reads only (lang, source, n_chars)."""
    docs = table(spark, sf_dir, "documents")
    docs.select("lang", "source", "n_chars").createOrReplaceTempView(
        "_gs_docs"
    )
    return spark.sql(
        """
        SELECT CAST(GROUPING(lang) AS BIGINT) AS g_lang,
               CAST(GROUPING(source) AS BIGINT) AS g_source,
               coalesce(lang, '(all)') AS lang,
               coalesce(source, '(all)') AS source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM _gs_docs
        GROUP BY GROUPING SETS ((lang), (source), (lang, source))
        ORDER BY g_lang, g_source, lang, source
        """
    )


@query(
    "discount_band_pivot",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             CASE WHEN CAST(round(l_discount * 100) AS BIGINT) <= 3 THEN 'low'
                  WHEN CAST(round(l_discount * 100) AS BIGINT) <= 6 THEN 'mid'
                  ELSE 'high' END AS band,
             l_quantity
      FROM lineitem
    )
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN band = 'low' THEN l_quantity ELSE 0 END)
                AS BIGINT) AS low,
           CAST(SUM(CASE WHEN band = 'mid' THEN l_quantity ELSE 0 END)
                AS BIGINT) AS mid,
           CAST(SUM(CASE WHEN band = 'high' THEN l_quantity ELSE 0 END)
                AS BIGINT) AS high
    FROM b GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def discount_band_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crosstab report via the DataFrame `pivot` API: total quantity per
    return flag × discount band (low ≤3%, mid 4-6%, high ≥7%) — the
    long-to-wide reshape every BI layer needs, here with EXPLICIT pivot
    values so Spark skips the extra distinct-values job (the oracle is
    the equivalent CASE-WHEN conditional aggregate).

    Banding rounds l_discount×100 to an integer first — the data is 2dp
    so the double product sits within 1 ulp of the integer and both
    engines round it identically; quantities are integral doubles, so
    the BIGINT sums are exact.

    Scale shape: pivot-with-values compiles to TWO chained aggregates —
    sum on the (flag, band) grain, then pivotfirst folding bands into
    array slots on the flag grain — both map-side combined; the second
    exchange moves only the already-reduced |flags × bands| grain, so
    the fact is shuffled once (as partials) like any plain groupBy."""
    li = table(spark, sf_dir, "lineitem")
    pct = F.round(F.col("l_discount") * 100).cast("long")
    band = (
        F.when(pct <= 3, "low").when(pct <= 6, "mid").otherwise("high")
    )
    return (
        li.select("l_returnflag", band.alias("band"), "l_quantity")
        .groupBy("l_returnflag")
        .pivot("band", ["low", "mid", "high"])
        .agg(F.sum("l_quantity"))
        # cast AFTER the pivot (pivot agg wants a bare aggregate) and
        # coalesce: an absent (flag, band) cell is NULL here but 0 in the
        # oracle's conditional sum
        .select(
            "l_returnflag",
            *[
                F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
                for c in ("low", "mid", "high")
            ],
        )
        .orderBy("l_returnflag")
    )


@query("percentile_approx_check", oracle=None)  # rows-only BY DESIGN: the
# GK sketch inside percentile_approx is engine-specific (same class as
# approx_distinct's HLL) — the value here is the MEASUREMENT itself
def percentile_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximation-quality harness for percentile_approx: per market
    segment, the exact interpolated median (integer cents) next to the
    sketch median and their absolute error — the percentile sibling of
    `similarity_recall_at_k` (every approximate operator in the engine
    ships with a query that MEASURES it, so the accuracy knob has a
    number attached before anyone trusts it at scale).

    tests/test_scale_patterns.py pins the error floor (≤1% of the exact
    median at accuracy=10000).

    Scale shape: both aggregates ride one segment-keyed shuffle with
    per-partition buffers; percentile_approx is the one that still works
    when a group no longer fits sort memory — this report is what
    justifies switching to it."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.floor(F.expr(f"percentile({cents}, 0.5)"))
            .cast("long")
            .alias("exact_median_cents"),
            F.expr(f"percentile_approx({cents}, 0.5, 10000)")
            .cast("long")
            .alias("approx_median_cents"),
        )
        .withColumn(
            "abs_err_cents",
            F.abs(F.col("exact_median_cents") - F.col("approx_median_cents")),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "event_value_mad",
    oracle="""
    WITH v AS (
      SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ), m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(FLOOR(quantile_cont(cents, 0.5)) AS BIGINT) AS median_cents
      FROM v GROUP BY event_type
    )
    SELECT v.event_type, m.n_events, m.median_cents,
           CAST(FLOOR(quantile_cont(abs(v.cents - m.median_cents), 0.5))
                AS BIGINT) AS mad_cents
    FROM v JOIN m ON m.event_type = v.event_type
    GROUP BY v.event_type, m.n_events, m.median_cents
    ORDER BY v.event_type
    """,
)
def event_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion: median absolute deviation of event value per
    type — the outlier-resistant sibling of `event_zscore_outliers`'
    mean/stddev moments (one stuck sensor can't move a MAD the way it
    moves a σ).

    Determinism: the center is the FLOORED median (integer cents), so
    deviations are exact integers and the second percentile interpolates
    over integers — the `segment_median_order` rule applied twice.

    Scale shape: two passes over the fact, both keyed on event_type with
    per-partition percentile buffers; the per-type medians are a
    |types|-row broadcast back into the scan, so pass two shuffles
    partials only — no sort, no window."""
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").alias("cents"),
    )
    m = v.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.floor(F.expr("percentile(cents, 0.5)")).cast("long").alias("median_cents"),
    )
    return (
        v.join(F.broadcast(m), "event_type")
        .groupBy("event_type", "n_events", "median_cents")
        .agg(
            F.floor(F.expr("percentile(abs(cents - median_cents), 0.5)"))
            .cast("long")
            .alias("mad_cents")
        )
        .orderBy("event_type")
    )


@query(
    "event_type_gini_per_user",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ), u AS (
      SELECT user_id,
             CAST(SUM(n) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(SUM(n * n) AS BIGINT) AS ss
      FROM c GROUP BY user_id
    )
    SELECT user_id, n_events, n_types,
           CAST((n_events * n_events - ss) * 1000000
                // (n_events * n_events) AS BIGINT) AS gini_e6
    FROM u ORDER BY user_id
    """,
)
def event_type_gini_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity: per-user Gini impurity of the event-type mix
    (1 − Σpᵢ², 0 = single-type user, →1 = uniform spread) — the
    user-segmentation signal for "explorers vs single-feature users".

    Entropy needs log(); Gini is the log-free diversity index, and its
    sum-of-squares form is pure integers (×10⁶, `div`), so the driver
    hash is exact — the same no-libm discipline as rare_token_score.

    Scale shape: two chained aggregations, (user, type) then user — the
    first absorbs event multiplicity map-side, the second is co-keyed
    with it (AQE-coalesced, no extra wide shuffle)."""
    ev = table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    u = c.groupBy("user_id").agg(
        F.sum("n").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("ss"),
    )
    return u.select(
        "user_id",
        "n_events",
        "n_types",
        F.expr("(n_events * n_events - ss) * 1000000 div (n_events * n_events)")
        .cast("long")
        .alias("gini_e6"),
    ).orderBy("user_id")


@query(
    "discount_band_unpivot",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             CASE WHEN CAST(round(l_discount * 100) AS BIGINT) <= 3 THEN 'low'
                  WHEN CAST(round(l_discount * 100) AS BIGINT) <= 6 THEN 'mid'
                  ELSE 'high' END AS band,
             l_quantity
      FROM lineitem
    ), wide AS (
      SELECT l_returnflag,
             CAST(SUM(CASE WHEN band = 'low' THEN l_quantity ELSE 0 END)
                  AS BIGINT) AS low,
             CAST(SUM(CASE WHEN band = 'mid' THEN l_quantity ELSE 0 END)
                  AS BIGINT) AS mid,
             CAST(SUM(CASE WHEN band = 'high' THEN l_quantity ELSE 0 END)
                  AS BIGINT) AS high
      FROM b GROUP BY l_returnflag
    )
    SELECT l_returnflag, band, qty
    FROM wide
    UNPIVOT (qty FOR band IN (low, mid, high))
    ORDER BY l_returnflag, band
    """,
)
def discount_band_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse reshape of `discount_band_pivot`: the wide band
    columns melted back to (flag, band, qty) long form — the
    wide→long half of the BI reshape pair, via Spark's `unpivot`
    (ids/values/variable/value API) against DuckDB's UNPIVOT clause.

    Composes the registered pivot query verbatim, so the pair is
    provably lossless: unpivot(pivot(x)) here equals the conditional
    aggregate the oracle states directly.

    Scale shape: adds a zero-shuffle Expand (3 rows per input row) on
    top of the pivot's |flags|-row output — reshape cost is bounded by
    the REPORT size, never the fact."""
    wide = discount_band_pivot(spark, sf_dir)
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["low", "mid", "high"],
            variableColumnName="band",
            valueColumnName="qty",
        )
        .orderBy("l_returnflag", "band")
    )


@query(
    "dq_orders_report",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders)
    SELECT 'not_null_o_custkey' AS check_name, n.n_rows,
           (SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) FROM orders) AS n_violations FROM n
    UNION ALL
    SELECT 'range_o_totalprice', n.n_rows,
           (SELECT CAST(SUM(CASE WHEN o_totalprice BETWEEN 0 AND 1000000
                                 THEN 0 ELSE 1 END) AS BIGINT)
            FROM orders) FROM n
    UNION ALL
    SELECT 'set_o_orderstatus', n.n_rows,
           (SELECT CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                                 THEN 0 ELSE 1 END) AS BIGINT)
            FROM orders) FROM n
    UNION ALL
    SELECT 'regex_o_orderpriority', n.n_rows,
           (SELECT CAST(SUM(CASE WHEN regexp_matches(o_orderpriority,
                                                     '^[1-5]-')
                                 THEN 0 ELSE 1 END) AS BIGINT)
            FROM orders) FROM n
    ORDER BY check_name
    """,
)
def dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report over orders: null, range, enum,
    and format constraints — the batch form of the reference's per-row
    write-time validation (postgres_store.py try/except per record;
    api/main.py pydantic models), as a gateable table-level report.

    All four checks evaluate in ONE aggregation over ONE scan
    (pipeline/checks.py: each constraint is a conditional sum; N checks
    cost one pass), then reshape to long form via unpivot.  NULL
    predicate results count as violations — three-valued logic must not
    let unknowns through a gate.

    Scale shape: single scan, single-row aggregate, report-sized
    Expand.  `pipeline.checks.gate` turns this exact report into a hard
    pipeline stop."""
    from data_integration_system_spark.pipeline.checks import (
        in_range,
        in_set,
        matches,
        not_null,
        run_checks,
    )

    o = table(spark, sf_dir, "orders")
    report = run_checks(
        o,
        [
            not_null("o_custkey"),
            in_range("o_totalprice", 0, 1000000),
            in_set("o_orderstatus", ("O", "F", "P")),
            matches("o_orderpriority", "^[1-5]-"),
        ],
    )
    return report.orderBy("check_name")


@query(
    "lang_source_rollcall",
    oracle="""
    SELECT lang,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def lang_source_rollcall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregate: the sorted, comma-joined roster of sources
    per language — the "which feeds contribute here" report, and the
    registry's one STRING-valued aggregate.

    DRIVER LIMITATION, not a semantic choice: the natural output type is
    array<string>, but the external driver canonicalizes results with
    pandas ``sort_values`` over every column, which dies on array cells
    (``unhashable type: numpy.ndarray`` — the round-1 failure mode of
    dedup_clusters/doc_fingerprint).  The joined-string form is the
    lossless scalar encoding of the same sorted set; a consumer wanting
    the array applies ``split(sources, ',')``.

    Spark spells it array_join(array_sort(collect_set())); DuckDB
    string_agg(DISTINCT ... ORDER BY) — identical strings because both
    sort the distinct set before joining.

    Scale shape: one lang-keyed shuffle; collect_set partials merge
    map-side and the set is bounded by |sources|, not rows."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.array_join(F.array_sort(F.collect_set("source")), ",").alias(
                "sources"
            ),
        )
        .orderBy("lang")
    )


@query(
    "user_modal_event_type",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ), m AS (
      SELECT user_id, max({'n': n, 't': event_type}) AS m
      FROM c GROUP BY user_id
    )
    SELECT user_id, m.t AS modal_type, m.n AS n_modal
    FROM m ORDER BY user_id
    """,
)
def user_modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type (the MODE() aggregate, which Spark
    lacks for grouped tie-controlled use) via the struct-max trick: the
    max of (n, event_type) pairs is the highest count with ties broken
    to the lexicographically LARGEST type — one deterministic contract
    both engines share, no per-group sort.

    Scale shape: two stacked hash aggregations on narrowing grains
    ((user, type) → user), both map-side combined; compare a window
    row_number() formulation, which would sort every user's rows.  The
    same shape is the keep-latest pattern (dedup_keep_latest) applied
    to a derived count instead of a version column."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    m = F.max(F.struct(F.col("n"), F.col("event_type")))
    return (
        counts.groupBy("user_id")
        .agg(m.alias("m"))
        .select(
            "user_id",
            F.col("m.event_type").alias("modal_type"),
            F.col("m.n").alias("n_modal"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Lake-layout consumer (r7): the bloom-backed point lookup.  The write
# path (pipeline/layout.write_clustered + parquet bloom filters) existed
# since r6 with executed-metrics pins only; this registers an
# oracle-checked consumer so the layout layer faces the driver gate.
# ---------------------------------------------------------------------------

#: per-process cache of built lookup layouts, keyed by sf_dir — the
#: build is the write path (priced separately, like the other
#: materialized indexes); the QUERY is the probe path.
_HASH_LAYOUT_CACHE: dict[str, str] = {}


#: per-process cache of z-ordered event layouts, keyed by sf_dir (same
#: contract as _HASH_LAYOUT_CACHE: build once = write path, query = probe)
_ZORDER_LAYOUT_CACHE: dict[str, str] = {}


def _drop_hash_layouts() -> None:
    """atexit hook: each cached layout is a full clustered table copy in
    a mkdtemp dir — leaving them would leak one copy per process run
    until the OS clears /tmp."""
    import shutil

    for cache in (_HASH_LAYOUT_CACHE, _ZORDER_LAYOUT_CACHE):
        while cache:
            _, root = cache.popitem()
            shutil.rmtree(root, ignore_errors=True)


_cleanup_registered = False


def _register_layout_cleanup() -> None:
    global _cleanup_registered
    if not _cleanup_registered:
        import atexit

        atexit.register(_drop_hash_layouts)
        _cleanup_registered = True


def _content_hash_layout(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per sf_dir) the hash-probe layout of
    documents: doc_id-clustered parquet with a BLOOM FILTER on
    content_hash.  Clustering cannot help a hash key (its min/max spans
    the domain in every row group); the bloom filter is what makes an
    equality probe skip row groups — the pipeline/layout.py:54 design,
    here facing an oracle-checked consumer."""
    import tempfile

    from data_integration_system_spark.pipeline.layout import write_clustered

    root = _HASH_LAYOUT_CACHE.get(sf_dir)
    if root is None:
        _register_layout_cleanup()
        root = tempfile.mkdtemp(prefix="hash_lookup_")
        docs = table(spark, sf_dir, "documents")
        hashed = docs.select(
            "doc_id",
            F.md5(F.encode("text", "UTF-8")).alias("content_hash"),
        )
        write_clustered(
            hashed, f"{root}/by_hash", ["doc_id"], n_files=4,
            bloom_cols=["content_hash"],
        )
        _HASH_LAYOUT_CACHE[sf_dir] = root
    return f"{root}/by_hash"


#: fixed probe-set size for the point lookup: the control-plane collect
#: stays O(1) at any corpus size (ADVICE r7: the 1-in-101 sample alone
#: grew linearly — unbounded at 100 TB)
_N_HASH_PROBES = 64


@query(
    "content_hash_point_lookup",
    oracle=f"""
    WITH probes AS (
      SELECT DISTINCT md5(text) AS h FROM (
        SELECT text FROM documents WHERE doc_id % 101 = 0
        ORDER BY doc_id LIMIT {_N_HASH_PROBES}
      )
    )
    SELECT d.doc_id, md5(d.text) AS content_hash
    FROM documents d JOIN probes p ON md5(d.text) = p.h
    ORDER BY d.doc_id
    """,
)
def content_hash_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup by content hash against the bloom-backed layout —
    the dedup/provenance probe ("have we seen these exact bytes?") that
    a content-addressed corpus answers constantly at ingest.

    Scale shape: the probe list is genuinely O(1) — the {_N_HASH_PROBES}
    smallest qualifying doc_ids (TakeOrdered: scan-side top-k, constant
    driver memory at any corpus size; the previous unbounded 1-in-101
    sample grew linearly with the corpus); the lookup
    is an IN-list equality predicate pushed into the parquet scan,
    where the write-time bloom filter on content_hash skips every row
    group that cannot contain a probed hash (measured 200k -> ~900 rows
    read for a single-hash probe; see tests/test_metrics.py bloom
    pins).  Without the bloom layout this probe is a full-column scan —
    the difference between O(matches) and O(table) at 100 TB.  md5 (not
    xxhash64) so DuckDB recomputes the identical hex digest."""
    path = _content_hash_layout(spark, sf_dir)
    stored = spark.read.parquet(path)
    probe_hashes = list({
        r.content_hash
        for r in stored.filter(F.col("doc_id") % 101 == 0)
        .orderBy("doc_id").limit(_N_HASH_PROBES)
        .select("content_hash").collect()
    })
    return (
        stored.filter(F.col("content_hash").isin(probe_hashes))
        .select("doc_id", "content_hash")
        .orderBy("doc_id")
    )


def _zorder_events_layout(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per sf_dir) the two-access-path layout of
    events: Z-order-clustered parquet on (user_id, value), small row
    groups so both columns' min/max stats prune.  The layout twin of
    _content_hash_layout: write path priced separately, the QUERY below
    is the probe path — pipeline/layout.py:102's design facing an
    oracle-checked consumer."""
    import tempfile

    from data_integration_system_spark.pipeline.layout import write_zordered

    root = _ZORDER_LAYOUT_CACHE.get(sf_dir)
    if root is None:
        _register_layout_cleanup()
        root = tempfile.mkdtemp(prefix="zorder_events_")
        ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
        write_zordered(ev, f"{root}/by_uv", "user_id", "value",
                       n_files=4, rowgroup_bytes=128 * 1024)
        _ZORDER_LAYOUT_CACHE[sf_dir] = root
    return f"{root}/by_uv"


@query(
    "zorder_range_scan",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE user_id BETWEEN 3 AND 9 AND value BETWEEN 50 AND 150
    ORDER BY event_id
    """,
)
def zorder_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-dimensional range scan against the Z-ordered layout — the
    "events for these users in this value band" probe that needs BOTH
    access paths selective at once.

    Scale shape: both BETWEEN predicates are pushed into the parquet
    scan (PushedFilters), and because row groups are Morton
    hyperrectangles in (user_id, value) space each predicate skips most
    of them independently — ~sqrt-of-table read per dimension where a
    single-column sort reads the whole table for the other column
    (measured in tests/test_metrics.py: <40% read on EITHER column at
    a 256x256 grid).  The difference between O(selected) and O(table)
    for every 2-D slice at 100 TB.  No arithmetic on value — the stored
    doubles pass through bit-identical to the oracle's."""
    path = _zorder_events_layout(spark, sf_dir)
    return (
        spark.read.parquet(path)
        .filter(
            F.col("user_id").between(3, 9) & F.col("value").between(50.0, 150.0)
        )
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )
