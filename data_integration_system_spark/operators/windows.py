"""Window operators: analytic frames and event-time windows (SURVEY §2B
Q20, Q24-Q26).

The reference is purely processing-time (SURVEY §2A T-family); the
events-table queries declare the event-time layer a real engine needs.
Batch forms here; `streaming/jobs.py` runs the same windows on a stream.

Determinism: tumbling/sliding buckets are epoch-aligned exactly like
Spark's `F.window` (origin 1970-01-01 UTC), and the oracle SQL reproduces
that alignment arithmetically (epoch_ms floor), so the two engines agree
bucket-for-bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_integration_system_spark.catalog import table
from data_integration_system_spark.operators._common import dec
from data_integration_system_spark.registry import query


@query(
    "window_rank_frames",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rnk,
           lag(o_totalprice) OVER w AS prev_price,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                AS DOUBLE) AS run_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_rank_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 — analytic-window completeness: per-customer order history with
    rank, lag, and a running sum over an explicit row frame. One shuffle
    on the partition key; the running sum uses exact decimal accumulation
    (DuckDB evaluates frames via segment trees, so double summation order
    differs — decimal makes it associative, SURVEY §2B determinism)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.round(F.sum(dec("o_totalprice")).over(wf), 2).cast("double").alias("run_sum"),
    )


@query(
    "tumbling_window_counts",
    oracle="""
    SELECT epoch_ms(CAST(floor(epoch(ts) / 600) AS BIGINT) * 600000) AS bucket_start,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1
    """,
)
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q24 — per-10-minute tumbling window counts (T-family analog of the
    reference's poll cadence, worker_daemon.py:24-28). `F.window` buckets
    are epoch-aligned; the oracle floors epoch seconds to match. Plain
    grouped agg -> one shuffle, map-side partials."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("bucket_start"), "n_events", "sum_value")
    )


@query(
    "sliding_window_avg",
    oracle="""
    WITH twice AS (
      SELECT epoch_ms(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300000) AS bucket_start, value
      FROM events
      UNION ALL
      SELECT epoch_ms((CAST(floor(epoch(ts) / 300) AS BIGINT) - 1) * 300000) AS bucket_start, value
      FROM events
    )
    SELECT bucket_start,
           COUNT(*) AS n_events,
           ((2 * CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) + 100 * COUNT(*))
            // (200 * COUNT(*))) / 100.0 AS avg_value
    FROM twice GROUP BY bucket_start
    """,
)
def sliding_window_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q25 — sliding window (10 min length, 5 min slide): every event lands
    in exactly two windows. Spark expands via `F.window(ts, len, slide)`;
    the oracle materializes the same two epoch-aligned buckets by UNION
    ALL. Window start is the bucket identity on both sides.

    avg is rounded half-up in INTEGER space (sum is exact in 1e-4 units,
    values are non-negative): double ROUND at the .xx5 boundary is
    engine-dependent — Spark rounds the shortest decimal repr, DuckDB the
    binary double, so sum=32.05/n=2 gave 16.03 vs 16.02.  The integer
    formula (2·S + 100·n) div (200·n) / 100 is bit-identical on both."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(dec("value")) * 10000).cast("long").alias("_s_units"),  # exact 1e-4 units
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "n_events",
            (
                F.expr("(2 * _s_units + 100 * n_events) div (200 * n_events)")
                / F.lit(100.0)
            ).alias("avg_value"),
        )
    )


@query(
    "session_windows",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ), sessioned AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM sessioned GROUP BY user_id, sid
    """,
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q26 — session windows, 30-minute gap, per user (T3's timeout-based
    state eviction, db/postgres_store.py:58-68, as proper session
    semantics). Spark `session_window` merges events strictly closer than
    the gap; the oracle's lag+cumsum formulation starts a new session at
    diff >= gap — the same convention (SURVEY §2B 'hard parts').

    session_end = last event + gap, matching Spark's window.end."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "top_sources_per_lang",
    oracle="""
    WITH c AS (
      SELECT lang, source, count(*) AS n_docs
      FROM documents GROUP BY lang, source
    ), r AS (
      SELECT lang, source, n_docs,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_docs DESC, source) AS rnk
      FROM c
    )
    SELECT lang, source, n_docs, rnk FROM r WHERE rnk <= 3
    """,
)
def top_sources_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k (top 3 sources by doc count per language) — the
    aggregate-then-rank composition.  The count shrinks the data to
    |lang x source| BEFORE the rank window, so the window shuffle moves
    the tiny aggregate, never the corpus; ties broken by source for
    determinism."""
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs")
    )
    w = Window.partitionBy("lang").orderBy(F.col("n_docs").desc(), "source")
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("lang", "source", "n_docs", "rnk")
    )


@query(
    "ntile_quartiles",
    oracle="""
    SELECT event_id, event_type,
           ntile(4) OVER (PARTITION BY event_type
                          ORDER BY value, event_id) AS quartile
    FROM events
    """,
)
def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency bucketing (value quartile per event type) — the
    standard feature-binning window.  ntile's bucket-boundary semantics
    are engine-identical ONLY under a total order, so event_id breaks
    value ties; one shuffle on event_type."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id", "event_type", F.ntile(4).over(w).cast("long").alias("quartile")
    )


@query(
    "signup_purchase_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id
    )
    SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
           epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts) AS lag_us
    FROM s JOIN p ON s.user_id = p.user_id
    """,
)
def signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: per user, first signup -> first purchase AT OR
    AFTER it, with the conversion lag.  The two-stage temporal funnel
    every product-analytics pipeline runs.

    Scale: both aggs and the joins share user_id as the key, so the
    whole funnel is one shuffle's partitioning reused end-to-end; the
    lag is integer microseconds (epoch_us both engines — no date_diff
    boundary-crossing semantics, no double rounding)."""
    ev = table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return s.join(p, "user_id").select(
        "user_id",
        "signup_ts",
        "first_purchase_ts",
        (F.unix_micros("first_purchase_ts") - F.unix_micros("signup_ts")).alias("lag_us"),
    )


@query(
    "event_type_transitions",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type, next_type, count(*) AS n
    FROM o WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def event_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts over per-user event sequences (lead under
    a total order) — the session-flow matrix behind "what do users do
    next" analyses.  One shuffle on user_id for the sequence window,
    then a tiny |types|² aggregation."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_type", F.lead("event_type").over(w).alias("next_type")
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "daily_active_users",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS dau,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY day ORDER BY day
    """,
)
def daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU: distinct users and event volume per calendar day — the
    product-analytics staple (and the batch twin of a streaming
    tumbling-window distinct).

    Both engines emit a midnight TIMESTAMP for the day key (Spark's
    date_trunc natively; DuckDB's date_trunc yields DATE, so CAST) —
    TIMESTAMP keys are the driver-proven class for time grains, where a
    DATE column would hit the Spark-date-object vs pandas-datetime64
    representation split in the driver's canonicalizer.

    Scale shape: one aggregation keyed on the day; the single-column
    distinct is the standard two-phase expand, bounded by |days × users|
    partials.  Day boundaries are UTC on both engines (session TZ pins
    Spark; DuckDB's timestamps are naive wall times of the same
    instants)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("dau"),
            F.count("*").cast("long").alias("n_events"),
        )
        .orderBy("day")
    )


@query(
    "monthly_revenue_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY month
    )
    SELECT month, n_orders, rev_cents,
           CAST(SUM(rev_cents) OVER (ORDER BY month
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_rev_cents,
           CAST((rev_cents - lag(rev_cents) OVER (ORDER BY month)) * 10000
                // lag(rev_cents) OVER (ORDER BY month) AS BIGINT)
             AS growth_e4
    FROM m ORDER BY month
    """,
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue trend: per calendar month, order count,
    revenue, running cumulative revenue, and integer-scaled MoM growth —
    the time-series reporting rollup (trend dashboards, release-over-
    release tracking).

    Scale shape: the fact aggregates ONCE to month grain (map-side
    combined, |months| rows); the cumulative/lag windows then run over
    that tiny relation on a single partition — unbounded-preceding over
    the raw fact would be a serial scan, over the month grain it is
    free.  All window inputs are exact integer cents, so lag/cumsum and
    the ×10⁴ floor-div growth are engine-identical; the first month's
    growth is NULL on both engines."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count("*").cast("long").alias("n_orders"),
        (F.sum(dec("o_totalprice")) * 100).cast("long").alias("rev_cents"),
    )
    w = Window.orderBy("month")
    prev = F.lag("rev_cents").over(w)
    return (
        m.withColumn(
            "cum_rev_cents",
            F.sum("rev_cents").over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .withColumn(
            "growth_e4",
            F.expr(
                "(rev_cents - lag(rev_cents) OVER (ORDER BY month)) * 10000"
                " div lag(rev_cents) OVER (ORDER BY month)"
            ).cast("long"),
        )
        .orderBy("month")
    )


@query(
    "customer_spend_percentile",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)
               AS spend_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, spend_cents,
           CAST(FLOOR(percent_rank() OVER w * 1000000) AS BIGINT)
             AS pct_rank_e6,
           CAST(FLOOR(cume_dist() OVER w * 1000000) AS BIGINT)
             AS cume_dist_e6
    FROM s
    WINDOW w AS (ORDER BY spend_cents, o_custkey)
    ORDER BY spend_cents DESC, o_custkey
    LIMIT 100
    """,
)
def customer_spend_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing analytics: each top customer's percent_rank and
    cume_dist over lifetime spend — the distribution-position window
    family (the ntile/rank queries' continuous sibling).

    Determinism: the window orders by (spend_cents, o_custkey) — a
    TOTAL order — so rank-based percentiles can't shift between engines
    on spend ties; spend is exact integer cents and both engines define
    percent_rank = (rank-1)/(n-1), cume_dist = rank/n on identical
    integers, floored at 10⁻⁶.

    Scale shape: one fact aggregation to customer grain, then the
    global-order window.  A single ORDER BY window serializes — at
    100 TB swap to percent_rank within salted range buckets or the
    one-pass formula rank-via-join; here |customers| ≪ |orders| and the
    post-agg relation is range-partitionable by Spark's window sort."""
    o = table(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        (F.sum(dec("o_totalprice")) * 100).cast("long").alias("spend_cents")
    )
    w = Window.orderBy("spend_cents", "o_custkey")
    return (
        s.withColumn(
            "pct_rank_e6",
            F.floor(F.percent_rank().over(w) * 1000000).cast("long"),
        )
        .withColumn(
            "cume_dist_e6",
            F.floor(F.cume_dist().over(w) * 1000000).cast("long"),
        )
        .orderBy(F.col("spend_cents").desc(), "o_custkey")
        .limit(100)
    )


@query(
    "weekly_retention",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events
    )
    SELECT a.week,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                * 10000 // count(*) AS BIGINT) AS retention_e4
    FROM uw a
    LEFT JOIN uw b
      ON b.user_id = a.user_id AND b.week = a.week + INTERVAL 7 DAY
    GROUP BY a.week
    ORDER BY a.week
    """,
)
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention: of the users active in ISO week W, how
    many are also active in W+1 — the cohort-retention staple (and the
    window family's self-join sibling: activity is sparse per user, so
    lead() over per-user weeks would miss gap weeks).

    Both engines truncate weeks to Monday-midnight TIMESTAMPs (the
    driver-proven key class for time grains) and the +7-days shift is
    exact interval arithmetic on those instants, so the join keys are
    engine-identical; the rate is integer ×10⁴.

    Scale shape: the corpus reduces to DISTINCT (user, week) first —
    one shuffle, map-side combined, |users × weeks| rows — and the
    self-join + week rollup run on that reduced relation, co-keyed on
    user_id.  The grain is lazily checkpointed so the fact scans ONCE
    however many join sides consume it (the join's null-filter on side
    b makes the two subtrees non-identical, so AQE exchange reuse alone
    would NOT kick in — each side would rescan the fact)."""
    ev = table(spark, sf_dir, "events")
    return retention_report(retention_grain(ev))


def retention_grain(events: DataFrame) -> DataFrame:
    """DISTINCT ``(user_id, week)`` activity grain — the reducible
    relation the batch query and the streaming ledger sink share
    (duplicate rows across ledger appends collapse in the report's
    re-distinct)."""
    return events.select(
        "user_id",
        F.date_trunc("week", "ts").alias("week"),
    ).distinct()


def retention_report(grain: DataFrame) -> DataFrame:
    """The retention rollup from a (possibly duplicate-rowed) activity
    grain: re-distinct, self-join on (user, week+7), per-week rates."""
    uw = grain.distinct().localCheckpoint(eager=False)
    a = uw.alias("a")
    b = uw.alias("b")
    joined = a.join(
        b,
        (F.col("b.user_id") == F.col("a.user_id"))
        & (F.col("b.week") == F.col("a.week") + F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    ret = F.sum(F.when(F.col("b.user_id").isNotNull(), 1).otherwise(0))
    return (
        joined.groupBy(F.col("a.week").alias("week"))
        .agg(
            F.count("*").cast("long").alias("n_active"),
            ret.cast("long").alias("n_retained"),
        )
        .withColumn(
            "retention_e4",
            F.expr("n_retained * 10000 div n_active").cast("long"),
        )
        .orderBy("week")
    )


@query(
    "rolling_7day_event_volume",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) * 100 AS BIGINT)
               AS value_cents
      FROM events GROUP BY day
    )
    SELECT day, n_events, value_cents,
           CAST(SUM(n_events) OVER w AS BIGINT) AS n_events_7d,
           CAST(SUM(value_cents) OVER w AS BIGINT) AS value_cents_7d
    FROM d
    WINDOW w AS (ORDER BY day
                 RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    ORDER BY day
    """,
)
def rolling_7day_event_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day event volume and value per day — the moving-window
    trend report (rolling actives, rolling revenue), distinct from
    `sliding_window_avg`'s epoch-aligned hop windows: this is a TRUE
    range frame anchored at each calendar day, so gap days shrink the
    window rather than shifting buckets.

    The range frame runs over an integer day number (days since epoch)
    in Spark and an INTERVAL range over the midnight-TIMESTAMP day key
    in DuckDB — identical semantics because both are closed
    [day-6, day] windows on exact day keys; sums are exact integer
    cents.

    Scale shape: the fact reduces to day grain first (one map-side
    combined shuffle); the global-order range window then touches
    |days| rows only — bounded by the calendar, not the corpus (the
    "windows over aggregated grains, never facts" rule, SCALE.md)."""
    ev = table(spark, sf_dir, "events")
    day = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n_events"),
        (F.sum(dec("value")) * 100).cast("long").alias("value_cents"),
    )
    w = (
        Window.orderBy(F.datediff(F.to_date("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return day.select(
        "day",
        "n_events",
        "value_cents",
        F.sum("n_events").over(w).cast("long").alias("n_events_7d"),
        F.sum("value_cents").over(w).cast("long").alias("value_cents_7d"),
    ).orderBy("day")


@query(
    "customer_rfm_scores",
    oracle="""
    WITH s AS (
      SELECT o_custkey,
             CAST(date_diff('day', max(o_orderdate), TIMESTAMP '2002-01-01')
                  AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           CAST(ntile(4) OVER (ORDER BY recency_days, o_custkey) AS BIGINT)
             AS r_score,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT)
             AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, o_custkey)
                AS BIGINT) AS m_score
    FROM s
    """,
)
def customer_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, days since last order (vs a fixed
    analysis anchor just past the data's horizon), order count, lifetime
    spend, and quartile scores for each — the classic marketing-analytics
    triple (and the composed form of the ntile/percentile family).

    Determinism: every ntile orders by (metric, o_custkey) — a total
    order — so quartile boundaries cannot shift between engines on
    metric ties; recency is exact integer days against a LITERAL anchor
    (a data-derived max(date) anchor would re-scan and, worse, make the
    report non-reproducible across runs as data arrives).

    Scale shape: one fact aggregation to customer grain; the three
    global ntile windows share one sort-partition pass over |customers|
    rows.  A global window serializes, but only on the post-agg grain —
    at larger scale swap ntile for the rank-via-broadcast-quantile
    formula."""
    o = table(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.max(F.to_date("o_orderdate"))
        )
        .cast("long")
        .alias("recency_days"),
        F.count("*").cast("long").alias("frequency"),
        (F.sum(dec("o_totalprice")) * 100).cast("long").alias("monetary_cents"),
    )
    return s.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(4)
        .over(Window.orderBy("recency_days", "o_custkey"))
        .cast("long")
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "o_custkey"))
        .cast("long")
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary_cents").desc(), "o_custkey"))
        .cast("long")
        .alias("m_score"),
    )


@query(
    "order_gap_percentiles",
    oracle="""
    WITH g AS (
      SELECT o_custkey,
             CAST(date_diff('day',
                            lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                   ORDER BY o_orderdate,
                                                            o_orderkey),
                            o_orderdate) AS BIGINT) AS gap_days
      FROM orders
    )
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_gaps,
           CAST(FLOOR(quantile_cont(g.gap_days, 0.5)) AS BIGINT)
             AS median_gap_days,
           CAST(FLOOR(quantile_cont(g.gap_days, 0.9)) AS BIGINT)
             AS p90_gap_days
    FROM g JOIN customer c ON c.c_custkey = g.o_custkey
    WHERE g.gap_days IS NOT NULL
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def order_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence: median and p90 of the day-gap between a
    customer's consecutive orders, rolled up per market segment — the
    lag-then-percentile composition (repeat-purchase behavior, SLA
    inter-arrival analyses).

    Determinism: gaps are exact integer days from a lag window with a
    TOTAL order (o_orderdate, o_orderkey); percentiles interpolate over
    those integers, so (1-g)·a + g·b is bit-exact on both engines (the
    `segment_median_order` pre-scaled-integer rule; 0.9 is not an exact
    binary fraction but g·b on integers ≪ 2^53 still rounds identically
    because both engines evaluate the same two-operand products).

    Scale shape: one shuffle on o_custkey for the lag window (the
    partition key makes it embarrassingly parallel), broadcast of the
    customer dim into the gap relation, then a 5-group percentile
    aggregate with per-partition buffers."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = o.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        )
        .cast("long")
        .alias("gap_days"),
    ).filter(F.col("gap_days").isNotNull())
    return (
        gaps.join(F.broadcast(c), gaps.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.floor(F.expr("percentile(gap_days, 0.5)"))
            .cast("long")
            .alias("median_gap_days"),
            F.floor(F.expr("percentile(gap_days, 0.9)"))
            .cast("long")
            .alias("p90_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "order_date_gap_fill",
    oracle="""
    WITH d AS (
      SELECT o_orderdate AS day,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY day
    ), b AS (
      SELECT min(day) AS lo, max(day) AS hi FROM d
    ), spine AS (
      SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS day
      FROM b
    ), f AS (
      SELECT s.day,
             COALESCE(d.n_orders, 0) AS n_orders,
             COALESCE(d.rev_cents, 0) AS rev_cents
      FROM spine s LEFT JOIN d ON d.day = s.day
    )
    SELECT day, n_orders, rev_cents,
           last_value(CASE WHEN n_orders > 0 THEN day END IGNORE NULLS)
             OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_active_day,
           CAST(date_diff('day',
                last_value(CASE WHEN n_orders > 0 THEN day END IGNORE NULLS)
                  OVER (ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                day) AS BIGINT) AS days_since_active
    FROM f ORDER BY day
    """,
)
def order_date_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: a complete day spine between the first and last
    order date, zero-filled volume/revenue on silent days, plus a
    forward-filled last-active-day marker — the densification step every
    time-series consumer needs before rolling math or charting (silent
    days must exist as zeros, not be absent).

    Spark-first shape: the spine is `sequence(min, max, interval 1 day)`
    exploded from ONE broadcast scalar row — no driver-side date loop,
    no recursive CTE; forward-fill is `last(..., ignorenulls)` over a
    running frame, matching DuckDB's IGNORE NULLS exactly because the
    frame and the (total) order are identical.

    Scale shape: the fact reduces to day grain first; the spine is
    |calendar days| rows built from a 1-row cross join (broadcast, not a
    shuffle); the fill window runs on the spine grain, bounded by the
    calendar, never by the corpus."""
    o = table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count("*").cast("long").alias("n_orders"),
        (F.sum(dec("o_totalprice")) * 100).cast("long").alias("rev_cents"),
    )
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    f = (
        spine.join(d, "day", "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.coalesce("rev_cents", F.lit(0)).cast("long").alias("rev_cents"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    last_active = F.last(
        F.when(F.col("n_orders") > 0, F.col("day")), ignorenulls=True
    ).over(w)
    return f.select(
        "day",
        "n_orders",
        "rev_cents",
        last_active.alias("last_active_day"),
        F.datediff(F.to_date("day"), F.to_date(last_active))
        .cast("long")
        .alias("days_since_active"),
    ).orderBy("day")


@query(
    "new_vs_returning_users",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events
    ), f AS (
      SELECT user_id, min(day) AS first_day FROM uw GROUP BY user_id
    )
    SELECT uw.day,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN uw.day = f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new,
           CAST(SUM(CASE WHEN uw.day > f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returning,
           CAST(SUM(CASE WHEN uw.day = f.first_day THEN 1 ELSE 0 END)
                * 10000 // count(*) AS BIGINT) AS new_share_e4
    FROM uw JOIN f ON f.user_id = uw.user_id
    GROUP BY uw.day ORDER BY uw.day
    """,
)
def new_vs_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-vs-retention split: per day, how many active users are
    seeing the product for the FIRST time vs returning — the growth
    report `daily_active_users` can't answer (a flat DAU can hide full
    churn-and-replace).

    Spark-first: first_day is `min(day) OVER (PARTITION BY user_id)` on
    the distinct (user, day) grain — no self-join; the oracle states the
    same thing as an aggregate + join because DuckDB's optimizer treats
    them identically at its scale.  Day keys are midnight TIMESTAMPs
    (the driver-proven class); the share is integer ×10⁴.

    Scale shape: the corpus reduces to DISTINCT (user, day) in one
    map-side-combined shuffle; the first-day window then re-keys on
    user_id — but that exchange (and the day rollup after it) moves
    only the deduped |user-days| grain, never raw events.  Reducing
    BEFORE re-keying beats a single raw shuffle on user_id whenever
    users have multiple events per day, i.e. always."""
    ev = table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id")
    g = uw.withColumn("first_day", F.min("day").over(w))
    return (
        g.groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("long")
            .alias("n_returning"),
        )
        .withColumn(
            "new_share_e4", F.expr("n_new * 10000 div n_active").cast("long")
        )
        .orderBy("day")
    )


@query(
    "purchase_streak_islands",
    oracle="""
    WITH e AS (
      SELECT user_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
      FROM events
    ), isl AS (
      SELECT user_id, island,
             CAST(SUM(1 - isp) AS BIGINT) AS n_between
      FROM e GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(max(island) AS BIGINT) AS n_purchases,
           CAST(max(n_between) AS BIGINT) AS max_streak,
           CAST(arg_max(n_between, island) AS BIGINT) AS current_streak
    FROM isl GROUP BY user_id ORDER BY user_id
    """,
)
def purchase_streak_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each purchase closes an "island" of intervening
    non-purchase events (cumulative-marker island ids), reported per
    user as purchase count, longest between-purchase streak, and the
    current open streak — the classic islands shape the suite's
    TIME-gap sessionization (`session_windows`) doesn't cover: here the
    boundary is a data-defined marker, not a clock gap.

    All integers: the island id is a running conditional sum under a
    total order, streaks are counts, and the "current" pick is
    max_by/arg_max on the island id — exact on both engines.

    Scale shape: one user-keyed shuffle for the running-sum window; the
    island rollup and the per-user rollup are both co-keyed with it
    (map-side combinable, no further wide exchange)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isp = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    e = ev.select(
        "user_id",
        isp.alias("isp"),
        F.sum(isp).over(w).cast("long").alias("island"),
    )
    isl = e.groupBy("user_id", "island").agg(
        F.sum(1 - F.col("isp")).cast("long").alias("n_between")
    )
    return (
        isl.groupBy("user_id")
        .agg(
            F.max("island").cast("long").alias("n_purchases"),
            F.max("n_between").cast("long").alias("max_streak"),
            F.expr("max_by(n_between, island)").cast("long").alias("current_streak"),
        )
        .orderBy("user_id")
    )


@query(
    "event_type_daily_trend",
    oracle="""
    WITH d AS (
      SELECT event_type,
             date_diff('day', TIMESTAMP '1970-01-01',
                       CAST(date_trunc('day', ts) AS TIMESTAMP)) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY event_type, x
    ), s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM d GROUP BY event_type
    )
    SELECT event_type, n_days,
           CAST(CASE WHEN n_days * sxx - sx * sx = 0 THEN NULL
                ELSE (n_days * sxy - sx * sy) * 1000000
                     // (n_days * sxx - sx * sx) END AS BIGINT) AS slope_e6
    FROM s ORDER BY event_type
    """,
)
def event_type_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type volume trend: the least-squares slope of daily event
    counts over day index, in pure BIGINT arithmetic — the monitoring
    primitive behind "is this event type growing or dying", exactly
    oracle-checked because every sum is integer (slope_e6 =
    (n·Σxy − ΣxΣy)·10⁶ // (n·Σxx − Σx²); single-day types yield NULL
    on both engines via the zero denominator guard).

    Scale shape: two stacked map-side-combined aggregations on
    narrowing grains ((type, day) → type) — the user_modal shape with
    regression sums instead of a struct-max; no window, no sort."""
    ev = table(spark, sf_dir, "events")
    x = F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("timestamp")).cast("long")
    d = ev.groupBy("event_type", x.alias("x")).agg(
        F.count("*").cast("long").alias("y")
    )
    s = d.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    den = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        "n_days",
        F.when(den != 0, F.expr(
            "(n_days * sxy - sx * sy) * 1000000 div (n_days * sxx - sx * sx)"
        )).cast("long").alias("slope_e6"),
    ).orderBy("event_type")


@query(
    "session_opening_paths",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(CASE WHEN prev IS NULL
                        OR date_diff('second', prev, ts) >= 1800
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
      FROM o
    ), r AS (
      SELECT user_id, sess_id, event_type,
             row_number() OVER (PARTITION BY user_id, sess_id
                                ORDER BY ts, event_id) AS rn
      FROM s
    ), p AS (
      SELECT user_id, sess_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 3 GROUP BY user_id, sess_id
    )
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def session_opening_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the top 20 session-OPENING event sequences (first
    three event types of each 30-minute-gap session) — the "how do
    sessions start" analysis product teams run after sessionization,
    and the sequence-pattern shape the suite lacked.

    Sessionization uses the lag+cumsum convention (new session at
    gap >= 30 min) spelled identically on both engines; the opening
    path is the (ts, event_id)-ordered prefix joined with '>', so
    DuckDB's ordered string_agg and Spark's
    array_sort(collect_list(struct))->slice->join build the same
    string.

    Scale shape: ONE user-keyed shuffle carries the lag window, the
    running session-id sum, and (unchanged key prefix) the per-session
    collect; the path rollup then aggregates |sessions| rows and the
    top-20 moves |distinct paths|.  collect_list per session is bounded
    by session length — the same contract as session_windows."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = (
        F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    )
    new_s = (
        F.when(gap_s.isNull() | (gap_s >= 1800), 1).otherwise(0)
    )
    sess = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.sum(new_s).over(w).alias("sess_id"),
    )
    evs = F.array_sort(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    path = F.array_join(
        F.transform(
            F.slice(F.col("evs"), 1, 3), lambda s: s.getField("event_type")
        ),
        ">",
    )
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(evs.alias("evs"))
        .select(path.alias("path"))
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


@query(
    "conversion_by_signup_week",
    oracle="""
    WITH su AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), conv AS (
      SELECT s.user_id, s.signup_ts,
             CASE WHEN EXISTS (
               SELECT 1 FROM events p
               WHERE p.user_id = s.user_id
                 AND p.event_type = 'purchase'
                 AND p.ts >= s.signup_ts
             ) THEN 1 ELSE 0 END AS converted
      FROM su s
    )
    SELECT CAST(date_trunc('week', signup_ts) AS TIMESTAMP) AS cohort_week,
           CAST(count(*) AS BIGINT) AS n_signups,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(SUM(converted) * 10000 // count(*) AS BIGINT) AS conversion_e4
    FROM conv GROUP BY cohort_week ORDER BY cohort_week
    """,
)
def conversion_by_signup_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort conversion: per signup week, the share of users whose
    first signup is followed (at or after it) by any purchase — the
    funnel rate rolled to the acquisition cohort, the growth-team
    companion of weekly_retention.

    Week keys are midnight TIMESTAMPs on both sides (the driver-proven
    time-grain class); the rate is an e4-scaled integer.

    Scale shape: both branches reduce to the user grain FIRST (min
    signup; purchase existence as a semi-join on the user key), so the
    join moves |users| rows, not events; the week rollup is tiny.  The
    EXISTS-with-inequality runs as one user-keyed aggregation below
    (min signup vs min qualifying purchase), not a correlated probe."""
    ev = table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.max("ts").alias("last_purchase_ts"))
    )
    conv = (
        su.join(pu, "user_id", "left")
        .select(
            "signup_ts",
            F.when(
                F.col("last_purchase_ts") >= F.col("signup_ts"), 1
            ).otherwise(0).alias("converted"),
        )
    )
    return (
        conv.groupBy(F.date_trunc("week", "signup_ts").alias("cohort_week"))
        .agg(
            F.count("*").cast("long").alias("n_signups"),
            F.sum("converted").cast("long").alias("n_converted"),
        )
        .select(
            "cohort_week",
            "n_signups",
            "n_converted",
            F.expr("n_converted * 10000 div n_signups").cast("long").alias("conversion_e4"),
        )
        .orderBy("cohort_week")
    )


@query(
    "daily_volume_anomalies",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY day
    ), m AS (
      SELECT CAST(FLOOR(quantile_cont(n, 0.5)) AS BIGINT) AS med FROM d
    ), md AS (
      SELECT m.med,
             CAST(FLOOR(quantile_cont(abs(d.n - m.med), 0.5)) AS BIGINT) AS mad
      FROM d, m GROUP BY m.med
    )
    SELECT d.day, d.n,
           CAST(abs(d.n - md.med) AS BIGINT) AS dev,
           md.med AS median_daily, md.mad AS mad_daily
    FROM d, md
    WHERE abs(d.n - md.med) > 3 * md.mad
    ORDER BY d.day
    """,
)
def daily_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops anomaly detection: days whose event volume deviates more
    than 3 MADs from the median daily volume — the robust ingestion
    monitor (a broken feed or a double-delivery shows up here before
    any downstream metric moves).  event_value_mad's dispersion recipe
    applied to the DAY grain: floored integer median → integer
    deviations → exact second percentile.

    Scale shape: the fact collapses to |days| rows first; both
    percentile passes and the flag filter run on that tiny relation
    (the two scalar stats ride along as one broadcast row)."""
    ev = table(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=False)  # |days| rows, three consumers
    )
    m = d.agg(
        F.floor(F.expr("percentile(n, 0.5)")).cast("long").alias("med")
    )
    md = (
        d.crossJoin(F.broadcast(m))
        .agg(
            F.first("med").alias("med"),
            F.floor(F.expr("percentile(abs(n - med), 0.5)"))
            .cast("long")
            .alias("mad"),
        )
    )
    return (
        d.crossJoin(F.broadcast(md))
        .filter(F.abs(F.col("n") - F.col("med")) > 3 * F.col("mad"))
        .select(
            "day",
            "n",
            F.abs(F.col("n") - F.col("med")).cast("long").alias("dev"),
            F.col("med").alias("median_daily"),
            F.col("mad").alias("mad_daily"),
        )
        .orderBy("day")
    )
