"""Join operators: broadcast dim lookups, sort-merge fact joins, semi/anti
membership, range + as-of joins, and the flagship star join (SURVEY §2B
Q11/Q11b/Q13/Q15/Q21/Q22/Q23).

Scale notes (the reference did all of this as O(n) Python probes or SQL
point lookups — SURVEY §2A J1-J5):

* Dimension joins broadcast (`F.broadcast`): region/nation/customer/
  supplier are tiny relative to facts; no shuffle of the fact side.
* Fact-fact joins (lineitem ⋈ orders) shuffle on the key — sort-merge,
  AQE-skew-handled.  At 100 TB: bucket both tables by the join key to
  make this shuffle-free.
* Semi/anti joins never materialize the probe side's payload.
* The as-of join uses the union+window formulation — one shuffle on
  (key), no per-row subqueries; this is the only formulation that scales
  (join+max would re-shuffle twice and explode intermediate rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_integration_system_spark.catalog import table
from data_integration_system_spark.operators._common import dec, money_sum
from data_integration_system_spark.registry import query


@query(
    "join_broadcast_dim",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_total
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 — J1/J3 keyed dim lookup (the reference's O(n) list probe at
    filesystem_store.py:95 and jobs FK at db/schema.sql:32) as broadcast
    hash joins: the orders fact never shuffles."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"), money_sum("o_totalprice").alias("sum_total"))
    )


@query(
    "join_sortmerge_fact",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_sortmerge_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11b — large fact ⋈ fact join on the natural key; above the
    broadcast threshold this plans as a sort-merge join (AQE may downgrade
    to broadcast at small SF — both are correct; at 100 TB, bucket both
    tables by orderkey to eliminate the shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(rev.cast("decimal(18,4)")), 2).cast("double").alias("revenue"),
        )
    )


@query(
    "semi_join_existing",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def semi_join_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 — D8/J5 existence probe (the dead raw_document_exists at
    db/postgres_store.py:115-123; visited-set membership) as LEFT SEMI:
    probe side payload never shuffles, dedup is implicit."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "anti_join_unvisited",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)
    """,
)
def anti_join_unvisited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 — D2/F6 visited-set subtraction (crawler_core.py:157-159:
    'url in visited -> skip') as LEFT ANTI join — the scalable negation
    of Q13 (a broadcast-able NOT IN without the NULL traps)."""
    c = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "multiway_star_join",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def multiway_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 — FLAGSHIP: region→nation→customer→orders→lineitem star join
    (TPC-H-Q5-shaped), filters, group agg, order, deterministic tie-break.

    Plan shape to want at scale: lineitem (the 100 TB table) is scanned
    once, never broadcast; orders⋈lineitem is the one big shuffle
    (bucketing removes it); region/nation/customer collapse into
    broadcast hash joins on the fact stream; the date filter pushes into
    the orders scan, pruning partitions if orders is date-partitioned.
    """
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(rev.cast("decimal(18,4)")), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "range_join_events",
    oracle="""
    SELECT e.event_id, e.user_id, COUNT(c.event_id) AS n_clicks
    FROM events e
    LEFT JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click'
     AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.user_id
    """,
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 — north-star range join: clicks within 10 minutes after each
    error, per user. The equality key (user_id) keeps this a hash/SMJ
    join with the range as a residual condition — NOT a cartesian; at
    100 TB, additionally bucket by user_id and partition by coarse time
    to bound the probe range."""
    ev = table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
    )
    cond = (
        (err.user_id == clk.c_user_id)
        & (clk.c_ts >= err.ts)
        & (clk.c_ts < err.ts + F.expr("INTERVAL 10 MINUTE"))
    )
    return (
        err.join(clk, cond, "left")
        .groupBy("event_id", "user_id")
        .agg(F.count("c_event_id").alias("n_clicks"))
    )


@query(
    "asof_latest_event_per_order",
    oracle="""
    WITH pri AS (
      SELECT p.event_id, p.user_id, p.ts, max(c.ts) AS prior_ts
      FROM events p
      LEFT JOIN events c
        ON c.user_id = p.user_id AND c.event_type IN ('click','view') AND c.ts <= p.ts
      WHERE p.event_type = 'purchase'
      GROUP BY p.event_id, p.user_id, p.ts
    )
    SELECT pri.event_id, pri.user_id, pri.ts,
           max(c2.event_id) AS prior_event_id, pri.prior_ts
    FROM pri
    LEFT JOIN events c2
      ON c2.user_id = pri.user_id AND c2.ts = pri.prior_ts
     AND c2.event_type IN ('click','view')
    GROUP BY pri.event_id, pri.user_id, pri.ts, pri.prior_ts
    """,
)
def asof_latest_event_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q23 — north-star AS-OF join: for every purchase, the latest
    click/view at-or-before it for the same user (ties on ts broken by
    max event_id).

    Implementation: the union+window formulation — tag both streams,
    sort within user by (ts, tag, event_id), carry the last non-null
    prior via last(ignorenulls). ONE shuffle on user_id total; the
    join+max alternative (used only by the oracle SQL) would shuffle
    twice and explode pairs. This is the scalable as-of pattern.
    """
    ev = table(spark, sf_dir, "events")
    prior = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        "event_id",
        F.struct(F.col("ts"), F.col("event_id")).alias("prior"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        "event_id",
        F.lit(None).cast(prior.schema["prior"].dataType).alias("prior"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = prior.unionByName(purch).withColumn(
        "lp", F.last("prior", ignorenulls=True).over(w)
    )
    return tagged.filter(F.col("tag") == 1).select(
        "event_id",
        "user_id",
        "ts",
        F.col("lp.event_id").alias("prior_event_id"),
        F.col("lp.ts").alias("prior_ts"),
    )


@query(
    "partsupp_profit",
    oracle="""
    SELECT n_name, p_brand,
           COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size >= 25
    GROUP BY n_name, p_brand
    """,
)
def partsupp_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-flavored coverage of the remaining dimension tables
    (part, supplier): revenue per supplier-nation × part-brand for large
    parts. Same star discipline as Q21 — the lineitem fact streams
    through three broadcast hash joins (part/supplier/nation all small),
    one agg shuffle; the p_size filter pushes into the part scan, which
    shrinks the broadcast, not the fact scan."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") >= 25)
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(rev.cast("decimal(18,4)")), 2).cast("double").alias("revenue"),
        )
    )


@query(
    "customer_order_distribution",
    oracle="""
    WITH c AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT n_orders, count(*) AS n_customers
    FROM c GROUP BY n_orders
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders —
    LEFT OUTER join (zero-order customers must survive) + two-level
    aggregation.

    Scale: first agg shuffles on c_custkey (co-keyed with the join, so
    AQE coalesces), second agg input is |distinct order counts| — tiny.
    The outer join is the point: a semi/inner join silently drops the
    n_orders=0 bucket, the classic Q13 bug."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count("*").alias("n_customers")
    )


@query(
    "priority_counts_with_lineitem",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_quantity > 30)
    GROUP BY o_orderpriority
    """,
)
def priority_counts_with_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for orders that HAVE a
    qualifying lineitem — the EXISTS decorrelated to a LEFT SEMI join
    (each order counted once no matter how many lineitems qualify).

    Scale: the lineitem side is filtered BEFORE the semi join (predicate
    reaches its scan), the date filter reaches the orders scan, and the
    semi join never materializes lineitem columns — the exact plan a
    correlated EXISTS should compile to."""
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 30)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "returned_item_report",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers ranked by revenue lost to returned
    items — top-20 with a deterministic tie-break.

    Scale plan: lineitem filtered to returns AT THE SCAN (predicate
    pushdown on l_returnflag), one shuffle joining the filtered fact to
    orders, customer broadcast onto the result, and TakeOrderedAndProject
    for the top-20 — no global sort.  Decimal-sum discipline for the
    money column."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            money_sum(rev).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "top_revenue_supplier",
    oracle="""
    WITH r AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-07-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM r)
    ORDER BY s_suppkey
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over a
    ship-date window (the classic view + max-over-aggregate pattern).

    Scale plan: the date filter pushes into the lineitem scan; one
    revenue aggregation on l_suppkey; the 1-row max broadcasts back over
    the tiny per-supplier relation, and supplier broadcasts onto the
    result — the 100 TB cost is exactly one filtered fact scan + one
    shuffle."""
    s = table(spark, sf_dir, "supplier")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    r = li.groupBy("l_suppkey").agg(money_sum(rev).alias("total_revenue"))
    mx = r.agg(F.max("total_revenue").alias("mx"))
    return (
        r.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "segment_top_orders",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1996-01-01'
      AND l.l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def segment_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: highest-value unshipped orders for one market
    segment — top-10 revenue with deterministic tie-break.

    Scale plan: both date filters and the segment filter push to their
    scans; the segment-filtered customer broadcasts into orders before
    the one fact shuffle; TakeOrderedAndProject caps the result without a
    global sort."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "snapshot_reconcile",
    oracle="""
    WITH cur AS (
      SELECT doc_id, sha256(text) AS h FROM documents WHERE doc_id % 3 <> 0
    ), nxt AS (
      SELECT doc_id,
             sha256(CASE WHEN doc_id % 4 = 0 THEN text || ' v2' ELSE text END) AS h
      FROM documents WHERE doc_id % 2 = 0
    )
    SELECT COALESCE(c.doc_id, n.doc_id) AS doc_id,
           CASE WHEN n.doc_id IS NULL THEN 'DELETED'
                WHEN c.doc_id IS NULL THEN 'ADDED'
                WHEN c.h = n.h        THEN 'UNCHANGED'
                ELSE 'CHANGED' END AS change
    FROM cur c FULL OUTER JOIN nxt n ON c.doc_id = n.doc_id
    """,
)
def snapshot_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-snapshot reconciliation: FULL OUTER join of a current vs next
    table version on the key, classifying every id as DELETED / ADDED /
    CHANGED / UNCHANGED by hash — the audit diff between two versions of
    the copy-on-write page store (pipeline/snapshots.py), and the one
    join type (full outer) the inventory lacked a named query for.

    Uses Q14's deterministic current/incoming derivation so the oracle
    is exact.  Scale: one co-keyed shuffle; both sides prune to
    (key, hash) columns at the scan."""
    docs = table(spark, sf_dir, "documents")
    cur = docs.filter(F.col("doc_id") % 3 != 0).select(
        F.col("doc_id").alias("c_id"), F.sha2("text", 256).alias("c_h")
    )
    nxt = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("n_id"),
        F.sha2(
            F.when(F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text")),
            256,
        ).alias("n_h"),
    )
    change = (
        F.when(F.col("n_id").isNull(), "DELETED")
        .when(F.col("c_id").isNull(), "ADDED")
        .when(F.col("c_h") == F.col("n_h"), "UNCHANGED")
        .otherwise("CHANGED")
    )
    return cur.join(nxt, cur.c_id == nxt.n_id, "full_outer").select(
        F.coalesce("c_id", "n_id").alias("doc_id"), change.alias("change")
    )


@query(
    "large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    SELECT o.o_orderkey, c.c_name, o.o_orderdate, o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY b.total_qty DESC, o.o_orderkey
    LIMIT 20
    """,
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): the 20 biggest orders
    by total line quantity above a volume threshold, with their
    customer.

    Scale shape: the HAVING collapses lineitem to ~1% of orders BEFORE
    any join — one map-side-combined agg shuffle on l_orderkey, then the
    surviving order keys are small enough that AQE turns both joins into
    broadcasts at any SF where the threshold is selective.  The sort is
    TakeOrderedAndProject (top-20), never a global sort.  l_quantity is
    integral-valued, so its double SUM is order-independent — no decimal
    staging needed (unlike price sums)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_name", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "brand_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_size BETWEEN 10 AND 40 AND p.p_brand <> 'Brand#3'
    GROUP BY p.p_brand, p.p_type
    """,
)
def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many distinct
    suppliers ship each surviving (brand, type) part family — the
    catalog-breadth query, minus the NOT IN complaint-supplier arm the
    schema has no data for.

    Scale shape: the part dim filters push into its scan and the
    shrunken dim broadcasts into the lineitem scan; COUNT(DISTINCT)
    expands to a two-phase aggregate — partial distinct on (brand, type,
    suppkey) absorbs the fact-side repetition map-side, so the real
    shuffle carries at most |brands × types × suppliers| rows regardless
    of fact size."""
    p = table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 40) & (F.col("p_brand") != "Brand#3")
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "regional_nation_volume",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('AMERICA', 'ASIA')
    GROUP BY n.n_name
    """,
)
def regional_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): revenue per nation where
    the CUSTOMER and the line's SUPPLIER sit in the same nation, for two
    regions.  The defining feature is the correlated equi-constraint
    s_nationkey = c_nationkey riding on the supplier join — it is a join
    condition, not a post-filter, so it prunes rows inside the hash join.

    Scale shape: the region→nation chain collapses into a tiny broadcast
    before touching any fact; orders⋈lineitem is the one real shuffle
    pair (co-keyed on orderkey); customer and supplier broadcast.
    Revenue uses the decimal-sum discipline."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name").isin("AMERICA", "ASIA"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(F.sum(rev.cast("decimal(18,4)")), 2).cast("double")
            .alias("revenue"),
        )
    )


@query(
    "idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
               / COUNT(*) AS a
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(CAST(c.c_acctbal AS DECIMAL(18,4)), 2) AS DOUBLE)
             AS acctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-07-01')
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-opportunity filter): customers whose
    balance beats the positive-balance average but who placed no RECENT
    order — scalar aggregate subquery + NOT EXISTS, decorrelated into a
    broadcast scalar and a LEFT ANTI join (every customer has SOME order
    in this data, so the recency cut is what keeps the result nonempty).

    Scale shape: the average is one map-side-combined agg to a single
    broadcast row; the anti join shuffles only o_custkey (one column of
    orders) against the thin filtered customer side.  The threshold is
    an exact decimal sum divided in doubles — identical on both engines,
    so no rounding sits on the filter boundary."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
             / F.count("*")).alias("a")
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(
            orders.filter(F.col("o_orderdate") >= "2000-07-01").select("o_custkey"),
            cust.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal").cast("decimal(18,4)"), 2).cast("double")
            .alias("acctbal"),
        )
    )


@query(
    "volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year, in
    both directions — the disjunctive nation-pair constraint classic.

    Scale plan: the nation dims broadcast into supplier and customer
    BEFORE the facts join, so the pair disjunction prunes both dim-side
    inputs early (suppliers and customers outside the two nations never
    reach a fact join); the date range pushes to the lineitem scan; the
    two fact joins shuffle on their natural keys and AQE picks broadcast
    for the shrunken sides at small SF."""
    n = table(spark, sf_dir, "nation")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n.filter(pair)), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n.filter(pair)), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "national_market_share",
    oracle="""
    WITH v AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(FLOOR(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                                    THEN volume ELSE 0 END) AS DOUBLE)
                      * 10000 / CAST(SUM(volume) AS DOUBLE)) AS BIGINT)
             AS mkt_share_e4
    FROM v GROUP BY o_year ORDER BY o_year
    """,
)
def national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of PROMO-part revenue among
    ASIA-region customers, by order year — the conditional-share
    two-level aggregate.

    Scale plan: part (type-filtered), customer⋈nation⋈region (region-
    filtered), and supplier⋈nation are all broadcast-shaped dims; the
    fact shuffles once for the orders join; share numerator rides the
    SAME aggregate as the denominator (a CASE inside SUM — one pass, no
    self-join).  Exact decimal volumes; the share is floor-scaled
    integer so no ROUND sits on a double boundary."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_asia = (
        c.join(
            F.broadcast(
                n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey")
            ),
            c.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nat = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    v = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_asia), o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.cast("decimal(18,4)").alias("volume"),
            "supp_nation",
        )
    )
    share = (
        F.floor(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                .otherwise(F.lit(0).cast("decimal(18,4)"))
            ).cast("double")
            * 10000
            / F.sum("volume").cast("double")
        )
        .cast("long")
    )
    return (
        v.groupBy("o_year")
        .agg(share.alias("mkt_share_e4"))
        .orderBy("o_year")
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(FLOOR(
             CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                           THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                     AS DECIMAL(18,4))
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             * 10000
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE)) AS BIGINT)
           AS promo_share_e4
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: the fraction of one month's revenue from PROMO
    parts — conditional-sum ratio in a single aggregate.

    Scale plan: the month filter pushes to the lineitem scan (at 100 TB
    with date-partitioned layout this is partition pruning, not even row
    filtering); part broadcasts; numerator and denominator share one
    aggregate pass.  Floor-scaled integer share — exact decimal sums
    divide in doubles identically on both engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        F.when(F.col("p_type") == "PROMO", vol).otherwise(zero).alias("pv"),
        vol.alias("v"),
    )
    return joined.agg(
        F.floor(
            F.sum("pv").cast("double") * 10000 / F.sum("v").cast("double")
        )
        .cast("long")
        .alias("promo_share_e4")
    )


@query(
    "small_qty_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                    / COUNT(*)) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(FLOOR(
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             / 7 * 100) AS BIGINT) AS avg_yearly_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < pq.qty_threshold
    """,
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly revenue that would be lost by refusing
    small-quantity orders of one brand — the decorrelated per-part
    average threshold pattern.

    Scale plan: the correlated scalar subquery (`avg(l_quantity) per
    part`) becomes ONE co-keyed pre-aggregation on l_partkey joined back
    to the fact on the same key — with AQE both sides co-shuffle once;
    the brand filter broadcasts from part and prunes before the
    threshold compare.  Threshold math is decimal-sum/count in doubles
    (bit-identical across engines) so the `<` can't flip rows; the
    single output row is floor-of-cents."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    pq = li.groupBy("l_partkey").agg(
        (
            0.2
            * (
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count("*")
            )
        ).alias("qty_threshold")
    )
    return (
        li.join(
            F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey",
        )
        .join(pq, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.floor(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                .cast("double")
                / 7
                * 100
            )
            .cast("long")
            .alias("avg_yearly_cents")
        )
    )


@query(
    "disjunctive_discount_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 40
           AND l.l_quantity BETWEEN 20 AND 35)
    """,
)
def disjunctive_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of brand/size/quantity
    conjunct bundles — the disjunctive-predicate pushdown test.

    Scale plan: Catalyst factors the part-only conjuncts (brand ∈ {1,2,3}
    sides of the OR) into a pushable disjunction on the part scan and
    keeps the mixed part×lineitem residual on the join; part broadcasts,
    so the fact is scanned once with NO shuffle at all.  The quantity
    bounds are plain doubles compared identically by both engines."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 25)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 35)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue")
        )
    )


@query(
    "lone_returned_supplier_orders",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN l_returnflag = 'R'
                                 THEN l_suppkey END) AS n_ret_supp
      FROM lineitem GROUP BY l_orderkey
    ), lone AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN per_order po ON po.l_orderkey = l.l_orderkey
      WHERE l.l_returnflag = 'R' AND po.n_supp > 1 AND po.n_ret_supp = 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM lone JOIN supplier s ON s.s_suppkey = lone.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_1'
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY numwait DESC, s_suppkey LIMIT 20
    """,
)
def lone_returned_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers from one nation who were the SOLE
    supplier with returned lines in multi-supplier orders — the
    EXISTS-plus-NOT-EXISTS-on-the-same-fact classic, decorrelated.

    Scale plan: a two-level aggregation instead of two COUNT(DISTINCT)s
    — distinct-ing to (order, supplier, has_returns) FIRST costs one
    fact shuffle with map-side combine and avoids the 2× Expand
    replication multiple distinct aggregates force (pinned: no Expand in
    the plan); the per-order counts and the lone-supplier pick both run
    on that already-distinct grain, orders of magnitude smaller than the
    fact.  The nation-filtered supplier dim broadcasts;
    TakeOrderedAndProject caps the result without a global sort."""
    li = table(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("has_ret")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"), F.sum("has_ret").alias("n_ret_supp")
    )
    lone = per_supp.filter(F.col("has_ret") == 1).join(
        per_order.filter(
            (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)
        ).select("l_orderkey"),
        "l_orderkey",
    ).select("l_orderkey", "l_suppkey")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        lone.join(F.broadcast(s), lone.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(20)
    )


@query(
    "cheapest_supplier_per_part",
    oracle="""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             CAST(FLOOR(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
                             AS DOUBLE)
                        * 100
                        / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)))
                               AS DOUBLE)) AS BIGINT) AS unit_cents
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT u.l_partkey, u.l_suppkey, u.unit_cents,
             row_number() OVER (
               PARTITION BY u.l_partkey
               ORDER BY u.unit_cents, u.l_suppkey
             ) AS rn
      FROM unit u
      JOIN part p ON p.p_partkey = u.l_partkey
      WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
    )
    SELECT r.l_partkey AS p_partkey, s.s_name, r.unit_cents
    FROM ranked r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.rn = 1
    ORDER BY p_partkey
    """,
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part in a filtered family, the supplier
    with the lowest observed unit price — the correlated-MIN-subquery
    classic, decorrelated into aggregate-then-pick.

    Scale plan: unit prices aggregate once on the (part, supplier)
    grain with map-side combine; the part-family filter broadcasts and
    prunes BEFORE the per-part pick; the winner per part is a min of a
    (price, supplier) struct — an aggregation, not a window, so no
    per-part sort materializes; supplier broadcasts onto the winners.
    Unit price is floor-of-cents from exact decimal sums, so the min
    can't flip between engines."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    s = table(spark, sf_dir, "supplier")
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.floor(
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
            * 100
            / F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
        )
        .cast("long")
        .alias("unit_cents")
    )
    best = (
        unit.join(
            F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))),
            "l_partkey",
        )
        .groupBy("l_partkey")
        .agg(F.min(F.struct("unit_cents", "l_suppkey")).alias("b"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("b.l_suppkey").alias("l_suppkey"),
            F.col("b.unit_cents").alias("unit_cents"),
        )
    )
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select("p_partkey", "s_name", "unit_cents")
        .orderBy("p_partkey")
    )


@query(
    "part_value_concentration",
    oracle="""
    WITH v AS (
      SELECT l_partkey,
             CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                  AS DOUBLE) AS value,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS vdec
      FROM lineitem GROUP BY l_partkey
    ), t AS (
      SELECT CAST(SUM(vdec) AS DOUBLE) AS total,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM v
    )
    SELECT v.l_partkey, v.value,
           CAST(FLOOR(CAST(v.vdec AS DOUBLE) * 1000000 / t.total) AS BIGINT)
             AS share_e6
    FROM v, t
    WHERE CAST(v.vdec AS DOUBLE) * t.n_parts > 1.5 * t.total
    ORDER BY v.value DESC, v.l_partkey
    """,
)
def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose line-item value exceeds 1.5× the
    mean per-part value — the groupwise-HAVING-vs-global-scalar pattern
    (Q11's partsupp inventory restated on the available fact).  The
    threshold is mean-relative, which is scale-free where Q11's fixed
    fraction needs per-SF retuning.

    Scale plan: one map-side-combined aggregation on l_partkey; the
    1-row global total re-aggregates the per-part rows (tiny) and
    broadcasts back as a crossJoin scalar.  The threshold compare
    multiplies instead of dividing (vd × n_parts > 1.5 × total) and all
    operands derive from exact decimal sums, so the filter can't flip
    rows between engines."""
    li = table(spark, sf_dir, "lineitem")
    ldec = F.col("l_extendedprice").cast("decimal(18,4)")
    v = li.groupBy("l_partkey").agg(
        F.round(F.sum(ldec), 2).cast("double").alias("value"),
        F.sum(ldec).alias("vdec"),  # stays DECIMAL: the global total must
        # re-sum exactly (a double re-sum would be order-dependent)
    ).localCheckpoint(eager=False)  # |parts| rows; the total and the
    # filter both consume this relation — checkpointing it means the
    # 100 TB fact aggregates ONCE, not once per consumer.  Lazy: the
    # first ACTION materializes it, so plan-only consumers (explain,
    # plans/report) never trigger the aggregation job
    t = v.agg(
        F.sum("vdec").cast("double").alias("total"),
        F.count("*").cast("long").alias("n_parts"),
    )
    vd = F.col("vdec").cast("double")
    return (
        v.crossJoin(F.broadcast(t))
        .filter(vd * F.col("n_parts") > 1.5 * F.col("total"))
        .select(
            "l_partkey",
            "value",
            F.floor(vd * 1000000 / F.col("total")).cast("long").alias("share_e6"),
        )
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@query(
    "segment_median_order",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(FLOOR(quantile_cont(
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
             0.25)) AS BIGINT) AS p25_cents,
           CAST(FLOOR(quantile_cont(
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
             0.5)) AS BIGINT) AS median_cents,
           CAST(FLOOR(quantile_cont(
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
             0.75)) AS BIGINT) AS p75_cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def segment_median_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p25/median/p75) of order value per
    market segment — the BUILT-IN percentile path, complementing
    group_quantiles' applyInPandas custom-UDAF formulation.

    Scale shape: Spark's `percentile` is a single-pass typed aggregate
    (per-partition buffers merge on the one segment-keyed shuffle) — no
    sort of the fact, no window.  Percentiles are computed over
    PRE-SCALED INTEGER CENTS, which makes the (1-g)·a + g·b
    interpolation bit-exact on BOTH engines regardless of how each one
    associates it: for quartiles g ∈ {0, ¼, ½, ¾} (exact binary
    fractions) and a, b are integers ≪ 2^53, so every product and the
    sum are exact doubles — no last-ulp drift at a FLOOR boundary is
    possible, unlike percentile-over-dollars-then-×100.  Customer
    broadcasts into the fact before the aggregate."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

    def pct_cents(q: float, name: str):
        return (
            F.floor(F.expr(f"percentile({cents}, {q})"))
            .cast("long")
            .alias(name)
        )

    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            pct_cents(0.25, "p25_cents"),
            pct_cents(0.5, "median_cents"),
            pct_cents(0.75, "p75_cents"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "shipmode_priority_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_shipdate >  o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def shipmode_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late-shipped lines split into high- vs
    low-priority order counts — the two-branch conditional aggregate
    over a date-windowed fact ⋈ fact join.  (The testdata schema has no
    l_shipmode/l_commitdate/l_receiptdate, so the group key is
    l_returnflag and "late" is ship-lag > 60 days — same plan shape.)

    Scale plan: the year window pushes into the lineitem scan
    (PushedFilters), so only in-window row groups are read BEFORE the
    join; the ship-lag predicate is a residual join filter evaluated
    during the one orderkey shuffle; both CASE branches fold into a
    single map-side-combined aggregate over a tiny group space.  No
    second pass, no Expand."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "excess_stock_suppliers",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%widget%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 40
      )
    ORDER BY s.s_suppkey
    """,
)
def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers from one region who moved excess
    volume of a name-filtered part family in a year — the nested
    semi-join chain (IN over an IN over a grouped HAVING), decorrelated.
    (No partsupp/ps_availqty in the testdata; "excess stock" is restated
    as shipped quantity > 40 on the (supplier, part) grain, and the
    geographic cut is a region — a single nation is empty at sf0.001.)

    Scale plan: the part-family filter broadcasts into the date-pruned
    lineitem scan (innermost IN becomes a broadcast semi-join BEFORE the
    aggregate); the (supplier, part) aggregate is one map-side-combined
    shuffle; HAVING prunes it to a small key set whose distinct supplier
    ids semi-join the region-filtered supplier dim.  The fact shuffles
    once and only in-window, in-family rows ever leave the scan.
    Quantity compares on exact decimal sums, so the HAVING can't flip
    between engines."""
    widgets = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(widgets), "l_partkey")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top unshipped orders of one market segment by
    open revenue — filtered 3-way star join + grouped top-k.

    Scale plan: both date predicates push into their own scans; the
    segment-filtered customer dim broadcasts into orders, and that
    (already pruned) side joins lineitem on the one orderkey shuffle.
    The final top-10 is TakeOrderedAndProject — per-partition heaps,
    no global sort.  Revenue is the exact decimal sum rounded, and the
    unique l_orderkey tie-break makes the LIMIT deterministic across
    engines."""
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "order_priority_check",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a quarter with at least one late line,
    counted by priority — EXISTS with a correlated non-equi predicate,
    decorrelated into a semi-join.  ("Late" is ship-lag > 30 days; the
    schema has no commit/receipt dates.)

    Scale plan: the quarter filter prunes the orders scan first; the
    EXISTS is a LEFT SEMI join on orderkey whose ship-lag predicate
    rides the same shuffle as a residual condition — lineitem's payload
    never shuffles, and each order emits at most once regardless of how
    many lines match.  The 5-group count is map-side combined."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from LOCAL supply chains (customer and
    supplier in the same nation) per nation of one region — the 6-way
    star join whose distinguishing predicate (c_nationkey = s_nationkey)
    links two different dimension arms of the fact.

    Scale plan: region⋈nation prunes supplier to one region and
    broadcasts; customer broadcasts with its nationkey carried; the only
    big shuffle is lineitem ⋈ (date-pruned orders) on orderkey — the
    same-nation predicate then evaluates as a residual on already-joined
    broadcast columns, never forcing a second fact shuffle."""
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(money_sum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "supplier_share_of_nation",
    oracle="""
    WITH r AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) AS rev_e4
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT n.n_name, s.s_suppkey, r.rev_e4,
           CAST(r.rev_e4 * 1000000
                // SUM(r.rev_e4) OVER (PARTITION BY n.n_name)
                AS BIGINT) AS share_e6,
           CAST(rank() OVER (PARTITION BY n.n_name
                             ORDER BY r.rev_e4 DESC, s.s_suppkey)
                AS BIGINT) AS rank_in_nation
    FROM r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """,
)
def supplier_share_of_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total analytics: each supplier's revenue as an integer
    ppm share of its nation's total, plus in-nation rank — the
    "contribution within parent group" report (market-share dashboards,
    the windowed sibling of `top_revenue_supplier`).

    Determinism: revenue quantizes the discounted product to
    DECIMAL(18,4) (the suite-wide pattern), sums exactly, and scales by
    10⁴ so the BIGINT cast is integral on both engines (×100 would
    leave 2 fractional digits, where Spark truncates but DuckDB rounds);
    the share is INTEGER division, so no float ratio ever forms; rank
    orders by (rev_e4 DESC, s_suppkey) — a total order.  (At 100 TB
    promote the ×10⁶ numerator to DECIMAL before dividing; rev_e4 × 10⁶
    approaches 2^63 around $900 B/supplier.)

    Scale shape: the fact aggregates to supplier grain first (one
    map-side combined shuffle); supplier and nation dims broadcast into
    that grain; both windows (share-of-partition sum and rank) share the
    single |suppliers|-row nation-partitioned sort — per the "windows
    over aggregated grains, never facts" rule (SCALE.md)."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev_expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = li.groupBy(F.col("l_suppkey")).agg(
        (F.sum(dec(rev_expr)) * 10000).cast("long").alias("rev_e4")
    )
    g = rev.join(F.broadcast(s), rev.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    wp = Window.partitionBy("n_name")
    wr = Window.partitionBy("n_name").orderBy(F.col("rev_e4").desc(), "s_suppkey")
    return (
        g.select(
            "n_name",
            "s_suppkey",
            "rev_e4",
            F.sum("rev_e4").over(wp).alias("_den"),
            F.rank().over(wr).cast("long").alias("rank_in_nation"),
        )
        .withColumn(
            "share_e6", F.expr("rev_e4 * 1000000 div _den").cast("long")
        )
        .select("n_name", "s_suppkey", "rev_e4", "share_e6", "rank_in_nation")
    )


@query(
    "pareto_revenue_share",
    oracle="""
    WITH s AS (
      SELECT c.c_mktsegment, o.o_custkey,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) * 100 AS BIGINT)
               AS spend_cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment, o.o_custkey
    ), r AS (
      SELECT c_mktsegment, spend_cents,
             row_number() OVER w AS rn,
             SUM(spend_cents) OVER (PARTITION BY c_mktsegment ORDER BY
                                    spend_cents DESC, o_custkey
                                    ROWS UNBOUNDED PRECEDING) AS cum_cents,
             SUM(spend_cents) OVER (PARTITION BY c_mktsegment) AS tot_cents,
             count(*) OVER (PARTITION BY c_mktsegment) AS n_customers
      FROM s
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY spend_cents DESC, o_custkey)
    )
    SELECT c_mktsegment,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(min(CASE WHEN cum_cents * 5 >= tot_cents * 4
                         THEN rn END) AS BIGINT) AS n_top_80pct,
           CAST(min(CASE WHEN cum_cents * 5 >= tot_cents * 4
                         THEN rn END) * 10000 // n_customers AS BIGINT)
             AS share_e4
    FROM r GROUP BY c_mktsegment, n_customers ORDER BY c_mktsegment
    """,
)
def pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: per market segment, the smallest number of
    top customers whose cumulative spend covers 80% of the segment's
    revenue, and what fraction of the customer base that is — the 80/20
    report behind account-prioritization decisions.

    Determinism: the cumulative window runs under a TOTAL order
    (spend DESC, custkey) over exact integer cents, and the 80%
    threshold is the integer cross-multiplication `cum·5 ≥ tot·4` — no
    float shares anywhere until the final ×10⁴ `div`.

    Scale shape: the fact aggregates to (segment, customer) grain first;
    all three windows (running sum, total, count) and the rank share ONE
    segment-partitioned sort over that grain; the threshold pick is a
    conditional MIN in the final |segments|-row rollup."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    s = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_custkey")
        .agg((F.sum(dec("o_totalprice")) * 100).cast("long").alias("spend_cents"))
    )
    wo = Window.partitionBy("c_mktsegment").orderBy(
        F.col("spend_cents").desc(), "o_custkey"
    )
    wp = Window.partitionBy("c_mktsegment")
    r = s.select(
        "c_mktsegment",
        F.row_number().over(wo).alias("rn"),
        F.sum("spend_cents")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_cents"),
        F.sum("spend_cents").over(wp).alias("tot_cents"),
        F.count("*").over(wp).alias("n_customers"),
    )
    hit = F.when(
        F.col("cum_cents") * 5 >= F.col("tot_cents") * 4, F.col("rn")
    )
    return (
        r.groupBy("c_mktsegment", F.col("n_customers").cast("long").alias("n_customers"))
        .agg(F.min(hit).cast("long").alias("n_top_80pct"))
        .withColumn(
            "share_e4",
            F.expr("n_top_80pct * 10000 div n_customers").cast("long"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "order_fulfillment_lag",
    oracle="""
    WITH lag AS (
      SELECT o.o_orderkey, o.o_orderpriority,
             date_diff('day', o.o_orderdate, max(l.l_shipdate)) AS lag_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(MIN(lag_days) AS BIGINT) AS min_lag,
           CAST(MAX(lag_days) AS BIGINT) AS max_lag,
           CAST(SUM(lag_days) * 100 // count(*) AS BIGINT) AS avg_lag_e2
    FROM lag GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def order_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-latency profile: days from order date to the LAST
    line shipment, rolled up per priority class — the SLA report every
    order pipeline runs (and the latency-distribution query shape the
    suite lacked: per-entity completion time, then class-level stats).

    Integer day differences make min/max/mean exact (mean as a
    ×100-scaled integer division).

    Scale shape: the fact joins the order dim on the fact's natural key
    — one shuffle pair co-keyed on orderkey, the per-order max
    aggregates on the SAME key (no second exchange: the join output is
    already hash-partitioned on it), and the priority rollup is a tiny
    second agg."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderpriority",
            F.datediff(F.col("last_ship"), F.col("o_orderdate"))
            .cast("long")
            .alias("lag_days"),
        )
    )
    return (
        lag.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("lag_days").cast("long").alias("min_lag"),
            F.max("lag_days").cast("long").alias("max_lag"),
            F.expr("sum(lag_days) * 100 div count(*)").cast("long").alias("avg_lag_e2"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "part_copurchase_pairs",
    oracle="""
    WITH lines AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM lines a JOIN lines b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
    FROM pairs GROUP BY part_a, part_b
    HAVING count(*) >= 2
    ORDER BY n_orders DESC, part_a, part_b LIMIT 20
    """,
)
def part_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top 20 part pairs bought together
    in the same order (support >= 2 orders) — the association-mining
    shape on the retail side (the text twin is bigram_lift_top).

    Scale shape: the self-join is keyed on the ORDER, so the pair
    explosion is bounded by lines-per-order² (a small constant) times
    |orders| — linear in the fact, never |parts|².  The distinct
    collapses multi-line part repeats first; the pair rollup map-side
    combines; top-20 is a TakeOrdered, not a global sort.  For skewed
    carts (one order with 10⁵ lines) the drop_hot_keys cap is the
    defense, same as the LSH buckets — not needed at this data's
    bounded cart size."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").cast("long").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


#: segment geometry for the ed<=2 PassJoin filter: a string of length
#: L splits into 3 segments of lengths (L div 3, (L+1) div 3, rest) —
#: all >= 1 once L >= 3, and sum == L.  Arrays are 1-indexed in Spark
#: SQL, hence the element_at(..., i + 1).
_SEG_LENS = "array({lb} div 3, ({lb} + 1) div 3, {lb} - {lb} div 3 - ({lb} + 1) div 3)"
_SEG_STARTS = "array(1, 1 + {lb} div 3, 1 + {lb} div 3 + ({lb} + 1) div 3)"


def ed2_segment_candidates(parts: DataFrame) -> DataFrame:
    """Candidate (part_a < part_b) pairs containing EVERY same-brand
    pair within edit distance 2 — the PassJoin segment filter (Li,
    Deng, Feng, Wang: 'PassJoin: A Partition-based Method for
    Similarity Joins', PVLDB 5(3), 2012) restated for k=2.

    Pigeonhole: <= 2 edits transform name_b into name_a, so at least
    one of name_b's 3 segments is untouched and appears VERBATIM in
    name_a, shifted from its home position by at most the 2 preceding
    edits.  The index side therefore emits each part's 3 exact
    segments keyed by (brand, segment ordinal, length); the query side
    emits, for every compatible target length lb in [la-2, la+2] and
    shift d in [-2, 2], the substring of name_a at the segment's home
    position + d — an equi-join on (brand, ordinal, lb, content) then
    yields a SUPERSET of the true pair set, verified afterwards by a
    banded Levenshtein.  Both sides need len >= 3 (non-empty
    segments); shorter names pair only with names of len <= 4 (the
    length band), and that tiny residue goes through the plain
    blocked quadratic — the two routes are disjoint (both >= 3 vs any
    < 3), so the union never double-counts a pair."""
    from data_integration_system_spark.operators._common import (
        parallelize_scan,
    )

    # the probe explode is ~75 rows of expression work per name: spread
    # an unsplittable small scan across cores before multiplying it
    p = parallelize_scan(parts.select("p_partkey", "p_brand", "p_name"))

    segs = F.expr(
        "transform(sequence(0, 2), i -> named_struct("
        " 'i', i,"
        f" 'st', element_at({_SEG_STARTS.format(lb='length(p_name)')}, i + 1),"
        f" 'ln', element_at({_SEG_LENS.format(lb='length(p_name)')}, i + 1)))"
    )
    idx = (
        p.filter(F.length("p_name") >= 3)
        .select(
            F.col("p_partkey").alias("b_id"),
            F.col("p_brand").alias("b_brand"),
            F.col("p_name").alias("b_name"),
            F.length("p_name").alias("lb"),
            F.explode(segs).alias("s"),
        )
        .select(
            "b_id", "b_brand", "b_name", "lb",
            F.col("s.i").alias("i"),
            F.expr("substring(b_name, s.st, s.ln)").alias("sub"),
        )
    )

    # position filter (the PassJoin substring-selection tightening):
    # attribute each edit to the segment containing the character it
    # lands on (end-insertions to the last segment).  An untouched
    # FIRST segment then has nothing inserted before it -> it IS the
    # prefix (d = 0, one probe); an untouched LAST segment has nothing
    # after it -> it ends the string (d = la - lb, one probe); only the
    # middle segment needs the full +-2 shift window.  7 probes per
    # candidate length instead of 15, same exactness (pinned by the
    # brute-force corpus test).
    probes = F.expr(
        "flatten(flatten("
        " transform(sequence(greatest(length(p_name) - 2, 3),"
        "                    greatest(length(p_name) + 2, 3)), lb ->"
        "  transform(sequence(0, 2), i ->"
        "   transform("
        "    CASE WHEN i = 0 THEN array(0)"
        "         WHEN i = 2 THEN array(length(p_name) - lb)"
        "         ELSE sequence(-2, 2) END, d -> named_struct("
        "    'lb', lb,"
        "    'i', i,"
        f"    'st', element_at({_SEG_STARTS.format(lb='lb')}, i + 1) + d,"
        f"    'ln', element_at({_SEG_LENS.format(lb='lb')}, i + 1)))))))"
    )
    qry = (
        p.filter(F.length("p_name") >= 3)
        .select(
            F.col("p_partkey").alias("a_id"),
            F.col("p_brand").alias("a_brand"),
            F.col("p_name").alias("a_name"),
            F.explode(probes).alias("s"),
        )
        # in-bounds probes only; lb can exceed la+2 via the greatest()
        # guard on degenerate lengths, so re-check the band explicitly
        .filter(
            (F.col("s.st") >= 1)
            & (F.col("s.st") + F.col("s.ln") - 1 <= F.length("a_name"))
            & (F.abs(F.col("s.lb") - F.length("a_name")) <= 2)
        )
        .select(
            "a_id", "a_brand", "a_name",
            F.col("s.lb").alias("lb"),
            F.col("s.i").alias("i"),
            F.expr("substring(a_name, s.st, s.ln)").alias("sub"),
        )
    )

    # ids ONLY through the candidate join: on a match-dense corpus each
    # true pair is re-found by up to ~75 probe keys, and carrying the
    # name strings through that multiplicity dominates the shuffle —
    # dedup the narrow (id, id) rows first (map-side partial), then
    # join the two names back once per UNIQUE pair.  The join-back /
    # residue sides read the RAW parts relation, not the parallelized
    # one (r18): they feed broadcasts and a tiny quadratic — the
    # round-robin respread only helps the probe explode, and it was
    # costing one Exchange per broadcast side (plan: 3 Exchanges under
    # BroadcastExchange removed).
    names = parts.select(
        F.col("p_partkey").alias("nid"), F.col("p_name").alias("nm")
    )
    passjoin = (
        qry.drop("a_name")
        .join(idx.drop("b_name"), ["lb", "i", "sub"])
        .filter(
            (F.col("a_brand") == F.col("b_brand"))
            & (F.col("a_id") != F.col("b_id"))
        )
        .select(
            F.least("a_id", "b_id").alias("part_a"),
            F.greatest("a_id", "b_id").alias("part_b"),
        )
        .dropDuplicates(["part_a", "part_b"])
        .join(names.withColumnRenamed("nid", "part_a")
              .withColumnRenamed("nm", "name_a"), "part_a")
        .join(names.withColumnRenamed("nid", "part_b")
              .withColumnRenamed("nm", "name_b"), "part_b")
        .select("part_a", "part_b", "name_a", "name_b")
    )

    # residue: pairs where a side has len < 3 (unsegmentable index) —
    # the distance bound forces the other side to len <= 4, so the
    # quadratic runs shorts x (len <= 4) only
    shorts = parts.select("p_partkey", "p_brand", "p_name").filter(
        F.length("p_name") < 3
    )
    small = parts.select("p_partkey", "p_brand", "p_name").filter(
        F.length("p_name") <= 4
    )
    residue = (
        shorts.alias("x")
        .join(
            small.alias("y"),
            (F.col("x.p_brand") == F.col("y.p_brand"))
            & (F.col("x.p_partkey") != F.col("y.p_partkey")),
        )
        .select(
            F.least("x.p_partkey", "y.p_partkey").alias("part_a"),
            F.greatest("x.p_partkey", "y.p_partkey").alias("part_b"),
            F.when(F.col("x.p_partkey") < F.col("y.p_partkey"), F.col("x.p_name"))
            .otherwise(F.col("y.p_name")).alias("name_a"),
            F.when(F.col("x.p_partkey") < F.col("y.p_partkey"), F.col("y.p_name"))
            .otherwise(F.col("x.p_name")).alias("name_b"),
        )
    )

    # the two routes are disjoint (index side len >= 3 vs shorts < 3)
    # and passjoin is already deduped, so only the residue can carry a
    # duplicate (a pair where BOTH sides are short appears once per
    # ordering) — dedup the tiny residue instead of re-shuffling the
    # whole union (r18: removes the post-union Exchange + SortAggregate)
    return passjoin.unionByName(
        residue.dropDuplicates(["part_a", "part_b"])
    )


@query(
    "part_name_near_matches",
    oracle="""
    WITH p AS (SELECT p_partkey, p_brand, p_name FROM part)
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM p a JOIN p b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY part_a, part_b
    """,
)
def part_name_near_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution: part pairs whose names are within edit
    distance 2, blocked by brand — the dirty-catalog matching task
    (typo'd product names, OCR'd records) the dedup family's
    set-similarity ops don't cover; Levenshtein is character-level
    where shingles are token-level.

    Both engines implement the standard edit distance, so the pair
    relation carries a full value-hash oracle — rare for a fuzzy op.

    Scale shape (r12): candidate generation is the PassJoin segment
    filter (ed2_segment_candidates) — linear emit (3 index segments, a
    bounded ~75 probe substrings per name) + one fine-grained equi-hash
    join — instead of the blocked quadratic, whose in-block pair count
    grows with block size squared; the banded Levenshtein then runs on
    candidates (near-output-sized), not on every same-brand length-band
    pair.  Exactness is the PassJoin pigeonhole (every true pair shares
    a shifted exact segment), pinned against a brute-force ED join on
    an adversarial random corpus in tests/test_properties.py.
    THRESHOLD Levenshtein
    (2k+1-band DP, Spark 3.5+) verifies; for kept rows (<= 2) the
    banded distance IS the true distance, so the oracle's plain
    levenshtein still value-hash-matches."""
    p = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    cand = ed2_segment_candidates(p)
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), 2)
    return (
        cand.select(
            "part_a", "part_b", dist.cast("long").alias("edit_dist")
        )
        # threshold form returns -1 above the bound; keep real matches
        .filter((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= 2))
        .orderBy("part_a", "part_b")
    )


@query(
    "nation_supplier_concentration",
    oracle="""
    WITH r AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) * 10000 AS BIGINT) AS rev_e4
      FROM lineitem GROUP BY l_suppkey
    ), rs AS (
      SELECT s.s_nationkey, r.rev_e4,
             SUM(r.rev_e4) OVER (PARTITION BY s.s_nationkey) AS tot
      FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    ), sh AS (
      SELECT s_nationkey, rev_e4 * 10000 // tot AS share_e4 FROM rs
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           CAST(max(share_e4) AS BIGINT) AS top_share_e4,
           CAST(SUM(share_e4 * share_e4) AS BIGINT) AS hhi_e8
    FROM sh JOIN nation n ON n.n_nationkey = sh.s_nationkey
    GROUP BY n.n_name ORDER BY n.n_name
    """,
)
def nation_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration report: per nation, the Herfindahl index of
    supplier revenue shares (e8-scaled: 10^8 = monopoly), the top
    supplier's share, and the supplier count — the antitrust/market-
    structure metric family, exactly oracle-checked because shares are
    integer e4 fractions of an exact e4-cent revenue sum (the decimal
    x 10^4 integral-scaling rule; x 100 would leave fractional digits
    where the engines' casts disagree).

    Scale shape: one fact aggregation to the supplier grain, a
    broadcast dim attach, ONE nation-keyed window computing totals and
    shares in the same pass, and a tiny |nations| rollup."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    r = li.groupBy("l_suppkey").agg(
        (F.sum(dec(rev)) * 10000).cast("long").alias("rev_e4")
    )
    w = Window.partitionBy("s_nationkey")
    sh = (
        r.join(F.broadcast(s), r.l_suppkey == s.s_suppkey)
        .select("s_nationkey", "rev_e4", F.sum("rev_e4").over(w).alias("tot"))
        .select("s_nationkey", F.expr("rev_e4 * 10000 div tot").alias("share_e4"))
    )
    return (
        sh.join(F.broadcast(n), sh.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.max("share_e4").cast("long").alias("top_share_e4"),
            F.sum(F.col("share_e4") * F.col("share_e4")).cast("long").alias("hhi_e8"),
        )
        .orderBy("n_name")
    )
