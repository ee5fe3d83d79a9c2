"""Skew-mitigation helpers: salting for hot keys (SURVEY §4.1 — the
per-domain-semaphore problem's batch analog: real web data is domain- and
content-skewed, so one hot key can stall a 1000-executor stage).

AQE's skew-join handling (enabled in session conf) covers sort-merge
joins at runtime; these helpers cover the cases AQE doesn't: skewed
AGGREGATION keys, and broadcast-infeasible skewed joins where you choose
the salt fan-out explicitly.

Both are semantics-preserving rewrites — tests assert equality with the
unsalted plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: per-row salt that varies WITHIN a key (salting BY the key would
#: defeat the point).  NOT spark_partition_id: that is constant per
#: input partition, so when the hot key is co-located (key-partitioned
#: layout — exactly the case that needs salting) every hot row would get
#: the same salt.  monotonically_increasing_id varies per row.
def _row_salt(n: int) -> Column:
    return F.pmod(F.monotonically_increasing_id(), F.lit(n))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, str],
    n_salt: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: phase 1 aggregates on
    (key, salt) — the hot key's rows spread over n_salt reducers — and
    phase 2 combines the partials on key alone.

    `aggs` maps column -> one of count/sum/min/max (the re-aggregable
    functions; avg must be decomposed into sum+count by the caller).
    Output columns are named `{fn}_{col}` (count: `count`).
    """
    combine = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    phase1 = df.withColumn("_salt", _row_salt(n_salt)).groupBy(key, "_salt")
    p1_cols = []
    for col, fn in aggs.items():
        name = "count" if fn == "count" else f"{fn}_{col}"
        p1_cols.append(getattr(F, fn)(col if fn != "count" else "*").alias(name))
    partial = phase1.agg(*p1_cols)
    p2_cols = []
    for col, fn in aggs.items():
        name = "count" if fn == "count" else f"{fn}_{col}"
        p2_cols.append(combine[fn](name).alias(name))
    return partial.groupBy(key).agg(*p2_cols)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 8,
) -> DataFrame:
    """Equi-join robust to a skewed key on the big side: big rows get a
    per-row salt, the small side is replicated n_salt times, and the join
    key becomes (key, salt) — the hot key's probe rows land on n_salt
    reducers instead of one.

    Cost: small side shuffled ×n_salt (or broadcast ×1 if it fits —
    then you don't need salting at all; this is for the mid-size dim
    that's too big to broadcast but joins a skewed fact)."""
    big_s = big.withColumn("_salt", _row_salt(n_salt))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt")
    small_r = small.select("*", salts)
    out = big_s.join(small_r, on=[key, "_salt"]).drop("_salt")
    return out


def skew_report(df: DataFrame, keys: list[str], top_n: int = 5) -> dict:
    """Diagnose key skew before choosing a mitigation: per-key row-count
    distribution (p50/p90/p99/max), key cardinality, and the heaviest
    keys with their share of all rows.

    The decision rule this feeds: max/p50 under ~10 → AQE alone is
    fine; a handful of heavy keys → drop_hot_keys or broadcast them
    separately; a heavy TAIL (p99 ≫ p50) → salted_agg/salted_join with
    fan-out ≈ max/p50.  One aggregation pass to the key grain plus a
    tiny stats pass — run it on a sample at 100 TB.

    Returns a plain dict (driver-side scalars) — this is a diagnostic,
    not a dataset."""
    # materialize the key grain ONCE: three actions follow (isEmpty,
    # stats agg, top-N collect) and the full input aggregation is the
    # expensive part on the very large/skewed inputs this targets
    counts = df.groupBy(*keys).count().localCheckpoint()
    if counts.isEmpty():  # empty input: report zeros, not a TypeError
        return {
            "n_keys": 0, "p50": 0, "p90": 0, "p99": 0, "max": 0,
            "skew_ratio": 0.0, "top_keys": [],
        }
    stats = counts.agg(
        F.count("*").alias("n_keys"),
        F.expr("percentile_approx(count, 0.5)").alias("p50"),
        F.expr("percentile_approx(count, 0.9)").alias("p90"),
        F.expr("percentile_approx(count, 0.99)").alias("p99"),
        F.max("count").alias("mx"),
        F.sum("count").alias("total"),
    ).head()
    top = [
        {"key": {k: r[k] for k in keys}, "rows": r["count"],
         "share_e4": int(r["count"] * 10000 // stats["total"])}
        for r in counts.orderBy(F.col("count").desc(), *keys).limit(top_n).collect()
    ]
    return {
        "n_keys": stats["n_keys"],
        "p50": stats["p50"],
        "p90": stats["p90"],
        "p99": stats["p99"],
        "max": stats["mx"],
        "skew_ratio": (stats["mx"] / max(stats["p50"], 1)),
        "top_keys": top,
    }
