"""One-decade scale rehearsal (VERDICT r6 next-round #4).

The 100-TB claims in SCALE.md are plan-shape arguments verified at one
scale point (sf0.1).  This tool adds a second, measured point: it
synthesizes an sf1-equivalent dataset (10x sf0.1, ~6M lineitem) by
deterministic replication of the driver's sf0.1 tables, times the
heavy queries and the index builds at BOTH scales, and reports each
one's scaling exponent  e = log(t_sf1 / t_sf0.1) / log(10)  — near 1.0
is linear, >1.2 deserves a plan audit.

Replication preserves the star schema and distributions without
degenerate duplication:

* dims region/nation copy through; every other table gets 10 replicas
  with all surrogate keys shifted by k * KEY_OFFSET so FK joins land
  within the replica (the join fan-outs per key stay exactly sf0.1's).
* documents.text is alphabet-rotated per replica (a->b->c...), so
  replicas are NOT near-duplicates of each other: shingle/minhash/
  simhash/embedding dedup sees 10x corpora with sf0.1's duplicate
  RATE, not an artificial 10-clone cluster per doc (which would grow
  pair output 45x and measure the data artifact, not the plan).
* embeddings rotate their dimensions by k positions — norms and
  in-replica geometry preserved, cross-replica similarity decorrelated.
* events keep their time range (10x density per day — volume growth,
  the realistic shape), with event_id/user_id shifted.

Usage:
    python scale_rehearsal.py --generate          # build .scale/sf1
    python scale_rehearsal.py --time              # time both scales
    python scale_rehearsal.py --generate --time
Writes SCALE_REHEARSAL.json with per-query seconds and exponents.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

HERE = os.path.dirname(os.path.abspath(__file__))
SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(HERE, ".scale", "sf1")
KEY_OFFSET = 100_000_000
N_REPLICAS = 10

#: the heavy tier from BENCH_DETAIL (slowest suite queries) — the ones
#: whose scaling behavior actually bounds a 100 TB run
QUERIES = (
    "dedup_embedding_near",
    "dedup_minhash_near",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "multimodal_decode_meta",
    "lone_returned_supplier_orders",
    "fingerprint_overlap_pairs",
    "doc_ngram_novelty",
    "transition_reachability",
    "tfidf_top_terms",
)

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_ALPHA_U = _ALPHA.upper()


def _rotated(k: int) -> tuple[str, str]:
    src = _ALPHA + _ALPHA_U
    dst = (_ALPHA[k:] + _ALPHA[:k]) + (_ALPHA_U[k:] + _ALPHA_U[:k])
    return src, dst


def generate(spark) -> None:
    from pyspark.sql import functions as F

    from data_integration_system_spark.catalog import table

    os.makedirs(SF1, exist_ok=True)
    reps = spark.range(N_REPLICAS).select(F.col("id").cast("int").alias("__k"))

    def shift(col: str):
        return (F.col(col) + F.col("__k").cast("long") * KEY_OFFSET).alias(col)

    def write(df, name: str, n_files: int = 8) -> None:
        out = f"{SF1}/{name}.parquet"
        if os.path.exists(f"{out}/_SUCCESS"):
            print(f"  {name}: exists, skipped")
            return
        df.repartition(n_files).write.mode("overwrite").parquet(out)
        print(f"  {name}: written")

    # dims copy through unchanged
    for name in ("region", "nation"):
        write(table(spark, SF01, name), name, n_files=1)

    cust = table(spark, SF01, "customer").crossJoin(F.broadcast(reps))
    write(cust.select(shift("c_custkey"), "c_name", "c_nationkey",
                      "c_acctbal", "c_mktsegment"), "customer")

    supp = table(spark, SF01, "supplier").crossJoin(F.broadcast(reps))
    write(supp.select(shift("s_suppkey"), "s_name", "s_nationkey",
                      "s_acctbal"), "supplier")

    part = table(spark, SF01, "part").crossJoin(F.broadcast(reps))
    write(part.select(shift("p_partkey"), "p_name", "p_brand", "p_type",
                      "p_size", "p_retailprice"), "part")

    orders = table(spark, SF01, "orders").crossJoin(F.broadcast(reps))
    write(orders.select(shift("o_orderkey"), shift("o_custkey"),
                        "o_orderstatus", "o_totalprice", "o_orderdate",
                        "o_orderpriority"), "orders")

    li = table(spark, SF01, "lineitem").crossJoin(F.broadcast(reps))
    write(li.select(shift("l_orderkey"), shift("l_partkey"),
                    shift("l_suppkey"), "l_linenumber", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax",
                    "l_returnflag", "l_linestatus", "l_shipdate"),
          "lineitem")

    ev = table(spark, SF01, "events").crossJoin(F.broadcast(reps))
    write(ev.select(shift("event_id"), "ts", shift("user_id"),
                    "event_type", "value", "props"), "events")

    # documents: rotate the alphabet per replica so replicas are not
    # near-duplicates of each other (see module docstring)
    docs = table(spark, SF01, "documents").crossJoin(F.broadcast(reps))
    text = F.col("text")
    rotated = text
    for k in range(N_REPLICAS - 1, 0, -1):
        src, dst = _rotated(k)
        rotated = F.when(F.col("__k") == k, F.translate(text, src, dst)).otherwise(rotated)
    write(docs.select(shift("doc_id"), rotated.alias("text"), "lang",
                      "source", "n_chars"), "documents")

    # embeddings: rotate dimensions by k positions (norm-preserving)
    emb = table(spark, SF01, "embeddings").crossJoin(F.broadcast(reps))
    rolled = F.expr(
        "transform(sequence(0, size(embedding) - 1), "
        "i -> element_at(embedding, int(pmod(i + __k, size(embedding))) + 1))"
    ).cast("array<float>")
    write(emb.select(shift("vec_id"), rolled.alias("embedding"), "label"),
          "embeddings")


def time_queries(spark) -> dict:
    from data_integration_system_spark.registry import get_queries

    qs = get_queries()
    out: dict[str, dict] = {}
    for name in QUERIES:
        fn = qs[name]
        row: dict[str, float] = {}
        for tag, d in (("sf0.1", SF01), ("sf1", SF1)):
            t0 = time.perf_counter()
            fn(spark, d).count()
            row[tag] = round(time.perf_counter() - t0, 3)
        row["exponent"] = round(
            math.log(row["sf1"] / row["sf0.1"]) / math.log(N_REPLICAS), 3
        )
        out[name] = row
        print(f"  {name}: {row}")
    return out


def time_index_builds(spark) -> dict:
    import shutil
    import tempfile

    from data_integration_system_spark.operators.dedup import build_minhash_index
    from data_integration_system_spark.operators.similarity import build_ivf_index
    from data_integration_system_spark.operators.textops import build_fingerprint_index

    builds = {
        "minhash_index_build": build_minhash_index,
        "ivf_index_build": build_ivf_index,
        "fingerprint_index_build": build_fingerprint_index,
    }
    out: dict[str, dict] = {}
    for name, fn in builds.items():
        row: dict[str, float] = {}
        for tag, d in (("sf0.1", SF01), ("sf1", SF1)):
            root = tempfile.mkdtemp(prefix="scale_idx_")
            try:
                t0 = time.perf_counter()
                fn(spark, d, f"{root}/idx")
                row[tag] = round(time.perf_counter() - t0, 3)
            finally:
                shutil.rmtree(root, ignore_errors=True)
        row["exponent"] = round(
            math.log(row["sf1"] / row["sf0.1"]) / math.log(N_REPLICAS), 3
        )
        out[name] = row
        print(f"  {name}: {row}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--generate", action="store_true")
    ap.add_argument("--time", action="store_true")
    args = ap.parse_args()

    from data_integration_system_spark.session import get_spark

    spark = get_spark("scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    if args.generate:
        print("generating", SF1)
        generate(spark)
    if args.time:
        # warmup so sf0.1 doesn't pay JVM startup
        from data_integration_system_spark.registry import get_queries

        get_queries()["multiway_star_join"](spark, "/root/testdata/sf0.001").count()
        print("timing queries")
        result = {"queries": time_queries(spark)}
        print("timing index builds")
        result["index_build"] = time_index_builds(spark)
        with open(os.path.join(HERE, "SCALE_REHEARSAL.json"), "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
        print("wrote SCALE_REHEARSAL.json")


if __name__ == "__main__":
    main()
