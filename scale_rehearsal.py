"""Multi-decade scale rehearsal (VERDICT r6 next-round #4, extended).

The 100-TB claims in SCALE.md are plan-shape arguments verified at one
scale point (sf0.1).  This tool adds MEASURED decades: it synthesizes
sf1 (10x sf0.1, ~6M lineitem) and sf10 (100x, ~60M lineitem) by
deterministic replication of the driver's sf0.1 tables, times the
heavy queries and the index builds across each decade, and reports
scaling exponents  e = log(t_big / t_small) / log(10)  — near 1.0 is
linear, >1.2 deserves a plan audit.  Two decades matter: at sf0.1→sf1
fixed overheads (scheduling, broadcast builds) deflate e; the
sf1→sf10 decade is data-dominated and the honest read.

Replication preserves the star schema and distributions without
degenerate duplication:

* dims region/nation copy through; every other table gets replicas
  with all surrogate keys shifted by k * KEY_OFFSET so FK joins land
  within the replica (the join fan-outs per key stay exactly sf0.1's).
* documents.text goes through an INJECTIVE letter permutation per
  replica — alphabet rotations for the 10 sf1 replicas, the affine
  family x -> a*x + b (mod 26), a coprime to 26, for the 100 sf10
  replicas (312 distinct maps available, so no two replicas share a
  transform).  Replicas are therefore NOT near-duplicates of each
  other: shingle/minhash/simhash dedup sees a bigger corpus with
  sf0.1's duplicate RATE, not an artificial clone cluster per doc
  (which would grow pair output quadratically and measure the data
  artifact, not the plan).
* embeddings rotate their 64 dimensions by k (norm-preserving,
  in-replica geometry intact) and flip sign every 64 replicas so the
  sf10 wrap-around can't mint exact-duplicate vectors.
* events keep their time range (replica-x density per day — volume
  growth, the realistic shape), with event_id/user_id shifted.

Usage:
    python scale_rehearsal.py --generate          # build .scale/sf1
    python scale_rehearsal.py --time              # sf0.1 vs sf1
    python scale_rehearsal.py --generate-sf10     # build .scale/sf10
    python scale_rehearsal.py --time-sf10         # sf1 vs sf10
Writes SCALE_REHEARSAL.json (first decade) / SCALE_REHEARSAL_D2.json.
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
SF10 = os.path.join(HERE, ".scale", "sf10")
KEY_OFFSET = 100_000_000
EMB_DIM = 64

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

#: multiplicative units mod 26 — the 'a' of the affine letter maps
_UNITS = (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)


def _rotation_map(k: int) -> tuple[str, str]:
    src = _ALPHA + _ALPHA_U
    dst = (_ALPHA[k % 26:] + _ALPHA[:k % 26])
    return src, dst + dst.upper()


def _affine_map(k: int) -> tuple[str, str]:
    """k-th member of the affine letter-permutation family x -> a*x + b
    (mod 26): injective in k for k < 312, so 100 sf10 replicas never
    share a transform (two replicas sharing one would make their docs
    EXACT duplicates and quadratically distort dedup timings)."""
    a, b = _UNITS[k % 12], k // 12
    dst = "".join(_ALPHA[(a * i + b) % 26] for i in range(26))
    return _ALPHA + _ALPHA_U, dst + dst.upper()


def generate(spark, src: str, out: str, n_replicas: int, letter_map) -> None:
    from pyspark.sql import functions as F

    from data_integration_system_spark.catalog import table

    os.makedirs(out, exist_ok=True)
    reps = spark.range(n_replicas).select(F.col("id").cast("int").alias("__k"))
    # scale output file counts with the replica factor so the bigger
    # dataset keeps ~the same rows-per-file (scan parallelism grows)
    fanout = max(8, 8 * n_replicas // 10)

    def shift(col: str):
        return (F.col(col) + F.col("__k").cast("long") * KEY_OFFSET).alias(col)

    def write(df, name: str, n_files: int | None = None) -> None:
        tgt = f"{out}/{name}.parquet"
        if os.path.exists(f"{tgt}/_SUCCESS"):
            print(f"  {name}: exists, skipped")
            return
        df.repartition(n_files or fanout).write.mode("overwrite").parquet(tgt)
        print(f"  {name}: written")

    # dims copy through unchanged
    for name in ("region", "nation"):
        write(table(spark, src, name), name, n_files=1)

    cust = table(spark, src, "customer").crossJoin(F.broadcast(reps))
    write(cust.select(shift("c_custkey"), "c_name", "c_nationkey",
                      "c_acctbal", "c_mktsegment"), "customer")

    supp = table(spark, src, "supplier").crossJoin(F.broadcast(reps))
    write(supp.select(shift("s_suppkey"), "s_name", "s_nationkey",
                      "s_acctbal"), "supplier")

    part = table(spark, src, "part").crossJoin(F.broadcast(reps))
    write(part.select(shift("p_partkey"), "p_name", "p_brand", "p_type",
                      "p_size", "p_retailprice"), "part")

    orders = table(spark, src, "orders").crossJoin(F.broadcast(reps))
    write(orders.select(shift("o_orderkey"), shift("o_custkey"),
                        "o_orderstatus", "o_totalprice", "o_orderdate",
                        "o_orderpriority"), "orders")

    li = table(spark, src, "lineitem").crossJoin(F.broadcast(reps))
    write(li.select(shift("l_orderkey"), shift("l_partkey"),
                    shift("l_suppkey"), "l_linenumber", "l_quantity",
                    "l_extendedprice", "l_discount", "l_tax",
                    "l_returnflag", "l_linestatus", "l_shipdate"),
          "lineitem")

    ev = table(spark, src, "events").crossJoin(F.broadcast(reps))
    write(ev.select(shift("event_id"), "ts", shift("user_id"),
                    "event_type", "value", "props"), "events")

    # documents: injective letter permutation per replica (see module
    # docstring) so replicas are not near-duplicates of each other
    docs = table(spark, src, "documents").crossJoin(F.broadcast(reps))
    text = F.col("text")
    permuted = text
    for k in range(n_replicas - 1, 0, -1):
        s, d = letter_map(k)
        permuted = F.when(F.col("__k") == k, F.translate(text, s, d)).otherwise(permuted)
    write(docs.select(shift("doc_id"), permuted.alias("text"), "lang",
                      "source", "n_chars"), "documents")

    # embeddings: rotate dimensions by k (norm-preserving) and flip the
    # sign every EMB_DIM replicas so the wrap can't mint exact dups
    emb = table(spark, src, "embeddings").crossJoin(F.broadcast(reps))
    rolled = F.expr(
        "transform(sequence(0, size(embedding) - 1), "
        "i -> element_at(embedding, int(pmod(i + __k, size(embedding))) + 1)"
        f" * (1 - 2 * (int(__k / {EMB_DIM}) % 2)))"
    ).cast("array<float>")
    write(emb.select(shift("vec_id"), rolled.alias("embedding"), "label"),
          "embeddings")


def time_index_builds(spark, pairs, done: dict | None = None) -> dict:
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
        if done and "exponent" in done.get(name, {}):
            out[name] = done[name]  # resume: keep the recorded row
            continue
        row: dict = {}
        try:
            for tag, d in pairs:
                root = tempfile.mkdtemp(prefix="scale_idx_")
                try:
                    t0 = time.perf_counter()
                    fn(spark, d, f"{root}/idx")
                    row[tag] = round(time.perf_counter() - t0, 3)
                finally:
                    shutil.rmtree(root, ignore_errors=True)
            small, big = pairs[0][0], pairs[1][0]
            row["exponent"] = round(
                math.log(row[big] / row[small]) / math.log(10), 3
            )
        except Exception as ex:
            row["error"] = f"{type(ex).__name__}: {ex}"[:300]
        out[name] = row
        print(f"  {name}: {row}")
    return out


def _run_timing(spark, pairs, out_file: str) -> None:
    """Incremental: each completed surface is flushed to ``out_file``
    immediately, and a re-run skips surfaces already recorded with an
    exponent — so a long campaign survives process timeouts and resumes
    where it left off."""
    from data_integration_system_spark.registry import get_queries

    path = os.path.join(HERE, out_file)
    prev: dict = {}
    if os.path.exists(path):
        try:
            with open(path) as fh:
                prev = json.load(fh)
        except (OSError, json.JSONDecodeError):
            prev = {}
    # warmup so the small scale doesn't pay JVM startup — on the run's
    # own small side, so SPARK_GRAFT_SF_DIR relocations keep working
    get_queries()["multiway_star_join"](spark, pairs[0][1]).count()
    result = {"queries": prev.get("queries", {}), "index_build": prev.get("index_build", {})}

    def flush():
        with open(path, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)

    print("timing queries")
    for name in QUERIES:
        got = time_queries_one(spark, pairs, name, result["queries"])
        if got:
            result["queries"][name] = got
            flush()
    print("timing index builds")
    result["index_build"] = time_index_builds(spark, pairs, result["index_build"])
    flush()
    print(f"wrote {out_file}")


def time_queries_one(spark, pairs, name: str, done: dict) -> dict | None:
    """Time one query across the pair, or None when already recorded."""
    if "exponent" in done.get(name, {}):
        return None
    from data_integration_system_spark.registry import get_queries

    fn = get_queries()[name]
    row: dict = {}
    try:
        for tag, d in pairs:
            t0 = time.perf_counter()
            fn(spark, d).count()
            row[tag] = round(time.perf_counter() - t0, 3)
        small, big = pairs[0][0], pairs[1][0]
        row["exponent"] = round(math.log(row[big] / row[small]) / math.log(10), 3)
    except Exception as ex:
        row["error"] = f"{type(ex).__name__}: {ex}"[:300]
    print(f"  {name}: {row}")
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--generate", action="store_true", help="build .scale/sf1")
    ap.add_argument("--time", action="store_true", help="time sf0.1 vs sf1")
    ap.add_argument("--generate-sf10", action="store_true", help="build .scale/sf10")
    ap.add_argument("--time-sf10", action="store_true", help="time sf1 vs sf10")
    args = ap.parse_args()

    from data_integration_system_spark.session import get_spark

    spark = get_spark("scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    if args.generate:
        print("generating", SF1)
        generate(spark, SF01, SF1, 10, _rotation_map)
    if args.generate_sf10:
        print("generating", SF10)
        generate(spark, SF01, SF10, 100, _affine_map)
    if args.time:
        _run_timing(spark, [("sf0.1", SF01), ("sf1", SF1)], "SCALE_REHEARSAL.json")
    if args.time_sf10:
        _run_timing(spark, [("sf1", SF1), ("sf10", SF10)], "SCALE_REHEARSAL_D2.json")


if __name__ == "__main__":
    main()
