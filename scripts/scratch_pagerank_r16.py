"""Scratch r16: re-prove pagerank under driver-like conditions (VERDICT
r15 #1) and measure the iteration tail's partition-count sensitivity.

Phase 1 — bench-shape reproduction: time the REGISTERED query exactly
like bench.py does (rep1 cold build + rep2 cache-hot, best-of-2, noop
sink, clearCache after the pair) several times, to see whether the
driver's 6.04s at 32c is the cold rep, the warm rep, or a cache-reuse
failure between reps.

Phase 2 — tail decomposition: persist the graph, then time the
5-iteration tail with the cached edge relation left as-is (current
shape) vs pre-partitioned on the join key to a SMALL partition count
(P in {1, 2, 4, 8, 32}) — VERDICT r15 #1's "bound the loop's shuffle
partitions to the dim-sized rank frame".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
    _PR_ITERS,
)
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, run_noop


def build(spark, sf_dir, part: int | None):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            (F.col("o_custkey").cast("long") * 2).alias("src"),
            (F.col("l_suppkey").cast("long") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = edges.join(deg, "src")
    if part is not None:
        ew = ew.repartition(part, "src")
    edges_w = ew.persist()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = nodes.crossJoin(F.broadcast(nn)).persist()
    return edges_w, base


def tail(base, edges_w, damp=0.85):
    ranks = base.select("node", F.round(F.lit(1.0) / F.col("n"), 6).alias("pr"))
    for _ in range(_PR_ITERS):
        contribs = (
            edges_w.join(ranks, edges_w.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("contrib"))
        )
        ranks = base.join(contribs, base.node == contribs.dst, "left").select(
            "node",
            F.round(
                F.lit(0.15) / F.col("n")
                + F.lit(damp) * F.coalesce(F.col("contrib"), F.lit(0.0)),
                6,
            ).alias("pr"),
        )
    return ranks


def main() -> None:
    spark = get_spark("scratch_pagerank_r16")
    spark.sparkContext.setLogLevel("ERROR")
    q = relational.QUERIES["pagerank_customer_supplier"]

    # bench-identical warmup
    run_noop(relational.QUERIES["flagship_top5_customers_by_order_count"](spark, SF_DIR))

    print("== phase 1: bench-shape reps of the registered query ==")
    for trial in range(3):
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            run_noop(q(spark, SF_DIR))
            reps.append(round(time.perf_counter() - t0, 2))
        spark.catalog.clearCache()
        print(f"trial {trial}: rep1={reps[0]} rep2={reps[1]} best={min(reps)}")

    print("== phase 2: tail vs cached-edge partition count ==")
    for part in [None, 1, 2, 4, 8, 32]:
        edges_w, base = build(spark, SF_DIR, part)
        edges_w.count()  # materialize the cache outside the timed region
        base.count()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_noop(tail(base, edges_w))
            ts.append(round(time.perf_counter() - t0, 2))
        print(f"edges part={str(part):>4}: tail reps={ts} best={min(ts)}")
        spark.catalog.clearCache()

    spark.stop()


if __name__ == "__main__":
    main()
