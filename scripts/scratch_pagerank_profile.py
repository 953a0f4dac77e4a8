"""Scratch: decompose pagerank — graph build vs iteration tail, and the
layout variant's effect on the tail, all in one warm session."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
    _PR_ITERS,
)
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, run_noop


def build(spark, sf_dir, layout: bool):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    e0 = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = e0.unionAll(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = edges.join(deg, "src")
    if layout:
        p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        ew = ew.repartition(p, "src").sortWithinPartitions("src")
    edges_w = ew.persist()
    nodes = edges.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = nodes.crossJoin(F.broadcast(nn)).persist()
    return edges_w, base


def tail(base, edges_w, broadcast_ranks=False, damp=0.85):
    ranks = base.select("node", F.round(F.lit(1.0) / F.col("n"), 6).alias("pr"))
    for _ in range(_PR_ITERS):
        r_in = F.broadcast(ranks) if broadcast_ranks else ranks
        contribs = (
            edges_w.join(r_in, edges_w.src == r_in.node)
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
    spark = get_spark("scratch_pagerank_profile")
    spark.sparkContext.setLogLevel("ERROR")
    for layout in (False, True, False, True):
        t0 = time.perf_counter()
        edges_w, base = build(spark, SF_DIR, layout)
        run_noop(edges_w)
        run_noop(base)
        t_build = time.perf_counter() - t0
        ts = [run_noop(tail(base, edges_w)) for _ in range(3)]
        tb = [run_noop(tail(base, edges_w, broadcast_ranks=True)) for _ in range(3)]
        print(
            f"layout={layout} build={t_build:5.2f} "
            f"tail_shuffle best={min(ts):5.2f} {[round(t,2) for t in ts]} "
            f"tail_bcast best={min(tb):5.2f} {[round(t,2) for t in tb]}",
            flush=True,
        )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
