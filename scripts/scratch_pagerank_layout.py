"""Scratch: pagerank — persist loop invariants pre-partitioned on the
join key so each iteration reuses the exchange instead of re-shuffling
the edge relation (guide 2.4)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
    _PR_ITERS,
)
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def pagerank_variant(spark: SparkSession, sf_dir: str, layout: bool, damp=0.85):
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
    spark = get_spark("scratch_pagerank")
    spark.sparkContext.setLogLevel("ERROR")
    base_q = relational.QUERIES["pagerank_customer_supplier"]
    a = sorted(map(tuple, base_q(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, pagerank_variant(spark, SF_DIR, True).collect()))
    spark.catalog.clearCache()
    assert a == b, f"DIVERGED: {a[:3]} vs {b[:3]}"
    print(f"rows identical ({len(a)} rows)")
    report(
        ab(
            spark,
            {
                "pagerank_base": base_q,
                "pagerank_layout": lambda s, d: pagerank_variant(s, d, True),
            },
            reps=3,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
