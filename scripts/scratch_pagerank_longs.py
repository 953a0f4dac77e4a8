"""Scratch: pagerank with long node keys through the loop (cust=2k,
supp=2k+1), strings decoded only at the output edge, plus the
pre-partitioned persisted layout.  Same addends, same per-iteration
rounding -> identical values."""

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


def pagerank_longs(spark: SparkSession, sf_dir: str, damp=0.85, layout=True):
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
    return ranks.select(
        F.when(F.col("node") % 2 == 0, F.concat(F.lit("c"), (F.col("node") / 2).cast("long").cast("string")))
        .otherwise(F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("long").cast("string")))
        .alias("node"),
        "pr",
    )


def main() -> None:
    spark = get_spark("scratch_pagerank_longs")
    spark.sparkContext.setLogLevel("ERROR")
    base_q = relational.QUERIES["pagerank_customer_supplier"]
    a = sorted(map(tuple, base_q(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, pagerank_longs(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    assert a == b, f"DIVERGED: {[x for x in a[:5]]} vs {[x for x in b[:5]]}"
    print(f"rows identical ({len(a)} rows)")
    report(
        ab(
            spark,
            {
                "pagerank_base": base_q,
                "pagerank_longs_layout": lambda s, d: pagerank_longs(s, d),
                "pagerank_longs_nolayout": lambda s, d: pagerank_longs(s, d, layout=False),
            },
            reps=4,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
