"""Scratch r16 phase 2: pagerank tail restructure variants, interleaved.

V0: registered query (baseline).
V1: drop the per-iteration base left join — on the BIDIRECTIONAL graph
    every node appears as a dst, so contribs covers the full node
    domain and the left join's coalesce(contrib, 0) never fires; the
    damping term's n comes from a 1-row broadcast crossJoin instead.
V2: V1 + cached edges repartitioned to a small P on the join key.
V3: V2 + nodes derived from the CACHED edges_w (the current code
    recomputes the fact join+distinct a second time for the node set).

Each variant is row-compared against V0 before timing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
    _PR_ITERS,
)
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def variant(spark, sf_dir, drop_base_join: bool, part: int | None, nodes_from_cache: bool):
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
    nsrc = edges_w if nodes_from_cache else edges
    nodes = nsrc.select(F.col("src").alias("node")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = nodes.crossJoin(F.broadcast(nn)).persist()
    ranks = base.select("node", F.round(F.lit(1.0) / F.col("n"), 6).alias("pr"))
    damp = 0.85
    for _ in range(_PR_ITERS):
        contribs = (
            edges_w.join(ranks, edges_w.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("contrib"))
        )
        if drop_base_join:
            ranks = contribs.crossJoin(F.broadcast(nn)).select(
                F.col("dst").alias("node"),
                F.round(
                    F.lit(0.15) / F.col("n") + F.lit(damp) * F.col("contrib"), 6
                ).alias("pr"),
            )
        else:
            ranks = base.join(contribs, base.node == contribs.dst, "left").select(
                "node",
                F.round(
                    F.lit(0.15) / F.col("n")
                    + F.lit(damp) * F.coalesce(F.col("contrib"), F.lit(0.0)),
                    6,
                ).alias("pr"),
            )
    return ranks.select(
        F.when(
            F.col("node") % 2 == 0,
            F.concat(F.lit("c"), F.shiftright("node", 1).cast("string")),
        )
        .otherwise(F.concat(F.lit("s"), F.shiftright("node", 1).cast("string")))
        .alias("node"),
        "pr",
    )


def main() -> None:
    spark = get_spark("scratch_pagerank_r16b")
    spark.sparkContext.setLogLevel("ERROR")
    base_q = relational.QUERIES["pagerank_customer_supplier"]
    a = sorted(map(tuple, base_q(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    for label, kw in [
        ("v1", dict(drop_base_join=True, part=None, nodes_from_cache=False)),
        ("v3", dict(drop_base_join=True, part=1, nodes_from_cache=True)),
    ]:
        b = sorted(map(tuple, variant(spark, SF_DIR, **kw).collect()))
        spark.catalog.clearCache()
        assert a == b, f"{label} DIVERGED"
        print(f"{label}: rows identical ({len(a)})")
    report(
        ab(
            spark,
            {
                "v0_base": base_q,
                "v1_nobasejoin": lambda s, d: variant(s, d, True, None, False),
                "v2_nobase_p1": lambda s, d: variant(s, d, True, 1, False),
                "v3_nb_p1_nfc": lambda s, d: variant(s, d, True, 1, True),
            },
            reps=3,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
