"""Scratch r16 (VERDICT r15 #5): textrank_keywords — apply the pagerank
loop discipline: persist the loop-invariant weighted edge relation
(currently the explode+distinct edge pipeline, deg AND nodes recompute
from the raw documents scan on every one of the 4 iterations, because
the per-iteration localCheckpoint splits the plan into jobs that cannot
reuse exchanges), drop the per-iteration separate deg join (fold deg
into the persisted relation), and drop the nodes left join (the
bidirectional union makes contrib cover every node)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans.text_analysis import (
    _TR_DAMP,
    _TR_ITERS,
    _TR_TOPK,
)
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def textrank_v2(spark, sf_dir, checkpoint=False):
    toks = "filter(split(trim(text), '[ \\\\t\\\\n\\\\x0B\\\\f\\\\r]+'), x -> x != '')"
    pairs = (
        f"zip_with(slice({toks}, 1, greatest(size({toks}) - 1, 0)), "
        f"slice({toks}, 2, greatest(size({toks}) - 1, 0)), "
        f"(a, b) -> named_struct('a', least(a, b), 'b', greatest(a, b)))"
    )
    d = load(spark, sf_dir, "documents")
    e0 = (
        d.select(F.explode(F.expr(pairs)).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    edges = e0.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges_w = edges.join(deg, "src").persist()
    nodes = edges_w.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()
    ranks = nodes.select("node", F.round(F.lit(1.0) / n_nodes, 6).alias("pr"))
    for _ in range(_TR_ITERS):
        contrib = (
            edges_w.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("contrib"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            F.round(
                F.lit(0.15) / n_nodes + F.lit(_TR_DAMP) * F.col("contrib"), 6
            ).alias("pr"),
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return (
        ranks.select(F.col("node").alias("word"), F.col("pr").alias("textrank"))
        .orderBy(F.desc("textrank"), "word")
        .limit(_TR_TOPK)
    )


def main() -> None:
    spark = get_spark("scratch_textrank_r16")
    spark.sparkContext.setLogLevel("ERROR")
    q0 = relational.QUERIES["textrank_keywords"]
    a = sorted(map(tuple, q0(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, textrank_v2(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    assert a == b, f"DIVERGED: {a[:3]} vs {b[:3]}"
    print(f"rows identical ({len(a)})")
    report(
        ab(
            spark,
            {
                "v0": q0,
                "v2_persist": textrank_v2,
                "v2_ckpt": lambda s, d: textrank_v2(s, d, checkpoint=True),
            },
            reps=3,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
