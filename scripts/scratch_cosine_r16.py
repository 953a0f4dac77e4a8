"""Scratch r16 (VERDICT r15 #6): basket-ARRAY pair generation for the
two co-occurrence cosine queries — one collect_set shuffle on the order
key replaces the op.distinct + self-join (distinct's (o,p) exchange +
the join's hash(o) exchange + two SMJ sorts); pairs then come from an
in-row HOF over the sorted basket array, and for the threshold query
the DIMSUM degree-ratio prune still fires map-side (broadcast degree
join) BEFORE the pair aggregate's exchange."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report

# sorted basket -> array of (u, v) structs with u < v
_PAIRS = (
    "flatten(transform(ps, (x, i) -> "
    "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"
)


def _baskets(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_orderkey").alias("o"))
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )


def item_item_v2(spark, sf_dir, k=5):
    baskets = _baskets(spark, sf_dir)
    deg = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    pairs = baskets.select(F.explode(F.expr(_PAIRS)).alias("e")).select(
        F.col("e.u").alias("p_a"), F.col("e.v").alias("p_b")
    )
    cooc = pairs.groupBy("p_a", "p_b").agg(F.count(F.lit(1)).alias("c"))
    sym = cooc.select(
        F.col("p_a").alias("item"), F.col("p_b").alias("neighbor"), "c"
    ).unionAll(
        cooc.select(F.col("p_b").alias("item"), F.col("p_a").alias("neighbor"), "c")
    )
    da = deg.select(F.col("p").alias("item"), F.col("n_orders").alias("n_i"))
    db = deg.select(F.col("p").alias("neighbor"), F.col("n_orders").alias("n_j"))
    scored = (
        sym.join(F.broadcast(da), "item")
        .join(F.broadcast(db), "neighbor")
        .select(
            "item",
            "neighbor",
            "c",
            F.round(
                F.col("c").cast("double")
                / F.sqrt(F.col("n_i").cast("double") * F.col("n_j")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), "neighbor")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "item",
            "neighbor",
            F.col("c").cast("long").alias("cooc"),
            "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def threshold_v2(spark, sf_dir, tau_num=1, tau_den=10):
    n2, d2 = tau_num * tau_num, tau_den * tau_den
    baskets = _baskets(spark, sf_dir)
    deg = (
        baskets.select(F.explode("ps").alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = baskets.select(F.explode(F.expr(_PAIRS)).alias("e")).select(
        F.col("e.u").alias("u"), F.col("e.v").alias("v")
    )
    du = deg.select(F.col("p").alias("u"), F.col("n").alias("n_u"))
    dv = deg.select(F.col("p").alias("v"), F.col("n").alias("n_v"))
    pruned = (
        pairs.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .filter(
            (F.lit(n2) * F.col("n_v") <= F.lit(d2) * F.col("n_u"))
            & (F.lit(n2) * F.col("n_u") <= F.lit(d2) * F.col("n_v"))
        )
    )
    cooc = pruned.groupBy("u", "v", "n_u", "n_v").agg(
        F.count(F.lit(1)).alias("c")
    )
    cw = F.col("c").cast("decimal(19,0)")
    return (
        cooc.filter(
            cw * cw * F.lit(d2)
            >= F.col("n_u").cast("decimal(19,0)")
            * F.col("n_v").cast("decimal(19,0)")
            * F.lit(n2)
        )
        .select(
            "u",
            "v",
            F.col("c").cast("long").alias("cooc"),
            F.round(
                F.col("c").cast("double")
                / F.sqrt(F.col("n_u").cast("double") * F.col("n_v")),
                6,
            ).alias("cosine"),
        )
    )


def main() -> None:
    spark = get_spark("scratch_cosine_r16")
    spark.sparkContext.setLogLevel("ERROR")
    for name, v2 in [
        ("item_item_cosine_recs", item_item_v2),
        ("cosine_threshold_pairs_pruned", threshold_v2),
    ]:
        a = sorted(map(tuple, relational.QUERIES[name](spark, SF_DIR).collect()))
        b = sorted(map(tuple, v2(spark, SF_DIR).collect()))
        assert a == b, f"{name} DIVERGED ({len(a)} vs {len(b)})"
        print(f"{name}: rows identical ({len(a)})")
    report(
        ab(
            spark,
            {
                "item_v0": relational.QUERIES["item_item_cosine_recs"],
                "item_v2_arrays": item_item_v2,
                "thresh_v0": relational.QUERIES["cosine_threshold_pairs_pruned"],
                "thresh_v2_arrays": threshold_v2,
            },
            reps=3,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
