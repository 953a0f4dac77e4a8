"""Scratch r16: connected_components — initialize labels with the
neighborhood min (one aggregate over the checkpointed edge relation)
instead of self-labels, which makes the old first loop round (a full
join + union-agg + checkpoint + count) unnecessary: the loop starts
from the state the old round 1 produced.  Fixpoint and result are
identical; diameter-d graphs now take d loop rounds instead of d+1."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR


def cc_v2(edges: DataFrame, src="id_a", dst="id_b", max_iter: int = 20) -> DataFrame:
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select("a", F.least(F.col("a"), F.col("b")).alias("comp"))
        .groupBy("a")
        .agg(F.min("comp").alias("comp"))
    )
    for _ in range(max_iter):
        nbr = und.join(
            labels.select(F.col("a").alias("b"), "comp"), "b"
        ).select("a", "comp")
        null_old = F.lit(None).cast(dict(labels.dtypes)["comp"])
        merged = (
            labels.select("a", "comp", F.col("comp").alias("old"))
            .unionByName(nbr.select("a", "comp", null_old.alias("old")))
            .groupBy("a")
            .agg(F.min("comp").alias("comp"), F.max("old").alias("old"))
        )
        merged = merged.localCheckpoint(eager=True)
        changed = merged.filter(F.col("comp") < F.col("old")).count()
        labels = merged.select("a", "comp")
        if changed == 0:
            break
    return labels.select(F.col("a").alias("id"), F.col("comp").alias("component"))


def er_v2(spark, sf_dir):
    import data_engineering_sf_mobile_food_facilities_public_spark.operators.graph as G
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
        entity_resolution_customers,
    )

    old = G.connected_components
    G.connected_components = cc_v2
    try:
        return entity_resolution_customers(spark, sf_dir)
    finally:
        G.connected_components = old


def run_full(spark, fn):
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(dt, 2)


def main() -> None:
    spark = get_spark("scratch_cc_r16")
    spark.sparkContext.setLogLevel("ERROR")
    # unit-fixture equivalence: chain, singletons, reversed edges
    rows = [(5, 9), (9, 7), (3, 5), (10, 12), (11, 13), (20, 21), (21, 22), (22, 23)]
    edges = spark.createDataFrame(rows, "id_a long, id_b long")
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.graph import (
        connected_components,
    )

    want = {(r.id, r.component) for r in connected_components(edges).collect()}
    got = {(r.id, r.component) for r in cc_v2(edges).collect()}
    assert got == want, (got, want)
    print("fixture identical")

    q_er = relational.QUERIES["entity_resolution_customers"]
    a = sorted(map(tuple, q_er(spark, SF_DIR).collect()))
    b = sorted(map(tuple, er_v2(spark, SF_DIR).collect()))
    assert a == b, "ER DIVERGED"
    print(f"ER rows identical ({len(a)})")

    variants = {"er_v0": q_er, "er_v2_init": er_v2}
    for fn in variants.values():
        run_full(spark, fn)
    for rep in range(3):
        print({label: run_full(spark, fn) for label, fn in variants.items()}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
