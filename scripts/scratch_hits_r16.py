"""Scratch r16 (VERDICT r15 #3): hits_customer_supplier.  The VERDICT's
long-key premise is stale — the loop already carries numeric custkey /
suppkey in separate bipartite frames (no string node keys exist).  What
the loop DOES pay is one EAGER localCheckpoint per half-step (8
blocking jobs during plan construction).  Variants:

v0: registered (eager=True checkpoints)
v1: eager=False checkpoints (same materialization points, no blocking
    during construction)
v2: no checkpoint — rely on ReuseExchange to dedupe the raw aggregate
    under its two consumers (max scalar + ratio projection)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
    _HITS_ITERS,
)
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR


def hits_variant(spark, sf_dir, ckpt: str):
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .persist()
    )
    wd = F.col("w").cast("decimal(18,0)")
    hub = edges.select("c").distinct().select(
        "c", F.lit(1).cast("decimal(18,6)").alias("h")
    )

    def normalize(raw: DataFrame, key: str, out: str) -> DataFrame:
        if ckpt == "eager":
            raw = raw.localCheckpoint(eager=True)
        elif ckpt == "lazy":
            raw = raw.localCheckpoint(eager=False)
        m = raw.agg(F.max("raw").alias("m"))
        return raw.crossJoin(F.broadcast(m)).select(
            key,
            F.round(
                F.col("raw").cast("double") / F.col("m").cast("double"), 6
            )
            .cast("decimal(18,6)")
            .alias(out),
        )

    auth = None
    for _ in range(_HITS_ITERS):
        a_raw = (
            edges.join(hub, "c").groupBy("s").agg(F.sum(wd * F.col("h")).alias("raw"))
        )
        auth = normalize(a_raw, "s", "a")
        h_raw = (
            edges.join(auth, "s").groupBy("c").agg(F.sum(wd * F.col("a")).alias("raw"))
        )
        hub = normalize(h_raw, "c", "h")
    return (
        auth.select(
            F.lit("supplier").alias("node_type"),
            F.col("s").alias("node_id"),
            F.col("a").cast("double").alias("score"),
        )
    ).unionAll(
        hub.select(
            F.lit("customer").alias("node_type"),
            F.col("c").alias("node_id"),
            F.col("h").cast("double").alias("score"),
        )
    )


def run_full(spark, fn):
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache()
    return round(dt, 2)


def main() -> None:
    spark = get_spark("scratch_hits_r16")
    spark.sparkContext.setLogLevel("ERROR")
    q0 = relational.QUERIES["hits_customer_supplier"]
    a = sorted(map(tuple, q0(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    for label, c in [("lazy", "lazy"), ("none", "none")]:
        b = sorted(map(tuple, hits_variant(spark, SF_DIR, c).collect()))
        spark.catalog.clearCache()
        assert a == b, f"{label} DIVERGED"
        print(f"{label}: rows identical ({len(a)})")
    variants = {
        "v0_eager": q0,
        "v1_lazy": lambda s, d: hits_variant(s, d, "lazy"),
        "v2_none": lambda s, d: hits_variant(s, d, "none"),
    }
    for fn in variants.values():
        run_full(spark, fn)  # warmup
    for rep in range(3):
        print({label: run_full(spark, fn) for label, fn in variants.items()})
    spark.stop()


if __name__ == "__main__":
    main()
