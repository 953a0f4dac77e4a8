"""Scratch: decompose markov cost — mat build vs per-iteration marginal,
and a fused-zero-fill variant that drops the per-iteration left join."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def markov_steps(spark: SparkSession, sf_dir: str, steps: int, fused: bool = False):
    ev = load(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w_u).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("n"))
    types = ev.select("event_type").distinct()
    dangling = (
        types.join(
            counts.select("src").distinct(),
            types["event_type"] == F.col("src"),
            "left_anti",
        ).select(
            F.col("event_type").alias("src"),
            F.col("event_type").alias("dst"),
            F.lit(1).cast("long").alias("n"),
        )
    )
    allc = counts.unionByName(dangling)
    if fused:
        # zero mass rows: every type appears as dst each iteration, so the
        # per-iteration left join against types disappears (decimal sum of
        # an exact 0 addend is unchanged; coalesce becomes moot)
        zero = types.select(
            F.col("event_type").alias("src"),
            F.col("event_type").alias("dst"),
            F.lit(0).cast("long").alias("n"),
        )
        allc = allc.unionByName(zero)
    w_src = Window.partitionBy("src")
    mat = allc.select(
        "src", "dst", "n", F.sum("n").over(w_src).alias("tot")
    ).localCheckpoint(eager=True)
    k = types.agg(F.count(F.lit(1)).cast("long").alias("k"))
    pi = types.crossJoin(F.broadcast(k)).select(
        "event_type",
        F.round(1.0 / F.col("k"), 6).cast("decimal(18,6)").alias("pi"),
    )
    for _ in range(steps):
        if fused:
            pi = (
                mat.join(F.broadcast(pi), mat["src"] == pi["event_type"])
                .select(
                    F.col("dst"),
                    (F.col("pi") * (F.col("n").cast("double") / F.col("tot")))
                    .cast("decimal(18,12)")
                    .alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("mass"))
                .select(
                    F.col("dst").alias("event_type"),
                    F.round(F.col("mass").cast("double"), 6)
                    .cast("decimal(18,6)")
                    .alias("pi"),
                )
            )
        else:
            contrib = (
                mat.join(pi, mat["src"] == pi["event_type"])
                .select(
                    F.col("dst"),
                    (F.col("pi") * (F.col("n").cast("double") / F.col("tot")))
                    .cast("decimal(18,12)")
                    .alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("mass"))
            )
            pi = types.join(
                contrib, types["event_type"] == contrib["dst"], "left"
            ).select(
                "event_type",
                F.round(F.coalesce(F.col("mass"), F.lit(0)).cast("double"), 6)
                .cast("decimal(18,6)")
                .alias("pi"),
            )
    return pi.select(
        "event_type",
        (F.col("pi").cast("double") + 0.0).alias("pi"),
        F.lit(10).cast("int").alias("n_steps"),
    )


def main() -> None:
    spark = get_spark("scratch_markov_profile")
    spark.sparkContext.setLogLevel("ERROR")
    base = relational.QUERIES["markov_stationary_event_types"]
    a = sorted(map(tuple, base(spark, SF_DIR).collect()))
    b = sorted(map(tuple, markov_steps(spark, SF_DIR, 10, fused=True).collect()))
    assert a == b, f"DIVERGED:\n{a}\n{b}"
    print(f"fused rows identical ({len(a)} rows)")
    spark.catalog.clearCache()
    report(
        ab(
            spark,
            {
                "steps0": lambda s, d: markov_steps(s, d, 0),
                "steps10_base": base,
                "steps10_fused": lambda s, d: markov_steps(s, d, 10, fused=True),
            },
            reps=3,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
