"""Scratch A/B: markov_stationary_event_types variants (not shipped).

v2: materialize the dim-sized `types` frame once (localCheckpoint) so the
12-iteration loop stops re-scanning events + re-running the distinct per
iteration, and broadcast the dim-sized pi/contrib sides explicitly so no
iteration join plans a SortMergeJoin.  Output must be row-identical.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import (
    _MKV_STEPS,
)
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def markov_v2(spark: SparkSession, sf_dir: str):
    ev = load(spark, sf_dir, "events")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w_u).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = seq.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # CHANGE 1: the |event_types|-sized domain is consumed by the dangling
    # fix, the k scalar, the pi init, and EVERY iteration's left join —
    # materialize it once instead of re-scanning events 12+ times.
    types = ev.select("event_type").distinct().localCheckpoint(eager=True)
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
    w_src = Window.partitionBy("src")
    mat = allc.select(
        "src", "dst", "n", F.sum("n").over(w_src).alias("tot")
    ).localCheckpoint(eager=True)
    k = types.agg(F.count(F.lit(1)).cast("long").alias("k"))
    pi = types.crossJoin(F.broadcast(k)).select(
        "event_type",
        F.round(1.0 / F.col("k"), 6).cast("decimal(18,6)").alias("pi"),
    )
    for _ in range(_MKV_STEPS):
        # CHANGE 2: pi and contrib are |event_types|-sized — broadcast both
        # sides explicitly so no iteration join falls to SortMergeJoin.
        contrib = (
            mat.join(F.broadcast(pi), mat["src"] == pi["event_type"])
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
            F.broadcast(contrib), types["event_type"] == contrib["dst"], "left"
        ).select(
            "event_type",
            F.round(F.coalesce(F.col("mass"), F.lit(0)).cast("double"), 6)
            .cast("decimal(18,6)")
            .alias("pi"),
        )
    return pi.select(
        "event_type",
        (F.col("pi").cast("double") + 0.0).alias("pi"),
        F.lit(_MKV_STEPS).cast("int").alias("n_steps"),
    )


def main() -> None:
    spark = get_spark("scratch_markov")
    spark.sparkContext.setLogLevel("ERROR")
    base = relational.QUERIES["markov_stationary_event_types"]
    # correctness gate first: identical rows
    a = sorted(map(tuple, base(spark, SF_DIR).collect()))
    b = sorted(map(tuple, markov_v2(spark, SF_DIR).collect()))
    assert a == b, f"DIVERGED: {a[:3]} vs {b[:3]}"
    print(f"rows identical ({len(a)} rows)")
    spark.catalog.clearCache()
    report(ab(spark, {"markov_base": base, "markov_v2": markov_v2}, reps=3))
    spark.stop()


if __name__ == "__main__":
    main()
