"""Scratch: markov v4 — the whole power iteration as ONE select over a
one-row array frame (the matrix is |types|^2 = dim-sized; 10 iterations
of tiny shuffles are pure stage-launch overhead locally and pure
scheduler round-trips on a cluster).

Exactness: per-step mass for dst t = round(cast(SUM(decimal(18,12)
addends) as double), 6) — the fold accumulates in decimal(38,12), which
is exact for these magnitudes, so the value is bit-identical to the
groupBy sum."""

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


def markov_v4(spark: SparkSession, sf_dir: str):
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
    w_src = Window.partitionBy("src")
    mat = allc.select("src", "dst", "n", F.sum("n").over(w_src).alias("tot"))
    # contract the dim-sized matrix to ONE row: sorted types array + edge
    # array with the row-stochastic p = n/tot precomputed
    one = mat.agg(
        F.array_sort(
            F.collect_set(F.col("src"))
        ).alias("ts"),
        F.collect_list(
            F.struct(
                "src",
                "dst",
                (F.col("n").cast("double") / F.col("tot")).alias("p"),
            )
        ).alias("m"),
    )
    # NOTE: collect_set(src) misses types that only appear as dst?  No:
    # every type has a src row (dangling fix guarantees outgoing edges),
    # so the src set IS the full domain.
    # the iteration is a RUNTIME fold (aggregate over sequence(1, k)), so
    # the expression tree stays O(one step) — an unrolled/withColumn chain
    # gets re-inlined by CollapseProject into an exponential tree and
    # Catalyst itself becomes the bottleneck (measured: optimizer hung)
    fold = (
        f"aggregate(sequence(1, {_MKV_STEPS}),"
        " transform(ts, t -> cast(round(1.0 / size(ts), 6) as decimal(18,6))),"
        " (pis, i) -> transform(ts, t -> cast(round(cast(aggregate("
        "   filter(m, e -> e.dst = t),"
        "   cast(0 as decimal(38,12)),"
        "   (acc, e) -> cast(acc + cast(element_at(map_from_arrays(ts, pis), e.src)"
        "     * e.p as decimal(18,12)) as decimal(38,12))"
        " ) as double), 6) as decimal(18,6))))"
    )
    return (
        one.select("ts", F.expr(fold).alias("pis"))
        .select(F.arrays_zip("ts", "pis").alias("z"))
        .select(F.explode("z").alias("e"))
        .select(
            F.col("e.ts").alias("event_type"),
            (F.col("e.pis").cast("double") + 0.0).alias("pi"),
            F.lit(_MKV_STEPS).cast("int").alias("n_steps"),
        )
    )


def main() -> None:
    spark = get_spark("scratch_markov_v4")
    spark.sparkContext.setLogLevel("ERROR")
    base = relational.QUERIES["markov_stationary_event_types"]
    a = sorted(map(tuple, base(spark, SF_DIR).collect()))
    b = sorted(map(tuple, markov_v4(spark, SF_DIR).collect()))
    assert a == b, f"DIVERGED:\n{a}\n{b}"
    print(f"v4 rows identical ({len(a)} rows)")
    spark.catalog.clearCache()
    report(ab(spark, {"base": base, "v4": markov_v4}, reps=3))
    spark.stop()


if __name__ == "__main__":
    main()
