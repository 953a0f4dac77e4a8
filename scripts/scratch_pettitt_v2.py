"""Scratch: pettitt with plain windows over the calendar-bounded daily
frame (<= 2557 rows at ANY scale factor) instead of two
grouped_running_sum invocations (each: sample job + bucket window +
offsets agg + broadcast join)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def _dec(col, prec=18, scale=2):
    return F.col(col).cast(f"decimal({prec},{scale})")


def pettitt_v2(spark: SparkSession, sf_dir: str):
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(_dec("o_totalprice")).alias("rev"))
        .persist()
    )
    tot = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    perv = daily.groupBy("rev").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w_rev = Window.orderBy("rev").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cumv = perv.select("rev", "cnt", F.sum("cnt").over(w_rev).alias("c"))
    ranked = daily.join(
        cumv.select("rev", (2 * F.col("c") - F.col("cnt") + 1).alias("m")), "rev"
    )
    w_day = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped = (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("v", F.col("n") + 1 - F.col("m"))
        .select(
            "d",
            "n",
            F.count(F.lit(1)).over(w_day).alias("i"),
            F.sum("v").over(w_day).alias("u"),
        )
    )
    nd = F.col("n").cast("double")
    ku = F.abs(F.col("u")).cast("double")
    return (
        stepped.filter(F.col("i") < F.col("n"))
        .orderBy(F.abs(F.col("u")).desc(), "d")
        .limit(1)
        .select(
            F.col("d").cast("string").alias("changepoint_day"),
            F.col("i").cast("long").alias("day_index"),
            F.col("n").cast("long").alias("n_days"),
            F.abs(F.col("u")).cast("long").alias("k_statistic"),
            F.round(
                F.least(F.lit(1.0), 2 * F.exp(-6.0 * ku * ku / (nd * nd * nd + nd * nd))),
                6,
            ).alias("p_value"),
        )
    )


def main() -> None:
    spark = get_spark("scratch_pettitt")
    spark.sparkContext.setLogLevel("ERROR")
    base = relational.QUERIES["pettitt_changepoint_daily_revenue"]
    a = sorted(map(tuple, base(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, pettitt_v2(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    assert a == b, f"DIVERGED: {a} vs {b}"
    print(f"rows identical: {a}")
    report(ab(spark, {"base": base, "v2": pettitt_v2}, reps=3))
    spark.stop()


if __name__ == "__main__":
    main()
