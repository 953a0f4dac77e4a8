"""Scratch r16 (VERDICT r15 #4): A/B the bounded_running_sum swap on the
three calendar-bounded day-series consumers — old = grouped_running_sum
with a constant group key (reconstructed inline), new = the registered
queries after the swap."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.operators.windows import (
    grouped_running_sum,
)
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans.analytics import _dec
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def _daily(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(_dec("o_totalprice")).alias("rev"))
    )


def cusum_old(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    stepped = grouped_running_sum(
        daily.withColumn("__one", F.lit(1)).withColumn("__cnt", F.lit(1)),
        "__one",
        ["d"],
        ["__cnt", "rev"],
        out_col=["i", "cum"],
    )
    tot = daily.agg(F.count(F.lit(1)).alias("n"), F.sum("rev").alias("s"))
    dev = stepped.crossJoin(F.broadcast(tot)).select(
        "d",
        "i",
        (
            F.col("n").cast("decimal(19,0)") * F.col("cum")
            - F.col("i").cast("decimal(19,0)") * F.col("s")
        ).alias("num"),
        "n",
    )
    return (
        dev.orderBy(F.abs(F.col("num")).desc(), "d")
        .limit(1)
        .select(
            F.col("d").cast("string").alias("changepoint_day"),
            F.col("i").cast("long").alias("day_index"),
            F.col("n").cast("long").alias("n_days"),
            F.round(F.abs(F.col("num")).cast("double") / F.col("n"), 4).alias(
                "max_abs_cusum"
            ),
        )
    )


def _indexed_old(spark, sf_dir, out="x"):
    daily = _daily(spark, sf_dir)
    return (
        grouped_running_sum(
            daily.withColumn("__one", F.lit(1)).withColumn("__cnt", F.lit(1)),
            "__one",
            ["d"],
            ["__cnt"],
            out_col=["i"],
        )
        .select((F.col("rev") * 100).cast("decimal(19,0)").alias(out), "i")
    )


def main() -> None:
    spark = get_spark("scratch_bounded_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # row-identity checks for cusum (full query); hurst/variance only
    # change the shared day-index prefix, pinned by oracle parity runs
    a = sorted(map(tuple, relational.QUERIES["cusum_changepoint_daily_revenue"](spark, SF_DIR).collect()))
    b = sorted(map(tuple, cusum_old(spark, SF_DIR).collect()))
    assert a == b, "cusum DIVERGED"
    print("cusum rows identical")
    from data_engineering_sf_mobile_food_facilities_public_spark.operators.windows import (
        bounded_running_sum,
    )

    def idx_new(spark, sf_dir, out="x"):
        daily = _daily(spark, sf_dir)
        return bounded_running_sum(
            daily.withColumn("__cnt", F.lit(1)), ["d"], ["__cnt"], out_col=["i"]
        ).select((F.col("rev") * 100).cast("decimal(19,0)").alias(out), "i")

    report(
        ab(
            spark,
            {
                "cusum_old": cusum_old,
                "cusum_new": relational.QUERIES["cusum_changepoint_daily_revenue"],
                "dayindex_old": _indexed_old,
                "dayindex_new": idx_new,
                "hurst_new": relational.QUERIES["hurst_exponent_daily_revenue"],
                "varratio_new": relational.QUERIES["variance_ratio_daily_revenue"],
            },
            reps=3,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
