"""Scratch: spearman — bounded window for the quantity (<=50 distinct)
rank lane; the price lane keeps grouped_running_sum (value domain grows
with the corpus)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.operators.windows import (
    bounded_running_sum,
    grouped_running_sum,
)
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def spearman_v2(spark: SparkSession, sf_dir: str):
    rows = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_quantity").alias("qx"), F.col("l_extendedprice").alias("py"))
        .filter(F.col("qx").isNotNull() & F.col("py").isNotNull())
    )

    def double_ranks(col, r2name, bounded):
        cnt = rows.groupBy(col).agg(F.count(F.lit(1)).alias("__c"))
        if bounded:
            run = bounded_running_sum(cnt, [col], ["__c"], out_col=["__run"])
        else:
            run = grouped_running_sum(
                cnt.withColumn("__one", F.lit(1)), "__one", [col], "__c",
                out_col="__run",
            )
        return run.select(
            col, (2 * F.col("__run") - F.col("__c") + 1).cast("long").alias(r2name)
        )

    qr = double_ranks("qx", "r2x", True)
    pr = double_ranks("py", "r2y", False)
    joined = rows.join(F.broadcast(qr), "qx").join(pr, "py")
    d19 = "decimal(19,0)"
    m = joined.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("r2x").cast(d19)).alias("sx"),
        F.sum(F.col("r2y").cast(d19)).alias("sy"),
        F.sum(F.col("r2x").cast(d19) * F.col("r2x").cast(d19)).alias("sxx"),
        F.sum(F.col("r2y").cast(d19) * F.col("r2y").cast(d19)).alias("syy"),
        F.sum(F.col("r2x").cast(d19) * F.col("r2y").cast(d19)).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    rho = (nd * F.col("sxy").cast("double") - sx * sy) / (
        F.sqrt(nd * F.col("sxx").cast("double") - sx * sx)
        * F.sqrt(nd * F.col("syy").cast("double") - sy * sy)
    )
    return m.select("n", F.round(rho, 6).alias("rho_spearman"))


def main() -> None:
    spark = get_spark("scratch_spearman")
    spark.sparkContext.setLogLevel("ERROR")
    base = relational.QUERIES["spearman_price_vs_quantity"]
    a = sorted(map(tuple, base(spark, SF_DIR).collect()))
    b = sorted(map(tuple, spearman_v2(spark, SF_DIR).collect()))
    assert a == b, f"DIVERGED: {a} vs {b}"
    print(f"rows identical: {a}")
    report(ab(spark, {"base": base, "v2": spearman_v2}, reps=4))
    spark.stop()


if __name__ == "__main__":
    main()
