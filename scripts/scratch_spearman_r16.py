"""Scratch r16: spearman — compute the five moment sums on the
(qx, py) CONTINGENCY CELLS (weight = cell count) instead of joining the
rank grids back onto the fact table.  sum over rows of f(r2x, r2y)
== sum over cells of c * f(r2x, r2y) exactly (integer arithmetic), so
the fact table is touched by ONE map-side-combinable groupBy and the
price-lane join happens on the contracted cell frame."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.operators.windows import (
    bounded_running_sum,
    grouped_running_sum,
)
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def v2_cells(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_quantity").alias("qx"), F.col("l_extendedprice").alias("py"))
        .filter(F.col("qx").isNotNull() & F.col("py").isNotNull())
    )
    cells = rows.groupBy("qx", "py").agg(F.count(F.lit(1)).alias("__cc"))

    qcnt = cells.groupBy("qx").agg(F.sum("__cc").alias("__c"))
    pcnt = cells.groupBy("py").agg(F.sum("__cc").alias("__c"))
    qrun = bounded_running_sum(qcnt, ["qx"], ["__c"], out_col=["__run"])
    qr = qrun.select(
        "qx", (2 * F.col("__run") - F.col("__c") + 1).cast("long").alias("r2x")
    )
    prun = grouped_running_sum(
        pcnt.withColumn("__one", F.lit(1)),
        "__one",
        ["py"],
        "__c",
        out_col="__run",
        cut_source=rows.select(F.lit(1).alias("__one"), "py"),
    )
    pr = prun.select(
        "py", (2 * F.col("__run") - F.col("__c") + 1).cast("long").alias("r2y")
    )
    joined = cells.join(F.broadcast(qr), "qx").join(pr, "py")
    d19 = "decimal(19,0)"
    cc = F.col("__cc").cast(d19)
    m = joined.agg(
        F.sum("__cc").cast("long").alias("n"),
        F.sum(cc * F.col("r2x").cast(d19)).alias("sx"),
        F.sum(cc * F.col("r2y").cast(d19)).alias("sy"),
        F.sum(cc * (F.col("r2x").cast(d19) * F.col("r2x").cast(d19))).alias("sxx"),
        F.sum(cc * (F.col("r2y").cast(d19) * F.col("r2y").cast(d19))).alias("syy"),
        F.sum(cc * (F.col("r2x").cast(d19) * F.col("r2y").cast(d19))).alias("sxy"),
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
    spark = get_spark("scratch_spearman_r16")
    spark.sparkContext.setLogLevel("ERROR")
    q0 = relational.QUERIES["spearman_price_vs_quantity"]
    a = sorted(map(tuple, q0(spark, SF_DIR).collect()))
    b = sorted(map(tuple, v2_cells(spark, SF_DIR).collect()))
    assert a == b, f"DIVERGED: {a} vs {b}"
    print(f"rows identical: {a}")
    report(ab(spark, {"v0": q0, "v2_cells": v2_cells}, reps=4))
    spark.stop()


if __name__ == "__main__":
    main()
