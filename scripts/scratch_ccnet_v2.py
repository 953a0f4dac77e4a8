"""Scratch: interleaved A/B — ccnet single-explode (db-derived model)
vs the registered two-explode version."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans import text_analysis as TXMOD
from data_engineering_sf_mobile_food_facilities_public_spark.functions import text as TX
from data_engineering_sf_mobile_food_facilities_public_spark.operators.windows import (
    grouped_running_sum,
)
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def ccnet_v2(spark: SparkSession, sf_dir: str):
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("source", "doc_id", TX.tokens("text").alias("tk")).filter(
        F.size("tk") >= 2
    )
    bigrams = toks.select(
        "source",
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.size("tk") - 2)).alias("i"),
        F.col("tk"),
    ).select(
        "source",
        "doc_id",
        F.col("tk")[F.col("i")].alias("w1"),
        F.col("tk")[F.col("i") + 1].alias("w2"),
    )
    db = (
        bigrams.groupBy("doc_id", "source", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("decimal(19,0)").alias("n_dw"))
        .persist()
    )
    big = db.groupBy("w1", "w2").agg(F.sum("n_dw").cast("long").alias("c12")).persist()
    hist = big.groupBy("w1").agg(F.sum("c12").cast("long").alias("c1"))
    voc = big.agg(F.countDistinct("w2").cast("long").alias("v"))
    lp = (
        F.round(F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))), 6)
        .cast("decimal(18,6)")
        .alias("lp")
    )
    doch = (
        db.join(big, ["w1", "w2"])
        .join(hist, "w1")
        .crossJoin(F.broadcast(voc))
        .select("doc_id", "source", "n_dw", lp)
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            F.round(
                -F.sum(F.col("n_dw") * F.col("lp")).cast("double")
                / F.sum("n_dw").cast("double"),
                6,
            ).alias("h6"),
        )
        .persist()
    )
    tot = doch.agg(F.count(F.lit(1)).cast("long").alias("n"))
    perv = doch.groupBy("h6").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cumv = grouped_running_sum(
        perv.withColumn("__one", F.lit(1)), "__one", ["h6"], ["cnt"], out_col=["cum"]
    )
    k1 = F.floor((F.col("n") + 2) / 3.0).cast("long")
    k2 = F.floor((2 * F.col("n") + 2) / 3.0).cast("long")
    th = cumv.crossJoin(F.broadcast(tot)).agg(
        F.min(F.when(F.col("cum") >= k1, F.col("h6"))).alias("t1"),
        F.min(F.when(F.col("cum") >= k2, F.col("h6"))).alias("t2"),
    )
    bucket = (
        F.when(F.col("h6") <= F.col("t1"), F.lit("head"))
        .when(F.col("h6") <= F.col("t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket")
    )
    return (
        doch.crossJoin(F.broadcast(th))
        .groupBy("source", bucket)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("h6").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_logloss"),
        )
    )


def main() -> None:
    spark = get_spark("scratch_ccnet")
    spark.sparkContext.setLogLevel("ERROR")
    base = relational.QUERIES["ccnet_perplexity_buckets"]
    a = sorted(map(tuple, base(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, ccnet_v2(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    assert a == b, f"DIVERGED: {a[:4]} vs {b[:4]}"
    print(f"rows identical ({len(a)} rows)")
    report(ab(spark, {"base": base, "v2": ccnet_v2}, reps=4))
    spark.stop()


if __name__ == "__main__":
    main()
