"""Scratch r16 (VERDICT r15 #6): corpus_curation_pipeline — persist the
NARROW post-HOF projection so grouped_running_sum's two consumer
branches (offsets aggregate + main window) evaluate the tokenize +
bigram repetition stats ONCE instead of twice.  Unlike the rejected r15
ccnet persist (which materialized a per-doc TYPE TABLE bigger than the
work it saved), `sized` is four scalar columns per surviving doc."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.operators import (
    grouped_running_sum,
)
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans.text_analysis import (
    _repetition_fracs,
    _with_repetition_raw,
)
from data_engineering_sf_mobile_food_facilities_public_spark.plans import text_analysis as TXP
from data_engineering_sf_mobile_food_facilities_public_spark.functions import text as TX
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def v1_persist(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    with_stats = _with_repetition_raw(
        d.filter(F.col("text").rlike("[^ \t\n\x0B\f\r]")),
        "doc_id",
        "lang",
        "text",
    )
    _, _, keep = _repetition_fracs()
    sized = with_stats.filter(keep).select(
        "doc_id",
        "lang",
        TX.token_count("text").cast("long").alias("n_tokens"),
        F.md5(F.concat(F.lit("cur"), F.col("doc_id").cast("string"))).alias("h"),
    ).persist()
    budget = F.when(F.col("lang") == "en", F.lit(6000)).otherwise(F.lit(2000))
    cut_src = d.select(
        "lang",
        F.md5(F.concat(F.lit("cur"), F.col("doc_id").cast("string"))).alias("h"),
        "doc_id",
    )
    return (
        grouped_running_sum(
            sized, "lang", ["h", "doc_id"], "n_tokens",
            out_col="cum_tokens", cut_source=cut_src,
        )
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


def main() -> None:
    spark = get_spark("scratch_curation_r16")
    spark.sparkContext.setLogLevel("ERROR")
    q0 = relational.QUERIES["corpus_curation_pipeline"]
    a = sorted(map(tuple, q0(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, v1_persist(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    assert a == b, f"DIVERGED ({len(a)} vs {len(b)})"
    print(f"rows identical ({len(a)})")
    report(ab(spark, {"v0": q0, "v1_persist": v1_persist}, reps=4))
    spark.stop()


if __name__ == "__main__":
    main()
