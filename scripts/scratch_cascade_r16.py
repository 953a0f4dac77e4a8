"""Scratch r16: retrieval_cascade_recall — precompute per-vector L2
norms once instead of re-deriving both sides' sqrt(sum x^2) inside the
cosine HOF per pair.  The exact evaluation tier scores |queries| x
|corpus| pairs, so the corpus-side norm was recomputed ~|queries| times
per vector; tier 3 paid the same tax on candidate-sized joins.  v0
below is the pre-change implementation verbatim."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans.similarity_search import (
    _CASCADE_K,
    _CASCADE_T1,
    _CASCADE_T2,
)
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def cascade_v0(spark, sf_dir):
    """Pre-change implementation (per-pair norm recomputation)."""
    e0 = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    e = e0.filter(F.expr("aggregate(v, 0D, (a, x) -> a + x * x)") > 0)
    qbase = e.filter(F.col("vec_id") % 100 == 0)
    q = qbase.select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"))
    cos = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (a, b) -> a + b)"
        " / (sqrt(aggregate({a}, 0D, (a, x) -> a + x * x))"
        "    * sqrt(aggregate({b}, 0D, (a, x) -> a + x * x)))"
    )
    corpus = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"))

    exact_scored = corpus.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(F.expr(cos.format(a="qv", b="cv")), 6).alias("cos_sim"),
    )
    w_desc = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    exact_top = (
        exact_scored.withColumn("rnk", F.row_number().over(w_desc))
        .filter(F.col("rnk") <= _CASCADE_K)
        .select("query_id", "neighbor_id")
    )

    packed = (
        "aggregate(zip_with({c}, sequence(0, size({c}) - 1),"
        " (x, i) -> IF(x > 0D, shiftleft(1L, i), 0L)), 0L, (a, b) -> a | b)"
    )
    qbits = q.select("query_id", F.expr(packed.format(c="qv")).alias("qbits"))
    cbits = corpus.select(
        "neighbor_id", F.expr(packed.format(c="cv")).alias("cbits")
    )
    w_ham = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    t1 = (
        cbits.join(F.broadcast(qbits), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.bit_count(F.col("qbits").bitwiseXOR(F.col("cbits")))
            .cast("long")
            .alias("hamming"),
        )
        .withColumn("rnk", F.row_number().over(w_ham))
        .filter(F.col("rnk") <= _CASCADE_T1)
        .select("query_id", "neighbor_id")
    )

    withmax = e.select(
        "vec_id",
        "v",
        F.expr("aggregate(v, 0D, (a, x) -> greatest(a, abs(x)))").alias("maxabs"),
    )
    qz = withmax.select(
        "vec_id",
        F.expr(
            "CASE WHEN maxabs = 0D THEN transform(v, x -> 0L)"
            " ELSE transform(v, x -> CAST(floor(127 * x / maxabs + 0.5D)"
            " AS BIGINT)) END"
        ).alias("qv8"),
    )

    t2 = (
        t1.join(
            qz.select(F.col("vec_id").alias("query_id"), F.col("qv8").alias("qa")),
            "query_id",
        )
        .join(
            qz.select(
                F.col("vec_id").alias("neighbor_id"), F.col("qv8").alias("qb")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.expr(
                "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (a, b) -> a + b)"
            ).alias("dot_q"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("dot_q"), F.col("neighbor_id")
                )
            ),
        )
        .filter(F.col("rnk") <= _CASCADE_T2)
        .select("query_id", "neighbor_id")
    )

    t3 = (
        t2.join(
            e.select(F.col("vec_id").alias("query_id"), F.col("v").alias("av")),
            "query_id",
        )
        .join(
            e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("bv")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.expr(cos.format(a="av", b="bv")), 6).alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(w_desc))
        .filter(F.col("rnk") <= _CASCADE_K)
        .select(
            F.col("query_id").alias("c_query"),
            F.col("neighbor_id").alias("c_neighbor"),
        )
    )

    per_q = (
        exact_top.join(
            t3,
            (exact_top["query_id"] == t3["c_query"])
            & (exact_top["neighbor_id"] == t3["c_neighbor"]),
            "left",
        )
        .select(
            exact_top["query_id"].alias("qid"),
            F.col("c_neighbor").isNotNull().cast("int").alias("hit"),
        )
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum("hit").alias("n_overlap"),
        )
    )
    return per_q.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.lit(_CASCADE_T1).cast("long").alias("tier1_kept"),
        F.lit(_CASCADE_T2).cast("long").alias("tier2_kept"),
        F.round(
            F.sum("n_overlap").cast("double") / F.sum("n_exact"), 6
        ).alias("mean_recall_at_10"),
        F.min("n_overlap").cast("long").alias("min_overlap"),
        F.sum(
            F.when(F.col("n_overlap") == F.col("n_exact"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_perfect"),
    )


def main() -> None:
    spark = get_spark("scratch_cascade_r16")
    spark.sparkContext.setLogLevel("ERROR")
    new = relational.QUERIES["retrieval_cascade_recall"]
    a = sorted(map(tuple, cascade_v0(spark, SF_DIR).collect()))
    b = sorted(map(tuple, new(spark, SF_DIR).collect()))
    assert a == b, f"DIVERGED: {a} vs {b}"
    print(f"rows identical: {a}")
    report(
        ab(
            spark,
            {"cascade_v0": cascade_v0, "cascade_v1_norms": new},
            reps=3,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
