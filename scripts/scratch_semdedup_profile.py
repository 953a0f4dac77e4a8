"""Scratch: decompose semdedup_embedding_prototypes cost at sf0.1."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.functions.vectors import (
    dot,
    norm,
)
from data_engineering_sf_mobile_food_facilities_public_spark.operators.graph import (
    connected_components,
)
from data_engineering_sf_mobile_food_facilities_public_spark.operators.similarity import (
    blocked_pairs_staged,
    stage_blocked,
)
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans.similarity_search import (
    _SEMDEDUP_CEIL,
)
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, run_noop


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label:28s} {time.perf_counter() - t0:5.2f}s", flush=True)
    return out


def main() -> None:
    spark = get_spark("scratch_semdedup")
    spark.sparkContext.setLogLevel("ERROR")
    base_q = relational.QUERIES["semdedup_embedding_prototypes"]
    run_noop(base_q(spark, SF_DIR))  # warm
    spark.catalog.clearCache()

    for _ in range(2):
        emb = load(spark, SF_DIR, "embeddings")
        staged = stage_blocked(emb, "label").persist(StorageLevel.MEMORY_AND_DISK)
        t("stage+persist", lambda: run_noop(staged))
        edges = blocked_pairs_staged(staged, _SEMDEDUP_CEIL).select("id_a", "id_b")
        t("edges", lambda: run_noop(edges))
        comp = t("components", lambda: connected_components(edges))
        t("components.noop", lambda: run_noop(comp))
        e0 = staged.select(
            F.col("id").alias("vec_id"),
            F.col("block").alias("label"),
            "v",
            F.col("n").alias("nv"),
        )
        ex = e0.select("label", F.posexplode("v").alias("pos", "x0")).select(
            "label", "pos", F.col("x0").cast("decimal(18,9)").alias("x")
        )
        sums = ex.groupBy("label", "pos").agg(F.sum("x").cast("double").alias("s"))
        cent = sums.groupBy("label").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, s))), t -> t.s)"
            ).alias("cv")
        )
        t("centroids", lambda: run_noop(cent))
        scored = (
            e0.join(F.broadcast(cent), "label")
            .join(comp.select(F.col("id").alias("vec_id"), "component"), "vec_id", "left")
            .select(
                "vec_id",
                F.coalesce("component", "vec_id").alias("component"),
                F.when((F.col("nv") == 0) | (norm(F.col("cv")) == 0), F.lit(None))
                .otherwise(
                    F.round(dot(F.col("v"), F.col("cv")) / (F.col("nv") * norm(F.col("cv"))), 6)
                    + 0.0
                )
                .alias("cos_cent"),
            )
        )
        w_n = Window.partitionBy("component")
        w_r = w_n.orderBy(F.asc_nulls_first("cos_cent"), "vec_id")
        final = (
            scored.withColumn("n_members", F.count(F.lit(1)).over(w_n).cast("long"))
            .withColumn("rn", F.row_number().over(w_r))
            .filter(F.col("rn") == 1)
            .select(
                "component",
                F.col("vec_id").alias("kept_vec_id"),
                F.col("cos_cent").alias("prototype_centroid_cos"),
                "n_members",
            )
        )
        t("final tail", lambda: run_noop(final))
        spark.catalog.clearCache()
        t("FULL query (cold cache)", lambda: run_noop(base_q(spark, SF_DIR)))
        t("FULL query (hot cache)", lambda: run_noop(base_q(spark, SF_DIR)))
        spark.catalog.clearCache()
        print("---")
    spark.stop()


if __name__ == "__main__":
    main()
