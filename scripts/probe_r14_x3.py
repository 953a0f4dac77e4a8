#!/usr/bin/env python
"""x3 scale probe over the nine round-14 operators (the r13 new-operator
discipline): disjoint-key x3 replica of sf0.1 — orders/lineitem key and
customer offsets, documents doc_id offset + disjoint-alphabet token
suffix per copy, embeddings vec_id offset; dims symlinked; 8 files per
table INCLUDING the x1 baseline so file parallelism is controlled.
Warm best-of-2, noop sink, cache cleared between ops.  Prints the
SCALE.md table.  Replicas are deleted afterwards.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational

BASE = "/root/testdata/sf0.1"
ROOT = "/tmp/probe_r14_x3"
OFF = 10_000_000

OPS = [
    "prefix_jaccard_sampled_pairs",
    "cliffs_delta_quantity_halves",
    "kuiper_test_price_halves",
    "inequality_indices_customer_revenue",
    "roc_auc_discount_returns",
    "jarque_bera_quantity_1996",
    "bigram_perplexity_by_source",
    "kl_divergence_source_vs_corpus",
    "jl_projection_distortion",
]


def _union_copies(df, n, cols):
    parts = [df.select(*cols(c)) for c in range(n)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    return u


def build(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    o = spark.read.parquet(f"{BASE}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    d = spark.read.parquet(f"{BASE}/documents.parquet")
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    ocols = o.columns
    lcols = li.columns
    for tag, n in (("x1", 1), ("x3", 3)):
        out = f"{ROOT}/{tag}"
        os.makedirs(out, exist_ok=True)
        for t in ("region", "nation", "customer", "supplier", "part", "events"):
            os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
        _union_copies(
            o,
            n,
            lambda c: [
                (F.col("o_orderkey") + F.lit(c * OFF)).alias("o_orderkey"),
                (F.col("o_custkey") + F.lit(c * OFF)).alias("o_custkey"),
                *[x for x in ocols if x not in ("o_orderkey", "o_custkey")],
            ],
        ).repartition(8).write.mode("overwrite").parquet(f"{out}/orders.parquet")
        _union_copies(
            li,
            n,
            lambda c: [
                (F.col("l_orderkey") + F.lit(c * OFF)).alias("l_orderkey"),
                (F.col("l_suppkey")).alias("l_suppkey"),
                *[x for x in lcols if x not in ("l_orderkey", "l_suppkey")],
            ],
        ).repartition(8).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
        _union_copies(
            d,
            n,
            lambda c: [
                (F.col("doc_id") + F.lit(c * OFF)).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", "$1" + f"zc{c}").alias(
                    "text"
                ),
                "lang",
                "source",
                "n_chars",
            ],
        ).repartition(8).write.mode("overwrite").parquet(f"{out}/documents.parquet")
        _union_copies(
            e,
            n,
            lambda c: [
                (F.col("vec_id") + F.lit(c * OFF)).alias("vec_id"),
                "embedding",
                "label",
            ],
        ).repartition(8).write.mode("overwrite").parquet(
            f"{out}/embeddings.parquet"
        )


def timeit(spark, fn, sf):
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    return best


def main():
    spark = get_spark("probe_r14_x3")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    print("replicas built", file=sys.stderr)
    rows = []
    for name in OPS:
        fn = relational.QUERIES[name]
        t1 = timeit(spark, fn, f"{ROOT}/x1")
        t3 = timeit(spark, fn, f"{ROOT}/x3")
        rows.append((name, t1, t3))
        print(f"{name}: x1={t1:.2f}s x3={t3:.2f}s ({t3 / t1:.2f}x)", file=sys.stderr)
    print("| query | x1 | x3 | ratio |")
    print("|---|---|---|---|")
    for name, t1, t3 in rows:
        print(f"| {name} | {t1:.2f}s | {t3:.2f}s | {t3 / t1:.2f}x |")
    shutil.rmtree(ROOT, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
