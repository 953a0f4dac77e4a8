#!/usr/bin/env python
"""Round-15 fourth-decade probes (VERDICT r14 #2).

The r14 lesson ("a fraction-sampled evaluation grows both sides — only
a pinned budget measures the exponent honestly") is applied to the
suite's three slowest entries, none of which had been probed past x3:

* ``semdedup_embedding_prototypes`` — corpus-scale k-prototype
  assignment; expected linear in corpus at fixed k (the budget IS the
  fixed prototype count).
* ``item_item_cosine_recs`` — basket-bounded pair fanout with the
  viral-basket cap; disjoint-key replicas triple baskets AND catalog,
  so candidate volume should scale ~linearly, with the sort/shuffle
  tail as the superlinearity risk.
* ``cosine_threshold_pairs_pruned`` — the DIMSUM-pruned threshold
  variant on the same baskets; the degree-ratio prune happens
  pre-shuffle, so the aggregation should track the SURVIVING pair
  count, not the raw fanout.

Replicas are disjoint-key x10/x30 copies of sf0.1 (embeddings vec_id
offset; lineitem l_orderkey AND l_partkey offset so basket copies
share no items; the x1 baseline is rewritten through the same 8-file
layout so file parallelism is controlled).  Warm best-of-2, noop sink,
cache cleared between ops.  Prints the SCALE.md table; replicas land
in /tmp and are deleted afterwards.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational

BASE = "/root/testdata/sf0.1"
ROOT = "/tmp/probe_r15"
COPIES = {"x1": 1, "x10": 10, "x30": 30}
OFF = 10_000_000

OPS = [
    "semdedup_embedding_prototypes",
    "item_item_cosine_recs",
    "cosine_threshold_pairs_pruned",
]


def _union_copies(df, n, cols_fn):
    parts = [df.select(*cols_fn(c)) for c in range(n)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    return u


def build(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    lcols = li.columns
    for tag, n in COPIES.items():
        out = f"{ROOT}/{tag}"
        os.makedirs(out, exist_ok=True)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "events", "documents"):
            os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
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
        _union_copies(
            li,
            n,
            lambda c: [
                (F.col("l_orderkey") + F.lit(c * OFF)).alias("l_orderkey"),
                (F.col("l_partkey") + F.lit(c * OFF)).alias("l_partkey"),
                *[x for x in lcols if x not in ("l_orderkey", "l_partkey")],
            ],
        ).repartition(8).write.mode("overwrite").parquet(
            f"{out}/lineitem.parquet"
        )


def timeit(spark, fn):
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    return best


def main():
    spark = get_spark("probe_r15")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    print("replicas built", file=sys.stderr)
    res = {op: {} for op in OPS}
    for tag in COPIES:
        sf = f"{ROOT}/{tag}"
        for op in OPS:
            t = timeit(spark, lambda: relational.QUERIES[op](spark, sf))
            res[op][tag] = t
            print(f"{tag} {op}: {t:.2f}s", file=sys.stderr)
    print("| query | x1 | x10 | x30 | alpha(x10->x30) |")
    print("|---|---|---|---|---|")
    for op in OPS:
        r = res[op]
        alpha = math.log(r["x30"] / r["x10"]) / math.log(3.0)
        print(
            f"| {op} | {r['x1']:.2f}s | {r['x10']:.2f}s | {r['x30']:.2f}s "
            f"| {alpha:.2f} |"
        )
    shutil.rmtree(ROOT, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
