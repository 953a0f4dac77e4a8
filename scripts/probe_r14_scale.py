#!/usr/bin/env python
"""Round-14 fourth-decade probes (VERDICT r13 #6 + #7).

Builds x10/x30 disjoint-key replicas of sf0.1 (embeddings: vec_id
offsets; documents: disjoint-alphabet token suffix per copy, the r13
discipline that keeps cross-copy shingles from colliding) — the x1
baseline is rewritten through the same 8-file layout so file
parallelism is controlled — then times, warm best-of-2 with the bench
cache hygiene:

* retrieval_cascade_run with a PINNED query budget (query_max_id = max
  base vec_id): tier-1/eval cost should go LINEAR in corpus size once
  the query set stops growing with the corpus.
* prefix_jaccard_pairs_run with a PINNED sample budget (sample_bp =
  2500/copies): the sampled audit tier should go FLAT — the only
  corpus-sized work left is the documents scan under the sample filter.

Prints a markdown table for SCALE.md.  Replicas land in /tmp and are
deleted afterwards.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from data_engineering_sf_mobile_food_facilities_public_spark.plans.similarity_search import (
    retrieval_cascade_run,
)
from data_engineering_sf_mobile_food_facilities_public_spark.plans.text_analysis import (
    prefix_jaccard_pairs_run,
)

BASE = "/root/testdata/sf0.1"
ROOT = "/tmp/probe_r14"
COPIES = {"x1": 1, "x10": 10, "x30": 30}
OFF = 10_000_000


def build(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    e = spark.read.parquet(f"{BASE}/embeddings.parquet")
    d = spark.read.parquet(f"{BASE}/documents.parquet")
    for tag, n in COPIES.items():
        out = f"{ROOT}/{tag}"
        os.makedirs(out, exist_ok=True)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events"):
            os.symlink(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
        eparts = [
            e.select(
                (F.col("vec_id") + F.lit(c * OFF)).alias("vec_id"),
                "embedding",
                "label",
            )
            for c in range(n)
        ]
        eu = eparts[0]
        for p in eparts[1:]:
            eu = eu.unionAll(p)
        eu.repartition(8).write.mode("overwrite").parquet(
            f"{out}/embeddings.parquet"
        )
        dparts = [
            d.select(
                (F.col("doc_id") + F.lit(c * OFF)).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"), r"(\S+)", "$1" + f"zc{c}"
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for c in range(n)
        ]
        du = dparts[0]
        for p in dparts[1:]:
            du = du.unionAll(p)
        du.repartition(8).write.mode("overwrite").parquet(
            f"{out}/documents.parquet"
        )
    return int(
        e.agg(F.max("vec_id")).collect()[0][0]
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
    spark = get_spark("probe_r14")
    spark.sparkContext.setLogLevel("ERROR")
    qmax = build(spark)
    print(f"replicas built; pinned query_max_id = {qmax}", file=sys.stderr)
    rows = []
    for tag, n in COPIES.items():
        sf = f"{ROOT}/{tag}"
        t_casc = timeit(
            spark, lambda: retrieval_cascade_run(spark, sf, query_max_id=qmax)
        )
        bp = max(1, round(2500 / n))
        t_jacc = timeit(
            spark,
            lambda: prefix_jaccard_pairs_run(spark, sf, sample_bp=bp),
        )
        rows.append((tag, t_casc, bp, t_jacc))
        print(f"{tag}: cascade={t_casc:.2f}s jaccard(bp={bp})={t_jacc:.2f}s",
              file=sys.stderr)
    print("| scale | cascade (pinned queries) | sampled jaccard (pinned budget) |")
    print("|---|---|---|")
    for tag, tc, bp, tj in rows:
        print(f"| {tag} | {tc:.2f}s | {tj:.2f}s (bp={bp}) |")
    shutil.rmtree(ROOT, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
