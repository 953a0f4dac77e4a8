"""Scratch r16: pagerank variants under the BENCH protocol (2 reps per
entry, cache kept between the reps, cleared after; best-of-2) —
interleaved trials so both variants share the machine window."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, run_noop
from scripts.scratch_pagerank_r16b import variant


def bench_pair(spark, fn):
    reps = []
    for _ in range(2):
        t0 = time.perf_counter()
        run_noop(fn(spark, SF_DIR))
        reps.append(round(time.perf_counter() - t0, 2))
    spark.catalog.clearCache()
    return reps


def main() -> None:
    spark = get_spark("scratch_pagerank_r16c")
    spark.sparkContext.setLogLevel("ERROR")
    run_noop(relational.QUERIES["flagship_top5_customers_by_order_count"](spark, SF_DIR))
    variants = {
        "v0_base": relational.QUERIES["pagerank_customer_supplier"],
        "v3_nb_p1_nfc": lambda s, d: variant(s, d, True, 1, True),
        "v4_nb_p4_nfc": lambda s, d: variant(s, d, True, 4, True),
    }
    for trial in range(3):
        for label, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{label} t{trial}")
            reps = bench_pair(spark, fn)
            print(f"trial {trial} {label:14s} rep1={reps[0]:6.2f} rep2={reps[1]:6.2f} best={min(reps):6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
