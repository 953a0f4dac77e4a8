"""A/B timing harness for optimization round 15.

Times registered queries and/or scratch variants in ONE session,
interleaved reps, best-of-N, noop sink, cache cleared between runs —
the bench methodology, but with both variants sharing one machine
window so the comparison is honest despite session-to-session band.

    python scripts/opt_ab.py markov_stationary_event_types --reps 3
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(spark, variants, reps: int = 3, warmup: bool = True) -> dict[str, list[float]]:
    """variants: {label: fn(spark, sf_dir) -> DataFrame}. Interleaved reps."""
    out = {k: [] for k in variants}
    if warmup:
        for label, fn in variants.items():
            run_noop(fn(spark, SF_DIR))
            spark.catalog.clearCache()
    for r in range(reps):
        for label, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{label} rep{r}")
            out[label].append(run_noop(fn(spark, SF_DIR)))
            spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    return out


def report(out: dict[str, list[float]]) -> None:
    for label, ts in out.items():
        print(f"{label:40s} best={min(ts):6.2f} all={[round(t, 2) for t in ts]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    spark = get_spark("opt_ab")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {n: relational.QUERIES[n] for n in args.names}
    report(ab(spark, variants, reps=args.reps))
    spark.stop()


if __name__ == "__main__":
    main()
