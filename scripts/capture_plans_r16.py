"""Capture .explain("formatted") for bench-suite queries into plans/r16/.

Usage:
    python scripts/capture_plans_r16.py before   # -> plans/r16/<q>_before.txt
    python scripts/capture_plans_r16.py after    # -> plans/r16/<q>_after.txt
    python scripts/capture_plans_r16.py after q1,q2  # subset

Plans are captured lazily (no execution), so this is cheap and does not
perturb bench timings.  The optimization judge checks plan claims in
OPTIMIZATION_r16.md against these files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    import bench

    names = bench.HEADLINE
    if len(sys.argv) > 2:
        names = [n for n in sys.argv[2].split(",") if n]

    spark = get_spark("capture_plans_r16")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = relational.QUERIES.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        # free anything a query constructor persisted so captures stay isolated
        spark.catalog.clearCache()
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
