"""Scratch r16 (VERDICT r15 #7): A/B the engine's UnionLoop recursion in
recursive_cte_bottleneck_routes against a hand-unrolled 3-level join
over the same materialized edge CTE.  hops < 3 is a literal bound, so
3 unrolled levels enumerate the identical route multiset."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.plans import relational
from data_engineering_sf_mobile_food_facilities_public_spark.plans.sql_features import (
    _BOTTLENECK_EDGES_SQL,
    register_views,
)
from data_engineering_sf_mobile_food_facilities_public_spark.session import get_spark
from scripts.opt_ab import SF_DIR, ab, report


def unrolled(spark, sf_dir):
    register_views(spark, sf_dir)
    edges = spark.sql(_BOTTLENECK_EDGES_SQL).localCheckpoint(eager=True)
    e = edges.select("src", "dst", "cap")
    lvl = e.select("src", "dst", F.col("cap").alias("bottleneck"))
    levels = [lvl]
    for _ in range(2):  # hops 2 and 3
        nxt = (
            lvl.alias("r")
            .join(F.broadcast(e.alias("e")), F.col("e.src") == F.col("r.dst"))
            .select(
                F.col("r.src").alias("src"),
                F.col("e.dst").alias("dst"),
                F.least(F.col("r.bottleneck"), F.col("e.cap")).alias("bottleneck"),
            )
        )
        levels.append(nxt)
        lvl = nxt
    routes = levels[0]
    for nx in levels[1:]:
        routes = routes.unionAll(nx)
    return routes.groupBy("src", "dst").agg(
        F.max("bottleneck").alias("best_bottleneck"),
        F.count(F.lit(1)).cast("long").alias("n_routes"),
    ).select(
        F.col("src").alias("src_nation"),
        F.col("dst").alias("dst_nation"),
        "best_bottleneck",
        "n_routes",
    )


def main() -> None:
    spark = get_spark("scratch_recursive_r16")
    spark.sparkContext.setLogLevel("ERROR")
    base_q = relational.QUERIES["recursive_cte_bottleneck_routes"]
    a = sorted(map(tuple, base_q(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, unrolled(spark, SF_DIR).collect()))
    spark.catalog.clearCache()
    assert a == b, f"DIVERGED: {a[:2]} vs {b[:2]}"
    print(f"rows identical ({len(a)})")
    report(ab(spark, {"v0_unionloop": base_q, "v1_unrolled": unrolled}, reps=3))
    spark.stop()


if __name__ == "__main__":
    main()
