"""Native WITH RECURSIVE (Spark 4) — bottleneck-route semantics.

The registry's recursive_cte_bottleneck_routes is oracle-paired on the
full SQL text; these tests pin the SEMANTICS on a hand graph (a 2-hop
route must beat a weak direct edge) and the engine surface (the plan
actually contains Spark's iterative union operator, i.e. the recursion
is not being flattened away).
"""

from __future__ import annotations

from data_engineering_sf_mobile_food_facilities_public_spark.plans.sql_features import (
    recursive_cte_bottleneck_routes,
)


def test_two_hop_route_beats_weak_direct_edge(spark):
    # capacities: A->B = 1 (weak direct), A->C = 9, C->B = 7
    # best bottleneck A->B within 3 hops = min(9, 7) = 7 via C
    spark.createDataFrame(
        [("A", "B", 1), ("A", "C", 9), ("C", "B", 7)],
        "src string, dst string, cap long",
    ).createOrReplaceTempView("__edges")
    got = {
        (r.src, r.dst): (r.best, r.n)
        for r in spark.sql(
            """
            WITH RECURSIVE routes(src, dst, bottleneck, hops) AS (
                SELECT src, dst, cap, 1 FROM __edges
                UNION ALL
                SELECT r.src, e.dst, LEAST(r.bottleneck, e.cap), r.hops + 1
                FROM routes r JOIN __edges e ON e.src = r.dst
                WHERE r.hops < 3
            )
            SELECT src, dst, MAX(bottleneck) AS best,
                   COUNT(*) AS n
            FROM routes GROUP BY src, dst
            """
        ).collect()
    }
    assert got[("A", "B")] == (7, 2)  # direct (1) and via C (7)
    assert got[("A", "C")] == (9, 1)
    assert got[("C", "B")] == (7, 1)


def test_plan_is_unrolled_over_materialized_edges(spark):
    plan = (
        recursive_cte_bottleneck_routes(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # r16 OPT: the literal hops<3 bound is hand-unrolled — no per-level
    # UnionLoop jobs; three enumeration levels as broadcast joins over
    # the localCheckpointed (RDD-scanned) edge contraction
    assert "UnionLoop" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Scan ExistingRDD" in plan
    # the native WITH RECURSIVE engine surface stays exercised by the
    # inline-SQL semantics test above and calendar_fill_monthly_revenue
