"""Skew-mitigation equivalence + bucketed co-located join plan tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.operators.skew import (
    salted_agg,
    salted_join,
)
from data_engineering_sf_mobile_food_facilities_public_spark.sources.bucketed import (
    read_table,
    write_bucketed,
)
from tests.conftest import SF_SMOKE


def test_salted_agg_equals_plain(spark):
    e = load(spark, SF_SMOKE, "events")
    plain = {
        r["event_type"]: (r["n"], r["s"])
        for r in e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("value").cast("decimal(18,4)")).alias("s"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["agg_1"], r["agg_0"])
        for r in salted_agg(
            e, ["event_type"], [F.sum(F.col("value").cast("decimal(18,4)")), F.count(F.lit(1))]
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark):
    c = load(spark, SF_SMOKE, "customer")
    n = load(spark, SF_SMOKE, "nation")
    plain = c.join(n, c.c_nationkey == n.n_nationkey).count()
    salted = salted_join(c, n, "c_nationkey", "n_nationkey").count()
    assert plain == salted


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    orders = load(spark, SF_SMOKE, "orders").select("o_orderkey", "o_custkey")
    lineitem = load(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", os.path.join(tmp_path, "o"), ["o_orderkey"], 4)
    write_bucketed(lineitem, "b_lineitem", os.path.join(tmp_path, "l"), ["l_orderkey"], 4)
    # at this test's scale the planner would broadcast and never consult
    # bucketing; force the sort-merge path a 100 TB join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo, bl = read_table(spark, "b_orders"), read_table(spark, "b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        # co-located: correct rows AND no exchange feeding the join
        assert joined.count() == lineitem.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
