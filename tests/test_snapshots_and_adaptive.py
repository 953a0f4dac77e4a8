"""Snapshot time travel, AQE partition coalescing, and dynamic partition
pruning — the runtime behaviors that carry the 100 TB design claims.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
from data_engineering_sf_mobile_food_facilities_public_spark.sources.snapshots import (
    latest_version,
    read_snapshot,
    vacuum,
    write_snapshot,
)
from tests.conftest import SF_SMOKE


def test_snapshot_time_travel_and_vacuum(spark, tmp_path):
    table = str(tmp_path / "orders_table")
    o = load(spark, SF_SMOKE, "orders")
    v1 = write_snapshot(o.filter(F.col("o_orderstatus") == "F"), table)
    v2 = write_snapshot(o, table)
    assert (v1, v2) == (1, 2)
    assert latest_version(table) == 2

    n_f = o.filter(F.col("o_orderstatus") == "F").count()
    assert read_snapshot(spark, table, version=1).count() == n_f  # time travel
    assert read_snapshot(spark, table).count() == o.count()  # latest

    v3 = write_snapshot(o.limit(10), table)
    assert vacuum(table, keep_last=2) == [1]
    assert read_snapshot(spark, table, version=v2).count() == o.count()
    assert read_snapshot(spark, table, version=v3).count() == 10
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, table, version=1)


def test_aqe_coalesces_small_shuffle(spark):
    # 32 configured shuffle partitions, tiny data: AQE must collapse the
    # post-shuffle stage instead of scheduling 32 near-empty tasks.
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = (
        load(spark, SF_SMOKE, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()  # materialize so the adaptive plan finalizes
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan


def test_dynamic_partition_pruning(spark, tmp_path):
    # Fact partitioned by year on disk; a dimension filter must prune
    # fact partitions at RUNTIME (the filter value is only known after
    # the dim scan) — the mechanism that keeps a 100 TB date-partitioned
    # fact from being fully scanned by every dimensional query.
    fact_dir = str(tmp_path / "orders_by_year")
    o = load(spark, SF_SMOKE, "orders").withColumn(
        "year", F.year("o_orderdate")
    )
    o.write.partitionBy("year").parquet(fact_dir)

    years = spark.createDataFrame(
        [(1995, "ancient"), (1998, "recent")], ["year", "tag"]
    )
    fact = spark.read.parquet(fact_dir)
    joined = fact.join(years.filter(F.col("tag") == "recent"), "year")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    got_years = {r.year for r in joined.select("year").distinct().collect()}
    assert got_years == {1998}


def test_snapshot_diff_cdc(spark, tmp_path):
    """diff_snapshots derives an exact insert/update/delete change feed
    between two published versions."""
    from data_engineering_sf_mobile_food_facilities_public_spark.sources.snapshots import (
        diff_snapshots,
    )

    table = str(tmp_path / "orders_tbl")
    o = load(spark, SF_SMOKE, "orders")
    v1 = write_snapshot(o.filter(F.col("o_orderkey") > 10), table)
    # v2: delete keys > 9000, update (reprice) keys < 100, insert keys <= 10
    v2 = write_snapshot(
        o.filter(F.col("o_orderkey") <= 9000).withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") < 100, F.col("o_totalprice") + 1.0
            ).otherwise(F.col("o_totalprice")),
        ),
        table,
    )

    diff = diff_snapshots(spark, table, v1, v2, keys=["o_orderkey"])
    by_type = {
        r.change_type: r.n
        for r in diff.groupBy("change_type").agg(F.count("*").alias("n")).collect()
    }
    want_inserts = o.filter(F.col("o_orderkey") <= 10).count()
    want_deletes = o.filter(F.col("o_orderkey") > 9000).count()
    want_updates = o.filter(
        (F.col("o_orderkey") < 100) & (F.col("o_orderkey") > 10)
    ).count()
    assert by_type.get("insert", 0) == want_inserts
    assert by_type.get("delete", 0) == want_deletes
    assert by_type.get("update", 0) == want_updates
    # and nothing else changed
    assert diff.count() == want_inserts + want_deletes + want_updates
