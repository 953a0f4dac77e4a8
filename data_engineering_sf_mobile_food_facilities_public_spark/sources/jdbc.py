"""JDBC connectors (reference S7/S8, ``/root/reference/airflow.py:551-640,
462-508``).

The reference reads 10 Postgres tables whole over a single JDBC connection
and loads them with row-at-a-time INSERT loops (~2k network round-trips
per table).  The engine replaces both directions with set-based, partition-
parallel transfers.  Executed for real in this environment against the
Derby embedded database Spark bundles (``tests/test_jdbc_derby.py``:
round trip, partition-parallel ranges, predicate/projection pushdown into
the external SQL, overwrite/append modes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """Partition-parallel JDBC scan.  With a numeric ``partition_column``
    and bounds, Spark issues ``num_partitions`` range-predicated queries
    concurrently (one connection each) instead of one giant result set;
    filters/projections still push down (``pushDownPredicate`` default on).
    """
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    **options: str,
) -> None:
    """Set-based JDBC sink: executors write concurrently with batched
    inserts (``batchsize``) — the replacement for the reference's
    row-at-a-time INSERT loops.

    ``num_partitions`` caps writer concurrency (one JDBC connection per
    partition) by coalescing before the write — the knob that keeps a
    1000-executor job from opening 1000 connections against a database
    that allows 50.  ``batch_size`` sizes each ``executeBatch`` round
    trip within a partition."""
    if num_partitions is not None:
        # unconditional coalesce: it is a no-op narrowing when the plan
        # already has <= num_partitions, while probing df.rdd for the
        # count would force an extra job/plan under AQE just to decide
        df = df.coalesce(num_partitions)
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        w = w.option(k, v)
    w.save()
