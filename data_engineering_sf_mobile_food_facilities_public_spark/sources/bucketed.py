"""Bucketed tables: pre-shuffled storage for co-located joins.

Writing both sides of a recurring join bucketed (and sorted) by the join
key makes the join shuffle-free forever after: each bucket pair joins
locally, so the exchange that dominates a 100 TB sort-merge join simply
disappears from the plan (verified in tests/test_bucketed_join.py).

This is Spark's answer to the reference's Postgres-side PK indexes: pay
the layout cost once at write time, amortize over every downstream read.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` as an external bucketed (+sorted) table.

    ``n_buckets`` should divide the target parallelism; both sides of a
    co-located join must use identical bucket count and columns.
    """
    w = df.write.mode("overwrite").option("path", path).bucketBy(
        n_buckets, *bucket_cols
    )
    if sort:
        w = w.sortBy(*bucket_cols)
    w.saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — bucketing metadata comes from the table, so joins
    on the bucket columns skip their exchanges."""
    return spark.table(name)
