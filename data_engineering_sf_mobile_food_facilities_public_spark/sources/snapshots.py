"""Versioned parquet snapshots: write-once version directories with a
time-travel reader — the minimal table-format layer (what Delta/Iceberg
metadata provides) built on plain parquet + a version manifest.

Layout::

    table_dir/
      v=1/part-*.parquet
      v=2/part-*.parquet
      _latest            # text file holding the current version number

Writes are write-audit-publish: data lands in the new ``v=N`` directory
first, and the tiny ``_latest`` pointer flips last (atomic rename), so a
crashed writer never corrupts the readable table and old versions stay
readable for time travel / reproducible training runs.  Readers that
pass ``version=`` pin a snapshot — the property a 100 TB training
pipeline needs so a re-run months later sees identical data.

Retention is explicit (``vacuum`` drops versions below a floor), never
implicit — dropping a version a reader still pins is the operator's
decision.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LATEST = "_latest"


def latest_version(table_dir: str) -> int:
    """Current published version, 0 if the table doesn't exist yet."""
    p = os.path.join(table_dir, _LATEST)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(f.read().strip())


def write_snapshot(df: DataFrame, table_dir: str) -> int:
    """Publish ``df`` as the next version; returns the version number."""
    v = latest_version(table_dir) + 1
    data_dir = os.path.join(table_dir, f"v={v}")
    df.write.mode("overwrite").parquet(data_dir)
    tmp = os.path.join(table_dir, _LATEST + ".__tmp__")
    with open(tmp, "w") as f:
        f.write(str(v))
    os.replace(tmp, os.path.join(table_dir, _LATEST))
    return v


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (time travel) or the latest snapshot."""
    v = latest_version(table_dir) if version is None else version
    data_dir = os.path.join(table_dir, f"v={v}")
    if v < 1 or not os.path.exists(data_dir):
        raise FileNotFoundError(f"no snapshot v={v} under {table_dir}")
    return spark.read.parquet(data_dir)


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop versions older than the newest ``keep_last``; returns the
    dropped version numbers."""
    current = latest_version(table_dir)
    dropped = []
    for v in range(1, current - keep_last + 1):
        d = os.path.join(table_dir, f"v={v}")
        if os.path.exists(d):
            shutil.rmtree(d)
            dropped.append(v)
    return dropped


def diff_snapshots(
    spark: SparkSession,
    table_dir: str,
    version_old: int,
    version_new: int,
    keys: Sequence[str],
) -> DataFrame:
    """Change-data-feed between two snapshot versions: one row per
    changed key tagged insert / delete / update (CDC the reference's
    weekly full-reload pipeline can't produce — airflow.py re-INSERTs
    every row, /root/reference/airflow.py:462-508).

    One full-outer join on the key; non-key columns compare via a
    single 64-bit xxhash64 row-hash on each side, so the shuffle
    carries (key, hash) instead of whole rows for the unchanged
    majority.  64 bits, not 32: with billions of changed keys a 32-bit
    hash makes old/new collisions (a changed row silently classified
    unchanged and dropped from the feed) statistically expected;
    at 2^-64 they are negligible.
    """
    old = read_snapshot(spark, table_dir, version_old)
    new = read_snapshot(spark, table_dir, version_new)
    keys = list(keys)
    payload = [c for c in old.columns if c not in keys]
    o = old.select(*keys, F.xxhash64(*payload).alias("_h_old"))
    n = new.select(*keys, F.xxhash64(*payload).alias("_h_new"))
    joined = o.join(n, keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("_h_old").isNull(), F.lit("insert"))
        .when(F.col("_h_new").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
    ).filter(
        F.col("_h_old").isNull()
        | F.col("_h_new").isNull()
        | (F.col("_h_old") != F.col("_h_new"))
    )
