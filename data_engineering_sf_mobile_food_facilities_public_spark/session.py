"""SparkSession factory.

The reference builds a bare local session with default config
(``/root/reference/airflow.py:528-532`` — only an appName and a JDBC jar).
We instead configure the session the way a 100 TB deployment would:

- **AQE on** (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) so plans re-optimize on real statistics;
- **shuffle partitions** sized for the local harness (32 cores) but
  overridable via env/arg — at cluster scale you want roughly
  2-3x total executor cores, or just let AQE coalesce from a high cap;
- **Arrow enabled** so any pandas interchange (``mapInPandas``,
  ``toPandas``) is columnar-batched, never row-at-a-time pickling;
- **UTC session timezone** so timestamp semantics are stable across
  driver, executors and external oracles (parquet files here store naive
  timestamps — wall-clock fidelity requires one fixed zone);
- **zstd parquet** for the write path (smaller files, fast decode).

Nothing here is required for correctness of the operators — they run on
any ``SparkSession`` (the verification driver supplies its own).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Knobs that only make sense on a real cluster are documented here rather
# than hard-coded, so local[.] runs stay lean:
#   spark.sql.adaptive.skewJoin.enabled=true        (default on with AQE)
#   spark.sql.autoBroadcastJoinThreshold=64m        (bigger dims on big RAM)
#   spark.sql.files.maxPartitionBytes=256m          (fewer, fatter scan tasks)
#   spark.shuffle.service.enabled=true              (external shuffle service)
#   spark.dynamicAllocation.enabled=true


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def get_spark(
    app_name: str = "data_engineering_sf_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults."""
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 8)))
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
