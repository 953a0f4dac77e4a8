"""Offline state-store inspection (Spark 4 ``statestore`` /
``state-metadata`` data sources).

At scale this is the ops surface for stateful pipelines: read a running
(or stopped) query's keyed state straight from the checkpoint — no code
in the streaming job, no reprocessing — to audit state size per key,
debug a wedged aggregation, or bootstrap a migration.  Reads are
partition-parallel over the state store's shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_keyed_state(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Flatten the keyed state of the checkpoint's stateful operator to
    one row per key: (key columns..., state columns..., partition_id)."""
    st = spark.read.format("statestore").load(checkpoint)
    # applyInPandasWithState nests user state under value.groupState;
    # built-in operators (window agg, dedup) store a flat value struct.
    value = (
        "value.groupState.*"
        if "groupState" in st.select("value.*").columns
        else "value.*"
    )
    return st.selectExpr("key.*", value, "partition_id")


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator-level state metadata (name, store, partitions, batch
    range) — what an operator upgrade/repartition has to respect."""
    return spark.read.format("state-metadata").load(checkpoint)
