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


def state_partition_mapping(
    state: DataFrame, key_cols: list[str], num_partitions: int
) -> DataFrame:
    """Route every state key to its partition under a NEW shuffle
    partition count — the redistribute half of a state migration.

    Stateful operators place a key's state on
    ``pmod(murmur3hash(key), numShufflePartitions)`` (Catalyst
    HashPartitioning); ``F.hash`` IS that Murmur3 (seed 42), so this
    offline mapping reproduces the engine's routing bit for bit — the
    round-trip test asserts it against the partition_id the state
    reader reports for a query actually run at the new count.  At
    scale this is the pre-migration audit: per-new-partition key and
    byte counts BEFORE committing to a layout (skew in the new layout
    shows up here, not in production)."""
    from pyspark.sql import functions as F

    return state.withColumn(
        "new_partition_id",
        F.pmod(F.hash(*[F.col(c) for c in key_cols]), F.lit(num_partitions)),
    )


def seed_frame_from_state(state: DataFrame) -> DataFrame:
    """Synthesize one bootstrap row per key from ``running_user_counts``
    keyed state — the repair half of the migration: a seed row carries
    (seed_n = prior count, value = prior total), and
    ``running_user_counts_seeded`` reconstructs the state tuple exactly
    under ANY new partition layout.  PySpark's applyInPandasWithState
    has no initialState parameter, so seed-row replay IS the public
    migration recipe (one synthetic row per key — state-sized, not
    event-sized)."""
    from pyspark.sql import functions as F

    return state.select(
        "user_id",
        F.lit("__seed__").alias("event_type"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.col("total").alias("value"),
        F.col("n").alias("seed_n"),
    )
