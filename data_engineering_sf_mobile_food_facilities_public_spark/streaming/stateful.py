"""Custom stateful streaming operator via ``applyInPandasWithState``.

A per-key running aggregate maintained in explicit group state — the
pattern for streaming logic that windowed aggs can't express (custom
eviction, per-key machine state, session objects).  Arrow moves each
group's rows as pandas batches; state is a tiny tuple per key, so state
store size is O(distinct keys), independent of event volume.

Correctness contract used by the oracle pairing: the emitted count per
key is monotonically nondecreasing across micro-batches, so
``max(count)`` over all update-mode emissions equals the batch
``COUNT(*)`` per key no matter how the file set is split into batches.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-total) as an update-mode stream."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_update_stream(result: DataFrame, query_name: str) -> DataFrame:
    """Drain the stream (AvailableNow) into a memory sink and reduce the
    update-mode emissions to the final value per key (max of the
    monotone count)."""
    spark = result.sparkSession
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table(query_name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
