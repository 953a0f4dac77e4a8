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

try:  # transformWithState runs a Python state-server that speaks
    # protobuf; the processor classes import lazily, but without the
    # protobuf package every query crashes at start — gate on both.
    import google.protobuf  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover - environment-dependent
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = object  # type: ignore[assignment,misc]
    HAS_TRANSFORM_WITH_STATE = False
    # one visible line instead of a silent capability hole: otherwise
    # the gate only surfaces as a pytest skip count
    import logging

    logging.getLogger(__name__).warning(
        "transformWithState disabled: google.protobuf not importable; "
        "applyInPandasWithState remains available"
    )

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


def _update_counts_seeded(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    # seed_n carries a prior checkpoint's per-key count: a seed row
    # contributes (seed_n, value) instead of (1, value), so replaying
    # one seed row per key reconstructs the migrated state exactly.
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += int(pdf["seed_n"].sum())
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_counts_seeded(events: DataFrame) -> DataFrame:
    """``running_user_counts`` with a ``seed_n`` weight column — the
    state-migration entry point: live rows carry seed_n = 1, bootstrap
    rows synthesized from an old checkpoint's keyed state carry the
    prior count (see ``state_inspect.seed_frame_from_state``).  This is
    how a stateful query changes its shuffle-partition count — state is
    keyed to the partition layout, so the new-layout query REBUILDS its
    state from one seed row per key instead of reading the old store."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_counts_seeded,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4) — the successor stateful API: typed state
# variables (value/list/map), timers, TTL, and an explicit processor
# lifecycle.  Requires the RocksDB state store provider, which is also
# the at-scale choice (changelog checkpointing, state larger than heap).
# ---------------------------------------------------------------------------

_TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


class RunningUserStats(StatefulProcessor):
    """Per-user running (count, max value) in a ValueState variable.

    Both emitted measures are monotone across micro-batches, so
    max-over-emissions equals the batch COUNT(*) / MAX(value) per key —
    the same exact-oracle contract as ``running_user_counts``.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", "n BIGINT, mx DOUBLE")

    def handleInputRows(self, key, rows, timerValues):
        n, mx = self._state.get() if self._state.exists() else (0, None)
        for pdf in rows:
            n += len(pdf)
            batch_max = float(pdf["value"].max())
            mx = batch_max if mx is None else max(mx, batch_max)
        self._state.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    def close(self) -> None:
        pass


def tws_running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats via transformWithStateInPandas (update mode)."""
    spark = events.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningUserStats(),
        outputStructType=_TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
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


def _session_emit(
    key: tuple, pdfs, state: GroupState
):
    """Emit a user's session (count, span) ONLY when its event-time
    timeout fires — nothing is produced while events keep arriving."""
    import pandas as pd

    if state.hasTimedOut:
        n, first_us, last_us = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "first_us": [first_us],
                "last_us": [last_us],
            }
        )
        return
    n, first_us, last_us = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        us = (pdf["ts"].astype("int64") // 1000).astype("int64")
        n += len(pdf)
        first_us = min(first_us, us.min()) if first_us is not None else us.min()
        last_us = max(last_us, us.max()) if last_us is not None else us.max()
    state.update((int(n), int(first_us), int(last_us)))
    # close the session once the watermark passes last event + 30 minutes
    state.setTimeoutTimestamp(int(last_us) // 1000 + 30 * 60 * 1000)
    yield from ()


def session_close_on_timeout(events: DataFrame) -> DataFrame:
    """Session aggregation that emits exclusively via EventTimeTimeout:
    per-user (count, first, last) is buffered in state and released only
    when the watermark proves the 30-minute gap has passed — the
    timeout-driven flavor of sessionization (vs. session_window's
    window-merge flavor), and the pattern for any 'emit when the key
    goes quiet' operator (cart abandonment, device offline)."""
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("first_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("first_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
        ]
    )
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_emit,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Latest-state maintenance (streaming CDC): per-key argmax by event time.
# ---------------------------------------------------------------------------

LATEST_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

LATEST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _update_latest(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    cur = state.get if state.exists else None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        b = pdf.sort_values(["ts_us", "event_id"]).iloc[-1]
        cand = (
            int(b["ts_us"]),
            int(b["event_id"]),
            str(b["event_type"]),
            float(b["value"]),
        )
        if cur is None or (cand[0], cand[1]) > (cur[0], cur[1]):
            cur = cand
    state.update(cur)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "ts_us": [cur[0]],
            "event_id": [cur[1]],
            "event_type": [cur[2]],
            "value": [cur[3]],
        }
    )


def latest_user_state(events: DataFrame) -> DataFrame:
    """Per-user latest (event_type, value) by (ts, event_id) as an
    update-mode stream — the streaming CDC "latest-state table"
    maintenance that :func:`snapshot_diff_user_state`'s batch snapshots
    come from in a real deployment.  State per key is one tiny tuple;
    the emitted state is MONOTONE in the (ts_us, event_id) total order
    across micro-batches, so the (ts_us, event_id)-argmax over all
    update emissions equals the batch last-state no matter how the
    file set splits into batches — the exact-oracle contract."""
    prepared = events.withColumn("ts_us", F.unix_micros("ts")).select(
        "user_id", "ts_us", "event_id", "event_type", "value"
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_latest,
        outputStructType=LATEST_OUTPUT_SCHEMA,
        stateStructType=LATEST_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_latest_stream(result: DataFrame, query_name: str) -> DataFrame:
    """Drain (AvailableNow) and reduce update emissions to the final
    state per key: lexicographic struct-max on the (ts_us, event_id)
    unique prefix — the same argmax-by-total-order reduction the batch
    snapshot uses, so partial emissions from earlier batches collapse
    to exactly the last one."""
    spark = result.sparkSession
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    s = F.max(F.struct("ts_us", "event_id", "event_type", "value")).alias("s")
    return (
        spark.table(query_name)
        .groupBy("user_id")
        .agg(s)
        .select(
            "user_id",
            F.col("s.ts_us").alias("ts_us"),
            F.col("s.event_id").alias("event_id"),
            F.col("s.event_type").alias("event_type"),
            F.col("s.value").alias("value"),
        )
    )
