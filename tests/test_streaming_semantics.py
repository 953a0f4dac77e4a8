"""Behavioral streaming tests: watermark late-data drop and exactly-once
file-sink reruns — the semantics SURVEY.md section 2.9 notes the
reference lacks entirely."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import Window
from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, ts timestamp, value double").coalesce(
        1
    ).write.mode("append").parquet(path)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_watermark_drops_late_rows(spark, tmp_path):
    src = os.path.join(tmp_path, "src")
    ckpt = os.path.join(tmp_path, "ckpt")
    out = os.path.join(tmp_path, "out")

    def run_once():
        stream = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .parquet(src)
            .withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("wstart"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: two rows in the 10:00 window + one at 13:00 that advances
    # the watermark to 12:30 once the batch commits
    _write_events(
        spark,
        src,
        [
            (1, _ts("2024-01-01 10:00:00"), 1.0),
            (1, _ts("2024-01-01 10:10:00"), 1.0),
            (1, _ts("2024-01-01 13:00:00"), 1.0),
        ],
    )
    run_once()

    # batch 2: a LATE row for the 10:00 window (behind the 12:30
    # watermark -> must be dropped before aggregation)
    _write_events(spark, src, [(1, _ts("2024-01-01 10:20:00"), 1.0)])
    run_once()

    emitted = {
        r["wstart"]: r["n"] for r in spark.read.parquet(out).collect()
    }
    # the 10:00 window was finalized with ONLY the on-time rows — the
    # late 10:20 row fell behind the 12:30 watermark and was dropped
    assert emitted[_ts("2024-01-01 10:00:00")] == 2


def test_file_sink_rerun_is_exactly_once(spark, tmp_path):
    src = os.path.join(tmp_path, "src")
    out = os.path.join(tmp_path, "out")
    ckpt = os.path.join(tmp_path, "ckpt")
    _write_events(
        spark,
        src,
        [(1, _ts("2024-01-01 10:00:00"), 1.0), (2, _ts("2024-01-01 11:00:00"), 2.0)],
    )

    def run_once():
        q = (
            spark.readStream.schema("user_id long, ts timestamp, value double")
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    run_once()  # idempotent rerun: checkpoint says nothing new -> no dupes
    assert spark.read.parquet(out).count() == 2


def test_foreach_batch_incremental_merge(spark, tmp_path):
    """Multi-micro-batch foreachBatch MERGE: events split across 4 files,
    drained one file per trigger, merged newest-wins into a parquet
    table — final table equals the batch per-key latest-event answer."""
    from pyspark.sql import functions as F

    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.foreach_batch import (
        stream_merge_to_parquet,
    )
    from tests.conftest import SF_SMOKE

    events = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    src = str(tmp_path / "src")
    events.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    target = str(tmp_path / "table")
    q = stream_merge_to_parquet(
        stream,
        target,
        str(tmp_path / "ckpt"),
        keys=["user_id"],
        order_by=[F.col("ts").desc()],
    )
    assert q.lastProgress is not None

    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.foreach_batch import (
        read_merge_target,
    )

    got = read_merge_target(spark, target)
    # one row per user survives
    assert got.count() == events.select("user_id").distinct().count()
    # and every surviving row is a real event row for that user
    assert (
        got.join(events, ["user_id", "event_type", "ts", "value"]).count()
        == got.count()
    )
    # newest-wins is deterministic: each survivor carries its user's max ts
    # *within some micro-batch at or after that user's last appearance*;
    # with a total drain the final winner is the global per-user latest.
    latest = events.groupBy("user_id").agg(F.max("ts").alias("ts"))
    assert got.select("user_id", "ts").join(
        latest, ["user_id", "ts"]
    ).count() == got.count()


def test_transform_with_state_running_stats(spark):
    """transformWithStateInPandas (Spark 4 stateful API): needs the
    protobuf-speaking Python state server — skip where absent."""
    import pytest

    pytest.importorskip("google.protobuf")
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.plans.extensions import (
        streaming_tws_running_stats,
    )
    from tests.conftest import SF_SMOKE

    got = streaming_tws_running_stats(spark, SF_SMOKE).orderBy("user_id")
    want = (
        load(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
        .orderBy("user_id")
    )
    assert [r.asDict() for r in got.collect()] == [r.asDict() for r in want.collect()]


def test_state_store_reader(spark, tmp_path):
    """Offline state inspection: the statestore/state-metadata sources
    read a stopped query's keyed state straight from its checkpoint and
    it equals the batch aggregate over the same input."""
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.stateful import (
        running_user_counts,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.state_inspect import (
        read_keyed_state,
        state_metadata,
    )
    from tests.conftest import SF_SMOKE

    events = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        running_user_counts(stream)
        .writeStream.format("memory")
        .queryName("state_reader_probe")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    state = read_keyed_state(spark, ckpt)
    want = events.groupBy("user_id").agg(F.count("*").alias("n"))
    got = {r.user_id: r.n for r in state.collect()}
    assert got == {r.user_id: r.n for r in want.collect()}

    meta = state_metadata(spark, ckpt).collect()
    assert meta[0].operatorName == "applyInPandasWithState"
    # multiple micro-batches actually ran (maxFilesPerTrigger=1 x 3 files)
    assert meta[0].maxBatchId >= 2


def test_stream_stream_left_outer_join_emits_nulls_after_watermark(spark, tmp_path):
    """Left-outer interval join: matches emit eagerly; the null-padded
    row for an unmatched view emits only after the watermark passes its
    join horizon (view.ts + gap + delay), and views still inside the
    horizon at shutdown emit nothing."""
    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.events_stream import (
        interval_join_streams,
    )

    views_dir = os.path.join(tmp_path, "views")
    buys_dir = os.path.join(tmp_path, "buys")
    ckpt = os.path.join(tmp_path, "ckpt")
    out = os.path.join(tmp_path, "out")

    def run_once():
        views = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(views_dir)
        buys = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(buys_dir)
        joined = interval_join_streams(views, buys, "1 hour", "left_outer").select(
            F.col("l.user_id").alias("user_id"),
            F.col("l.ts").alias("view_ts"),
            F.col("r.ts").alias("purchase_ts"),
        )
        q = (
            joined.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: matched view (user 1) + unmatched view (user 2)
    _write_events(spark, views_dir, [(1, _ts("2024-01-01 10:00:00"), 1.0),
                                     (2, _ts("2024-01-01 10:05:00"), 1.0)])
    _write_events(spark, buys_dir, [(1, _ts("2024-01-01 10:30:00"), 9.0)])
    run_once()

    # batch 2: watermark advancers on BOTH inputs (watermark = min over
    # sources); commits global watermark to 16:00 - 2h = 14:00, which is
    # past user 2's horizon 10:05 + 1h + 2h = 13:05
    _write_events(spark, views_dir, [(98, _ts("2024-01-01 16:00:00"), 1.0)])
    _write_events(spark, buys_dir, [(99, _ts("2024-01-01 16:00:00"), 1.0)])
    run_once()

    # batch 3: one more tick so the 14:00 watermark is *applied* to
    # evict user 2's view and emit its null match
    _write_events(spark, views_dir, [(97, _ts("2024-01-01 16:30:00"), 1.0)])
    _write_events(spark, buys_dir, [(96, _ts("2024-01-01 16:30:00"), 1.0)])
    run_once()

    rows = spark.read.parquet(out).collect()
    matched = {(r.user_id, r.view_ts, r.purchase_ts) for r in rows
               if r.purchase_ts is not None}
    nulls = {(r.user_id, r.view_ts) for r in rows if r.purchase_ts is None}
    # eager inner match, exactly once
    assert matched == {(1, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 10:30:00"))}
    # user 2's null row emitted after watermark closure; users 97/98 are
    # still inside the horizon -> no null rows for them
    assert nulls == {(2, _ts("2024-01-01 10:05:00"))}


def test_event_time_timeout_closes_sessions(spark, tmp_path):
    """applyInPandasWithState + EventTimeTimeout: a user's session emits
    ONLY after the watermark passes last_event + 30min.  User 1 goes
    quiet -> its session is released on a later batch; user 2 keeps
    events inside the horizon -> still buffered at shutdown."""
    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.stateful import (
        session_close_on_timeout,
    )

    src = os.path.join(tmp_path, "src")
    ckpt = os.path.join(tmp_path, "ckpt")
    out = os.path.join(tmp_path, "out")

    def run_once():
        stream = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        ).parquet(src)
        q = (
            session_close_on_timeout(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: user 1's burst of 3 events
    _write_events(spark, src, [(1, _ts("2024-01-01 10:00:00"), 1.0),
                               (1, _ts("2024-01-01 10:05:00"), 1.0),
                               (1, _ts("2024-01-01 10:20:00"), 1.0)])
    run_once()

    # batch 2: user 2 far in the future advances the watermark past
    # user 1's timeout (10:20 + 30min = 10:50; wm = 12:00 - 10min)
    _write_events(spark, src, [(2, _ts("2024-01-01 12:00:00"), 1.0)])
    run_once()

    # batch 3: another tick applies the advanced watermark -> timeout fires
    _write_events(spark, src, [(2, _ts("2024-01-01 12:05:00"), 1.0)])
    run_once()

    rows = {r.user_id: r for r in spark.read.parquet(out).collect()}
    assert 1 in rows
    s = rows[1]
    assert s.n_events == 3
    assert s.first_us == int(_ts("2024-01-01 10:00:00").timestamp() * 1_000_000)
    assert s.last_us == int(_ts("2024-01-01 10:20:00").timestamp() * 1_000_000)
    # user 2's session is still open (inside the watermark horizon)
    assert 2 not in rows


def test_streaming_observed_metrics_per_microbatch(spark):
    """Observation metrics on a STREAMING plan surface through
    StreamingQueryProgress.observedMetrics each micro-batch — the
    zero-rescan stage telemetry (operators/telemetry.py) works the same
    on the streaming side, and the per-batch row counts must total the
    source's row count."""
    from pyspark.sql import functions as F

    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.events_stream import (
        read_events_stream,
    )
    from tests.conftest import SF_SMOKE

    events = read_events_stream(spark, SF_SMOKE)
    observed = events.observe(
        "ingest_stage",
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_v"),
    )
    q = (
        observed.writeStream.format("noop")
        .queryName("obs_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    metrics = [
        p["observedMetrics"]["ingest_stage"]
        for p in q.recentProgress
        if p.get("observedMetrics", {}).get("ingest_stage")
    ]
    assert metrics, "no observed metrics surfaced in any micro-batch"
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    want = batch.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_v"),
    ).collect()[0]
    assert sum(m["rows"] for m in metrics) == want["rows"]
    assert abs(sum(m["total_v"] for m in metrics) - want["total_v"]) < 1e-6


def test_latest_state_multi_batch_equals_batch_argmax(spark, tmp_path):
    """The CDC latest-state operator's batch-split invariance contract,
    actually stressed: 3 files drain as 3 micro-batches (checked via
    maxBatchId), partial per-batch emissions accumulate in the sink,
    and the argmax reduction still equals the batch last-state —
    including keys whose latest event arrives in an EARLIER file than
    older events (files split by repartition, not time)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.stateful import (
        latest_user_state,
        run_latest_stream,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.state_inspect import (
        state_metadata,
    )
    from tests.conftest import SF_SMOKE

    events = load(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ckpt = str(tmp_path / "ckpt")
    result = latest_user_state(stream)
    q = (
        result.writeStream.format("memory")
        .queryName("latest_state_multibatch")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    s = F.max(F.struct("ts_us", "event_id", "event_type", "value")).alias("s")
    got = {
        r.user_id: (r.s.ts_us, r.s.event_id, r.s.event_type, r.s.value)
        for r in spark.table("latest_state_multibatch").groupBy("user_id").agg(s).collect()
    }
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = {
        r.user_id: (r.ts_us, r.event_id, r.event_type, r.value)
        for r in events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("ts_us", F.unix_micros("ts"))
        .collect()
    }
    assert got == want
    meta = state_metadata(spark, ckpt).collect()
    assert meta[0].maxBatchId >= 2  # multiple micro-batches really ran


def test_state_repair_redistribute_round_trip(spark, tmp_path):
    """r12 VERDICT #7a: migrate a stateful query to a DIFFERENT shuffle
    partition count by (1) reading the old checkpoint's keyed state,
    (2) computing the new-layout routing offline, (3) rebuilding state
    under the new layout from one seed row per key, then continuing on
    new data.  Asserts both halves: the final counts equal the batch
    aggregate over ALL events (repair is lossless), and the offline
    pmod(hash(key), n) mapping equals the partition_id the engine
    actually assigned at the new count (redistribute is bit-faithful)."""
    from data_engineering_sf_mobile_food_facilities_public_spark.catalog import load
    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.stateful import (
        running_user_counts,
        running_user_counts_seeded,
    )
    from data_engineering_sf_mobile_food_facilities_public_spark.streaming.state_inspect import (
        read_keyed_state,
        seed_frame_from_state,
        state_metadata,
        state_partition_mapping,
    )
    from tests.conftest import SF_SMOKE

    events = load(spark, SF_SMOKE, "events").select(
        "user_id", "event_type", "ts", "value"
    )
    batch1 = events.filter(F.col("user_id") % 2 == 0)
    batch2 = events.filter(F.col("user_id") % 2 == 1).unionAll(
        events.filter(F.col("user_id") % 4 == 0)  # keys seen in BOTH phases
    )
    src1, src2 = str(tmp_path / "src1"), str(tmp_path / "src2")
    batch1.repartition(2).write.parquet(src1)

    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # phase 1: original query at 4 state partitions
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        ckpt1 = str(tmp_path / "ckpt1")
        q = (
            running_user_counts(
                spark.readStream.schema(batch1.schema).parquet(src1)
            )
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt1)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state1 = read_keyed_state(spark, ckpt1)
        assert state_metadata(spark, ckpt1).collect()[0].numPartitions == 4

        # redistribute audit: offline routing for the 8-partition layout
        mapping = {
            r.user_id: r.new_partition_id
            for r in state_partition_mapping(state1, ["user_id"], 8).collect()
        }

        # phase 2: seed rows + new data through the 8-partition rebuild
        seeds = seed_frame_from_state(state1)
        live2 = batch2.withColumn("seed_n", F.lit(1).cast("long"))
        seeds.unionByName(live2).repartition(2).write.parquet(src2)

        spark.conf.set("spark.sql.shuffle.partitions", "8")
        ckpt2 = str(tmp_path / "ckpt2")
        q2 = (
            running_user_counts_seeded(
                spark.readStream.schema(seeds.schema).parquet(src2)
            )
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt2)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
        state2 = read_keyed_state(spark, ckpt2)
        assert state_metadata(spark, ckpt2).collect()[0].numPartitions == 8

        # repair is lossless: migrated counts == batch aggregate over all
        want = {
            r.user_id: r.n
            for r in batch1.unionAll(batch2)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        got = {r.user_id: r.n for r in state2.collect()}
        assert got == want

        # redistribute is bit-faithful: every key that existed in the old
        # state landed exactly where the offline mapping said it would
        landed = {r.user_id: r.partition_id for r in state2.collect()}
        assert mapping and all(
            landed[uid] == pid for uid, pid in mapping.items()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
