"""Streaming operators over the ``events`` table.

The reference models "weekly refresh" in the scheduler, not the data
plane (``/root/reference/airflow.py:821``).  The engine's equivalent is
incremental batch: ``Trigger.AvailableNow`` drains whatever files exist,
checkpoints, and stops — rerunnable on a cadence with exactly-once file
sink semantics.  The same plan keeps running as a true stream when fed a
live source.

Scale notes: a tumbling-window count is a streaming hash aggregate whose
state is bounded by the watermark horizon; partitioning is by group key,
and ``spark.sql.shuffle.partitions`` sizes the state store spread.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from ..catalog import TESTDATA_SCHEMAS, _nanos_ts_cols


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the events parquet (schema fixed up front —
    streaming reads never infer).

    Shares the batch loader's footer-driven timestamp-unit detection
    (catalog._nanos_ts_cols): if the parquet footer stores ``ts`` as
    TIMESTAMP(NANOS) it is read as a long and integer-div'd to micros;
    micros/millis files read natively.  Detection from the footer — not
    a hard-coded table list — so a testdata regen that changes the unit
    changes the read path with it.
    """
    schema = TESTDATA_SCHEMAS["events"]
    nanos_cols = _nanos_ts_cols(f"{sf_dir}/events.parquet", schema)
    # The streaming file source wants a directory; glob-filter to the one
    # events file so sibling tables in sf_dir are never listed.
    if not nanos_cols:
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read_schema = T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name in nanos_cols else f.dataType)
            for f in schema.fields
        ]
    )
    return (
        spark.readStream.schema(read_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .select(*[f.name for f in schema.fields])
    )


def hourly_event_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling 1-hour window x event_type counts.

    The watermark bounds state: windows older than max(ts) - watermark are
    finalized and evicted.  Late rows within the horizon still update
    their window; later ones are dropped — the explicit late-data policy
    the reference lacks.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "event_count",
        )
    )


def run_available_now(result: DataFrame, query_name: str) -> DataFrame:
    """Execute a streaming plan over all currently-available input
    (Trigger.AvailableNow) into an in-memory sink and return the final
    result as a DataFrame.  Complete mode: every window is emitted, so
    the output equals the batch answer over the same files."""
    spark = result.sparkSession
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def sliding_window_counts_stream(
    events: DataFrame,
    width: str = "30 minutes",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SLIDING window counts: each event lands in
    width/slide overlapping windows (F.window generates them at the
    scan, no self-join).  State per (window, key) is still bounded by
    the watermark horizon; overlap multiplies state by width/slide, the
    standard cost of sliding aggregation."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "event_count",
        )
    )


def enrich_stream_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static left join: every micro-batch hash-joins against the
    static dimension snapshot — Spark plans it as a broadcast join when
    the dim fits, so the stream never shuffles.  This is the streaming
    analogue of the reference's enrichment joins (airflow.py:654-660
    left join), stateless, append-mode-safe."""
    return events.join(F.broadcast(dim), events.user_id == dim.c_custkey, "left").select(
        "event_id", "user_id", F.col("c_name").alias("user_name"), "event_type"
    )


def dedup_doubled_stream(spark: SparkSession, sf_dir: str, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once demo: the SAME file source read twice and unioned
    (every event arrives duplicated), then
    ``dropDuplicatesWithinWatermark`` on the event key collapses the
    duplicates.  State holds one entry per key inside the watermark
    horizon and is evicted past it — dedup at unbounded-stream scale,
    unlike a global dropDuplicates whose state never shrinks."""
    doubled = read_events_stream(spark, sf_dir).unionByName(
        read_events_stream(spark, sf_dir)
    )
    return (
        doubled.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id", "event_type", "ts")
    )


def run_append_to_table(result: DataFrame, query_name: str) -> DataFrame:
    """Execute an append-mode streaming plan over all available input
    (Trigger.AvailableNow) into an in-memory sink; return the sink table."""
    spark = result.sparkSession
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def session_window_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Built-in streaming SESSION windows: per-user sessions closed by
    ``gap`` inactivity, state merged incrementally as events arrive and
    finalized past the watermark.  The batch twin is the
    lag-plus-running-sum sessionize (operators/timeseries.py) — same
    sessions, computed incrementally here.  Boundary: an event exactly
    ``gap`` after the previous one starts a NEW session (session end is
    exclusive)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


def interval_join_streams(
    left: DataFrame, right: DataFrame, gap: str = "1 hour", how: str = "inner"
) -> DataFrame:
    """Watermarked stream-stream join: right rows within
    [left.ts, left.ts + gap] per user.

    Both sides carry watermarks and the join condition bounds event time
    in both directions, so each side's buffered state is evicted once
    the other side's watermark passes the interval — state stays
    O(in-flight window), not O(stream).  Inner-join matches emit as soon
    as both rows arrive (the watermark only gates state cleanup), so an
    AvailableNow drain yields exactly the batch join result.

    ``how="left_outer"`` additionally emits null-padded left rows — but
    only once the watermark proves no future right row can match
    (left.ts + gap + delay has passed), so outer results trail the
    watermark by design; rows still inside the horizon at shutdown never
    produce their null match (tests/test_streaming_semantics.py pins
    this)."""
    l = left.withWatermark("ts", "2 hours").alias("l")
    r = right.withWatermark("ts", "2 hours").alias("r")
    return l.join(
        r,
        F.expr(
            f"l.user_id = r.user_id AND r.ts >= l.ts "
            f"AND r.ts <= l.ts + interval {gap}"
        ),
        how,
    )


def ohlc_hourly_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming OHLC candles: watermarked tumbling 1-hour windows per
    event_type with open/close via ``min_by``/``max_by`` over the same
    lexicographic ``unix_micros || event_id`` total-order key the batch
    rollup uses — all five aggregates are single-pass and MERGEABLE, so
    incremental state updates are exactly the partial-merge the batch
    plan does per partition.  The watermark bounds candle state; late
    ticks inside the horizon still revise their candle (the correction
    policy a market-data pipeline needs spelled out, not implied)."""
    k = F.concat(
        F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )
    return (
        events.withWatermark("ts", watermark)
        .select("event_type", "ts", "value", k.alias("k"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.expr("min_by(value, k)").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr("max_by(value, k)").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the documents parquet (fixed schema; glob keeps
    sibling tables invisible) — the corpus-ingestion side of the
    streaming surface: new document files land, the stream picks them
    up per micro-batch."""
    return (
        spark.readStream.schema(TESTDATA_SCHEMAS["documents"])
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def incremental_near_dup_stream(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Ingestion-time near-dup as a genuine STREAM: incoming documents
    (doc_id % 10 == 0) arrive per micro-batch; each batch computes only
    its own MinHash signatures, probes the STANDING corpus band index
    with the same capped equi-join as the batch path
    (``operators.minhash.probe_candidates``), verifies candidates with
    exact Jaccard, and appends each new doc's keep/drop signal to the
    sink.  This is the production incremental flow: per-batch cost
    scales with the batch, the corpus index is a static frame (a
    materialized table at scale), and results for a doc are final the
    moment its batch commits — append semantics, no stream state beyond
    the micro-batch.

    foreachBatch is the right harness (not a stream-static join chain):
    the probe needs candidate DEDUP + a per-doc aggregate, which as
    native streaming operators would demand watermark state the data
    has no event-time for; inside foreachBatch they are ordinary batch
    ops on a bounded frame.  Parity with the batch oracle is asserted
    by the driver row (same SQL as ``incremental_near_dup_new_batch``).
    """
    from ..catalog import load
    from ..operators.minhash import (
        jaccard,
        lsh_bands,
        minhash_signatures,
        probe_candidates,
        shingles,
    )

    docs = load(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    corpus_sh = shingles(corpus)
    corpus_bands = lsh_bands(minhash_signatures(corpus_sh)).select(
        F.col("doc_id").alias("id_a"), "band_idx", "band_hash"
    )

    def probe_batch(batch_df, batch_id: int) -> None:
        batch = batch_df.filter(F.col("doc_id") % 10 == 0)
        batch_sh = shingles(batch)
        batch_bands = lsh_bands(minhash_signatures(batch_sh)).select(
            F.col("doc_id").alias("id_b"), "band_idx", "band_hash"
        )
        cands = probe_candidates(
            batch_bands, corpus_bands, max_bucket_size=max_bucket_size
        )
        scored = jaccard(cands, corpus_sh.unionByName(batch_sh))
        out = (
            scored.filter(F.col("jaccard") >= threshold)
            .groupBy(F.col("id_b").alias("new_doc"))
            .agg(
                F.count(F.lit(1)).alias("n_corpus_matches"),
                F.round(F.max("jaccard"), 6).alias("max_jaccard"),
            )
        )
        out.write.mode("append").parquet(out_dir)

    stream = read_documents_stream(spark, sf_dir)
    q = (
        stream.writeStream.foreachBatch(probe_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", out_dir + "_chk")
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
