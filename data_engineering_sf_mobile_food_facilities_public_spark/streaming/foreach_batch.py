"""foreachBatch sink: apply MERGE upsert per micro-batch into a parquet
target — the standard Structured Streaming pattern for sinks that need
transactional upsert semantics Spark's file sink doesn't provide
(JDBC upserts, Delta/Iceberg MERGE, or — here — a plain parquet table
maintained newest-wins).

Publish is write-audit-publish via the snapshot version pointer
(``sources/snapshots.py``): each batch writes the merged table to a new
``v=N`` directory and flips the tiny ``_latest`` pointer last (atomic
rename).  Readers therefore *always* see a complete table — there is no
window where the live directory is absent (the flaw of rename-swapping
the directory itself), and a crash mid-publish leaves the previous
version live.  Batch ids make retries idempotent, and the in-batch
dedup is made deterministic by an explicit ``order_by`` (newest-wins is
a real ordering, not partition order), so a retried batch reproduces
byte-identical state.

At 100 TB you'd MERGE into a partitioned table touching only affected
partitions (dynamic partition overwrite) rather than rewriting the full
table; the per-batch plan here is the same, the sink granularity
changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dedup_first
from ..operators.merge import merge_upsert
from ..sources.snapshots import latest_version, read_snapshot, vacuum, write_snapshot


def merge_into_parquet_batch(
    batch_df: DataFrame,
    target_dir: str,
    keys: Sequence[str],
    order_by: Sequence[str | Column] | None = None,
    vacuum_keep_last: int | None = None,
) -> int:
    """Merge one micro-batch into the versioned parquet table at
    ``target_dir`` (created on first batch); returns the published
    version.

    Retention is an *operator decision* (snapshots.py contract): old
    versions are kept unless ``vacuum_keep_last`` is set, in which case
    each batch vacuums down to that many versions after publishing.
    Leaving it ``None`` preserves every version for time-travel readers;
    a pipeline that knows no reader pins old versions passes e.g. ``2``.

    ``order_by`` names the winner per key (pass descending columns for
    newest-wins, e.g. ``[F.col("ts").desc()]``).  With ``order_by`` the
    merge is *order-based across batches too* — winner of
    (target ∪ batch) under the ordering — so the final state is the
    global per-key first-under-order regardless of which micro-batch
    delivered which row, and a replayed batch is a no-op (its rows
    never beat rows they didn't beat before).  When omitted, semantics
    fall back to last-writer-wins (incoming batch overwrites target)
    with a deterministic within-batch tiebreak over all non-key
    columns — stable under any partitioning, but batch-order-dependent;
    callers with a real recency column should pass it.
    """
    spark = batch_df.sparkSession
    if order_by is None:
        payload = [c for c in batch_df.columns if c not in keys]
        tiebreak = [F.struct(*payload).desc()] if payload else [F.lit(1)]
        incoming = dedup_first(batch_df, list(keys), tiebreak)
        if latest_version(target_dir) > 0:
            target = read_snapshot(spark, target_dir)
            merged = merge_upsert(target, incoming.select(*target.columns), keys)
        else:
            merged = incoming
    else:
        incoming = dedup_first(batch_df, list(keys), list(order_by))
        if latest_version(target_dir) > 0:
            target = read_snapshot(spark, target_dir)
            merged = dedup_first(
                target.unionByName(incoming.select(*target.columns)),
                list(keys),
                list(order_by),
            )
        else:
            merged = incoming
    v = write_snapshot(merged, target_dir)
    if vacuum_keep_last is not None:
        vacuum(target_dir, keep_last=vacuum_keep_last)
    return v


def read_merge_target(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the current published state of a merge target."""
    return read_snapshot(spark, target_dir)


def stream_merge_to_parquet(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    order_by: Sequence[str | Column] | None = None,
    vacuum_keep_last: int | None = None,
):
    """Run a stream into the merge sink with Trigger.AvailableNow;
    returns the finished StreamingQuery."""
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _bid: merge_into_parquet_batch(
                df, target_dir, keys, order_by, vacuum_keep_last=vacuum_keep_last
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
