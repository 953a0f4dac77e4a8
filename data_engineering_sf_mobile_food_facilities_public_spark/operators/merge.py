"""Lakehouse-style mutation operators: MERGE (upsert) and SCD2 history
compaction — expressed as shuffle-minimal batch plans.

The reference's load step is plain truncate-and-reload
(``/root/reference/airflow.py:330-432`` drops and recreates every
Postgres table per run); a 100 TB engine instead needs incremental
upsert (MERGE INTO) and slowly-changing-dimension history.  Both are
pure DataFrame compositions here — no per-row loops, no driver-side
state.

Scale notes:

- ``merge_upsert`` uses the union + keep-max-priority formulation
  rather than a full-outer join: ONE hash shuffle on the key instead of
  two join-side shuffles, and it degrades gracefully under skew (AQE
  can split oversized partitions of a window the same way it splits a
  join).  At petabyte scale this is the standard compaction shape
  (newest-wins per key) used by Delta/Iceberg merge-on-read readers.
- ``scd2_compact`` is the gaps-and-islands rewrite: two stacked
  row_numbers over the SAME partitioning produce the island id, so
  Catalyst plans a single Window exchange + sort, then one aggregate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """MERGE INTO semantics, newest-wins: rows from ``source`` replace
    same-key rows in ``target`` (WHEN MATCHED THEN UPDATE SET *), and
    source rows with no target match are inserted (WHEN NOT MATCHED THEN
    INSERT *).  Both inputs must share a schema; ``source`` must be
    unique per key (pre-dedup if not — deterministic MERGE requires it,
    as does ANSI MERGE which errors on multiple matches).

    Plan shape: unionByName (no shuffle) -> one hash exchange on the
    key -> per-key row_number keeps the priority-1 (source) row.
    """
    cols = target.columns
    tagged = source.select(*cols).withColumn("__pri", F.lit(1)).unionByName(
        target.select(*cols).withColumn("__pri", F.lit(0))
    )
    w = Window.partitionBy(*keys).orderBy(F.desc("__pri"))
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*cols)
    )


def scd2_compact(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Compact a change-event stream into SCD2 (type-2 slowly changing
    dimension) intervals: one row per maximal run of consecutive equal
    ``attr`` values per ``key``, with ``valid_from`` / ``valid_to``
    bounds (``valid_to`` null on the current row).

    Gaps-and-islands: rn(key) - rn(key, attr) is constant within a run
    and distinct across runs.  Both row_numbers share the (key) hash
    partitioning, so this is one exchange, one sort, one aggregate,
    one lead-window — no self-join.

    The interval chain (lead over valid_from) orders runs by the run's
    FIRST POSITION in the (ts, tiebreak) sequence (min row_number), not
    by valid_from alone: when several same-instant events form multiple
    runs, their valid_from values TIE and valid_from-only ordering is
    engine-dependent — the hostile-events parity corpus caught exactly
    that divergence.  Min-rn is strictly increasing across a key's runs
    by construction, so the chain is total.
    """
    w_all = Window.partitionBy(key).orderBy(ts, tiebreak)
    w_attr = Window.partitionBy(key, attr).orderBy(ts, tiebreak)
    islands = df.select(
        key,
        attr,
        ts,
        tiebreak,
        F.row_number().over(w_all).alias("__rn"),
        (F.row_number().over(w_all) - F.row_number().over(w_attr)).alias("__island"),
    )
    runs = islands.groupBy(key, attr, "__island").agg(
        F.min(ts).alias("valid_from"),
        F.min("__rn").alias("__seq"),
        F.count(F.lit(1)).alias("n_changes"),
    )
    w_next = Window.partitionBy(key).orderBy("__seq")
    return runs.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(w_next).alias("valid_to"),
        "n_changes",
    )
