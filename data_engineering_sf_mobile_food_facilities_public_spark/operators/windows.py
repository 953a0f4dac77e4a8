"""Window operators (reference A6, F4; SURVEY.md sections 2.4-2.5).

A6 — ``groupby(...).transform('count')`` (``/root/reference/airflow.py:251``)
is the reference's one true window function: the per-group size broadcast
back onto every row.  F4 — ``range(0, len(df))`` (``airflow.py:158-160``)
is a contiguous surrogate key that downstream tables join on, so gaps are
not acceptable (rules out bare ``monotonically_increasing_id``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def window_count(
    df: DataFrame, keys: Sequence[str], out_col: str = "group_count"
) -> DataFrame:
    """Per-row count of rows sharing ``keys`` (A6).

    One hash shuffle on ``keys``; an unordered window has no sort, so the
    exchange is the whole cost.  At scale an equivalent formulation is
    groupBy(keys).count() + broadcast-or-shuffle join back — Catalyst picks
    the window formulation's single shuffle over the join's two.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys])
    return df.withColumn(out_col, F.count(F.lit(1)).over(w))


def grouped_running_sum(
    df: DataFrame,
    group: str,
    order_by: Sequence[str],
    value: str | Sequence[str],
    out_col: str | Sequence[str] = "running_sum",
    persist_input: bool = False,
    handles: list[DataFrame] | None = None,
) -> DataFrame:
    """Per-``group`` cumulative sum of ``value`` in ``order_by`` order,
    WITHOUT the single-task-per-group window.  ``value``/``out_col``
    may be parallel sequences to compute several running sums over the
    SAME order in one shuffle (e.g. the two-sample KS statistic's pair
    of CDF counters).

    ``Window.partitionBy(group)`` puts each group's entire data through
    one sequential task — at 100 TB a training mix has a handful of
    giant language groups, so "en" alone would be tens of TB through a
    single reducer.  This is the two-pass decomposition instead (same
    shape as :func:`surrogate_key`):

    1. Range-partition the data on ``(group, *order_by)`` so every
       partition holds a contiguous slice of the global order and no
       partition exceeds the planner's target size — a giant group just
       spans MANY partitions.
    2. Local per-``(partition, group)`` running sums, plus a tiny
       per-``(partition, group)`` total aggregate (#partitions × #groups
       rows) whose per-group prefix sums over partition id give each
       slice's starting offset; broadcast-join the offsets back.

    Result is identical to the single-window formulation for any total
    ``(group, *order_by)`` order; the per-task work is bounded by the
    range-partition size regardless of group skew.

    ``persist_input=True`` caches ``df`` first: the range partitioner
    SAMPLES its input to pick bounds, so an expensive upstream (HOF
    stats, tokenization) is otherwise evaluated once for the sample and
    again for the shuffle — measured 3.1s -> 2.0s on the curation
    pipeline at sf0.1.  Leave off when the input is a cheap scan.

    pid consistency: the local-sum branch and the offsets branch both
    consume ``with_pid``, so both must observe the SAME physical
    partitioning.  With ``persist_input=True`` this is structural — the
    shuffled/pid-stamped frame is persisted and eagerly materialized,
    both branches read the one cached copy, and the input cache is
    released immediately after.  With ``persist_input=False`` it relies
    on Catalyst's ReuseExchange canonicalizing the two identical range
    exchanges into one (holds for this plan shape under AQE; plan-pinned
    by the mixture plan-shape test).  The materialized pid cache belongs
    to the returned plan; pass ``handles=[]`` to receive it for
    ``unpersist()`` after your final action.
    """
    values = [value] if isinstance(value, str) else list(value)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(values) != len(out_cols):
        raise ValueError("value and out_col must have the same length")
    keys = [group, *order_by]
    src = df.persist() if persist_input else df
    ordered = src.repartitionByRange(*keys).sortWithinPartitions(*keys)
    with_pid = ordered.withColumn("__pid", F.spark_partition_id())
    if persist_input:
        with_pid = with_pid.persist()
        with_pid.count()  # pin partition ids in the cache, then free input
        src.unpersist()
        if handles is not None:
            handles.append(with_pid)

    local_w = (
        Window.partitionBy("__pid", group)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets_w = (
        Window.partitionBy(group)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        with_pid.groupBy("__pid", group)
        .agg(*[F.sum(v).alias(f"__part_sum_{i}") for i, v in enumerate(values)])
        .select(
            "__pid",
            group,
            *[
                F.coalesce(
                    F.sum(f"__part_sum_{i}").over(offsets_w), F.lit(0)
                ).alias(f"__offset_{i}")
                for i in range(len(values))
            ],
        )
    )
    out = with_pid.select(
        "*",
        *[
            F.sum(v).over(local_w).alias(f"__local_{i}")
            for i, v in enumerate(values)
        ],
    ).join(F.broadcast(offsets), ["__pid", group])
    for i, oc in enumerate(out_cols):
        out = out.withColumn(oc, F.col(f"__local_{i}") + F.col(f"__offset_{i}"))
    return out.drop(
        "__pid",
        *[f"__local_{i}" for i in range(len(values))],
        *[f"__offset_{i}" for i in range(len(values))],
    )


def surrogate_key(
    df: DataFrame,
    order_by: Sequence[str | Column],
    out_col: str = "surrogate_id",
) -> DataFrame:
    """Contiguous 0..n-1 id in ``order_by`` order (F4).

    A global ``row_number`` needs a total order, which Spark executes as a
    single-partition window — correct, but a scale bottleneck.  We instead
    compute per-partition counts and offset each partition's local
    row_number by the running total of earlier partitions: two jobs, no
    single-task sort, same contiguous result.  The ``order_by`` columns
    must define a total order (tie-broken) for determinism.
    """
    ordered = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)

    # Local row number within each (already range-partitioned) partition,
    # then add the cumulative size of all earlier partitions.
    part_w = Window.partitionBy("__pid").orderBy(*order_by)
    with_pid = ordered.withColumn("__pid", F.spark_partition_id())
    offsets_w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        with_pid.groupBy("__pid")
        .count()
        .withColumn("__offset", F.coalesce(F.sum("count").over(offsets_w), F.lit(0)))
        .select("__pid", "__offset")
    )
    return (
        with_pid.withColumn("__local", F.row_number().over(part_w) - F.lit(1))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__local") + F.col("__offset")).cast("long"))
        .drop("__pid", "__local", "__offset")
    )
