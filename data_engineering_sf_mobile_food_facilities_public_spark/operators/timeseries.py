"""Time-series operators: time-bucket rollup, as-of join, range join,
gap-based sessionization.

The reference has no time-series surface (SURVEY.md section 2.9 — strictly
batch, scheduler-side cadence only), but a 100 TB engine needs these; each
is expressed as a composition of built-in DataFrame ops so Catalyst/AQE
keep optimizing them (no RDDs, no Python row loops).

Scale notes per operator are on the functions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(col: str | Column, width: str) -> Column:
    """Truncate a timestamp to fixed-width buckets (hypertable-style).

    ``F.window`` start is equivalent but materializes a struct; this is a
    plain scalar expression (``date_bin``-like) that stays inside
    whole-stage codegen and groups directly.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(
        F.unix_micros(c) - (F.unix_micros(c) % F.lit(_width_micros(width)))
    )


def _width_micros(width: str) -> int:
    n, unit = width.split()
    per = {
        "second": 1_000_000,
        "seconds": 1_000_000,
        "minute": 60_000_000,
        "minutes": 60_000_000,
        "hour": 3_600_000_000,
        "hours": 3_600_000_000,
        "day": 86_400_000_000,
        "days": 86_400_000_000,
    }[unit]
    return int(n) * per


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: Sequence[str],
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key (left-outer
    semantics: unmatched left rows keep nulls).

    Implementation is the union-merge formulation: tag both sides, union
    by a common schema, and carry the most recent right-side values
    forward with ``last(ignorenulls)`` over (key, ts, side) — ONE shuffle
    on the key, no per-row subquery, no nested-loop join.  This is the
    standard scalable as-of (what pandas ``merge_asof`` does per-key,
    distributed).  Right side must be unique per (key, right_ts) for a
    deterministic result — pre-aggregate if needed.
    """
    lcols = left.columns
    # side=0 sorts right-side rows before left rows at equal timestamps,
    # so an exact-tie right row IS visible to the left row (<= semantics).
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(v).alias(f"__r_{v}") for v in right_vals],
        *[F.lit(None).alias(f"__l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in right_vals],
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l).select(
        "__side",
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[
            F.last(F.col(f"__r_{v}"), ignorenulls=True).over(w).alias(v)
            for v in right_vals
        ],
    )
    return merged.filter(F.col("__side") == 1).drop("__side")


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    equi: tuple[str, str],
    lower: Column,
    upper: Column,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Per left row, count right rows with the same equi key whose
    timestamp falls in [lower, upper).

    The equi key keeps this a hash/sort-merge join (the range predicate is
    evaluated as a post-join filter inside the join operator) — never a
    broadcast-nested-loop over the fact table.  At extreme skew, bucket
    the time dimension and add the bucket to the equi key.
    """
    lk, rk = equi
    joined = left.join(
        right,
        (F.col(lk) == F.col(rk)) & lower & upper,
        "left",
    )
    group_cols = [F.col(c) for c in left.columns]
    return joined.groupBy(*group_cols).agg(
        F.count(F.col(rk)).alias(count_alias)
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap: str = "30 minutes",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the previous event of the same key exceeds ``gap``.

    lag + conditional cumulative sum over one (key, ts) window — a single
    shuffle on the key.  ``tiebreak`` columns make the order total when
    timestamps can tie.  Built-in ``session_window`` gives the same
    partitioning for grouped aggs; this variant labels every row, which
    the grouped form cannot.
    """
    order = [F.col(ts), *[F.col(t) for t in tiebreak]]
    w = Window.partitionBy(key).orderBy(*order)
    gap_us = _width_micros(gap)
    new_session = (
        F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(w)) > gap_us
    ).cast("long")
    return df.withColumn(
        "session_seq",
        F.coalesce(
            F.sum(F.coalesce(new_session, F.lit(0))).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            F.lit(0),
        ),
    )
