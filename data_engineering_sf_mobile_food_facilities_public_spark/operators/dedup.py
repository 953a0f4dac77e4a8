"""Deduplication operators (reference A1-A5, SURVEY.md section 2.4).

The reference dedups with pandas ``drop_duplicates(keep='first')``
(``/root/reference/airflow.py:175,195,209,244,252``), whose semantics
depend on frame order — a concept a distributed DataFrame does not have.
``dedup_first`` therefore makes the tiebreak *explicit*: callers name the
ordering columns, and the winner per key group is deterministic on any
cluster layout.  This is the pattern SURVEY.md section 4.3.1 calls the one
subtle dedup semantic in the build.

Scale notes
-----------
- ``row_number`` over ``partitionBy(keys)`` is a single hash shuffle on the
  dedup key — the same shuffle a groupBy would need; no extra pass.
- Skewed keys: AQE skew handling does not apply inside window exchanges, so
  for a pathological hot key pre-aggregate with ``min_by``-style semantics
  (groupBy + min(struct(order_cols, payload))) instead; same result, map-side
  partial aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Keep exactly one row per ``keys`` group: the first under ``order_by``.

    Deterministic replacement for pandas ``drop_duplicates(subset=keys)``
    (A1/A3) and ``sort_values(...).drop_duplicates(...)`` (A2,
    ``airflow.py:195``).  ``order_by`` should be a total order within each
    group (e.g. a unique column) for a fully deterministic winner.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def distinct_pairs(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Distinct projection (A4/A5, ``airflow.py:87-90,244``).

    The reference preserved first-seen order (``dict.fromkeys``); order is
    immaterial downstream (SURVEY.md A5), so this is a plain shuffle-distinct
    with map-side partial aggregation.
    """
    return df.select(*cols).distinct()
