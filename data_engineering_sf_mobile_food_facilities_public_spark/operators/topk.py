"""Top-k (reference O2, SURVEY.md section 2.6).

``ORDER BY ... LIMIT k`` (``/root/reference/airflow.py:659-660``).  Spark
plans this as ``TakeOrderedAndProject``: each task keeps a k-row heap and
the driver merges per-partition heaps — no global sort, no full shuffle.
That plan shape is exactly what you want at 100 TB, so the helper's only
job is to make the deterministic tiebreak explicit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Smallest-k rows under ``order_by`` (pass ``F.desc(...)`` cols for
    largest-k).  ``order_by`` should include a unique tiebreak column so
    ties at the k-boundary are deterministic across engines and runs."""
    return df.orderBy(*order_by).limit(k)
