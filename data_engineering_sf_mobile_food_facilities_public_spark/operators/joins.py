"""Join helpers (reference J1-J4, SURVEY.md section 2.3).

All four reference joins are plain equi-joins that the DataFrame API
expresses directly; Catalyst + AQE pick the physical strategy.  The one
planning decision worth encoding is *broadcasting small dimension sides*
(the reference's yelp side is <=50 rows; at 100 TB the same pattern is a
dim table vs. a fact table), which skips the fact-side shuffle entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_small_dim(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Equi-join with an explicit broadcast hint on the dimension side
    (reference J3, ``/root/reference/airflow.py:242`` — schedule left-join
    tiny yelp).  Broadcasting turns a shuffle join into a map-side hash
    join: zero movement of the fact table."""
    return fact.join(F.broadcast(dim), on, how)
