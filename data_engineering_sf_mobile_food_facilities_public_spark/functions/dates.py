"""Date/time scalar functions (reference F1, SURVEY.md section 2.8).

The reference normalizes timestamp-ish strings to ``%Y-%m-%d``
(``/root/reference/airflow.py:215-216``) and stores the result as varchar.
Internally the engine keeps real ``timestamp``/``date`` types (so range
predicates push down to parquet) and formats only at the output edge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_DATE = "yyyy-MM-dd"


def normalize_date(col: Column | str, fmt: str = ISO_DATE) -> Column:
    """Parse anything timestamp-like and render it as a `yyyy-MM-dd` string
    (F1).  Accepts a timestamp column or a parseable string column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c.cast("timestamp"), fmt)
