"""Row replication (reference F5, SURVEY.md section 2.8).

``np.repeat(df.values, 2, axis=0)`` (``/root/reference/airflow.py:166-170``)
duplicates every row for the ML staging table ``permit_ml``.  In Spark this
is a generator expression — ``explode`` of a literal array — which runs
inside whole-stage codegen with no shuffle and no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def replicate_rows(df: DataFrame, times: int = 2) -> DataFrame:
    """Emit each input row ``times`` times (narrow, no shuffle)."""
    return df.withColumn(
        "__copy", F.explode(F.array(*[F.lit(i) for i in range(times)]))
    ).drop("__copy")
