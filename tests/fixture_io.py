"""Shared writer for hostile-fixture parquet tables.

The driver's testdata is written by pyarrow with NAIVE microsecond
timestamps (``isAdjustedToUTC = false``).  Spark's parquet writer emits
UTC-ADJUSTED timestamps instead, which DuckDB types as TIMESTAMP WITH
TIME ZONE — and expressions like ``ts AT TIME ZONE 'UTC' AT TIME ZONE
'X'`` mean the OPPOSITE thing on tstz vs naive input, so a
Spark-written fixture silently flips oracle timezone semantics (found
by the hostile-events corpus).  Writing fixtures with pyarrow keeps
them bit-faithful to the driver's layout.
"""

from __future__ import annotations

from datetime import datetime


def write_naive_parquet(
    path: str,
    rows: list[tuple],
    columns: list[str],
    ts_cols: list[str] | None = None,
    int_cols: list[str] | None = None,
    int32_cols: list[str] | None = None,
) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts_cols = ts_cols or []
    int_cols = int_cols or []
    int32_cols = int32_cols or []
    data: dict[str, list] = {c: [] for c in columns}
    for row in rows:
        for c, v in zip(columns, row):
            if c in ts_cols and isinstance(v, str):
                v = datetime.strptime(v, "%Y-%m-%d %H:%M:%S")
            data[c].append(v)
    arrays = {}
    for c in columns:
        if c in ts_cols:
            arrays[c] = pa.array(data[c], type=pa.timestamp("us"))
        elif c in int_cols:
            arrays[c] = pa.array(data[c], type=pa.int64())
        elif c in int32_cols:
            arrays[c] = pa.array(data[c], type=pa.int32())
        else:
            arrays[c] = pa.array(data[c])
    pq.write_table(pa.table(arrays), path)
