"""Local re-implementation of the driver's DuckDB-oracle comparison.

Used by tests to catch Spark-vs-DuckDB divergence (row count, column
names, order-insensitive values) before the driver does.  Values are
normalized conservatively (exact for ints/strings, repr for floats,
ISO for datetimes) — if this comparator passes, any reasonable hash
the driver computes should too.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
from collections import Counter

import duckdb

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return cols, cur.fetchall()
    finally:
        con.close()


def _norm(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, _decimal.Decimal):
        return ("f", repr(float(v)))
    if isinstance(v, _dt.datetime):
        return ("t", v.isoformat())
    if isinstance(v, _dt.date):
        return ("t", v.isoformat())
    return v


def normalize_rows(cols, rows):
    """Sort columns by name (driver behavior) and normalize values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(sql, sf_dir)
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    s_set = normalize_rows(s_cols, s_rows)
    o_set = normalize_rows(o_cols, o_rows)
    if s_set != o_set:
        only_s = list((s_set - o_set).items())[:3]
        only_o = list((o_set - s_set).items())[:3]
        problems.append(f"values differ; spark-only={only_s} oracle-only={only_o}")
    return problems
