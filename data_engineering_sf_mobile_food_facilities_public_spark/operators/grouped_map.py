"""Grouped-map operator via ``applyInPandas``.

The per-group pandas function is the right tool when group logic is a
real algorithm (fit a curve, run scipy, normalize against group stats)
rather than an aggregate expression.  One shuffle on the group key;
each group arrives as a single pandas DataFrame in an Arrow batch.

Caveat that shapes the API: a *whole group* must fit in one worker's
memory — so key choice is a scale decision (users: fine; one global
key: not).  For unbounded groups, fall back to window functions or
two-pass moment aggregation (see plans/analytics.stats_from_moments).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def zscore_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    out_col: str = "zscore",
    round_digits: int | None = None,
) -> DataFrame:
    """Normalize ``value_col`` against its group's mean/std (ddof=0 =
    population std, DuckDB's STDDEV_POP).  Single-member or zero-variance
    groups get z=0.0.

    ``round_digits`` rounds the z-score so the result is comparable
    against a SQL ``AVG``/``STDDEV_POP`` window oracle despite ulp-level
    float accumulation-order differences between engines (the repo's
    ROUND_DIGITS convention, ``operators/similarity.py``)."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {out_col} double"

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = float(pdf[value_col].std(ddof=0))
        mean = float(pdf[value_col].mean())
        z = (pdf[value_col] - mean) / std if std > 0 else 0.0
        if round_digits is not None:
            import numpy as np

            # np.round is half-even while DuckDB's round is half-away:
            # a z-score landing EXACTLY on a .5 tie at round_digits
            # could differ by 1 ulp between engines.  Ties require the
            # unrounded z to be exactly representable at digits+1, which
            # a mean/std quotient of real-world floats effectively never
            # is; the oracle-parity suite pins current data.  If a tie
            # ever bites, align with round-half-away explicitly:
            # np.floor(np.abs(z)*10**d + 0.5)/10**d * np.sign(z).
            z = np.round(z, round_digits) + 0.0  # +0.0 folds -0.0 into 0.0
        return pdf.assign(**{out_col: z})

    return df.groupBy(group_col).applyInPandas(normalize, schema=schema)


def group_extrema_arrow(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group (count, min, max) computed inside an ``applyInArrow``
    grouped map — the zero-copy sibling of ``applyInPandas``: each group
    arrives as a ``pyarrow.Table`` and never materializes a pandas
    object, which matters when groups are wide binary/media batches.
    min/max/count involve no floating accumulation, so the result is
    exact and oracle-comparable (unlike the zscore path)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def extrema(table: pa.Table) -> pa.Table:
        v = table[value_col]
        return pa.table(
            {
                group_col: pa.array([table[group_col][0].as_py()], pa.string()),
                "n": pa.array([table.num_rows], pa.int64()),
                "min_v": pa.array([pc.min(v).as_py()], pa.float64()),
                "max_v": pa.array([pc.max(v).as_py()], pa.float64()),
            }
        )

    return df.groupBy(group_col).applyInArrow(
        extrema, schema=f"{group_col} string, n long, min_v double, max_v double"
    )
