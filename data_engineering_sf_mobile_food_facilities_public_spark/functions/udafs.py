"""User-defined aggregates (Pandas GROUPED_AGG) — completing the UDF
triad next to scalar pandas_udfs (operators/similarity.py:263) and the
Python UDTF (functions/udtfs.py).

A GROUPED_AGG pandas_udf receives each group's column as one pandas
Series over Arrow (no per-row Python), reduces it to a scalar, and plugs
into ``groupBy().agg()`` / unbounded windows like any built-in.  The
execution contract at scale: NO partial aggregation — every group's rows
shuffle to one task (unlike built-in aggregates, which combine
map-side).  That makes it the right tool for genuinely non-decomposable
reductions, and the wrong one for anything expressible with built-ins
(document the cliff; the weighted mean here IS decomposable and exists
only to exercise the surface — the built-in twin is sum(x*w)/sum(w)).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def weighted_mean(x: pd.Series, w: pd.Series) -> float:
    """Weighted arithmetic mean of x with weights w (NULL if no weight
    mass).  Vectorized numpy inner product per Arrow batch."""
    total = float(w.sum())
    if total == 0.0:
        return None
    return float((x * w).sum() / total)
