"""Skew mitigation: salted aggregation and salted broadcast-replicated
joins.

At 100 TB a handful of hot keys (one event_type, one mega-customer) can
pin an entire stage on one task.  First line of defense is AQE's skew
split (``spark.sql.adaptive.skewJoin.enabled``, on by default with AQE in
session.py); salting is the explicit fallback when the skew is in an
*aggregation* (AQE can't split a hash-agg group) or when a deterministic
layout is wanted.

Both operators are pure DataFrame compositions and produce results
identical to their unsalted equivalents — which is exactly what their
oracle pairings verify.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation through a salt column: stage 1 aggregates on
    (keys, salt) — spreading each hot key over ``n_salts`` reducers —
    stage 2 merges the partials on keys alone.

    ``aggs`` must be re-aggregatable partials (sum/count/min/max — the
    algebraic aggregates); the caller finalizes ratios after the merge.
    The salt is ``rand``-derived: per-partition deterministic seeding,
    and the merge is salt-value-agnostic, so results are exact.
    """
    salted = df.withColumn("__salt", F.floor(F.rand(seed=42) * n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[a.alias(f"__p{i}") for i, a in enumerate(aggs)]
    )
    merged = partial.groupBy(*keys).agg(
        *[
            _merge_partial(partial.schema[f"__p{i}"].dataType, f"__p{i}")
            for i in range(len(aggs))
        ]
    )
    return merged


def _merge_partial(dtype, col: str) -> Column:
    # partial sums/counts merge by sum; min/max callers pre-name their agg
    return F.sum(F.col(col)).alias(col.replace("__p", "agg_"))


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``fact_key`` is skewed: every dim row is replicated
    ``n_salts`` times (one per salt value), each fact row picks one salt,
    and the join runs on (key, salt) — a hot key's rows now land on
    ``n_salts`` different reducers.

    Cost model: dim side grows ×n_salts, so this is for *small-to-medium*
    dims where broadcast is borderline; for tiny dims just broadcast (no
    salt needed), for huge dims prefer AQE skew-join splitting.
    """
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    dim_rep = dim.withColumn("__salt", F.explode(salts))
    facts_s = facts.withColumn(
        "__salt", F.floor(F.rand(seed=7) * n_salts).cast("int")
    )
    joined = facts_s.join(
        dim_rep,
        (facts_s[fact_key] == dim_rep[dim_key]) & (facts_s["__salt"] == dim_rep["__salt"]),
        how,
    )
    return joined.drop("__salt")
