"""Constraint-check operators (SURVEY.md sections 1.2, 4.3.4).

The reference enforces PK/FK declaratively in Postgres
(``/root/reference/airflow.py:341,348,354,368,378,386,396,407,416,424``).
Spark has no enforced constraints, so validation becomes an explicit,
distributed *check*: each returns a DataFrame of violations (empty ==
constraint holds), so checks compose into the same lazy plan as the data
they guard and cost one aggregation / one anti-join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_unique_violations(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Primary-key check: key groups with more than one row.

    groupBy + count is map-side partially aggregated, so the shuffle
    carries one row per distinct key, not per input row.
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("row_count"))
        .filter(F.col("row_count") > 1)
    )


def check_fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    child_keys: Sequence[str],
    parent_keys: Sequence[str] | None = None,
) -> DataFrame:
    """Referential-integrity check: distinct child keys with no parent row.

    Implemented as distinct -> left_anti join (the one anti-join in the
    build, SURVEY.md section 2.3).  Distinct-ing the child side first keeps
    the anti-join input at |distinct keys|, and a small parent side gets
    broadcast by AQE automatically.
    """
    parent_keys = list(parent_keys or child_keys)
    child_keys = list(child_keys)
    cond = [
        child[c].eqNullSafe(parent[p]) for c, p in zip(child_keys, parent_keys)
    ]
    return (
        child.select(*child_keys)
        .distinct()
        .join(parent.select(*parent_keys).distinct(), cond, "left_anti")
    )


def run_expectations(
    df: DataFrame, rules: Sequence[tuple[str, F.Column]]
) -> DataFrame:
    """Declarative data-quality expectations (dbt-test / Deequ shape):
    ``rules`` maps a name to a boolean "row is valid" expression; the
    result is one row per rule with its violation count.

    All rules evaluate in a SINGLE scan — each becomes a conditional
    count in one aggregate — then the 1-row result unpivots to
    (rule, violations).  Adding a rule never adds a pass over the data,
    which is the property that matters at 100 TB.
    """
    agg = df.agg(
        *[
            F.count(F.when(~valid, F.lit(1))).alias(name)
            for name, valid in rules
        ]
    )
    return agg.unpivot(
        ids=[],
        values=[name for name, _ in rules],
        variableColumnName="rule",
        valueColumnName="violations",
    )
