"""In-flight pipeline telemetry via the Observation API.

A production pipeline wants row counts, null rates, and value totals for
every stage — but a separate ``df.count()`` / profiling pass re-reads
the data, which at 100 TB doubles the job.  ``df.observe`` attaches
named aggregate expressions to the PLAN: the metrics are accumulated by
the same tasks that execute the action and arrive at the driver when the
action finishes — zero extra scans, zero extra shuffles, exact values.

This is the declarative cousin of accumulators with none of their
at-least-once retry skew: observed metrics are computed per successful
task attempt exactly once (Spark's ``CollectMetricsExec`` handles retry
dedup), so the numbers are safe to alert on.

Limits worth knowing (from the public API contract): observed
expressions must be aggregates over the observed node's output, they
cannot reference window functions, and streaming queries surface them
per micro-batch through ``StreamingQueryProgress.observedMetrics``
instead of the blocking ``Observation.get``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(
    df: DataFrame, name: str, *metrics: Column
) -> tuple[DataFrame, Observation]:
    """Attach named aggregate ``metrics`` to ``df``'s plan.

    Returns ``(df_with_observation, observation)``; run ONE action on
    the returned frame (write, count, collect), then read
    ``observation.get`` — a dict of metric name to value, measured by
    the action's own tasks.  Reading ``get`` before an action has
    completed blocks, so wire the action first.
    """
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
