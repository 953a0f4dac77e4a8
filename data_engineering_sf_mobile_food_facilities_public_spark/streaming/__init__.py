"""Structured Streaming surface (SURVEY.md section 2.9).

The reference is strictly batch (weekly Airflow cadence); this package is
the engine's forward-looking streaming tier over the ``events`` table:
incremental ingestion with Trigger.AvailableNow, watermarked tumbling
windows, and idempotent sinks.
"""
