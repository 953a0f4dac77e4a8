"""Single-entry pipeline job (the reference DAG's orchestration shell).

The reference sequences extract -> transform -> load -> present as Airflow
tasks with ``retries=1`` and weekly scheduling
(``/root/reference/airflow.py:813-824``).  SURVEY.md section 2.9 maps that
to "idempotent overwrite batch job on an external cadence": the engine
side is this one function — ``run_pipeline`` — which an external scheduler
(cron, Airflow, anything that can run ``python -c``) invokes per period.

Stage semantics mirror the DAG's observable behavior:

- **transform**: all 12 SF tables as one lazy lineage (``build_all``);
- **check**: the reference's Postgres PK/FK DDL re-expressed as
  distributed constraint checks that must return zero violations before
  anything is published — check-before-publish, strictly stronger than
  the reference's insert-then-fail;
- **sink**: parquet overwrite per table (idempotent — rerunning a period
  replaces it, the reference's ``catchup=False`` weekly refresh);
- **present**: the S11 pie-chart PNG of facility-type counts
  (airflow.py:676-690).

Retries happen per STAGE with exponential backoff, like Airflow's
per-task ``retries`` (airflow.py:816) — a transient sink failure replays
the sink, not the transform.  Row-count metrics come from the written
parquet FOOTERS (pyarrow metadata, no data pages read), so metrics never
add a second scan of the data.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.constraints import check_fk_orphans, check_unique_violations
from .sf_pipeline import SF_TABLES, build_all


class ConstraintViolation(RuntimeError):
    """A pre-publish constraint check returned violations."""


def _with_retries(
    fn: Callable[[], Any], retries: int, base_delay: float = 0.5
) -> tuple[Any, int]:
    """Run ``fn``; on failure retry up to ``retries`` times with
    exponential backoff.  Constraint violations are data bugs, not
    transient faults — they never retry.  Returns (result, attempts_used).
    """
    delay = base_delay
    for attempt in range(retries + 1):
        try:
            return fn(), attempt
        except ConstraintViolation:
            raise
        except Exception:
            if attempt == retries:
                raise
            time.sleep(delay)
            delay *= 2
    raise AssertionError("unreachable")


def _parquet_rows(path: str) -> int:
    """Row count from parquet footers only (no data-page reads)."""
    import pyarrow.parquet as pq

    total = 0
    for entry in os.listdir(path):
        if entry.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(path, entry)).num_rows
    return total


def run_constraint_checks(tables: dict) -> dict[str, int]:
    """The reference's PK/FK DDL (airflow.py:341-424) as distributed
    checks over the built lineage.  Returns violation counts per rule;
    all must be zero for the job to publish."""
    details = tables["sf_details"]
    applicant = tables["sf_applicant_details"]
    biz = tables["sf_premitted_biz_details"]
    checks = {
        # PK details.permit (airflow.py:341)
        "pk_details_permit": check_unique_violations(details, ["permit"]),
        # PK applicant_details.objectid (airflow.py:348)
        "pk_applicant_objectid": check_unique_violations(applicant, ["objectid"]),
        # FK premitted_biz_details.permit -> details.permit (airflow.py:354)
        "fk_biz_permit": check_fk_orphans(biz, details, ["permit"]),
    }
    return {name: df.count() for name, df in checks.items()}


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    retries: int = 1,
    chart: bool = True,
    yelp_base_url: str | None = None,
    yelp_max_targets: int | None = None,
) -> dict[str, Any]:
    """Execute one full pipeline period: [extract-enrich] -> transform ->
    check -> sink -> present.  Returns a metrics dict (stage durations,
    attempts, rows written per table, chart bytes) — what a scheduler's
    task log would show.  Idempotent: rerunning with the same
    ``out_dir`` overwrites.

    ``yelp_base_url`` enables the reference DAG's live-enrichment
    extract (airflow.py:92-124): distinct (applicant, address) targets
    are batch-fetched executor-side and the flattened result lands as a
    ``yelp_enriched`` parquet table.  ``yelp_max_targets`` caps the
    request count (deterministically — sorted before the limit), the
    coarse politeness knob on top of the per-task connection bound.
    """
    metrics: dict[str, Any] = {"stages": {}}

    def staged(name: str, fn: Callable[[], Any]) -> Any:
        t0 = time.time()
        result, attempts = _with_retries(fn, retries)
        metrics["stages"][name] = {
            "seconds": round(time.time() - t0, 3),
            "attempts": attempts + 1,
        }
        return result

    if yelp_base_url:
        from ..sources.http_enrich import enrich_with_yelp
        from .sf_sources import sf_permit

        def extract_enrich() -> int:
            targets = (
                sf_permit(spark, sf_dir).select("applicant", "address").distinct()
            )
            if yelp_max_targets is not None:
                targets = targets.orderBy("applicant", "address").limit(
                    yelp_max_targets
                )
            enriched = enrich_with_yelp(targets, base_url=yelp_base_url)
            path = os.path.join(out_dir, "yelp_enriched")
            enriched.write.mode("overwrite").parquet(path)
            return _parquet_rows(path)

        metrics["yelp_enriched_rows"] = staged("extract_enrich", extract_enrich)

    tables = staged("transform", lambda: build_all(spark, sf_dir))

    def check() -> dict[str, int]:
        violations = run_constraint_checks(tables)
        if any(violations.values()):
            raise ConstraintViolation(f"constraint violations: {violations}")
        return violations

    metrics["constraints"] = staged("check", check)

    def sink() -> dict[str, int]:
        rows = {}
        for name in SF_TABLES:
            path = os.path.join(out_dir, name)
            tables[name].write.mode("overwrite").parquet(path)
            rows[name] = _parquet_rows(path)
        return rows

    metrics["rows_written"] = staged("sink", sink)

    if chart:
        from ..sources.charts import save_pie_chart

        def present() -> int:
            counts = (
                tables["sf_details"]
                .groupBy("facilitytype")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            return save_pie_chart(
                counts, os.path.join(out_dir, "facility_type_pie.png"),
                "facilitytype", "n",
            )

        metrics["chart_bytes"] = staged("present", present)

    return metrics


def main(argv: list[str] | None = None) -> int:
    """CLI entry so an external scheduler (cron, Airflow BashOperator —
    the reference's own cadence layer, airflow.py:813-824) can invoke one
    pipeline period: ``python -m <pkg>.plans.job SF_DIR OUT_DIR``.
    Prints the metrics dict as one JSON line; non-zero exit on failure
    so the scheduler's retry policy sees it."""
    import argparse
    import json

    from ..session import get_spark

    p = argparse.ArgumentParser(description="run one pipeline period")
    p.add_argument("sf_dir")
    p.add_argument("out_dir")
    p.add_argument("--retries", type=int, default=1)
    p.add_argument("--no-chart", action="store_true")
    p.add_argument("--yelp-base-url", default=None)
    p.add_argument("--yelp-max-targets", type=int, default=None)
    args = p.parse_args(argv)

    spark = get_spark("sf-pipeline-job")
    try:
        metrics = run_pipeline(
            spark,
            args.sf_dir,
            args.out_dir,
            retries=args.retries,
            chart=not args.no_chart,
            yelp_base_url=args.yelp_base_url,
            yelp_max_targets=args.yelp_max_targets,
        )
    finally:
        spark.stop()
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":  # pragma: no cover - exercised via subprocess test
    raise SystemExit(main())
