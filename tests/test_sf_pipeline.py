"""End-to-end pipeline test (SURVEY.md section 5.3): build all SF tables,
assert PK uniqueness and FK integrity per the reference DDL
(/root/reference/airflow.py:330-432) using the engine's own constraint
check operators."""

from __future__ import annotations

from data_engineering_sf_mobile_food_facilities_public_spark.operators import (
    check_fk_orphans,
    check_unique_violations,
)
from data_engineering_sf_mobile_food_facilities_public_spark.plans.sf_pipeline import (
    build_all,
)
from tests.conftest import SF_SMOKE

# table -> declared PK (FIXTURES.md A4)
PRIMARY_KEYS = {
    "sf_details": ["permit"],
    "sf_applicant_details": ["objectid"],
    "sf_location": ["schedule_id"],
    "sf_food_type": ["permit"],
    "sf_premitted_biz_details": ["schedule_id"],
    "sf_permit_motification_details": ["schedule_id"],
    "sf_operation_time": ["schedule_id"],
    "sf_permit_application_details": ["objectid"],
    "sf_operating_day": ["schedule_id"],
    "sf_num_permit_per_business": ["applicant"],
    "sf_yelp_info": ["Yelp_id"],
}


def test_primary_keys_unique(spark):
    tables = build_all(spark, SF_SMOKE)
    for name, keys in PRIMARY_KEYS.items():
        violations = check_unique_violations(tables[name], keys).count()
        assert violations == 0, f"{name} PK {keys} violated {violations} times"


def test_foreign_keys_hold(spark):
    tables = build_all(spark, SF_SMOKE)
    # premitted_biz_details.permit -> details.permit (airflow.py:348)
    # is NOT total in the reference either (details dedups permit rows that
    # the schedule side may still reference) — check the ones that must hold:
    fk_pairs = [
        ("sf_location", ["schedule_id"], "sf_premitted_biz_details", ["schedule_id"]),
        ("sf_operating_day", ["schedule_id"], "sf_premitted_biz_details", ["schedule_id"]),
        ("sf_operation_time", ["schedule_id"], "sf_premitted_biz_details", ["schedule_id"]),
    ]
    for child, ck, parent, pk in fk_pairs:
        orphans = check_fk_orphans(tables[child], tables[parent], ck, pk).count()
        assert orphans == 0, f"{child}.{ck} -> {parent}.{pk}: {orphans} orphans"


def test_pipeline_row_counts(spark):
    tables = build_all(spark, SF_SMOKE)
    n_schedule = 6000  # sf0.001 lineitem rows
    assert tables["sf_premitted_biz_details"].count() == n_schedule
    assert tables["sf_operating_day"].count() == n_schedule
    assert tables["sf_location"].count() == n_schedule
    assert tables["sf_permit_ml"].count() == 2 * 1500  # orders x2
    assert tables["sf_details"].count() == 500  # distinct permit buckets
